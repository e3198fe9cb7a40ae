package graft.queries

import graft.{Q, Tables}
import graft.functions.Vectors._
import graft.functions.FloatDot
import org.apache.spark.sql.functions._

/** Corpus diversity profile over `embeddings` — the MEAN PAIRWISE cosine
  * within each label, computed with ZERO pair joins via the sum-vector
  * identity: for unit vectors u_i,
  *
  *     Σ_{i≠j} cos(u_i, u_j) = ‖Σ u_i‖² − Σ‖u_i‖²
  *
  * so mean pairwise similarity = (‖S‖² − Σ‖u‖²) / (n(n−1)) from one
  * corpus pass. This is the diversity/redundancy score data-selection
  * methods (SemDeDup, cluster pruning) rank clusters by: a label whose
  * mean pairwise cosine approaches 1 is redundant (prunable); near 0 it
  * is diverse. The naive form is n² cosine pairs — at 100 TB that is
  * the difference between one scan and an impossible join.
  *
  * Portability: cross-row float sums are order-dependent, and the
  * DECIMAL(24,12) route (Portable.dsumUnit) rounds the double→decimal
  * cast differently per engine (shortest-repr vs exact-binary — the
  * divergence Portable.cents documents), which showed up here as ~1e-13
  * drift over 64-dim component sums. So cross-row sums use an exact
  * integer grid instead: floor(x·1e9) per term (one IEEE multiply +
  * floor, both portable), BIGINT sum (order-independent), one division
  * back to double. The ≤1e-9-per-term quantization is documented
  * semantics, not noise — both twins state the identical grid. Grid
  * headroom: per-dim sums reach 1e9·n_label, exact in a double to
  * n_label ≈ 9e6; beyond that the grid coarsens, same widening note as
  * Portable.cents.
  *
  * Scale shape: unit-normalize per row (IEEE per-row ops), one
  * (label, dim) aggregate — state is |labels|·dim, dimension-bounded,
  * never corpus-bounded — then ‖S‖² folds sequentially over the ≤dim
  * collected component sums per label (same sequential-fold invariant
  * as Vectors.dot). The per-row ‖u‖² (≈1 up to float rounding)
  * aggregates through the same integer grid at 1e-12 grain.
  */
object SimilarityQueries5 {

  def defs: Map[String, Q] = Map(

    "ss_label_diversity" -> Q(
      s"""WITH e AS (
         |  SELECT label, vec_id, embedding, ${duckNorm("embedding")} AS nrm
         |  FROM embeddings),
         |u AS (
         |  SELECT label, vec_id,
         |         [CAST(embedding[i] AS DOUBLE) / nrm
         |            for i in range(1, len(embedding)+1)] AS uv
         |  FROM e),
         |comp AS (
         |  SELECT label, vec_id,
         |         unnest(range(1, len(uv)+1)) AS pos, unnest(uv) AS cval
         |  FROM u),
         |sp AS (
         |  SELECT label, pos,
         |         CAST(CAST(SUM(CAST(floor(cval * 1e9) AS BIGINT)) AS BIGINT)
         |              AS DOUBLE) / 1e9 AS s
         |  FROM comp GROUP BY label, pos),
         |sq AS (
         |  SELECT label, list_sum([x * x for x in list(s ORDER BY pos)]) AS sumsq
         |  FROM sp GROUP BY label),
         |rs AS (
         |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |         CAST(CAST(SUM(CAST(floor(list_sum([x * x for x in uv]) * 1e12)
         |                          AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12 AS ssq
         |  FROM u GROUP BY label)
         |SELECT CAST(rs.label AS INTEGER) AS label, rs.n_vecs,
         |       (sq.sumsq - rs.ssq)
         |         / CAST(rs.n_vecs * (rs.n_vecs - 1) AS DOUBLE) AS mean_pair_cos,
         |       sqrt(sq.sumsq) / CAST(rs.n_vecs AS DOUBLE) AS centroid_norm
         |FROM rs JOIN sq ON rs.label = sq.label
         |ORDER BY label""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val u = Tables.embeddings(s, d)
        .withColumn("nrm", nativeNorm(col("embedding")))
        .select(col("label"), col("vec_id"),
                transform(col("embedding"), x => x.cast("double") / col("nrm")).as("uv"))
      val sp = u
        .select(col("label"), posexplode(col("uv")).as(Seq("pos0", "cval")))
        .groupBy(col("label"), (col("pos0") + 1).as("pos"))
        .agg((sum(floor(col("cval") * lit(1e9)).cast("long")).cast("double")
                / lit(1e9)).as("s"))
      val sq = sp.groupBy("label")
        .agg(aggregate(
               sort_array(collect_list(struct(col("pos"), col("s")))),
               lit(0.0),
               (acc, x) => acc + x.getField("s") * x.getField("s")).as("sumsq"))
      val rs = u
        .select(col("label"),
                aggregate(col("uv"), lit(0.0), (acc, x) => acc + x * x).as("ssq_row"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
             (sum(floor(col("ssq_row") * lit(1e12)).cast("long")).cast("double")
                / lit(1e12)).as("ssq"))
      rs.join(sq, "label")
        .select(col("label").cast("int").as("label"), col("n_vecs"),
                ((col("sumsq") - col("ssq"))
                   / (col("n_vecs") * (col("n_vecs") - 1)).cast("double"))
                  .as("mean_pair_cos"),
                (sqrt(col("sumsq")) / col("n_vecs").cast("double")).as("centroid_norm"))
        .orderBy("label")
    }
  )
}
