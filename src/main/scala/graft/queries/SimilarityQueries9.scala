package graft.queries

import graft.{Q, Tables}
import graft.functions.FloatDot
import graft.functions.Vectors._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search, part 9: representation-budget diagnostics — how
  * much of the embedding's retrieval quality survives cheaper
  * representations (prefix truncation) and how separated the label
  * classes are in the space. Both are the measurements a team makes
  * BEFORE shrinking a production vector index.
  *
  * Portability: per-pair similarity is the sequential left-to-right
  * fold (`graft_dot` / DuckDB list_sum — bit-identical, see
  * functions/Vectors.scala); cross-row vector sums go through the
  * integer-quantization pattern (floor(x·1e9) summed as BIGINT —
  * exact/associative on both engines) established by
  * ss_label_diversity; recalls are integer hit counts in basis points.
  */
object SimilarityQueries9 {

  val defs: Map[String, Q] = Map(

    // Matryoshka-style PREFIX-DIMENSION recall: rank by cosine using only
    // the first p dims (p = 8/16/32) and measure recall@10 against the
    // full-dim ranking — the curve that says how far an MRL-trained (or
    // merely truncated) index can cut its dimension budget before
    // retrieval degrades. Plan shape: the anchor set (vec_id < 10) and
    // the p-axis broadcast against the corpus — ONE corpus pass scores
    // all four widths (the sliced fold costs p multiplies, so the pass
    // does 8+16+32+64 ≈ 2 full-width folds per pair); ranking is a
    // per-(p, anchor) window over an anchor-bounded frame; ground truth
    // joins back as a semi-join on (qid, vec_id). At corpus-scale anchor
    // sets the broadcast swaps for the IVF probe join like ss_ivf_ann.
    "ss_matryoshka_recall" -> Q(
      s"""WITH ps AS (SELECT unnest([8, 16, 32, 64]) AS p),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
         |scored AS (
         |  SELECT ps.p, q.qid, e.vec_id,
         |         ${duckCosinePrefix("e.embedding", "q.qv", "ps.p")} AS c
         |  FROM embeddings e, q, ps WHERE e.vec_id <> q.qid),
         |ranked AS (
         |  SELECT p, qid, vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY p, qid ORDER BY c DESC, vec_id) AS rnk
         |  FROM scored),
         |top AS (SELECT p, qid, vec_id FROM ranked WHERE rnk <= 10),
         |truth AS (SELECT qid, vec_id FROM top WHERE p = 64),
         |hits AS (
         |  SELECT t.p, CAST(COUNT(*) AS BIGINT) AS hit
         |  FROM top t JOIN truth g ON t.qid = g.qid AND t.vec_id = g.vec_id
         |  WHERE t.p < 64 GROUP BY t.p),
         |nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q)
         |SELECT CAST(h.p AS INTEGER) AS p, h.hit AS hits,
         |       CAST(n.n * 10 AS BIGINT) AS truth_size,
         |       CAST(h.hit * 10000 // (n.n * 10) AS BIGINT) AS recall_bp
         |FROM hits h, nq n ORDER BY p""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .crossJoin(broadcast(
          s.range(0, 1).select(explode(array(lit(8), lit(16), lit(32), lit(64))).as("p"))))
      val scored = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("p"), col("qid"), col("vec_id"),
          (nativeDot(slice(col("embedding"), lit(1), col("p")),
                     slice(col("qv"), lit(1), col("p")))
            / (sqrt(nativeDot(slice(col("embedding"), lit(1), col("p")),
                              slice(col("embedding"), lit(1), col("p"))))
               * sqrt(nativeDot(slice(col("qv"), lit(1), col("p")),
                                slice(col("qv"), lit(1), col("p")))))).as("c"))
      val top = scored
        .withColumn("rnk", row_number().over(
          Window.partitionBy("p", "qid").orderBy(col("c").desc, col("vec_id"))))
        .filter(col("rnk") <= 10)
        .select(col("p"), col("qid"), col("vec_id"))
      val truth = top.filter(col("p") === 64).select(col("qid"), col("vec_id"))
      val nq = q.filter(col("p") === 64).agg(count(lit(1)).as("n"))
      top.filter(col("p") < 64)
        .join(truth, Seq("qid", "vec_id"))
        .groupBy("p").agg(count(lit(1)).as("hits"))
        .crossJoin(broadcast(nq))
        .select(col("p").cast("int").as("p"), col("hits"),
                (col("n") * 10).as("truth_size"),
                expr("cast(hits * 10000 div (n * 10) as bigint)").as("recall_bp"))
        .orderBy("p")
    },

    // Between-class separation: the cosine between every pair of LABEL
    // CENTROIDS (plus each centroid's norm — a norm near 0 means the
    // class is isotropic noise). Complements ss_label_diversity's
    // WITHIN-class mean pairwise cosine: together they are the Fisher-
    // style "within vs between" read on whether the labels are
    // separable in this space. The centroid sum-vectors come from ONE
    // pass (integer-quantized per-dimension sums, exact on both
    // engines); the pairwise stage joins |labels|² ORDERED-LIST rows —
    // dimension- and label-bounded, never row-scale, and the cosine is
    // the sequential fold over the two collected lists.
    "ss_class_separation" -> Q(
      s"""WITH e AS (
         |  SELECT label, vec_id, embedding, ${duckNorm("embedding")} AS nrm
         |  FROM embeddings),
         |u AS (
         |  SELECT label, vec_id,
         |         [CAST(embedding[i] AS DOUBLE) / nrm
         |            for i in range(1, len(embedding)+1)] AS uv
         |  FROM e),
         |comp AS (
         |  SELECT label, unnest(range(1, len(uv)+1)) AS pos, unnest(uv) AS cval
         |  FROM u),
         |sp AS (
         |  SELECT label, pos,
         |         CAST(CAST(SUM(CAST(floor(cval * 1e9) AS BIGINT)) AS BIGINT)
         |              AS DOUBLE) / 1e9 AS s
         |  FROM comp GROUP BY label, pos),
         |cnts AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY label),
         |lv0 AS (SELECT label, list(s ORDER BY pos) AS sv FROM sp GROUP BY label),
         |lv AS (SELECT lv0.label, lv0.sv, c.n FROM lv0 JOIN cnts c ON lv0.label = c.label)
         |SELECT CAST(a.label AS INTEGER) AS label_a, CAST(b.label AS INTEGER) AS label_b,
         |       a.n AS n_a, b.n AS n_b,
         |       list_sum([a.sv[i] * b.sv[i] for i in range(1, len(a.sv)+1)])
         |         / (sqrt(list_sum([x * x for x in a.sv]))
         |            * sqrt(list_sum([x * x for x in b.sv]))) AS centroid_cos,
         |       sqrt(list_sum([x * x for x in a.sv])) / CAST(a.n AS DOUBLE) AS norm_a,
         |       sqrt(list_sum([x * x for x in b.sv])) / CAST(b.n AS DOUBLE) AS norm_b
         |FROM lv a JOIN lv b ON a.label < b.label
         |ORDER BY label_a, label_b""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val u = Tables.embeddings(s, d)
        .withColumn("nrm", nativeNorm(col("embedding")))
        .select(col("label"),
                transform(col("embedding"), x => x.cast("double") / col("nrm")).as("uv"))
      val sp = u
        .select(col("label"), posexplode(col("uv")).as(Seq("pos0", "cval")))
        .groupBy(col("label"), (col("pos0") + 1).as("pos"))
        .agg((sum(floor(col("cval") * lit(1e9)).cast("long")).cast("double")
                / lit(1e9)).as("s"))
      val cnt = u.groupBy("label").agg(count(lit(1)).as("n"))
      val lv = sp.groupBy("label")
        .agg(transform(
               sort_array(collect_list(struct(col("pos"), col("s")))),
               x => x.getField("s")).as("sv"))
        .join(cnt, "label")
      def fold2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      val la = lv.select(col("label").as("label_a"), col("sv").as("sva"), col("n").as("n_a"))
      val lb = lv.select(col("label").as("label_b"), col("sv").as("svb"), col("n").as("n_b"))
      la.join(broadcast(lb), col("label_a") < col("label_b"))
        .select(col("label_a").cast("int").as("label_a"),
                col("label_b").cast("int").as("label_b"),
                col("n_a"), col("n_b"),
                (fold2(col("sva"), col("svb"))
                  / (sqrt(fold2(col("sva"), col("sva")))
                     * sqrt(fold2(col("svb"), col("svb"))))).as("centroid_cos"),
                (sqrt(fold2(col("sva"), col("sva"))) / col("n_a").cast("double")).as("norm_a"),
                (sqrt(fold2(col("svb"), col("svb"))) / col("n_b").cast("double")).as("norm_b"))
        .orderBy("label_a", "label_b")
    }
  )

  /** DuckDB cosine over the first `p` dims of two list expressions —
    * the prefix-sliced twin of Vectors.duckCosine (same sequential
    * list_sum fold, same double math). */
  private def duckCosinePrefix(a: String, b: String, p: String): String = {
    def dotP(x: String, y: String) =
      s"list_sum([CAST(($x)[i] AS DOUBLE) * CAST(($y)[i] AS DOUBLE) for i in range(1, $p+1)])"
    s"(${dotP(a, b)} / (sqrt(${dotP(a, a)}) * sqrt(${dotP(b, b)})))"
  }
}
