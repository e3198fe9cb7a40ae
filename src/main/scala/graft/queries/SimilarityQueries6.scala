package graft.queries

import graft.{Q, Tables}
import graft.functions.FloatDot
import graft.functions.Vectors._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Filtered ANN — metadata-predicated vector search, the feature that
  * separates a vector DATABASE from a vector index (every production
  * retrieval stack filters by tenant / language / date while searching).
  * The critical semantic: the predicate applies BEFORE ranking, so the
  * query returns k true neighbors WITHIN the filtered set — post-
  * filtering a plain top-k under-delivers k whenever neighbors fail the
  * predicate (the classic vector-db pitfall, measured here by the
  * shortfall column the oracle pins).
  *
  * Scale shape: the predicate is a plain pushable comparison on the scan
  * (`label <= 4` reaches PushedFilters — plan-asserted in
  * FilteredAnnSpec), so the corpus side shrinks at the source before any
  * dot product runs; scoring is the ss_cosine_topk broadcast-anchor
  * single-scan shape with hoisted norms. For corpus-scale anchor sets the
  * same predicate composes with the IVF probe equi-join unchanged.
  */
object SimilarityQueries6 {

  def defs: Map[String, Q] = Map(

    "ss_filtered_ann" -> Q(
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
         |f AS (SELECT * FROM embeddings WHERE label <= 4),
         |scored AS (
         |  SELECT q.qid, f.vec_id, f.label,
         |         ${duckCosine("f.embedding", "q.qv")} AS cosine
         |  FROM f, q WHERE f.vec_id <> q.qid),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
         |  FROM scored),
         |plain AS (
         |  SELECT q.qid, e.vec_id, e.label,
         |         ${duckCosine("e.embedding", "q.qv")} AS cosine,
         |         ROW_NUMBER() OVER (PARTITION BY q.qid
         |                            ORDER BY ${duckCosine("e.embedding", "q.qv")} DESC, e.vec_id) AS rank
         |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
         |shortfall AS (
         |  SELECT qid, CAST(5 - SUM(CASE WHEN label <= 4 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS postfilter_shortfall
         |  FROM plain WHERE rank <= 5 GROUP BY qid)
         |SELECT r.qid, r.vec_id, r.label, r.cosine, CAST(r.rank AS INTEGER) AS rank,
         |       s.postfilter_shortfall
         |FROM ranked r JOIN shortfall s ON r.qid = s.qid
         |WHERE r.rank <= 5 ORDER BY r.qid, r.rank""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", nativeNorm(col("embedding")))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nrm").as("qnrm"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
      def scoredOn(base: org.apache.spark.sql.DataFrame) =
        base.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"), col("label"),
                  (nativeDot(col("embedding"), col("qv")) / (col("nrm") * col("qnrm")))
                    .as("cosine"))
          .withColumn("rank", row_number().over(w))
      val filtered = scoredOn(e.filter(col("label") <= 4)).filter(col("rank") <= 5)
      // how many of the UNfiltered top-5 a post-filter would have kept —
      // the under-delivery a pre-filter search avoids
      val shortfall = scoredOn(e).filter(col("rank") <= 5)
        .groupBy("qid")
        .agg((lit(5) - sum(when(col("label") <= 4, 1L).otherwise(0L)))
          .as("postfilter_shortfall"))
      filtered.join(shortfall, "qid")
        .select(col("qid"), col("vec_id"), col("label"), col("cosine"),
                col("rank"), col("postfilter_shortfall"))
        .orderBy("qid", "rank")
    }
  )
}
