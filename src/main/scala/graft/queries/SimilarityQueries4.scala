package graft.queries

import graft.{Q, Tables}
import graft.functions.Vectors._
import graft.functions.FloatDot
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** kNN label classification over `embeddings` — the evaluation harness a
  * labeled-embedding corpus exists for: hold out the query vectors
  * (vec_id < 10), vote their labels from the k=10 nearest train vectors
  * by cosine, and report predicted vs true per query (vote ties break to
  * the smaller label).
  *
  * Scale shape: identical to ss_cosine_topk — the held-out query set is
  * a broadcast, the train corpus is scanned once with a fused codegen
  * dot-product fold and never shuffles; per-query ranking is rank-k
  * inside the qid partition, and the vote aggregate runs on ≤ q·k rows.
  * For corpus-scale query sets the broadcast swaps for the IVF probe
  * equi-join (ss_ivf_ann) with the same voting tail. The vote/verdict
  * columns are all integers, so the result is hash-exact against the
  * oracle even though the ranking key is the (bit-identical, see
  * Vectors) float cosine.
  */
object SimilarityQueries4 {

  private val K = 10

  def defs: Map[String, Q] = Map(

    "ss_knn_classify" -> Q(
      s"""WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qv
         |           FROM embeddings WHERE vec_id < 10),
         |c AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id >= 10),
         |scored AS (
         |  SELECT q.qid, q.qlabel, c.vec_id, c.label,
         |         ${duckCosine("c.embedding", "q.qv")} AS cosine
         |  FROM c, q),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rnk
         |  FROM scored),
         |votes AS (
         |  SELECT qid, qlabel, label, CAST(COUNT(*) AS BIGINT) AS n_votes
         |  FROM ranked WHERE rnk <= $K GROUP BY qid, qlabel, label),
         |best AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY n_votes DESC, label) AS vr
         |  FROM votes)
         |SELECT qid, qlabel AS true_label, label AS pred_label, n_votes,
         |       CASE WHEN label = qlabel THEN 1 ELSE 0 END AS correct
         |FROM best WHERE vr = 1 ORDER BY qid""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", nativeNorm(col("embedding")))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
                col("embedding").as("qv"), col("nrm").as("qnrm"))
      val c = e.filter(col("vec_id") >= 10)
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
      val wv = Window.partitionBy("qid").orderBy(col("n_votes").desc, col("label"))
      c.crossJoin(broadcast(q))
        .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
          (nativeDot(col("embedding"), col("qv")) / (col("nrm") * col("qnrm"))).as("cosine"))
        .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= K)
        .groupBy("qid", "qlabel", "label").agg(count(lit(1)).as("n_votes"))
        .withColumn("vr", row_number().over(wv)).filter(col("vr") === 1)
        .select(col("qid"), col("qlabel").as("true_label"), col("label").as("pred_label"),
                col("n_votes"),
                when(col("label") === col("qlabel"), 1).otherwise(0).as("correct"))
        .orderBy("qid")
    }
  )
}
