package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** b-bit minwise hashing (Li & König, CACM 2011): store only the lowest
  * b bits of each minhash value — at b=2 that is a 30× signature-memory
  * cut against the 61-bit mins — and recover Jaccard from the collision
  * rate with the debiasing the truncation demands: a random non-matching
  * pair still collides with probability 1/2^b, so
  *
  *   Ĵ_b = (P̂ − 1/2^b) / (1 − 1/2^b),  P̂ = collisions / K
  *
  * (the r→0 form of the paper's estimator — exact for the universal-hash
  * family here, whose values spread uniformly mod 2^b). The query scores
  * the SAME capped LSH candidate set as dd_minhash_pairs with both
  * estimators side by side — full-width matches next to 2-bit matches —
  * so the compression's estimator variance is measured, not asserted,
  * and every number is hash-checked (integers until one final division).
  *
  * Scale shape: the pair frame is the per-corpus checkpointed candidate
  * artifact (estPairsCached); signatures for the b-bit comparison are
  * recomputed ONLY for documents appearing in some pair (the
  * candidateShingleSides semi-join discipline), so no second corpus-wide
  * shingle pass exists.
  */
object DedupQueries5 {

  private val K = 8
  private val B = 2            // bits kept per minhash value
  private val M = 1 << B       // modulus (4)

  def defs: Map[String, Q] = Map(

    "dd_bbit_minhash" -> Q(
      s"""WITH ${DedupQueries.duckCandCte},
         |j AS (
         |  SELECT c.da, c.db,
         |         (${(0 until K).map(j => s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END").mkString(" + ")}) AS cf,
         |         (${(0 until K).map(j => s"CASE WHEN a.s$j % $M = b.s$j % $M THEN 1 ELSE 0 END").mkString(" + ")}) AS cb
         |  FROM cand c
         |  JOIN sig a ON a.doc_id = c.da
         |  JOIN sig b ON b.doc_id = c.db)
         |SELECT da, db,
         |       CAST(cf AS INTEGER) AS matches_full,
         |       CAST(cb AS INTEGER) AS matches_b2,
         |       CAST(cf AS DOUBLE) / CAST($K AS DOUBLE) AS est_full,
         |       CAST($M * cb - $K AS DOUBLE) / CAST(${(M - 1) * K} AS DOUBLE) AS est_b2
         |FROM j ORDER BY da, db""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = DedupQueries.estPairsCached(docs, d).select("da", "db")
      // signatures only for documents some pair touches — the corpus is
      // never re-shingled for this comparison
      val ids = cand.select(col("da").as("doc_id"))
        .union(cand.select(col("db").as("doc_id"))).distinct()
      val sig = DedupQueries.sigDf(docs.join(ids, Seq("doc_id"), "left_semi"))
      val sa = sig.select(
        (col("doc_id").as("a_id") +: (0 until K).map(j => col(s"s$j").as(s"a$j"))): _*)
      val sb = sig.select(
        (col("doc_id").as("b_id") +: (0 until K).map(j => col(s"s$j").as(s"b$j"))): _*)
      val cf = (0 until K).map(j => when(col(s"a$j") === col(s"b$j"), 1).otherwise(0))
        .reduce(_ + _)
      val cb = (0 until K).map(j =>
          when(col(s"a$j") % M === col(s"b$j") % M, 1).otherwise(0))
        .reduce(_ + _)
      cand.join(sa, col("da") === col("a_id"))
        .join(sb, col("db") === col("b_id"))
        .select(col("da"), col("db"),
          cf.cast("int").as("matches_full"),
          cb.cast("int").as("matches_b2"))
        .select(col("da"), col("db"), col("matches_full"), col("matches_b2"),
          (col("matches_full").cast("double") / lit(K.toDouble)).as("est_full"),
          ((lit(M) * col("matches_b2") - lit(K)).cast("double")
            / lit(((M - 1) * K).toDouble)).as("est_b2"))
        .orderBy("da", "db")
    })
}
