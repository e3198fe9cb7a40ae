package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Sub-document deduplication: the chunk-level (line-level) exact-dedup
  * pass of a training pipeline — duplicate PASSAGES are removed across
  * documents while the documents themselves survive (the RefinedWeb /
  * CCNet shape, at fixed 20-token chunk granularity so the oracle stays
  * exact). Complements DedupQueries, which dedups whole documents.
  */
object DedupQueries2 {

  /** Chunk width in tokens (aligned, last chunk may be short). */
  private val CHUNK = 20

  def defs: Map[String, Q] = Map(

    // Chunk-level exact dedup with per-document retention accounting:
    // each doc splits into aligned 20-token chunks, chunks dedup
    // globally by md5, the canonical copy is the smallest
    // (doc_id, chunk_id), and every doc reports how much of it
    // survives. Scale shape: chunks are built by slice()+concat_ws on
    // the token array (no per-token explode), the shuffle is one
    // 32-hex-char hash per chunk, the ownership aggregate is map-side
    // combined, and the flag join is an equi-join on the chunk hash.
    // At 100 TB this is the standard "passage dedup" stage — nothing
    // here depends on corpus-wide state beyond the hash groupBy.
    "dd_chunk_dedup" -> Q(
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |ch AS (
         |  SELECT doc_id, CAST((s - 1) // $CHUNK AS BIGINT) AS chunk_id,
         |         md5(array_to_string(toks[s:s+${CHUNK - 1}], ' ')) AS hc
         |  FROM t, unnest(range(1, len(toks) + 1, $CHUNK)) u(s)),
         |own AS (
         |  SELECT hc, COUNT(*) AS n,
         |         MIN(doc_id * 1000000 + chunk_id) AS owner_key
         |  FROM ch GROUP BY hc),
         |fl AS (
         |  SELECT c.doc_id,
         |         CASE WHEN o.n > 1 THEN 1 ELSE 0 END AS is_dup,
         |         CASE WHEN o.n > 1 AND c.doc_id * 1000000 + c.chunk_id <> o.owner_key
         |              THEN 1 ELSE 0 END AS removed
         |  FROM ch c JOIN own o ON c.hc = o.hc)
         |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_chunks,
         |       CAST(SUM(is_dup) AS INTEGER) AS n_dup_chunks,
         |       CAST(SUM(removed) AS INTEGER) AS n_removed,
         |       CAST(COUNT(*) - SUM(removed) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |         AS retained_share
         |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val ch = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("chunk_id",
          explode(expr(s"sequence(0, (size(toks) - 1) div $CHUNK)")))
        .select(col("doc_id"), col("chunk_id"),
          md5(concat_ws(" ",
            expr(s"slice(toks, chunk_id * $CHUNK + 1, $CHUNK)"))).as("hc"))
      val own = ch.groupBy(col("hc").as("ohc"))
        .agg(count(lit(1)).as("n"),
             min(col("doc_id") * 1000000L + col("chunk_id")).as("owner_key"))
      ch.join(own, col("hc") === col("ohc"))
        .select(col("doc_id"),
                when(col("n") > 1, 1).otherwise(0).as("is_dup"),
                when(col("n") > 1 &&
                     col("doc_id") * 1000000L + col("chunk_id") =!= col("owner_key"),
                     1).otherwise(0).as("removed"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_chunks"),
             sum(col("is_dup")).cast("int").as("n_dup_chunks"),
             sum(col("removed")).cast("int").as("n_removed"),
             ((count(lit(1)) - sum(col("removed"))).cast("double") /
              count(lit(1)).cast("double")).as("retained_share"))
        .orderBy("doc_id")
    }
  )
}
