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
    // globally by md5, the canonical copy is the LEXICOGRAPHICALLY
    // smallest (doc_id, chunk_id) — ranked by a window over the chunk
    // hash, never a packed doc_id·K+chunk_id key (packing collides for
    // docs with ≥K chunks and overflows large ids) — and every doc
    // reports how much of it survives. Scale shape: chunks are built by
    // slice()+concat_ws on the token array (no per-token explode), the
    // shuffle is one 32-hex-char hash per chunk, and the hc window
    // partitions are bounded by duplicate-family size (the same bound
    // as the hash groupBy). At 100 TB this is the standard "passage
    // dedup" stage — no corpus-wide state beyond the hash partitioning.
    "dd_chunk_dedup" -> Q(
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |ch AS (
         |  SELECT doc_id, CAST((s - 1) // $CHUNK AS BIGINT) AS chunk_id,
         |         md5(array_to_string(toks[s:s+${CHUNK - 1}], ' ')) AS hc
         |  FROM t, unnest(range(1, len(toks) + 1, $CHUNK)) u(s)),
         |fl AS (
         |  SELECT doc_id,
         |         COUNT(*) OVER (PARTITION BY hc) AS n,
         |         ROW_NUMBER() OVER (PARTITION BY hc
         |                            ORDER BY doc_id, chunk_id) AS rn
         |  FROM ch)
         |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_chunks,
         |       CAST(COUNT(CASE WHEN n > 1 THEN 1 END) AS INTEGER) AS n_dup_chunks,
         |       CAST(COUNT(CASE WHEN rn > 1 THEN 1 END) AS INTEGER) AS n_removed,
         |       CAST(COUNT(*) - COUNT(CASE WHEN rn > 1 THEN 1 END) AS DOUBLE)
         |         / CAST(COUNT(*) AS DOUBLE) AS retained_share
         |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ch = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("chunk_id",
          explode(expr(s"sequence(0, (size(toks) - 1) div $CHUNK)")))
        .select(col("doc_id"), col("chunk_id"),
          md5(concat_ws(" ",
            expr(s"slice(toks, chunk_id * $CHUNK + 1, $CHUNK)"))).as("hc"))
      ch
        .withColumn("n", count(lit(1)).over(Window.partitionBy("hc")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("hc").orderBy("doc_id", "chunk_id")))
        .select(col("doc_id"),
                when(col("n") > 1, 1).otherwise(0).as("is_dup"),
                when(col("rn") > 1, 1).otherwise(0).as("removed"))
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
