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
    },

    // Exact duplicated-substring SPANS across document pairs (the
    // ExactSubstr pass of Lee et al. 2022, "Deduplicating Training Data
    // Makes Language Models Better") — where dd_chunk_dedup removes
    // aligned duplicate passages, this finds UNALIGNED shared runs: every
    // 8-token gram is hashed positionally, grams shared by 2–3 documents
    // (the dd_winnow_pairs rarity cap, which bounds every join bucket at
    // any corpus scale) join into (pos_a, pos_b) matches, and matches on
    // the same diagonal (pos_a − pos_b constant) with consecutive
    // positions coalesce into maximal spans via the run-id window trick.
    // A span shared by ≥4 docs falls outside the rarity cap by design —
    // the same popular-family tradeoff the winnow blocking states.
    // Scale shape: the gram df-dim is a map-side-combined aggregate, hot
    // grams never shuffle as pairs (dropped at the rare-dim join), the
    // run windows partition by (pair, diagonal) — bounded by the longest
    // shared span, never the corpus. All-integer output, oracle-exact.
    "dd_dup_spans" -> Q({
      val gh = graft.functions.Portable.duckH("array_to_string(toks[i:i+7], ' ')", 8)
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, $gh AS gh
         |  FROM t, unnest(range(1, len(toks) - 6)) u(i)),
         |rare AS (
         |  SELECT gh FROM g GROUP BY gh
         |  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 3),
         |i AS (SELECT g.* FROM g JOIN rare r ON g.gh = r.gh),
         |pr AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db, a.p AS pa, b.p AS pb
         |  FROM i a JOIN i b ON a.gh = b.gh AND a.doc_id < b.doc_id),
         |dg AS (
         |  SELECT *, pa - pb AS diag,
         |         pa - ROW_NUMBER() OVER (PARTITION BY da, db, pa - pb ORDER BY pa)
         |           AS run
         |  FROM pr),
         |sp AS (
         |  SELECT da, db, MIN(pa) AS start_a, MIN(pb) AS start_b,
         |         CAST(COUNT(*) + 7 AS BIGINT) AS span_len
         |  FROM dg GROUP BY da, db, diag, run)
         |SELECT da, db, start_a, start_b, span_len
         |FROM sp WHERE span_len >= 10
         |ORDER BY da, db, start_a, start_b""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.functions.Portable.h32
      val ghArr = when(size(col("toks")) >= 8,
        transform(sequence(lit(0), size(col("toks")) - 8), i =>
          h32(concat_ws(" ", slice(col("toks"), i + 1, lit(8))))))
        .otherwise(array().cast("array<bigint>"))
      // eager checkpoint: the gram table feeds the df-dim, the join-side
      // instances, AND both halves of the self-join — materialized once
      // (the suffix-array analogue also builds its index once; at 100 TB
      // this barrier becomes a checkpoint dir, same as the CC loop)
      val g = Tables.documents(s, d)
        .repartition(col("doc_id")) // spread the per-doc hashing (1-file scan)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), posexplode(ghArr).as(Seq("p", "gh")))
        .select(col("doc_id"), col("p").cast("long").as("p"), col("gh"))
        .localCheckpoint(true)
      val rare = g.groupBy("gh")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2 && col("df") <= 3)
        .select("gh")
      val i  = g.join(rare, "gh")
      val a  = i.select(col("gh"), col("doc_id").as("da"), col("p").as("pa"))
      val b  = i.select(col("gh").as("gh2"), col("doc_id").as("db"), col("p").as("pb"))
      val pr = a.join(b, col("gh") === col("gh2") && col("da") < col("db"))
        .withColumn("diag", col("pa") - col("pb"))
      val wRun = Window.partitionBy("da", "db", "diag").orderBy("pa")
      pr.withColumn("run", col("pa") - row_number().over(wRun))
        .groupBy("da", "db", "diag", "run")
        .agg(min(col("pa")).as("start_a"), min(col("pb")).as("start_b"),
             (count(lit(1)) + 7).as("span_len"))
        .filter(col("span_len") >= 10)
        .select("da", "db", "start_a", "start_b", "span_len")
        .orderBy("da", "db", "start_a", "start_b")
    }
  )
}
