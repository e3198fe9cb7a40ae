package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Retrieval and corpus-curation surface over `documents`: BM25 ranked
  * search (the query-side counterpart of `ta_inverted_index`'s index
  * build) and the per-source quality profile that drives domain-level
  * keep/drop decisions (the RefinedWeb / C4 "blocklist the bad domains"
  * stage). Like the reference's consume path these are read-side
  * operators; the analytics surface is the mandated extension.
  *
  * Everything is BIGINT arithmetic end to end — BM25's fractional
  * parameters (k1=1.2, b=0.75) enter as parts-per-thousand scale
  * factors with explicit integer division, so partial-aggregate order
  * can never move a bit and the DuckDB oracle matches exactly.
  */
object TextQueries3 {

  /** The fixed search query (every term is in the corpus vocabulary). */
  private val QTERMS = Seq("table", "scan", "fast")

  private def qlist: String = QTERMS.map(t => s"'$t'").mkString(", ")

  def defs: Map[String, Q] = Map(

    // BM25 top-10: score(d) = Σ_t idf(t)·tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)).
    // Scaled-integer evaluation: idf_s = (N−df)·10⁴ ÷ (df+1) (the
    // Robertson idf without the log — monotone in df, exact in integers,
    // same reason ta_tfidf uses linear idf); norm_s = 10³·(1−b+b·|d|/avgdl)
    // with avgdl itself carried ×10³. Per-(doc,term) scores are BIGINTs,
    // so the final per-doc SUM is order-independent. Overflow headroom:
    // idf_s ≤ N·10⁴, tf ≤ |d|, ×2200 → ~N·|d|·2·10⁷ ≪ 2⁶³ for any corpus
    // this engine targets (at 10⁹ docs × 10³ tokens the product is
    // ~2·10¹⁹ — a real deployment would descale idf_s by 10; documented,
    // not silently wrong). Scale shape: DOCUMENT-at-a-time, zero
    // explode — per-doc tf for each query term is size(filter(toks)),
    // so the corpus never shuffles as tokens; corpus totals (N, avgdl,
    // per-term df) are ONE map-side-combined aggregate collapsed to a
    // 1-row localCheckpoint and broadcast back, so the scorer pass is
    // the only other corpus scan (2 scans total, vs 3 + an explode
    // shuffle for the naive term-table shape); per-doc term scores are
    // column arithmetic, and the only corpus-wide movement is the
    // final top-10 (TakeOrderedAndProject). The oracle keeps the
    // classic term-table formulation — same values, different plan.
    "ta_bm25_search" -> Q(
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len FROM tok GROUP BY doc_id),
         |stats AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         (CAST(SUM(len) AS BIGINT) * 1000) // CAST(COUNT(*) AS BIGINT) AS avgdl_s
         |  FROM dl),
         |tf AS (
         |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM tok WHERE token IN ($qlist) GROUP BY doc_id, token),
         |df AS (
         |  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
         |idf AS (
         |  SELECT token, ((s.n_docs - df) * 10000) // (df + 1) AS idf_s
         |  FROM df, stats s),
         |scored AS (
         |  SELECT t.doc_id, t.token,
         |         (i.idf_s * t.tf * 2200) //
         |           (t.tf * 1000 + (1200 * (250 + (750 * d.len * 1000) // s.avgdl_s)) // 1000)
         |           AS term_s
         |  FROM tf t
         |  JOIN idf i ON t.token = i.token
         |  JOIN dl d ON t.doc_id = d.doc_id, stats s)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
         |       CAST(SUM(term_s) AS BIGINT) AS score_s
         |FROM scored GROUP BY doc_id
         |ORDER BY score_s DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
      val tfCols = QTERMS.indices.map { i =>
        size(filter(col("toks"), t => t === QTERMS(i))).cast("long").as(s"tf$i")
      }
      val perDoc = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id") +: size(col("toks")).cast("long").as("len") +: tfCols: _*)
      // corpus totals: one map-side-combined aggregate → 1 row, eager
      // (the scorer pass below must not re-run this lineage)
      val totalCols =
        expr("(sum(len) * 1000) div count(*)").as("avgdl_s") +:
        QTERMS.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
      val totals = perDoc.agg(count(lit(1)).as("n_docs"), totalCols: _*)
        .localCheckpoint(true)
      val termS = QTERMS.indices.map { i =>
        when(col(s"tf$i") > 0,
          expr(s"""(((n_docs - df$i) * 10000) div (df$i + 1)) * tf$i * 2200 div
                  |(tf$i * 1000 + (1200 * (250 + (750 * len * 1000) div avgdl_s)) div 1000)"""
            .stripMargin.replace("\n", " ")))
      }
      perDoc.crossJoin(broadcast(totals))
        .select(col("doc_id"),
          QTERMS.indices.map(i => when(col(s"tf$i") > 0, 1L).otherwise(0L))
            .reduce(_ + _).as("n_terms"),
          termS.map(c => coalesce(c, lit(0L))).reduce(_ + _).as("score_s"))
        .filter(col("n_terms") > 0)
        .orderBy(col("score_s").desc, col("doc_id"))
        .limit(10)
    },

    // Per-source curation profile: the domain-blocklist decision table.
    // For every source: volume, exact-duplicate share (via 60-bit text
    // hashes — 8-byte keys shuffle, documents don't), short-doc share,
    // and the keep/drop verdict at fixed thresholds (≥50% dups or ≥30%
    // short ⇒ drop — the "spam domain" rule). Shares are parts-per-
    // thousand integers. Scale shape: distinct-per-source goes through
    // a two-level aggregate ((source, hash) pre-combine, then source) —
    // no count(distinct) Expand doubling the scan rows; everything else
    // is one map-side-combined pass.
    "ta_source_profile" -> Q(
      s"""WITH h AS (
         |  SELECT source, n_chars, ${duckH("text", 15)} AS th FROM documents),
         |uniq AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct
         |  FROM (SELECT DISTINCT source, th FROM h) GROUP BY source),
         |base AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |         CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) AS short_docs
         |  FROM h GROUP BY source)
         |SELECT b.source, b.n_docs,
         |       (b.total_chars * 100) // b.n_docs AS mean_chars_x100,
         |       b.n_docs - u.n_distinct AS dup_docs,
         |       ((b.n_docs - u.n_distinct) * 1000) // b.n_docs AS dup_permille,
         |       (b.short_docs * 1000) // b.n_docs AS short_permille,
         |       CASE WHEN ((b.n_docs - u.n_distinct) * 1000) // b.n_docs < 500
         |             AND (b.short_docs * 1000) // b.n_docs < 300
         |            THEN 1 ELSE 0 END AS keep
         |FROM base b JOIN uniq u ON b.source = u.source
         |ORDER BY b.source""".stripMargin) { (s, d) =>
      val h = Tables.documents(s, d)
        .select(col("source"), col("n_chars"), h60(col("text")).as("th"))
      val uniq = h.select("source", "th").distinct()
        .groupBy(col("source").as("u_source"))
        .agg(count(lit(1)).as("n_distinct"))
      val base = h.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("total_chars"),
             sum(when(col("n_chars") < 100, 1L).otherwise(0L)).as("short_docs"))
      base.join(uniq, col("source") === col("u_source"))
        .select(col("source"), col("n_docs"),
          expr("(total_chars * 100) div n_docs").as("mean_chars_x100"),
          (col("n_docs") - col("n_distinct")).as("dup_docs"),
          expr("((n_docs - n_distinct) * 1000) div n_docs").as("dup_permille"),
          expr("(short_docs * 1000) div n_docs").as("short_permille"),
          when(expr("((n_docs - n_distinct) * 1000) div n_docs") < 500 &&
               expr("(short_docs * 1000) div n_docs") < 300, 1)
            .otherwise(0).as("keep"))
        .orderBy("source")
    },

    // Deterministic output sharding — the LAST stage of every training
    // pipeline: hash-assign each doc to one of 16 output shards with a
    // salted key (salt "shuf1" = the epoch-1 shuffle; a new salt is a
    // fresh epoch-order without moving data twice). The report is the
    // shard balance table a dataloader depends on: docs, tokens, and
    // token skew per shard. Scale shape: pure per-row hash + one
    // map-side-combined aggregate — embarrassingly parallel; at 100 TB
    // the same expression IS the partitionBy key of the final write.
    "ta_shuffle_shards" -> Q(
      s"""WITH s AS (
         |  SELECT ${duckH("'shuf1|' || CAST(doc_id AS VARCHAR)", 15)} % 16 AS shard,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
         |         doc_id
         |  FROM documents)
         |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(ntok) AS BIGINT) AS total_tokens,
         |       MIN(doc_id) AS first_doc
         |FROM s GROUP BY shard ORDER BY shard""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(pmod(h60(concat(lit("shuf1|"), col("doc_id").cast("string"))), lit(16L))
                  .as("shard"),
                size(split(col("text"), " ")).cast("long").as("ntok"),
                col("doc_id"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("total_tokens"),
             min(col("doc_id")).as("first_doc"))
        .orderBy("shard")
    },

    // Power-of-2 length bucketing — the batching-efficiency report: a
    // dataloader that pads every sequence in a batch to the bucket
    // width wastes (bucket − len) tokens per doc, and this table prices
    // that waste per bucket (the argument for length-grouped batching).
    // Buckets are the fixed 8..4096 power chain (everything larger
    // falls in 8192), identical CASE in both twins. Scale shape: one
    // per-row bucket expression + one map-side-combined aggregate.
    "ta_length_buckets" -> Q({
      val cases = (3 to 12).map(p => math.pow(2, p).toLong)
        .map(b => s"WHEN ntok <= $b THEN $b").mkString(" ")
      s"""WITH s AS (
         |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok FROM documents),
         |b AS (SELECT ntok, CAST(CASE $cases ELSE 8192 END AS BIGINT) AS bucket FROM s)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(ntok) AS BIGINT) AS total_tokens,
         |       CAST(SUM(bucket - ntok) AS BIGINT) AS padding_waste
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
    }) { (s, d) =>
      val ntok = size(split(col("text"), " ")).cast("long")
      val bucket = (3 to 12).map(p => math.pow(2, p).toLong)
        .foldRight(lit(8192L): Column) { (b, els) => when(col("ntok") <= b, b).otherwise(els) }
      Tables.documents(s, d)
        .select(ntok.as("ntok"))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("total_tokens"),
             sum(col("bucket") - col("ntok")).as("padding_waste"))
        .orderBy("bucket")
    }
  )
}
