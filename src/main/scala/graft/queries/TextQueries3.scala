package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
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
    // not silently wrong). Scale shape: one corpus tokenize, the
    // query-term filter drops everything but |Q| tokens per doc BEFORE
    // any shuffle, doc lengths come map-side-combined from the same
    // scan, and the N/avgdl scalars broadcast as a 1-row cross join —
    // the classic term-at-a-time scorer, never a corpus-wide sort until
    // the final top-10 (TakeOrderedAndProject).
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
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("len"))
      val stats = dl.agg(
        count(lit(1)).as("n_docs"),
        expr("(sum(len) * 1000) div count(*)").as("avgdl_s"))
      val tf = tok.filter(col("token").isin(QTERMS: _*))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token").as("i_token"))
        .agg(count(lit(1)).as("df"))
      val idf = df.crossJoin(broadcast(stats.select("n_docs")))
        .select(col("i_token"), expr("((n_docs - df) * 10000) div (df + 1)").as("idf_s"))
      tf.join(broadcast(idf), col("token") === col("i_token"))
        .join(dl.withColumnRenamed("doc_id", "l_doc"), col("doc_id") === col("l_doc"))
        .crossJoin(broadcast(stats.select("avgdl_s")))
        .select(col("doc_id"),
          expr("""(idf_s * tf * 2200) div
                 |(tf * 1000 + (1200 * (250 + (750 * len * 1000) div avgdl_s)) div 1000)"""
            .stripMargin.replace("\n", " ")).as("term_s"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"), sum(col("term_s")).as("score_s"))
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
    }
  )
}
