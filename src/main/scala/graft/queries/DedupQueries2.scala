package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable.duckH
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
    "dd_dup_spans" -> Q(
      s"""WITH $spanCtes
         |SELECT da, db, start_a, start_b, span_len
         |FROM spans
         |ORDER BY da, db, start_a, start_b""".stripMargin) { (s, d) =>
      spansCached(s, d).orderBy("da", "db", "start_a", "start_b")
    },

    // The ACTION the span detector drives (Lee et al. 2022's "deduplicate
    // the training data" step): for every detected span pair the larger
    // doc_id loses its copy (the min doc of each family keeps the text),
    // and per affected doc the removable token ranges are interval-UNIONED
    // (overlapping spans from different partners must not double-count)
    // into exact removal accounting: how many tokens scrubbing drops and
    // how many survive. Interval union is the gaps-and-islands window:
    // an interval starts a new island iff its start clears the running
    // max end; island coverage is then contiguous by construction.
    // Scale shape: inherits the span pipeline's bounds (rare-gram
    // blocking, (pair, diagonal) windows); the union windows partition
    // per DOC and hold only that doc's span intervals; token counts come
    // from the already-materialized gram table (max gram position + 8),
    // never a second corpus scan. All-integer output, oracle-exact.
    "dd_span_scrub" -> Q(
      s"""WITH $spanCtes,
         |iv AS (
         |  SELECT db AS doc_id, start_b AS s, start_b + span_len AS e FROM spans),
         |mx AS (
         |  SELECT doc_id, s, e,
         |         MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
         |  FROM iv),
         |isl AS (
         |  SELECT doc_id, s, e,
         |         SUM(CASE WHEN pmax IS NULL OR s >= pmax THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY doc_id ORDER BY s, e
         |                 ROWS UNBOUNDED PRECEDING) AS island
         |  FROM mx),
         |un AS (SELECT doc_id, island, MIN(s) AS s0, MAX(e) AS e1
         |       FROM isl GROUP BY doc_id, island),
         |acc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         |               CAST(SUM(e1 - s0) AS BIGINT) AS tokens_removed
         |        FROM un GROUP BY doc_id),
         |nt AS (SELECT doc_id, MAX(p) + 8 AS n_tokens FROM g GROUP BY doc_id)
         |SELECT a.doc_id, n.n_tokens, a.n_spans, a.tokens_removed,
         |       n.n_tokens - a.tokens_removed AS tokens_kept
         |FROM acc a JOIN nt n ON a.doc_id = n.doc_id
         |ORDER BY a.doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val g  = grams(s, d)
      val iv = spansCached(s, d)
        .select(col("db").as("doc_id"), col("start_b").as("s"),
                (col("start_b") + col("span_len")).as("e"))
      val wPrev = Window.partitionBy("doc_id").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.partitionBy("doc_id").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val un = iv
        .withColumn("pmax", max(col("e")).over(wPrev))
        .withColumn("ni", when(col("pmax").isNull || col("s") >= col("pmax"), 1)
          .otherwise(0))
        .withColumn("island", sum(col("ni")).over(wCum))
        .groupBy("doc_id", "island")
        .agg(min(col("s")).as("s0"), max(col("e")).as("e1"))
      val acc = un.groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"), sum(col("e1") - col("s0")).as("tokens_removed"))
      val nt = g.groupBy("doc_id").agg((max(col("p")) + 8).as("n_tokens"))
      acc.join(nt, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("n_spans"), col("tokens_removed"),
                (col("n_tokens") - col("tokens_removed")).as("tokens_kept"))
        .orderBy("doc_id")
    },

    // Content-defined chunking (CDC) dedup: the shift-RESISTANT
    // counterpart of dd_chunk_dedup's fixed 20-token alignment. A chunk
    // boundary falls AFTER any token whose 32-bit hash ≡ 0 (mod 8), so
    // boundaries are a property of the CONTENT — inserting one token
    // near the top of a doc perturbs only the chunk containing it, and
    // every later chunk still dedups against its copies elsewhere
    // (the rsync/FastCDC cut-point rule; fixed-width chunking loses all
    // downstream chunks to the alignment shift). Expected chunk length
    // is the gear-mask reciprocal (8 tokens). Emitted: every chunk text
    // duplicated across the corpus (≥2 copies) with copy/doc counts.
    // Scale shape: chunking is ARRAY-NATIVE per row — cut positions by
    // a HOF filter, boundary (start,end) pairs by zip_with, chunk text
    // by slice+concat_ws — so the corpus never explodes to token rows
    // and there is NO per-doc window (the token-stream + running-sum
    // shape shuffles every token; measured 1.25×/1.1× slower at
    // sf1/sf10 — the md5 work dominates either way, the array form
    // just removes the per-token shuffle that hurts first on a real
    // cluster); the only explode is at CHUNK granularity feeding the
    // dedup aggregate, which shuffles 60-bit hashes with the two-level
    // (hash, doc) pre-combine — the same bounds as dd_chunk_dedup, plus
    // the boundary-stability property that makes CDC the right
    // granularity for evolving corpora. The oracle keeps the windowed
    // token-stream formulation — same chunks, different plan.
    "dd_cdc_chunks" -> Q(
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |tok AS (
         |  SELECT doc_id, toks[p] AS token, p
         |  FROM t, unnest(range(1, len(toks) + 1)) u(p)),
         |cut AS (
         |  SELECT doc_id, token, p,
         |         CASE WHEN ${duckH("token", 8)} % 8 = 0 THEN 1 ELSE 0 END AS f
         |  FROM tok),
         |cid AS (
         |  SELECT doc_id, token, p,
         |         COALESCE(SUM(f) OVER (PARTITION BY doc_id ORDER BY p
         |                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |                  0) AS chunk_id
         |  FROM cut),
         |ck AS (
         |  SELECT doc_id, chunk_id,
         |         ${duckH("string_agg(token, ' ' ORDER BY p)", 15)} AS ch,
         |         CAST(COUNT(*) AS BIGINT) AS n_tokens
         |  FROM cid GROUP BY doc_id, chunk_id),
         |pre AS (
         |  SELECT ch, doc_id, MIN(n_tokens) AS n_tokens, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM ck GROUP BY ch, doc_id)
         |SELECT ch AS chunk_hash, CAST(SUM(c) AS BIGINT) AS n_copies,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       MIN(n_tokens) AS n_tokens, MIN(doc_id) AS first_doc
         |FROM pre GROUP BY ch HAVING SUM(c) >= 2
         |ORDER BY n_copies DESC, chunk_hash""".stripMargin) { (s, d) =>
      // one-pass kernel (round 10, functions/Shingles.scala): cut AFTER
      // any token whose h32 ≡ 0 (mod 8), h60 over each chunk's byte
      // slice — the previous form chained four HOF lambdas (filter cut
      // points, boundary arrays, zip_with slice+concat_ws, empty
      // filter) with interpreted md5 per token AND per chunk; the
      // kernel walks the bytes once and the chunk text never
      // materializes. ShinglesSpec pins kernel ≡ the HOF chain.
      graft.functions.Shingles.register(s)
      val ck = Tables.documents(s, d)
        .select(col("doc_id"),
                explode(call_function("graft_cdc_chunks", col("text"))).as("c"))
        .select(col("doc_id"), col("c.ch").as("ch"), col("c.n_tokens").as("n_tokens"))
      ck.groupBy("ch", "doc_id")
        .agg(min(col("n_tokens")).as("n_tokens"), count(lit(1)).as("c"))
        .groupBy(col("ch").as("chunk_hash"))
        .agg(sum(col("c")).as("n_copies"), count(lit(1)).as("n_docs"),
             min(col("n_tokens")).as("n_tokens"), min(col("doc_id")).as("first_doc"))
        .filter(col("n_copies") >= 2)
        .orderBy(col("n_copies").desc, col("chunk_hash"))
    }
  )

  /** The dup-span CTE chain shared by detection (`dd_dup_spans`) and the
    * scrub accounting (`dd_span_scrub`) — DuckDB twin of [[grams]] +
    * [[spansOf]]. Ends at `spans` (the ≥10-token maximal shared runs);
    * `g` stays visible for downstream token-count derivation.
    */
  private def spanCtes: String = {
    val gh = graft.functions.Portable.duckH("array_to_string(toks[i:i+7], ' ')", 8)
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
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
       |  FROM dg GROUP BY da, db, diag, run),
       |spans AS (SELECT * FROM sp WHERE span_len >= 10)""".stripMargin
  }

  /** Per-doc 8-gram hash table (doc_id, p, gh), eagerly checkpointed: it
    * feeds the df-dim, the join-side instances, both halves of the
    * self-join, and the scrub's token counts — materialized once (the
    * suffix-array analogue also builds its index once; at 100 TB this
    * barrier becomes a checkpoint dir, same as the CC loop). Cached per
    * CORPUS, not per call (the coSupplyCounts/tradeEdges pattern):
    * dd_dup_spans and dd_span_scrub each consumed their own build
    * before — the second consumer now reads the first's checkpoint.
    * Evicted with the artifact store. */
  private val gramCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  graft.ArtifactStore.onInvalidate(gramCache.remove(_))

  private[queries] def grams(s: org.apache.spark.sql.SparkSession,
                    d: String): org.apache.spark.sql.DataFrame =
    gramCache.computeIfAbsent(d, _ => {
      // hashed-shingle kernel (round 10, functions/Shingles.scala):
      // positions preserved by posexplode over the kernel's positional
      // array; values byte-identical to h32 over the HOF form
      graft.functions.Shingles.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"),
                posexplode(call_function("graft_shingle_h32",
                  col("text"), lit(8), lit(2))).as(Seq("p", "gh")))
        .select(col("doc_id"), col("p").cast("long").as("p"), col("gh"))
        .localCheckpoint(true)
    })

  /** Maximal shared spans (≥10 tokens) between doc pairs: rare grams
    * (df 2–3) meet in an equi-join, same-diagonal consecutive positions
    * coalesce via the run-id window. See `dd_dup_spans`' scaladoc for
    * the rarity-cap tradeoff.
    */
  /** The detected span frame per CORPUS (rare-gram join + diagonal-run
    * windows), shared by dd_dup_spans (reports it) and dd_span_scrub
    * (unions its intervals): span-family-bounded rows, checkpointed
    * once. Evicted with the artifact store. */
  private val spanCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  graft.ArtifactStore.onInvalidate(spanCache.remove(_))

  private[queries] def spansCached(s: org.apache.spark.sql.SparkSession,
                                   d: String): org.apache.spark.sql.DataFrame =
    spanCache.computeIfAbsent(d, _ => spansOf(grams(s, d)).localCheckpoint(true))

  private def spansOf(g: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
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
  }
}
