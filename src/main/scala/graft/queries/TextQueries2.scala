package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Text pipeline, part 2: document chunking and subword units — the two
  * remaining training-data preprocessing shapes (context-window chunking
  * with overlap; BPE-ish subword splitting).
  */
object TextQueries2 {

  /** Feature-hashing dimensionality (hashing-trick buckets). */
  private val FDIM = 64

  private val CHUNK  = 32 // tokens per chunk
  private val STRIDE = 24 // overlap = CHUNK - STRIDE

  def defs: Map[String, Q] = Map(

    // Feature hashing (the hashing-trick vectorizer): every token maps
    // to one of FDIM buckets via the portable md5 family — no vocabulary
    // to build, no dictionary to broadcast, which is WHY the trick
    // scales (sklearn's HashingVectorizer / VW's core idea). Per-doc
    // bucket counts roll up map-side combined; the emitted profile
    // (active dims, exact L2², dominant bucket with smallest-id
    // tiebreak) is all-integer, so the whole vectorizer is
    // oracle-checked bit-for-bit.
    "ta_feature_hash" -> Q(
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |bk AS (
         |  SELECT doc_id,
         |         ${graft.functions.Portable.duckH("token", 8)} % $FDIM AS bucket,
         |         COUNT(*) AS n
         |  FROM tok GROUP BY doc_id, bucket),
         |ranked AS (
         |  SELECT doc_id, bucket, n,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, bucket) AS rn
         |  FROM bk)
         |SELECT doc_id,
         |       CAST(COUNT(*) AS INTEGER) AS nnz,
         |       CAST(SUM(n*n) AS BIGINT) AS l2sq,
         |       CAST(MIN(CASE WHEN rn = 1 THEN bucket END) AS INTEGER) AS top_bucket,
         |       CAST(MIN(CASE WHEN rn = 1 THEN n END) AS BIGINT) AS top_count
         |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      // one-pass kernel (round 11, functions/Shingles.FeatureHashStats):
      // the exploded form paid a per-token interpreted md5→hex→conv
      // chain, a (doc, bucket) aggregate exchange, a per-doc rank window
      // exchange AND a per-doc rollup; the whole profile is a 64-counter
      // in-row fold (same tie-break: max count, then lowest bucket).
      // Sort first, fold after (the q61 move). Parity vs the exploded
      // form pinned in TokenKernelsSpec.
      graft.functions.Shingles.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy("doc_id")
        .select(col("doc_id"), expr("graft_feature_hash(text)").as("st"))
        .select(col("doc_id"), col("st.nnz").cast("int").as("nnz"),
                col("st.l2sq").as("l2sq"),
                col("st.top_bucket").cast("int").as("top_bucket"),
                col("st.top_count").as("top_count"))
    },

    // Overlapping token-window chunking: one row per (doc, chunk) with
    // the chunk text and its token count — the explode shape a context-
    // window pipeline feeds to tokenization/packing downstream.
    "ta_chunking" -> Q(
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents)
         |SELECT doc_id,
         |       CAST((s - 1) // $STRIDE AS INTEGER) AS chunk_no,
         |       array_to_string(toks[s:s+${CHUNK - 1}], ' ') AS chunk_text,
         |       CAST(least($CHUNK, len(toks) - s + 1) AS INTEGER) AS n_chunk_tokens
         |FROM t, unnest(range(1, len(toks) + 1, $STRIDE)) u(s)
         |ORDER BY doc_id, chunk_no""".stripMargin) { (s, d) =>
      val chunks = transform(
        sequence(lit(0), size(col("toks")) - 1, lit(STRIDE)),
        i => struct(
          concat_ws(" ", slice(col("toks"), i + 1, lit(CHUNK))).as("chunk_text"),
          least(lit(CHUNK), size(col("toks")) - i).cast("int").as("n_chunk_tokens")))
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), posexplode(chunks).as(Seq("chunk_no", "c")))
        .select(col("doc_id"), col("chunk_no").cast("int").as("chunk_no"),
                col("c.chunk_text"), col("c.n_chunk_tokens"))
        .orderBy("doc_id", "chunk_no")
    },

    // Inverted index with CAPPED posting lists — the IR-index build
    // shape: per token, document frequency, total occurrences, and the
    // 10 smallest doc ids as the (truncated) posting list. The cap is
    // applied by a token-partitioned row_number BEFORE any list is
    // materialized, so no aggregate ever collects an unbounded posting
    // — the standard impact-ordered index-pruning move at corpus scale.
    // Postings serialize as a comma-joined sorted string (the driver's
    // comparator cannot hash array cells).
    "ta_inverted_index" -> Q(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |occ AS (SELECT token, COUNT(*) AS n_occurrences FROM tok GROUP BY token),
        |td AS (SELECT DISTINCT token, doc_id FROM tok),
        |capped AS (
        |  SELECT token, doc_id,
        |         ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn
        |  FROM td),
        |idx AS (
        |  SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
        |         array_to_string(list_sort(array_agg(doc_id) FILTER (WHERE rn <= 10)),
        |                         ',') AS postings
        |  FROM capped GROUP BY token)
        |SELECT i.token, CAST(i.df AS BIGINT) AS df, o.n_occurrences, i.postings
        |FROM idx i JOIN occ o ON i.token = o.token
        |ORDER BY i.token""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // ONE tokenize pass (round 11): graft_token_counts emits each
      // document's distinct tokens WITH their occurrence counts in-row,
      // so the (token, doc) distinct exchange disappears, df and
      // n_occurrences come from the same rollup (df = COUNT of distinct
      // pairs, n_occurrences = SUM of the in-row counts), and the
      // separate occ branch — a second full explode + aggregate + join —
      // is gone. One token-keyed exchange feeds the cap window and the
      // rollup reuses its partitioning.
      graft.functions.Shingles.register(s)
      val td = Tables.documents(s, d)
        .select(col("doc_id"), explode(expr("graft_token_counts(text, 0)")).as("tc"))
        .select(col("tc.token").as("token"), col("doc_id"),
                col("tc.cnt").as("n_td"))
      val w = Window.partitionBy("token").orderBy("doc_id")
      td.withColumn("rn", row_number().over(w))
        .groupBy("token")
        .agg(count(lit(1)).as("df"),
             sum(col("n_td")).as("n_occurrences"),
             array_join(
               transform(array_sort(collect_list(when(col("rn") <= 10, col("doc_id")))),
                         _.cast("string")), ",").as("postings"))
        .select(col("token"), col("df"), col("n_occurrences"), col("postings"))
        .orderBy("token")
    },

    // BPE-ish subword units: every token split into fixed-stride 2-char
    // units; global unit vocabulary with frequencies (the shape of a
    // learned-merge vocabulary pass, with the merge table stubbed to
    // fixed-width units so the oracle stays exact).
    "ta_subword_units" -> Q(
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |units AS (
        |  SELECT doc_id,
        |         unnest(flatten([[substring(tok, p, 2)
        |                          for p in range(1, len(tok) + 1, 2)]
        |                         for tok in toks])) AS unit
        |  FROM t)
        |SELECT unit, COUNT(*) AS n_occurrences,
        |       COUNT(DISTINCT doc_id) AS n_docs
        |FROM units GROUP BY unit ORDER BY n_occurrences DESC, unit""".stripMargin) { (s, d) =>
      // round 9: the segmentation AND the per-document pre-count are ONE
      // codegen'd kernel pass (functions/SubwordUnits.scala) instead of
      // the interpreted flatten(transform(transform(sequence(...)))) HOF
      // stack + a (unit, doc_id) pre-aggregation shuffle. The kernel
      // emits one (unit, count) entry per DISTINCT unit of the doc
      // (SubwordUnitsSpec pins kernel ≡ HOF incl. empty-token and
      // code-point edges), so the round-8 first aggregation level —
      // whose only job was this dedup — disappears along with its
      // full-width shuffle; the single remaining shuffle is the final
      // unit-keyed rollup, map-side combined (its input is already
      // distinct-per-doc, the minimum any exact n_docs count must ship).
      // Measured: sf10 13.9 s (r8 HOF) → 8.7 s (units kernel) → 1.8 s
      // (fused counts), with the sf1→sf10 ratio down 5.8× → 2.9×;
      // detail in SCALING.md round 9.
      graft.functions.SubwordCounts.register(s)
      Tables.documents(s, d)
        .select(explode(call_function("graft_subword_counts", col("text"))).as("u"))
        .select(col("u.unit").as("unit"), col("u.c").as("c"))
        .groupBy("unit")
        .agg(sum(col("c")).as("n_occurrences"), count(lit(1)).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("unit"))
    },

    // Zipf head profile: the vocabulary-statistics report a corpus drop
    // gets before tokenizer/mixture decisions — top-50 tokens with rank,
    // count, corpus share, and the rank·count product (Zipf's law
    // predicts it near-constant; a flat head says the corpus is
    // synthetic or template-heavy, a steep one says natural text). No
    // ln() anywhere — the product form keeps the fit diagnostic in
    // exact integer arithmetic (the same portability reason ta_tfidf
    // uses linear idf). The token count is one map-side-combined
    // aggregate; the head is a TakeOrdered (never a global vocab sort),
    // and the rank window runs over the ≤50-row head only
    // (PlanAssertionsSpec allowlists it with the consume point-reads).
    "ta_zipf_rank" -> Q(
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
        |tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS nt, COUNT(*) AS vocab_size FROM cnt),
        |top AS (SELECT token, n FROM cnt ORDER BY n DESC, token LIMIT 50),
        |rk AS (
        |  SELECT token, n,
        |         CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS INTEGER) AS rank
        |  FROM top)
        |SELECT r.rank, r.token, CAST(r.n AS BIGINT) AS n,
        |       CAST(r.rank * r.n AS BIGINT) AS zipf_product,
        |       CAST(r.n AS DOUBLE) / CAST(t.nt AS DOUBLE) AS share,
        |       t.vocab_size
        |FROM rk r, tot t ORDER BY r.rank""".stripMargin) { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("token"))
      val cnt = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
      val tot = cnt.agg(sum(col("n")).as("nt"), count(lit(1)).as("vocab_size"))
      cnt.orderBy(col("n").desc, col("token")).limit(50)
        .withColumn("rank", row_number().over(w))
        .crossJoin(broadcast(tot))
        .select(col("rank"), col("token"), col("n"),
                (col("rank").cast("long") * col("n")).as("zipf_product"),
                (col("n").cast("double") / col("nt").cast("double")).as("share"),
                col("vocab_size"))
        .orderBy("rank")
    },

    // BPE tokenizer TRAINING, distributed: three merge rounds of
    // byte-pair encoding over the corpus vocabulary (Sennrich et al.
    // 2016's algorithm — the way every modern LLM tokenizer is built).
    // Scale shape: the corpus collapses to (word, count) in ONE
    // map-side-combined pass; every subsequent round is vocab-bounded
    // (pair counting, the 1-row argmax winner joined back as a
    // broadcast, and a per-word windowed merge), so 100 TB of text
    // costs one scan plus work proportional to the vocabulary.
    // The merge applies the canonical leftmost-greedy rule exactly:
    // within a run of consecutive overlapping matches (only possible
    // for self-pairs like "a a") positions at even offset from the run
    // start merge — a window computation, no sequential driver loop.
    // Winner ties break lexicographically; counts are integral; both
    // twins state the identical three unrolled rounds.
    "ta_bpe_merges" -> Q({
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |v1 AS (
         |  SELECT w, COUNT(*) AS wc,
         |         rtrim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS repr
         |  FROM tok WHERE length(w) > 0 GROUP BY w),
         |${duckRound(1)},
         |${duckRound(2)},
         |${duckRound(3)}
         |SELECT 1 AS merge_round, wl AS left_sym, wr AS right_sym, cnt FROM w1
         |UNION ALL SELECT 2, wl, wr, cnt FROM w2
         |UNION ALL SELECT 3, wl, wr, cnt FROM w3
         |ORDER BY merge_round""".stripMargin
    }) { (s, d) =>
      val (Seq(w1, w2, w3), _) = trainedBpe(s, d)
      def shaped(w: org.apache.spark.sql.DataFrame, r: Int) =
        w.select(lit(r).as("merge_round"), col("wl").as("left_sym"),
                 col("wr").as("right_sym"), col("cnt"))
      shaped(w1, 1).union(shaped(w2, 2)).union(shaped(w3, 3)).orderBy("merge_round")
    },

    // BPE tokenizer INFERENCE — the other half of ta_bpe_merges: encode
    // the corpus with the trained merges and report per-document token
    // counts, the number every packing/pricing/curriculum decision keys
    // on. Scale shape: the merges apply to the VOCABULARY (distinct
    // words), never to document instances — 100 TB of text costs one
    // word-count pass to train, vocab-bounded merge rounds, then one
    // doc→vocab equi-join to sum token counts per document. All-integer
    // output (base symbols vs post-merge tokens), so oracle-exact.
    "ta_bpe_encode" -> Q({
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |v1 AS (
         |  SELECT w, COUNT(*) AS wc,
         |         rtrim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS repr
         |  FROM tok WHERE length(w) > 0 GROUP BY w),
         |${duckRound(1)},
         |${duckRound(2)},
         |${duckRound(3)},
         |enc AS (SELECT w, len(string_split(repr, ' ')) AS n_sym FROM v4),
         |dw AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |SELECT d.doc_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_words,
         |       CAST(SUM(length(d.w)) AS BIGINT) AS n_base_symbols,
         |       CAST(SUM(e.n_sym) AS BIGINT) AS n_tokens,
         |       CAST(SUM(length(d.w)) - SUM(e.n_sym) AS BIGINT) AS n_saved
         |FROM dw d JOIN enc e ON d.w = e.w
         |WHERE length(d.w) > 0
         |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
    }) { (s, d) =>
      val (_, v4) = trainedBpe(s, d)
      // the trained tokenizer is a vocab-sized dim: word → token count
      val enc = v4.select(col("w"), size(split(col("repr"), " ")).as("n_sym"))
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .join(enc, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
             sum(length(col("w"))).as("n_base_symbols"),
             sum(col("n_sym")).as("n_tokens"),
             (sum(length(col("w"))) - sum(col("n_sym"))).as("n_saved"))
        .orderBy("doc_id")
    },

    // Collocation mining (the word2vec phrase-detection pass): bigrams
    // ranked by LIFT = p(ab)/(p(a)·p(b)) — association strength, the
    // log-free monotone twin of PMI, so no transcendental functions
    // cross the oracle. The lift is computed as exactly two IEEE
    // divisions and one multiply in a stated order, making even the
    // double-valued ranking key bit-portable. Scale shape: gram and
    // unigram counts are map-side-combined aggregates; N is a 1-row
    // broadcast; the final top-20 is TakeOrdered (never a global sort);
    // the rank window runs over 20 rows (the ta_zipf_rank pattern).
    "ta_collocations" -> Q(
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |inst AS (
        |  SELECT toks[s] AS a, toks[s+1] AS b
        |  FROM t, unnest(range(1, len(toks))) u(s)),
        |bg AS (SELECT a, b, COUNT(*) AS nab FROM inst GROUP BY a, b),
        |un AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |uc AS (SELECT token, COUNT(*) AS n FROM un GROUP BY token),
        |tot AS (SELECT CAST(SUM(nab) AS BIGINT) AS nn FROM bg),
        |sc AS (
        |  SELECT bg.a, bg.b, bg.nab,
        |         (CAST(bg.nab AS DOUBLE) / CAST(ua.n AS DOUBLE))
        |           * (CAST(t.nn AS DOUBLE) / CAST(ub.n AS DOUBLE)) AS lift
        |  FROM bg JOIN uc ua ON bg.a = ua.token
        |          JOIN uc ub ON bg.b = ub.token, tot t
        |  WHERE bg.nab >= 5),
        |top AS (SELECT * FROM sc ORDER BY lift DESC, a, b LIMIT 20)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY lift DESC, a, b) AS INTEGER) AS rank,
        |       a, b, CAST(nab AS BIGINT) AS n_ab, lift
        |FROM top ORDER BY rank""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val inst = docs
        .select(split(col("text"), " ").as("toks"))
        .withColumn("i", explode(
          when(size(col("toks")) >= 2, expr("sequence(1, size(toks) - 1)"))
            .otherwise(array().cast("array<int>"))))
        .select(expr("toks[i-1]").as("a"), expr("toks[i]").as("b"))
      val bg = inst.groupBy("a", "b").agg(count(lit(1)).as("nab"))
      val uc = docs.select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
      val tot = bg.agg(sum(col("nab")).as("nn"))
      val sc = bg.filter(col("nab") >= 5)
        .join(uc.select(col("token").as("ta"), col("n").as("na")), col("a") === col("ta"))
        .join(uc.select(col("token").as("tb"), col("n").as("nb")), col("b") === col("tb"))
        .crossJoin(broadcast(tot))
        .select(col("a"), col("b"), col("nab"),
                ((col("nab").cast("double") / col("na").cast("double"))
                  * (col("nn").cast("double") / col("nb").cast("double"))).as("lift"))
      val w20 = org.apache.spark.sql.expressions.Window
        .orderBy(col("lift").desc, col("a"), col("b"))
      sc.orderBy(col("lift").desc, col("a"), col("b")).limit(20)
        .withColumn("rank", row_number().over(w20))
        .select(col("rank"), col("a"), col("b"), col("nab").as("n_ab"), col("lift"))
        .orderBy("rank")
    }
  )

  /** One BPE merge round over a (w, wc, repr) vocabulary frame: returns
    * (the winning pair as a 1-row frame, the merged vocabulary). All
    * windows partition by word — bounded by the longest word, never by
    * the corpus. */
  /** One unrolled BPE merge round as DuckDB CTEs, v{r} → v{r+1} — the
    * oracle twin of `bpeRound`, shared by training and encoding. */
  private[queries] def duckRound(r: Int): String = {
    val (vin, vout) = (s"v$r", s"v${r + 1}")
    s"""s$r AS (SELECT w, wc, string_split(repr, ' ') AS sy FROM $vin),
       |m$r AS (
       |  SELECT w, wc, s AS p, sy[s] AS sym,
       |         CASE WHEN s < len(sy) THEN sy[s+1] END AS nxt
       |  FROM s$r, unnest(range(1, len(sy)+1)) u(s)),
       |w$r AS (
       |  SELECT sym AS wl, nxt AS wr, CAST(SUM(wc) AS BIGINT) AS cnt
       |  FROM m$r WHERE nxt IS NOT NULL GROUP BY sym, nxt
       |  ORDER BY cnt DESC, wl, wr LIMIT 1),
       |f$r AS (
       |  SELECT m.*, (m.nxt IS NOT NULL AND m.sym = (SELECT wl FROM w$r)
       |               AND m.nxt = (SELECT wr FROM w$r)) AS flg
       |  FROM m$r m),
       |r$r AS (
       |  SELECT *, p - ROW_NUMBER() OVER (PARTITION BY w, flg ORDER BY p) AS run
       |  FROM f$r),
       |g$r AS (
       |  SELECT *, flg AND (p - MIN(p) OVER (PARTITION BY w, flg, run)) % 2 = 0 AS mrg
       |  FROM r$r),
       |c$r AS (
       |  SELECT *, COALESCE(LAG(mrg) OVER (PARTITION BY w ORDER BY p), FALSE) AS consumed
       |  FROM g$r),
       |$vout AS (
       |  SELECT w, wc,
       |         string_agg(CASE WHEN mrg THEN sym || nxt ELSE sym END, ' ' ORDER BY p) AS repr
       |  FROM c$r WHERE NOT consumed GROUP BY w, wc)""".stripMargin
  }

  /** The trained 3-round BPE chain per corpus — (winners w1..w3, final
    * vocab v4) — cached like every other trained artifact (tradeEdges
    * pattern): ta_bpe_merges and ta_bpe_encode each ran the identical
    * training before; the tokenizer is TRAINED ONCE and both the
    * merge-table report and the encoder read it. Evicted with the
    * artifact store. */
  private val bpeCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[org.apache.spark.sql.DataFrame], org.apache.spark.sql.DataFrame)]()

  graft.ArtifactStore.onInvalidate(bpeCache.remove(_))

  private[queries] def trainedBpe(s: org.apache.spark.sql.SparkSession, d: String)
      : (Seq[org.apache.spark.sql.DataFrame], org.apache.spark.sql.DataFrame) =
    bpeCache.computeIfAbsent(d, _ => {
      val v1 = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("wc"))
        .withColumn("repr", rtrim(regexp_replace(col("w"), "(.)", "$1 ")))
      val (w1, v2) = bpeRound(v1)
      val (w2, v3) = bpeRound(v2)
      val (w3, v4) = bpeRound(v3)
      (Seq(w1, w2, w3), v4.localCheckpoint(true))
    })

  private def bpeRound(v: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // eager checkpoint: the vocabulary is re-read by BOTH the winner
    // aggregate and the merge below, and each round's output feeds the
    // next — without the barrier the v1 lineage re-executes 2^round
    // times (measured 7 s for the 3-round encode at sf0.1, 1.6 s with
    // it). Vocab-bounded rows, so the materialization is small at any
    // corpus scale — the persisted-merges-table shape of a real
    // tokenizer trainer.
    val vc = v.localCheckpoint(true)
    val syms = vc.select(col("w"), col("wc"),
                        posexplode(split(col("repr"), " ")).as(Seq("p", "sym")))
    val wSeq = Window.partitionBy("w").orderBy("p")
    val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(wSeq))
    val winner = withNext.filter(col("nxt").isNotNull)
      .groupBy(col("sym"), col("nxt"))
      .agg(sum(col("wc")).as("cnt"))
      .orderBy(col("cnt").desc, col("sym"), col("nxt")).limit(1)
      .select(col("sym").as("wl"), col("nxt").as("wr"), col("cnt"))
      // 1-row winner, checkpointed: it enters the merge as a broadcast
      // AND is returned to the caller — one pair-count pass, not two
      .localCheckpoint(true)
    val flagged = withNext
      .crossJoin(broadcast(winner.select(col("wl"), col("wr"))))
      .withColumn("flg", col("nxt").isNotNull &&
                         col("sym") === col("wl") && col("nxt") === col("wr"))
    val wRun    = Window.partitionBy(col("w"), col("flg")).orderBy("p")
    val wRunMin = Window.partitionBy(col("w"), col("flg"), col("run"))
    val merged = flagged
      .withColumn("run", col("p") - row_number().over(wRun))
      .withColumn("mrg", col("flg") &&
                         pmod(col("p") - min(col("p")).over(wRunMin), lit(2)) === 0)
      .withColumn("consumed", coalesce(lag(col("mrg"), 1).over(wSeq), lit(false)))
    val vNext = merged.filter(!col("consumed"))
      .withColumn("osym", when(col("mrg"), concat(col("sym"), col("nxt")))
                            .otherwise(col("sym")))
      .groupBy(col("w"), col("wc"))
      .agg(array_join(
             transform(array_sort(collect_list(struct(col("p"), col("osym")))),
                       x => x.getField("osym")), " ").as("repr"))
    (winner, vNext)
  }
}
