package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable.{h32, duckH}
import org.apache.spark.sql.functions._

/** Corpus memorization-risk and token-dispersion profiling over
  * `documents` — two doc/token-level metrics from the training-data
  * curation literature that the dedup surface (span detection, scrub
  * accounting) does not yet report:
  *
  *  - `ta_ngram_coverage`: per-document fraction of its distinct 8-grams
  *    that occur in at least one OTHER document (Lee et al. 2022,
  *    "Deduplicating Training Data Makes Language Models Better" — the
  *    doc-level memorization-risk score used to rank documents for
  *    removal, complementary to `dd_dup_spans` which extracts the spans
  *    themselves).
  *  - `ta_burstiness`: variance-to-mean ratio of per-document counts for
  *    the corpus head tokens (Church & Gale 1995) — burstiness separates
  *    topical content words (bursty: absent from most docs, repeated
  *    where present) from function words (Poisson-like), the signal
  *    behind tf-idf's df term and stopword-list induction.
  *
  * Both are all-integer until a single final division of exact BIGINTs,
  * so the DuckDB twins are hash-exact.
  */
object TextQueries5 {

  def defs: Map[String, Q] = Map(

    // Tokenizer fertility per source — the tokenizer-evaluation metric
    // (tokens per word, characters per token) that decides whether a
    // trained vocabulary serves every slice of the mixture equally:
    // a source whose fertility is high relative to the corpus pays more
    // sequence length per unit of text, skewing both cost and the
    // effective mixture weights (the multilingual-tokenizer-parity
    // problem). Reads the SAME trained 3-round BPE artifact as
    // ta_bpe_merges/ta_bpe_encode (trained once per corpus, cached);
    // the encoder is a vocab-sized dim joined to the doc→word explode,
    // rolled up per source — one corpus pass, map-side combined, and
    // the two fertility ratios are single IEEE divisions of exact
    // BIGINTs (bit-portable).
    "ta_tokenizer_fertility" -> Q({
      s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |v1 AS (
         |  SELECT w, COUNT(*) AS wc,
         |         rtrim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS repr
         |  FROM tok WHERE length(w) > 0 GROUP BY w),
         |${TextQueries2.duckRound(1)},
         |${TextQueries2.duckRound(2)},
         |${TextQueries2.duckRound(3)},
         |enc AS (SELECT w, len(string_split(repr, ' ')) AS n_sym FROM v4),
         |dw AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
         |SELECT d.source,
         |       CAST(COUNT(*) AS BIGINT) AS n_words,
         |       CAST(SUM(length(d.w)) AS BIGINT) AS n_chars,
         |       CAST(SUM(e.n_sym) AS BIGINT) AS n_tokens,
         |       CAST(SUM(e.n_sym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |         AS tokens_per_word,
         |       CAST(SUM(length(d.w)) AS DOUBLE) / CAST(SUM(e.n_sym) AS DOUBLE)
         |         AS chars_per_token
         |FROM dw d JOIN enc e ON d.w = e.w
         |WHERE length(d.w) > 0
         |GROUP BY d.source ORDER BY d.source""".stripMargin
    }) { (s, d) =>
      val (_, v4) = TextQueries2.trainedBpe(s, d)
      val enc = v4.select(col("w"), size(split(col("repr"), " ")).as("n_sym"))
      Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .join(enc, "w")
        .groupBy("source")
        .agg(count(lit(1)).as("n_words"),
             sum(length(col("w"))).as("n_chars"),
             sum(col("n_sym")).as("n_tokens"),
             (sum(col("n_sym")).cast("double") / count(lit(1)).cast("double"))
               .as("tokens_per_word"),
             (sum(length(col("w"))).cast("double") / sum(col("n_sym")).cast("double"))
               .as("chars_per_token"))
        .orderBy("source")
    },

    // Per-doc memorization risk. Scale shape: ONE gram pass — distinct
    // (doc, gram8) pairs shuffle once on gram for the df dim, rejoin on
    // gram (equi-join, map-side-combined per-doc agg), and the doc
    // dimension left-joins back so gram-less docs (len < 8) report 0.
    // The df dim is VOCABULARY-scale, never corpus-scale; no pair join
    // anywhere (contrast dd_minhash_pairs), so 100 TB costs two
    // gram-keyed shuffles of the gram table. Coverage is basis points
    // by integer floor division — exact in both engines.
    "ta_ngram_coverage" -> Q(
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
         |g AS (
         |  SELECT DISTINCT doc_id, ${duckH("array_to_string(toks[i:i+7], ' ')", 8)} AS gh
         |  FROM t, unnest(range(1, len(toks) - 6)) u(i)),
         |df AS (SELECT gh, COUNT(*) AS df FROM g GROUP BY gh),
         |per AS (
         |  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |         CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS shared_grams
         |  FROM g JOIN df ON g.gh = df.gh GROUP BY g.doc_id)
         |SELECT t.doc_id, t.source,
         |       CAST(COALESCE(per.n_grams, 0) AS BIGINT) AS n_grams,
         |       CAST(COALESCE(per.shared_grams, 0) AS BIGINT) AS shared_grams,
         |       CAST(CASE WHEN COALESCE(per.n_grams, 0) = 0 THEN 0
         |            ELSE (per.shared_grams * 10000) // per.n_grams END AS BIGINT)
         |         AS coverage_bp
         |FROM t LEFT JOIN per ON t.doc_id = per.doc_id
         |ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      graft.functions.Shingles.register(s)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
      // hashed-shingle kernel (round 10, functions/Shingles.scala):
      // md5 runs over each 8-gram's byte slice in one pass — values
      // byte-identical to h32(concat_ws(' ', slice(toks, i+1, 8)));
      // mode 3 dedups per doc DURING the walk, so the old row-level
      // .distinct() exchange is gone. n_grams (distinct grams per doc)
      // is the kernel array's SIZE — map-side — and only grams in the
      // df≥2 SHARED dimension need a per-doc count, so the raw
      // (doc_id, gh) stream feeds exactly one gram-keyed exchange (the
      // df build, map-side-combined); the shared-dim join is
      // AQE-broadcast when the shared vocabulary is small and an
      // equi-shuffle of 16-byte rows when it is not.
      val g = docs.select(col("doc_id"),
          explode(call_function("graft_shingle_h32",
            col("text"), lit(8), lit(3))).as("gh"))
      val shared = g.groupBy("gh").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2).select(col("gh").as("sh_gh"))
      val per = g.join(shared, col("gh") === col("sh_gh"))
        .groupBy("doc_id").agg(count(lit(1)).as("ps"))
      docs.select(col("doc_id"), col("source"),
          size(call_function("graft_shingle_h32",
            col("text"), lit(8), lit(3))).cast("long").as("pn"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"),
                col("pn").as("n_grams"),
                coalesce(col("ps"), lit(0L)).as("shared_grams"),
                when(col("pn") === 0, lit(0L))
                  .otherwise((coalesce(col("ps"), lit(0L)) * 10000L) / col("pn") cast "long")
                  .as("coverage_bp"))
        .orderBy("doc_id")
    },

    // Token burstiness over the corpus head. Scale shape: (token, doc)
    // counts get map-side combine on within-doc repetition, the token
    // rollup is vocabulary-scale, the head is a TakeOrdered-20 (never a
    // global vocab sort), and the doc count joins as a broadcast scalar.
    // VMR includes the zero-count docs analytically — (n·Σc² − (Σc)²)
    // / (n·Σc) — so no dense doc×token grid is ever materialized. All
    // terms are exact BIGINTs; the one division is IEEE-exact in both
    // engines.
    "ta_burstiness" -> Q(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |pd AS (
        |  SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tok GROUP BY token, doc_id),
        |st AS (
        |  SELECT token, CAST(SUM(c) AS BIGINT) AS n_occ,
        |         CAST(SUM(c * c) AS BIGINT) AS sum_c2,
        |         CAST(COUNT(*) AS BIGINT) AS df,
        |         CAST(MAX(c) AS BIGINT) AS max_c
        |  FROM pd GROUP BY token),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |top AS (SELECT * FROM st ORDER BY n_occ DESC, token LIMIT 20)
        |SELECT t.token, t.n_occ, t.df, nd.n_docs, t.max_c,
        |       CAST(nd.n_docs * t.sum_c2 - t.n_occ * t.n_occ AS DOUBLE)
        |         / CAST(nd.n_docs * t.n_occ AS DOUBLE) AS vmr
        |FROM top t CROSS JOIN nd
        |ORDER BY t.n_occ DESC, t.token""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val pd = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("token", "doc_id").agg(count(lit(1)).as("c"))
      val st = pd.groupBy("token")
        .agg(sum(col("c")).as("n_occ"), sum(col("c") * col("c")).as("sum_c2"),
             count(lit(1)).as("df"), max(col("c")).as("max_c"))
      val nd = docs.agg(count(lit(1)).as("n_docs"))
      st.orderBy(col("n_occ").desc, col("token")).limit(20)
        .crossJoin(broadcast(nd))
        .select(col("token"), col("n_occ"), col("df"), col("n_docs"), col("max_c"),
                ((col("n_docs") * col("sum_c2") - col("n_occ") * col("n_occ"))
                   .cast("double")
                 / (col("n_docs") * col("n_occ")).cast("double")).as("vmr"))
        .orderBy(col("n_occ").desc, col("token"))
    },

    // Per-source compressibility proxy: distinct-bigram share. The
    // fraction of a text's word bigrams that are distinct is a
    // deflate-free stand-in for compression ratio — boilerplate and
    // template text repeat bigrams (low share ⇒ compressible ⇒ low
    // informational density), the quality signal gzip-ratio filters
    // (CCNet, Gopher) read. Per-doc distinct counting happens INSIDE
    // the row via array_distinct on the codegen'd bigram array — no
    // token explode, no shuffle of gram strings; the source rollup is
    // one map-side-combined aggregate of four integers per doc. Share
    // is basis points by floor division — all-integer, hash-exact.
    "ta_compressibility" -> Q(
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
        |b AS (
        |  SELECT doc_id, source,
        |         CAST(len(toks) - 1 AS BIGINT) AS n_bi,
        |         CAST(len(list_distinct(list_transform(range(1, len(toks)),
        |                i -> toks[i] || ' ' || toks[i+1]))) AS BIGINT) AS n_dist
        |  FROM t WHERE len(toks) >= 2)
        |SELECT source,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_bi) AS BIGINT) AS total_bigrams,
        |       CAST(SUM(n_dist) AS BIGINT) AS distinct_bigrams,
        |       (CAST(SUM(n_dist) AS BIGINT) * 10000) // CAST(SUM(n_bi) AS BIGINT)
        |         AS distinct_bp,
        |       CAST(MIN((n_dist * 10000) // n_bi) AS BIGINT) AS min_doc_bp,
        |       CAST(MAX((n_dist * 10000) // n_bi) AS BIGINT) AS max_doc_bp
        |FROM b GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val toks = split(col("text"), " ")
      val bigrams = transform(sequence(lit(0), size(col("toks")) - 2),
        i => concat(element_at(col("toks"), i + 1), lit(" "),
                    element_at(col("toks"), i + 2)))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), toks.as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("source"),
                (size(col("toks")) - 1).cast("long").as("n_bi"),
                size(array_distinct(bigrams)).cast("long").as("n_dist"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_bi")).as("total_bigrams"),
             sum(col("n_dist")).as("distinct_bigrams"),
             expr("(sum(n_dist) * 10000) div sum(n_bi)").as("distinct_bp"),
             min(expr("(n_dist * 10000) div n_bi")).as("min_doc_bp"),
             max(expr("(n_dist * 10000) div n_bi")).as("max_doc_bp"))
        .orderBy("source")
    },

    // Per-document keyword extraction: top-3 tokens by scaled-integer
    // tf·idf — the "what is this document about" label every retrieval
    // and clustering pipeline derives first (the per-doc sibling of the
    // corpus-level ta_tfidf). idf is the same integer-scaled BM25-style
    // ((N−df)·10⁴)//(df+1) as ta_bm25_search, so scores are BIGINTs and
    // rank ties break on the token string. Scale shape: (doc, token)
    // counts map-side combine, the df dim is vocabulary-scale, the
    // score join is a token equi-join, and the top-3 cut is a window
    // PARTITIONED BY doc — per-doc state only, never a global sort.
    "ta_keywords_per_doc" -> Q(
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |tf AS (
         |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM tok WHERE length(token) > 0 GROUP BY doc_id, token),
         |df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token),
         |nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
         |scored AS (
         |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         |         tf.tf * (((nd.n_docs - df.df) * 10000) // (df.df + 1)) AS score_s
         |  FROM tf JOIN df ON tf.token = df.token, nd),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |                               ORDER BY score_s DESC, token) AS rank
         |  FROM scored)
         |SELECT doc_id, CAST(rank AS INTEGER) AS rank, token, tf, df, score_s
         |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // round 11: graft_token_counts folds the (doc, token) counting
      // in-row, deleting the (doc, token) aggregate exchange that every
      // consumer of tf re-executed; n_docs (docs with ≥1 non-empty
      // token ⟺ any non-space char) comes from a cheap trim scan
      // instead of a third full tokenize + distinct pass.
      graft.functions.Shingles.register(s)
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(expr("graft_token_counts(text, 1)")).as("tc"))
        .select(col("doc_id"), col("tc.token").as("token"), col("tc.cnt").as("tf"))
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val nd = Tables.documents(s, d)
        .filter(length(trim(col("text"))) > 0)
        .agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id").orderBy(col("score_s").desc, col("token"))
      tf.join(df, "token").crossJoin(broadcast(nd))
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
                expr("tf * (((n_docs - df) * 10000) div (df + 1))").as("score_s"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df"),
                col("score_s"))
        .orderBy("doc_id", "rank")
    },

    // Vocabulary-growth curve (Heaps' law): distinct tokens seen after
    // the first N documents (doc_id as arrival order), on a fixed N
    // ladder — the curve that sizes a tokenizer vocabulary and decides
    // when a corpus stops contributing new types. Scale shape: the
    // corpus collapses to one MIN(doc_id) PER TOKEN (vocabulary-scale,
    // map-side combined); the ladder is a 9-row broadcast dim over that
    // dim — the prefix counts never rescan documents. All-integer;
    // rungs past the corpus size simply report the full vocabulary
    // (share 10000), keeping the ladder SF-stable.
    "ta_vocab_growth" -> Q(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |ft AS (
        |  SELECT token, MIN(doc_id) AS fd FROM tok
        |  WHERE length(token) > 0 GROUP BY token),
        |tv AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_total FROM ft),
        |th AS (SELECT CAST(unnest([10,25,50,100,250,500,1000,2500,5000]) AS BIGINT)
        |              AS n_docs_prefix)
        |SELECT th.n_docs_prefix,
        |       CAST(SUM(CASE WHEN ft.fd < th.n_docs_prefix THEN 1 ELSE 0 END) AS BIGINT)
        |         AS vocab_size,
        |       tv.vocab_total,
        |       (CAST(SUM(CASE WHEN ft.fd < th.n_docs_prefix THEN 1 ELSE 0 END) AS BIGINT)
        |          * 10000) // tv.vocab_total AS vocab_share_bp
        |FROM ft, th, tv
        |GROUP BY th.n_docs_prefix, tv.vocab_total
        |ORDER BY th.n_docs_prefix""".stripMargin) { (s, d) =>
      val ft = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(min(col("doc_id")).as("fd"))
      val tv = ft.agg(count(lit(1)).as("vocab_total"))
      val th = ft.sparkSession.range(1).select(
        explode(array(Seq(10L, 25L, 50L, 100L, 250L, 500L, 1000L, 2500L, 5000L)
          .map(lit): _*)).as("n_docs_prefix"))
      ft.crossJoin(broadcast(th))
        .groupBy("n_docs_prefix")
        .agg(sum(when(col("fd") < col("n_docs_prefix"), 1L).otherwise(0L))
               .as("vocab_size"))
        .crossJoin(broadcast(tv))
        .select(col("n_docs_prefix"), col("vocab_size"), col("vocab_total"),
                expr("(vocab_size * 10000) div vocab_total").as("vocab_share_bp"))
        .orderBy("n_docs_prefix")
    }
  )
}
