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
      import org.apache.spark.sql.expressions.Window
      val bk = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .select(col("doc_id"),
                pmod(graft.functions.Portable.h32(col("token")), lit(FDIM)).as("bucket"))
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("doc_id").orderBy(col("n").desc, col("bucket"))
      bk.withColumn("rn", row_number().over(w))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("nnz"),
             sum(col("n") * col("n")).as("l2sq"),
             min(when(col("rn") === 1, col("bucket"))).cast("int").as("top_bucket"),
             min(when(col("rn") === 1, col("n"))).as("top_count"))
        .orderBy("doc_id")
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
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val occ = tok.groupBy(col("token").as("o_token"))
        .agg(count(lit(1)).as("n_occurrences"))
      val w = Window.partitionBy("token").orderBy("doc_id")
      val capped = tok.select(col("token"), col("doc_id")).distinct()
        .withColumn("rn", row_number().over(w))
      // the groupBy consumes every (token, doc) row, so COUNT(*) IS the
      // document frequency — no second window pass needed
      val idx = capped.groupBy("token")
        .agg(count(lit(1)).as("df"),
             array_join(
               transform(array_sort(collect_list(when(col("rn") <= 10, col("doc_id")))),
                         _.cast("string")), ",").as("postings"))
      idx.join(occ, col("token") === col("o_token"))
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
      // empty-token guard: three-arg sequence(1, 0, 2) THROWS in Spark
      // while the oracle's range(1, 1, 2) is just empty
      val units = flatten(transform(col("toks"), tok =>
        when(length(tok) > 0,
          transform(sequence(lit(1), length(tok), lit(2)),
            p => tok.substr(p, lit(2))))
          .otherwise(array().cast("array<string>"))))
      // two-level aggregate instead of count+countDistinct in one agg:
      // the single-agg form plans an Expand that doubles every exploded
      // unit row before the shuffle; pre-aggregating per (unit, doc_id)
      // gets map-side combine on the dominant duplication instead
      // (measured 25.7 s -> linear at the sf10 decade)
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), explode(units).as("unit"))
        .groupBy("unit", "doc_id")
        .agg(count(lit(1)).as("c"))
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
    }
  )
}
