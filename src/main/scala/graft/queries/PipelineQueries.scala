package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import org.apache.spark.sql.functions._

/** Pipeline-ASSEMBLY operators: the steps between a filtered corpus and
  * a training run — split assignment, stratified sampling, sequence
  * packing, normalization, sketch-based decontamination, and boilerplate
  * measurement. All deterministic (hash-derived randomness, integer
  * accounting), so every one is DuckDB-oracle-checked like the rest of
  * the surface.
  */
object PipelineQueries {

  /** Distinct 6-token grams per document (ta_contamination's blocking
    * unit), as a (doc_id, g) stream. Deduped INSIDE the kernel (mode 3:
    * first-occurrence-distinct during the one byte walk, a per-doc hash
    * set) — the round-10 row-level `.distinct()` paid a corpus-scale
    * shuffle of (doc_id, gram-string) pairs to dedup rows the kernel
    * can dedup in place, so every consumer's gram lineage is now a pure
    * map-side projection until its own aggregate/join. (The old note
    * about array_distinct being O(n²) applied to the INTERPRETED
    * expression over the split array, not to the kernel's byte-slice
    * set.) */
  private def gramStream(docs: org.apache.spark.sql.DataFrame) = {
    graft.functions.Shingles.register(docs.sparkSession)
    docs
      .select(col("doc_id"),
              explode(call_function("graft_shingles",
                col("text"), lit(6), lit(3))).as("g"))
  }

  /** Trained Bloom artifacts per corpus dir: (128 filter words, the
    * checkpointed bench-gram frame). Same rationale and eviction story
    * as SimilarityQueries2.centroidCache — the training jobs run eagerly
    * at DataFrame construction, and plan sweeps/Verify construct these
    * frames repeatedly. */
  private val bloomCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Long], org.apache.spark.sql.DataFrame)]()

  graft.ArtifactStore.onInvalidate(bloomCache.remove(_))

  /** Bloom probe position j of gram g (j ∈ 0..2, 4096-bit space). */
  private[graft] def posOf(g: org.apache.spark.sql.Column,
                           j: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(h60(concat(lit("bl"), j.cast("string"), lit("|"), g)), lit(4096L))

  /** The trained benchmark Bloom filter for a corpus: 128 32-bit words
    * (as longs) + the checkpointed distinct bench-gram frame. Shared by
    * the declared batch query and the STREAMING decontamination probe
    * (graft.streaming.DecontamStream). */
  private[graft] def trainedBloom(s: org.apache.spark.sql.SparkSession, d: String)
      : (Array[Long], org.apache.spark.sql.DataFrame) =
    bloomCache.computeIfAbsent(d, _ => {
      // distinct on g ALONE: gramStream dedups (doc_id, g), and a gram
      // shared by two benchmark docs would otherwise fan out the
      // exact-hit left join in the batch query
      val bgF = gramStream(Tables.documents(s, d))
        .filter(col("doc_id") % 50 === 0).select("g").distinct()
        .localCheckpoint(true)
      val ws = new Array[Long](128)
      bgF.select(col("g"), explode(array((0 to 2).map(lit(_)): _*)).as("j"))
        .select(posOf(col("g"), col("j")).as("p"))
        .groupBy(expr("p div 32").as("word"))
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT)))").as("w"))
        .collect()
        .foreach(r => ws(r.getLong(0).toInt) = r.getLong(1))
      (ws, bgF)
    })

  private val duckGramsCte =
    """toks AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(tk) >= 6
      |      THEN [array_to_string(tk[i:i+5],' ') for i in range(1, len(tk)-4)]
      |      ELSE [] END)) AS g
      |  FROM toks)""".stripMargin

  def defs: Map[String, Q] = Map(

    // END-TO-END corpus funnel: the whole pipeline composed — quality
    // gate → exact dedup → benchmark decontamination → train split —
    // with per-stage survivor accounting (docs + tokens), i.e. the
    // "where did my data go" report every curation run publishes.
    // Stage gates are progressive (each applies to the previous stage's
    // survivors) and all-integer: the quality ratio compares 10·distinct
    // > 3·total (no division), dedup keeps min doc_id per md5(text)
    // group (a partitioned window over the hash key — ≤ group-size
    // rows per partition at any scale), decontamination anti-joins the
    // candidate 6-gram stream against the benchmark grams, and the
    // split bucket is the same md5 function ta_split_assign declares.
    "ta_corpus_funnel" -> Q(
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |         CAST(len(string_split(text,' ')) AS BIGINT) AS ntok,
         |         CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS ndist
         |  FROM documents),
         |s1 AS (SELECT * FROM base WHERE ntok >= 20 AND ndist*10 > ntok*3),
         |s2 AS (
         |  SELECT * FROM (
         |    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
         |    FROM s1) WHERE doc_id = keeper),
         |btoks AS (SELECT doc_id, string_split(text,' ') AS tk
         |          FROM documents WHERE doc_id % 50 = 0),
         |bgrams AS (
         |  SELECT DISTINCT unnest(CASE WHEN len(tk) >= 6
         |    THEN [array_to_string(tk[i:i+5],' ') for i in range(1, len(tk)-4)]
         |    ELSE [] END) AS g
         |  FROM btoks),
         |ctoks AS (SELECT doc_id, string_split(text,' ') AS tk
         |          FROM s2 WHERE doc_id % 50 <> 0),
         |cgrams AS (
         |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) >= 6
         |    THEN [array_to_string(tk[i:i+5],' ') for i in range(1, len(tk)-4)]
         |    ELSE [] END)) AS g
         |  FROM ctoks),
         |contaminated AS (
         |  SELECT DISTINCT c.doc_id FROM cgrams c JOIN bgrams b ON c.g = b.g),
         |s3 AS (
         |  SELECT s2.* FROM s2
         |  WHERE s2.doc_id % 50 <> 0
         |    AND s2.doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |s4 AS (
         |  SELECT * FROM s3
         |  WHERE ${duckH("CAST(doc_id AS VARCHAR)", 15)} % 100 < 90),
         |stages AS (
         |  SELECT 0 AS stage_id, 'raw' AS stage, COUNT(*) AS n_docs,
         |         CAST(SUM(ntok) AS BIGINT) AS n_tokens FROM base
         |  UNION ALL SELECT 1, 'quality', COUNT(*), CAST(SUM(ntok) AS BIGINT) FROM s1
         |  UNION ALL SELECT 2, 'dedup', COUNT(*), CAST(SUM(ntok) AS BIGINT) FROM s2
         |  UNION ALL SELECT 3, 'decontam', COUNT(*), CAST(SUM(ntok) AS BIGINT) FROM s3
         |  UNION ALL SELECT 4, 'train', COUNT(*), CAST(SUM(ntok) AS BIGINT) FROM s4)
         |SELECT stage_id, stage, n_docs, n_tokens FROM stages ORDER BY stage_id""".stripMargin) { (s, d) =>
      // Single-pass execution: the five stage gates become per-doc
      // FLAGS on one scan (the dedup keeper is a conditional min over
      // the hash-key window, so non-quality rows don't vote), the
      // decontamination verdict arrives by one gram equi-join, and each
      // doc explodes into its ≤5 surviving (stage_id, ntok) rows for a
      // single final aggregate — the 5-way union-of-aggregates form
      // re-ran this lineage per stage (2.3 s → this shape at sf0.1).
      import org.apache.spark.sql.expressions.Window
      // the dedup-keeper window needs only (md5(text), doc_id, quality
      // flag): hashing BEFORE the exchange keeps the corpus text out of
      // the shuffle (the round-9 form carried every document's text
      // through the md5-keyed exchange so the gram stage could reuse
      // the post-window rows)
      val base = Tables.spread(Tables.documents(s, d), "doc_id")
        .select(col("doc_id"), md5(col("text")).as("h"),
                split(col("text"), " ").as("tk"))
        .select(col("doc_id"), col("h"),
                size(col("tk")).cast("long").as("ntok"),
                size(array_distinct(col("tk"))).cast("long").as("ndist"))
        .withColumn("q1", col("ntok") >= 20 && col("ndist") * 10 > col("ntok") * 3)
        .withColumn("keeper",
          min(when(col("q1"), col("doc_id"))).over(Window.partitionBy(col("h"))))
        .withColumn("q2", col("q1") && col("doc_id") === col("keeper"))
      val bgrams = gramStream(
          Tables.documents(s, d).filter(col("doc_id") % 50 === 0))
        .select(col("g")).distinct()
      // contamination verdicts come straight off a second map-side gram
      // pass over ALL non-bench docs (a superset of the q2 survivors the
      // oracle scans — q3 conjoins q2, so verdicts on q2-rejected docs
      // are harmless), which decouples the gram stage from the window
      // output entirely: no text re-join, no window-row reuse
      val contaminated = gramStream(
          Tables.spread(Tables.documents(s, d), "doc_id").filter(col("doc_id") % 50 =!= 0))
        .join(bgrams, "g").select(col("doc_id")).distinct()
        .withColumn("contam", lit(true))
      val flagged = base
        .join(contaminated, Seq("doc_id"), "left_outer")
        .withColumn("q3", col("q2") && col("doc_id") % 50 =!= 0 && col("contam").isNull)
        .withColumn("q4", col("q3") && pmod(h60(col("doc_id")), lit(100L)) < 90)
      val stageArr = array(
        struct(lit(0).as("sid"), lit(true).as("ok")),
        struct(lit(1).as("sid"), col("q1").as("ok")),
        struct(lit(2).as("sid"), col("q2").as("ok")),
        struct(lit(3).as("sid"), col("q3").as("ok")),
        struct(lit(4).as("sid"), col("q4").as("ok")))
      flagged
        .select(col("ntok"), explode(filter(stageArr, st => st("ok"))).as("st"))
        .groupBy(col("st.sid").as("stage_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
        .select(col("stage_id"),
                when(col("stage_id") === 0, "raw")
                  .when(col("stage_id") === 1, "quality")
                  .when(col("stage_id") === 2, "dedup")
                  .when(col("stage_id") === 3, "decontam")
                  .otherwise("train").as("stage"),
                col("n_docs"), col("n_tokens"))
        .orderBy("stage_id")
    },

    // Deterministic train/val/test assignment: the split is a pure
    // function of doc_id (md5 bucket), so it is stable across runs,
    // machines, and engines — the property a training pipeline needs so
    // that re-running assignment never migrates a test document into
    // train. 90/5/5; per-split token/char accounting in exact integers.
    "ta_split_assign" -> Q(
      s"""WITH s AS (
         |  SELECT doc_id, n_chars,
         |         CAST(len(string_split(text,' ')) AS BIGINT) AS ntok,
         |         ${duckH("CAST(doc_id AS VARCHAR)", 15)} % 100 AS bucket
         |  FROM documents)
         |SELECT CASE WHEN bucket < 90 THEN 'train'
         |            WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
         |       COUNT(*) AS n_docs,
         |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |       CAST(SUM(ntok) AS BIGINT) AS total_tokens,
         |       MIN(doc_id) AS first_doc
         |FROM s GROUP BY 1 ORDER BY split""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
                size(split(col("text"), " ")).cast("long").as("ntok"),
                pmod(h60(col("doc_id")), lit(100L)).as("bucket"))
        .groupBy(when(col("bucket") < 90, "train")
                   .when(col("bucket") < 95, "val")
                   .otherwise("test").as("split"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_chars")).as("total_chars"),
             sum(col("ntok")).as("total_tokens"),
             min(col("doc_id")).as("first_doc"))
        .orderBy("split")
    },

    // Stratified sampling, deterministically: 3 documents per
    // (lang, source) stratum, chosen by md5 rank — the "seeded" sample a
    // pipeline can reproduce anywhere. One partitioned window, no
    // global sort, no RNG state.
    "ta_sample_stratified" -> Q(
      s"""WITH h AS (
         |  SELECT doc_id, lang, source,
         |         ${duckH("'smp|' || CAST(doc_id AS VARCHAR)", 15)} AS hv
         |  FROM documents),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, source
         |                               ORDER BY hv, doc_id) AS rnk
         |  FROM h)
         |SELECT lang, source, CAST(rnk AS INTEGER) AS rnk, doc_id
         |FROM r WHERE rnk <= 3 ORDER BY lang, source, rnk""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang", "source").orderBy(col("hv"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
                h60(concat(lit("smp|"), col("doc_id").cast("string"))).as("hv"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("lang"), col("source"), col("rnk").cast("int").as("rnk"), col("doc_id"))
        .orderBy("lang", "source", "rnk")
    },

    // Sequence packing: documents stream into fixed 2048-token context
    // windows in doc_id order WITHIN each language (training batches
    // don't mix languages here, and the per-lang partitioning is also
    // what keeps the running sum parallel — one global cumsum would be a
    // single-partition window, the 100 TB anti-pattern). A document's
    // bin is the budget cell its running total STARTS in — the standard
    // streaming-packing approximation (documents may straddle bins).
    "ta_pack_sequences" -> Q(
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(text,' ')) AS BIGINT) AS ntok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, ntok,
        |         CAST(SUM(ntok) OVER (PARTITION BY lang ORDER BY doc_id
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS BIGINT) AS cum
        |  FROM t)
        |SELECT lang, CAST((cum - ntok) // 2048 AS INTEGER) AS bin,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(ntok) AS BIGINT) AS total_tokens,
        |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
                size(split(col("text"), " ")).cast("long").as("ntok"))
        .withColumn("cum", sum(col("ntok")).over(w))
        .groupBy(col("lang"), expr("(cum - ntok) div 2048").cast("int").as("bin"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("ntok")).as("total_tokens"),
             min(col("doc_id")).as("first_doc"),
             max(col("doc_id")).as("last_doc"))
        .orderBy("lang", "bin")
    },

    // Normalization: collapse ADJACENT repeated tokens ("value value
    // table" → "value table") — the cheap dedup-within-document pass a
    // pipeline runs before tokenization. The collapsed text is verified
    // by content hash, not just by count, so the oracle pins the exact
    // output string.
    "ta_collapse_repeats" -> Q(
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id, tk,
        |         [tk[i] for i in range(1, len(tk)+1)
        |          if i = 1 OR tk[i] != tk[i-1]] AS ck
        |  FROM t)
        |SELECT doc_id,
        |       CAST(len(tk) AS INTEGER) AS n_tokens,
        |       CAST(len(ck) AS INTEGER) AS n_after,
        |       md5(array_to_string(ck, ' ')) AS collapsed_hash
        |FROM c ORDER BY doc_id""".stripMargin) { (s, d) =>
      // tk is a materialized column: the filter lambda references the
      // array by position and an inline split would re-tokenize per
      // element (no CSE inside HOF lambdas)
      val collapsed = filter(col("tk"), (t, i) =>
        when(i === 0, lit(true)).otherwise(t =!= element_at(col("tk"), i)))
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), col("tk"), collapsed.as("ck"))
        .select(col("doc_id"),
                size(col("tk")).as("n_tokens"),
                size(col("ck")).as("n_after"),
                md5(concat_ws(" ", col("ck"))).as("collapsed_hash"))
        .orderBy("doc_id")
    },

    // Bloom-filter decontamination — the SKETCH form of ta_contamination
    // for the 100 TB shape: the benchmark's 6-gram set compresses to a
    // 4096-bit filter (128 32-bit words, 3 md5-derived probes per gram)
    // that BROADCASTS to every executor, so the corpus-side scan never
    // shuffles gram strings. Emitted per corpus document: gram count,
    // Bloom hits, and the exact equi-join hits — so the query also
    // MEASURES the filter's false-positive behavior against ground
    // truth. Deterministic bit math in both engines (masks stay below
    // 2^32 as BIGINTs; no sign games).
    "ta_bloom_contamination" -> Q(
      s"""WITH $duckGramsCte,
         |bg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
         |cg AS (SELECT doc_id, g FROM grams WHERE doc_id % 50 <> 0),
         |pos AS (
         |  SELECT ${duckH("'bl' || j || '|' || g", 15)} % 4096 AS p
         |  FROM bg, range(0, 3) t(j)),
         |filt AS (
         |  SELECT p // 32 AS word,
         |         CAST(bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS BIGINT) AS w
         |  FROM pos GROUP BY 1),
         |probe AS (
         |  SELECT doc_id, g,
         |         ${duckH("'bl' || j || '|' || g", 15)} % 4096 AS p
         |  FROM cg, range(0, 3) t(j)),
         |checks AS (
         |  SELECT doc_id, g,
         |         SUM(CASE WHEN f.w IS NOT NULL
         |                   AND (f.w & (CAST(1 AS BIGINT) << CAST(pr.p % 32 AS INTEGER))) <> 0
         |                  THEN 1 ELSE 0 END) AS nset
         |  FROM probe pr LEFT JOIN filt f ON pr.p // 32 = f.word
         |  GROUP BY doc_id, g),
         |bloom AS (
         |  SELECT doc_id, COUNT(*) AS n_grams,
         |         SUM(CASE WHEN nset = 3 THEN 1 ELSE 0 END) AS bloom_hits
         |  FROM checks GROUP BY doc_id),
         |ex AS (SELECT c.doc_id, COUNT(*) AS exact_hits
         |       FROM cg c JOIN bg b ON c.g = b.g GROUP BY 1)
         |SELECT bl.doc_id AS doc_id, CAST(bl.n_grams AS INTEGER) AS n_grams,
         |       CAST(bl.bloom_hits AS INTEGER) AS bloom_hits,
         |       CAST(COALESCE(ex.exact_hits, 0) AS INTEGER) AS exact_hits
         |FROM bloom bl LEFT JOIN ex ON bl.doc_id = ex.doc_id
         |ORDER BY bl.doc_id""".stripMargin) { (s, d) =>
      // The filter IS a trained artifact: ≤128 words regardless of corpus
      // size, so it collects to the driver (the bounded-collect pattern
      // of the IVF centroids) and re-enters the plan as a LITERAL array.
      // The probe side is then a pure codegen projection + one per-doc
      // aggregate — no join, no shuffle of gram strings — and the gram
      // lineage runs ONCE (the join formulation ran it for the filter
      // build, the probe, and the exact check separately). bit_or of
      // longs is order-independent, so the collected literals stay
      // oracle-parity-safe.
      // train once per corpus: the bench-gram frame is bounded by the
      // EVAL SUITE size, not the corpus (and the %50 predicate pushes
      // below the explode to the scan, so deriving it is a 2%-of-corpus
      // pass); it is consumed twice (filter-word collect + exact-dim
      // broadcast), hence the eager checkpoint
      val (words, bg) = trainedBloom(s, d)
      val flit = array(words.map(lit(_)): _*)
      // materialize p0..p2 once (each is referenced twice below — word
      // index + mask — and HOF/column re-references re-run the md5)
      // spread: the kernel + three md5 probes per gram dominate the
      // scan; the single-file test layout caps it at 1-8 tasks
      val probed = gramStream(Tables.spread(Tables.documents(s, d), "doc_id"))
        .filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), col("g"),
                posOf(col("g"), lit(0)).as("p0"),
                posOf(col("g"), lit(1)).as("p1"),
                posOf(col("g"), lit(2)).as("p2"))
      def bitSet(p: String) =
        (element_at(flit, (expr(s"$p div 32")).cast("int") + 1)
          .bitwiseAND(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($p % 32 AS INT))"))) =!= 0L
      probed
        .join(broadcast(bg.select(col("g").as("g2"))), col("g") === col("g2"), "left_outer")
        .select(col("doc_id"),
                (bitSet("p0") && bitSet("p1") && bitSet("p2")).as("bhit"),
                col("g2").isNotNull.as("ehit"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_grams"),
             sum(when(col("bhit"), 1).otherwise(0)).cast("int").as("bloom_hits"),
             sum(when(col("ehit"), 1).otherwise(0)).cast("int").as("exact_hits"))
        .orderBy("doc_id")
    },

    // Gram novelty: the fraction of each document's distinct 6-grams
    // FIRST seen at this document in doc_id order — the corpus-diversity
    // curve a pipeline watches while ingesting (novelty collapsing
    // toward 0 means new data is re-treading old content; the dedup
    // signal one level above near-dup pairs). One windowed min over the
    // gram partitioning — no second gram lineage, no self-join.
    "ta_gram_novelty" -> Q(
      s"""WITH $duckGramsCte,
         |firstg AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g)
         |SELECT gr.doc_id AS doc_id,
         |       CAST(COUNT(*) AS INTEGER) AS n_grams,
         |       CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END) AS INTEGER) AS n_novel,
         |       CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         |         / COUNT(*) AS novelty
         |FROM grams gr JOIN firstg f ON gr.g = f.g
         |GROUP BY gr.doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      // n_grams is the SIZE of the kernel's distinct array — map-side,
      // no row stream — and n_novel(doc) = |{g : min over g = doc}| is
      // a count over the gram→first_doc dimension GROUPED BY first_doc,
      // so the (doc,g) pairs never feed a window or a per-doc
      // re-aggregation of every pair (the round-9 form paid three
      // full-stream exchanges). Both aggregates run COMPLETE-MODE
      // behind explicit key repartitions (the q95 rewrite): grams are
      // ~unique, so a map-side partial would build a corpus-sized hash
      // map and collapse nothing — measured 21 s vs 12 s at sf10 with
      // the same plan shape under partial aggregation.
      graft.functions.Shingles.register(s)
      val nSh = s.conf.get("spark.sql.shuffle.partitions").toInt
      val novel = gramStream(Tables.spread(Tables.documents(s, d), "doc_id"))
        .repartition(nSh, col("g"))
        .groupBy("g").agg(min(col("doc_id")).as("first_doc"))
        .repartition(nSh, col("first_doc"))
        .groupBy("first_doc").agg(count(lit(1)).cast("int").as("n_novel"))
      Tables.documents(s, d)
        .select(col("doc_id"),
                size(call_function("graft_shingles",
                  col("text"), lit(6), lit(3))).as("n_grams"))
        .filter(col("n_grams") >= 1)
        .join(novel, col("doc_id") === col("first_doc"), "left_outer")
        .select(col("doc_id"), col("n_grams"),
                coalesce(col("n_novel"), lit(0)).as("n_novel"),
                (coalesce(col("n_novel"), lit(0)).cast("double") /
                  col("n_grams")).as("novelty"))
        .orderBy("doc_id")
    },

    // Boilerplate share: the fraction of each document's positional
    // 3-gram stream covered by CORPUS-frequent shingles (document
    // frequency ≥ 40% of docs — the integer comparison df·10 ≥ total·4
    // avoids a float threshold). The frequent set is a broadcast dim
    // bounded by the shingle vocabulary; high shares mark template/
    // generated text a pipeline down-weights or strips.
    "ta_boilerplate" -> Q(
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
        |psh AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(tk) >= 3
        |      THEN [array_to_string(tk[i:i+2],' ') for i in range(1, len(tk)-1)]
        |      ELSE [array_to_string(tk,' ')] END) AS sh
        |  FROM t),
        |df AS (SELECT sh, COUNT(DISTINCT doc_id) AS df FROM psh GROUP BY sh),
        |tot AS (SELECT COUNT(*) AS total FROM documents),
        |boiler AS (SELECT sh FROM df, tot WHERE df * 10 >= total * 4),
        |perdoc AS (
        |  SELECT p.doc_id, COUNT(*) AS n_sh,
        |         SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS n_boiler
        |  FROM psh p LEFT JOIN boiler b ON p.sh = b.sh
        |  GROUP BY p.doc_id)
        |SELECT doc_id, CAST(n_sh AS INTEGER) AS n_sh,
        |       CAST(n_boiler AS INTEGER) AS n_boiler,
        |       CAST(n_boiler AS DOUBLE) / CAST(n_sh AS DOUBLE) AS boiler_ratio
        |FROM perdoc ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      // positional shingles with the whole-doc fallback (kernel mode 0,
      // round 10 — see gramStream's note)
      graft.functions.Shingles.register(s)
      val psh = docs
        .select(col("doc_id"),
                explode(call_function("graft_shingles",
                  col("text"), lit(3), lit(0))).as("sh"))
      // document frequency from the kernel's DISTINCT stream (mode 1 —
      // same whole-doc fallback as mode 0): every (sh, doc) pair is
      // already unique, so COUNT replaces COUNT(DISTINCT doc_id) and
      // the aggregate is one map-side-combined exchange instead of the
      // two-phase distinct expansion over the positional stream
      val dfDim = docs
        .select(explode(call_function("graft_shingles",
                  col("text"), lit(3), lit(1))).as("sh"))
        .groupBy("sh").agg(count(lit(1)).as("df"))
      val total = docs.agg(count(lit(1)).as("total"))
      val boiler = dfDim.crossJoin(broadcast(total))
        .filter(col("df") * 10 >= col("total") * 4)
        .select(col("sh").as("bsh"))
      psh.join(broadcast(boiler), col("sh") === col("bsh"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sh"),
             sum(when(col("bsh").isNotNull, 1).otherwise(0)).as("n_boiler"))
        .select(col("doc_id"), col("n_sh").cast("int").as("n_sh"),
                col("n_boiler").cast("int").as("n_boiler"),
                (col("n_boiler").cast("double") / col("n_sh").cast("double"))
                  .as("boiler_ratio"))
        .orderBy("doc_id")
    }
  )
}
