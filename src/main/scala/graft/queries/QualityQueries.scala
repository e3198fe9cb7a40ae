package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus-quality signals beyond ta_quality's per-document surface
  * ratios: n-gram repetitiveness (the Gopher-rule "repetition" filter —
  * heavily duplicated n-grams mark low-quality/generated text) and
  * rare-token share (documents dominated by low-frequency vocabulary are
  * OOV-heavy or noisy). Both are the filters a training-data pipeline
  * runs corpus-wide before tokenization.
  */
object QualityQueries {

  private val duckPosShingles: String =
    """CASE WHEN len(string_split(text,' ')) >= 3
      |  THEN [array_to_string((string_split(text,' '))[i:i+2],' ')
      |        for i in range(1, len(string_split(text,' '))-1)]
      |  ELSE [text] END""".stripMargin.replace("\n", " ")

  def defs: Map[String, Q] = Map(

    // Repetition profile: how much of each document is duplicated
    // 3-grams, and how often its single most-repeated 3-gram occurs.
    // Shape: one HOF pass for the ratio; explode → two-level aggregate
    // (map-side combined) for the max recurrence — both shuffle-lean.
    "ta_repetition" -> Q(
      s"""WITH sh AS (SELECT doc_id, $duckPosShingles AS hs FROM documents),
         |flat AS (SELECT doc_id, unnest(hs) AS s FROM sh),
         |rep AS (
         |  SELECT doc_id, s, COUNT(*) AS c FROM flat GROUP BY doc_id, s),
         |agg AS (
         |  SELECT doc_id, CAST(SUM(c) AS INTEGER) AS n_shingles,
         |         CAST(COUNT(*) AS INTEGER) AS n_distinct,
         |         CAST(MAX(c) AS INTEGER) AS max_rep
         |  FROM rep GROUP BY doc_id)
         |SELECT doc_id, n_shingles, n_distinct, max_rep,
         |       CAST(n_shingles - n_distinct AS DOUBLE)
         |         / CAST(n_shingles AS DOUBLE) AS dup_ratio
         |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
      // WHOLE FOLD IN ONE KERNEL PASS (round 10): the shingle counting
      // is per-document with bounded state (a count map over the doc's
      // own 3-grams), so the explode + two corpus-scale hash aggregates
      // (30.4 s at sf10) collapse into graft_rep_stats
      // (functions/Shingles.scala) — a map-side projection whose only
      // exchange is the output-linear ORDER BY. <3-token docs degrade
      // to one whole-doc shingle, same as the dedup tiering.
      graft.functions.Shingles.register(s)
      // sort first, fold after (the q61 move): a map-only lineage under
      // a global ORDER BY runs twice — the range sampler executes the
      // child — so the kernel sat on both passes; sorting the narrow
      // scan first also spreads the fold over the sort partitions
      Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy("doc_id")
        .select(col("doc_id"),
                call_function("graft_rep_stats", col("text"), lit(3)).as("st"))
        .select(col("doc_id"),
                col("st.n_shingles").cast("int").as("n_shingles"),
                col("st.n_distinct").cast("int").as("n_distinct"),
                col("st.max_rep").cast("int").as("max_rep"))
        .withColumn("dup_ratio",
          (col("n_shingles") - col("n_distinct")).cast("double") /
            col("n_shingles").cast("double"))
    },

    // Eval-set contamination scan: how many corpus documents share a
    // long n-gram with each "benchmark" document (the held-out split is
    // the deterministic doc_id % 50 == 0 slice). 6-token grams make the
    // collision space big enough that only genuine text reuse matches —
    // on random text a shared 6-gram is ~vocab⁻⁶ per position — so hits
    // mean near-duplication across the train/eval boundary, the thing a
    // training pipeline must catch before it reports eval numbers. The
    // gram value is the blocking key: candidates meet in an equi-join,
    // never a benchmark × corpus cross product.
    "ta_contamination" -> Q(
      """WITH grams AS (
        |  SELECT doc_id,
        |         list_distinct(CASE WHEN len(string_split(text,' ')) >= 6
        |           THEN [array_to_string((string_split(text,' '))[i:i+5],' ')
        |                 for i in range(1, len(string_split(text,' '))-4)]
        |           ELSE [] END) AS gs
        |  FROM documents),
        |bsh AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 50 = 0),
        |csh AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 50 <> 0),
        |pairs AS (
        |  SELECT b.doc_id AS bid, c.doc_id AS cid, COUNT(*) AS shared
        |  FROM bsh b JOIN csh c ON b.g = c.g GROUP BY 1, 2),
        |agg AS (
        |  SELECT bid, CAST(COUNT(*) AS INTEGER) AS n_contaminated,
        |         CAST(MAX(shared) AS INTEGER) AS max_shared
        |  FROM pairs GROUP BY bid)
        |SELECT d.doc_id, COALESCE(a.n_contaminated, 0) AS n_contaminated,
        |       COALESCE(a.max_shared, 0) AS max_shared
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.bid
        |WHERE d.doc_id % 50 = 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      // kernel mode 3 (first-occurrence-distinct during the byte walk)
      // replaces the round-10 row-level .distinct(): the (doc_id, g)
      // dedup was a corpus-scale shuffle of gram STRINGS that the
      // kernel performs in place, so both sides of the blocking join
      // are pure map-side projections until the join's own exchange —
      // the only gram-keyed shuffle left in the plan.
      graft.functions.Shingles.register(s)
      def grams(dc: org.apache.spark.sql.DataFrame) = dc
        .select(col("doc_id"),
                explode(call_function("graft_shingles",
                  col("text"), lit(6), lit(3))).as("g"))
      val bsh = grams(docs.filter(col("doc_id") % 50 === 0))
        .select(col("doc_id").as("bid"), col("g"))
      val csh = grams(docs.filter(col("doc_id") % 50 =!= 0))
        .select(col("doc_id").as("cid"), col("g").as("g2"))
      val agg = bsh.join(csh, col("g") === col("g2"))
        .groupBy("bid", "cid").agg(count(lit(1)).as("shared"))
        .groupBy("bid")
        .agg(count(lit(1)).cast("int").as("n_contaminated"),
             max(col("shared")).cast("int").as("max_shared"))
      docs.filter(col("doc_id") % 50 === 0)
        .join(agg, col("doc_id") === col("bid"), "left_outer")
        .select(col("doc_id"),
                coalesce(col("n_contaminated"), lit(0)).as("n_contaminated"),
                coalesce(col("max_shared"), lit(0)).as("max_shared"))
        .orderBy("doc_id")
    },

    // Rare-token share: the fraction of each document's tokens whose
    // CORPUS frequency is below the mean token frequency
    // (total_tokens / vocabulary_size — an exact integer-derived
    // threshold, no percentile needed). The token-frequency dimension is
    // a broadcast (bounded by vocabulary, not corpus) joined against the
    // exploded token stream; per-doc share is one conditional aggregate.
    "ta_rare_token_share" -> Q(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
        |freq AS (SELECT t, COUNT(*) AS f FROM tok GROUP BY t),
        |thr AS (
        |  SELECT CAST(SUM(f) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_f
        |  FROM freq)
        |SELECT k.doc_id,
        |       CAST(COUNT(*) AS INTEGER) AS n_tokens,
        |       CAST(SUM(CASE WHEN f.f < t.mean_f THEN 1 ELSE 0 END) AS INTEGER)
        |         AS n_rare,
        |       CAST(SUM(CASE WHEN f.f < t.mean_f THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) AS rare_share
        |FROM tok k JOIN freq f ON k.t = f.t CROSS JOIN thr t
        |GROUP BY k.doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      val freq = tok.groupBy("t").agg(count(lit(1)).as("f"))
      val thr  = freq.agg(
        (sum(col("f")).cast("double") / count(lit(1)).cast("double")).as("mean_f"))
      val isRare = when(col("f") < col("mean_f"), 1).otherwise(0)
      tok.join(broadcast(freq), "t")
        .crossJoin(broadcast(thr))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_tokens"),
             sum(isRare).cast("int").as("n_rare"),
             (sum(isRare).cast("double") / count(lit(1)).cast("double")).as("rare_share"))
        .orderBy("doc_id")
    },

    // Bigram-LM quality score — the CCNet-style "train a small LM on the
    // corpus, keep documents the LM finds predictable" proxy, kept
    // oracle-exact: conditional probabilities p(w2|w1) are corpus bigram
    // counts over prefix counts, quantized to BIGINT at 1e-6 (floor of
    // one IEEE division — deterministic in both engines), and a doc's
    // score is the mean quantized probability over its bigram INSTANCES.
    // Shape: the probability table is built once per corpus (two
    // map-side-combined aggregates over distinct grams — prefix totals
    // derive from the gram table, not a second scan), then one equi-join
    // from exploded instances to the gram dim. No raw double ever
    // aggregates: sums are BIGINT until the final division.
    "ta_bigram_lm" -> Q(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |inst AS (
        |  SELECT doc_id, toks[s] || ' ' || toks[s+1] AS gram
        |  FROM t, unnest(range(1, len(toks))) u(s)),
        |bg AS (SELECT gram, COUNT(*) AS n2 FROM inst GROUP BY gram),
        |pf AS (
        |  SELECT split_part(gram, ' ', 1) AS prefix, CAST(SUM(n2) AS BIGINT) AS n1
        |  FROM bg GROUP BY prefix),
        |dim AS (
        |  SELECT bg.gram,
        |         CAST(floor(CAST(bg.n2 AS DOUBLE) / CAST(pf.n1 AS DOUBLE) * 1000000) AS BIGINT) AS q
        |  FROM bg JOIN pf ON split_part(bg.gram, ' ', 1) = pf.prefix)
        |SELECT i.doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
        |       CAST(CAST(SUM(d.q) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |         / CAST(1000000 AS DOUBLE) AS lm_score
        |FROM inst i JOIN dim d ON i.gram = d.gram
        |GROUP BY i.doc_id ORDER BY i.doc_id""".stripMargin) { (s, d) =>
      // the bigram stream is the n=2 byte-slice kernel (mode 2:
      // positional, empty for <2-token docs — the same single-token
      // guard the old sequence/slice chain spelled out)
      graft.functions.Shingles.register(s)
      val inst = Tables.documents(s, d)
        .select(col("doc_id"),
                explode(call_function("graft_shingles",
                  col("text"), lit(2), lit(2))).as("gram"))
      val bg = inst.groupBy("gram").agg(count(lit(1)).as("n2"))
      val pf = bg.groupBy(substring_index(col("gram"), " ", 1).as("prefix"))
        .agg(sum(col("n2")).as("n1"))
      val dim = bg.join(pf, substring_index(col("gram"), " ", 1) === col("prefix"))
        .select(col("gram").as("d_gram"),
                floor(col("n2").cast("double") / col("n1").cast("double") * 1000000)
                  .cast("long").as("q"))
      inst.join(dim, col("gram") === col("d_gram"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_bigrams"),
             (sum(col("q")).cast("double") / count(lit(1)).cast("double")
               / lit(1000000.0)).as("lm_score"))
        .orderBy("doc_id")
    },

    // HELD-OUT LM scoring — the form a production quality filter
    // actually runs (CCNet trains its LM on a reference corpus and
    // scores CANDIDATE documents): the bigram LM is trained on the
    // doc_id%10<8 split and scores only the held-out 20%, with add-one
    // smoothing over the train vocabulary so unseen transitions get a
    // defined probability instead of dropping out (ta_bigram_lm scores
    // in-corpus, where every gram is seen by construction — the
    // memorization bias this split removes). Entirely BIGINT floor
    // arithmetic — q = (n2+1)·1e6 div (n1+V), backoff 1e6 div (n1+V)
    // for unseen grams, 1e6 div V for unseen prefixes — so there is no
    // float before the final display division and the oracle matches to
    // the bit. n_oov per doc is the OOV-rate signal filters threshold
    // alongside the score. Scale shape: the train dim is gram-vocab-
    // bounded, V is one broadcast scalar, eval instances equi-join the
    // dim — one corpus pass each side, all aggregates map-side combined.
    "ta_lm_holdout" -> Q(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |inst AS (
        |  SELECT doc_id, toks[s] || ' ' || toks[s+1] AS gram
        |  FROM t, unnest(range(1, len(toks))) u(s)),
        |tr AS (SELECT gram, COUNT(*) AS n2 FROM inst WHERE doc_id % 10 < 8 GROUP BY gram),
        |pf AS (
        |  SELECT split_part(gram, ' ', 1) AS prefix, CAST(SUM(n2) AS BIGINT) AS n1
        |  FROM tr GROUP BY prefix),
        |v AS (
        |  SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS vs
        |  FROM (SELECT unnest(toks) AS tk FROM t WHERE doc_id % 10 < 8)),
        |ev AS (
        |  SELECT doc_id, gram, split_part(gram, ' ', 1) AS w1
        |  FROM inst WHERE doc_id % 10 >= 8),
        |j AS (
        |  SELECT e.doc_id,
        |         CASE WHEN tr.n2 IS NOT NULL THEN (tr.n2 + 1) * 1000000 // (pf.n1 + v.vs)
        |              WHEN pf.n1 IS NOT NULL THEN 1000000 // (pf.n1 + v.vs)
        |              ELSE 1000000 // v.vs END AS q,
        |         CASE WHEN tr.n2 IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM ev e
        |  LEFT JOIN tr ON e.gram = tr.gram
        |  LEFT JOIN pf ON e.w1 = pf.prefix
        |  CROSS JOIN v)
        |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
        |       CAST(SUM(oov) AS INTEGER) AS n_oov,
        |       CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |         / CAST(1000000 AS DOUBLE) AS lm_score
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      // the bigram stream is the n=2 instance of the byte-slice shingle
      // kernel (mode 2: positional, empty for <2-token docs) — the
      // explode(sequence)+slice+concat_ws HOF chain it replaces ran
      // interpreted per token
      graft.functions.Shingles.register(s)
      val t = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val inst = Tables.documents(s, d)
        .select(col("doc_id"),
                explode(call_function("graft_shingles",
                  col("text"), lit(2), lit(2))).as("gram"))
      val tr = inst.filter(col("doc_id") % 10 < 8)
        .groupBy("gram").agg(count(lit(1)).as("n2"))
      val pf = tr.groupBy(substring_index(col("gram"), " ", 1).as("prefix"))
        .agg(sum(col("n2")).as("n1"))
      val v = t.filter(col("doc_id") % 10 < 8)
        .select(explode(col("toks")).as("tk"))
        .agg(count_distinct(col("tk")).as("vs"))
      inst.filter(col("doc_id") % 10 >= 8)
        .withColumn("w1", substring_index(col("gram"), " ", 1))
        .join(tr.select(col("gram").as("t_gram"), col("n2")),
              col("gram") === col("t_gram"), "left")
        .join(pf, col("w1") === col("prefix"), "left")
        .crossJoin(broadcast(v))
        .select(col("doc_id"),
          when(col("n2").isNotNull, expr("(n2 + 1) * 1000000L div (n1 + vs)"))
            .when(col("n1").isNotNull, expr("1000000L div (n1 + vs)"))
            .otherwise(expr("1000000L div vs")).as("q"),
          when(col("n2").isNull, 1).otherwise(0).as("oov"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_bigrams"),
             sum(col("oov")).cast("int").as("n_oov"),
             (sum(col("q")).cast("double") / count(lit(1)).cast("double")
               / lit(1000000.0)).as("lm_score"))
        .orderBy("doc_id")
    },

    // Interpolated Kneser-Ney bigram score — the smoothing that actually
    // ships in n-gram LMs (KenLM/SRILM default), completing the family
    // next to the unsmoothed MLE (ta_bigram_lm) and add-one holdout
    // (ta_lm_holdout):
    //   p(w2|w1) = max(n2 − D, 0)/n1 + (D·c1(w1)/n1)·(t2(w2)/T)
    // with discount D = 3/4, c1(w1) = distinct continuations of w1,
    // t2(w2) = distinct predecessors of w2 (the CONTINUATION count — the
    // insight of KN: how many contexts a word completes, not how often),
    // and T = total bigram types. With D = 3/4 the whole probability is
    // one exact integer ratio,
    //   q = 1e6·[max(4·n2−3, 0)·T + 3·c1·t2] div (4·n1·T),
    // so both engines compute the identical BIGINT before the final
    // display division (headroom: at sf1 the numerator is ~1e6·8·10⁶·T
    // ≈ 1e16 < 2⁶³; a 100 TB corpus would move this to DECIMAL(38)
    // arithmetic, same shape). Scale: the three model dims (gram, prefix,
    // suffix) are vocab-bounded map-side-combined aggregates DERIVED
    // FROM the gram table (one corpus pass total), T is one broadcast
    // scalar, and instances meet the gram dim in one equi-join.
    "ta_kn_bigram" -> Q(
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |inst AS (
        |  SELECT doc_id, toks[s] || ' ' || toks[s+1] AS gram
        |  FROM t, unnest(range(1, len(toks))) u(s)),
        |bg AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS n2 FROM inst GROUP BY gram),
        |pf AS (
        |  SELECT split_part(gram, ' ', 1) AS prefix,
        |         CAST(SUM(n2) AS BIGINT) AS n1, CAST(COUNT(*) AS BIGINT) AS c1
        |  FROM bg GROUP BY prefix),
        |sfx AS (
        |  SELECT split_part(gram, ' ', 2) AS suffix, CAST(COUNT(*) AS BIGINT) AS t2
        |  FROM bg GROUP BY suffix),
        |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS tv FROM bg),
        |dim AS (
        |  SELECT bg.gram,
        |         1000000 * (GREATEST(4*bg.n2 - 3, 0) * tt.tv + 3 * pf.c1 * sfx.t2)
        |           // (4 * pf.n1 * tt.tv) AS q
        |  FROM bg
        |  JOIN pf ON split_part(bg.gram, ' ', 1) = pf.prefix
        |  JOIN sfx ON split_part(bg.gram, ' ', 2) = sfx.suffix
        |  CROSS JOIN tt)
        |SELECT i.doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
        |       CAST(CAST(SUM(d.q) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |         / CAST(1000000 AS DOUBLE) AS kn_score
        |FROM inst i JOIN dim d ON i.gram = d.gram
        |GROUP BY i.doc_id ORDER BY i.doc_id""".stripMargin) { (s, d) =>
      graft.functions.Shingles.register(s)
      val inst = Tables.documents(s, d)
        .select(col("doc_id"),
                explode(call_function("graft_shingles",
                  col("text"), lit(2), lit(2))).as("gram"))
      val bg = inst.groupBy("gram").agg(count(lit(1)).as("n2"))
      val pf = bg.groupBy(substring_index(col("gram"), " ", 1).as("prefix"))
        .agg(sum(col("n2")).as("n1"), count(lit(1)).as("c1"))
      val sfx = bg.groupBy(substring_index(col("gram"), " ", -1).as("suffix"))
        .agg(count(lit(1)).as("t2"))
      val tt = bg.agg(count(lit(1)).as("tv"))
      val dim = bg
        .join(pf, substring_index(col("gram"), " ", 1) === col("prefix"))
        .join(sfx, substring_index(col("gram"), " ", -1) === col("suffix"))
        .crossJoin(broadcast(tt))
        .select(col("gram").as("d_gram"),
          expr("1000000L * (GREATEST(4*n2 - 3, 0L) * tv + 3 * c1 * t2) div (4 * n1 * tv)")
            .as("q"))
      inst.join(dim, col("gram") === col("d_gram"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_bigrams"),
             (sum(col("q")).cast("double") / count(lit(1)).cast("double")
               / lit(1000000.0)).as("kn_score"))
        .orderBy("doc_id")
    }
  )
}
