package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch 2 — pipeline-quality operators:
  *
  *   - `ta_calibration` — reliability diagram of the langid classifier's
  *     confidence (marker-vote share) against its accuracy, the ECE
  *     input table. All-bin-integer construction: confidence bins and
  *     the quantized confidence sum use INTEGER division on the raw
  *     marker counts (`sc_best*10 div sc_total`), so no float ever
  *     reaches the hash and no ulp can move a doc across a bin edge.
  *   - `pr_pseudonymize` — consistent SHA-256 pseudonymization of the
  *     user-id key with referential-integrity evidence: per hex-prefix
  *     bucket, distinct users must equal distinct pseudonyms (collision-
  *     free tokenization) and the pseudonym-space join to the customer
  *     table must preserve the raw-key join's cardinality.
  *   - `el_markov_eval` — top-1 next-event accuracy of the bigram
  *     transition model (el_markov_transitions' model) on a held-out
  *     20% of transitions (next event_id ≡ 0 mod 5 — a deterministic,
  *     leakage-free split: train counts exclude exactly the predicted
  *     transitions).
  *   - `el_uplift_segments` — per-segment A/B uplift table with a
  *     scale-stable conversion definition (signup in the first 5
  *     events).
  *   - `ta_contamination_folded` — the contamination scan with both
  *     sides canonicalized through `graft_fold_text`, pinning that the
  *     fold defeats casing/diacritic evasion (n_raw = 0, n_folded =
  *     ta_contamination's counts).
  */
object PipelineQueries2 {

  /** The ta_langid classifier definition — the calibration measures THAT
    * classifier, so the vocabulary is shared, not copied. */
  private val markers: Seq[(String, Seq[String])] = TextQueries.markers

  val defs: Map[String, Q] = Map(

    // Reliability diagram: bin = vote-share decile (integer division on
    // the marker counts), per bin the doc count, correct count, and the
    // 1e6-quantized confidence sum (Σ sc_best·1e6 div sc_total — exact
    // integers both engines; ECE = Σ|acc−conf|·n/N is one downstream
    // fold over ≤10 rows). Docs with zero marker hits carry conf 0 and
    // the tie-order prediction — kept, not dropped (they're the
    // classifier's real behavior on marker-free text). Scale: one scan,
    // marker filters per row, map-side-combined groupBy on ≤10 bins.
    "ta_calibration" -> Q({
      val scores = markers.map { case (l, ws) =>
        val inList = ws.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(string_split(text,' '), t -> t IN ($inList))) AS sc_$l"
      }.mkString(", ")
      val langs = markers.map(_._1)
      val argmax = langs.init.map { l =>
        val geAll = langs.filter(_ != l).map(o => s"sc_$l >= sc_$o").mkString(" AND ")
        s"WHEN $geAll THEN '$l'"
      }.mkString(" ")
      val best = langs.map(l => s"sc_$l").reduceLeft((a, b) => s"greatest($a, $b)")
      val tot  = langs.map(l => s"sc_$l").mkString(" + ")
      s"""WITH scored AS (SELECT doc_id, lang, $scores FROM documents),
         |p AS (
         |  SELECT lang,
         |         CASE $argmax ELSE '${langs.last}' END AS predicted,
         |         $best AS sc_best, $tot AS sc_total
         |  FROM scored),
         |b AS (
         |  SELECT CAST(CASE WHEN sc_total = 0 THEN 0
         |                   ELSE least((sc_best * 10) // sc_total, 9) END AS BIGINT) AS bin,
         |         CASE WHEN predicted = lang THEN 1 ELSE 0 END AS ok,
         |         CASE WHEN sc_total = 0 THEN 0
         |              ELSE (sc_best * 1000000) // sc_total END AS conf_q
         |  FROM p)
         |SELECT bin, COUNT(*) AS n_docs,
         |       CAST(SUM(ok) AS BIGINT) AS n_correct,
         |       CAST(SUM(conf_q) AS BIGINT) AS conf_q_sum
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin
    }) { (s, d) =>
      val langs = markers.map(_._1)
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
                split(col("text"), " ").as("toks"))
        .select(Seq(col("doc_id"), col("lang")) ++
          markers.map { case (l, ws) =>
            size(filter(col("toks"), t => t.isin(ws.map(x => x: Any): _*)))
              .cast("long").as(s"sc_$l") }: _*)
      val predicted = langs.init.foldRight(lit(langs.last): Column) { (l, els) =>
        val geAll = langs.filter(_ != l).map(o => col(s"sc_$l") >= col(s"sc_$o")).reduce(_ && _)
        when(geAll, lit(l)).otherwise(els)
      }
      val best = langs.map(l => col(s"sc_$l")).reduceLeft((a, b) => greatest(a, b))
      val tot  = langs.map(l => col(s"sc_$l")).reduce(_ + _)
      scored
        .withColumn("predicted", predicted)
        .withColumn("sc_best", best).withColumn("sc_total", tot)
        .select(
          // div, not /: Spark's / on longs is DOUBLE division; DuckDB's
          // // is floor division — identical for these nonnegative ints
          when(col("sc_total") === 0, lit(0L))
            .otherwise(least(expr("sc_best * 10 div sc_total"), lit(9L)))
            .cast("long").as("bin"),
          when(col("predicted") === col("lang"), 1L).otherwise(0L).as("ok"),
          when(col("sc_total") === 0, lit(0L))
            .otherwise(expr("sc_best * 1000000 div sc_total")).as("conf_q"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
             sum("ok").cast("long").as("n_correct"),
             sum("conf_q").cast("long").as("conf_q_sum"))
        .orderBy("bin")
    },

    // Consistent pseudonymization: pseudo(uid) = sha256('graft:' || uid).
    // Deterministic ⇒ the same user tokenizes identically everywhere, so
    // joins survive de-identification; the query SHOWS that: per leading-
    // hex bucket of the pseudonym space (a uniformity read on the
    // tokenizer too), distinct users == distinct pseudonyms (injective on
    // this domain — a collision would surface as nd_pseudo < nd_users),
    // and events join customer ON PSEUDONYM with the cardinality the raw
    // key join gives. Scale: sha256 is per-row codegen'd; the join is
    // left UNHINTED — the distinct sha'd customer keyset grows linearly
    // with |customer| (~100 MB of 64-char hashes at SF10+), so a forced
    // broadcast would ship the whole dimension to every task; shuffling
    // on the pseudonym is the scale-safe default (it even UNIFORMIZES a
    // skewed raw keyspace), and AQE still elects a broadcast at the SFs
    // where the keyset is actually small.
    "pr_pseudonymize" -> Q(
      """WITH ev AS (
        |  SELECT sha256('graft:' || CAST(user_id AS VARCHAR)) AS pseudo, user_id
        |  FROM events),
        |cust AS (
        |  SELECT DISTINCT sha256('graft:' || CAST(c_custkey AS VARCHAR)) AS pseudo
        |  FROM customer)
        |SELECT substr(ev.pseudo, 1, 1) AS bucket,
        |       COUNT(*) AS n_events,
        |       CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS nd_users,
        |       CAST(COUNT(DISTINCT ev.pseudo) AS BIGINT) AS nd_pseudo,
        |       CAST(COUNT(DISTINCT CASE WHEN cust.pseudo IS NOT NULL
        |                                THEN ev.pseudo END) AS BIGINT) AS nd_matched
        |FROM ev LEFT JOIN cust ON ev.pseudo = cust.pseudo
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // pseudonymize the USER DIMENSION, not the event stream: every
      // per-bucket statistic is a function of (user, pseudo, matched,
      // per-user event count), so the fact table pays one narrow
      // map-side-combined groupBy(user_id) and sha256 runs |users| +
      // |customer| times instead of |events| — and the multi-distinct
      // Expand (x4, carrying 64-char hashes) now expands the user
      // dimension, not 10M event rows. The join stays ON THE PSEUDONYM
      // (unhinted, the round-8 scale note): a sha collision must
      // surface exactly as the oracle's string join would show it.
      val u = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("n_ev"))
        .select(col("user_id"), col("n_ev"),
                sha2(concat(lit("graft:"), col("user_id").cast("string")), 256)
                  .as("pseudo"))
      val cust = Tables.customer(s, d)
        .select(sha2(concat(lit("graft:"), col("c_custkey").cast("string")), 256)
                  .as("cpseudo")).distinct()
      u.join(cust, col("pseudo") === col("cpseudo"), "left")
        .groupBy(substring(col("pseudo"), 1, 1).as("bucket"))
        .agg(sum(col("n_ev")).as("n_events"),
             countDistinct(col("user_id")).as("nd_users"),
             countDistinct(col("pseudo")).as("nd_pseudo"),
             countDistinct(when(col("cpseudo").isNotNull, col("pseudo"))).as("nd_matched"))
        .orderBy("bucket")
    },

    // Bigram next-event model, evaluated: train on transitions whose NEXT
    // event_id ≢ 0 (mod 5), predict argmax(next | cur) (count desc, name
    // asc tie-break), score top-1 accuracy on the held-out 20%. The split
    // keys on the PREDICTED event — train never sees a holdout target, so
    // the accuracy is leakage-free. Scale: sessions sort within user
    // partitions (the sessionize shuffle), the model is ≤|types|² rows
    // broadcast back, holdout scoring is one map-side-combined aggregate.
    "el_markov_eval" -> Q(
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
        |         lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_id
        |  FROM events),
        |tr AS (SELECT event_type AS cur, nxt, nxt_id FROM seq WHERE nxt IS NOT NULL),
        |train AS (SELECT cur, nxt, COUNT(*) AS c FROM tr WHERE nxt_id % 5 <> 0 GROUP BY 1,2),
        |pred AS (
        |  SELECT cur, nxt AS pred FROM (
        |    SELECT cur, nxt, row_number() OVER (PARTITION BY cur ORDER BY c DESC, nxt) AS rk
        |    FROM train) WHERE rk = 1),
        |hold AS (SELECT cur, nxt FROM tr WHERE nxt_id % 5 = 0)
        |SELECT h.cur AS event_type, COUNT(*) AS n_holdout,
        |       CAST(SUM(CASE WHEN h.nxt = p.pred THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |FROM hold h JOIN pred p ON h.cur = p.cur
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val seq = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .withColumn("nxt_id", lead(col("event_id"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("event_type").as("cur"), col("nxt"), col("nxt_id"))
      val train = seq.filter(col("nxt_id") % 5 =!= 0)
        .groupBy("cur", "nxt").agg(count(lit(1)).as("c"))
      val pred = train
        .withColumn("rk", row_number().over(
          Window.partitionBy("cur").orderBy(col("c").desc, col("nxt"))))
        .filter(col("rk") === 1)
        .select(col("cur"), col("nxt").as("pred"))
      seq.filter(col("nxt_id") % 5 === 0)
        .join(broadcast(pred), Seq("cur"))
        .groupBy(col("cur").as("event_type"))
        .agg(count(lit(1)).as("n_holdout"),
             sum(when(col("nxt") === col("pred"), 1).otherwise(0))
               .cast("long").as("n_correct"))
        .orderBy("event_type")
    },

    // Uplift table by segment: per customer region, conversion counts in
    // both A/B arms (variant = user parity). Conversion is SCALE-STABLE
    // by construction — "signed up within the user's first 5 events" is
    // a fixed-length prefix, so its probability doesn't drift as events-
    // per-user grows with SF. Only integer numerators/denominators leave
    // the query (uplift = ct/nt − cc/nc is one downstream division).
    // Scale: the prefix rank is a user-partitioned window (the
    // sessionize shuffle), segments come off broadcast dims.
    "el_uplift_segments" -> Q(
      """WITH ranked AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |u AS (SELECT user_id,
        |             MAX(CASE WHEN rn <= 5 AND event_type='signup' THEN 1 ELSE 0 END) AS converted
        |      FROM ranked GROUP BY 1),
        |seg AS (
        |  SELECT u.user_id, u.user_id % 2 AS variant, r.r_name AS segment, u.converted
        |  FROM u JOIN customer c ON u.user_id = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey)
        |SELECT segment,
        |  CAST(SUM(CASE WHEN variant=1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
        |  CAST(SUM(CASE WHEN variant=1 THEN converted ELSE 0 END) AS BIGINT) AS conv_treat,
        |  CAST(SUM(CASE WHEN variant=0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
        |  CAST(SUM(CASE WHEN variant=0 THEN converted ELSE 0 END) AS BIGINT) AS conv_ctrl
        |FROM seg GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val u = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .groupBy("user_id")
        .agg(max(when(col("rn") <= 5 && col("event_type") === "signup", 1)
                   .otherwise(0)).as("converted"))
      val segDim = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name").as("segment"))
      u.join(segDim, col("user_id") === col("c_custkey"))
        .withColumn("variant", col("user_id") % 2)
        .groupBy("segment")
        .agg(sum(when(col("variant") === 1, 1).otherwise(0)).cast("long").as("n_treat"),
             sum(when(col("variant") === 1, col("converted")).otherwise(0)).cast("long").as("conv_treat"),
             sum(when(col("variant") === 0, 1).otherwise(0)).cast("long").as("n_ctrl"),
             sum(when(col("variant") === 0, col("converted")).otherwise(0)).cast("long").as("conv_ctrl"))
        .orderBy("segment")
    },

    // Contamination scan AFTER canonicalization: the benchmark split's
    // text is DECORATED (uppercased, E/A/U accented — the casing/
    // diacritic evasion a raw exact-gram scan misses), then both sides
    // fold through graft_fold_text before the 6-gram blocking join.
    // n_raw pins the evasion (decorated grams match nothing raw);
    // n_folded must equal ta_contamination's n_contaminated exactly,
    // because folding the decorated benchmark text restores the original
    // bytes and folding the (already lower-ASCII) corpus is identity.
    // Scale shape identical to ta_contamination: gram equi-join, never
    // benchmark × corpus.
    "ta_contamination_folded" -> Q(
      s"""WITH bench AS (
         |  SELECT doc_id,
         |         translate(upper(text), 'EAU', 'ÉÀÜ') AS dec_text,
         |         lower(strip_accents(translate(upper(text), 'EAU', 'ÉÀÜ'))) AS fold_text
         |  FROM documents WHERE doc_id % 50 = 0),
         |corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
         |bg AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(string_split(fold_text,' ')) >= 6
         |      THEN [array_to_string((string_split(fold_text,' '))[i:i+5],' ')
         |            for i in range(1, len(string_split(fold_text,' '))-4)]
         |      ELSE [] END)) AS g
         |  FROM bench),
         |bgraw AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(string_split(dec_text,' ')) >= 6
         |      THEN [array_to_string((string_split(dec_text,' '))[i:i+5],' ')
         |            for i in range(1, len(string_split(dec_text,' '))-4)]
         |      ELSE [] END)) AS g
         |  FROM bench),
         |cg AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN len(string_split(text,' ')) >= 6
         |      THEN [array_to_string((string_split(text,' '))[i:i+5],' ')
         |            for i in range(1, len(string_split(text,' '))-4)]
         |      ELSE [] END)) AS g
         |  FROM corpus),
         |fold_hits AS (
         |  SELECT b.doc_id AS bid, CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_folded
         |  FROM bg b JOIN cg c ON b.g = c.g GROUP BY 1),
         |raw_hits AS (
         |  SELECT b.doc_id AS bid, CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_raw
         |  FROM bgraw b JOIN cg c ON b.g = c.g GROUP BY 1)
         |SELECT d.doc_id, COALESCE(r.n_raw, 0) AS n_raw,
         |       COALESCE(f.n_folded, 0) AS n_folded
         |FROM documents d
         |LEFT JOIN raw_hits r ON d.doc_id = r.bid
         |LEFT JOIN fold_hits f ON d.doc_id = f.bid
         |WHERE d.doc_id % 50 = 0 ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.functions.FoldText.register(s)
      graft.functions.Shingles.register(s)
      val docs = Tables.documents(s, d)
      // one-pass byte-slice kernel (mode 3: first-occurrence-distinct
      // during the walk, empty for <6-token inputs) over whichever text
      // variant each side folds — the per-side row-level .distinct()
      // exchanges (three of them, one corpus-scale) collapse into the
      // kernel's in-place dedup, so every gram lineage is map-side
      // until its blocking join
      def gramsOf(textCol: org.apache.spark.sql.Column) =
        explode(call_function("graft_shingles", textCol, lit(6), lit(3)))
      val bench = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"),
                translate(upper(col("text")), "EAU", "ÉÀÜ").as("dec_text"))
        .withColumn("fold_text", call_function("graft_fold_text", col("dec_text")))
      val bg = bench.select(col("doc_id").as("bid"), gramsOf(col("fold_text")).as("g"))
      val bgraw = bench.select(col("doc_id").as("bid"), gramsOf(col("dec_text")).as("g"))
      val cg = docs.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id").as("cid"), gramsOf(col("text")).as("g"))
      val foldHits = bg.join(cg, "g")
        .groupBy("bid").agg(countDistinct("cid").as("n_folded"))
      val rawHits = bgraw.join(cg, "g")
        .groupBy("bid").agg(countDistinct("cid").as("n_raw"))
      docs.filter(col("doc_id") % 50 === 0).select(col("doc_id"))
        .join(rawHits, col("doc_id") === rawHits("bid"), "left_outer")
        .join(foldHits, col("doc_id") === foldHits("bid"), "left_outer")
        .select(col("doc_id"),
                coalesce(col("n_raw"), lit(0L)).as("n_raw"),
                coalesce(col("n_folded"), lit(0L)).as("n_folded"))
        .orderBy("doc_id")
    },

    // Borda rank fusion of quality signals — the ensemble ranker a data-
    // curation pipeline uses when no single quality score is trusted:
    // within each source, rank docs by type diversity (desc), length
    // (desc), and stopword count (asc), Borda-sum the three ranks, and
    // surface each source's top-3. Ranks are row_number with a doc_id
    // tiebreak — fully deterministic, all-integer. Scale: windows are
    // PARTITIONED by source (parallel), never global; one scan feeds all
    // three rankings.
    "ta_quality_borda" -> Q(
      """WITH sig AS (
        |  SELECT source, doc_id,
        |         len(list_distinct(string_split(text,' '))) AS n_types,
        |         len(string_split(text,' ')) AS n_toks,
        |         len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS n_stop
        |  FROM documents),
        |rk AS (
        |  SELECT source, doc_id,
        |         row_number() OVER (PARTITION BY source ORDER BY n_types DESC, doc_id) AS r1,
        |         row_number() OVER (PARTITION BY source ORDER BY n_toks DESC, doc_id) AS r2,
        |         row_number() OVER (PARTITION BY source ORDER BY n_stop ASC, doc_id) AS r3
        |  FROM sig),
        |b AS (SELECT source, doc_id, r1+r2+r3 AS borda,
        |             row_number() OVER (PARTITION BY source ORDER BY r1+r2+r3, doc_id) AS rnk
        |      FROM rk)
        |SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, CAST(borda AS BIGINT) AS borda
        |FROM b WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin) { (s, d) =>
      val sig = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("source"), col("doc_id"),
                size(array_distinct(col("toks"))).as("n_types"),
                size(col("toks")).as("n_toks"),
                size(filter(col("toks"), t => t.isin("the", "a"))).as("n_stop"))
      def rk(order: org.apache.spark.sql.Column*) =
        row_number().over(Window.partitionBy("source").orderBy(order: _*))
      val b = sig
        .withColumn("r1", rk(col("n_types").desc, col("doc_id")))
        .withColumn("r2", rk(col("n_toks").desc, col("doc_id")))
        .withColumn("r3", rk(col("n_stop").asc, col("doc_id")))
        .withColumn("borda", col("r1") + col("r2") + col("r3"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("source").orderBy(col("borda"), col("doc_id"))))
      b.filter(col("rnk") <= 3)
        .select(col("source"), col("rnk").cast("long").as("rnk"),
                col("doc_id"), col("borda").cast("long").as("borda"))
        .orderBy("source", "rnk")
    }
  )
}
