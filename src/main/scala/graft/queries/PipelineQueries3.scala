package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 training-data-pipeline batch:
  *
  *   - `ta_gopher_rules` — the Gopher quality-filter rule battery
  *     (Rae et al. 2021, "Scaling Language Models", Table A1) adapted
  *     to this corpus: word-count bounds, mean-word-length bounds,
  *     stopword floor, top-token repetition cap, type/token floor —
  *     per-rule fail counts over the whole corpus.
  *   - `ta_nb_confusion` — a TRAINED multinomial Naive Bayes text
  *     classifier (add-one smoothing), fit on the even-doc_id half,
  *     evaluated as a full confusion matrix on the odd half. In this
  *     synthetic corpus the lang label carries almost no token signal,
  *     so accuracy sits near chance — the operator under test is the
  *     training/scoring machinery (count → smoothed log-weight grid →
  *     argmax), not the corpus's separability; the matrix states that
  *     honestly.
  *   - `el_did` — difference-in-differences over the purchase stream
  *     (variant = user parity, period split at 2024-01-16).
  *   - `el_qte` — quantile treatment effects via the bounded-domain
  *     exact histogram (value has 2 decimals and a hard cap, so the
  *     cents domain is ≤ ~33k rows — the exact disc-quantile needs no
  *     corpus-wide sort at ANY scale).
  *   - `el_entropy_rate` — per-state entropy of the event-type Markov
  *     chain, H(next|cur), on a fixed integer micro-bit grid.
  *
  * Float discipline: every threshold is an integer cross-multiplication;
  * every log-term is quantized to an integer grid BEFORE the engine-local
  * sum (the el_fdr_bh pattern), so summation order cannot reach the hash.
  * Residual risk is a log() value within half an ulp of a grid boundary —
  * the same dispositioned residual as el_fdr_bh, not the hard rational-gap
  * guarantee of dd_jaro_winkler.
  */
object PipelineQueries3 {

  val defs: Map[String, Q] = Map(

    // Gopher rule battery. All five rules are integer-exact:
    //   wc_bounds:  25 ≤ wc ≤ 75
    //   mean_len:   4 ≤ Σlen/wc ≤ 10      ⇔ 4·wc ≤ Σlen ≤ 10·wc
    //   stopword:   ≥2 tokens in {the,a,of,to,in}
    //   repetition: top token < 20% of doc ⇔ 5·max < wc
    //   ttr:        distinct/wc ≥ 0.3      ⇔ 10·distinct ≥ 3·wc
    // Scale shape: one explode → (doc, token) map-side-combined count →
    // one doc-keyed aggregate → one scalar rollup; the stack() unpivot
    // is over a single row. fail_share divides two identical BIGINTs.
    "ta_gopher_rules" -> Q(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tc AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
        |d AS (SELECT doc_id, SUM(cnt) AS wc, COUNT(*) AS nd, MAX(cnt) AS mx,
        |             SUM(cnt * length(token)) AS sl,
        |             SUM(CASE WHEN token IN ('the','a','of','to','in')
        |                      THEN cnt ELSE 0 END) AS st
        |      FROM tc GROUP BY 1),
        |f AS (SELECT CASE WHEN wc < 25 OR wc > 75 THEN 1 ELSE 0 END AS f_wc,
        |             CASE WHEN sl < 4*wc OR sl > 10*wc THEN 1 ELSE 0 END AS f_len,
        |             CASE WHEN st < 2 THEN 1 ELSE 0 END AS f_stop,
        |             CASE WHEN 5*mx >= wc THEN 1 ELSE 0 END AS f_rep,
        |             CASE WHEN 10*nd < 3*wc THEN 1 ELSE 0 END AS f_ttr
        |      FROM d),
        |a AS (SELECT COUNT(*) AS n_docs,
        |             SUM(f_wc) AS wc_f, SUM(f_len) AS len_f, SUM(f_stop) AS stop_f,
        |             SUM(f_rep) AS rep_f, SUM(f_ttr) AS ttr_f,
        |             SUM(CASE WHEN f_wc+f_len+f_stop+f_rep+f_ttr > 0
        |                      THEN 1 ELSE 0 END) AS any_f
        |      FROM f)
        |SELECT rule, CAST(n_fail AS BIGINT) AS n_fail,
        |       CAST(n_fail AS DOUBLE) / CAST(n_docs AS BIGINT) AS fail_share
        |FROM (
        |  SELECT 'any_rule' AS rule, any_f AS n_fail, n_docs FROM a UNION ALL
        |  SELECT 'mean_len', len_f, n_docs FROM a UNION ALL
        |  SELECT 'repetition', rep_f, n_docs FROM a UNION ALL
        |  SELECT 'stopword', stop_f, n_docs FROM a UNION ALL
        |  SELECT 'ttr', ttr_f, n_docs FROM a UNION ALL
        |  SELECT 'wc_bounds', wc_f, n_docs FROM a)
        |ORDER BY rule""".stripMargin) { (s, d) =>
      val stops = Seq("the", "a", "of", "to", "in")
      val tc = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      val doc = tc.groupBy("doc_id")
        .agg(sum("cnt").as("wc"), count(lit(1)).as("nd"), max("cnt").as("mx"),
             sum(col("cnt") * length(col("token"))).as("sl"),
             sum(when(col("token").isin(stops: _*), col("cnt")).otherwise(0)).as("st"))
      val f = doc.select(
        when(col("wc") < 25 || col("wc") > 75, 1).otherwise(0).as("f_wc"),
        when(col("sl") < lit(4) * col("wc") || col("sl") > lit(10) * col("wc"), 1)
          .otherwise(0).as("f_len"),
        when(col("st") < 2, 1).otherwise(0).as("f_stop"),
        when(lit(5) * col("mx") >= col("wc"), 1).otherwise(0).as("f_rep"),
        when(lit(10) * col("nd") < lit(3) * col("wc"), 1).otherwise(0).as("f_ttr"))
      f.agg(count(lit(1)).as("n_docs"),
            sum("f_wc").as("wc_f"), sum("f_len").as("len_f"),
            sum("f_stop").as("stop_f"), sum("f_rep").as("rep_f"),
            sum("f_ttr").as("ttr_f"),
            sum(when(col("f_wc") + col("f_len") + col("f_stop") +
                     col("f_rep") + col("f_ttr") > 0, 1).otherwise(0)).as("any_f"))
        .selectExpr(
          """stack(6, 'any_rule', any_f, 'mean_len', len_f, 'repetition', rep_f,
            |         'stopword', stop_f, 'ttr', ttr_f, 'wc_bounds', wc_f)
            |  AS (rule, n_fail)""".stripMargin,
          "n_docs")
        .select(col("rule"), col("n_fail").cast("long").as("n_fail"),
                (col("n_fail").cast("double") / col("n_docs")).as("fail_share"))
        .orderBy("rule")
    },

    // Trained multinomial NB, add-one smoothing, 50/50 doc_id split.
    // Per-class token log-weights land on a 1e-6 grid as BIGINTs, so
    // per-doc scores are integer sums (order-free); argmax is the
    // integer encoding max(score·8 + class_idx) — ties break toward the
    // alphabetically-first class deterministically in both engines. The
    // class set is pinned to this corpus's five langs (de,en,es,fr,zh).
    // Scale shape: the weight grid is |vocab|×5 on a vocabulary-bounded
    // domain (the dd_jaro_winkler allowlist rationale) and broadcast;
    // eval explodes tokens ×5 classes (token-linear), then two
    // doc-keyed map-side-combinable aggregates; output ≤ 25 rows.
    "ta_nb_confusion" -> Q(
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |train AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
        |vocab AS (SELECT DISTINCT token FROM train),
        |cnts AS (SELECT lang, token, COUNT(*) AS c FROM train GROUP BY 1, 2),
        |tot AS (SELECT lang, COUNT(*) AS n FROM train GROUP BY 1),
        |v AS (SELECT COUNT(*) AS nv FROM vocab),
        |grid AS (
        |  SELECT t.lang, vo.token,
        |         CAST(round(ln((COALESCE(c.c, 0) + 1.0) / (t.n + v.nv)) * 1000000)
        |              AS BIGINT) AS w
        |  FROM tot t CROSS JOIN vocab vo CROSS JOIN v
        |  LEFT JOIN cnts c ON c.lang = t.lang AND c.token = vo.token),
        |dflt AS (SELECT t.lang, CAST(round(ln(1.0 / (t.n + v.nv)) * 1000000)
        |                             AS BIGINT) AS w0
        |         FROM tot t CROSS JOIN v),
        |ev AS (SELECT doc_id, lang AS true_lang, token FROM tok WHERE doc_id % 2 = 1),
        |scored AS (
        |  SELECT e.doc_id, e.true_lang, dd.lang,
        |         SUM(COALESCE(g.w, dd.w0)) AS score
        |  FROM ev e CROSS JOIN dflt dd
        |  LEFT JOIN grid g ON g.lang = dd.lang AND g.token = e.token
        |  GROUP BY 1, 2, 3),
        |pred AS (
        |  SELECT doc_id, true_lang,
        |         MAX(score * 8 + (CASE lang WHEN 'de' THEN 5 WHEN 'en' THEN 4
        |                          WHEN 'es' THEN 3 WHEN 'fr' THEN 2 ELSE 1 END)) AS enc
        |  FROM scored GROUP BY 1, 2)
        |SELECT true_lang,
        |       CASE ((enc % 8) + 8) % 8 WHEN 5 THEN 'de' WHEN 4 THEN 'en'
        |            WHEN 3 THEN 'es' WHEN 2 THEN 'fr' ELSE 'zh' END AS pred_lang,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
                explode(split(col("text"), " ")).as("token"))
      val train = tok.filter(col("doc_id") % 2 === 0)
      val cnts = train.groupBy("lang", "token").agg(count(lit(1)).as("c"))
      val tot = train.groupBy("lang").agg(count(lit(1)).as("n"))
      val vocab = train.select("token").distinct()
      val nv = vocab.agg(count(lit(1)).as("nv"))
      val grid = tot.crossJoin(vocab).crossJoin(broadcast(nv))
        .join(cnts, Seq("lang", "token"), "left")
        .select(col("lang"), col("token"),
                round(log((coalesce(col("c"), lit(0L)) + lit(1.0)) /
                          (col("n") + col("nv"))) * lit(1000000.0))
                  .cast("long").as("w"))
      val dflt = tot.crossJoin(broadcast(nv))
        .select(col("lang").as("cand"),
                round(log(lit(1.0) / (col("n") + col("nv"))) * lit(1000000.0))
                  .cast("long").as("w0"))
      def idxOf(l: String): Long = l match {
        case "de" => 5L; case "en" => 4L; case "es" => 3L; case "fr" => 2L
        case _ => 1L
      }
      // PIVOT the weight grid by language so each eval token joins ONCE
      // and carries all |langs| weights in one row — the round-9 form
      // cross-joined the eval token stream with the language dimension
      // (a x|langs| row blowup through the per-(doc, lang) aggregate).
      // The language list is a bounded control-plane read (|langs|
      // rows, the shard-map pattern); per-language default weights ride
      // a broadcast 1-row frame. argmax is the same score*8+idx
      // encoding, folded over the score columns with greatest().
      val langs = tot.select("lang").collect().map(_.getString(0)).sorted.toSeq
      def pivotAggs(src: String, pre: String): Seq[org.apache.spark.sql.Column] =
        langs.map(l => max(when(col(src) === l,
          col(if (src == "lang") "w" else "w0"))).as(s"$pre$l"))
      val gridP = grid.groupBy(col("token").as("g_token"))
        .agg(pivotAggs("lang", "w_").head, pivotAggs("lang", "w_").tail: _*)
      val dfltP = dflt.groupBy()
        .agg(pivotAggs("cand", "w0_").head, pivotAggs("cand", "w0_").tail: _*)
      val sumAggs = langs.map(l =>
        sum(coalesce(col(s"w_$l"), col(s"w0_$l"))).as(s"s_$l"))
      val scored = tok.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang").as("true_lang"), col("token"))
        .join(broadcast(gridP), col("token") === col("g_token"), "left")
        .crossJoin(broadcast(dfltP))
        .groupBy("doc_id", "true_lang")
        .agg(sumAggs.head, sumAggs.tail: _*)
      scored
        .select(col("true_lang"),
                greatest(langs.map(l =>
                  col(s"s_$l") * 8 + lit(idxOf(l))): _*).as("enc"))
        .select(col("true_lang"),
                when(pmod(col("enc"), lit(8L)) === 5, "de")
                  .when(pmod(col("enc"), lit(8L)) === 4, "en")
                  .when(pmod(col("enc"), lit(8L)) === 3, "es")
                  .when(pmod(col("enc"), lit(8L)) === 2, "fr")
                  .otherwise("zh").as("pred_lang"))
        .groupBy("true_lang", "pred_lang")
        .agg(count(lit(1)).cast("long").as("n"))
        .orderBy("true_lang", "pred_lang")
    },

    // Difference-in-differences on purchase value: variant = user
    // parity, post = ts ≥ 2024-01-16. The four cell sums/counts leave
    // as exact integers; the DiD estimate is four correctly-rounded
    // divisions and three subtractions of identical doubles — engine-
    // portable. Scale shape: one filtered scan, one 4-cell map-side
    // aggregate, single-row output.
    "el_did" -> Q(
      """WITH p AS (
        |  SELECT user_id % 2 AS variant,
        |         CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'
        |              THEN 1 ELSE 0 END AS post,
        |         CAST(round(value*100) AS BIGINT) AS v_c
        |  FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT
        |        CAST(SUM(CASE WHEN variant=1 AND post=0 THEN v_c END) AS BIGINT) AS s_pre_t,
        |        CAST(COUNT(CASE WHEN variant=1 AND post=0 THEN 1 END) AS BIGINT) AS n_pre_t,
        |        CAST(SUM(CASE WHEN variant=1 AND post=1 THEN v_c END) AS BIGINT) AS s_post_t,
        |        CAST(COUNT(CASE WHEN variant=1 AND post=1 THEN 1 END) AS BIGINT) AS n_post_t,
        |        CAST(SUM(CASE WHEN variant=0 AND post=0 THEN v_c END) AS BIGINT) AS s_pre_c,
        |        CAST(COUNT(CASE WHEN variant=0 AND post=0 THEN 1 END) AS BIGINT) AS n_pre_c,
        |        CAST(SUM(CASE WHEN variant=0 AND post=1 THEN v_c END) AS BIGINT) AS s_post_c,
        |        CAST(COUNT(CASE WHEN variant=0 AND post=1 THEN 1 END) AS BIGINT) AS n_post_c
        |      FROM p)
        |SELECT *,
        |       (CAST(s_post_t AS DOUBLE)/100/n_post_t - CAST(s_pre_t AS DOUBLE)/100/n_pre_t)
        |     - (CAST(s_post_c AS DOUBLE)/100/n_post_c - CAST(s_pre_c AS DOUBLE)/100/n_pre_c)
        |         AS did
        |FROM a""".stripMargin) { (s, d) =>
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("variant"),
                when(col("ts") >= lit("2024-01-16").cast("timestamp"), 1)
                  .otherwise(0).as("post"),
                graft.functions.Portable.cents(col("value")).as("v_c"))
      def cell(v: Int, po: Int) = col("variant") === v && col("post") === po
      p.agg(
          sum(when(cell(1, 0), col("v_c"))).cast("long").as("s_pre_t"),
          count(when(cell(1, 0), lit(1))).cast("long").as("n_pre_t"),
          sum(when(cell(1, 1), col("v_c"))).cast("long").as("s_post_t"),
          count(when(cell(1, 1), lit(1))).cast("long").as("n_post_t"),
          sum(when(cell(0, 0), col("v_c"))).cast("long").as("s_pre_c"),
          count(when(cell(0, 0), lit(1))).cast("long").as("n_pre_c"),
          sum(when(cell(0, 1), col("v_c"))).cast("long").as("s_post_c"),
          count(when(cell(0, 1), lit(1))).cast("long").as("n_post_c"))
        .withColumn("did",
          (col("s_post_t").cast("double") / 100 / col("n_post_t") -
           col("s_pre_t").cast("double") / 100 / col("n_pre_t")) -
          (col("s_post_c").cast("double") / 100 / col("n_post_c") -
           col("s_pre_c").cast("double") / 100 / col("n_pre_c")))
    },

    // Quantile treatment effects at p25/p50/p75/p90, EXACT disc
    // quantiles without a corpus sort: purchase value has 2 decimals
    // and a hard cap, so the integer-cents histogram per arm is a
    // bounded domain (≤ ~33k rows); the cumulative window runs over
    // that histogram, never the corpus, at every SF. The pick is
    // integer-exact: cum ≥ ⌈q·n/100⌉ ⇔ 100·cum ≥ q·n. Scale shape:
    // map-side-combined (variant, cents) count, a 2-partition window
    // over the bounded histogram, a 4-row quantile grid join.
    "el_qte" -> Q(
      """WITH p AS (SELECT user_id % 2 AS variant,
        |                  CAST(round(value*100) AS BIGINT) AS v_c
        |           FROM events WHERE event_type = 'purchase'),
        |h AS (SELECT variant, v_c, COUNT(*) AS c FROM p GROUP BY 1, 2),
        |n AS (SELECT variant, SUM(c) AS n FROM h GROUP BY 1),
        |cum AS (SELECT variant, v_c,
        |               SUM(c) OVER (PARTITION BY variant ORDER BY v_c) AS cum
        |        FROM h),
        |qs AS (SELECT unnest([25, 50, 75, 90]) AS q100),
        |pick AS (
        |  SELECT c.variant, q.q100, MIN(c.v_c) AS vq
        |  FROM cum c JOIN n USING (variant) CROSS JOIN qs q
        |  WHERE 100 * c.cum >= q.q100 * n.n
        |  GROUP BY 1, 2)
        |SELECT CAST(q100 AS BIGINT) AS q100,
        |       MAX(CASE WHEN variant = 1 THEN vq END) AS treat_c,
        |       MAX(CASE WHEN variant = 0 THEN vq END) AS ctrl_c,
        |       MAX(CASE WHEN variant = 1 THEN vq END)
        |         - MAX(CASE WHEN variant = 0 THEN vq END) AS qte_c
        |FROM pick GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val h = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select((col("user_id") % 2).as("variant"),
                graft.functions.Portable.cents(col("value")).as("v_c"))
        .groupBy("variant", "v_c").agg(count(lit(1)).as("c"))
      val n = h.groupBy("variant").agg(sum("c").as("n"))
      val cum = h.withColumn("cum",
        sum("c").over(Window.partitionBy("variant").orderBy("v_c")))
      val qs = h.sparkSession.range(1)
        .select(explode(array(lit(25L), lit(50L), lit(75L), lit(90L))).as("q100"))
      cum.join(broadcast(n), "variant")
        .crossJoin(broadcast(qs))
        .filter(lit(100) * col("cum") >= col("q100") * col("n"))
        .groupBy("variant", "q100").agg(min("v_c").as("vq"))
        .groupBy("q100")
        .agg(max(when(col("variant") === 1, col("vq"))).as("treat_c"),
             max(when(col("variant") === 0, col("vq"))).as("ctrl_c"))
        .select(col("q100"), col("treat_c"), col("ctrl_c"),
                (col("treat_c") - col("ctrl_c")).as("qte_c"))
        .orderBy("q100")
    },

    // Per-state entropy rate of the event-type Markov chain:
    // H(next|cur) = Σ (c/n)·log2(n/c) over the observed successors.
    // Each term is quantized to integer micro-bits BEFORE the ≤|types|
    // integer sum (the el_fdr_bh grid pattern — the identical
    // expression tree is evaluated in both engines, so only a value
    // within half an ulp of a grid boundary could diverge). Scale
    // shape: the per-user lag window (the sessionize shuffle), a
    // map-side-combined transition count, and |types|²-bounded joins.
    "el_entropy_rate" -> Q(
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         LAG(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY epoch_ns(ts)//1000, event_id) AS prev_type
        |  FROM events),
        |cnt AS (SELECT prev_type, event_type AS next_type, COUNT(*) AS c
        |        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, SUM(c) AS n FROM cnt GROUP BY 1),
        |terms AS (
        |  SELECT c.prev_type, t.n,
        |         CAST(round(1000000.0 * c.c * log2(CAST(t.n AS DOUBLE) / c.c) / t.n)
        |              AS BIGINT) AS term_ub
        |  FROM cnt c JOIN tot t ON c.prev_type = t.prev_type)
        |SELECT prev_type AS event_type, CAST(n AS BIGINT) AS n_trans,
        |       CAST(SUM(term_ub) AS BIGINT) AS entropy_ub,
        |       CAST(SUM(term_ub) AS DOUBLE) / 1000000 AS entropy_bits
        |FROM terms GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")), col("event_id"))
      val cnt = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
                lag(col("event_type"), 1).over(w).as("prev_type"))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy(col("prev_type").as("t_prev"))
        .agg(sum("c").as("n"))
      cnt.join(broadcast(tot), col("prev_type") === col("t_prev"))
        .select(col("prev_type"), col("n"),
                round(lit(1000000.0) * col("c") *
                      log2(col("n").cast("double") / col("c")) / col("n"))
                  .cast("long").as("term_ub"))
        .groupBy(col("prev_type").as("event_type"), col("n").as("n_trans"))
        .agg(sum("term_ub").cast("long").as("entropy_ub"))
        .select(col("event_type"), col("n_trans"), col("entropy_ub"),
                (col("entropy_ub").cast("double") / 1000000).as("entropy_bits"))
        .orderBy("event_type")
    }
  )
}
