package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable.duckH
import org.apache.spark.sql.functions._

/** Privacy / anonymization audits — the release-readiness checks a
  * training-data pipeline runs before data leaves the curation boundary.
  * The reference has no privacy surface at all (events carry raw integer
  * payloads end-to-end, /root/reference/src/producer/main.rs:68-82), so
  * these are part of the mandated pipeline-extension surface: k-anonymity
  * and l-diversity over quasi-identifier classes (Sweeney / Machanavajjhala
  * — the standard re-identification audits), and the per-user sensitivity
  * profile that picks differential-privacy clipping bounds (the
  * contribution-bounding step of DP-SGD / DP aggregation).
  *
  * Shared scale shape: every audit is one map-side-combined aggregate to
  * QI-class or per-user granularity (cardinality-bounded, never
  * corpus-bounded), then a rollup over classes. Nothing here reads a row
  * twice, and every output is exact integer arithmetic (the one ratio is
  * basis points via integer floor-division), so the oracles hash-match
  * bit-for-bit.
  */
object PrivacyQueries {

  def defs: Map[String, Q] = Map(

    // k-anonymity audit over the QI (c_nationkey, c_mktsegment): for each
    // candidate k, how many equivalence classes — and how many actual
    // ROWS — fall below the threshold, i.e. would need suppression or
    // generalization before a k-anonymous release. One class-size
    // aggregate (QI-cardinality rows, here ≤ 25×5), then a broadcast
    // threshold dim; rows_at_risk_bp is the headline number a release
    // gate alarms on (integer basis points, exact in both engines).
    "pr_k_anonymity" -> Q(
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS sz
        |  FROM customer GROUP BY 1, 2),
        |tot AS (
        |  SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
        |         CAST(COUNT(*) AS BIGINT) AS n_classes,
        |         CAST(MIN(sz) AS BIGINT) AS min_class
        |  FROM cls),
        |ks AS (SELECT unnest([2, 5, 10, 20]) AS k)
        |SELECT ks.k, tot.n_classes, tot.min_class,
        |       CAST(COALESCE(SUM(CASE WHEN cls.sz < ks.k THEN 1 END), 0) AS BIGINT)
        |         AS classes_below,
        |       CAST(COALESCE(SUM(CASE WHEN cls.sz < ks.k THEN cls.sz END), 0) AS BIGINT)
        |         AS rows_below,
        |       CAST(COALESCE(SUM(CASE WHEN cls.sz < ks.k THEN cls.sz END), 0)
        |              * 10000 // tot.n_rows AS BIGINT) AS rows_at_risk_bp
        |FROM cls CROSS JOIN ks CROSS JOIN tot
        |GROUP BY ks.k, tot.n_classes, tot.min_class, tot.n_rows
        |ORDER BY ks.k""".stripMargin) { (s, d) =>
      val cls = Tables.customer(s, d)
        .groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("sz"))
      val tot = cls.agg(sum(col("sz")).as("n_rows"), count(lit(1)).as("n_classes"),
                        min(col("sz")).as("min_class"))
      val ks = s.range(0, 1).select(explode(array(lit(2), lit(5), lit(10), lit(20))).as("k"))
      cls.crossJoin(broadcast(ks)).crossJoin(broadcast(tot))
        .groupBy("k", "n_classes", "min_class", "n_rows")
        .agg(coalesce(sum(when(col("sz") < col("k"), 1L)), lit(0L)).as("classes_below"),
             coalesce(sum(when(col("sz") < col("k"), col("sz"))), lit(0L)).as("rows_below"),
             expr("cast(coalesce(sum(case when sz < k then sz end), 0) * 10000 div n_rows as bigint)")
               .as("rows_at_risk_bp"))
        .select(col("k"), col("n_classes"), col("min_class"),
                col("classes_below"), col("rows_below"), col("rows_at_risk_bp"))
        .orderBy("k")
    },

    // l-diversity audit: k-anonymity's blind spot is a uniform class —
    // 50 rows that all share the same sensitive value re-identify the
    // attribute even at k=50. QI here is (c_nationkey, acctbal band of
    // 2500), sensitive attribute is the market segment; l = distinct
    // sensitive values within the class. Output is the l-histogram
    // (l -> class count + row count) a release gate reads: classes at
    // l = 1 are attribute-disclosure leaks regardless of size. Two
    // cardinality-bounded aggregates (class×segment, then class), one
    // tiny rollup.
    "pr_l_diversity" -> Q(
      """WITH cs AS (
        |  SELECT c_nationkey, CAST(FLOOR(c_acctbal / 2500) AS BIGINT) AS bal_band,
        |         c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2, 3),
        |cls AS (
        |  SELECT c_nationkey, bal_band,
        |         CAST(COUNT(*) AS BIGINT) AS l,
        |         CAST(SUM(n) AS BIGINT) AS sz
        |  FROM cs GROUP BY 1, 2)
        |SELECT l, CAST(COUNT(*) AS BIGINT) AS n_classes,
        |       CAST(SUM(sz) AS BIGINT) AS n_rows,
        |       CAST(MIN(sz) AS BIGINT) AS min_class_size,
        |       CAST(MAX(sz) AS BIGINT) AS max_class_size
        |FROM cls GROUP BY l ORDER BY l""".stripMargin) { (s, d) =>
      val cs = Tables.customer(s, d)
        .groupBy(col("c_nationkey"),
                 floor(col("c_acctbal") / 2500).as("bal_band"),
                 col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val cls = cs.groupBy("c_nationkey", "bal_band")
        .agg(count(lit(1)).as("l"), sum(col("n")).as("sz"))
      cls.groupBy("l")
        .agg(count(lit(1)).as("n_classes"), sum(col("sz")).as("n_rows"),
             min(col("sz")).as("min_class_size"), max(col("sz")).as("max_class_size"))
        .orderBy("l")
    },

    // Differential-privacy sensitivity profile: the clipping bounds that
    // contribution-bounded DP aggregation needs. Per (user, day), events
    // contributed and exact cents of value; per user, the WORST day (the
    // L∞ contribution a per-day count/sum query sees) and the lifetime
    // total (the L1 bound). The release gate reads the smallest bound
    // covering q% of users — "clip here and q% are untouched" — as exact
    // order statistics in the el_winsorize discipline: the three metrics
    // unpivot to long form, collapse to a VALUE HISTOGRAM (tiny next to
    // the user population), and one cumulative window PARTITIONED BY
    // METRIC finds each true k-th smallest — no global window, no
    // interpolating percentile, no second scan. Output is 4 all-integer
    // rows.
    "pr_dp_sensitivity" -> Q(
      """WITH ud AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n_ev,
        |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |u AS (
        |  SELECT user_id, MAX(n_ev) AS de, MAX(cents) AS dc,
        |         CAST(SUM(n_ev) AS BIGINT) AS te
        |  FROM ud GROUP BY user_id),
        |longf AS (
        |  SELECT 'daily_events' AS metric, de AS v FROM u
        |  UNION ALL SELECT 'daily_cents', dc FROM u
        |  UNION ALL SELECT 'total_events', te FROM u),
        |cnt AS (SELECT metric, v, CAST(COUNT(*) AS BIGINT) AS cn
        |        FROM longf GROUP BY metric, v),
        |tot AS (SELECT metric, CAST(SUM(cn) AS BIGINT) AS n_users
        |        FROM cnt GROUP BY metric),
        |cum AS (
        |  SELECT metric, v,
        |         CAST(SUM(cn) OVER (PARTITION BY metric ORDER BY v
        |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM cnt),
        |qs AS (SELECT unnest([50, 95, 99, 100]) AS q),
        |th AS (
        |  SELECT qs.q, c.metric, t.n_users,
        |         MIN(CASE WHEN c.cum >= (t.n_users * qs.q + 99) // 100
        |                  THEN c.v END) AS clip
        |  FROM cum c JOIN tot t ON c.metric = t.metric CROSS JOIN qs
        |  GROUP BY qs.q, c.metric, t.n_users)
        |SELECT q,
        |       MAX(CASE WHEN metric = 'daily_events' THEN clip END) AS clip_daily_events,
        |       MAX(CASE WHEN metric = 'daily_cents' THEN clip END) AS clip_daily_cents,
        |       MAX(CASE WHEN metric = 'total_events' THEN clip END) AS clip_total_events,
        |       MAX(n_users) AS n_users
        |FROM th GROUP BY q ORDER BY q""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ud = Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_ev"),
             sum(graft.functions.Portable.cents(col("value"))).as("cents"))
      val u = ud.groupBy("user_id")
        .agg(max(col("n_ev")).as("de"), max(col("cents")).as("dc"),
             sum(col("n_ev")).as("te"))
      val longf = u.select(expr(
        "stack(3, 'daily_events', de, 'daily_cents', dc, 'total_events', te) AS (metric, v)"))
      val cnt = longf.groupBy("metric", "v").agg(count(lit(1)).as("cn"))
      val tot = cnt.groupBy("metric").agg(sum(col("cn")).as("n_users"))
      val cum = cnt.withColumn("cum",
        sum(col("cn")).over(Window.partitionBy("metric").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val qs = s.range(0, 1).select(explode(array(lit(50), lit(95), lit(99), lit(100))).as("q"))
      val th = cum.join(tot, "metric").crossJoin(broadcast(qs))
        .groupBy("q", "metric", "n_users")
        .agg(min(when(col("cum") >= expr("(n_users * q + 99) div 100"),
                      col("v"))).as("clip"))
      th.groupBy("q")
        .agg(max(when(col("metric") === "daily_events", col("clip"))).as("clip_daily_events"),
             max(when(col("metric") === "daily_cents", col("clip"))).as("clip_daily_cents"),
             max(when(col("metric") === "total_events", col("clip"))).as("clip_total_events"),
             max(col("n_users")).as("n_users"))
        .orderBy("q")
    },

    // LOCAL differential privacy: K-ary RANDOMIZED RESPONSE (Warner'65 /
    // the RAPPOR core) over event_type, the mechanism an untrusted
    // collector uses — each ROW reports its true type with p=7/10, else a
    // type drawn uniformly from the K-type domain, so no individual report
    // is trustworthy but the debiased histogram converges. The noise is
    // md5-derived (deterministic in both engines: report/flip draws from
    // independent salted hashes), the estimator
    //   est_t = (10·K·obs_t − 3·n) / (7·K)
    // is exact integer products with ONE final correctly-rounded double
    // division (portable), and the query emits true_n next to est so it
    // MEASURES the mechanism's error like ta_bloom_contamination measures
    // the Bloom FP rate. Scale shape: the type domain (K rows) broadcasts;
    // reports are a flat per-row projection; both counts are map-side
    // combined. The bounded K-row window is the one allowed single-
    // partition shape.
    "pr_rr_counts" -> Q(
      s"""WITH types AS (
         |  SELECT event_type AS t,
         |         ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS idx
         |  FROM (SELECT DISTINCT event_type FROM events)),
         |kd AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk FROM types),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
         |rep AS (
         |  SELECT CASE WHEN ${duckH("'rr|' || CAST(event_id AS VARCHAR)", 15)} % 10 < 7
         |              THEN e.event_type ELSE f.t END AS rt
         |  FROM events e CROSS JOIN kd
         |  JOIN types f
         |    ON f.idx = ${duckH("'rf|' || CAST(event_id AS VARCHAR)", 15)} % kd.kk),
         |obs AS (SELECT rt, CAST(COUNT(*) AS BIGINT) AS obs_n FROM rep GROUP BY rt),
         |tru AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_n
         |        FROM events GROUP BY event_type)
         |SELECT tru.event_type, tru.true_n, obs.obs_n,
         |       CAST(10 * kd.kk * obs.obs_n - 3 * nd.n AS DOUBLE)
         |         / CAST(7 * kd.kk AS DOUBLE) AS est_n
         |FROM tru JOIN obs ON obs.rt = tru.event_type
         |CROSS JOIN kd CROSS JOIN nd
         |ORDER BY tru.event_type""".stripMargin) { (s, d) =>
      import graft.functions.Portable.h60
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      val types = ev.select(col("event_type").as("t")).distinct()
        .withColumn("idx",
          (row_number().over(Window.orderBy("t")) - 1).cast("long"))
      val kd = types.agg(count(lit(1)).as("kk"))
      val nd = ev.agg(count(lit(1)).as("n"))
      val rep = ev.select(col("event_id"), col("event_type"))
        .crossJoin(broadcast(kd))
        .join(broadcast(types),
          col("idx") === h60(concat(lit("rf|"), col("event_id"))) % col("kk"))
        .select(when(h60(concat(lit("rr|"), col("event_id"))) % 10 < 7,
          col("event_type")).otherwise(col("t")).as("rt"))
      val obs = rep.groupBy("rt").agg(count(lit(1)).as("obs_n"))
      val tru = ev.groupBy("event_type").agg(count(lit(1)).as("true_n"))
      tru.join(obs, col("rt") === col("event_type"))
        .crossJoin(broadcast(kd)).crossJoin(broadcast(nd))
        .select(col("event_type"), col("true_n"), col("obs_n"),
          ((lit(10L) * col("kk") * col("obs_n") - lit(3L) * col("n")).cast("double")
            / (lit(7L) * col("kk")).cast("double")).as("est_n"))
        .orderBy("event_type")
    }
  )
}
