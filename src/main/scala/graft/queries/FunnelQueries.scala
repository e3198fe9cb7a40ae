package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the log: funnel conversion (ordered
  * first-occurrence steps) and inter-event gap distribution — the two
  * classic consumer-analytics queries a Kafka-style event log exists to
  * answer.
  */
object FunnelQueries {

  def defs: Map[String, Q] = Map(

    // Strict-order funnel signup → view → purchase on FIRST occurrences:
    // a user converts a step only if their first view came after their
    // first signup, and their first purchase after that view. One
    // conditional-min aggregate per user (map-side combined), then a
    // single scalar rollup — no joins, no windows.
    "el_funnel" -> Q(
      """WITH per_user AS (
        |  SELECT user_id,
        |         MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END) AS t_signup,
        |         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
        |         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT COUNT(*) AS n_users,
        |       CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |       CAST(SUM(CASE WHEN t_view > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_view,
        |       CAST(SUM(CASE WHEN t_view > t_signup AND t_purchase > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
        |FROM per_user""".stripMargin) { (s, d) =>
      val pu = Tables.events(s, d)
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
             min(when(col("event_type") === "view", col("ts"))).as("t_view"),
             min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      pu.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t_signup").isNotNull, 1).otherwise(0)).cast("long").as("n_signup"),
        sum(when(col("t_view") > col("t_signup"), 1).otherwise(0)).cast("long")
          .as("n_signup_view"),
        sum(when(col("t_view") > col("t_signup") && col("t_purchase") > col("t_view"), 1)
          .otherwise(0)).cast("long").as("n_full_funnel"))
    },

    // A/B experiment lift report — the experiment-analysis workload an
    // event log feeds: users hash-assign to control/treatment (salted
    // 60-bit hash, the ta_shuffle_shards recipe — deterministic, no
    // assignment table to join), exposure is the first 'view', and a
    // conversion counts only when the first 'purchase' follows that
    // exposure (the same first-occurrence temporal gating as
    // el_funnel). Per variant: exposed users, converters, conversion
    // ppm, exposed-purchase revenue in integer cents, and cents per
    // exposed user. All integers, so the two rows hash-match the
    // oracle exactly; a z-statistic is deliberately left to the
    // consumer (sqrt breaks integer portability; the ppm rates and
    // counts are sufficient statistics). Scale shape: one conditional
    // per-user aggregate (map-side combined) + a 2-group rollup.
    "el_ab_lift" -> Q(
      s"""WITH pu AS (
         |  SELECT user_id,
         |         ${graft.functions.Portable.duckH("'exp1|' || CAST(user_id AS VARCHAR)", 15)} % 2
         |           AS variant,
         |         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
         |         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase,
         |         CAST(SUM(CASE WHEN event_type = 'purchase'
         |                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
         |           AS purchase_cents
         |  FROM events GROUP BY 1, 2)
         |SELECT CASE WHEN variant = 0 THEN 'control' ELSE 'treatment' END AS variant,
         |       CAST(COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS BIGINT) AS n_exposed,
         |       CAST(SUM(CASE WHEN t_purchase > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
         |       (CAST(SUM(CASE WHEN t_purchase > t_view THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |         // COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS conv_ppm,
         |       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN purchase_cents ELSE 0 END) AS BIGINT)
         |         AS revenue_cents,
         |       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN purchase_cents ELSE 0 END) AS BIGINT)
         |         // COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS cents_per_exposed
         |FROM pu GROUP BY variant ORDER BY variant""".stripMargin) { (s, d) =>
      import graft.functions.Portable.{cents, h60}
      val pu = Tables.events(s, d)
        .withColumn("variant",
          pmod(h60(concat(lit("exp1|"), col("user_id").cast("string"))), lit(2L)))
        .groupBy("user_id", "variant")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"),
             min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"),
             sum(when(col("event_type") === "purchase", cents(col("value")))
               .otherwise(0L)).as("purchase_cents"))
      pu.groupBy(when(col("variant") === 0, "control").otherwise("treatment").as("variant"))
        .agg(count(when(col("t_view").isNotNull, 1)).as("n_exposed"),
             sum(when(col("t_purchase") > col("t_view"), 1L).otherwise(0L)).as("n_converted"),
             sum(when(col("t_view").isNotNull, col("purchase_cents")).otherwise(0L))
               .as("revenue_cents"))
        .select(col("variant"), col("n_exposed"), col("n_converted"),
          expr("(n_converted * 1000000) div n_exposed").as("conv_ppm"),
          col("revenue_cents"),
          expr("revenue_cents div n_exposed").as("cents_per_exposed"))
        .orderBy("variant")
    },

    // Inter-event gap distribution per user (lag over the per-user
    // time order), bucketed by whole minutes capped at 10+ — the
    // activity-cadence profile. The window is user-partitioned; the
    // bucket rollup is one aggregate. This NAIVE form is the right
    // plan for the declared corpus (user_id is near-uniform there);
    // see el_gap_histogram_skewsafe for the same semantics under a
    // hot-key population.
    "el_gap_histogram" -> Q(gapOracleSql) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
        .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .transform(gapRollup)
    },

    // The SAME gap histogram, skew-proof — the round-9 SkewAudit
    // finding made declarable: a per-user window funnels a hot user (a
    // bot at 50% of the corpus) through ONE task, and neither AQE
    // (windows aren't joins) nor salting (breaks window semantics)
    // applies — measured 1.6 s base → 15.2 s hot at sf10. A LAG-1
    // window admits an exact split: gaps are consecutive diffs of each
    // user's sorted timestamp multiset, so computing them within
    // (user, 6h-bucket) partitions and stitching bucket boundaries via
    // a per-user window over BUCKET SUMMARIES (≤ time-range/6h rows
    // per user, REGARDLESS of event count) yields the identical
    // multiset — hot arm 15.2 → 2.8 s, at a ~2.5× robustness constant
    // on unskewed data (both arms in SCALING.md round 9). Identical
    // oracle; GapRewriteSpec pins two-level ≡ naive on the corpus and
    // on a hot-key fixture with ties and empty buckets.
    "el_gap_histogram_skewsafe" -> Q(gapOracleSql) { (s, d) =>
      FunnelQueries.gapsTwoLevel(Tables.events(s, d)).transform(gapRollup)
    },

    // Cohort retention: users grouped by FIRST-SEEN day, distinct-user
    // activity counted at each day offset — the classic retention
    // triangle. Two shuffles (first-seen agg, cohort-cell agg) plus one
    // equi-join on user_id; day boundaries are UTC in both engines, and
    // the offset is exact integer date arithmetic.
    "el_cohort_retention" -> Q(
      """WITH f AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |firstd AS (SELECT user_id, MIN(day) AS cohort_day FROM f GROUP BY user_id),
        |m AS (
        |  SELECT fd.cohort_day, CAST(f.day - fd.cohort_day AS INTEGER) AS offset_days,
        |         f.user_id
        |  FROM f JOIN firstd fd ON f.user_id = fd.user_id)
        |SELECT cohort_day, offset_days,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM m GROUP BY cohort_day, offset_days
        |ORDER BY cohort_day, offset_days""".stripMargin) { (s, d) =>
      val f = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val firstd = f.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      f.join(firstd, "user_id")
        .select(col("cohort_day"),
                datediff(col("day"), col("cohort_day")).as("offset_days"),
                col("user_id"))
        .groupBy("cohort_day", "offset_days")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_day", "offset_days")
    },

    // Daily distinct users via the PORTABLE HLL sketch (the grouped form
    // of q29's estimator — functions/PortableHll): at 100 TB this is the
    // query where exact distinct stops being affordable, and the sketch
    // shuffles ≤ 64 longs per day instead of the user-id set. Exact
    // distinct is emitted alongside so the error is visible per window;
    // the whole thing stays hash-checked because the sketch is
    // deterministic in both engines.
    "el_hll_daily" -> Q(
      s"""WITH ev AS (
         |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id FROM events),
         |${graft.functions.PortableHll.duckSketchCtes(
             Seq("day"), "CAST(user_id AS VARCHAR)", "ev")}
         |SELECT day, hll_estimate, reg_sum, zero_regs, exact_distinct
         |FROM sk ORDER BY day""".stripMargin) { (s, d) =>
      graft.functions.PortableHll.distinctSketch(
          Tables.events(s, d).select(to_date(col("ts")).as("day"), col("user_id")),
          Seq("day"), col("user_id"))
        .orderBy("day")
    },

    // SCD Type-2 interval build: collapse each user's event stream into
    // versioned validity intervals — a new version opens whenever the
    // event_type CHANGES (lag-detected), valid_to is the next version's
    // valid_from (NULL = current, the open interval), exactly the
    // slowly-changing-dimension shape a warehouse merge maintains. All
    // windows partition by user (bounded); run-numbering is one
    // running sum over the change flags; timestamps are integer epoch
    // micros so the intervals are engine-exact. Ties at the same
    // microsecond order by event_id — deterministic in both twins.
    "el_scd2_intervals" -> Q(
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
        |x AS (
        |  SELECT *, CASE WHEN LAG(event_type) OVER
        |                   (PARTITION BY user_id ORDER BY us, event_id) IS NULL
        |                 OR LAG(event_type) OVER
        |                   (PARTITION BY user_id ORDER BY us, event_id) <> event_type
        |            THEN 1 ELSE 0 END AS chg
        |  FROM e),
        |r AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS version
        |  FROM x),
        |g AS (
        |  SELECT user_id, version, MIN(event_type) AS event_type,
        |         MIN(us) AS valid_from, COUNT(*) AS n_events
        |  FROM r GROUP BY user_id, version)
        |SELECT user_id, CAST(version AS INTEGER) AS version, event_type,
        |       CAST(valid_from AS BIGINT) AS valid_from,
        |       CAST(LEAD(valid_from) OVER
        |              (PARTITION BY user_id ORDER BY version) AS BIGINT) AS valid_to,
        |       CAST(n_events AS BIGINT) AS n_events,
        |       CAST(CASE WHEN LEAD(valid_from) OVER
        |                   (PARTITION BY user_id ORDER BY version) IS NULL
        |                 THEN 1 ELSE 0 END AS INTEGER) AS is_current
        |FROM g ORDER BY user_id, version""".stripMargin) { (s, d) =>
      val wSeq = Window.partitionBy("user_id").orderBy("us", "event_id")
      val wVer = Window.partitionBy("user_id").orderBy("version")
      val lagT = lag(col("event_type"), 1).over(wSeq)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
                expr("unix_micros(ts)").as("us"))
        .withColumn("chg", when(lagT.isNull || lagT =!= col("event_type"), 1)
                             .otherwise(0))
        .withColumn("version", sum(col("chg")).over(
          wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "version")
        .agg(min(col("event_type")).as("event_type"),
             min(col("us")).as("valid_from"), count(lit(1)).as("n_events"))
        .select(col("user_id"), col("version").cast("int").as("version"),
                col("event_type"), col("valid_from"),
                lead(col("valid_from"), 1).over(wVer).as("valid_to"),
                col("n_events"),
                when(lead(col("valid_from"), 1).over(wVer).isNull, 1)
                  .otherwise(0).as("is_current"))
        .orderBy("user_id", "version")
    },

    // Complex-event-processing pattern match — the MATCH_RECOGNIZE /
    // Flink-CEP workload neither Spark SQL nor the reference offers as
    // an operator: detect ORDERED event-type patterns inside each
    // user's stream. Each user's history collapses to a compact symbol
    // string (one char per event, the five types have distinct
    // initials, ordered by time with the event-id tie-break), and
    // patterns are plain regexes counted non-overlapping —
    // leftmost-earliest semantics agree between Spark's regexp_count
    // and the oracle's regexp_extract_all for these literal/class-only
    // patterns. Declared patterns: the browse-to-buy conversion
    // (view, clicks, purchase), the error-immediately-before-purchase
    // resilience signal, and signup-to-first-purchase. Scale shape:
    // the symbol string is per-user BOUNDED (the sessionize argument —
    // a user's history is human-scale at any corpus size), collect_list
    // combines map-side, the pattern set is a literal unpivot, and the
    // output is one row per pattern. A 100 TB deployment points the
    // same expressions at a session- or day-windowed sequence instead
    // of the full history if user streams are unbounded.
    "el_cep_pattern" -> Q(
      """WITH seq AS (
        |  SELECT user_id,
        |         string_agg(substring(event_type, 1, 1), ''
        |                    ORDER BY epoch_ns(ts)//1000, event_id) AS s
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT user_id, 'browse_to_buy' AS pattern,
        |         CAST(len(regexp_extract_all(s, 'vc*p')) AS BIGINT) AS n
        |  FROM seq
        |  UNION ALL
        |  SELECT user_id, 'error_then_buy',
        |         CAST(len(regexp_extract_all(s, 'ep')) AS BIGINT) FROM seq
        |  UNION ALL
        |  SELECT user_id, 'signup_to_first_buy',
        |         CAST(len(regexp_extract_all(s, 's[^p]*p')) AS BIGINT) FROM seq)
        |SELECT pattern,
        |       CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_users_matched,
        |       CAST(SUM(n) AS BIGINT) AS n_matches,
        |       CAST(MAX(n) AS BIGINT) AS max_user_matches
        |FROM m GROUP BY pattern ORDER BY pattern""".stripMargin) { (s, d) =>
      val seq = Tables.events(s, d)
        .select(col("user_id"),
                struct(unix_micros(col("ts")).as("us"), col("event_id"),
                       substring(col("event_type"), 1, 1).as("c")).as("e"))
        .groupBy("user_id")
        .agg(array_join(transform(sort_array(collect_list(col("e"))),
                                  x => x.getField("c")), "").as("s"))
      val m = seq.select(col("user_id"), expr(
        """stack(3,
          |  'browse_to_buy',       regexp_count(s, 'vc*p'),
          |  'error_then_buy',      regexp_count(s, 'ep'),
          |  'signup_to_first_buy', regexp_count(s, 's[^p]*p')
          |) AS (pattern, n)""".stripMargin))
      m.groupBy("pattern")
        .agg(sum(when(col("n") > 0, 1L).otherwise(0L)).as("n_users_matched"),
             sum(col("n")).as("n_matches"),
             max(col("n")).cast("long").as("max_user_matches"))
        .orderBy("pattern")
    },

    // Time-to-convert histogram: among users whose first purchase
    // follows their first view, the view→purchase latency bucketed on
    // the standard analytics ladder (<1m, 1-5m, 5-15m, 15-60m, 1-4h,
    // 4h+, keyed by the bucket's lower bound in minutes). Scale shape:
    // one conditional-min pass collapses the log to per-user first-view
    // timestamps; the purchase side re-enters via a user-keyed equi-join
    // against that aggregated dim (events join a USER-scale frame, not
    // the log); the histogram is one map-side-combined rollup.
    // All-integer microsecond arithmetic.
    "el_funnel_latency" -> Q(
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
        |fv AS (
        |  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN us END) AS tv
        |  FROM e GROUP BY user_id),
        |conv AS (
        |  SELECT e.user_id, MIN(e.us) - fv.tv AS lat_us
        |  FROM e JOIN fv ON e.user_id = fv.user_id
        |  WHERE e.event_type = 'purchase' AND fv.tv IS NOT NULL AND e.us > fv.tv
        |  GROUP BY e.user_id, fv.tv),
        |b AS (
        |  SELECT user_id, lat_us, lat_us // 60000000 AS lm FROM conv)
        |SELECT CAST(CASE WHEN lm < 1 THEN 0 WHEN lm < 5 THEN 1 WHEN lm < 15 THEN 5
        |                 WHEN lm < 60 THEN 15 WHEN lm < 240 THEN 60
        |                 ELSE 240 END AS BIGINT) AS bucket_lo_min,
        |       CAST(COUNT(*) AS BIGINT) AS n_users,
        |       CAST(MIN(lat_us) AS BIGINT) AS min_lat_us,
        |       CAST(MAX(lat_us) AS BIGINT) AS max_lat_us
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      val fv = e.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("us"))).as("tv"))
        .filter(col("tv").isNotNull)
      val conv = e.filter(col("event_type") === "purchase")
        .join(fv, "user_id")
        .filter(col("us") > col("tv"))
        .groupBy("user_id", "tv").agg((min(col("us")) - col("tv")).as("lat_us"))
        .select(col("user_id"), col("lat_us"),
                expr("lat_us div 60000000").as("lm"))
      conv.groupBy(
          when(col("lm") < 1, 0L).when(col("lm") < 5, 1L).when(col("lm") < 15, 5L)
            .when(col("lm") < 60, 15L).when(col("lm") < 240, 60L).otherwise(240L)
            .as("bucket_lo_min"))
        .agg(count(lit(1)).as("n_users"),
             min(col("lat_us")).as("min_lat_us"),
             max(col("lat_us")).as("max_lat_us"))
        .orderBy("bucket_lo_min")
    },

    // SCD2 read-as-of: reconstruct every user's state at a fixed
    // mid-corpus instant (first event + 15 days) from the same
    // change-interval table el_scd2_intervals builds — the time-travel
    // read that turns a change log into a snapshot. Scale shape: the
    // interval derivation is the el_scd2_intervals plan (per-user
    // windows on the log); the as-of cut is a broadcast-scalar filter
    // (valid_from ≤ T < valid_to, open current rows included) — one row
    // per user survives, no second pass over the log.
    "el_asof_snapshot" -> Q(
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
        |t0 AS (SELECT MIN(us) + 1296000000000 AS tcut FROM e),
        |x AS (
        |  SELECT *, CASE WHEN LAG(event_type) OVER
        |                   (PARTITION BY user_id ORDER BY us, event_id) IS NULL
        |                 OR LAG(event_type) OVER
        |                   (PARTITION BY user_id ORDER BY us, event_id) <> event_type
        |            THEN 1 ELSE 0 END AS chg
        |  FROM e),
        |r AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS version
        |  FROM x),
        |g AS (
        |  SELECT user_id, version, MIN(event_type) AS event_type,
        |         MIN(us) AS valid_from, COUNT(*) AS n_events
        |  FROM r GROUP BY user_id, version),
        |iv AS (
        |  SELECT user_id, version, event_type, valid_from,
        |         LEAD(valid_from) OVER
        |           (PARTITION BY user_id ORDER BY version) AS valid_to
        |  FROM g)
        |SELECT iv.user_id, CAST(iv.version AS INTEGER) AS version, iv.event_type,
        |       CAST(iv.valid_from AS BIGINT) AS valid_from,
        |       CAST(t0.tcut - iv.valid_from AS BIGINT) AS held_us
        |FROM iv, t0
        |WHERE iv.valid_from <= t0.tcut
        |  AND (iv.valid_to IS NULL OR iv.valid_to > t0.tcut)
        |ORDER BY iv.user_id""".stripMargin) { (s, d) =>
      val wSeq = Window.partitionBy("user_id").orderBy("us", "event_id")
      val wVer = Window.partitionBy("user_id").orderBy("version")
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
                expr("unix_micros(ts)").as("us"))
      val t0 = e.agg((min(col("us")) + 1296000000000L).as("tcut"))
      val lagT = lag(col("event_type"), 1).over(wSeq)
      val iv = e
        .withColumn("chg", when(lagT.isNull || lagT =!= col("event_type"), 1)
                             .otherwise(0))
        .withColumn("version", sum(col("chg")).over(
          wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "version")
        .agg(min(col("event_type")).as("event_type"),
             min(col("us")).as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(wVer))
      iv.crossJoin(broadcast(t0))
        .filter(col("valid_from") <= col("tcut") &&
                (col("valid_to").isNull || col("valid_to") > col("tcut")))
        .select(col("user_id"), col("version").cast("int").as("version"),
                col("event_type"), col("valid_from"),
                (col("tcut") - col("valid_from")).as("held_us"))
        .orderBy("user_id")
    }
  )

  /** Shared oracle for both gap-histogram forms (identical semantics,
    * different physical plan — the skewsafe form must hash-match this
    * exact SQL too). */
  private val gapOracleSql: String =
    """WITH g AS (
      |  SELECT user_id,
      |         epoch_ns(ts)//1000
      |           - LAG(epoch_ns(ts)//1000) OVER (
      |               PARTITION BY user_id
      |               ORDER BY epoch_ns(ts)//1000, event_id) AS gap_us
      |  FROM events)
      |SELECT CAST(LEAST(gap_us // 60000000, 10) AS INTEGER) AS gap_min_bucket,
      |       COUNT(*) AS n_gaps,
      |       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
      |       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The minute-bucket rollup both gap forms share. */
  private def gapRollup(gaps: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    gaps
      .groupBy(least(expr("gap_us div 60000000"), lit(10L)).cast("int")
        .as("gap_min_bucket"))
      .agg(count(lit(1)).as("n_gaps"),
           min(col("gap_us")).cast("long").as("min_gap_us"),
           max(col("gap_us")).cast("long").as("max_gap_us"))
      .orderBy("gap_min_bucket")

  /** Skew-proof per-user inter-event gaps (the round-9 two-level LAG
    * rewrite — see el_gap_histogram's comment). Returns one `gap_us`
    * row per consecutive event pair of each user; the multiset is
    * exactly the naive `tus − LAG(tus) OVER (PARTITION BY user)` one.
    *
    *   - within: LAG inside (user, 6h-bucket) windows — a hot user is
    *     spread over #buckets tasks instead of one;
    *   - boundary: per-(user, bucket) min/max tus summaries (map-side
    *     combined), then LAG over the per-user BUCKET timeline, whose
    *     size is bounded by time-range/6h at any event count.
    */
  def gapsTwoLevel(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val bucketUs = 21600000000L // 6 h
    val ev = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("b", expr(s"tus div ${bucketUs}L"))
    // Two branches off the scan (column pruning specializes each
    // branch's exchange, so they cannot share one — measured: forcing
    // a shared window pipeline costs MORE than the second scan):
    //   within  — the (user, bucket) LAG window, full rows;
    //   boundary — per-(user, bucket) min/max tus, MAP-SIDE combined
    //              (the shuffle is bucket-summary-sized), then the
    //              per-user window over the bucket timeline.
    // Robustness constant on an unskewed corpus: ~1.5–2.5× the naive
    // single window (one extra scan + the summary agg) — the price of
    // never funneling a hot user through one task; SCALING.md round 9
    // has the measured arms.
    val wIn = Window.partitionBy("user_id", "b").orderBy("tus", "event_id")
    val within = ev
      .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(wIn))
      .filter(col("gap_us").isNotNull)
      .select("gap_us")
    val wB = Window.partitionBy("user_id").orderBy("b")
    val boundary = ev.groupBy("user_id", "b")
      .agg(min("tus").as("first_tus"), max("tus").as("last_tus"))
      .withColumn("gap_us", col("first_tus") - lag(col("last_tus"), 1).over(wB))
      .filter(col("gap_us").isNotNull)
      .select("gap_us")
    within.unionAll(boundary)
  }
}
