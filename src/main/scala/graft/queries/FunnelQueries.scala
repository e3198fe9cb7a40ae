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

    // Inter-event gap distribution per user (lag over the per-user
    // time order), bucketed by whole minutes capped at 10+ — the
    // activity-cadence profile. The window is user-partitioned; the
    // bucket rollup is one aggregate.
    "el_gap_histogram" -> Q(
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
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
        .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy(least(expr("gap_us div 60000000"), lit(10L)).cast("int")
          .as("gap_min_bucket"))
        .agg(count(lit(1)).as("n_gaps"),
             min(col("gap_us")).cast("long").as("min_gap_us"),
             max(col("gap_us")).cast("long").as("max_gap_us"))
        .orderBy("gap_min_bucket")
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
    }
  )
}
