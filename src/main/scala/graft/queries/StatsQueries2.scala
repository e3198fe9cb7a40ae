package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second statistics batch over `events` — the three monitoring reads a
  * production event log grows next, each all-integer so the DuckDB twins
  * are hash-exact:
  *
  *  - `el_changepoint_cusum`: CUSUM change-point scan on the daily count
  *    series (Page 1954) — where did traffic shift?
  *  - `el_acf`: autocorrelation ladder (lags 1..7) on the same series —
  *    is there weekly periodicity worth modelling?
  *  - `el_assoc_rules`: event-type association rules (support /
  *    confidence / lift, Agrawal et al. 1993) over per-user behavior.
  *
  * Reference note: the cascade broker persists the raw stream
  * (/root/reference/src/broker/main.rs:53) and leaves monitoring to
  * consumers; this is that consumer surface as one-pass Spark aggregates.
  *
  * Integer discipline: every deviation is the EXACT integer
  * `n_t * D - T` (count scaled by day-count minus total), so ratios,
  * running sums and lag products never touch IEEE math. Overflow bound:
  * |dev| ≤ T, so the ACF products are ≤ T² per day and ≤ T²·D summed —
  * at T = 10⁹ events/day-series that is 10¹⁸·D, past BIGINT; at that
  * scale the series would be bucketed per shard (or deviations kept in
  * per-mille of the daily mean) before correlating. The declared shape
  * is exact through sf1000 (T ≈ 10⁹ total).
  */
object StatsQueries2 {

  private val US_PER_DAY = 86400000000L

  /** Daily-count grid with integer deviations: day_idx, n, dev where
    * dev = n·D − T. One map-side-combined pass over the log; everything
    * downstream is calendar-scale (≤ days rows). */
  private def dailyDev(s: org.apache.spark.sql.SparkSession, d: String) = {
    val g = Tables.events(s, d)
      .select(expr(s"unix_micros(ts) div $US_PER_DAY").as("day_idx"))
      .groupBy("day_idx").agg(count(lit(1)).as("n"))
    val stats = g.agg(count(lit(1)).as("d_days"), sum(col("n")).as("total"))
    g.crossJoin(broadcast(stats))
      .select(col("day_idx"), col("n"),
              (col("n") * col("d_days") - col("total")).as("dev"))
  }

  private val duckDailyDev =
    """g AS (
      |  SELECT epoch_ns(ts)//1000//86400000000 AS day_idx,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |s AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS d_days,
      |         CAST(SUM(n) AS BIGINT) AS total FROM g),
      |dd AS (
      |  SELECT day_idx, n, n * d_days - total AS dev FROM g, s)""".stripMargin

  def defs: Map[String, Q] = Map(

    // CUSUM change-point scan. Scale shape: the log collapses to the
    // daily grid FIRST (map-side combined — the only event-scale pass);
    // the running sum is a global window over the ≤ calendar-days grid,
    // announced in PlanAssertionsSpec's bounded-input allowlist. The
    // peak day (argmax |cusum|) is the estimated change point; because
    // Σ dev = Σ n·D − D·T = 0 exactly, the walk always returns to 0 on
    // the last day — an invariant AuditSpec pins.
    "el_changepoint_cusum" -> Q(
      s"""WITH $duckDailyDev,
        |c AS (
        |  SELECT day_idx, n, dev,
        |         SUM(dev) OVER (ORDER BY day_idx
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS cusum
        |  FROM dd),
        |m AS (SELECT MAX(ABS(cusum)) AS peak FROM c)
        |SELECT day_idx, n, CAST(dev AS BIGINT) AS dev,
        |       CAST(cusum AS BIGINT) AS cusum,
        |       CAST(CASE WHEN ABS(cusum) = peak THEN 1 ELSE 0 END AS INTEGER)
        |         AS is_peak
        |FROM c CROSS JOIN m ORDER BY day_idx""".stripMargin) { (s, d) =>
      val c = dailyDev(s, d)
        .withColumn("cusum",
          sum(col("dev")).over(Window.orderBy("day_idx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val m = c.agg(max(abs(col("cusum"))).as("peak"))
      c.crossJoin(broadcast(m))
        .select(col("day_idx"), col("n"), col("dev"), col("cusum"),
                when(abs(col("cusum")) === col("peak"), 1).otherwise(0)
                  .cast("int").as("is_peak"))
        .orderBy("day_idx")
    },

    // Autocorrelation ladder, lags 1..7 (one week). The lag pairing is
    // an EQUI-join on day_idx + lag after exploding the 7-row lag dim
    // over the grid — never a range join, never event-scale. The
    // denominator Σ dev² is lag-independent (one broadcast scalar);
    // acf_bp = num·10⁴ div den is exact integer (Spark `div` and DuckDB
    // `//` both truncate toward zero, including for negative numerators).
    "el_acf" -> Q(
      s"""WITH $duckDailyDev,
        |den AS (SELECT CAST(SUM(dev * dev) AS BIGINT) AS den FROM dd),
        |l AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) AS t(lag_d)),
        |p AS (
        |  SELECT l.lag_d AS lag_d, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |         CAST(SUM(a.dev * b.dev) AS BIGINT) AS num
        |  FROM l JOIN dd a ON TRUE
        |         JOIN dd b ON b.day_idx = a.day_idx + l.lag_d
        |  GROUP BY 1)
        |SELECT p.lag_d, p.n_pairs, p.num, den.den,
        |       CAST((p.num * 10000) // den.den AS BIGINT) AS acf_bp
        |FROM p CROSS JOIN den ORDER BY p.lag_d""".stripMargin) { (s, d) =>
      val dd  = dailyDev(s, d)
      val den = dd.agg(sum(col("dev") * col("dev")).as("den"))
      val a = dd.withColumn("lag_d", explode(array((1 to 7).map(lit): _*)))
        .select(col("lag_d"), (col("day_idx") + col("lag_d")).as("join_day"),
                col("dev").as("dev_a"))
      val b = dd.select(col("day_idx").as("join_day"), col("dev").as("dev_b"))
      a.join(b, "join_day")
        .groupBy("lag_d")
        .agg(count(lit(1)).as("n_pairs"),
             sum(col("dev_a") * col("dev_b")).as("num"))
        .crossJoin(broadcast(den))
        .select(col("lag_d"), col("n_pairs"), col("num"), col("den"),
                expr("(num * 10000) div den").as("acf_bp"))
        .orderBy("lag_d")
    },

    // Association rules over per-user event-type sets. Scale shape: the
    // log collapses to DISTINCT (user, type) first (map-side combined,
    // |users|·|types| rows); the pair join is a co-partitioned self
    // equi-join on user_id whose output is bounded by |users|·|types|²
    // with |types| a small fixed vocabulary — dimension-scale, never
    // event-scale. confidence_bp = P(rhs|lhs) and lift_bp =
    // P(lhs,rhs)/(P(lhs)P(rhs)) in basis points, all-integer.
    "el_assoc_rules" -> Q(
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
        |       FROM ut GROUP BY 1),
        |u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
        |pc AS (
        |  SELECT a.event_type AS lhs, b.event_type AS rhs,
        |         CAST(COUNT(*) AS BIGINT) AS n_both
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.event_type <> b.event_type
        |  GROUP BY 1, 2)
        |SELECT pc.lhs, pc.rhs, pc.n_both, ta.n_t AS n_lhs, tb.n_t AS n_rhs,
        |       u.n_users,
        |       CAST((pc.n_both * 10000) // ta.n_t AS BIGINT) AS confidence_bp,
        |       CAST((pc.n_both * u.n_users * 10000) // (ta.n_t * tb.n_t) AS BIGINT)
        |         AS lift_bp
        |FROM pc
        |JOIN tc ta ON ta.event_type = pc.lhs
        |JOIN tc tb ON tb.event_type = pc.rhs CROSS JOIN u
        |ORDER BY lhs, rhs""".stripMargin) { (s, d) =>
      val ut = Tables.events(s, d).select("user_id", "event_type").distinct()
      val tc = ut.groupBy("event_type").agg(count(lit(1)).as("n_t"))
      val u  = ut.agg(countDistinct(col("user_id")).as("n_users"))
      val pc = ut.select(col("user_id"), col("event_type").as("lhs"))
        .join(ut.select(col("user_id"), col("event_type").as("rhs")), "user_id")
        .filter(col("lhs") =!= col("rhs"))
        .groupBy("lhs", "rhs").agg(count(lit(1)).as("n_both"))
      pc.join(broadcast(tc.select(col("event_type").as("lhs"),
                                  col("n_t").as("n_lhs"))), "lhs")
        .join(broadcast(tc.select(col("event_type").as("rhs"),
                                  col("n_t").as("n_rhs"))), "rhs")
        .crossJoin(broadcast(u))
        .select(col("lhs"), col("rhs"), col("n_both"), col("n_lhs"),
                col("n_rhs"), col("n_users"),
                expr("(n_both * 10000) div n_lhs").as("confidence_bp"),
                expr("(n_both * n_users * 10000) div (n_lhs * n_rhs)")
                  .as("lift_bp"))
        .orderBy("lhs", "rhs")
    },

    // Behavioral path mining: top-20 event-type trigrams along each
    // user's time-ordered stream — the order-3 extension of
    // el_markov_transitions' bigram matrix. Scale shape: the sequence
    // windows are per-user (ordered by (ts, event_id) — the el_sessionize
    // tie-break, so replayed timestamps cannot flip the output); the
    // trigram space is |types|³ — a fixed vocabulary cube — and the
    // top-20 is TakeOrdered with full-column tie-break, never a global
    // sort of the log.
    "el_path_trigrams" -> Q(
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ns(ts)//1000 AS tus, event_id
        |  FROM events),
        |s AS (
        |  SELECT event_type AS t1,
        |         LEAD(event_type, 1) OVER w AS t2,
        |         LEAD(event_type, 2) OVER w AS t3
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |c AS (
        |  SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM s WHERE t3 IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT t1, t2, t3, n FROM c
        |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
                expr("unix_micros(ts)").as("tus"), col("event_id"))
        .select(col("event_type").as("t1"),
                lead(col("event_type"), 1).over(w).as("t2"),
                lead(col("event_type"), 2).over(w).as("t3"))
        .filter(col("t3").isNotNull)
        .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
        .limit(20)
    }
  )
}
