package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Third statistics batch — the PLANNING reads an analytics stack grows
  * once the monitoring surface (StatsQueries2) is in place:
  *
  *  - `el_power_analysis`: two-proportion sample-size planning from the
  *    observed A/B rates — "how many exposed users per arm would the
  *    next experiment need to detect this delta at 80% power?".
  *  - `el_trend_ols`: exact ordinary-least-squares trend of the daily
  *    count series per event type (num/den kept as exact integers, the
  *    rational slope reported in scaled milli-events/day).
  *  - `q76_hoover_index`: Hoover / Robin-Hood inequality index of
  *    customer spend per market segment — "what share of revenue would
  *    have to move to equalize customers?".
  *  - `q77_chi2_independence`: chi-square style contingency audit of
  *    order priority × status, on SCALED SHARES so the arithmetic stays
  *    in BIGINT at any corpus size.
  *
  * Reference note: the cascade broker persists the raw stream
  * (/root/reference/src/broker/main.rs:53) and pushes analysis to
  * consumers; these are downstream planning consumers, re-expressed as
  * one-pass Spark aggregates.
  *
  * Integer discipline (the el_acf recipe): every statistic is a defined
  * integer computation evaluated identically by Spark (`div`, truncating
  * toward zero) and DuckDB (`//`), so the oracle hash-matches exactly.
  * Overflow bounds are documented per query; all four are BIGINT-safe
  * through sf1000 because fact-scale magnitudes are converted to
  * bounded shares (ppm / bp) BEFORE any product.
  */
object StatsQueries3 {

  private val US_PER_DAY = 86400000000L

  /** (z_{0.975} + z_{0.80})² = (1.959964 + 0.841621)² = 7.8489, carried
    * as the integer 78489 (×10⁴) so both engines use the same literal. */
  private val Z_SUM_SQ_E4 = 78489L

  def defs: Map[String, Q] = Map(

    // Two-proportion sample-size planning on the el_ab_lift experiment:
    // n/arm = (z_a+z_b)²·(p0(1−p0)+p1(1−p1))/(p0−p1)², evaluated in ppm
    // (p·(10⁶−p) ≤ 2.5·10¹¹; ×78489 ≈ 2·10¹⁶ — BIGINT-safe) with
    // ceiling division. Scale shape: ONE conditional per-user aggregate
    // over the log (map-side combined, the el_ab_lift pass), a 2-row
    // variant rollup, then a 1-row pivot — nothing downstream of the
    // first aggregate is fact-scale. `powered` says whether the CURRENT
    // exposure already meets the requirement; delta=0 degenerates to
    // NULL rather than a division blow-up.
    "el_power_analysis" -> Q(
      s"""WITH pu AS (
         |  SELECT user_id,
         |         ${graft.functions.Portable.duckH("'exp1|' || CAST(user_id AS VARCHAR)", 15)} % 2
         |           AS variant,
         |         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
         |         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
         |  FROM events GROUP BY 1, 2),
         |v AS (
         |  SELECT variant,
         |         CAST(COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS BIGINT) AS n_exposed,
         |         CAST(SUM(CASE WHEN t_purchase > t_view THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
         |  FROM pu GROUP BY variant),
         |p AS (
         |  SELECT
         |    MAX(CASE WHEN variant = 0 THEN (n_converted * 1000000) // n_exposed END) AS p0_ppm,
         |    MAX(CASE WHEN variant = 1 THEN (n_converted * 1000000) // n_exposed END) AS p1_ppm,
         |    MIN(n_exposed) AS n_exposed_min
         |  FROM v),
         |c AS (
         |  SELECT p0_ppm, p1_ppm, n_exposed_min,
         |         ABS(p1_ppm - p0_ppm) AS delta_ppm,
         |         p0_ppm * (1000000 - p0_ppm) + p1_ppm * (1000000 - p1_ppm) AS var_sum
         |  FROM p),
         |n AS (
         |  -- the ceiling is computed ONCE; powered references it
         |  SELECT c.*, CASE WHEN delta_ppm = 0 THEN NULL
         |              ELSE ($Z_SUM_SQ_E4 * var_sum + 10000 * delta_ppm * delta_ppm - 1)
         |                   // (10000 * delta_ppm * delta_ppm) END AS n_per_arm
         |  FROM c)
         |SELECT CAST(p0_ppm AS BIGINT) AS p0_ppm, CAST(p1_ppm AS BIGINT) AS p1_ppm,
         |       CAST(delta_ppm AS BIGINT) AS delta_ppm,
         |       CAST(var_sum AS BIGINT) AS var_sum,
         |       CAST(n_per_arm AS BIGINT) AS n_per_arm,
         |       CAST(n_exposed_min AS BIGINT) AS n_exposed_min,
         |       CAST(CASE WHEN n_per_arm IS NULL THEN 0
         |                 WHEN n_exposed_min >= n_per_arm THEN 1 ELSE 0 END AS INTEGER)
         |         AS powered
         |FROM n""".stripMargin) { (s, d) =>
      import graft.functions.Portable.h60
      val pu = Tables.events(s, d)
        .withColumn("variant",
          pmod(h60(concat(lit("exp1|"), col("user_id").cast("string"))), lit(2L)))
        .groupBy("user_id", "variant")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"),
             min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      val v = pu.groupBy("variant")
        .agg(count(when(col("t_view").isNotNull, 1)).as("n_exposed"),
             sum(when(col("t_purchase") > col("t_view"), 1L).otherwise(0L)).as("n_converted"))
      v.agg(
          max(when(col("variant") === 0, expr("(n_converted * 1000000) div n_exposed"))).as("p0_ppm"),
          max(when(col("variant") === 1, expr("(n_converted * 1000000) div n_exposed"))).as("p1_ppm"),
          min(col("n_exposed")).as("n_exposed_min"))
        .select(col("p0_ppm"), col("p1_ppm"),
                abs(col("p1_ppm") - col("p0_ppm")).as("delta_ppm"),
                (col("p0_ppm") * (lit(1000000L) - col("p0_ppm")) +
                 col("p1_ppm") * (lit(1000000L) - col("p1_ppm"))).as("var_sum"),
                col("n_exposed_min"))
        .withColumn("n_per_arm",
          when(col("delta_ppm") === 0, lit(null).cast("long"))
            .otherwise(expr(s"($Z_SUM_SQ_E4 * var_sum + 10000 * delta_ppm * delta_ppm - 1)" +
                            " div (10000 * delta_ppm * delta_ppm)")))
        .select(col("p0_ppm"), col("p1_ppm"), col("delta_ppm"), col("var_sum"),
          col("n_per_arm"), col("n_exposed_min"),
          when(col("n_per_arm").isNull, 0)
            .otherwise(when(col("n_exposed_min") >= col("n_per_arm"), 1).otherwise(0))
            .cast("int").as("powered"))
    },

    // Exact OLS trend per event type on the daily count grid: slope =
    // (D·Σxy − Σx·Σy) / (D·Σx² − (Σx)²) with x = day_idx rebased to the
    // GLOBAL series start (a shift never changes the slope, and one
    // broadcast scalar beats a per-type min join). num/den are emitted
    // as exact integers; slope_milli uses the split form
    // (num div den)·1000 + ((num mod den)·1000) div den — identical to
    // trunc(num·1000/den) under truncate-toward-zero (q·1000 is exact,
    // |rem| < den) but never forms num·1000, so it stays in BIGINT even
    // when num itself is near the 10¹⁸ bound (the naive ×1000 would
    // wrap in Spark and error in DuckDB). Scale shape: the log
    // collapses to the (type × day) grid FIRST (the only fact-scale
    // pass, map-side combined); the OLS sums run on ≤ types·days rows.
    // Overflow: x ≤ D, so D·Σxy ≤ D³·y_max ≈ 10¹⁰·y_max — BIGINT-safe
    // through y_max ≈ 10⁸/day (sf1000); rem·1000 ≤ den·1000 ≤ 10¹⁶.
    "el_trend_ols" -> Q(
      s"""WITH g AS (
         |  SELECT event_type, epoch_ns(ts)//1000//$US_PER_DAY AS day_idx,
         |         CAST(COUNT(*) AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |m AS (SELECT MIN(day_idx) AS day0 FROM g),
         |x AS (SELECT event_type, day_idx - day0 AS x, y FROM g, m),
         |a AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d_days,
         |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |         CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*x) AS BIGINT) AS sxx
         |  FROM x GROUP BY 1),
         |b AS (
         |  SELECT event_type, d_days, sy,
         |         CAST(d_days * sxy - sx * sy AS BIGINT) AS num,
         |         CAST(d_days * sxx - sx * sx AS BIGINT) AS den
         |  FROM a)
         |SELECT event_type, d_days, sy AS total, num, den,
         |       CAST(CASE WHEN den = 0 THEN NULL
         |                 ELSE (num // den) * 1000 + ((num % den) * 1000) // den
         |            END AS BIGINT) AS slope_milli
         |FROM b ORDER BY event_type""".stripMargin) { (s, d) =>
      val g = Tables.events(s, d)
        .select(col("event_type"), expr(s"unix_micros(ts) div $US_PER_DAY").as("day_idx"))
        .groupBy("event_type", "day_idx").agg(count(lit(1)).as("y"))
      val m = g.agg(min(col("day_idx")).as("day0"))
      val a = g.crossJoin(broadcast(m))
        .select(col("event_type"), (col("day_idx") - col("day0")).as("x"), col("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("d_days"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
             sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      a.select(col("event_type"), col("d_days"), col("sy").as("total"),
               (col("d_days") * col("sxy") - col("sx") * col("sy")).as("num"),
               (col("d_days") * col("sxx") - col("sx") * col("sx")).as("den"))
        .select(col("event_type"), col("d_days"), col("total"), col("num"), col("den"),
                when(col("den") === 0, lit(null).cast("long"))
                  .otherwise(expr("(num div den) * 1000 + ((num % den) * 1000) div den"))
                  .as("slope_milli"))
        .orderBy("event_type")
    },

    // Hoover (Robin-Hood) index of customer lifetime spend per market
    // segment: the share of total revenue that would have to be
    // redistributed for every customer to hold an equal share —
    // Σ|s_i·N − 10⁶| · 10⁴ div (2·10⁶·N) with s_i the customer's spend
    // share in ppm. Customers with no orders count as zero spend (the
    // honest inequality read). Scale shape: one fact-scale agg (orders
    // → per-customer cents), a broadcast 5-row segment-totals dim, then
    // one more map-side-combined abs-dev agg. Converting spend to ppm
    // shares BEFORE the ·N product keeps every term ≤ 2·10⁶·N —
    // BIGINT-safe at any SF (the raw x·N−T form would overflow at sf100).
    "q76_hoover_index" -> Q(
      """WITH spend AS (
        |  SELECT o_custkey, CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cts
        |  FROM orders GROUP BY 1),
        |cust AS (
        |  SELECT c.c_mktsegment, c.c_custkey, COALESCE(s.cts, 0) AS cts
        |  FROM customer c LEFT JOIN spend s ON s.o_custkey = c.c_custkey),
        |seg AS (
        |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |         CAST(SUM(cts) AS BIGINT) AS total_cents
        |  FROM cust GROUP BY 1),
        |dev AS (
        |  SELECT c.c_mktsegment, g.n_cust, g.total_cents,
        |         ABS(((c.cts * 1000000) // g.total_cents) * g.n_cust - 1000000) AS adev
        |  FROM cust c JOIN seg g ON g.c_mktsegment = c.c_mktsegment)
        |SELECT c_mktsegment, n_cust, total_cents,
        |       CAST(SUM(adev) AS BIGINT) AS sum_absdev,
        |       CAST((SUM(adev) * 10000) // (2 * 1000000 * n_cust) AS BIGINT) AS hoover_bp
        |FROM dev GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin) { (s, d) =>
      import graft.functions.Portable.cents
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(sum(cents(col("o_totalprice"))).as("cts"))
      val cust = Tables.customer(s, d)
        .join(spend, col("o_custkey") === col("c_custkey"), "left")
        .select(col("c_mktsegment"), col("c_custkey"),
                coalesce(col("cts"), lit(0L)).as("cts"))
      val seg = cust.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"), sum(col("cts")).as("total_cents"))
      cust.join(broadcast(seg), "c_mktsegment")
        .select(col("c_mktsegment"), col("n_cust"), col("total_cents"),
                abs(expr("((cts * 1000000) div total_cents) * n_cust - 1000000")).as("adev"))
        .groupBy("c_mktsegment", "n_cust", "total_cents")
        .agg(sum(col("adev")).as("sum_absdev"),
             expr("(sum(adev) * 10000) div (2 * 1000000 * n_cust)").as("hoover_bp"))
        .orderBy("c_mktsegment")
    },

    // Distribution drift between the two halves of the log — the
    // monitoring read an ML feature pipeline alarms on (the integer
    // sibling of PSI: per-type share deltas in bp; total variation =
    // Σ|dev|/2, left to the consumer as the exact sum of a column).
    // The split point is the global time midpoint (one broadcast
    // scalar); each half's type shares are exact bp. Scale shape: ONE
    // fact-scale pass (type × half counts, map-side combined), then
    // type-dim-sized rollups. A type absent from one half reports its
    // full share as drift — the appear/disappear case is the alarm
    // that matters most.
    "el_drift_tv" -> Q(
      """WITH b AS (
        |  SELECT MIN(epoch_ns(ts)//1000) AS mn, MAX(epoch_ns(ts)//1000) AS mx
        |  FROM events),
        |h AS (
        |  SELECT event_type,
        |         CASE WHEN epoch_ns(ts)//1000 < (b.mn + b.mx) // 2 THEN 0 ELSE 1 END AS half
        |  FROM events, b),
        |c AS (
        |  SELECT event_type, half, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM h GROUP BY 1, 2),
        |t AS (SELECT half, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1),
        |g AS (
        |  SELECT et.event_type, hh.half
        |  FROM (SELECT DISTINCT event_type FROM c) et
        |       CROSS JOIN (SELECT DISTINCT half FROM c) hh),
        |s AS (
        |  SELECT g.event_type, g.half, COALESCE(c.n, 0) AS n,
        |         (COALESCE(c.n, 0) * 10000) // t.total AS share_bp
        |  FROM g LEFT JOIN c ON c.event_type = g.event_type AND c.half = g.half
        |         JOIN t ON t.half = g.half)
        |SELECT a.event_type,
        |       CAST(a.n AS BIGINT) AS n_a, CAST(bb.n AS BIGINT) AS n_b,
        |       CAST(a.share_bp AS BIGINT) AS p_a_bp,
        |       CAST(bb.share_bp AS BIGINT) AS p_b_bp,
        |       CAST(a.share_bp - bb.share_bp AS BIGINT) AS dev_bp
        |FROM s a JOIN s bb ON bb.event_type = a.event_type
        |WHERE a.half = 0 AND bb.half = 1
        |ORDER BY a.event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_type"), unix_micros(col("ts")).as("tus"))
      val b = ev.agg(min(col("tus")).as("mn"), max(col("tus")).as("mx"))
      val c = ev.crossJoin(broadcast(b))
        .select(col("event_type"),
                when(col("tus") < expr("(mn + mx) div 2"), 0).otherwise(1).as("half"))
        .groupBy("event_type", "half").agg(count(lit(1)).as("n"))
      val t = c.groupBy("half").agg(sum(col("n")).as("total"))
      val g = c.select("event_type").distinct()
        .crossJoin(c.select("half").distinct())
      val sh = g.join(c, Seq("event_type", "half"), "left")
        .join(broadcast(t), "half")
        .select(col("event_type"), col("half"),
                coalesce(col("n"), lit(0L)).as("n"),
                expr("(coalesce(n, 0) * 10000) div total").as("share_bp"))
      val a  = sh.filter(col("half") === 0)
        .select(col("event_type"), col("n").as("n_a"), col("share_bp").as("p_a_bp"))
      val bb = sh.filter(col("half") === 1)
        .select(col("event_type"), col("n").as("n_b"), col("share_bp").as("p_b_bp"))
      a.join(bb, "event_type")
        .select(col("event_type"), col("n_a"), col("n_b"), col("p_a_bp"), col("p_b_bp"),
                (col("p_a_bp") - col("p_b_bp")).as("dev_bp"))
        .orderBy("event_type")
    },

    // Freshness / coverage audit per event type — the staleness read an
    // on-call rotation watches: last event age against the log's own
    // high-water mark, active-day coverage of the calendar span, mean
    // daily volume in milli-events. One fact-scale pass (per-type max
    // + distinct-day count, map-side combined) + a broadcast 1-row
    // global bound. All integers (µs / bp / milli), exact at any SF.
    "el_freshness" -> Q(
      s"""WITH b AS (
         |  SELECT MAX(epoch_ns(ts)//1000) AS mx,
         |         MIN(epoch_ns(ts)//1000)//$US_PER_DAY AS d0,
         |         MAX(epoch_ns(ts)//1000)//$US_PER_DAY AS d1
         |  FROM events),
         |p AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(MAX(epoch_ns(ts)//1000) AS BIGINT) AS last_tus,
         |         CAST(COUNT(DISTINCT epoch_ns(ts)//1000//$US_PER_DAY) AS BIGINT)
         |           AS days_active
         |  FROM events GROUP BY 1)
         |SELECT p.event_type, p.n, p.last_tus,
         |       CAST(b.mx - p.last_tus AS BIGINT) AS staleness_us,
         |       p.days_active,
         |       CAST(b.d1 - b.d0 + 1 AS BIGINT) AS span_days,
         |       CAST((p.days_active * 10000) // (b.d1 - b.d0 + 1) AS BIGINT) AS coverage_bp,
         |       CAST((p.n * 1000) // (b.d1 - b.d0 + 1) AS BIGINT) AS mean_daily_milli
         |FROM p CROSS JOIN b ORDER BY p.event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("tus"),
                expr(s"unix_micros(ts) div $US_PER_DAY").as("day"))
      val b = ev.agg(max(col("tus")).as("mx"), min(col("day")).as("d0"),
                     max(col("day")).as("d1"))
      val p = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), max(col("tus")).as("last_tus"),
             countDistinct(col("day")).as("days_active"))
      p.crossJoin(broadcast(b))
        .select(col("event_type"), col("n"), col("last_tus"),
                (col("mx") - col("last_tus")).as("staleness_us"),
                col("days_active"),
                (col("d1") - col("d0") + 1).as("span_days"),
                expr("(days_active * 10000) div (d1 - d0 + 1)").as("coverage_bp"),
                expr("(n * 1000) div (d1 - d0 + 1)").as("mean_daily_milli"))
        .orderBy("event_type")
    },

    // Chi-square-style independence audit of the order priority × status
    // contingency table, on SCALED SHARES so no product ever exceeds
    // BIGINT: per cell, obs_bp2 = O·10⁸ div N (observed share in bp²,
    // ≤ 10⁸), exp_bp2 = r_bp·c_bp (product of margin shares in bp,
    // ≤ 10⁸), dev = obs_bp2 − exp_bp2, and cell_score = dev² div
    // exp_bp2 (N·Σscore/10⁸ recovers the classic χ² when shares are
    // exact). Scale shape: ONE fact-scale pass to the ≤ 5×3 cell grid;
    // margins and N derive from the grid itself (two tiny rollups
    // joined back broadcast) — the fact table is scanned exactly once.
    "q77_chi2_independence" -> Q(
      """WITH cell AS (
        |  SELECT o_orderpriority AS pri, o_orderstatus AS st,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |rm AS (SELECT pri, CAST(SUM(n) AS BIGINT) AS rn FROM cell GROUP BY 1),
        |cm AS (SELECT st, CAST(SUM(n) AS BIGINT) AS cn FROM cell GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cell),
        |sc AS (
        |  SELECT cell.pri, cell.st, cell.n,
        |         (cell.n * 100000000) // t.total AS obs_bp2,
        |         ((rm.rn * 10000) // t.total) * ((cm.cn * 10000) // t.total) AS exp_bp2
        |  FROM cell JOIN rm ON rm.pri = cell.pri
        |            JOIN cm ON cm.st = cell.st CROSS JOIN t)
        |SELECT pri, st, n, CAST(obs_bp2 AS BIGINT) AS obs_bp2,
        |       CAST(exp_bp2 AS BIGINT) AS exp_bp2,
        |       CAST(obs_bp2 - exp_bp2 AS BIGINT) AS dev_bp2,
        |       CAST(CASE WHEN exp_bp2 = 0 THEN NULL
        |                 ELSE ((obs_bp2 - exp_bp2) * (obs_bp2 - exp_bp2)) // exp_bp2
        |            END AS BIGINT) AS cell_score
        |FROM sc ORDER BY pri, st""".stripMargin) { (s, d) =>
      val cell = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("n"))
      val rm = cell.groupBy("pri").agg(sum(col("n")).as("rn"))
      val cm = cell.groupBy("st").agg(sum(col("n")).as("cn"))
      val t  = cell.agg(sum(col("n")).as("total"))
      cell.join(broadcast(rm), "pri").join(broadcast(cm), "st")
        .crossJoin(broadcast(t))
        .select(col("pri"), col("st"), col("n"),
                expr("(n * 100000000) div total").as("obs_bp2"),
                expr("((rn * 10000) div total) * ((cn * 10000) div total)").as("exp_bp2"))
        .select(col("pri"), col("st"), col("n"), col("obs_bp2"), col("exp_bp2"),
                (col("obs_bp2") - col("exp_bp2")).as("dev_bp2"),
                when(col("exp_bp2") === 0, lit(null).cast("long"))
                  .otherwise(expr("((obs_bp2 - exp_bp2) * (obs_bp2 - exp_bp2)) div exp_bp2"))
                  .as("cell_score"))
        .orderBy("pri", "st")
    }
  )
}
