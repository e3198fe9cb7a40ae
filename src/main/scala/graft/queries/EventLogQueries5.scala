package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `el_attribution_ushape` — position-based (U-shaped) multi-touch
  * attribution, the third standard model next to el_attribution's
  * first/last/linear: 40% of each conversion's credit to the FIRST
  * touch, 40% to the LAST, 20% split over the middles.
  *
  * Kept hash-exact by crediting in integer ppm with a stated remainder
  * rule: mid = 200000 div (n−2) per middle touch, and the flooring
  * remainder 200000 − (n−2)·mid goes to the FIRST touch — so every
  * conversion's credits sum to EXACTLY 1,000,000 (the invariant the
  * rollup exposes: Σ credit over all types = 10⁶ · conversions).
  * Degenerate paths follow the model's conventions: n=1 → 10⁶ to the
  * only touch; n=2 → 500,000 each (first and last halves of the U);
  * n=0 → 10⁶ on 'none' so untouched conversions stay visible.
  *
  * Scale shape: same lineage as el_attribution — the 7-day touch
  * window is a user-keyed equi-join with a range predicate, positions
  * come from per-conversion windows (bounded by a user's week of
  * touches), and the rollup map-side-combines to the type domain.
  */
object EventLogQueries5 {

  private val WeekUs = 604800000000L

  def defs: Map[String, Q] = Map(

    "el_attribution_ushape" -> Q(
      s"""WITH conv AS (
         |  SELECT event_id AS conv_id, user_id, epoch_ns(ts)//1000 AS cts
         |  FROM events WHERE event_type = 'purchase'),
         |t AS (
         |  SELECT user_id, event_id AS tid, event_type AS ttype,
         |         epoch_ns(ts)//1000 AS tts
         |  FROM events WHERE event_type IN ('click','view','signup')),
         |j AS (
         |  SELECT c.conv_id, t.ttype, t.tts, t.tid
         |  FROM conv c LEFT JOIN t
         |    ON c.user_id = t.user_id AND t.tts <= c.cts
         |   AND t.tts > c.cts - $WeekUs),
         |r AS (
         |  SELECT conv_id, coalesce(ttype, 'none') AS touch_type,
         |         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY tts DESC, tid DESC) AS rn_last,
         |         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY tts ASC,  tid ASC)  AS rn_first,
         |         CAST(COUNT(ttype) OVER (PARTITION BY conv_id) AS BIGINT) AS n
         |  FROM j),
         |cr AS (
         |  SELECT touch_type,
         |         CASE WHEN n <= 1 THEN 1000000
         |              WHEN n = 2 THEN 500000
         |              WHEN rn_first = 1
         |                THEN 400000 + (200000 - (n-2) * (200000 // (n-2)))
         |              WHEN rn_last = 1 THEN 400000
         |              ELSE 200000 // (n-2) END AS credit
         |  FROM r)
         |SELECT touch_type,
         |       CAST(SUM(credit) AS BIGINT) AS credit_ppm,
         |       CAST(COUNT(*) AS INTEGER) AS n_touches
         |FROM cr GROUP BY touch_type ORDER BY touch_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("conv_id"), col("user_id").as("cu"),
                unix_micros(col("ts")).as("cts"))
      val touch = ev.filter(col("event_type").isin("click", "view", "signup"))
        .select(col("user_id").as("tu"), col("event_id").as("tid"),
                col("event_type").as("ttype"), unix_micros(col("ts")).as("tts"))
      val wLast  = Window.partitionBy("conv_id").orderBy(col("tts").desc, col("tid").desc)
      val wFirst = Window.partitionBy("conv_id").orderBy(col("tts").asc,  col("tid").asc)
      val wN     = Window.partitionBy("conv_id")
      conv.join(touch,
          col("cu") === col("tu") && col("tts") <= col("cts") &&
          col("tts") > col("cts") - lit(WeekUs), "left")
        .select(col("conv_id"), coalesce(col("ttype"), lit("none")).as("touch_type"),
                col("tts"), col("tid"), col("ttype"))
        .withColumn("rn_last",  row_number().over(wLast))
        .withColumn("rn_first", row_number().over(wFirst))
        .withColumn("n", count(col("ttype")).over(wN).cast("long"))
        .select(col("touch_type"),
          when(col("n") <= 1, lit(1000000L))
            .when(col("n") === 2, lit(500000L))
            .when(col("rn_first") === 1,
              lit(400000L) + (lit(200000L) -
                (col("n") - 2) * expr("200000L div (n - 2)")))
            .when(col("rn_last") === 1, lit(400000L))
            .otherwise(expr("200000L div (n - 2)")).as("credit"))
        .groupBy("touch_type")
        .agg(sum(col("credit")).cast("long").as("credit_ppm"),
             count(lit(1)).cast("int").as("n_touches"))
        .orderBy("touch_type")
    },

    // Classical additive seasonal decomposition (the moving-average
    // method behind STL's initial pass): trend = 7-day CENTERED moving
    // average over the densified daily series, seasonal index = per
    // WEEKDAY mean of the detrended values. Kept integer-exact: the
    // detrended value is stated as 7·x − Σwindow (= 7·(x − trend), an
    // exact BIGINT), the weekday comes from epoch-day % 7 (no calendar/
    // locale code on either engine), and the index divides once at
    // display. Only FULL 7-day windows contribute (edges drop — the
    // textbook rule), which on the dense grid is exactly days
    // [min+3, max−3]. The running window is an ANNOUNCED bounded global
    // window (≤ calendar days, the el_changepoint_cusum shape); the
    // event-scale work is one map-side-combined daily aggregate.
    "el_seasonal_decompose" -> Q(
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |dense AS (
        |  SELECT g.day, COALESCE(daily.c, 0) AS n
        |  FROM (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |        FROM b) g
        |  LEFT JOIN daily ON g.day = daily.day),
        |w AS (
        |  SELECT day, n,
        |         SUM(n) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w7,
        |         COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
        |  FROM dense),
        |det AS (
        |  SELECT (day - DATE '1970-01-01') % 7 AS wd, 7 * n - w7 AS dn
        |  FROM w WHERE wn = 7)
        |SELECT CAST(wd AS INTEGER) AS wd_idx, CAST(COUNT(*) AS INTEGER) AS n_days,
        |       CAST(CAST(SUM(dn) AS BIGINT) AS DOUBLE)
        |         / CAST(7 * COUNT(*) AS DOUBLE) AS seasonal
        |FROM det GROUP BY wd ORDER BY wd""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
      val dense = daily
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(expr("sequence(d0, d1)")).as("day"))
        .join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("c"), lit(0L)).as("n"))
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      dense
        .withColumn("w7", sum(col("n")).over(w7))
        .withColumn("wn", count(lit(1)).over(w7))
        .filter(col("wn") === 7)
        .select((datediff(col("day"), lit("1970-01-01").cast("date")) % 7).as("wd"),
                (lit(7L) * col("n") - col("w7")).as("dn"))
        .groupBy("wd")
        .agg(count(lit(1)).as("cnt"), sum(col("dn")).as("s_num"))
        .select(col("wd").cast("int").as("wd_idx"),
                col("cnt").cast("int").as("n_days"),
                (col("s_num").cast("double") /
                  (lit(7L) * col("cnt")).cast("double")).as("seasonal"))
        .orderBy("wd_idx")
    },

    // Robust daily anomaly detection via MAD (median absolute deviation
    // — Hampel's rule), the ROBUST twin of el_anomaly_zscore: a mean/σ
    // detector is itself dragged by the outliers it hunts (one huge day
    // inflates σ and masks the rest); the median/MAD pair has a 50%
    // breakdown point. Flag: |x − median| > 3·MAD, stated WITHOUT the
    // 1.4826 normal-consistency factor so every quantity stays an exact
    // BIGINT (the multiplier choice is the documented semantics). Both
    // medians are lower medians (k = (D+1) div 2) read off value
    // HISTOGRAMS with cumulative counts from a histogram self-join —
    // |distinct values|² ≤ calendar-days², no global sort, no global
    // window anywhere. One event-scale pass (the daily aggregate);
    // everything after is calendar-bounded.
    "el_anomaly_mad" -> Q(
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS dy, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |k AS (SELECT CAST((COUNT(*) + 1) // 2 AS BIGINT) AS k FROM d),
        |h AS (SELECT n AS v, COUNT(*) AS c FROM d GROUP BY 1),
        |cum AS (SELECT a.v AS v, SUM(b.c) AS cc FROM h a JOIN h b ON b.v <= a.v GROUP BY a.v),
        |med AS (SELECT MIN(v) AS m FROM cum, k WHERE cc >= k.k),
        |dev AS (SELECT d.dy, d.n, abs(d.n - med.m) AS dv FROM d, med),
        |h2 AS (SELECT dv, COUNT(*) AS c FROM dev GROUP BY 1),
        |cum2 AS (SELECT a.dv AS dv, SUM(b.c) AS cc FROM h2 a JOIN h2 b ON b.dv <= a.dv GROUP BY a.dv),
        |mad AS (SELECT MIN(dv) AS md FROM cum2, k WHERE cc >= k.k)
        |SELECT dev.dy AS day, dev.n AS n_events, dev.dv AS deviation,
        |       med.m AS med, mad.md AS mad
        |FROM dev, med, mad WHERE dev.dv > 3 * mad.md
        |ORDER BY day""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("dy")).agg(count(lit(1)).as("n"))
      val k = daily.agg(expr("CAST((COUNT(*) + 1) div 2 AS BIGINT)").as("k"))
      def lowerMedian(vals: org.apache.spark.sql.DataFrame,
                      vCol: String): org.apache.spark.sql.DataFrame = {
        val h = vals.groupBy(col(vCol).as("v")).agg(count(lit(1)).as("c"))
        val hb = h.select(col("v").as("bv"), col("c").as("bc"))
        h.join(hb, col("bv") <= col("v"))
          .groupBy("v").agg(sum(col("bc")).as("cc"))
          .crossJoin(broadcast(k))
          .agg(min(when(col("cc") >= col("k"), col("v"))).as("m"))
      }
      val med = lowerMedian(daily, "n")
      val dev = daily.crossJoin(broadcast(med))
        .select(col("dy"), col("n"), abs(col("n") - col("m")).as("dv"), col("m"))
      val mad = lowerMedian(dev.select(col("dv")), "dv")
        .select(col("m").as("md"))
      dev.crossJoin(broadcast(mad))
        .filter(col("dv") > lit(3L) * col("md"))
        .select(col("dy").as("day"), col("n").as("n_events"),
                col("dv").as("deviation"), col("m").as("med"), col("md").as("mad"))
        .orderBy("day")
    },

    // OHLC downsampling — the candlestick/bar aggregation every
    // time-series store ships (open = first value in the bar, close =
    // last, high/low = extremes): per (event_type, 5-minute bucket).
    // open/close are SELECTED values, not float aggregates, so the bar
    // is exactly portable (comparisons + picks only — no float sums);
    // first/last are pinned deterministic by the (ts, event_id) total
    // order. Two row_numbers over the SAME bucket-bounded window (one
    // sort, both directions derived), then one map-side-combinable
    // conditional aggregate.
    "el_ohlc_bars" -> Q(
      """WITH e AS (
        |  SELECT event_type, (epoch_ns(ts) // 1000000000 // 300) * 300 AS bucket_sec,
        |         epoch_ns(ts) // 1000 AS tus, event_id, value
        |  FROM events),
        |r AS (
        |  SELECT *,
        |         ROW_NUMBER() OVER (PARTITION BY event_type, bucket_sec
        |                            ORDER BY tus, event_id) AS rf,
        |         ROW_NUMBER() OVER (PARTITION BY event_type, bucket_sec
        |                            ORDER BY tus DESC, event_id DESC) AS rl
        |  FROM e)
        |SELECT event_type, bucket_sec,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       MAX(CASE WHEN rf = 1 THEN value END) AS open_v,
        |       MAX(value) AS high_v, MIN(value) AS low_v,
        |       MAX(CASE WHEN rl = 1 THEN value END) AS close_v
        |FROM r GROUP BY event_type, bucket_sec
        |ORDER BY event_type, bucket_sec""".stripMargin) { (s, d) =>
      val wf = Window.partitionBy(col("event_type"), col("bucket_sec"))
        .orderBy(col("tus"), col("event_id"))
      val wl = Window.partitionBy(col("event_type"), col("bucket_sec"))
        .orderBy(col("tus").desc, col("event_id").desc)
      Tables.events(s, d)
        .select(col("event_type"),
                (expr("unix_seconds(ts) div 300") * 300).as("bucket_sec"),
                unix_micros(col("ts")).as("tus"), col("event_id"), col("value"))
        .withColumn("rf", row_number().over(wf))
        .withColumn("rl", row_number().over(wl))
        .groupBy("event_type", "bucket_sec")
        .agg(count(lit(1)).as("n_events"),
             max(when(col("rf") === 1, col("value"))).as("open_v"),
             max(col("value")).as("high_v"), min(col("value")).as("low_v"),
             max(when(col("rl") === 1, col("value"))).as("close_v"))
        .orderBy("event_type", "bucket_sec")
    },

    // Multi-window SLO BURN RATE (the Google SRE-workbook alerting rule):
    // per hour, the error-event share in the 1-hour bucket AND in the
    // trailing 6-hour window, each divided by the corpus-wide baseline
    // error share; alert when BOTH exceed 2× (the fast window catches
    // the spike, the slow window suppresses blips). Plan shape: hourly
    // integer counts once (map-side combined), the trailing window via
    // the bounded 6-row fan-out (the el_hll_sliding move — hours fan
    // out, events never), the baseline a 1-row broadcast; all floats
    // are single divisions of exact integers.
    "el_burn_rate" -> Q(
      """WITH h AS (
        |  SELECT (epoch_ns(ts) // 1000000000 // 3600) * 3600 AS hr,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS e
        |  FROM events GROUP BY 1),
        |g AS (SELECT CAST(SUM(n) AS BIGINT) AS ng, CAST(SUM(e) AS BIGINT) AS eg FROM h),
        |f AS (SELECT hr + 3600 * t.i AS whr, n, e FROM h, range(0, 6) t(i)),
        |w AS (SELECT whr, CAST(SUM(n) AS BIGINT) AS n_6h,
        |             CAST(SUM(e) AS BIGINT) AS err_6h
        |      FROM f GROUP BY whr),
        |j AS (SELECT h.hr, h.n AS n_1h, h.e AS err_1h, w.n_6h, w.err_6h
        |      FROM h JOIN w ON h.hr = w.whr)
        |SELECT j.hr, j.n_1h, j.err_1h, j.n_6h, j.err_6h,
        |       (CAST(j.err_1h AS DOUBLE) / j.n_1h)
        |         / (CAST(g.eg AS DOUBLE) / g.ng) AS burn_1h,
        |       (CAST(j.err_6h AS DOUBLE) / j.n_6h)
        |         / (CAST(g.eg AS DOUBLE) / g.ng) AS burn_6h,
        |       CAST(CASE WHEN (CAST(j.err_1h AS DOUBLE) / j.n_1h)
        |                        / (CAST(g.eg AS DOUBLE) / g.ng) > 2
        |                   AND (CAST(j.err_6h AS DOUBLE) / j.n_6h)
        |                        / (CAST(g.eg AS DOUBLE) / g.ng) > 2
        |                 THEN 1 ELSE 0 END AS BIGINT) AS alert
        |FROM j, g ORDER BY hr""".stripMargin) { (s, d) =>
      val h = Tables.events(s, d)
        .groupBy((expr("unix_seconds(ts) div 3600") * 3600).as("hr"))
        .agg(count(lit(1)).as("n"),
             sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"))
      val g = h.agg(sum(col("n")).as("ng"), sum(col("e")).as("eg"))
      val w = h.select(col("hr"), col("n"), col("e"),
                       explode(expr("sequence(0, 5)")).as("i"))
        .groupBy((col("hr") + col("i") * 3600L).as("whr"))
        .agg(sum(col("n")).as("n_6h"), sum(col("e")).as("err_6h"))
      val base = col("eg").cast("double") / col("ng")
      val b1 = (col("err_1h").cast("double") / col("n_1h")) / base
      val b6 = (col("err_6h").cast("double") / col("n_6h")) / base
      h.select(col("hr"), col("n").as("n_1h"), col("e").as("err_1h"))
        .join(w, col("hr") === col("whr")).drop("whr")
        .crossJoin(broadcast(g))
        .select(col("hr"), col("n_1h"), col("err_1h"), col("n_6h"), col("err_6h"),
                b1.as("burn_1h"), b6.as("burn_6h"),
                when(b1 > 2 && b6 > 2, 1L).otherwise(0L).as("alert"))
        .orderBy("hr")
    },

    // Day-over-day TOP MOVERS — the anomaly leaderboard every metrics
    // dashboard ships: per (event_type, day), the count delta vs the
    // previous CALENDAR day in signed basis points, keeping the 15
    // biggest absolute moves (ties broken fully). Integer division only;
    // the day grid is dense per type via the calendar fan-out trick, so
    // "previous day" means the calendar day even when a type was silent
    // (a silent day reads as 0 and the reappearance is a mover) — a
    // LAG over observed rows would silently skip gaps. Shape: one daily
    // count aggregate (map-side combined), the dense grid a
    // types × days broadcast-built dim, TakeOrdered(15).
    "el_top_movers" -> Q(
      """WITH dc AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dc),
        |types AS (SELECT DISTINCT event_type FROM dc),
        |grid AS (
        |  SELECT t.event_type, s.d0 + u.i AS day
        |  FROM types t, span s, unnest(range(0, CAST(s.d1 - s.d0 + 1 AS INTEGER))) u(i)),
        |dense AS (
        |  SELECT g.event_type, g.day, COALESCE(dc.n, 0) AS n
        |  FROM grid g LEFT JOIN dc ON g.event_type = dc.event_type AND g.day = dc.day),
        |mv AS (
        |  SELECT a.event_type, a.day, a.n, b.n AS prev_n,
        |         a.n - b.n AS delta,
        |         (a.n - b.n) * 10000 // GREATEST(b.n, 1) AS move_bp
        |  FROM dense a JOIN dense b
        |    ON a.event_type = b.event_type AND a.day = b.day + 1)
        |SELECT event_type, day, n, prev_n, delta, move_bp
        |FROM mv
        |ORDER BY abs(delta) DESC, event_type, day LIMIT 15""".stripMargin) { (s, d) =>
      val dc = Tables.events(s, d)
        .groupBy(col("event_type"),
                 expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
      val span = dc.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val types = dc.select("event_type").distinct()
      val grid = types.crossJoin(broadcast(span))
        .select(col("event_type"),
                explode(expr("sequence(d0, d1)")).as("day"))
      val dense = grid.join(dc, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
                coalesce(col("n"), lit(0L)).as("n"))
      val prev = dense.select(col("event_type"), (col("day") + 1).as("day"),
                              col("n").as("prev_n"))
      dense.join(prev, Seq("event_type", "day"))
        .select(col("event_type"), col("day"), col("n"), col("prev_n"),
                (col("n") - col("prev_n")).as("delta"),
                expr("(n - prev_n) * 10000 div GREATEST(prev_n, 1)").as("move_bp"))
        .orderBy(abs(col("delta")).desc, col("event_type"), col("day"))
        .limit(15)
    })
}
