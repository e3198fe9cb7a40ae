package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second batch of event-log analytics over the cascade topic model
  * (reference events: /root/reference/proto/publish.proto:11-15 — the
  * (name, event-time, value) telemetry triple): user segmentation,
  * activity streaks, multi-touch attribution, sliding-window distinct
  * via HLL register merge, histogram-based quantile estimation, and
  * winsorized robust statistics.
  *
  * Every query follows the portable-determinism rules (Portable.scala)
  * and the no-global-sort rule: windows partition by a key (user,
  * conversion id, event type, or value-table key), never a single
  * global ordering.
  */
object EventLogQueries2 {

  /** 7 days in µs — the attribution lookback and the sliding-HLL span. */
  private val WeekUs = 7L * 86400L * 1000000L

  def defs: Map[String, Q] = Map(

    // RFM user segmentation (recency / frequency / monetary), the
    // classic audience-building table. Bins are EQUAL-WIDTH integer
    // bins from two tiny broadcast stat dims — NOT ntile quintiles,
    // which would demand a single global sort (the one window shape
    // banned at 100 TB; PlanAssertionsSpec rejects it). Shape: one
    // map-side-combined per-user aggregate off the scan, two 1-row
    // aggregates over the 10^5-scale user dim, broadcast back, integer
    // bin math, final ≤125-row rollup. All-integer until the output
    // divisions.
    "el_rfm_segments" -> Q(
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts)//86400000000000 AS day, event_type,
        |         CAST(round(value*100) AS BIGINT) AS c
        |  FROM events),
        |u AS (
        |  SELECT user_id, MAX(day) AS last_day, COUNT(*) AS freq,
        |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN c ELSE 0 END) AS BIGINT) AS mon
        |  FROM ev GROUP BY user_id),
        |g1 AS (SELECT MAX(last_day) AS gmax FROM u),
        |u2 AS (SELECT u.*, g1.gmax - u.last_day AS recency FROM u, g1),
        |g2 AS (SELECT MAX(recency) AS maxr, MAX(freq) AS maxf, MAX(mon) AS maxm FROM u2),
        |b AS (
        |  SELECT CAST(least(4, (recency * 5) // (maxr + 1)) AS INTEGER) AS r_bin,
        |         CAST(least(4, (freq    * 5) // (maxf + 1)) AS INTEGER) AS f_bin,
        |         CAST(least(4, (mon     * 5) // (maxm + 1)) AS INTEGER) AS m_bin,
        |         freq, mon
        |  FROM u2, g2)
        |SELECT r_bin, f_bin, m_bin, COUNT(*) AS n_users,
        |       CAST(CAST(SUM(mon) AS BIGINT) AS DOUBLE) / CAST(100 AS DOUBLE) AS monetary_total,
        |       CAST(CAST(SUM(freq) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_freq
        |FROM b GROUP BY r_bin, f_bin, m_bin
        |ORDER BY r_bin, f_bin, m_bin""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"),
                col("event_type"), Portable.cents(col("value")).as("c"))
        .groupBy("user_id")
        .agg(max(col("day")).as("last_day"), count(lit(1)).as("freq"),
             sum(when(col("event_type") === "purchase", col("c")).otherwise(0L)).as("mon"))
      val g1 = u.agg(max(col("last_day")).as("gmax"))
      val u2 = u.crossJoin(broadcast(g1))
        .withColumn("recency", col("gmax") - col("last_day"))
      val g2 = u2.agg(max(col("recency")).as("maxr"), max(col("freq")).as("maxf"),
                      max(col("mon")).as("maxm"))
      u2.crossJoin(broadcast(g2))
        .select(
          least(lit(4L), expr("(recency * 5) div (maxr + 1)")).cast("int").as("r_bin"),
          least(lit(4L), expr("(freq    * 5) div (maxf + 1)")).cast("int").as("f_bin"),
          least(lit(4L), expr("(mon     * 5) div (maxm + 1)")).cast("int").as("m_bin"),
          col("freq"), col("mon"))
        .groupBy("r_bin", "f_bin", "m_bin")
        .agg(count(lit(1)).as("n_users"),
             (sum(col("mon")).cast("double") / lit(100.0)).as("monetary_total"),
             (sum(col("freq")).cast("double") / count(lit(1)).cast("double")).as("avg_freq"))
        .orderBy("r_bin", "f_bin", "m_bin")
    },

    // Consecutive-day activity streaks — the gaps-and-islands pattern:
    // island id = day − row_number over the per-user distinct-day
    // sequence (constant within a run of consecutive days, distinct
    // across runs). Every window is user-partitioned; day arithmetic is
    // all-integer epoch days. Output is one row per user.
    "el_streaks" -> Q(
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts)//86400000000000 AS day FROM events),
        |r AS (
        |  SELECT user_id, day,
        |         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
        |  FROM d),
        |st AS (
        |  SELECT user_id, island, COUNT(*) AS len FROM r GROUP BY user_id, island)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS active_days,
        |       COUNT(*) AS n_streaks, CAST(MAX(len) AS BIGINT) AS longest_streak
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("day")
      Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
        .withColumn("island", col("day") - row_number().over(w))
        .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(sum(col("len")).as("active_days"), count(lit(1)).as("n_streaks"),
             max(col("len")).as("longest_streak"))
        .orderBy("user_id")
    },

    // Multi-touch attribution: each purchase credits the click/view/
    // signup touches of the same user in the prior 7 days, under three
    // models at once — last-touch, first-touch, and linear (1/n per
    // touch). Zero-touch conversions surface as touch_type 'none' with
    // full credit, so every model's credit column sums to the
    // conversion count (asserted in AnalyticsSpec). The join is a
    // user-equi + time-range join (per-user bounded fan-out); windows
    // partition by conversion id; the linear credit sums through
    // DECIMAL(24,12) quantization (Portable: raw double sums are
    // aggregation-order-dependent).
    "el_attribution" -> Q(
      """WITH conv AS (
        |  SELECT event_id AS conv_id, user_id, epoch_ns(ts)//1000 AS cts
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, event_id AS tid, event_type AS ttype, epoch_ns(ts)//1000 AS tts
        |  FROM events WHERE event_type IN ('click','view','signup')),
        |j AS (
        |  SELECT c.conv_id, t.ttype, t.tts, t.tid
        |  FROM conv c LEFT JOIN t
        |    ON c.user_id = t.user_id AND t.tts <= c.cts
        |   AND t.tts > c.cts - 604800000000),
        |r AS (
        |  SELECT conv_id, coalesce(ttype, 'none') AS touch_type,
        |         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY tts DESC, tid DESC) AS rn_last,
        |         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY tts ASC,  tid ASC)  AS rn_first,
        |         COUNT(ttype) OVER (PARTITION BY conv_id) AS n
        |  FROM j)
        |SELECT touch_type,
        |       COUNT(CASE WHEN rn_last  = 1 THEN 1 END) AS last_touch_convs,
        |       COUNT(CASE WHEN rn_first = 1 THEN 1 END) AS first_touch_convs,
        |       CAST(SUM(CASE WHEN n = 0 THEN CAST(1 AS DECIMAL(24,12))
        |                     ELSE CAST(CAST(1 AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(24,12))
        |                END) AS DOUBLE) AS linear_credit
        |FROM r GROUP BY touch_type ORDER BY touch_type""".stripMargin) { (s, d) =>
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
        .withColumn("n", count(col("ttype")).over(wN))
        .groupBy("touch_type")
        .agg(count(when(col("rn_last") === 1, 1)).as("last_touch_convs"),
             count(when(col("rn_first") === 1, 1)).as("first_touch_convs"),
             sum(when(col("n") === 0, lit(1).cast("decimal(24,12)"))
                   .otherwise((lit(1.0) / col("n").cast("double")).cast("decimal(24,12)")))
               .cast("double").as("linear_credit"))
        .orderBy("touch_type")
    },

    // Histogram-based quantile estimation — the MERGEABLE fixed-width
    // histogram that replaces exact sorts for percentiles at 100 TB:
    // 32 equal-width bins per type (bounds from a broadcast stat dim),
    // cumulative counts over the ≤32-row-per-type bin table, and
    // p50/p90/p99 read off by integer linear interpolation inside the
    // target bin. Per-type histograms merge by adding counts — the
    // t-digest role, in the deterministic form both engines compute
    // identically. The EXACT quantiles (k-th smallest, winsorize-style)
    // ride along so the estimation error is visible and oracle-checked.
    "el_quantile_sketch" -> Q(
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS c FROM events),
        |st AS (
        |  SELECT event_type, MIN(c) AS minc, MAX(c) - MIN(c) + 1 AS r, COUNT(*) AS n
        |  FROM ev GROUP BY event_type),
        |qd AS (SELECT unnest([50, 90, 99]) AS qq),
        |hist AS (
        |  SELECT e.event_type, ((e.c - s.minc) * 32) // s.r AS b, COUNT(*) AS cnt
        |  FROM ev e JOIN st s ON e.event_type = s.event_type
        |  GROUP BY e.event_type, b),
        |cm AS (
        |  SELECT event_type, b, cnt,
        |         CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY b
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM hist),
        |pick AS (
        |  SELECT c.event_type, q.qq, c.b, c.cnt, c.cum, s.minc, s.r,
        |         greatest(1, (s.n * q.qq) // 100) AS k,
        |         ROW_NUMBER() OVER (PARTITION BY c.event_type, q.qq ORDER BY c.b) AS rn
        |  FROM cm c JOIN st s ON c.event_type = s.event_type
        |  CROSS JOIN qd q
        |  WHERE c.cum >= greatest(1, (s.n * q.qq) // 100)),
        |est AS (
        |  SELECT event_type, qq, k,
        |         (minc + (b * r) // 32)
        |           + ((k - (cum - cnt))
        |              * ((minc + ((b + 1) * r) // 32) - (minc + (b * r) // 32))) // cnt
        |           AS est_c
        |  FROM pick WHERE rn = 1),
        |vcum AS (
        |  SELECT event_type, c,
        |         CAST(SUM(cn) OVER (PARTITION BY event_type ORDER BY c
        |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vcum
        |  FROM (SELECT event_type, c, COUNT(*) AS cn FROM ev GROUP BY event_type, c)),
        |ex AS (
        |  SELECT e.event_type, e.qq, e.est_c, MIN(v.c) AS exact_c
        |  FROM est e JOIN vcum v
        |    ON e.event_type = v.event_type AND v.vcum >= e.k
        |  GROUP BY e.event_type, e.qq, e.est_c)
        |SELECT event_type, CAST(qq AS INTEGER) AS q,
        |       CAST(est_c AS DOUBLE) / CAST(100 AS DOUBLE) AS est_value,
        |       CAST(exact_c AS DOUBLE) / CAST(100 AS DOUBLE) AS exact_value,
        |       CAST(est_c - exact_c AS DOUBLE) / CAST(100 AS DOUBLE) AS err
        |FROM ex ORDER BY event_type, q""".stripMargin) { (s, d) =>
      import s.implicits._
      // ONE events scan: stats, histogram, and exact quantiles all
      // derive from the checkpointed per-VALUE count table
      val vals = Tables.events(s, d)
        .select(col("event_type"), Portable.cents(col("value")).as("c"))
        .groupBy("event_type", "c").agg(count(lit(1)).as("cn"))
        .localCheckpoint(true)
      val st = vals.groupBy(col("event_type").as("st_type"))
        .agg(min(col("c")).as("minc"),
             (max(col("c")) - min(col("c")) + 1).as("r"),
             sum(col("cn")).as("n"))
      val hist = vals.join(broadcast(st), col("event_type") === col("st_type"))
        .groupBy(col("event_type"), expr("((c - minc) * 32) div r").as("b"))
        .agg(sum(col("cn")).as("cnt"))
      val wCum = Window.partitionBy("event_type").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val qd = Seq(50, 90, 99).toDF("qq")
      val pick = hist
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .join(broadcast(st), col("event_type") === col("st_type"))
        .crossJoin(broadcast(qd))
        .withColumn("k", greatest(lit(1L), expr("(n * qq) div 100")))
        .filter(col("cum") >= col("k"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type", "qq").orderBy("b")))
        .filter(col("rn") === 1)
      val est = pick.select(col("event_type"), col("qq"), col("k"),
        expr("""(minc + (b * r) div 32)
               | + ((k - (cum - cnt))
               |    * ((minc + ((b + 1) * r) div 32) - (minc + (b * r) div 32))) div cnt"""
          .stripMargin.replace("\n", " ")).as("est_c"))
      // exact quantiles from the per-VALUE cumulative count, not a
      // full-row ranking window (the q49-median trick)
      val vcum = vals
        .select(col("event_type").as("v_type"), col("c"), col("cn"))
        .withColumn("vcum", sum(col("cn")).over(
          Window.partitionBy("v_type").orderBy("c")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      est.join(vcum, col("event_type") === col("v_type") && col("vcum") >= col("k"))
        .groupBy(col("event_type"), col("qq"), col("est_c"))
        .agg(min(col("c")).as("exact_c"))
        .select(col("event_type"), col("qq").cast("int").as("q"),
                (col("est_c").cast("double") / lit(100.0)).as("est_value"),
                (col("exact_c").cast("double") / lit(100.0)).as("exact_value"),
                ((col("est_c") - col("exact_c")).cast("double") / lit(100.0)).as("err"))
        .orderBy("event_type", "q")
    },

    // Bot/automation detection by inter-event-time REGULARITY: human
    // activity has bursty gaps (high coefficient of variation), scripted
    // traffic is metronomic (CV → 0). Per-user gap stream from one
    // user-partitioned lag window; mean/variance from exact integer
    // sums (gap µs fit BIGINT; sum of squares of second-scale gaps
    // stays < 2^62 for any plausible retention), CV in one IEEE
    // sqrt+divide — the same portable-moments recipe as
    // el_anomaly_zscore. Flag threshold enters as exact integer
    // comparison on the quantized CV. Output one row per user with
    // ≥ 2 gaps.
    "el_bot_regularity" -> Q(
      """WITH seq AS (
        |  SELECT user_id, epoch_ns(ts)//1000 AS us,
        |         LAG(epoch_ns(ts)//1000) OVER (PARTITION BY user_id
        |                                       ORDER BY epoch_ns(ts)//1000, event_id) AS prev_us
        |  FROM events),
        |gaps AS (
        |  SELECT user_id, (us - prev_us) // 1000000 AS gap_s
        |  FROM seq WHERE prev_us IS NOT NULL),
        |st AS (
        |  SELECT user_id, COUNT(*) AS n_gaps,
        |         CAST(SUM(gap_s) AS BIGINT) AS sg,
        |         CAST(SUM(gap_s * gap_s) AS BIGINT) AS sg2
        |  FROM gaps GROUP BY user_id HAVING COUNT(*) >= 2),
        |fin AS (
        |  SELECT user_id, n_gaps,
        |         CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_s,
        |         CASE WHEN sg = 0 THEN CAST(0 AS DOUBLE)
        |              ELSE sqrt(greatest(CAST(0 AS DOUBLE),
        |                          CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
        |                          - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
        |                            * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))))
        |                   / (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) END AS gap_cv
        |  FROM st)
        |SELECT user_id, n_gaps, mean_gap_s, gap_cv,
        |       CAST(CASE WHEN gap_cv < CAST(3 AS DOUBLE) / CAST(10 AS DOUBLE)
        |                 THEN 1 ELSE 0 END AS INTEGER) AS bot_flag
        |FROM fin ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      val st = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .filter(col("prev_us").isNotNull)
        .select(col("user_id"), expr("(us - prev_us) div 1000000").as("gap_s"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
             sum(col("gap_s")).as("sg"),
             sum(col("gap_s") * col("gap_s")).as("sg2"))
        .filter(col("n_gaps") >= 2)
      val meanG = col("sg").cast("double") / col("n_gaps").cast("double")
      // sub-second scripted traffic quantizes every gap to 0 s: mean=0
      // would make cv 0/0=NaN and the E[x^2]-mean^2 form can round to a
      // tiny negative, making sqrt NaN. sg=0 is the exact integer guard
      // for that case (perfect regularity → cv=0 → bot_flag=1).
      val varG = greatest(lit(0).cast("double"),
        col("sg2").cast("double") / col("n_gaps").cast("double") - meanG * meanG)
      val cv = when(col("sg") === 0, lit(0).cast("double"))
        .otherwise(sqrt(varG) / meanG)
      st.select(col("user_id"), col("n_gaps"), meanG.as("mean_gap_s"),
                cv.as("gap_cv"),
                when(cv < lit(3).cast("double") / lit(10).cast("double"), 1)
                  .otherwise(0).cast("int").as("bot_flag"))
        .orderBy("user_id")
    },

    // EQUI-DEPTH histogram (the optimizer-statistics twin of the
    // equal-width el_quantile_sketch): 8 buckets per type holding
    // ~n/8 rows each, built entirely from the per-value cumulative
    // count — a value lands in the bucket of its LAST rank
    // ((cum−1)·8 div n), so ties stay whole and the assignment is
    // deterministic in both engines. Emits per-bucket row mass and
    // value boundaries — the histogram a cost-based optimizer keeps
    // per column. No row-level window anywhere.
    "el_equidepth_hist" -> Q(
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS c FROM events),
        |cnt AS (
        |  SELECT event_type, c, COUNT(*) AS cn FROM ev GROUP BY event_type, c),
        |tot AS (
        |  SELECT event_type, CAST(SUM(cn) AS BIGINT) AS nt FROM cnt GROUP BY event_type),
        |cum AS (
        |  SELECT event_type, c, cn,
        |         CAST(SUM(cn) OVER (PARTITION BY event_type ORDER BY c
        |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM cnt)
        |SELECT u.event_type,
        |       CAST(((u.cum - 1) * 8) // t.nt AS INTEGER) AS bucket,
        |       COUNT(*) AS n_values,
        |       CAST(SUM(u.cn) AS BIGINT) AS n_rows,
        |       CAST(MIN(u.c) AS DOUBLE) / CAST(100 AS DOUBLE) AS lo_value,
        |       CAST(MAX(u.c) AS DOUBLE) / CAST(100 AS DOUBLE) AS hi_value
        |FROM cum u JOIN tot t ON u.event_type = t.event_type
        |GROUP BY u.event_type, bucket
        |ORDER BY u.event_type, bucket""".stripMargin) { (s, d) =>
      // ONE scan, no join, no checkpoint: the per-type total rides the
      // same window partitioning as the running count (one exchange+sort,
      // two frames), so nothing re-derives the value table
      val wCum = Window.partitionBy("event_type").orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy("event_type")
      Tables.events(s, d)
        .select(col("event_type"), Portable.cents(col("value")).as("c"))
        .groupBy("event_type", "c").agg(count(lit(1)).as("cn"))
        .withColumn("cum", sum(col("cn")).over(wCum))
        .withColumn("nt", sum(col("cn")).over(wTot))
        .groupBy(col("event_type"),
                 expr("((cum - 1) * 8) div nt").cast("int").as("bucket"))
        .agg(count(lit(1)).as("n_values"),
             sum(col("cn")).as("n_rows"),
             (min(col("c")).cast("double") / lit(100.0)).as("lo_value"),
             (max(col("c")).cast("double") / lit(100.0)).as("hi_value"))
        .orderBy("event_type", "bucket")
    },

    // Winsorized (clipped) robust statistics per event type: p05/p95
    // picked as exact k-th smallest values (deterministic regardless of
    // tie order — the k-th VALUE is well-defined), values clamped into
    // [p05, p95], clipped mean from exact integer-cents sums weighted
    // by value multiplicity. The outlier-robust twin of
    // el_anomaly_zscore. Windows partition by event_type; the 5-row
    // threshold dim broadcasts onto the value table.
    "el_winsorize" -> Q(
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS c FROM events),
        |cnt AS (
        |  SELECT event_type, c, COUNT(*) AS cn FROM ev GROUP BY event_type, c),
        |tot AS (
        |  SELECT event_type, CAST(SUM(cn) AS BIGINT) AS nt FROM cnt GROUP BY event_type),
        |cum AS (
        |  SELECT event_type, c,
        |         CAST(SUM(cn) OVER (PARTITION BY event_type ORDER BY c
        |                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM cnt),
        |th AS (
        |  SELECT u.event_type,
        |         MIN(CASE WHEN u.cum >= greatest(1, (t.nt * 5)  // 100) THEN u.c END) AS p05c,
        |         MIN(CASE WHEN u.cum >= greatest(1, (t.nt * 95) // 100) THEN u.c END) AS p95c
        |  FROM cum u JOIN tot t ON u.event_type = t.event_type
        |  GROUP BY u.event_type),
        |cl AS (
        |  SELECT e.event_type, t.p05c, t.p95c,
        |         least(greatest(e.c, t.p05c), t.p95c) AS cc,
        |         CASE WHEN e.c < t.p05c THEN 1 ELSE 0 END AS lo,
        |         CASE WHEN e.c > t.p95c THEN 1 ELSE 0 END AS hi
        |  FROM ev e JOIN th t ON e.event_type = t.event_type)
        |SELECT event_type,
        |       CAST(MIN(p05c) AS DOUBLE) / CAST(100 AS DOUBLE) AS p05,
        |       CAST(MIN(p95c) AS DOUBLE) / CAST(100 AS DOUBLE) AS p95,
        |       CAST(CAST(SUM(cc) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |         / CAST(100 AS DOUBLE) AS winsorized_mean,
        |       CAST(SUM(lo) AS BIGINT) AS n_clipped_low,
        |       CAST(SUM(hi) AS BIGINT) AS n_clipped_high,
        |       COUNT(*) AS n
        |FROM cl GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // ONE events scan: the per-VALUE count table (tiny next to the
      // stream at scale, eagerly checkpointed so its lineage runs once)
      // feeds thresholds AND the weighted clip statistics — no second
      // pass over raw rows anywhere
      val cnt = Tables.events(s, d)
        .select(col("event_type"), Portable.cents(col("value")).as("c"))
        .groupBy("event_type", "c").agg(count(lit(1)).as("cn"))
        .localCheckpoint(true)
      val tot = cnt.groupBy(col("event_type").as("tt_type"))
        .agg(sum(col("cn")).as("nt"))
      val wCum = Window.partitionBy("event_type").orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val th = cnt
        .withColumn("cum", sum(col("cn")).over(wCum))
        .join(broadcast(tot), col("event_type") === col("tt_type"))
        .groupBy(col("event_type").as("t_type"))
        .agg(min(when(col("cum") >= greatest(lit(1L), expr("(nt * 5) div 100")),
                      col("c"))).as("p05c"),
             min(when(col("cum") >= greatest(lit(1L), expr("(nt * 95) div 100")),
                      col("c"))).as("p95c"))
      cnt.join(broadcast(th), col("event_type") === col("t_type"))
        .select(col("event_type"), col("p05c"), col("p95c"), col("cn"),
                (least(greatest(col("c"), col("p05c")), col("p95c")) * col("cn")).as("ccw"),
                when(col("c") < col("p05c"), col("cn")).otherwise(0L).as("lo"),
                when(col("c") > col("p95c"), col("cn")).otherwise(0L).as("hi"))
        .groupBy("event_type")
        .agg((min(col("p05c")).cast("double") / lit(100.0)).as("p05"),
             (min(col("p95c")).cast("double") / lit(100.0)).as("p95"),
             (sum(col("ccw")).cast("double") / sum(col("cn")).cast("double")
               / lit(100.0)).as("winsorized_mean"),
             sum(col("lo")).cast("long").as("n_clipped_low"),
             sum(col("hi")).cast("long").as("n_clipped_high"),
             sum(col("cn")).as("n"))
        .orderBy("event_type")
    },

    // Sliding 7-day distinct users via HLL REGISTER MERGE — the sketch-
    // algebra query that justifies sketches at 100 TB: daily registers
    // are computed ONCE from the scan (≤ 64 longs per day), and every
    // 7-day window is a max-merge of 7 daily sketches — no second pass
    // over raw events, and a precomputed daily-sketch table would serve
    // any window length the same way. The SKETCH path's fan-out is
    // bounded at 7× the ≤64-rows/day register table, never 7× the
    // events. The exact sliding distinct emitted alongside (hash
    // semantics, like el_hll_daily) is the VERIFICATION companion: it
    // fans out 7× the distinct (day, user) rows — daily-active-user
    // scale — which is exactly the cost the sketch exists to avoid; a
    // production deployment keeps the register merge and drops the
    // exact twin.
    "el_hll_sliding" -> Q(
      """WITH ev AS (
        |  SELECT DISTINCT epoch_ns(ts)//86400000000000 AS day,
        |         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM ev),
        |r AS (
        |  SELECT day, hv % 64 AS reg, hv,
        |         CASE WHEN (hv >> 6) = 0 THEN 55
        |              ELSE 55 - CAST(length(bin(hv >> 6)) AS INTEGER) END AS rk
        |  FROM ev),
        |daily AS (SELECT day, reg, MAX(rk) AS mreg FROM r GROUP BY day, reg),
        |fan AS (SELECT day + i AS wday, reg, mreg FROM daily, range(0, 7) t(i)),
        |m AS (SELECT wday, reg, MAX(mreg) AS mreg FROM fan GROUP BY wday, reg),
        |a AS (
        |  SELECT wday,
        |         CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - mreg AS INTEGER)) AS BIGINT) AS s_occ,
        |         COUNT(*) AS occ
        |  FROM m GROUP BY wday),
        |exf AS (SELECT day + i AS wday, hv FROM r, range(0, 7) t(i)),
        |ex AS (SELECT wday, COUNT(DISTINCT hv) AS exact_distinct FROM exf GROUP BY wday),
        |wd AS (
        |  SELECT day + i AS wday, COUNT(*) AS days_in_window
        |  FROM days, range(0, 7) t(i) GROUP BY wday)
        |SELECT a.wday AS window_end_day, wd.days_in_window,
        |       CAST(709 AS DOUBLE) / CAST(1000 AS DOUBLE) * CAST(4096 AS DOUBLE)
        |         * CAST(36028797018963968 AS DOUBLE)
        |         / CAST(a.s_occ + (64 - a.occ) * 36028797018963968 AS DOUBLE) AS hll_estimate,
        |       CAST(64 - a.occ AS INTEGER) AS zero_regs, ex.exact_distinct
        |FROM a JOIN ex ON a.wday = ex.wday
        |       JOIN wd ON a.wday = wd.wday
        |       JOIN days dd ON a.wday = dd.day
        |ORDER BY window_end_day""".stripMargin) { (s, d) =>
      // reg/rk are functions of hv, so distinct-after ≡ distinct-before
      val r = graft.functions.PortableHll.registerCoords(
          Tables.events(s, d)
            .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id")),
          col("user_id"))
        .select(col("day"), col("reg"), col("hv"), col("rk"))
        .distinct()
        // r feeds daily, the exact companion ex, and days: without the
        // eager barrier the events scan + distinct re-executes three
        // times (same one-scan discipline as q49/el_winsorize)
        .localCheckpoint(true)
      val ev = r.select(col("day"), col("hv"))
      val daily = r.groupBy("day", "reg").agg(max(col("rk")).as("mreg"))
      val m = daily
        .withColumn("wday", explode(sequence(col("day"), col("day") + 6)))
        .groupBy("wday", "reg").agg(max(col("mreg")).as("mreg"))
      val a = m.groupBy("wday")
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mreg AS INT))")).as("s_occ"),
             count(lit(1)).as("occ"))
      val ex = r.select(col("day"), col("hv"))
        .withColumn("exday", explode(sequence(col("day"), col("day") + 6)))
        .groupBy(col("exday")).agg(countDistinct(col("hv")).as("exact_distinct"))
      val days = ev.select(col("day")).distinct()
      val wd = days
        .withColumn("wdday", explode(sequence(col("day"), col("day") + 6)))
        .groupBy(col("wdday")).agg(count(lit(1)).as("days_in_window"))
      a.join(ex, col("wday") === col("exday"))
        .join(broadcast(wd), col("wday") === col("wdday"))
        .join(broadcast(days.select(col("day").as("realday"))), col("wday") === col("realday"),
              "left_semi")
        .select(col("wday").as("window_end_day"), col("days_in_window"),
                (lit(709).cast("double") / lit(1000).cast("double")
                  * lit(4096).cast("double") * lit(36028797018963968L).cast("double")
                  / (col("s_occ") + (lit(64L) - col("occ")) * lit(36028797018963968L))
                      .cast("double")).as("hll_estimate"),
                (lit(64L) - col("occ")).cast("int").as("zero_regs"),
                col("exact_distinct"))
        .orderBy("window_end_day")
    }
  )
}
