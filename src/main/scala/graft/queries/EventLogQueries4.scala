package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth event-log batch: interval analytics over the session intervals
  * the log implies (reference: the cascade broker persists the raw
  * stream and leaves derived analytics to consumers,
  * /root/reference/src/broker/main.rs:53).
  *
  * `el_peak_concurrency` is the classic sweep-line operator — max
  * simultaneous open sessions per day, the capacity number an ops team
  * sizes connection pools against. The naive form sorts every boundary
  * globally; the declared plan never does: sessions (el_session_window
  * semantics — islands with a 30-min inclusive gap, interval end = last
  * event + gap, END EXCLUSIVE) are clipped to the days they span, so
  * each day's +1/−1 sweep is self-contained with a zero baseline and the
  * running-sum window is PARTITIONED BY DAY — bounded by a day's traffic,
  * parallel across the calendar. At 100 TB the same shape drops to
  * (day, hour) panes with per-pane baselines; the day pane is the
  * declared grain because the fixture's sessions never span two hours.
  * Tie discipline: at equal timestamps ends sort before starts
  * (exclusive end — a session ending exactly when another starts never
  * overlaps it), encoded as ORDER BY (t, delta) since −1 < +1.
  */
object EventLogQueries4 {

  private val GapUs = 1800000000L // 30 minutes, el_session_window's gap
  private val DayUs = 86400000000L

  def defs: Map[String, Q] = Map(

    "el_peak_concurrency" -> Q(
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus FROM events),
         |g AS (
         |  SELECT user_id, event_id, tus,
         |         CASE WHEN LAG(tus) OVER w IS NULL OR tus - LAG(tus) OVER w > $GapUs
         |              THEN 1 ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
         |s AS (
         |  SELECT user_id, tus,
         |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |                           ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM g),
         |sess AS (
         |  SELECT user_id, sid, MIN(tus) AS st, MAX(tus) + $GapUs AS en
         |  FROM s GROUP BY user_id, sid),
         |days AS (
         |  SELECT st, en, u.d AS day_idx
         |  FROM sess, unnest(range(st // $DayUs, (en - 1) // $DayUs + 1)) u(d)),
         |sw AS (
         |  SELECT day_idx, greatest(st, day_idx * $DayUs) AS t, 1 AS delta FROM days
         |  UNION ALL
         |  SELECT day_idx, least(en, (day_idx + 1) * $DayUs) AS t, -1 AS delta FROM days),
         |run AS (
         |  SELECT day_idx, delta,
         |         SUM(delta) OVER (PARTITION BY day_idx ORDER BY t, delta
         |                          ROWS UNBOUNDED PRECEDING) AS c
         |  FROM sw)
         |SELECT CAST(day_idx AS BIGINT) AS day_idx,
         |       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
         |       CAST(MAX(c) AS BIGINT) AS peak_concurrency
         |FROM run GROUP BY day_idx ORDER BY day_idx""".stripMargin) { (s, d) =>
      val wU = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      val g = e.withColumn("is_new",
        when(lag(col("tus"), 1).over(wU).isNull ||
             col("tus") - lag(col("tus"), 1).over(wU) > GapUs, 1).otherwise(0))
      val sess = g
        .withColumn("sid", sum(col("is_new")).over(
          wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min(col("tus")).as("st"), (max(col("tus")) + GapUs).as("en"))
      val days = sess.select(col("st"), col("en"),
        explode(expr(s"sequence(st div $DayUs, (en - 1) div $DayUs)")).as("day_idx"))
      val sw = days.select(col("day_idx"),
          explode(array(
            struct(greatest(col("st"), col("day_idx") * DayUs).as("t"),
                   lit(1).as("delta")),
            struct(least(col("en"), (col("day_idx") + 1) * DayUs).as("t"),
                   lit(-1).as("delta")))).as("ev"))
        .select(col("day_idx"), col("ev.t").as("t"), col("ev.delta").as("delta"))
      val wD = Window.partitionBy("day_idx").orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sw.withColumn("c", sum(col("delta")).over(wD))
        .groupBy("day_idx")
        .agg(sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_sessions"),
             max(col("c")).cast("long").as("peak_concurrency"))
        .orderBy("day_idx")
    },

    // Time-average concurrency (Little's law L = λW read off the log):
    // the capacity twin of el_peak_concurrency — peak sizes the pool,
    // the TIME-WEIGHTED average is the utilization bill. Same clipped
    // session segments, no sweep needed: the integral of concurrency
    // over a day is exactly the sum of clipped session-microseconds, so
    // L arrives in exact milli-sessions by one truncating division.
    "el_time_avg_concurrency" -> Q(
      s"""WITH e AS (
         |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus FROM events),
         |g AS (
         |  SELECT user_id, event_id, tus,
         |         CASE WHEN LAG(tus) OVER w IS NULL OR tus - LAG(tus) OVER w > $GapUs
         |              THEN 1 ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
         |s AS (
         |  SELECT user_id, tus,
         |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |                           ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM g),
         |sess AS (
         |  SELECT user_id, sid, MIN(tus) AS st, MAX(tus) + $GapUs AS en
         |  FROM s GROUP BY user_id, sid),
         |seg AS (
         |  SELECT u.d AS day_idx,
         |         least(en, (u.d + 1) * $DayUs) - greatest(st, u.d * $DayUs) AS dur
         |  FROM sess, unnest(range(st // $DayUs, (en - 1) // $DayUs + 1)) u(d))
         |SELECT CAST(day_idx AS BIGINT) AS day_idx,
         |       CAST(COUNT(*) AS BIGINT) AS n_segments,
         |       CAST(SUM(dur) AS BIGINT) AS session_us,
         |       CAST(1000 * SUM(dur) // $DayUs AS BIGINT) AS avg_concurrency_milli
         |FROM seg GROUP BY day_idx ORDER BY day_idx""".stripMargin) { (s, d) =>
      val wU = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      val g = e.withColumn("is_new",
        when(lag(col("tus"), 1).over(wU).isNull ||
             col("tus") - lag(col("tus"), 1).over(wU) > GapUs, 1).otherwise(0))
      val sess = g
        .withColumn("sid", sum(col("is_new")).over(
          wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min(col("tus")).as("st"), (max(col("tus")) + GapUs).as("en"))
      sess.select(col("st"), col("en"),
          explode(expr(s"sequence(st div $DayUs, (en - 1) div $DayUs)")).as("day_idx"))
        .select(col("day_idx"),
          (least(col("en"), (col("day_idx") + 1) * DayUs) -
           greatest(col("st"), col("day_idx") * DayUs)).as("dur"))
        .groupBy("day_idx")
        .agg(count(lit(1)).as("n_segments"),
             sum(col("dur")).as("session_us"),
             expr(s"1000 * sum(dur) div $DayUs").as("avg_concurrency_milli"))
        .orderBy("day_idx")
    },

    // Sample-ratio mismatch guard (the standard A/B sanity check next to
    // el_ab_lift / el_cuped): users assigned 50/50 by id parity; if the
    // realized split's χ² = (o₁−o₂)²/n exceeds the 3.841 critical value
    // (α=0.05, df=1), the experiment is corrupted before any lift is
    // read. Exact integer χ² in milli-units — for the two-equal-buckets
    // case the statistic reduces to a single truncating division. One
    // distinct-user pass, one scalar row.
    "el_ab_srm" -> Q(
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |c AS (
        |  SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS o_a,
        |         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS o_b
        |  FROM u)
        |SELECT o_a, o_b,
        |       CAST(1000 * (o_a - o_b) * (o_a - o_b) // (o_a + o_b) AS BIGINT)
        |         AS chi2_milli,
        |       CAST(CASE WHEN 1000 * (o_a - o_b) * (o_a - o_b) // (o_a + o_b) > 3841
        |                 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
        |FROM c""".stripMargin) { (s, d) =>
      Tables.events(s, d).select("user_id").distinct()
        .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("o_a"),
             sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("o_b"))
        .select(col("o_a"), col("o_b"),
                expr("1000 * (o_a - o_b) * (o_a - o_b) div (o_a + o_b)").as("chi2_milli"),
                expr("cast(case when 1000 * (o_a - o_b) * (o_a - o_b) div (o_a + o_b) > 3841 then 1 else 0 end as bigint)").as("srm_flag"))
    },

    // The upsert-changelog -> RETRACT-STREAM conversion (Flink's
    // changelog algebra; Debezium's before/after images): reading the
    // event log as per-user updates to a value register, emit +I for a
    // key's first value and a -U/+U retraction pair for every
    // subsequent update — the exact row stream a downstream aggregate
    // consumes to stay correct under updates (SUM adds +U and subtracts
    // -U). Scale shape: ONE per-key window (rank + lag) and an in-place
    // explode — nothing global, parallel across users; output is
    // 2n−|keys| rows by construction, the changelog's own size.
    "el_retract_stream" -> Q(
      """WITH o AS (
        |  SELECT user_id, value,
        |         ROW_NUMBER() OVER w AS rn,
        |         LAG(value) OVER w AS prev
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |x AS (
        |  SELECT user_id,
        |         unnest(CASE WHEN rn = 1
        |           THEN [struct_pack(seq := CAST(0 AS BIGINT), op := '+I', v := value)]
        |           ELSE [struct_pack(seq := CAST(2*(rn-1)-1 AS BIGINT), op := '-U', v := prev),
        |                 struct_pack(seq := CAST(2*(rn-1) AS BIGINT), op := '+U', v := value)]
        |           END) AS u
        |  FROM o)
        |SELECT user_id, u.seq AS seq, u.op AS op, u.v AS value
        |FROM x ORDER BY user_id, seq""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("prev", lag(col("value"), 1).over(w))
        .select(col("user_id"), explode(
          when(col("rn") === 1L, array(
            struct(lit(0L).as("seq"), lit("+I").as("op"), col("value").as("v"))))
          .otherwise(array(
            struct((col("rn") * 2L - 3L).as("seq"), lit("-U").as("op"), col("prev").as("v")),
            struct((col("rn") * 2L - 2L).as("seq"), lit("+U").as("op"), col("value").as("v"))))
        ).as("u"))
        .select(col("user_id"), col("u.seq").as("seq"), col("u.op").as("op"),
          col("u.v").as("value"))
        .orderBy("user_id", "seq")
    },

    // The CONSUMER side of el_retract_stream — the query that proves the
    // changelog algebra actually maintains an aggregate: folding the ops
    // (+I/+U add, -U subtract, in exact integer cents) telescopes to each
    // key's LATEST value. The oracle is a genuine cross-derivation: DuckDB
    // never sees the ops — it reads the last value per key directly
    // (rank-1 window) — so a hash match certifies that the retract stream
    // an updating aggregate consumes reproduces point reads exactly.
    // Scale shape: the same per-key window + explode as the producer
    // query, then one map-side-combined signed sum; signed cents make the
    // fold order-independent.
    "el_retract_apply" -> Q(
      """WITH o AS (
        |  SELECT user_id, value,
        |         ROW_NUMBER() OVER w AS rn,
        |         COUNT(*) OVER (PARTITION BY user_id) AS cnt
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC))
        |SELECT user_id,
        |       CAST(2 * MAX(cnt) - 1 AS BIGINT) AS n_ops,
        |       CAST(CAST(round(MAX(CASE WHEN rn = 1 THEN value END) * 100) AS BIGINT)
        |            AS DOUBLE) / 100 AS latest_value
        |FROM o GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      import graft.functions.Portable.cents
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ops = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("prev", lag(col("value"), 1).over(w))
        .select(col("user_id"), explode(
          when(col("rn") === 1L, array(
            struct(lit("+I").as("op"), col("value").as("v"))))
          .otherwise(array(
            struct(lit("-U").as("op"), col("prev").as("v")),
            struct(lit("+U").as("op"), col("value").as("v"))))
        ).as("u"))
      ops.groupBy("user_id")
        .agg(count(lit(1)).as("n_ops"),
             sum(when(col("u.op") === "-U", -cents(col("u.v")))
               .otherwise(cents(col("u.v")))).as("scents"))
        .select(col("user_id"), col("n_ops"),
          (col("scents").cast("double") / 100).as("latest_value"))
        .orderBy("user_id")
    },

    // Kafka's offsetsForTimes as a BATCH query (the API form is
    // Cascade.offsetsForTimes, CascadeSpec): for each of four probe
    // times spread across the log's span, the offset a consumer seeks
    // to — which, because offsets are the (ts, event_id) rank, is just
    // COUNT(ts < probe): a conditional aggregate, NO window, NO sort.
    // The naive formulation (global ROW_NUMBER then first row >= probe)
    // drags the whole log through one partition; this one is a single
    // scan with 8 map-side-combined aggregates and a 4-row stack. At
    // 100 TB the same 8 counters ride any existing pass over the log.
    // All-integer µs arithmetic so both engines agree exactly.
    "el_offsets_for_times" -> Q(
      """WITH e AS (SELECT epoch_ns(ts) // 1000 AS tus FROM events),
        |b AS (SELECT MIN(tus) AS tmin, MAX(tus) AS tmax FROM e),
        |p AS (SELECT k, tmin + ((tmax - tmin) * k) // 4 AS probe_us
        |      FROM b, range(0, 4) t(k)),
        |r AS (SELECT p.k, p.probe_us,
        |             SUM(CASE WHEN e.tus < p.probe_us THEN 1 ELSE 0 END) AS next_offset,
        |             MIN(CASE WHEN e.tus >= p.probe_us THEN e.tus END) AS first_ts_us
        |      FROM e, p GROUP BY 1, 2)
        |SELECT k, probe_us, CAST(next_offset AS BIGINT) AS next_offset, first_ts_us
        |FROM r ORDER BY k""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(unix_micros(col("ts")).as("tus"))
      val b = e.agg(min("tus").as("tmin"), max("tus").as("tmax"))
      val aggs = (0 to 3).flatMap { k =>
        val p = expr(s"tmin + ((tmax - tmin) * $k) div 4")
        Seq(min(p).as(s"probe$k"), // constant across rows; min reads it out
            sum(when(col("tus") < p, 1L).otherwise(0L)).as(s"off$k"),
            min(when(col("tus") >= p, col("tus"))).as(s"first$k"))
      }
      e.crossJoin(broadcast(b))
        .agg(aggs.head, aggs.tail: _*)
        .selectExpr(
          """stack(4,
            |  0L, probe0, off0, first0,
            |  1L, probe1, off1, first1,
            |  2L, probe2, off2, first2,
            |  3L, probe3, off3, first3) AS (k, probe_us, next_offset, first_ts_us)
            |""".stripMargin)
        .orderBy("k")
    }
  )
}
