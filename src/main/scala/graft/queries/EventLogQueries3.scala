package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native session-window aggregation over the event log.
  *
  * `el_sessionize` proves the gaps-and-islands formulation (lag + running
  * sum); this is the SPARK-NATIVE twin: `functions.session_window`, the
  * same merge-on-overlap operator Structured Streaming uses for stateful
  * session aggregation (streaming/EventStream.scala's session pane), run
  * in batch. One shuffle on the grouping key, sessions merged inside the
  * partition — at 100 TB this is strictly one exchange by user_id and no
  * window sort over the full log, which is why the native operator is
  * preferred over the islands form when per-session (not per-event)
  * output is all that's needed.
  *
  * Semantics note the oracle mirrors exactly: session_window merges a
  * successor that lands WITHIN gap of the latest event INCLUSIVE — an
  * event exactly gap after its predecessor still merges (pinned
  * empirically by SessionWindowSpec on a crafted exact-gap fixture; the
  * first draft of this oracle split at equality and only passed because
  * µs-resolution data never hits the boundary). That is the same
  * strictly-greater split rule as el_sessionize's islands; what the
  * native operator adds is the session INTERVAL (end = last event +
  * gap) and the one-exchange MergingSessions plan.
  */
object EventLogQueries3 {

  private val GapUs = 1800000000L // 30 minutes

  def defs: Map[String, Q] = Map(

    "el_session_window" -> Q(
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
         |  FROM g)
         |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |       MIN(tus) AS start_us,
         |       MAX(tus) + $GapUs AS end_us,
         |       MAX(tus) + $GapUs - MIN(tus) AS dur_us
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, start_us""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"),
                unix_micros(col("session_window.start")).as("start_us"),
                unix_micros(col("session_window.end")).as("end_us"),
                (unix_micros(col("session_window.end"))
                  - unix_micros(col("session_window.start"))).as("dur_us"))
        .orderBy("user_id", "start_us")
    },

    // Retention-policy preview — the QUERY form of Topic.retain (which
    // rewrites segments; this answers "what would survive" without
    // touching the log): dual policy, keep events within 7 days of the
    // log head AND within the newest 1500 by (ts, event_id). Both
    // cutoffs are SCALARS (one map-side-combined max; one
    // TakeOrdered-1500 reduced to its oldest element — never a global
    // row_number over the log, which would single-partition the sort),
    // broadcast into one filtered pass. At 100 TB the same shape holds:
    // two tiny aggregates + one scan; Topic.retain then enforces the
    // policy at segment granularity (whole-file deletes).
    "el_retention_survivors" -> Q(
      """WITH e AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |tcut AS (SELECT MAX(ts) - INTERVAL 7 DAY AS tmin FROM e),
        |newest AS (
        |  SELECT ts AS cts, event_id AS cid FROM e
        |  ORDER BY ts DESC, event_id DESC LIMIT 1500),
        |scut AS (SELECT cts, cid FROM newest ORDER BY cts ASC, cid ASC LIMIT 1),
        |surv AS (
        |  SELECT e.* FROM e, tcut, scut
        |  WHERE e.ts >= tcut.tmin AND (e.ts, e.event_id) >= (scut.cts, scut.cid))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       MIN(event_id) AS min_event_id, MAX(event_id) AS max_event_id,
        |       MIN(ts) AS first_ts, MAX(ts) AS last_ts
        |FROM surv GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_id", "ts", "event_type")
      val tcut = e.agg((max(col("ts")) - expr("INTERVAL 7 DAYS")).as("tmin"))
      // oldest element of the newest-1500: TakeOrderedAndProject (never
      // the whole log on one partition), then a 1500-row min — when the
      // log is shorter than 1500, the min is the log's oldest row and
      // the size policy keeps everything, same as the oracle's LIMIT
      val scut = e.orderBy(col("ts").desc, col("event_id").desc).limit(1500)
        .agg(min(struct(col("ts").as("cts"), col("event_id").as("cid"))).as("c"))
      e.crossJoin(broadcast(tcut)).crossJoin(broadcast(scut))
        .filter(col("ts") >= col("tmin") &&
                struct(col("ts").as("cts"), col("event_id").as("cid")) >= col("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
             min("event_id").as("min_event_id"), max("event_id").as("max_event_id"),
             min("ts").as("first_ts"), max("ts").as("last_ts"))
        .orderBy("event_type")
    },

    // Watermark-lateness audit — the table that SIZES a watermark before
    // any streaming job runs. The log itself is in-order (the append
    // path stamps monotonically), but a consumer of the reference's
    // 4-shard round-robin topic that drains 256-event batches shard by
    // shard (the consumeBatch pattern, no merge-sort across shards) sees
    // event time REGRESS at every shard boundary — that interleave is
    // the arrival order modeled here, a pure function of the log ordinal:
    //   arrival = (id div 1024)·1024 + (id mod 4)·256 + (id div 4) mod 256.
    // Per user (the stateful-agg key), lateness = running event-time
    // high-water-mark at arrival − event time; bucketed counts + max
    // answer "what `withWatermark` bound loses <x% of events" for every
    // EventStream job consuming this topic. Scale shape: arrival is a
    // per-row expression (no sort to build it), ONE window partitioned
    // by user_id (bounded per key, the el_sessionize pattern — never a
    // global arrival sort) + one map-side-combined 5-row aggregate.
    "el_lateness_audit" -> Q(
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS tus,
        |         (event_id // 1024) * 1024 + (event_id % 4) * 256
        |           + (event_id // 4) % 256 AS arrival
        |  FROM events),
        |hwm AS (
        |  SELECT user_id, tus,
        |         MAX(tus) OVER (PARTITION BY user_id ORDER BY arrival
        |                        ROWS UNBOUNDED PRECEDING) AS hwm_us
        |  FROM e),
        |b AS (
        |  SELECT CASE WHEN hwm_us - tus = 0 THEN 0
        |              WHEN hwm_us - tus <= 60000000 THEN 1
        |              WHEN hwm_us - tus <= 600000000 THEN 2
        |              WHEN hwm_us - tus <= 1800000000 THEN 3
        |              ELSE 4 END AS bucket,
        |         hwm_us - tus AS late_us
        |  FROM hwm)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       MAX(late_us) AS max_late_us
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("arrival"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("tus"),
          expr("(event_id div 1024) * 1024 + (event_id % 4) * 256 + (event_id div 4) % 256")
            .as("arrival"))
        .withColumn("late_us", max(col("tus")).over(w) - col("tus"))
        .withColumn("bucket",
          when(col("late_us") === 0, 0)
            .when(col("late_us") <= 60000000L, 1)
            .when(col("late_us") <= 600000000L, 2)
            .when(col("late_us") <= 1800000000L, 3)
            .otherwise(4))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_events"), max(col("late_us")).as("max_late_us"))
        .orderBy("bucket")
    }
  )
}
