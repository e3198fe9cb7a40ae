package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-fidelity queries over the `events` table — the analytics that
  * correspond 1:1 to cascade's runtime behaviors (SURVEY.md §2.A).
  *
  * The `offset` ordinal is `row_number() over (order by ts, event_id) - 1`
  * — the batch model of the broker's index.table positional addressing
  * (/root/reference/src/broker/main.rs:97,132). Window ORDER BY uses
  * `event_id` as final tiebreaker everywhere so the order is total on both
  * engines (events.ts is ns in the file, µs in Spark).
  */
object EventLogQueries {

  /** Total order of the event log: ts (µs, both engines), then event_id. */
  private val logOrder = Seq(col("ts"), col("event_id"))

  def defs: Map[String, Q] = Map(

    // R11: the consumer's point read — fetch event at offset 4
    // (/root/reference/src/consumer/main.rs:22 hardcodes offset 4).
    "el_consume_offset" -> Q(
      """WITH log AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value,
        |         ROW_NUMBER() OVER (ORDER BY CAST(ts AS TIMESTAMP), event_id) - 1 AS log_offset
        |  FROM events)
        |SELECT log_offset, event_id, ts, user_id, event_type, value
        |FROM log WHERE log_offset = 4 ORDER BY log_offset""".stripMargin) { (s, d) =>
      // orderBy+limit(n+1) is a distributed TakeOrderedAndProject — the
      // global ordinal window only ever sees n+1 rows (a global
      // Window.orderBy would drag the whole log to one partition; at
      // scale the Topic layer's PERSISTED offsets replace even this).
      Tables.events(s, d)
        .orderBy(logOrder: _*).limit(5)
        .withColumn("log_offset", row_number().over(Window.orderBy(logOrder: _*)) - 1L)
        .filter(col("log_offset") === 4)
        .select("log_offset", "event_id", "ts", "user_id", "event_type", "value")
        .orderBy("log_offset")
    },

    // R11 batched: the `repeated Event` consume the proto declares
    // (/root/reference/proto/consume.proto:23) but the broker never returns.
    "el_consume_batch" -> Q(
      """WITH log AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
        |         ROW_NUMBER() OVER (ORDER BY CAST(ts AS TIMESTAMP), event_id) - 1 AS log_offset
        |  FROM events)
        |SELECT log_offset, event_id, ts, event_type, value
        |FROM log WHERE log_offset >= 100 AND log_offset < 110 ORDER BY log_offset""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .orderBy(logOrder: _*).limit(110)
        .withColumn("log_offset", row_number().over(Window.orderBy(logOrder: _*)) - 1L)
        .filter(col("log_offset") >= 100 && col("log_offset") < 110)
        .select("log_offset", "event_id", "ts", "event_type", "value")
        .orderBy("log_offset")
    },

    // R11 sharded: the Kafka read model (consume addresses (partition,
    // offset)) over the round-robin sharding of R7 — shard 2, offsets
    // [5, 10). The shard predicate lands BEFORE the ordinal window, so
    // it pushes to the scan and the ranking only ever sees one shard's
    // prefix (orderBy+limit → TakeOrderedAndProject, as el_consume_offset).
    "el_consume_shard" -> Q(
      """WITH log AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value,
        |         ROW_NUMBER() OVER (ORDER BY CAST(ts AS TIMESTAMP), event_id) - 1 AS log_offset
        |  FROM events WHERE event_id % 4 = 2)
        |SELECT CAST(2 AS INTEGER) AS shard, log_offset, event_id, ts, event_type, value
        |FROM log WHERE log_offset >= 5 AND log_offset < 10 ORDER BY log_offset""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(pmod(col("event_id"), lit(4)) === 2)
        .orderBy(logOrder: _*).limit(10)
        .withColumn("log_offset", row_number().over(Window.orderBy(logOrder: _*)) - 1L)
        .filter(col("log_offset") >= 5 && col("log_offset") < 10)
        .select(lit(2).cast("int").as("shard"), col("log_offset"), col("event_id"),
                col("ts"), col("event_type"), col("value"))
        .orderBy("log_offset")
    },

    // R10: publish acks — log cardinality + bounds (the broker acks every
    // append, /root/reference/src/broker/main.rs:100-108).
    "el_publish_ack_count" -> Q(
      """SELECT COUNT(*) AS n_events,
        |       MIN(event_id) AS min_id, MAX(event_id) AS max_id,
        |       COUNT(DISTINCT event_type) AS n_types
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        countDistinct(col("event_type")).as("n_types"))
    },

    // R7: round-robin partitioner — event i → broker i % 4 (4 broker
    // replicas, kubernetes/deployments/broker-deployment.yaml:10; choice at
    // /root/reference/src/producer/main.rs:196). Balance property: the
    // per-broker counts differ by ≤ 1.
    "el_roundrobin_counts" -> Q(
      """SELECT CAST(event_id % 4 AS BIGINT) AS broker,
        |       COUNT(*) AS n_events,
        |       MIN(event_id) AS first_id, MAX(event_id) AS last_id
        |FROM events GROUP BY 1 ORDER BY broker""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(pmod(col("event_id"), lit(4)).cast("long").as("broker"))
        .agg(count(lit(1)).as("n_events"),
             min(col("event_id")).as("first_id"),
             max(col("event_id")).as("last_id"))
        .orderBy("broker")
    },

    // First aggregation over the `number` measurement channel
    // (/root/reference/src/producer/main.rs:215 — "where the cpu usage will
    // go"): per-type counts and exact sums.
    "el_events_per_type" -> Q(
      s"""SELECT event_type, COUNT(*) AS n_events,
         |       ${duckDsum("value")} AS sum_value,
         |       ${duckDavg("value")} AS avg_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
             dsum(col("value")).as("sum_value"),
             davg(col("value")).as("avg_value"))
        .orderBy("event_type")
    },

    // Top-k users by total value — windowless top-k (TakeOrderedAndProject).
    "el_topk_users" -> Q(
      s"""SELECT user_id, COUNT(*) AS n_events, ${duckDsum("value")} AS total_value
         |FROM events GROUP BY user_id
         |ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .orderBy(col("total_value").desc, col("user_id"))
        .limit(10)
    },

    // Batch equivalent of the streaming tumbling window (5-minute buckets);
    // bucket key kept as epoch seconds (BIGINT) for engine-neutral output.
    "el_tumbling_counts" -> Q(
      s"""SELECT (epoch_ns(ts) // 1000000000 // 300) * 300 AS bucket_sec,
         |       COUNT(*) AS n_events, ${duckDsum("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY bucket_sec""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy((expr("unix_seconds(ts) div 300") * 300).as("bucket_sec"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy("bucket_sec")
    },

    // Sessionization (gaps-and-islands): a new session starts after a
    // >30-minute silence per user. Batch twin of the streaming
    // session_window; integer arithmetic only, so exactly portable.
    "el_sessionize" -> Q(
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus FROM events),
        |g AS (
        |  SELECT user_id, event_id, tus,
        |         CASE WHEN tus - LAG(tus) OVER w > 1800000000 OR LAG(tus) OVER w IS NULL
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (
        |  SELECT user_id, event_id, tus,
        |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       COUNT(*) AS n_events,
        |       MIN(tus) AS start_us, MAX(tus) AS end_us,
        |       MAX(tus) - MIN(tus) AS duration_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
      val w  = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
        .withColumn("is_new",
          when(col("tus") - lag(col("tus"), 1).over(w) > 1800000000L, 1)
            .when(lag(col("tus"), 1).over(w).isNull, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(wr).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
             min(col("tus")).as("start_us"),
             max(col("tus")).as("end_us"),
             (max(col("tus")) - min(col("tus"))).as("duration_us"))
        .orderBy("user_id", "session_id")
    },

    // Time-series resample + forward fill: a fixed daily grid per user
    // (sequence → explode), left join of daily aggregates, gaps filled
    // with the last observation (IGNORE NULLS window) — the standard
    // telemetry densification over the reference's cpu-usage channel.
    "el_resample_ffill" -> Q(
      s"""WITH days AS (
         |  SELECT unnest(generate_series(TIMESTAMP '2024-01-05 00:00:00',
         |                                TIMESTAMP '2024-01-25 00:00:00',
         |                                INTERVAL 1 DAY)) AS day),
         |users AS (SELECT DISTINCT user_id FROM events),
         |daily AS (
         |  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         |         ${duckDavg("value")} AS day_avg
         |  FROM events GROUP BY 1, 2),
         |grid AS (SELECT u.user_id, d.day FROM users u CROSS JOIN days d)
         |SELECT g.user_id, g.day, daily.day_avg,
         |       last_value(daily.day_avg IGNORE NULLS)
         |         OVER (PARTITION BY g.user_id ORDER BY g.day
         |               ROWS UNBOUNDED PRECEDING) AS filled
         |FROM grid g LEFT JOIN daily
         |  ON g.user_id = daily.user_id AND g.day = daily.day
         |ORDER BY g.user_id, g.day""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(davg(col("value")).as("day_avg"))
      val days = s.range(1).select(explode(sequence(
        lit("2024-01-05 00:00:00").cast("timestamp"),
        lit("2024-01-25 00:00:00").cast("timestamp"),
        expr("INTERVAL 1 DAY"))).as("day"))
      val users = Tables.events(s, d).select("user_id").distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      users.crossJoin(broadcast(days))
        .join(daily, Seq("user_id", "day"), "left_outer")
        .withColumn("filled", last(col("day_avg"), ignoreNulls = true).over(w))
        .select("user_id", "day", "day_avg", "filled")
        .orderBy("user_id", "day")
    },

    // R13: timestamp render — proto Timestamp → RFC3339 string
    // (/root/reference/src/broker/main.rs:36-48), as a per-type latest-event
    // report.
    "el_ts_render" -> Q(
      """SELECT event_type,
        |       strftime(MAX(CAST(ts AS TIMESTAMP)), '%Y-%m-%dT%H:%M:%S+00:00') AS latest_rfc3339,
        |       COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        // session TZ is pinned UTC, so the offset is the literal +00:00
        // (Spark's XXX would render zero offset as "Z", DuckDB has no XXX)
        .agg(date_format(max(col("ts")), "yyyy-MM-dd'T'HH:mm:ss'+00:00'").as("latest_rfc3339"),
             count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }
  )
}
