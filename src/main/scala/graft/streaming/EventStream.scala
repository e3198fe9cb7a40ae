package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming over cascade topics (SURVEY.md §2.A rows R1-R3,
  * R8, R10-R11).
  *
  * Mapping from the reference:
  *   - HTTP ingress + 1000-slot ring buffer + drain loop
  *     (/root/reference/src/producer/main.rs:26-106) → a rate-limited file
  *     source: `maxFilesPerTrigger` is the admission control, the
  *     micro-batch trigger is the drain loop.
  *   - broker append + ack (main.rs:85-110) → `writeStream` parquet append
  *     with a checkpoint; the checkpoint's offset log IS the index.table
  *     analogue, and epoch commit is the ack — upgraded from the
  *     reference's at-most-once (it never fsyncs) to exactly-once.
  *   - consumer-group state (absent in the reference — no committed
  *     offsets anywhere) → `flatMapGroupsWithState` progress tracker.
  *
  * Event time: `events.ts` is ns in the driver corpus; streamed as long
  * nanos and truncated to µs TimestampType, same as Tables.events, so
  * watermarks and windows agree with the batch twins
  * (EventLogQueries.el_tumbling_counts / el_sessionize).
  */
object EventStream {

  /** File schema of a topic directory — topics are written by this engine
    * (Topic.publish / publishStream), so ts is a regular µs timestamp; the
    * driver corpus's ns quirk is handled once at Tables.events. */
  val topicSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Rate-limited streaming ingest of a topic directory (R1+R2+R3). */
  def ingest(spark: SparkSession, topicDir: String, maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .schema(topicSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(topicDir)

  /** Tumbling 5-minute per-type aggregation with a 10-minute watermark —
    * the streaming twin of el_tumbling_counts. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** Streaming count-min sketch: the D×W counter grid of
    * el_cms_counts maintained INCREMENTALLY — each event fans out to
    * its D (d, cell) coordinates (same shared hash family:
    * StatsQueries.withCmsCells, so batch and stream cannot drift) and
    * a streaming aggregation keeps the counters. State is bounded at
    * D·W rows no matter how long the stream runs — the reason a sketch
    * (not an exact per-key count) is what you keep over an unbounded
    * stream. StatsSpec proves the streamed grid answers point queries
    * identically to the batch oracle-checked estimates. */
  def cmsCells(events: DataFrame): DataFrame =
    graft.queries.StatsQueries.withCmsCells(events.select(col("user_id")), "user_id")
      .groupBy("d", "cell")
      .agg(count(lit(1)).as("cnt"))

  /** Streaming daily HLL registers: the per-(day, reg) max-rank table of
    * el_hll_sliding maintained INCREMENTALLY (same shared coordinate
    * function: PortableHll.registerCoords, so batch and stream cannot
    * drift). State is bounded at days×64 rows regardless of stream
    * length — the mergeable-sketch pattern: a reader max-merges any
    * window of days from this table without ever rescanning events.
    * AnalyticsSpec proves streamed registers ≡ the batch register table
    * and that window estimates merged from them match the declared
    * query. */
  def hllRegisters(events: DataFrame): DataFrame =
    graft.functions.PortableHll.registerCoords(
        events.select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id")),
        col("user_id"))
      .groupBy("day", "reg")
      .agg(max(col("rk")).as("mreg"))

  /** Streaming value histogram: per-(type, fixed-width bin) counts
    * maintained incrementally — the mergeable-histogram half of
    * el_quantile_sketch for unbounded streams. Fixed ABSOLUTE bin width
    * (default $10 = 1000 cents), not data-dependent bounds: a stream
    * has no final min/max, and fixed-width cells merge across time,
    * partitions, and restarts by count addition. State is bounded by
    * the value range over the width, independent of stream length; a
    * reader gets any quantile by cumulative-summing the grid (the same
    * read-off AnalyticsSpec performs against the batch exact). FLOOR
    * division, not truncating div: negative cents must fall in negative
    * bins, or bin 0 silently spans two widths. Cents come from the
    * shared Portable.cents so batch and stream cannot drift. */
  def valueHistogram(events: DataFrame, binCents: Long = 1000L): DataFrame =
    events
      .select(col("event_type"),
              graft.functions.Portable.cents(col("value")).as("c"))
      .select(col("event_type"),
              expr(s"c div $binCents" +
                   s" + (CASE WHEN c % $binCents < 0 THEN -1 ELSE 0 END)").as("bin"))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("cnt"))

  /** Sliding windows: 10-minute windows every 5 minutes — each event
    * lands in two panes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("pane_start"), col("event_type"), col("n_events"))

  /** Session windows (30-minute gap) per user — streaming twin of
    * el_sessionize. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"))

  /** Streaming exact dedup on event_id, state bounded by the watermark. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Durable publish (R10): append to the topic dir, exactly-once via the
    * checkpoint (the reference's events.log + index.table, minus the
    * data-loss bugs). The topic's schema-evolution contract is enforced
    * ONCE at start — a streaming query's schema is fixed for its
    * lifetime, so the one check covers every micro-batch; without it
    * this sink would be the hole through which a dropped/retyped column
    * silently corrupts the log that Topic.publish rejects loudly. */
  def publishStream(events: DataFrame, topicDir: String, checkpointDir: String,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    graft.Topic.checkSchemaCompatible(events.sparkSession, topicDir, events.schema)
    events.writeStream
      .format("parquet")
      .option("path", topicDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(trigger)
      .start()
  }

  /** Stream-static enrichment: the event stream joined to a broadcast
    * dimension (events.user_id ↔ customer.c_custkey). The static side is
    * re-read per micro-batch by Spark; broadcasting keeps the stream side
    * shuffle-free — the standard shape for dimension joins at scale. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
      broadcast(dim.select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
      col("user_id") === col("c_custkey"), "left_outer")
      .drop("c_custkey")

  /** R9: the synthetic event generator — the reference producer emits the
    * ten events "a".."j" with random i32 payloads
    * (/root/reference/src/producer/main.rs:185-216). Spark-first: the
    * `rate` source provides the unbounded sequence; names cycle through
    * the same ten letters and the payload is a DETERMINISTIC pseudo-random
    * (md5-derived) value, so tests and oracles stay reproducible where
    * the reference used `rng.gen()`.
    */
  def synthetic(spark: SparkSession, rowsPerSecond: Int = 100): DataFrame = {
    val names = typedLit((0 until 10).map(i => ('a' + i).toChar.toString))
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load() // (timestamp, value)
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        pmod(col("value"), lit(15)).as("user_id"),
        element_at(names, pmod(col("value"), lit(10)).cast("int") + 1).as("event_type"),
        (conv(substring(md5(col("value").cast("string")), 1, 8), 16, 10)
          .cast("long") % 10000).cast("double").as("value"),
        lit("{}").as("props"))
  }

  /** Stream-stream join: two event streams correlated per user within a
    * 30-minute event-time band. Both sides carry watermarks so the join
    * state is bounded — late rows beyond the watermark are dropped and
    * matched state is evicted once the band can no longer match.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       band: String = "30 minutes",
                       joinType: String = "inner"): DataFrame = {
    val l = left.select(col("user_id").as("l_user"), col("event_id").as("l_event"),
                        col("ts").as("l_ts"), col("event_type").as("l_type"))
      .withWatermark("l_ts", band)
    val r = right.select(col("user_id").as("r_user"), col("event_id").as("r_event"),
                         col("ts").as("r_ts"), col("event_type").as("r_type"))
      .withWatermark("r_ts", band)
    // joinType "left_outer"/"full_outer": unmatched rows surface with
    // nulls ONLY once the watermark proves their band can no longer
    // match — the outer result is watermark-delayed by construction,
    // which is why a terminating run emits null rows for expired windows
    // but holds the final in-flight window open (StreamJoinSpec pins
    // both outer variants against their batch twins)
    l.join(r,
      col("l_user") === col("r_user") &&
      col("r_ts") >= col("l_ts") &&
      col("r_ts") <= col("l_ts") + expr(s"INTERVAL $band") &&
      col("l_event") =!= col("r_event"),
      joinType)
  }

  /** foreachBatch sink: per-micro-batch dedup then ordered append through
    * the Topic layer — the ad-hoc sink escape hatch. Topic.publish is an
    * APPEND (not idempotent), so replay of an epoch whose publish landed
    * but whose checkpoint didn't commit would duplicate events; an epoch
    * marker written AFTER the publish makes the common retry a no-op. A
    * crash between publish and marker still replays (the residual
    * at-least-once window — closing it needs an atomic rename of data +
    * marker together); exact-once publish without custom batch logic is
    * `publishStream` (the file-sink commit protocol).
    */
  def mergePublish(events: DataFrame, topicDir: String, checkpointDir: String,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // markers are scoped to the CHECKPOINT LINEAGE, not just the epoch id:
    // epoch ids restart at 0 for every fresh checkpoint, so a bare
    // `_epoch_<id>` marker left by an earlier stream into the same topic
    // would silently swallow the first batches of a new one (data loss,
    // not dedup). A digest of the checkpoint path tags each lineage;
    // restarts of the SAME checkpoint still dedup their replays.
    val lineage = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    events.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val (hfs, _) = graft.Topic.fs(batch.sparkSession, topicDir)
        val marker =
          new org.apache.hadoop.fs.Path(topicDir, s"_epoch_${lineage}_$epochId")
        if (!hfs.exists(marker)) {
          graft.Topic.publish(batch.dropDuplicates("event_id"), topicDir)
          hfs.create(marker, true).close()
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Exactly-once stream→topic publish through the IDEMPOTENT PRODUCER:
    * the checkpoint lineage is the producer id and the epoch id is the
    * producer sequence, so a replayed micro-batch is dropped by the
    * (pid, seq) ledger IN the log itself. This closes [[mergePublish]]'s
    * one remaining window — its publish-then-marker pair can crash in
    * between and duplicate the batch on replay, while here the dedup
    * state is the appended batch (nothing to tear apart), exactly
    * Kafka's argument for sequencing in the log rather than beside it.
    * Epoch ids from one checkpoint are gapless (foreachBatch runs for
    * every executed epoch, empty or not), matching the producer's
    * gapless-sequence contract; a NEW checkpoint is a new producer id,
    * so restarting fresh never collides with the old lineage's ledger.
    */
  def publishExactlyOnce(events: DataFrame, topicDir: String, checkpointDir: String,
                         trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val producerId = "stream-" + java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    events.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.Topic.publishIdempotent(batch, topicDir, producerId, epochId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  // ---- consumer-group progress (typed stateful op) ------------------------

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double, props: String)

  /** Per-type consumer progress: committed count + high-water event id. */
  final case class TypeProgress(event_type: String, n_consumed: Long, max_event_id: Long)

  /** The committed-offset tracking the reference's consumer never does
    * (it re-fetches by explicit offset each call,
    * /root/reference/src/consumer/main.rs:20-28): running state per
    * event_type via flatMapGroupsWithState.
    */
  def offsetTracker(events: Dataset[Event]): Dataset[TypeProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[TypeProgress, TypeProgress](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Event], state: GroupState[TypeProgress]) =>
          val prev = state.getOption.getOrElse(TypeProgress(key, 0L, -1L))
          var n    = prev.n_consumed
          var mx   = prev.max_event_id
          rows.foreach { e => n += 1; if (e.event_id > mx) mx = e.event_id }
          val next = TypeProgress(key, n, mx)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Typed view of an event stream/batch for the stateful ops. */
  def typed(events: DataFrame): Dataset[Event] = {
    import events.sparkSession.implicits._
    events.select("event_id", "ts", "user_id", "event_type", "value", "props").as[Event]
  }
}
