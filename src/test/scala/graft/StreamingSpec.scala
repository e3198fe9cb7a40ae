package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

/** Streaming layer verified by batch equivalence (SURVEY.md §7.2.2): the
  * same computation through the streaming path (AvailableNow triggers,
  * real checkpoints, memory/file sinks) must match its batch twin.
  */
class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Copy sf events into a topic dir as several files so
    * maxFilesPerTrigger exercises multiple micro-batches. */
  private def seedTopic(): String = {
    val dir = tmp("topic") + "/t"
    Tables.events(spark, sf).repartition(4)
      .write.parquet(dir)
    dir
  }

  private def runToMemory(df: DataFrame, name: String, mode: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", tmp(s"ckpt-$name"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("tumbling window stream matches batch aggregation") {
    val topic = seedTopic()
    runToMemory(EventStream.tumblingCounts(EventStream.ingest(spark, topic, 1)),
                "tumbling", "complete")
    val got = spark.table("tumbling")
      .select(col("bucket_start"), col("event_type"), col("n_events"))
    val want = Tables.events(spark, sf)
      .groupBy(timestamp_seconds(expr("unix_seconds(ts) div 300") * 300).as("bucket_start"),
               col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("session windows stream matches batch gaps-and-islands sessionization") {
    val topic = seedTopic()
    runToMemory(EventStream.sessionCounts(EventStream.ingest(spark, topic, 2)),
                "sessions", "complete")
    // batch twin: el_sessionize (already oracle-checked) — compare
    // (user_id, n_events) multiset of sessions
    val got  = spark.table("sessions").select(col("user_id"), col("n_events"))
    val want = SparkEntry.queries("el_sessionize")(spark, sf)
      .select(col("user_id"), col("n_events"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // exact-semantics twin: el_session_window is the SAME operator
    // (session_window) in batch, so the full session INTERVALS must
    // match row for row, not just the count multiset
    val gotFull = spark.table("sessions")
      .select(col("user_id"), col("n_events"),
              unix_micros(col("session_start")).as("start_us"),
              unix_micros(col("session_end")).as("end_us"))
    val wantFull = SparkEntry.queries("el_session_window")(spark, sf)
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
    assert(gotFull.exceptAll(wantFull).isEmpty && wantFull.exceptAll(gotFull).isEmpty)
  }

  test("streaming dedup drops replayed events") {
    val dir = tmp("dup") + "/t"
    val ev  = Tables.events(spark, sf).limit(300)
    ev.union(ev).repartition(3).write.parquet(dir) // every event twice
    runToMemory(EventStream.dedupStream(EventStream.ingest(spark, dir, 1))
                  .select("event_id"), "dedup", "append")
    assert(spark.table("dedup").count() === 300)
    assert(spark.table("dedup").distinct().count() === 300)
  }

  test("publishStream is exactly-once under checkpoint replay") {
    val src   = seedTopic()
    val out   = tmp("out") + "/t"
    val ckpt  = tmp("ckpt-pub")
    val total = Tables.events(spark, sf).count()
    EventStream.publishStream(EventStream.ingest(spark, src, 2), out, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(out).count() === total)
    // restart with the same checkpoint and no new source files → no dupes
    EventStream.publishStream(EventStream.ingest(spark, src, 2), out, ckpt)
      .awaitTermination()
    assert(spark.read.parquet(out).count() === total)
  }

  test("offsetTracker final state matches batch per-type counts") {
    val topic = seedTopic()
    val tracked = EventStream.offsetTracker(
      EventStream.typed(EventStream.ingest(spark, topic, 2)))
    runToMemory(tracked.toDF(), "progress", "update")
    // last update per type is the committed state
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("n_consumed").desc)
    val finalState = spark.table("progress")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_type"), col("n_consumed"), col("max_event_id"))
    val want = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_consumed"), max(col("event_id")).as("max_event_id"))
    assert(finalState.exceptAll(want).isEmpty && want.exceptAll(finalState).isEmpty)
  }
}
