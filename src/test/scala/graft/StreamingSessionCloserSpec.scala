package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{EventStream, SessionCloser}

/** Timer-driven session closing ≡ the batch session_window aggregation:
  * sessions split mid-stream by the gap rule AND sessions flushed by
  * event-time timers at the watermark both match. */
class StreamingSessionCloserSpec extends SparkSpec {

  test("SessionCloser emits exactly the batch 30-minute gap sessions") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      val evs = Tables.events(spark, sf).limit(600)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .as[EventStream.Event]
        .collect().sortBy(e => (e.ts.getTime, e.event_id))
      val (first, second) = evs.splitAt(evs.length / 2)
      // sentinel: one far-future event advances the GLOBAL watermark so
      // every open session's timer fires; its own session is excluded
      val sentinel = EventStream.Event(-1L,
        new java.sql.Timestamp(evs.map(_.ts.getTime).max + 7L * 24 * 3600 * 1000),
        -1L, "sentinel", 0.0, "{}")

      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[EventStream.Event]
      val q = SessionCloser(mem.toDS().withWatermark("ts", "0 seconds")
          .as[EventStream.Event])
        .toDF().writeStream.format("memory").queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("sc-ckpt").toString)
        .start()
      mem.addData(first.toSeq: _*); q.processAllAvailable()
      mem.addData(second.toSeq: _*); q.processAllAvailable()
      mem.addData(sentinel); q.processAllAvailable()
      // one more empty-ish advance so the sentinel-driven watermark fires timers
      mem.addData(sentinel.copy(event_id = -2L,
        ts = new java.sql.Timestamp(sentinel.ts.getTime + 3600 * 1000)))
      q.processAllAvailable()
      q.stop()

      val got = spark.table("sessions_out")
        .filter(col("user_id") >= 0)
        .select("user_id", "start_us", "end_us", "n_events", "cents")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet

      val gapUs = SessionCloser.GapMs * 1000
      val want = Tables.events(spark, sf).limit(600)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"),
             sum(functions.Portable.cents(col("value"))).as("c"),
             min(unix_micros(col("ts"))).as("first_us"),
             max(unix_micros(col("ts"))).as("last_us"))
        .select(col("user_id"), col("first_us"), col("last_us"), col("n"), col("c"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet

      val extra = got -- want
      val missing = want -- got
      assert(extra.isEmpty && missing.isEmpty,
        s"extra=${extra.take(5)} missing=${missing.take(5)} sizes got=${got.size} want=${want.size}")
      assert(got.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
