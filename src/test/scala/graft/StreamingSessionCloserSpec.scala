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

      // batch twin over the SAME collected rows (an unordered limit()
      // re-evaluated twice is not guaranteed to pick the same 600)
      val want = spark.createDataset(evs.toSeq)(org.apache.spark.sql.Encoders.product)
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

  test("stragglers: in-gap lowers the start; gap-separated chains re-group exactly") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      def ev(id: Long, us: Long): EventStream.Event = {
        val t = new java.sql.Timestamp(us / 1000)
        t.setNanos(((us % 1000000) * 1000).toInt) // full sub-second, not sub-ms
        EventStream.Event(id, t, 77L, "view", 1.0, "{}")
      }
      val base = 1700000000000000L // epoch µs

      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[EventStream.Event]
      // 2h watermark delay keeps the stragglers non-late
      val q = SessionCloser(mem.toDS().withWatermark("ts", "2 hours")
          .as[EventStream.Event])
        .toDF().writeStream.format("memory").queryName("straggler_out")
        .outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("sg-ckpt").toString)
        .start()
      mem.addData(ev(1, base)); q.processAllAvailable()
      // in-gap straggler 5 min BEFORE the open session's start: merges, lowers start
      mem.addData(ev(2, base - 5L * 60 * 1000000)); q.processAllAvailable()
      // two gap-separated stragglers in ONE batch, within the gap of
      // each other (90 and 85 min before): they must chain into a
      // single 2-event session, not two singletons
      mem.addData(ev(3, base - 90L * 60 * 1000000),
                  ev(6, base - 85L * 60 * 1000000)); q.processAllAvailable()
      // push the watermark far ahead to flush the open session
      mem.addData(ev(4, base + 10L * 3600 * 1000000)); q.processAllAvailable()
      mem.addData(ev(5, base + 24L * 3600 * 1000000)); q.processAllAvailable()
      q.stop()

      val got = spark.table("straggler_out")
        .select("start_us", "end_us", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val chained = (base - 90L * 60 * 1000000, base - 85L * 60 * 1000000, 2L)
      val merged = (base - 5L * 60 * 1000000, base, 2L)
      assert(got.contains(chained), s"straggler chain session missing: $got")
      assert(got.contains(merged), s"start-lowered session missing: $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
