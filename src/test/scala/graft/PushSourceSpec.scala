package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.push.PushBuffers

/** The DSv2 push source: events pushed from application code must appear
  * in a RUNNING streaming query (the reference's HTTP→ring→drain path),
  * and the ring must reject with ack 0 once full — including after a
  * drain, because slots are never freed (reference semantics).
  */
class PushSourceSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("pushed events appear in a running query; ring rejects when full") {
    val topic = s"push-spec-${System.nanoTime()}"
    PushBuffers.remove(topic)
    val cascade = new Cascade(spark, tmp("cascade-root"))

    val q = cascade.liveStream(topic, capacity = 5)
      .writeStream.format("memory").queryName("push_live")
      .option("checkpointLocation", tmp("ckpt-push"))
      .start()
    try {
      // first wave: 3 accepted pushes visible to the running query
      assert((1 to 3).forall(cascade.ingestLive(topic, _, capacity = 5)))
      q.processAllAvailable()
      val firstWave = spark.table("push_live")
        .select("offset", "data").orderBy("offset")
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(firstWave.toSeq == Seq((0L, 1), (1L, 2), (2L, 3)))

      // second wave while the query is STILL RUNNING: two more fit...
      assert(cascade.ingestLive(topic, 4, capacity = 5))
      assert(cascade.ingestLive(topic, 5, capacity = 5))
      // ...then the ring is full: ack 0, even though the query drained
      // everything (slots are never freed — the reference's own quirk)
      assert(!cascade.ingestLive(topic, 6, capacity = 5))
      q.processAllAvailable()
      val all = spark.table("push_live").select("data").orderBy("data")
        .collect().map(_.getInt(0))
      assert(all.toSeq == Seq(1, 2, 3, 4, 5))
      // the rejected datum never surfaced
      assert(spark.table("push_live").filter(col("data") === 6).isEmpty)
    } finally {
      q.stop()
      PushBuffers.remove(topic)
    }
  }

  test("push source composes with windowed aggregation") {
    val topic = s"push-agg-${System.nanoTime()}"
    PushBuffers.remove(topic)
    val cascade = new Cascade(spark, tmp("cascade-root3"))
    (1 to 20).foreach(v => assert(cascade.ingestLive(topic, v)))
    val q = cascade.liveStream(topic)
      .groupBy(window(col("ts"), "1 minute"), (col("data") % 2 === 0).as("even"))
      .agg(count(lit(1)).as("n"), sum(col("data")).as("total"))
      .writeStream.format("memory").queryName("push_agg")
      .outputMode("complete")
      .option("checkpointLocation", tmp("ckpt-push-agg"))
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("push_agg")
        .groupBy("even").agg(sum("n").as("n"), sum("total").as("total"))
        .collect().map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(rows(true) == (10L, 110L))  // 2+4+...+20
      assert(rows(false) == (10L, 100L)) // 1+3+...+19
    } finally {
      q.stop()
      PushBuffers.remove(topic)
    }
  }

  test("live ring drains into the durable topic via foreachBatch") {
    val topic = s"push-drain-${System.nanoTime()}"
    PushBuffers.remove(topic)
    val root    = tmp("cascade-root2")
    val cascade = new Cascade(spark, root)

    (10 to 12).foreach(v => assert(cascade.ingestLive(topic, v)))
    val q = cascade.liveStream(topic)
      .select(col("offset").as("event_id"), col("ts"),
              lit(0L).as("user_id"), lit("ingress").as("event_type"),
              col("data").cast("double").as("value"), lit("{}").as("props"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Topic.publish(batch, s"$root/$topic")
      }
      .option("checkpointLocation", tmp("ckpt-drain"))
      .start()
    try {
      q.processAllAvailable()
      val drained = cascade.consumeBatch(topic, 0, 10)
        .select("offset", "value").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(drained.toSeq == Seq((0L, 10.0), (1L, 11.0), (2L, 12.0)))
    } finally {
      q.stop()
      PushBuffers.remove(topic)
    }
  }
}
