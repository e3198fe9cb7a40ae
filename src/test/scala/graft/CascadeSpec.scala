package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

/** The reference-shaped client facade + sliding windows. */
class CascadeSpec extends SparkSpec {

  test("cascade client: publish, consume, metadata round-trip") {
    val root = Files.createTempDirectory("cascade").toString
    val c    = new Cascade(spark, root)
    val ev   = Tables.events(spark, sf).limit(120)
    c.publish("telemetry", ev)
    assert(c.topics() === Seq("telemetry"))
    // the reference consumer's exact call: offset 4, one event back
    val one = c.consume("telemetry", 4).collect()
    assert(one.length === 1 && one.head.getAs[Long]("offset") === 4L)
    // batched consume (proto's repeated Event)
    assert(c.consumeBatch("telemetry", 10, 5).count() === 5)
    // describe = registration record
    val desc = c.describe("telemetry").head()
    assert(desc.getAs[Long]("n_events") === 120L)
    assert(desc.getAs[Long]("high_water_mark") === 119L)
    // consumeSince honors event time: EXACT count of events at/after the
    // cut (a consumeSince that ignored the timestamp would return all
    // 120 and fail)
    val mid = ev.orderBy("ts").limit(60).agg(max(col("ts"))).head().getTimestamp(0)
    val expectedSince = ev.filter(col("ts") >= mid).count()
    assert(expectedSince < 120L)
    assert(c.consumeSince("telemetry", mid).count() === expectedSince)
    // HTTP-ingress datum (ExpressDataToProducer{int32}) appends one event
    c.ingestValue("ingress", 42)
    assert(c.consume("ingress", 0).head().getAs[Double]("value") === 42.0)
  }

  test("sliding windows double-count each event across two panes") {
    val dir = Files.createTempDirectory("slide").toString + "/t"
    Tables.events(spark, sf).limit(400).repartition(2).write.parquet(dir)
    val q = EventStream.slidingCounts(EventStream.ingest(spark, dir, 1))
      .writeStream.format("memory").queryName("sliding").outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-slide").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // every event appears in exactly 2 panes (10-min window, 5-min slide)
    val total = spark.table("sliding").agg(sum(col("n_events"))).head().getLong(0)
    assert(total === 800L)
  }
}
