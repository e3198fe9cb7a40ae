package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

/** R9 synthetic generator (rate source → event schema) + R14 topic drop. */
class SyntheticSpec extends SparkSpec {

  test("synthetic generator emits the reference's ten event names round-robin") {
    val q = EventStream.synthetic(spark, rowsPerSecond = 500)
      .writeStream.format("memory").queryName("synth").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("synth-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      var waited = 0
      while (spark.table("synth").count() < 20 && waited < 20) {
        Thread.sleep(500); q.processAllAvailable(); waited += 1
      }
    } finally q.stop()
    val rows = spark.table("synth")
    assert(rows.count() >= 20)
    // names cycle a..j keyed by event_id, payloads deterministic
    val bad = rows.filter(
      element_at(typedLit(('a' to 'j').map(_.toString)),
        pmod(col("event_id"), lit(10)).cast("int") + 1) =!= col("event_type"))
    assert(bad.count() === 0)
    assert(rows.filter(col("value") < 0 || col("value") >= 10000).count() === 0)
  }

  test("dropTopic removes the topic (reference's dead remove, alive here)") {
    val root = Files.createTempDirectory("drop").toString
    val c    = new Cascade(spark, root)
    c.publish("gone", Tables.events(spark, sf).limit(10))
    assert(c.topics() === Seq("gone"))
    c.dropTopic("gone")
    assert(c.topics() === Seq.empty)
    intercept[IllegalArgumentException](c.dropTopic("gone"))
  }
}
