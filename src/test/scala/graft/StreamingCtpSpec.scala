package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The STREAMING consume-transform-produce loop — the composition the
  * batch TxnSpec pins ("offsets commit atomically with the data") lifted
  * onto Structured Streaming: read a topic from the GROUP's committed
  * position (`Cascade.readStreamGroup`), transform, publish the result
  * idempotently (`Topic.publishIdempotent` keyed by producer lineage +
  * epoch), commit the group position after the publish. Exactly-once
  * composition: WITHIN an incarnation an epoch replay dedups on
  * (producer_id, epoch); ACROSS incarnations (crash, fresh checkpoint =
  * fresh producer lineage) the group offset is the resume point, so
  * nothing re-reads and nothing is lost at clean-stop boundaries. */
class StreamingCtpSpec extends SparkSpec {

  private def ev(lo: Int, hi: Int) =
    Tables.events(spark, sf).filter(col("event_id") >= lo && col("event_id") < hi)

  test("group resume + idempotent publish: transform lands exactly once across incarnations") {
    val root = Files.createTempDirectory("graft-ctp").toString
    val c = new Cascade(spark, root)
    val dst = s"$root/dst"
    c.publish("src", ev(0, 20))

    // one consumer incarnation: its OWN checkpoint and producer lineage
    def incarnation(tag: String): Unit = {
      val q = c.readStreamGroup("g", "src")
        .writeStream
        .option("checkpointLocation", s"$root/ck-$tag")
        .foreachBatch { (b: DataFrame, epoch: Long) =>
          val out = b.filter(col("event_id") % 2 === 0)
            .withColumn("value2", col("value") * 2)
          if (!out.isEmpty) {
            Topic.publishIdempotent(out, dst, s"ctp-$tag", epoch)
            ()
          }
          c.commitBatch("g", "src", b) // AFTER the produce is durable
        }
        .start()
      try { q.processAllAvailable() } finally q.stop()
    }

    incarnation("one")
    val got1 = spark.read.parquet(dst).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(got1 === (0L until 20L).filter(_ % 2 == 0).toArray)

    // the consumer dies (checkpoint lost); the source moves on
    c.publish("src", ev(20, 35))

    // replacement consumer: fresh checkpoint AND fresh producer lineage —
    // resumes from the group offset, so the first 20 are not re-produced
    incarnation("two")
    val got2 = spark.read.parquet(dst).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(got2 === (0L until 35L).filter(_ % 2 == 0).toArray) // no dup, no loss

    // the produced topic is a real topic: dense offsets, consumable
    val offs = spark.read.parquet(dst).select("offset")
      .collect().map(_.getLong(0)).sorted
    assert(offs === offs.indices.map(_.toLong).toArray)
    // and the transform rode along (schema evolution: value2 is a column)
    assert(spark.read.parquet(dst).columns.contains("value2"))
  }
}
