package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Consumer-group resume for STREAMING consumption (Kafka's `group.id`
  * semantics on Structured Streaming): `Cascade.streamGroup` commits the
  * group position per epoch, and a replacement consumer with a FRESH
  * checkpoint — the crash case — resumes from the group's committed
  * offset with no duplicates and no loss. */
class StreamingGroupResumeSpec extends SparkSpec {

  private def ev(lo: Int, hi: Int) =
    Tables.events(spark, sf).filter(col("event_id") >= lo && col("event_id") < hi)

  test("crash/restart with a fresh checkpoint resumes from the committed offset — no dup, no loss") {
    val root = Files.createTempDirectory("graft-sgr").toString
    val c = new Cascade(spark, root)
    c.publish("t", ev(0, 25))
    val n1 = c.highWaterMark("t") + 1 // dense offsets ⇒ rows published

    // incarnation 1: consume everything, committing AFTER each epoch
    val seen1 = collection.mutable.ArrayBuffer.empty[Long]
    val q1 = c.streamGroup("g", "t", s"$root/ckpt1") { b: DataFrame =>
      seen1.synchronized {
        seen1 ++= b.select("offset").collect().map(_.getLong(0))
      }
    }
    try { q1.processAllAvailable() } finally q1.stop()
    assert(seen1.sorted.toSeq === (0L until n1))
    assert(c.committedOffsets("g", "t") === Map(-1 -> n1))

    // the consumer is DOWN (checkpoint lost with it); the topic moves on
    c.publish("t", ev(25, 40))
    val n2 = c.highWaterMark("t") + 1

    // incarnation 2: fresh checkpoint — the group offset, not the Spark
    // checkpoint, is the cross-incarnation resume point
    val seen2 = collection.mutable.ArrayBuffer.empty[Long]
    val q2 = c.streamGroup("g", "t", s"$root/ckpt2") { b: DataFrame =>
      seen2.synchronized {
        seen2 ++= b.select("offset").collect().map(_.getLong(0))
      }
    }
    try { q2.processAllAvailable() } finally q2.stop()
    // no loss: every new offset arrives; no dup: none of incarnation 1's
    assert(seen2.sorted.toSeq === (n1 until n2))
    assert(c.committedOffsets("g", "t") === Map(-1 -> n2))

    // exactly-once across both incarnations at the clean-stop boundary
    assert((seen1 ++ seen2).sorted.toSeq === (0L until n2))

    // a DIFFERENT group starting now reads from the beginning — positions
    // are per group, as in Kafka
    val seenG2 = collection.mutable.ArrayBuffer.empty[Long]
    val q3 = c.streamGroup("g2", "t", s"$root/ckpt3") { b: DataFrame =>
      seenG2.synchronized {
        seenG2 ++= b.select("offset").collect().map(_.getLong(0))
      }
    }
    try { q3.processAllAvailable() } finally q3.stop()
    assert(seenG2.sorted.toSeq === (0L until n2))
  }

  test("commit-per-epoch: maxFilesPerTrigger splits the backlog into monotonic committed epochs") {
    val root = Files.createTempDirectory("graft-sgr-ep").toString
    val c = new Cascade(spark, root)
    // three separate publishes → at least three files → with
    // maxFilesPerTrigger=1 the backlog replays as multiple epochs, each
    // committing AFTER its batch processes
    c.publish("t", ev(0, 10)); c.publish("t", ev(10, 20)); c.publish("t", ev(20, 30))
    val total = c.highWaterMark("t") + 1
    // (batch rows, committed position OBSERVED BEFORE this epoch's commit)
    val epochs = collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = c.streamGroup("g", "t", s"$root/ck", maxFilesPerTrigger = Some(1)) { b =>
      val n = b.count()
      epochs.synchronized {
        epochs += ((n, c.committedOffsets("g", "t").getOrElse(-1, 0L)))
      }
    }
    try { q.processAllAvailable() } finally q.stop()
    val nonEmpty = epochs.filter(_._1 > 0)
    assert(nonEmpty.size >= 2, s"expected multiple epochs, got $epochs")
    // positions observed at epoch starts are non-decreasing and each
    // epoch's observed position equals the rows committed so far
    val observed = nonEmpty.map(_._2)
    assert(observed === observed.sorted)
    assert(nonEmpty.map(_._1).sum === total)
    assert(c.committedOffsets("g", "t") === Map(-1 -> total))
  }

  test("sharded topic: per-shard positions commit and resume independently") {
    val root = Files.createTempDirectory("graft-sgr-sh").toString
    val c = new Cascade(spark, root)
    Topic.publishPartitioned(ev(0, 30), s"$root/st", shards = 3)

    val seen1 = collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val q1 = c.streamGroup("g", "st", s"$root/ck1") { b: DataFrame =>
      seen1.synchronized {
        seen1 ++= b.select("shard", "offset").collect()
          .map(r => (r.getInt(0), r.getLong(1)))
      }
    }
    try { q1.processAllAvailable() } finally q1.stop()
    val committed = c.committedOffsets("g", "st")
    // every shard committed its own next offset = its row count (dense per shard)
    val perShard = seen1.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(committed === perShard)

    // restart fresh after more data: only the per-shard deltas arrive
    Topic.publishPartitioned(ev(30, 45), s"$root/st", shards = 3)
    val seen2 = collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val q2 = c.streamGroup("g", "st", s"$root/ck2") { b: DataFrame =>
      seen2.synchronized {
        seen2 ++= b.select("shard", "offset").collect()
          .map(r => (r.getInt(0), r.getLong(1)))
      }
    }
    try { q2.processAllAvailable() } finally q2.stop()
    assert(seen2.forall { case (sh, off) => off >= committed(sh) }, "no redelivery")
    // coverage: union is exactly the full per-shard dense ranges
    val all = (seen1 ++ seen2).groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toSeq).toMap
    val want = c.committedOffsets("g", "st").map { case (sh, n) => sh -> (0L until n) }
    assert(all.view.mapValues(_.toSeq).toMap === want.view.mapValues(_.toSeq).toMap)
  }
}
