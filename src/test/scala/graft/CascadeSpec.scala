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

  test("consumer group: commit, restart, resume from committed, lag reported") {
    val root = Files.createTempDirectory("cascade-group").toString
    val c    = new Cascade(spark, root)
    c.publish("t", Tables.events(spark, sf).limit(20))

    // new group starts at 0; poll does NOT advance the position
    assert(c.poll("g1", "t", 5).collect().map(_.getAs[Long]("offset")).toSeq ===
      (0L until 5L))
    assert(c.poll("g1", "t", 5).collect().map(_.getAs[Long]("offset")).toSeq ===
      (0L until 5L), "poll must not auto-commit")

    // commit after processing (Kafka semantics: next offset to read)
    c.commitOffset("g1", "t", 5)
    val lag1 = c.lag("g1", "t").head()
    assert(lag1.getAs[Long]("committed_next") === 5L)
    assert(lag1.getAs[Long]("high_water_mark") === 19L)
    assert(lag1.getAs[Long]("lag") === 15L)

    // RESTART: a fresh client on the same root resumes from the commit
    val c2 = new Cascade(spark, root)
    assert(c2.poll("g1", "t", 5).collect().map(_.getAs[Long]("offset")).toSeq ===
      (5L until 10L), "restarted consumer must resume from the committed position")
    // groups are independent; seek rewinds durably
    assert(c2.poll("g2", "t", 3).collect().map(_.getAs[Long]("offset")).toSeq ===
      (0L until 3L))
    c2.seek("g1", "t", 2)
    assert(c2.poll("g1", "t", 2).collect().map(_.getAs[Long]("offset")).toSeq ===
      (2L until 4L))
    // a commit beyond the head fails loudly
    intercept[IllegalArgumentException] { c2.commitOffset("g1", "t", 99) }
    // group state is control plane, not a topic
    assert(c2.topics() === Seq("t"))
  }

  test("consumer group on a sharded topic: per-shard positions and lag") {
    val root = Files.createTempDirectory("cascade-group-sh").toString
    val c    = new Cascade(spark, root)
    Topic.publishPartitioned(Tables.events(spark, sf).limit(40), s"$root/t", shards = 2)

    val hwms = spark.read.parquet(s"$root/t").groupBy("shard")
      .agg(max(col("offset")).as("hwm")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    c.commitOffset("g", "t", 4, shard = Some(0))
    c.commitOffset("g", "t", 7, shard = Some(1))
    // poll addresses (shard, offset) like a Kafka partition read
    assert(c.poll("g", "t", 2, shard = Some(0)).collect()
      .map(_.getAs[Long]("offset")).toSeq === Seq(4L, 5L))
    val lags = c.lag("g", "t").collect()
      .map(r => r.getAs[Int]("shard") ->
        ((r.getAs[Long]("committed_next"), r.getAs[Long]("lag")))).toMap
    assert(lags(0) === ((4L, hwms(0) + 1L - 4L)))
    assert(lags(1) === ((7L, hwms(1) + 1L - 7L)))
  }

  test("retention past a group's commit: poll resets to earliest, Kafka-style") {
    val root = Files.createTempDirectory("cascade-reset").toString
    val c    = new Cascade(spark, root)
    c.publish("t", Tables.events(spark, sf).limit(30))
    c.commitOffset("g", "t", 5)
    // retention expires offsets 0..19 while the group is away
    Topic.retain(spark, s"$root/t", maxEvents = Some(10L))
    // committed 5 now points below the earliest retained offset (20):
    // poll must resume from the earliest survivor, not return empty
    val got = c.poll("g", "t", 4).collect().map(_.getAs[Long]("offset")).toSeq
    assert(got === (20L until 24L),
      s"poll after retention should reset to the earliest retained offset, got $got")
    // lag still reports against the live head
    assert(c.lag("g", "t").head().getAs[Long]("high_water_mark") === 29L)
    // an in-range commit is unaffected by the reset rule
    c.commitOffset("g", "t", 25)
    assert(c.poll("g", "t", 2).collect().map(_.getAs[Long]("offset")).toSeq ===
      Seq(25L, 26L))
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
