package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

/** Stream-stream interval join, verified by batch equivalence, plus the
  * facade's admission-control ack. */
class StreamJoinSpec extends SparkSpec {

  test("stream-stream join matches the batch interval join") {
    val dirA = Files.createTempDirectory("ssj-a").toString + "/t"
    val dirB = Files.createTempDirectory("ssj-b").toString + "/t"
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks    = ev.filter(col("event_type") === "click")
    purchases.repartition(2).write.parquet(dirA)
    clicks.repartition(2).write.parquet(dirB)

    // sf0.001 is sparse (~0.4 events/type/user/day): a 24h band keeps the
    // fixture non-degenerate while exercising the same state machinery
    val joined = EventStream.streamStreamJoin(
      EventStream.ingest(spark, dirA, 1), EventStream.ingest(spark, dirB, 1),
      band = "24 hours")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ssj-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssj").select("l_event", "r_event")

    val l = purchases.select(col("user_id").as("lu"), col("event_id").as("l_event"),
                             col("ts").as("lt"))
    val r = clicks.select(col("user_id").as("ru"), col("event_id").as("r_event"),
                          col("ts").as("rt"))
    val want = l.join(r,
        col("lu") === col("ru") && col("rt") >= col("lt") &&
        col("rt") <= col("lt") + expr("INTERVAL 24 HOURS") &&
        col("l_event") =!= col("r_event"))
      .select("l_event", "r_event")
    assert(got.count() > 0, "join produced no pairs — fixture too sparse")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("left-outer stream-stream join: expired windows emit nulls, inner part exact") {
    val dirA = Files.createTempDirectory("ssjo-a").toString + "/t"
    val dirB = Files.createTempDirectory("ssjo-b").toString + "/t"
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks    = ev.filter(col("event_type") === "click")
    purchases.repartition(2).write.parquet(dirA)
    clicks.repartition(2).write.parquet(dirB)
    val joined = EventStream.streamStreamJoin(
      EventStream.ingest(spark, dirA, 1), EventStream.ingest(spark, dirB, 1),
      band = "24 hours", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssjo")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ssjo-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssjo")
    // batch twin
    val l = purchases.select(col("user_id").as("lu"), col("event_id").as("l_event"),
                             col("ts").as("lt"))
    val r = clicks.select(col("user_id").as("ru"), col("event_id").as("r_event"),
                          col("ts").as("rt"))
    val batch = l.join(r,
        col("lu") === col("ru") && col("rt") >= col("lt") &&
        col("rt") <= col("lt") + expr("INTERVAL 24 HOURS") &&
        col("l_event") =!= col("r_event"), "left_outer")
    // inner portion must match the batch inner portion exactly
    val gotInner  = got.filter(col("r_event").isNotNull).select("l_event", "r_event")
    val wantInner = batch.filter(col("r_event").isNotNull).select("l_event", "r_event")
    assert(gotInner.exceptAll(wantInner).isEmpty && wantInner.exceptAll(gotInner).isEmpty)
    // null rows appear ONLY for lefts unmatched in batch, and the
    // watermark-expired windows (30 days of fixture, 24h band) produce some
    val gotNull  = got.filter(col("r_event").isNull).select("l_event")
    val wantNull = batch.filter(col("r_event").isNull).select("l_event")
    assert(gotNull.count() > 0, "no expired-window null rows emitted")
    assert(gotNull.exceptAll(wantNull).isEmpty,
      "stream emitted a null row for a left that HAS a batch match")
    // the stream may hold back nulls still inside the final watermark —
    // never the other way around
    assert(gotNull.count() <= wantNull.count())
  }

  test("full-outer stream-stream join: both sides' unmatched rows surface") {
    val dirA = Files.createTempDirectory("ssjf-a").toString + "/t"
    val dirB = Files.createTempDirectory("ssjf-b").toString + "/t"
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks    = ev.filter(col("event_type") === "click")
    purchases.repartition(2).write.parquet(dirA)
    clicks.repartition(2).write.parquet(dirB)
    val joined = EventStream.streamStreamJoin(
      EventStream.ingest(spark, dirA, 1), EventStream.ingest(spark, dirB, 1),
      band = "24 hours", joinType = "full_outer")
    val q = joined.writeStream.format("memory").queryName("ssjf")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ssjf-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssjf")
    val l = purchases.select(col("user_id").as("lu"), col("event_id").as("l_event"),
                             col("ts").as("lt"))
    val r = clicks.select(col("user_id").as("ru"), col("event_id").as("r_event"),
                          col("ts").as("rt"))
    val batch = l.join(r,
        col("lu") === col("ru") && col("rt") >= col("lt") &&
        col("rt") <= col("lt") + expr("INTERVAL 24 HOURS") &&
        col("l_event") =!= col("r_event"), "full_outer")
    // inner portion exact; null rows on EACH side are a subset of the
    // batch's (the stream holds back windows still inside the final
    // watermark), and both sides actually produced some
    val gotInner  = got.filter(col("l_event").isNotNull && col("r_event").isNotNull)
      .select("l_event", "r_event")
    val wantInner = batch.filter(col("l_event").isNotNull && col("r_event").isNotNull)
      .select("l_event", "r_event")
    assert(gotInner.exceptAll(wantInner).isEmpty && wantInner.exceptAll(gotInner).isEmpty)
    val gotLeftNull  = got.filter(col("r_event").isNull).select("l_event")
    val wantLeftNull = batch.filter(col("r_event").isNull).select("l_event")
    val gotRightNull  = got.filter(col("l_event").isNull).select("r_event")
    val wantRightNull = batch.filter(col("l_event").isNull).select("r_event")
    assert(gotLeftNull.count() > 0 && gotRightNull.count() > 0,
      "full outer emitted no unmatched rows")
    assert(gotLeftNull.exceptAll(wantLeftNull).isEmpty,
      "stream emitted a left-null row for a left that HAS a batch match")
    assert(gotRightNull.exceptAll(wantRightNull).isEmpty,
      "stream emitted a right-null row for a right that HAS a batch match")
  }

  test("left-semi stream-stream join: each matched left row exactly once") {
    val dirA = Files.createTempDirectory("ssjs-a").toString + "/t"
    val dirB = Files.createTempDirectory("ssjs-b").toString + "/t"
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks    = ev.filter(col("event_type") === "click")
    purchases.repartition(2).write.parquet(dirA)
    clicks.repartition(2).write.parquet(dirB)
    val joined = EventStream.streamStreamJoin(
      EventStream.ingest(spark, dirA, 1), EventStream.ingest(spark, dirB, 1),
      band = "24 hours", joinType = "left_semi")
    val q = joined.writeStream.format("memory").queryName("ssjs")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ssjs-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssjs").select("l_event")
    val l = purchases.select(col("user_id").as("lu"), col("event_id").as("l_event"),
                             col("ts").as("lt"))
    val r = clicks.select(col("user_id").as("ru"), col("event_id").as("r_event"),
                          col("ts").as("rt"))
    val want = l.join(r,
        col("lu") === col("ru") && col("rt") >= col("lt") &&
        col("rt") <= col("lt") + expr("INTERVAL 24 HOURS") &&
        col("l_event") =!= col("r_event"), "left_semi")
      .select("l_event")
    assert(got.count() > 0, "semi join produced no rows — fixture too sparse")
    // exactly the batch semi-join multiset: matched lefts once, no dups
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() === got.distinct().count(), "semi join duplicated a left row")
  }

  test("ingestValue acks 0 (false) when the topic backlog is at capacity") {
    val root = Files.createTempDirectory("ack").toString
    val c    = new Cascade(spark, root)
    assert(c.ingestValue("t", 1, capacity = 2))
    assert(c.ingestValue("t", 2, capacity = 2))
    assert(!c.ingestValue("t", 3, capacity = 2)) // ring full → ack 0
    assert(spark.read.parquet(s"$root/t").count() === 2)
  }
}
