package graft

import java.nio.file.Files
import graft.plans.AsOf
import graft.streaming.AsOfStreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The stream-stream as-of join: (1) end state ≡ the native batch
  * [[graft.plans.AsOf.join]] on the fixture, with both sides arriving as
  * multi-batch file streams; (2) the incremental schedule — watermark-
  * gated emission, timeout flush for quiet keys, unmatched-left nulls —
  * pinned on a crafted MemoryStream timeline. */
class AsOfStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("stream end state equals the native batch as-of join") {
    val ev = Tables.events(spark, sf)
    val lBatch = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("key"), col("ts").as("t"), col("event_id").as("id"))
    val rBatch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("key"), col("ts").as("t"),
        col("event_id").as("id"), col("value"))

    val lDir = Files.createTempDirectory("asof-ss-l").toString + "/t"
    val rDir = Files.createTempDirectory("asof-ss-r").toString + "/t"
    lBatch.repartition(2).write.parquet(lDir)
    rBatch.repartition(2).write.parquet(rDir)

    // two sentinel right rows (key -1: matchable by nothing) written with
    // LATER mtimes, so maxFilesPerTrigger=1 processes them last: the first
    // raises the watermark past every fixture row, the second's batch then
    // runs under that watermark and flushes every pending left
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    def sentinel(daysAhead: Long) = Seq(
      (-1L, new java.sql.Timestamp(maxTs.getTime + daysAhead * 86400000L), -1L, 0.0)
    ).toDF("key", "t", "id", "value")
    Thread.sleep(1100)
    sentinel(4000).coalesce(1).write.mode("append").parquet(rDir)
    Thread.sleep(1100)
    sentinel(8000).coalesce(1).write.mode("append").parquet(rDir)

    def src(dir: String, schema: org.apache.spark.sql.types.StructType) =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir)

    // 3650-day delay: the watermark stays below every fixture timestamp
    // until the sentinels land, so no fixture row is ever late no matter
    // how the two sources' files interleave across batches
    val q = AsOfStreamJoin.join(
        src(lDir, lBatch.schema), src(rDir, rBatch.schema), delay = "3650 days")
      .writeStream.format("memory").queryName("asof_ss")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("asof-ss-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("asof_ss")

    val want = AsOf.join(
        lBatch,
        rBatch.select(col("key").as("rk"), col("t").as("rt"),
          col("id").as("rid"), col("value").as("rv")),
        Seq("key"), Seq("rk"), "t", "rt", rightTieBreak = Seq("rid"))
      .select(col("key"), col("id").as("left_id"),
        unix_micros(col("t")).as("left_tus"),
        col("rid").as("match_id"), unix_micros(col("rt")).as("match_tus"),
        col("rv").as("match_value"))

    assert(got.count() === lBatch.count(), "every left row must emit exactly once")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.filter(col("match_id").isNotNull).count() > 0, "fixture too sparse")
    assert(got.filter(col("match_id").isNull).count() > 0,
      "fixture should include unmatched lefts")
  }

  test("incremental schedule: watermark gates emission, timeouts flush quiet keys") {
    implicit val ctx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

    val ls = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rs = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val q = AsOfStreamJoin.join(
        ls.toDF().toDF("key", "t", "id"), rs.toDF().toDF("key", "t", "id", "value"),
        delay = "5 seconds")
      .writeStream.format("memory").queryName("asof_inc")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("asof-inc-ckpt").toString)
      .start()
    def sync(): Unit = q.processAllAvailable()
    def rows(): Set[(Long, Long, Option[Long])] =
      spark.table("asof_inc").collect().map { r =>
        (r.getAs[Long]("key"), r.getAs[Long]("left_id"),
         Option(r.getAs[java.lang.Long]("match_id")).map(_.toLong))
      }.toSet
    // timeout flushes ride no-data micro-batches, which processAllAvailable
    // does not wait for — poll briefly for those assertions
    def eventually(want: Set[(Long, Long, Option[Long])]): Unit = {
      val deadline = System.nanoTime() + 15000000000L
      while (rows() != want && System.nanoTime() < deadline) Thread.sleep(100)
      assert(rows() === want)
    }

    // a left probe at 15s buffers (watermark unset -> 15-5=10s after)
    ls.addData((1L, ts(15), 500L))
    sync()
    assert(rows() === Set.empty, "emission before the watermark passes is a leak")

    // rights at 11s/20s land (both above the 10s watermark, so on time);
    // the left still cannot emit — the watermark (15s after this batch)
    // has not strictly passed it, and more 11..15s rights could arrive
    rs.addData((1L, ts(11), 100L, 1.0), (1L, ts(20), 101L, 2.0))
    sync()
    assert(rows() === Set.empty,
      "a left at the watermark boundary emitted before its history was sealed")

    // data on an UNRELATED key pushes the watermark to 40-5=35s; key 1 gets
    // no new data, so its left must flush via its event-time TIMEOUT,
    // matching the 11s right (greatest <= 15s), NOT the 20s one
    rs.addData((9L, ts(40), 900L, 0.0))
    sync()
    eventually(Set((1L, 500L, Some(100L))))

    // a left at 50s arrives above the 35s watermark: buffers (and moves
    // the watermark to 45s); a right at 47s arrives for the same key —
    // on time, but nothing may emit until the watermark passes 50s
    ls.addData((1L, ts(50), 501L))
    sync()
    rs.addData((1L, ts(47), 102L, 3.0))
    sync()
    assert(rows() === Set((1L, 500L, Some(100L))),
      "a left above the watermark emitted early")

    // watermark to 55s: the 50s left flushes against the 47s right. This
    // also proves retention: at the earlier timeout (wm=35s) eviction kept
    // the 20s right as the latest-at-or-below, and 47s then superseded it
    rs.addData((9L, ts(60), 901L, 0.0))
    sync()
    eventually(Set((1L, 500L, Some(100L)), (1L, 501L, Some(102L))))

    // unmatched flush: key 2's only right is at 100s, its left at 70s; when
    // the watermark passes 70s the left emits with nulls, not a late match
    ls.addData((2L, ts(70), 600L))
    sync()
    rs.addData((2L, ts(100), 200L, 9.0))
    sync()
    eventually(Set(
      (1L, 500L, Some(100L)), (1L, 501L, Some(102L)), (2L, 600L, None)))

    q.stop()
  }

  /** Random-wave differential harness: 25 waves of random lefts/rights
    * over 5 keys, arbitrary micro-batch slicing (the engine's default
    * trigger races the adds), sentinel-flushed, compared to the batch
    * native [[AsOf.join]] in the same mode. Wave w draws times from
    * [w*10, w*10+9]s with a 10 s delay, so the watermark after wave w is
    * at most (w*10+9)−10 < (w+1)*10 and no generated row is ever late. */
  private def randomWaveDifferential(seed: Int, name: String,
      forward: Boolean, tolerance: Option[Long]): Unit = {
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(seed)
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

    val ls = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rs = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val q = AsOfStreamJoin.join(
        ls.toDF().toDF("key", "t", "id"), rs.toDF().toDF("key", "t", "id", "value"),
        delay = "10 seconds", forward = forward, tolerance = tolerance)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory(name).toString)
      .start()

    // base offset keeps every generated time strictly above epoch 0 —
    // Spark's initial watermark is 0 ms and the late filter drops rows
    // AT-or-below it, so an epoch-0 row would never enter the operator
    var nextId = 1000L
    val lefts = scala.collection.mutable.ArrayBuffer[(Long, java.sql.Timestamp, Long)]()
    val rights = scala.collection.mutable.ArrayBuffer[(Long, java.sql.Timestamp, Long, Double)]()
    for (w <- 0 until 25) {
      val lw = Seq.fill(rnd.nextInt(4)) {
        nextId += 1
        (rnd.nextInt(5).toLong, ts(1000 + w * 10 + rnd.nextInt(10)), nextId)
      }
      val rw = Seq.fill(rnd.nextInt(4)) {
        nextId += 1
        (rnd.nextInt(5).toLong, ts(1000 + w * 10 + rnd.nextInt(10)), nextId, rnd.nextInt(100).toDouble)
      }
      lefts ++= lw; rights ++= rw
      if (lw.nonEmpty) ls.addData(lw)
      if (rw.nonEmpty) rs.addData(rw)
      if (rnd.nextBoolean()) q.processAllAvailable()
    }
    // two far-future sentinels flush every pending left (key -1 matches
    // nothing); the second's batch runs under the first's watermark
    rs.addData((-1L, ts(100000), -1L, 0.0))
    q.processAllAvailable()
    rs.addData((-1L, ts(200000), -2L, 0.0))
    q.processAllAvailable()

    val got = spark.table(name)
    val want = AsOf.join(
        lefts.toSeq.toDF("key", "t", "id"),
        rights.toSeq.toDF("rk", "rt", "rid", "rv"),
        Seq("key"), Seq("rk"), "t", "rt", rightTieBreak = Seq("rid"),
        forward = forward, tolerance = tolerance)
      .select(col("key"), col("id").as("left_id"),
        unix_micros(col("t")).as("left_tus"),
        col("rid").as("match_id"), unix_micros(col("rt")).as("match_tus"),
        col("rv").as("match_value"))
    val deadline = System.nanoTime() + 15000000000L
    while (spark.table(name).count() < lefts.size && System.nanoTime() < deadline)
      Thread.sleep(100)
    if (got.count() != lefts.size.toLong) {
      System.err.println(s"[$name] missing from stream output:")
      want.exceptAll(got).collect().foreach(r => System.err.println(s"  want $r"))
      got.exceptAll(want).collect().foreach(r => System.err.println(s"  got-extra $r"))
    }
    assert(got.count() === lefts.size.toLong)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the mode must be non-degenerate on this seed: some matched, some not
    assert(got.filter(col("match_id").isNotNull).count() > 0, s"$name: no matches")
    assert(got.filter(col("match_id").isNull).count() > 0, s"$name: no unmatched")
    q.stop()
  }

  test("seeded random waves: any interleaving ends equal to the batch join") {
    randomWaveDifferential(1337, "asof_rnd", forward = false, tolerance = None)
  }

  test("random waves, backward with tolerance: stale matches drop exactly as in batch") {
    randomWaveDifferential(99, "asof_rnd_tol", forward = false,
      tolerance = Some(15000000L)) // 15 s in µs
  }

  test("random waves, forward: smallest in-window right, batch-equal") {
    randomWaveDifferential(7, "asof_rnd_fwd", forward = true,
      tolerance = Some(15000000L))
  }

  test("forward without tolerance is rejected (liveness)") {
    implicit val ctx = spark.sqlContext
    val ls = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rs = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    intercept[IllegalArgumentException] {
      AsOfStreamJoin.join(ls.toDF().toDF("key", "t", "id"),
        rs.toDF().toDF("key", "t", "id", "value"), "10 seconds", forward = true)
    }
  }
}
