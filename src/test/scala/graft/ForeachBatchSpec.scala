package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** foreachBatch merge sink: per-epoch dedup + ordered Topic append. */
class ForeachBatchSpec extends SparkSpec {

  test("mergePublish dedups within each micro-batch and appends through Topic") {
    val src = Files.createTempDirectory("fb-src").toString + "/t"
    val out = Files.createTempDirectory("fb-out").toString + "/t"
    val ev  = Tables.events(spark, sf).limit(200)
    // source contains every event twice IN THE SAME FILE SET
    ev.union(ev).repartition(1).write.parquet(src)
    EventStream.mergePublish(
      EventStream.ingest(spark, src, maxFilesPerTrigger = 8),
      out, Files.createTempDirectory("fb-ckpt").toString)
      .awaitTermination()
    val log = spark.read.parquet(out)
    assert(log.count() === 200)
    assert(log.select("event_id").distinct().count() === 200)
    // offsets assigned by Topic.publish are dense
    assert(log.agg(max(col("offset"))).head().getLong(0) === 199L)
  }

  test("publishExactlyOnce: epoch ids drive the idempotent producer ledger") {
    val src  = Files.createTempDirectory("eo-src").toString + "/t"
    val out  = Files.createTempDirectory("eo-out").toString + "/t"
    val ckpt = Files.createTempDirectory("eo-ckpt").toString
    val ev   = Tables.events(spark, sf)
    ev.filter(col("event_id") < 100).repartition(2).write.parquet(src)
    EventStream.publishExactlyOnce(
      EventStream.ingest(spark, src, maxFilesPerTrigger = 1), out, ckpt)
      .awaitTermination()
    val log = spark.read.parquet(out)
    val n = log.count()
    assert(log.select("event_id").distinct().count() === 100)
    assert(n === 100)
    // the crash-replay contract, at the exact layer a retry hits: a
    // redelivered LAST batch (same producer id, same epoch sequence) is
    // dropped by the in-log ledger — no marker file involved
    val pid = "stream-" + lineageTag(ckpt)
    val lastSeq = log.agg(max(col("producer_seq"))).head().getLong(0)
    assert(!Topic.publishIdempotent(
      ev.filter(col("event_id") < 10), out, pid, lastSeq))
    assert(spark.read.parquet(out).count() === n)
    // restart from the same checkpoint with new source data: the stream
    // continues the sequence, appends exactly the delta, offsets dense
    ev.filter(col("event_id") >= 100 && col("event_id") < 150)
      .write.mode("append").parquet(src)
    EventStream.publishExactlyOnce(
      EventStream.ingest(spark, src, maxFilesPerTrigger = 1), out, ckpt)
      .awaitTermination()
    val log2 = spark.read.parquet(out)
    assert(log2.count() === 150)
    assert(log2.select("event_id").distinct().count() === 150)
    val offs = log2.select("offset").orderBy("offset").collect().map(_.getLong(0)).toSeq
    assert(offs === (0L until 150L))
  }

  private def lineageTag(ckpt: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(ckpt.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  test("epoch markers are checkpoint-lineage scoped: fresh streams are not swallowed, replays are") {
    val ev  = Tables.events(spark, sf)
    val out = Files.createTempDirectory("fb-out2").toString + "/t"
    def run(events: org.apache.spark.sql.DataFrame, ckpt: String): Unit = {
      val src = Files.createTempDirectory("fb-src2").toString + "/t"
      events.repartition(1).write.parquet(src)
      EventStream.mergePublish(
        EventStream.ingest(spark, src, maxFilesPerTrigger = 8), out, ckpt)
        .awaitTermination()
    }
    // stream A into the topic
    run(ev.filter(col("event_id") < 100), Files.createTempDirectory("fb-ck-a").toString)
    assert(spark.read.parquet(out).count() === 100)
    // stream B: FRESH checkpoint, same topic dir — its epoch also numbers
    // 0, so un-scoped markers would silently swallow it (the data-loss
    // bug): all 50 rows must land
    run(ev.filter(col("event_id") >= 100 && col("event_id") < 150),
        Files.createTempDirectory("fb-ck-b").toString)
    assert(spark.read.parquet(out).count() === 150)
    // stream C: its lineage marker already exists (simulated replay of a
    // published-but-uncommitted epoch) — the batch must be SKIPPED
    val ckptC = Files.createTempDirectory("fb-ck-c").toString
    val (hfs, _) = Topic.fs(spark, out)
    hfs.create(new org.apache.hadoop.fs.Path(out, s"_epoch_${lineageTag(ckptC)}_0"), true).close()
    run(ev.filter(col("event_id") >= 150 && col("event_id") < 170), ckptC)
    assert(spark.read.parquet(out).count() === 150) // replayed epoch not re-published
  }
}
