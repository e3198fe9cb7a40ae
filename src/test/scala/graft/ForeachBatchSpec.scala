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
}
