package graft

import java.nio.file.Files

import graft.streaming.AsOfEnrichStream
import org.apache.spark.sql.functions._

/** Streamed as-of enrichment ≡ batch enrichment on the same rows: the
  * native as-of exec runs unchanged inside foreachBatch, and splitting
  * the input across micro-batches cannot change any verdict (each event's
  * match depends only on the static orders snapshot).
  */
class AsOfEnrichSpec extends SparkSpec {

  test("stream through foreachBatch equals the batch enrichment") {
    val events = Tables.events(spark, sf)
    val want = AsOfEnrichStream.enrich(events, Tables.orders(spark, sf))
      .collect().map(_.toString).sorted.toSeq

    val streamDir = Files.createTempDirectory("asof-stream").toString
    val outDir = Files.createTempDirectory("asof-out").toString + "/out"
    val ckpt = Files.createTempDirectory("asof-ckpt").toString
    // several files -> several micro-batches under maxFilesPerTrigger
    events.repartition(3).write.mode("overwrite").parquet(streamDir)

    val q = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        AsOfEnrichStream.enrich(batch, Tables.orders(spark, sf))
          .write.mode("append").parquet(outDir)
      }
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(outDir).collect().map(_.toString).sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("the packaged stream entry point runs and matches too") {
    val events = Tables.events(spark, sf).filter(col("event_id") % 5 === 0)
    val streamDir = Files.createTempDirectory("asof-stream2").toString
    val outDir = Files.createTempDirectory("asof-out2").toString + "/out"
    val ckpt = Files.createTempDirectory("asof-ckpt2").toString
    events.write.mode("overwrite").parquet(streamDir)

    val q = AsOfEnrichStream.stream(spark, sf, streamDir, outDir, ckpt)
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(outDir)
    val want = AsOfEnrichStream.enrich(events, Tables.orders(spark, sf))
    assert(got.count() === want.count())
    assert(got.agg(sum(col("last_orderkey"))).head.getLong(0)
      === want.agg(sum(col("last_orderkey"))).head.getLong(0))
  }
}
