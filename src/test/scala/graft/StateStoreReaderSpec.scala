package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The offline state-inspection surface (Spark 4 state data source):
  * when a 100 TB streaming job misbehaves, the on-call needs to read
  * the checkpoint's STATE — not re-run the stream — to see what the
  * operator is holding. This spec pins that workflow end-to-end for a
  * stateful aggregation checkpoint:
  *
  *  - `format("state-metadata")` lists the operator and its state store
  *  - `format("statestore")` reads the keyed state rows themselves, and
  *    they reconcile exactly with what the sink emitted
  */
class StateStoreReaderSpec extends SparkSpec {

  test("streaming agg state reads back offline and reconciles with the sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("state-read-ckpt").toString

    val mem = MemoryStream[Long]
    mem.addData(1L to 100L: _*)
    val q = mem.toDF()
      .select((col("value") % 10).as("bucket")) // name the key BEFORE the
      .groupBy("bucket")                        // agg so state exposes it
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("update")
      .format("memory").queryName("state_read_sink")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()

    // operator metadata: one stateful operator, discoverable by name
    val meta = spark.read.format("state-metadata").load(ckpt)
    assert(meta.count() == 1)
    val opName = meta.select("operatorName").head.getString(0)
    assert(opName == "stateStoreSave", opName) // the agg's state-saving operator

    // the state rows themselves: 10 buckets, counts match the input
    // the value struct exposes the INTERNAL aggregation buffer (`count`),
    // not the output alias — part of what this surface teaches an on-call
    val state = spark.read.format("statestore").load(ckpt)
    val byBucket = state
      .select(col("key.bucket").as("bucket"), col("value.count").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBucket.keySet == (0L to 9L).toSet)
    assert(byBucket.values.forall(_ == 10L), byBucket.toString)

    // and they reconcile with the sink's final update per bucket
    val sink = spark.table("state_read_sink")
      .groupBy("bucket").agg(max("n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sink == byBucket)
  }
}
