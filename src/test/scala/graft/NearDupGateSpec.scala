package graft

import java.nio.file.Files

import graft.streaming.NearDupGateStream
import org.apache.spark.sql.functions._

/** The streaming near-dup ingest gate: stateless per-row band keys +
  * stream-static index join, so the STREAM verdicts must equal the
  * batch verdicts row for row; and the gate must be a recall-superset
  * of dd_incremental's dup_of_snapshot half (the batch operator skips
  * over-cap buckets; the gate doesn't).
  */
class NearDupGateSpec extends SparkSpec {

  test("rowBands == the batch signature pipeline's band keys, doc for doc") {
    // the stateless HOF twin must be BIT-identical to sigDf's bands, or
    // the ingest gate and the batch candidate generator silently block
    // on different keys
    val docs = Tables.documents(spark, sf)
    val hof = graft.queries.DedupQueries.rowBands(docs).collect()
      .flatMap(r => Seq((r.getLong(0), 0, r.getString(1)), (r.getLong(0), 1, r.getString(2))))
      .toSet
    val batch = graft.queries.DedupQueries.bandedDf(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(hof == batch)
  }

  test("stream == batch; gate is a superset of dd_incremental's snapshot half") {
    val idx = NearDupGateStream.snapshotIndex(spark, sf)
    val newDocs = Tables.documents(spark, sf).filter(col("doc_id") % 10 >= 8)

    val batch = NearDupGateStream.gate(newDocs, idx)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batch.nonEmpty)

    // the same gate as a STREAM over the new-docs subset
    val streamDir = Files.createTempDirectory("gate-stream").toString
    newDocs.write.mode("overwrite").parquet(streamDir)
    val q = NearDupGateStream.stream(spark, sf, streamDir)
      .writeStream.format("memory").queryName("neardup_gate")
      .option("checkpointLocation",
              Files.createTempDirectory("gate-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("neardup_gate")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch, "stream verdicts differ from batch gate")
      // the observed metrics must account for every gated doc without a
      // second aggregation pass
      val obs = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("neardup_gate")))
      val nDocs = obs.map(_.getAs[Long]("n_docs")).sum
      val nDups = obs.map(_.getAs[Long]("n_dups")).sum
      assert(nDocs == batch.size.toLong, s"observed n_docs $nDocs != ${batch.size}")
      assert(nDups == batch.values.count(_ == "dup_of_snapshot").toLong)
    } finally q.stop()

    // recall superset: everything the capped batch operator drops as a
    // snapshot dup, the ingest gate also flags
    val batchDrops = SparkEntry.queries("dd_incremental")(spark, sf).collect()
      .filter(_.getString(1) == "dup_of_snapshot").map(_.getLong(0)).toSet
    val gateDrops = batch.collect { case (id, "dup_of_snapshot") => id }.toSet
    assert(batchDrops.subsetOf(gateDrops),
      s"gate missed snapshot dups: ${batchDrops -- gateDrops}")
  }
}
