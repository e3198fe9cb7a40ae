package graft

import java.nio.file.Files

import graft.streaming.QualityGateStream
import org.apache.spark.sql.functions._

/** The streaming quality gate: stateless per-row scoring, so stream
  * verdicts must equal batch verdicts row for row, and the gate's
  * quality signal must be BIT-identical to the declared ta_quality
  * query (same expressions, factored not duplicated).
  */
class QualityGateSpec extends SparkSpec {

  test("gate quality == ta_quality, doc for doc; all verdict classes occur") {
    val docs  = Tables.documents(spark, sf)
    val gated = QualityGateStream.gate(docs)
      .select("doc_id", "quality", "verdict").collect()
    val gateQ = gated.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batchQ = SparkEntry.queries("ta_quality")(spark, sf)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gateQ == batchQ, "gate quality drifted from ta_quality")
    // the threshold and the lang rule both bite on real data
    val verdicts = gated.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(verdicts.keySet === Set("accept", "low_quality", "non_en"),
      s"expected all three verdict classes, got $verdicts")
  }

  test("stream == batch; observed metrics account for every doc") {
    val docs = Tables.documents(spark, sf)
    val batch = QualityGateStream.gate(docs)
      .select("doc_id", "verdict").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val streamDir = Files.createTempDirectory("qgate-stream").toString
    docs.write.mode("overwrite").parquet(streamDir)
    val q = QualityGateStream.stream(spark, streamDir)
      .select("doc_id", "verdict")
      .writeStream.format("memory").queryName("quality_gate")
      .option("checkpointLocation", Files.createTempDirectory("qgate-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("quality_gate")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch, "stream verdicts differ from batch gate")
      val obs = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("quality_gate")))
      assert(obs.map(_.getAs[Long]("n_docs")).sum == batch.size.toLong)
      assert(obs.map(_.getAs[Long]("n_accepted")).sum ==
        batch.values.count(_ == "accept").toLong)
      assert(obs.map(_.getAs[Long]("n_low_quality")).sum ==
        batch.values.count(_ == "low_quality").toLong)
      assert(obs.map(_.getAs[Long]("n_non_en")).sum ==
        batch.values.count(_ == "non_en").toLong)
    } finally q.stop()
  }
}
