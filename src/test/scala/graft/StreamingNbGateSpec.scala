package graft

import java.nio.file.Files

import graft.streaming.NbGateStream
import org.apache.spark.sql.functions._

/** The streaming trained-classifier gate: its per-row integer score
  * fold must reproduce the declared ta_nb_confusion query's predictions
  * exactly (same persisted weight grid, same argmax encoding), and the
  * stream must equal the batch gate row for row.
  */
class StreamingNbGateSpec extends SparkSpec {

  test("gate predictions reproduce ta_nb_confusion's confusion matrix") {
    val (wmap, w0) = NbGateStream.model(spark, sf)
    // the batch query scores the odd (held-out) half; aggregate the
    // gate's per-doc predictions the same way
    val gateConf = NbGateStream
      .gate(Tables.documents(spark, sf).filter(col("doc_id") % 2 === 1), wmap, w0)
      .groupBy(col("lang").as("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batchConf = SparkEntry.queries("ta_nb_confusion")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(gateConf == batchConf,
      "gate fold drifted from the declared NB confusion matrix")
  }

  test("stream == batch; both verdicts occur; metrics account for every doc") {
    val docs = Tables.documents(spark, sf)
    val (wmap, w0) = NbGateStream.model(spark, sf)
    val batch = NbGateStream.gate(docs, wmap, w0)
      .select("doc_id", "pred_lang", "verdict").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(batch.values.map(_._2).toSet === Set("accept", "nb_mismatch"),
      "fixture must exercise both verdict classes")

    val streamDir = Files.createTempDirectory("nbgate-stream").toString
    docs.write.mode("overwrite").parquet(streamDir)
    val q = NbGateStream.stream(spark, sf, streamDir)
      .select("doc_id", "pred_lang", "verdict")
      .writeStream.format("memory").queryName("nb_gate")
      .option("checkpointLocation", Files.createTempDirectory("nbgate-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("nb_gate")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      assert(streamed == batch, "stream verdicts differ from batch gate")
      val obs = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("nb_gate")))
      assert(obs.map(_.getAs[Long]("n_docs")).sum == batch.size.toLong)
      assert(obs.map(_.getAs[Long]("n_accepted")).sum ==
        batch.values.count(_._2 == "accept").toLong)
      assert(obs.map(_.getAs[Long]("n_mismatch")).sum ==
        batch.values.count(_._2 == "nb_mismatch").toLong)
    } finally q.stop()
  }

  test("model artifact reloads identically across the JVM cache") {
    val (wmap, w0) = NbGateStream.model(spark, sf)
    graft.ArtifactStore.invalidate(spark, sf) // drops cache + parquet
    val (wmap2, w02) = NbGateStream.model(spark, sf) // retrains
    assert(w0 == w02, "default weights changed across retrain")
    assert(wmap == wmap2, "weight grid changed across retrain")
  }
}
