package graft

import java.nio.file.Files

import graft.streaming.PiiGateStream
import org.apache.spark.sql.functions._

/** The streaming PII gate: stateless per-row detection, so stream
  * verdicts must equal batch verdicts row for row, the Luhn check must
  * separate valid cards from checksum-failing 16-digit ids, and the
  * observed metrics must account for every doc. Runs on a crafted
  * fixture (the corpus is PII-free by construction; the declared
  * pr_pii_scan covers the augmented corpus path).
  */
class PiiGateSpec extends SparkSpec {

  import spark.implicits._

  // 4111111111111111 is the canonical Luhn-valid test number;
  // 4111111111111112 fails the checksum by one
  private def fixture = Seq(
    (0L, "reach me at jo.doe@example.com for details", "en", "s0", 43L),
    (1L, "call 555-867-5309 now", "en", "s0", 21L),
    (2L, "server at 10.1.2.3 responded", "en", "s1", 28L),
    (3L, "card 4111111111111111 on file", "en", "s1", 29L),
    (4L, "tracking id 4111111111111112 shipped", "en", "s1", 36L),
    (5L, "nothing sensitive here at all", "en", "s2", 29L),
    (6L, "both jo@ex.org and card 4111111111111111 appear", "en", "s2", 47L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("verdict ladder: Luhn-valid card outranks contact; failing checksum does not flag") {
    val got = PiiGateStream.gate(fixture)
      .select("doc_id", "verdict").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(0L -> "contact", 1L -> "contact", 2L -> "address",
                       3L -> "card", 4L -> "clean", 5L -> "clean", 6L -> "card"))
  }

  test("gate signals == pr_pii_scan's expressions on the augmented corpus") {
    // run the gate's signal function over the corpus; since raw docs are
    // PII-free word soup, every count must be zero — any hit would mean
    // the patterns fire on clean text (false-positive floor)
    val sig = graft.queries.PrivacyQueries2.piiSignals(
      Tables.documents(spark, sf), "text")
      .agg(sum(col("emails") + col("phones") + col("ips") + col("cc_cand")))
      .collect()(0).getLong(0)
    assert(sig === 0L, "detector fires on PII-free corpus text")
  }

  test("stream == batch; observed metrics account for every doc") {
    val batch = PiiGateStream.gate(fixture)
      .select("doc_id", "verdict").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val streamDir = Files.createTempDirectory("piigate-stream").toString
    fixture.write.mode("overwrite").parquet(streamDir)
    val q = PiiGateStream.stream(spark, streamDir)
      .select("doc_id", "verdict")
      .writeStream.format("memory").queryName("pii_gate")
      .option("checkpointLocation", Files.createTempDirectory("piigate-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("pii_gate")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch, "stream verdicts differ from batch gate")
      val obs = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("pii_gate")))
      assert(obs.map(_.getAs[Long]("n_docs")).sum == batch.size.toLong)
      assert(obs.map(_.getAs[Long]("n_card")).sum ==
        batch.values.count(_ == "card").toLong)
      assert(obs.map(_.getAs[Long]("n_flagged")).sum ==
        batch.values.count(_ != "clean").toLong)
    } finally q.stop()
  }
}
