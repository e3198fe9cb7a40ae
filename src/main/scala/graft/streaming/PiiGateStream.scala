package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING PII gate: the ingest-edge form of the pr_pii_scan release
  * audit — catch PII at the crawl boundary instead of discovering it in
  * a release audit after it spread through derived corpora. Fourth gate
  * in the ingest-edge family ([[QualityGateStream]] quality,
  * [[NearDupGateStream]] near-dup, [[DecontamStream]] contamination):
  * like them it is per-row STATELESS (the detection is
  * [[graft.queries.PrivacyQueries2.piiSignals]] — the SAME flat codegen
  * expressions the declared batch queries use, pinned bit-identical by
  * PiiGateSpec), so no state store, no watermark, no stream-side
  * shuffle, any trigger.
  *
  * Verdict ladder (severity order, first hit wins): `card` (a
  * Luhn-VALID number — the page-one incident) → `contact` (email or
  * phone) → `address` (bare IPv4) → `clean`. Card candidates that fail
  * Luhn do NOT flag — that is the entire point of carrying the checksum
  * into the gate (a regex-only gate quarantines every 16-digit id).
  */
object PiiGateStream {

  /** Per-row verdict: identical on batch and streaming frames. */
  def gate(docs: DataFrame): DataFrame =
    graft.queries.PrivacyQueries2.piiSignals(docs, "text")
      .withColumn("verdict",
        when(col("cc_valid") > 0, "card")
          .when(col("emails") + col("phones") > 0, "contact")
          .when(col("ips") > 0, "address")
          .otherwise("clean"))
      .drop("ccs")

  /** The streaming gate over a parquet document directory/glob, with
    * per-micro-batch verdict counts as observed metrics
    * (`observedMetrics("pii_gate")`) — the leak-rate alarm: cc_valid
    * rising from zero is an incident, not a dashboard curiosity. */
  def stream(spark: SparkSession, streamPath: String): DataFrame =
    gate(spark.readStream.schema(DecontamStream.docSchema).parquet(streamPath))
      .observe("pii_gate",
        count(lit(1)).as("n_docs"),
        sum(when(col("verdict") === "card", 1L).otherwise(0L)).as("n_card"),
        sum(when(col("verdict") === "contact", 1L).otherwise(0L)).as("n_contact"),
        sum(when(col("verdict") === "address", 1L).otherwise(0L)).as("n_address"),
        sum(when(col("verdict") =!= "clean", 1L).otherwise(0L)).as("n_flagged"))
}
