package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING quality gate: the ingest-edge form of the batch quality
  * filters (ta_quality / ta_langid / ta_corpus_funnel's first stages) —
  * gate the crawl BEFORE it lands in the corpus, next to
  * [[NearDupGateStream]] (near-dup gate) and [[DecontamStream]]
  * (benchmark-contamination gate). Every signal is a per-row stateless
  * expression ([[graft.queries.TextQueries.gateSignals]] — the SAME
  * expressions the declared batch queries score with, pinned
  * bit-identical by QualityGateSpec), so the gate needs no state store,
  * no watermark, and no shuffle on the stream side: it composes with
  * any trigger, which is what a 100 TB ingest edge wants.
  *
  * Verdict ladder (first failing rule wins, the funnel convention):
  * `low_quality` (fold below [[MinQuality]]) → `non_en` (marker vote
  * says another language) → `accept`.
  */
object QualityGateStream {

  /** Accept threshold for the bounded quality fold — between the
    * corpus median (~0.645) and floor (~0.554), so both verdicts occur
    * on real data; a deployment tunes this against ta_quality's
    * distribution. */
  val MinQuality = 0.62

  /** Per-row verdict: works identically on a batch frame and a
    * streaming frame (the equivalence test runs both through this). */
  def gate(docs: DataFrame): DataFrame =
    graft.queries.TextQueries.gateSignals(docs)
      .withColumn("verdict",
        when(col("quality") < MinQuality, "low_quality")
          .when(col("predicted") =!= "en", "non_en")
          .otherwise("accept"))

  /** The streaming gate over a parquet document directory/glob.
    * Verdict counts are published per micro-batch as observed metrics
    * (`observedMetrics("quality_gate")`) so an operator watches
    * accept/reject rates from query progress — the drop-rate alarm a
    * production gate needs (quality share collapsing means the crawler
    * hit a bad seed list). */
  def stream(spark: SparkSession, streamPath: String): DataFrame =
    gate(spark.readStream.schema(DecontamStream.docSchema).parquet(streamPath))
      .observe("quality_gate",
        count(lit(1)).as("n_docs"),
        sum(when(col("verdict") === "accept", 1L).otherwise(0L)).as("n_accepted"),
        sum(when(col("verdict") === "low_quality", 1L).otherwise(0L)).as("n_low_quality"),
        sum(when(col("verdict") === "non_en", 1L).otherwise(0L)).as("n_non_en"))
}
