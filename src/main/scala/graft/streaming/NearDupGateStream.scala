package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING near-dup gate: the ingest-time half of `dd_incremental`.
  * The corpus snapshot's LSH band keys are built once as a static
  * index; every incoming document computes its own band keys PER ROW
  * (DedupQueries.rowBands — the same shingles/permutations/band md5s
  * as the batch signature, as stateless HOF expressions) and
  * stream-static left-joins the index: any shared band ⇒
  * `dup_of_snapshot`, else `fresh`. No state store, no watermark, no
  * shuffle on the stream side — the gate composes with any trigger,
  * which is exactly what a 100 TB ingest edge wants (gate the crawl
  * BEFORE it lands in the corpus, like DecontamStream gates benchmark
  * contamination).
  *
  * Semantics note vs the batch operator: the static index is UNCAPPED
  * (a snapshot band key is present regardless of its bucket size), so
  * the stream verdict is a recall-SUPERSET of dd_incremental's
  * `dup_of_snapshot` half (which skips over-BandCap buckets); the
  * in-batch half (`dup_in_batch`) is inherently cross-row and stays
  * with the batch operator / the stateful streaming dedup.
  */
object NearDupGateStream {

  /** Distinct band keys of the snapshot (docs with doc_id ≡ 0..7 mod
    * 10 — the same split as dd_incremental). Built once per gate. */
  def snapshotIndex(spark: SparkSession, corpusDir: String): DataFrame =
    graft.queries.DedupQueries.rowBands(
        graft.Tables.documents(spark, corpusDir).filter(col("doc_id") % 10 < 8))
      .select(explode(array(col("band0"), col("band1"))).as("k"))
      .distinct()

  /** Per-row verdict: works identically on a batch frame and a
    * streaming frame (the equivalence test runs both through this). */
  def gate(docs: DataFrame, idx: DataFrame): DataFrame = {
    val i0 = idx.select(col("k").as("k0"))
    val i1 = idx.select(col("k").as("k1"))
    graft.queries.DedupQueries.rowBands(docs)
      .join(i0, col("band0") === col("k0"), "left")
      .join(i1, col("band1") === col("k1"), "left")
      .select(col("doc_id"),
        when(col("k0").isNotNull || col("k1").isNotNull, "dup_of_snapshot")
          .otherwise("fresh").as("verdict"))
  }

  /** The streaming gate over a parquet document directory/glob,
    * indexed against `corpusDir`'s snapshot split. Verdict counts are
    * published per micro-batch as OBSERVED METRICS (`observe` →
    * `StreamingQueryProgress.observedMetrics("neardup_gate")`), so an
    * operator watches drop rates from query progress without a second
    * aggregation pass — the ingest-monitoring hook a production gate
    * needs (alert when dup share spikes: the crawler is re-fetching). */
  def stream(spark: SparkSession, corpusDir: String, streamPath: String): DataFrame =
    gate(spark.readStream.schema(DecontamStream.docSchema).parquet(streamPath),
         snapshotIndex(spark, corpusDir))
      .observe("neardup_gate",
        count(lit(1)).as("n_docs"),
        sum(when(col("verdict") === "dup_of_snapshot", 1L).otherwise(0L)).as("n_dups"))
}
