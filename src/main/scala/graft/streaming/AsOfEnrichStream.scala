package graft.streaming

import graft.plans.AsOf
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming point-in-time enrichment through the native as-of join
  * ([[graft.plans.AsOfJoinExec]]): every arriving event picks up the
  * user's most recent order at-or-before its event time — the q85
  * semantics applied at the ingest edge (feature lookups, quote
  * attachment, SCD reads against a dimension snapshot).
  *
  * Route: `foreachBatch`, deliberately. The as-of exec requires a
  * per-partition sort of BOTH sides, and a sort on an unbounded stream
  * is exactly what Structured Streaming's unsupported-operations check
  * forbids — micro-batching is what makes it legal, because each batch
  * is a finite frame. Inside the batch the operator runs unchanged
  * (same plan, same single shuffle per side), so stream output ≡ batch
  * output on the same rows by construction — AsOfEnrichSpec pins it.
  * The dimension snapshot is loaded once per micro-batch, so a
  * slowly-changing dimension refreshes between batches for free.
  */
object AsOfEnrichStream {

  /** One enrichment pass; identical on a batch frame and a micro-batch. */
  def enrich(events: DataFrame, orders: DataFrame): DataFrame =
    AsOf.join(
        events.select("event_id", "user_id", "ts"),
        orders.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("timestamp").as("ots"), col("o_totalprice")),
        Seq("user_id"), Seq("o_custkey"), "ts", "ots",
        rightTieBreak = Seq("o_orderkey"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("o_orderkey").as("last_orderkey"),
        col("o_totalprice").as("last_order_price"),
        col("ots").as("last_order_ts"))

  /** Stream `streamPath` (events-shaped parquet), enrich each micro-batch
    * against the `sfDir` orders snapshot, append to `outDir`. */
  def stream(spark: SparkSession, sfDir: String, streamPath: String,
             outDir: String, checkpoint: String): StreamingQuery =
    spark.readStream
      .schema(graft.Tables.events(spark, sfDir).schema)
      .parquet(streamPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        enrich(batch, graft.Tables.orders(spark, sfDir))
          .write.mode("append").parquet(outDir)
      }
      .start()
}
