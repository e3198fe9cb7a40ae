package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet corpus (TESTDATA.md).
  *
  * One parquet file per table under `{sfDir}/{name}.parquet`. All queries
  * go through here so the scan path is uniform: native columnar Parquet
  * reads with Catalyst predicate pushdown and column pruning — at 100 TB
  * these directories would be partitioned datasets and nothing here changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  /** events.ts has shipped as either TIMESTAMP(NANOS) or TIMESTAMP(MICROS,
    * NTZ) across fixture generations. Spark 4 refuses to read nanos as a
    * timestamp, so when the file carries nanos we read them as a long
    * (runtime-settable legacy conf) and truncate to µs — the same
    * floor-division DuckDB applies casting TIMESTAMP_NS → TIMESTAMP. A µs
    * NTZ column is cast to TimestampType: every session here runs in UTC,
    * so the wall-clock mapping is identity and matches DuckDB's naive
    * TIMESTAMP. Either way downstream queries always see a µs
    * TimestampType `ts`, same as every prior round.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
