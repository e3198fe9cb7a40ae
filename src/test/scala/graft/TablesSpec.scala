package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampType, LongType, TimestampNTZType}

/** Tables.events must yield the SAME µs TimestampType column for every
  * fixture generation the driver has shipped: ts as int64 nanoseconds
  * (rounds 1-4, read under nanosAsLong) and ts as TIMESTAMP(MICROS, NTZ)
  * (round-5 regen). The round-4 bench lost all 43 events queries to
  * exactly this drift, so the equivalence is locked here on a
  * dual-written fixture.
  */
class TablesSpec extends SparkSpec {

  test("events reader adapts to nanos-long and micros-NTZ fixtures identically") {
    val base = java.nio.file.Files.createTempDirectory("evfix").toString
    val rows = spark.range(1000).select(
      col("id").as("event_id"),
      (lit(1700000000000000000L) + col("id") * lit(61000000000L)).as("ts_ns"),
      pmod(col("id"), lit(7)).as("user_id"))

    // generation A: ts as long nanoseconds (the nanosAsLong read path)
    rows.select(col("event_id"), col("ts_ns").as("ts"), col("user_id"))
      .write.parquet(s"$base/nanos/events.parquet")
    // generation B: ts as µs TIMESTAMP_NTZ (what the round-5 fixture has)
    rows.select(col("event_id"),
        timestamp_micros(expr("ts_ns div 1000")).cast(TimestampNTZType).as("ts"),
        col("user_id"))
      .write.parquet(s"$base/ntz/events.parquet")

    assert(spark.read.parquet(s"$base/ntz/events.parquet").schema("ts").dataType
      === TimestampNTZType)

    val a = Tables.events(spark, s"$base/nanos")
    val b = Tables.events(spark, s"$base/ntz")
    assert(a.schema("ts").dataType === TimestampType)
    assert(b.schema("ts").dataType === TimestampType)

    // same values, row for row (UTC session: NTZ→LTZ cast is identity)
    val av = a.select(col("event_id"), unix_micros(col("ts")).as("us"))
    val bv = b.select(col("event_id"), unix_micros(col("ts")).as("us"))
    assert(av.exceptAll(bv).isEmpty && bv.exceptAll(av).isEmpty)
    assert(a.count() === 1000)
  }

  test("production fixture reads as µs TimestampType regardless of generation") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.filter(col("ts").isNull).count() === 0)
  }
}
