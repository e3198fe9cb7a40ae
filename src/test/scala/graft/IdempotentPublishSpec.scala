package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Kafka-style idempotent producer semantics on the publish path: a
  * retried batch (same producer id + sequence) must not duplicate rows,
  * sequences must be gapless per producer, and independent producers
  * must not share a sequence space. The reference's ack can be lost
  * after its append (broker/main.rs:91-108) — a retrying client there
  * double-writes; this is the guarantee that closes it.
  */
class IdempotentPublishSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-idem").toString + "/t"

  test("a retried batch with the same sequence is dropped, not re-appended") {
    val dir = tmpDir()
    val ev  = Tables.events(spark, sf).limit(50)
    assert(Topic.publishIdempotent(ev, dir, "p1", 0L))
    val afterFirst = spark.read.parquet(dir).count()
    assert(afterFirst === 50)
    // the retry (ack lost, client re-sends the identical batch)
    assert(!Topic.publishIdempotent(ev, dir, "p1", 0L))
    assert(spark.read.parquet(dir).count() === afterFirst)
    // offsets stayed dense
    val offs = spark.read.parquet(dir).select("offset").orderBy("offset")
      .collect().map(_.getLong(0)).toSeq
    assert(offs === (0L until 50L))
  }

  test("the next sequence appends and offsets continue after the hwm") {
    val dir = tmpDir()
    val ev  = Tables.events(spark, sf)
    assert(Topic.publishIdempotent(ev.filter(col("event_id") < 30), dir, "p1", 0L))
    assert(Topic.publishIdempotent(
      ev.filter(col("event_id") >= 30 && col("event_id") < 50), dir, "p1", 1L))
    val log = spark.read.parquet(dir)
    val offs = log.select("offset").orderBy("offset").collect().map(_.getLong(0)).toSeq
    assert(offs === (0L until offs.length.toLong))
    // a stale retry of the FIRST batch after the second committed: dropped
    assert(!Topic.publishIdempotent(ev.filter(col("event_id") < 30), dir, "p1", 0L))
    assert(log.count() === offs.length.toLong)
  }

  test("a sequence gap fails loudly (OutOfOrderSequence)") {
    val dir = tmpDir()
    val ev  = Tables.events(spark, sf).limit(10)
    assert(Topic.publishIdempotent(ev, dir, "p1", 0L))
    val e = intercept[IllegalStateException] {
      Topic.publishIdempotent(ev, dir, "p1", 2L)
    }
    assert(e.getMessage.contains("out-of-order"))
    // and on a FRESH topic the first sequence must be 0
    val dir2 = tmpDir()
    intercept[IllegalStateException] {
      Topic.publishIdempotent(ev, dir2, "p1", 5L)
    }
  }

  test("producers have independent sequence spaces; consume is unaffected") {
    val dir = tmpDir()
    val ev  = Tables.events(spark, sf)
    assert(Topic.publishIdempotent(ev.filter(col("event_id") < 20), dir, "pA", 0L))
    assert(Topic.publishIdempotent(
      ev.filter(col("event_id") >= 20 && col("event_id") < 40), dir, "pB", 0L))
    assert(!Topic.publishIdempotent(
      ev.filter(col("event_id") >= 20 && col("event_id") < 40), dir, "pB", 0L))
    assert(Topic.publishIdempotent(
      ev.filter(col("event_id") >= 40 && col("event_id") < 45), dir, "pA", 1L))
    val log = spark.read.parquet(dir)
    assert(log.count() === 45)
    assert(log.select("offset").distinct().count() === 45)
    // point read still prunes/addresses by offset as on plain topics
    val row = Topic.consume(spark, dir, 7, 1).collect()
    assert(row.length === 1 && row.head.getAs[Long]("offset") === 7L)
  }
}
