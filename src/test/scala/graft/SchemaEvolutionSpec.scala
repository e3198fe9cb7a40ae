package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The topic log's schema-evolution contract: additive widening is
  * allowed (old rows read as null through the merge-aware consume
  * paths), while column drops and type changes fail LOUDLY before any
  * append — a mixed-schema parquet log silently loses columns on plain
  * reads, the failure class CorruptFileSpec bans for corrupt parts.
  */
class SchemaEvolutionSpec extends SparkSpec {

  private def freshTopic(): String =
    Files.createTempDirectory("schema-topic").toString

  private def batch(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, java.sql.Timestamp.valueOf(f"2026-01-01 00:00:${i % 60}%02d"),
                  i.toLong % 7, "view", i * 1.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("additive widening publishes, and old rows read as null") {
    val dir = freshTopic()
    Topic.publish(batch(0 until 20), dir)
    val widened = batch(20 until 30).withColumn("schema_v", lit(2))
    Topic.publish(widened, dir) // must NOT throw
    val all = Topic.openReader(spark, dir)
    assert(all.columns.contains("schema_v"))
    assert(all.count() == 30)
    // offsets continue densely across the widening
    assert(all.agg(max("offset")).head.getLong(0) == 29L)
    val nNulls = all.filter(col("schema_v").isNull).count()
    assert(nNulls == 20, s"old rows must read schema_v as null, got $nNulls")
    assert(all.filter(col("schema_v") === 2).count() == 10)
    // point reads through consume see the widened column too
    assert(Topic.consume(spark, dir, 5).columns.contains("schema_v"))
  }

  test("dropping an event column fails loudly before any append") {
    val dir = freshTopic()
    Topic.publish(batch(0 until 10), dir)
    val narrowed = batch(10 until 15).drop("value")
    val e = intercept[IllegalArgumentException](Topic.publish(narrowed, dir))
    assert(e.getMessage.contains("drops"), e.getMessage)
    // nothing was appended
    assert(Topic.openReader(spark, dir).count() == 10)
  }

  test("changing a column's type fails loudly before any append") {
    val dir = freshTopic()
    Topic.publish(batch(0 until 10), dir)
    val retyped = batch(10 until 15).withColumn("value", col("value").cast("string"))
    val e = intercept[IllegalArgumentException](Topic.publish(retyped, dir))
    assert(e.getMessage.contains("type"), e.getMessage)
    assert(Topic.openReader(spark, dir).count() == 10)
  }

  test("compacting a widened topic carries the new column") {
    val dir = freshTopic()
    Topic.publish(batch(0 until 10), dir)
    Topic.publish(batch(0 until 10).withColumn("schema_v", lit(2)), dir)
    Topic.compact(spark, dir, "event_id")
    val compacted = Topic.openReader(spark, dir)
    assert(compacted.columns.contains("schema_v"))
    // latest-per-key wins: every survivor is from the widened batch
    assert(compacted.count() == 10)
    assert(compacted.filter(col("schema_v") === 2).count() == 10)
  }

  test("idempotent publish enforces the same contract") {
    val dir = freshTopic()
    assert(Topic.publishIdempotent(batch(0 until 10), dir, "p1", 0L))
    val narrowed = batch(10 until 15).drop("event_type")
    intercept[IllegalArgumentException](
      Topic.publishIdempotent(narrowed, dir, "p1", 1L))
    assert(Topic.openReader(spark, dir).count() == 10)
  }
}
