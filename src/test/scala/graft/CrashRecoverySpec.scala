package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import graft.streaming.EventStream

/** Kill-mid-run recovery for the exactly-once publish sinks: a micro-batch
  * that FAILS during the sink write (after the source offsets are logged,
  * before the sink commit) must neither lose nor duplicate rows once the
  * stream restarts from its checkpoint. The replay-only path is covered by
  * StreamingSpec/ForeachBatchSpec; this spec makes a batch actually die.
  *
  * Failure injection is deterministic: a poisoned projection
  * (assert_true over event_id, data-dependent so Catalyst cannot
  * constant-fold it at planning) blows up the SECOND micro-batch inside
  * the write tasks. The restart runs the same query without the poison —
  * the user-code-fix-then-restart recovery contract of Structured
  * Streaming.
  */
class CrashRecoverySpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val Poison = 150L

  /** Two source files with forced mtimes so maxFilesPerTrigger=1 yields
    * batch 0 = ids 0..99 and batch 1 = ids 100..199 (the file source
    * orders by modification time). */
  private def seedSource(): String = {
    val dir = new java.io.File(tmp("crash-src"), "t")
    dir.mkdirs()
    def writeFile(from: Long, until: Long, name: String, mtime: Long): Unit = {
      val staging = tmp("crash-stage")
      spark.range(from, until).select(
        col("id").as("event_id"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L).as("ts"),
        pmod(col("id"), lit(7)).as("user_id"),
        lit("click").as("event_type"),
        (col("id") % 100).cast("double").as("value"),
        lit("{}").as("props"))
        .coalesce(1).write.parquet(s"$staging/p")
      val part = new java.io.File(s"$staging/p").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(dir, name)
      Files.copy(part.toPath, dest.toPath)
      assert(dest.setLastModified(mtime))
    }
    val now = System.currentTimeMillis()
    writeFile(0, 100, "f1.parquet", now - 120000)
    writeFile(100, 200, "f2.parquet", now)
    dir.toString
  }

  /** Poison a stream: evaluating any row of the second file throws inside
    * the write task. assert_true returns NULL on success, so the value
    * column is unchanged for every surviving row; the argument references
    * event_id, so the expression is not foldable and fires per-row at
    * execution time. */
  private def withPoison(events: DataFrame): DataFrame =
    events.withColumn("value",
      col("value") +
        coalesce(expr(s"CAST(assert_true(event_id != $Poison) AS DOUBLE)"), lit(0.0)))

  test("publishStream: failed batch leaves no visible rows; restart completes exactly-once") {
    val src  = seedSource()
    val out  = tmp("crash-out") + "/t"
    val ckpt = tmp("crash-ckpt")

    // phase 1: batch 0 (f1) commits, batch 1 (f2) dies mid-write
    val q1 = EventStream.publishStream(
      withPoison(EventStream.ingest(spark, src, 1)), out, ckpt)
    intercept[StreamingQueryException] { q1.awaitTermination() }

    // the file sink's _spark_metadata log hides the dead batch's orphan
    // part-files: only batch 0's 100 rows are visible
    val afterCrash = spark.read.parquet(out)
    assert(afterCrash.count() === 100)
    assert(afterCrash.agg(max(col("event_id"))).head().getLong(0) === 99L)

    // phase 2: restart from the same checkpoint, poison removed
    EventStream.publishStream(EventStream.ingest(spark, src, 1), out, ckpt)
      .awaitTermination()
    val ids = spark.read.parquet(out).select("event_id")
    assert(ids.count() === 200, "missing or duplicated rows after recovery")
    assert(ids.distinct().count() === 200, "duplicated event_ids after recovery")
  }

  test("mergePublish: failed batch aborts cleanly; restart yields dense unique ordinals") {
    val src  = seedSource()
    val out  = tmp("crash-topic") + "/t"
    val ckpt = tmp("crash-ckpt2")

    val q1 = EventStream.mergePublish(
      withPoison(EventStream.ingest(spark, src, 1)), out, ckpt)
    intercept[StreamingQueryException] { q1.awaitTermination() }

    // batch write commit protocol aborted the dead batch: only batch 0's
    // offsets 0..99 are on disk, and the publish lock was released
    val afterCrash = spark.read.parquet(out)
    assert(afterCrash.count() === 100)
    assert(afterCrash.agg(max(col("offset"))).head().getLong(0) === 99L)
    assert(!new java.io.File(out, "_publish.lock").exists(),
      "crashed publish left the topic lock behind")

    EventStream.mergePublish(EventStream.ingest(spark, src, 1), out, ckpt)
      .awaitTermination()
    // no duplicate/missing ordinals OR events: offsets dense 0..199
    val rows = spark.read.parquet(out)
    assert(rows.select("event_id").distinct().count() === 200)
    val offsets = rows.select("offset").collect().map(_.getLong(0)).sorted
    assert(offsets.toSeq === (0L until 200L),
      s"ordinals not dense after recovery: ${offsets.take(10).mkString(",")}...")
  }

  test("stale publish lock (crashed writer) is taken over after the lease TTL") {
    val dir = tmp("crash-lock") + "/t"
    val ev  = Tables.events(spark, sf).limit(20)
    Topic.publish(ev, dir)
    // a crashed writer's leftover: the lock exists but its heartbeat
    // (mtime) is long past the TTL — no process is refreshing it
    val lock = java.nio.file.Paths.get(dir, "_publish.lock")
    java.nio.file.Files.write(lock, "deadbeef crashed\n".getBytes)
    val staleMs = System.currentTimeMillis() - 10 * 60 * 1000L
    assert(lock.toFile.setLastModified(staleMs))
    spark.conf.set("spark.graft.publishLockTtlMs", "1000")
    try {
      // publish succeeds via takeover instead of demanding manual deletion
      Topic.publish(ev, dir)
      val offsets = spark.read.parquet(dir).select("offset")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(offsets === (0L until 40L), "post-takeover offsets not dense")
      // ... and the takeover released its own lock on completion
      assert(!java.nio.file.Files.exists(lock))
      // a LIVE lock (fresh heartbeat) still errors loudly — the lease
      // only relaxes the crashed case, not single-writer enforcement
      java.nio.file.Files.createFile(lock)
      val e = intercept[IllegalStateException] { Topic.publish(ev, dir) }
      assert(e.getMessage.contains("active publisher"))
      assert(spark.read.parquet(dir).count() === 40)
    } finally {
      spark.conf.unset("spark.graft.publishLockTtlMs")
      java.nio.file.Files.deleteIfExists(lock)
    }
  }
}
