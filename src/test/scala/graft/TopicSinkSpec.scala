package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode

/** The graft-topic DataFrameWriter connector: every save mode maps to
  * the append-only-log contract, and the written log is byte-identical
  * to a direct Topic.publish. */
class TopicSinkSpec extends SparkSpec {

  // publish requires the canonical event shape (offset assignment orders
  // by ts, event_id) — use real corpus rows like Bench's throughput stage
  private def events(n: Int) =
    Tables.events(spark, sf).orderBy("event_id").limit(n).localCheckpoint(true)

  test("Append publishes and offsets continue across writes") {
    val dir = Files.createTempDirectory("topic-sink").toString + "/t"
    events(5).write.format("graft-topic").mode(SaveMode.Append).save(dir)
    assert(Topic.highWaterMark(spark, dir) === 4L)
    events(3).write.format("graft-topic").mode(SaveMode.Append).save(dir)
    assert(Topic.highWaterMark(spark, dir) === 7L)
    // log content equals a direct publish of the same frames
    val direct = Files.createTempDirectory("topic-direct").toString + "/t"
    Topic.publish(events(5), direct)
    Topic.publish(events(3), direct)
    val a = Topic.consume(spark, dir, 0L, 8).collect().map(_.toString).sorted
    val b = Topic.consume(spark, direct, 0L, 8).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("ErrorIfExists writes an empty topic, errors on a non-empty one") {
    val dir = Files.createTempDirectory("topic-sink-eie").toString + "/t"
    events(2).write.format("graft-topic").mode(SaveMode.ErrorIfExists).save(dir)
    assert(Topic.highWaterMark(spark, dir) === 1L)
    val e = intercept[Exception] {
      events(2).write.format("graft-topic").mode(SaveMode.ErrorIfExists).save(dir)
    }
    assert(e.getMessage.contains("already holds offsets"))
  }

  test("Ignore is a no-op on a non-empty topic") {
    val dir = Files.createTempDirectory("topic-sink-ign").toString + "/t"
    events(2).write.format("graft-topic").mode(SaveMode.Ignore).save(dir)
    events(9).write.format("graft-topic").mode(SaveMode.Ignore).save(dir)
    assert(Topic.highWaterMark(spark, dir) === 1L, "second write must not append")
  }

  test("Overwrite is rejected: topics are append-only") {
    val dir = Files.createTempDirectory("topic-sink-ovr").toString + "/t"
    val e = intercept[Exception] {
      events(2).write.format("graft-topic").mode(SaveMode.Overwrite).save(dir)
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("missing path errors loudly") {
    val e = intercept[Exception] {
      events(1).write.format("graft-topic").mode(SaveMode.Append).save()
    }
    assert(e.getMessage.toLowerCase.contains("path"))
  }
}
