package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Transactional publish / read-committed consume: atomic visibility
  * across multi-batch transactions, abort and crash behavior, LSO, and
  * coexistence with the non-transactional publish paths.
  */
class TopicTxnSpec extends SparkSpec {
  import spark.implicits._

  private def freshTopic(): String =
    Files.createTempDirectory("txn-topic").toString + "/t"

  private def batch(ids: Range) =
    ids.map(i => (i.toLong, s"u${i % 3}", new java.sql.Timestamp(1700000000000L + i * 1000)))
      .toDF("event_id", "user_id", "ts")

  test("commit reveals all batches atomically; abort hides forever") {
    val dir = freshTopic()
    Topic.publish(batch(1 to 4), dir) // offsets 0..3, non-txn

    TopicTxn.publish(batch(5 to 6), dir, "tx1")
    TopicTxn.publish(batch(7 to 9), dir, "tx1") // multi-batch, same txn
    // invisible while pending; raw log already holds them (Kafka parity)
    assert(TopicTxn.readCommitted(spark, dir).count() === 4)
    assert(Topic.openReader(spark, dir).count() === 9)
    assert(TopicTxn.lastStableOffset(spark, dir) === 3L)

    TopicTxn.commit(spark, dir, "tx1")
    assert(TopicTxn.readCommitted(spark, dir).count() === 9)
    assert(TopicTxn.lastStableOffset(spark, dir) === 8L)
    TopicTxn.commit(spark, dir, "tx1") // idempotent

    TopicTxn.publish(batch(10 to 12), dir, "tx2")
    TopicTxn.abort(spark, dir, "tx2")
    assert(TopicTxn.readCommitted(spark, dir).count() === 9)
    assert(Topic.openReader(spark, dir).count() === 12) // rows stay on disk
    // aborted offsets are gaps; the next publish continues after them
    Topic.publish(batch(13 to 13), dir)
    val off = TopicTxn.readCommitted(spark, dir)
      .filter(col("event_id") === 13).select("offset").head.getLong(0)
    assert(off === 12L)
    // consume under read-committed skips the aborted range
    assert(TopicTxn.consumeCommitted(spark, dir, 9, 4).count() === 1)
  }

  test("state machine: single-use ids, illegal transitions are loud") {
    val dir = freshTopic()
    TopicTxn.publish(batch(1 to 2), dir, "tx")
    TopicTxn.abort(spark, dir, "tx")
    TopicTxn.abort(spark, dir, "tx") // idempotent
    intercept[IllegalStateException](TopicTxn.commit(spark, dir, "tx"))
    intercept[IllegalArgumentException](TopicTxn.publish(batch(3 to 4), dir, "tx"))
    intercept[IllegalStateException](TopicTxn.commit(spark, dir, "never-started"))
    intercept[IllegalArgumentException](TopicTxn.publish(batch(1 to 2), dir, "a.b"))
  }

  test("crashed producer: pending stays invisible; abortStale resolves it") {
    val dir = freshTopic()
    Topic.publish(batch(1 to 3), dir)
    TopicTxn.publish(batch(4 to 7), dir, "crashed") // producer dies here
    assert(TopicTxn.readCommitted(spark, dir).count() === 3)
    assert(TopicTxn.lastStableOffset(spark, dir) === 2L)

    assert(TopicTxn.abortStale(spark, dir, ttlMs = 3600000L).isEmpty) // too young
    Thread.sleep(20)
    assert(TopicTxn.abortStale(spark, dir, ttlMs = 10L) === Seq("crashed"))
    assert(TopicTxn.lastStableOffset(spark, dir) === 6L) // hwm: fate decided
    assert(TopicTxn.readCommitted(spark, dir).count() === 3)
  }

  test("a topic with no transactions reads unchanged; mixed topics interleave") {
    val dir = freshTopic()
    Topic.publish(batch(1 to 5), dir)
    assert(TopicTxn.readCommitted(spark, dir).count() === 5)
    assert(TopicTxn.lastStableOffset(spark, dir) === Topic.highWaterMark(spark, dir))

    // interleave: txn publish, then plain publish, then commit — the plain
    // rows are never blocked by the open transaction
    TopicTxn.publish(batch(6 to 7), dir, "mix")
    Topic.publish(batch(8 to 9), dir)
    assert(TopicTxn.readCommitted(spark, dir).count() === 7)
    TopicTxn.commit(spark, dir, "mix")
    assert(TopicTxn.readCommitted(spark, dir).count() === 9)
    // offsets stay dense and unique across all three publishes
    val offs = TopicTxn.readCommitted(spark, dir).select("offset")
      .collect().map(_.getLong(0)).sorted
    assert(offs === (0L to 8L).toArray)
  }
}
