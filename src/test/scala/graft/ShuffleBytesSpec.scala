package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** MEASURED shuffle accounting. PlanAssertionsSpec reads plans; this
  * spec reads the actual task metrics, because the scale claims that
  * matter are about BYTES: "the narrow projection rides the shuffle,
  * never the payload" is only true if the shuffled bytes are a small
  * multiple of (rows × key width), and a plan can look right while a
  * stray `select(*)` upstream quietly shuffles every column.
  *
  * Method: a SparkListener sums shuffle write bytes across all tasks
  * while one query runs (the suite's session is exclusive to the
  * test, so attribution is by time window — the house pattern for
  * metrics tests). Bounds are generous (4×) over the back-of-envelope
  * so fixture drift doesn't flake them, but tight enough that
  * shuffling a payload column (~100+ bytes/row vs ~16) trips the
  * assert immediately.
  */
class ShuffleBytesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def measuredShuffleWrite(df: => DataFrame): (Long, Long) = {
    val written = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) written.add(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = df.count()
      // listener delivery is async and the bus has no public drain —
      // settle-poll: done when the sum is stable across two reads
      var prev = -1L; var cur = written.sum(); var tries = 0
      while (cur != prev && tries < 50) {
        Thread.sleep(200); prev = cur; cur = written.sum(); tries += 1
      }
      (cur, n)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("q81's estimator shuffles key-width aggregates, not payloads") {
    val (bytes, _) = measuredShuffleWrite(
      SparkEntry.queries("q81_join_estimate")(spark, dir))
    // per-key counts for ~32k distinct keys across both joins: two
    // longs each ≈ 16 B + record overhead. Budget 4 MB — a lineitem
    // payload shuffle (60k rows × ~150 B × partial-agg copies) would
    // blow well past it.
    assert(bytes > 0, "expected the per-key count aggregates to shuffle")
    assert(bytes < (4L << 20),
      s"q81 shuffled $bytes bytes — the fact payload is riding the shuffle")
  }

  test("q80's HRW assignment shuffles only the occupancy rollups") {
    val (bytes, _) = measuredShuffleWrite(
      SparkEntry.queries("q80_rendezvous_shard")(spark, dir))
    // two 6-row aggregations + a 6-row join: partial aggregates are
    // per-partition × 6 nodes × a few longs. Budget 256 KB — a per-key
    // exploded window implementation would shuffle all 1500 keys × 6
    // hashes and overshoot instantly.
    assert(bytes < (256L << 10),
      s"q80 shuffled $bytes bytes — assignment is not map-only")
  }

  test("q01's aggregation shuffle is bounded by group cardinality, not rows") {
    val (bytes, _) = measuredShuffleWrite(
      SparkEntry.queries("q01_pricing_summary")(spark, dir))
    // map-side combine leaves ≤ (partitions × groups) partial rows on
    // the wire: 32 × 4 groups × ~100 B ≈ 13 KB. Budget 1 MB; without
    // partial aggregation this would be 60k rows × ~60 B ≈ 4 MB.
    assert(bytes < (1L << 20),
      s"q01 shuffled $bytes bytes — partial aggregation is not engaging")
  }
}
