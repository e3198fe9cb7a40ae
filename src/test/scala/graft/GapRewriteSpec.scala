package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the round-9 window-skew rewrite: FunnelQueries.gapsTwoLevel must
  * produce EXACTLY the naive per-user LAG window's gap multiset — on the
  * corpus and on a hot-key fixture where one user holds most rows (the
  * shape the rewrite exists for), including bucket-boundary and
  * equal-timestamp edges.
  */
class GapRewriteSpec extends SparkSpec {

  private def naiveGaps(events: DataFrame): Map[Long, Long] = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy("gap_us").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def twoLevelGaps(events: DataFrame): Map[Long, Long] =
    queries.FunnelQueries.gapsTwoLevel(events)
      .groupBy("gap_us").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-level gaps equal the naive window on the corpus") {
    val ev = Tables.events(spark, sf)
    assert(twoLevelGaps(ev) === naiveGaps(ev))
  }

  test("two-level gaps equal the naive window on a hot-user fixture with ties") {
    import spark.implicits._
    // user 0 holds 90% of rows; gaps include zero (duplicate tus), exact
    // 6h-bucket-boundary multiples, and gaps spanning several empty
    // buckets. ts values are µs-exact timestamps.
    val bucketUs = 21600000000L
    val rows = (0L until 2000L).map { i =>
      val user = if (i % 10 == 0) i % 100 + 1 else 0L
      // deterministic, deliberately lumpy timeline: multiples of 1/3
      // bucket plus duplicates every 7th event
      val tus = (i / 7) * (bucketUs / 3) + (i % 3) * 1234567L
      (i, user, tus)
    }
    val ev = rows.toDF("event_id", "user_id", "tus")
      .select(col("event_id"), col("user_id"),
              timestamp_micros(col("tus")).as("ts"))
    val naive = naiveGaps(ev)
    val two = twoLevelGaps(ev)
    assert(two === naive)
    // the fixture exercises all three edges
    assert(naive.contains(0L), "fixture must contain duplicate-tus gaps")
    assert(naive.keys.exists(_ > bucketUs), "fixture must span empty buckets")
  }
}
