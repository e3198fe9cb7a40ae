package graft

import org.apache.spark.sql.functions._

/** Pins the round-10 window-skew rewrites: the skewsafe twins of
  * q54_range_frame and q88_rolling_median must produce EXACTLY the
  * naive per-key windows' rows — on the corpus, and on hand-built edge
  * fixtures exercising the seams the two-level split introduces (frame
  * bounds landing exactly on bucket boundaries, tied sort keys, frames
  * reaching across empty buckets, keys with fewer rows than the frame).
  */
class SkewSafeRewriteSpec extends SparkSpec {

  private def rows(name: String, dir: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq.map(_.toSeq)

  test("q54 skewsafe twin equals the naive range frame on the corpus") {
    assert(rows("q54_range_frame_skewsafe", sf) === rows("q54_range_frame", sf))
  }

  test("q88 skewsafe twin equals the naive rolling median on the corpus") {
    assert(rows("q88_rolling_median_skewsafe", sf) === rows("q88_rolling_median", sf))
  }

  test("q54 twin matches on hour-boundary, tied-timestamp, hot-user edges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skewsafe_ev").toString
    // seconds timeline with every seam: events exactly 3600 s apart
    // (the frame's CLOSED lower bound), events at exact hour multiples
    // (bucket boundaries), duplicate timestamps (RANGE peers), one hot
    // user holding most rows, gaps spanning several empty hours
    val ev = (0L until 600L).map { i =>
      val user = if (i % 7 == 0) i % 3 + 1 else 0L
      val es =
        if (i % 5 == 0) (i / 5) * 3600L            // exact hour multiples
        else if (i % 5 == 1) (i / 5) * 3600L       // duplicate of the above
        else if (i % 5 == 2) (i / 5) * 3600L + 3600L // exactly one frame away
        else (i / 5) * 7200L + (i % 13) * 97L      // lumpy, empty buckets
      (i, user, es * 1000000L, (i % 50) / 10.0)
    }
    ev.toDF("event_id", "user_id", "tus", "value")
      .select(col("event_id"), col("user_id"),
              timestamp_micros(col("tus")).as("ts"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(rows("q54_range_frame_skewsafe", dir) === rows("q54_range_frame", dir))
  }

  test("q88 twin matches on short-history, month-boundary, tied-date edges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skewsafe_ord").toString
    // customers with 1..12 orders: frames shorter than 5 rows, frames
    // reaching past month boundaries, customers skipping months, tied
    // order dates (tiebreak = orderkey), one whale customer
    val ord = (0L until 500L).map { i =>
      val cust = if (i % 4 == 0) i % 6 + 1 else 99L
      val day  = 1 + (i % 28).toInt
      val mo   = 1 + ((i * 3) % 17 % 12).toInt     // skips months
      val yr   = 1995 + (i % 3).toInt
      (i, cust, java.sql.Date.valueOf(f"$yr-$mo%02d-$day%02d"),
       ((i * 137) % 9000) / 100.0 + 10.0)
    }
    ord.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    assert(rows("q88_rolling_median_skewsafe", dir) === rows("q88_rolling_median", dir))
  }
}
