package graft

import org.apache.spark.sql.functions._

/** Banded-skyline and sweep-line invariants at sf0.001, pinned against
  * quadratic driver-side recomputation (affordable here, never shipped). */
class SkylineSpec extends SparkSpec {

  test("q67_skyline equals the brute-force dominance check") {
    val pts = Tables.part(spark, sf)
      .select(functions.Portable.cents(col("p_retailprice")).as("cents"),
              col("p_size").cast("long").as("size"))
      .groupBy("cents", "size").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = pts.filter { case (c, z, _) =>
      !pts.exists { case (c2, z2, _) =>
        (c2 < c && z2 >= z) || (c2 <= c && z2 > z)
      }
    }.sortBy(_._1)
    val got = SparkEntry.queries("q67_skyline")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === brute.toSeq)
    // frontier shape: strictly increasing in both coordinates
    assert(got.map(_._1).toSeq === got.map(_._1).sorted.toSeq)
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq.distinct.sorted)
  }

  test("q68_weighted_median: true weighted order statistic per flag") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
              col("l_quantity").cast("long").as("qty"),
              functions.Portable.cents(col("l_extendedprice")).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = SparkEntry.queries("q68_weighted_median")(spark, sf).collect()
    got.foreach { r =>
      val flag = r.getString(0)
      val xs = rows.filter(_._1 == flag).sortBy(_._2)
      val tw = xs.map(_._3).sum
      assert(r.getLong(1) === tw, "total weight")
      assert(r.getLong(2) === xs.length.toLong, "row count")
      // smallest qty whose cumulative weight reaches half
      var cum = 0L
      val wm = xs.collectFirst { case (_, q, w) if { cum += w; 2 * cum >= tw } => q }.get
      assert(r.getLong(3) === wm, "weighted median")
      val mid = xs((xs.length - 1) / 2)._2 // lower median of sorted values
      assert(r.getLong(4) === mid, "plain median")
    }
  }

  test("el_peak_concurrency: per-day peak equals a driver-side sweep over session intervals") {
    val GapUs = 1800000000L
    val DayUs = 86400000000L
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // islands per user, inclusive 30-min gap
    val sessions = ev.groupBy(_._1).values.flatMap { xs =>
      val sorted = xs.sortBy(x => (x._2, x._3)).map(_._2)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var st = sorted.head; var last = sorted.head
      sorted.tail.foreach { t =>
        if (t - last > GapUs) { out += ((st, last + GapUs)); st = t }
        last = t
      }
      out += ((st, last + GapUs))
      out
    }.toSeq
    // exclusive-end sweep per day, clipped
    val byDay = sessions.flatMap { case (st, en) =>
      ((st / DayUs) to ((en - 1) / DayUs)).map { d =>
        (d, math.max(st, d * DayUs), math.min(en, (d + 1) * DayUs))
      }
    }.groupBy(_._1)
    val got = SparkEntry.queries("el_peak_concurrency")(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq === byDay.keys.toSeq.sorted)
    got.foreach { r =>
      val segs = byDay(r.getLong(0))
      assert(r.getLong(1) === segs.length.toLong, "n_sessions")
      val events = segs.flatMap { case (_, s, e) => Seq((s, 1), (e, -1)) }
        .sortBy(x => (x._1, x._2))
      var c = 0; var peak = 0
      events.foreach { case (_, dl) => c += dl; peak = math.max(peak, c) }
      assert(r.getLong(2) === peak.toLong, s"peak on day ${r.getLong(0)}")
    }
  }
}
