package graft

import org.apache.spark.sql.functions._

/** ss_filtered_ann: the predicate must reach the scan (pre-filter
  * search), results must be true top-k WITHIN the filtered set, and the
  * shortfall column must equal what a post-filter would under-deliver. */
class FilteredAnnSpec extends SparkSpec {

  test("label predicate reaches PushedFilters; results are within-filter top-5") {
    val df = SparkEntry.queries("ss_filtered_ann")(spark, sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("LessThanOrEqual(label,4"), "filter not pushed to scan:\n" + p)
    val rows = df.collect()
    assert(rows.forall(_.getInt(2) <= 4), "a result escaped the predicate")
    // per query: ranks are 1..5 and cosine non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(4))
      assert(sorted.map(_.getInt(4)).toSeq === (1 to sorted.length))
      val cos = sorted.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("shortfall equals the unfiltered top-5's out-of-predicate count") {
    val rows = SparkEntry.queries("ss_filtered_ann")(spark, sf).collect()
    val plainTop = SparkEntry.queries("ss_cosine_topk")(spark, sf).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(rs => rs.count(_.getInt(2) > 4).toLong).toMap
    rows.foreach { r =>
      assert(r.getLong(5) === plainTop(r.getLong(0)),
        s"shortfall mismatch for query ${r.getLong(0)}")
    }
  }

  test("q74_asof_forward: per-order next event is the true minimum (driver replay)") {
    val ev = Tables.events(spark, sf).select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val got = SparkEntry.queries("q74_asof_forward")(spark, sf).collect()
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
              col("o_orderdate").cast("timestamp").as("od")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime)).toSeq
    val gotMap = got.map(r => r.getLong(0) -> (r.getTimestamp(1).getTime, r.getLong(2))).toMap
    orders.foreach { case (ok, cust, od) =>
      val future = ev.filter { case (u, t) => u == cust && t >= od }
      if (future.isEmpty) assert(!gotMap.contains(ok), s"order $ok should have no row")
      else {
        val (ts, n) = gotMap(ok)
        assert(ts === future.map(_._2).min && n === future.length.toLong, s"order $ok")
      }
    }
  }

  test("el_time_avg_concurrency: never exceeds the peak; identity with session seconds") {
    val avg = SparkEntry.queries("el_time_avg_concurrency")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val peak = SparkEntry.queries("el_peak_concurrency")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(avg.keySet === peak.keySet)
    avg.foreach { case (day, (nSeg, us, milli)) =>
      val (nSessions, pk) = peak(day)
      assert(nSeg === nSessions, "segment count = sweep's per-day session count")
      assert(milli === 1000L * us / 86400000000L, "exact truncating identity")
      assert(milli <= pk * 1000L, s"time-average above the peak on day $day")
    }
  }
}
