package graft

import org.apache.spark.sql.functions._

/** Recursive-CTE queries: semantics pinned against independent
  * non-recursive recomputation at sf0.001. */
class RecursiveSpec extends SparkSpec {

  test("q58_bom_explode: levels partition the part table and depths are exact") {
    val rows = SparkEntry.queries("q58_bom_explode")(spark, sf)
      .orderBy("depth").collect()
    val parts = Tables.part(spark, sf)
      .select("p_partkey").as[Long](spark.implicits.newLongEncoder).collect()

    // the strided walk's declared dependency: a DENSE key space (a gap
    // would let the stride reach past a missing intermediate parent)
    assert(parts.sorted.toSeq === (0L until parts.length.toLong).toSeq,
      "part keys must be contiguous 0..n-1 for the strided BOM walk")

    // every partkey >= 1 is reachable (parent chain k -> k div 2 ends at 1)
    val reachable = parts.count(_ >= 1L)
    assert(rows.map(_.getLong(1)).sum === reachable)

    // per-level membership matches floor(log2(k)) exactly
    val byDepth = parts.filter(_ >= 1L)
      .groupBy(k => 63 - java.lang.Long.numberOfLeadingZeros(k))
      .view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val d = r.getInt(0)
      assert(r.getLong(1) === byDepth(d), s"depth $d membership")
      // level key range is [2^d, 2^(d+1)) clipped to the table
      assert(r.getLong(2) === (1L << d).max(parts.filter(k => k >= (1L << d) && k < (2L << d)).min))
      assert(r.getLong(3) === parts.filter(k => k >= (1L << d) && k < (2L << d)).max)
    }

    // level price sums reconcile with the whole-table exact sum
    val total = Tables.part(spark, sf).filter(col("p_partkey") >= 1)
      .agg(graft.functions.Portable.dsum(col("p_retailprice"))).head.getDouble(0)
    assert(math.abs(rows.map(_.getDouble(4)).sum - total) < 1e-6)
  }

  test("el_forecast_eval: backtest reconciles with the smoothed series") {
    val f = SparkEntry.queries("el_ewma_forecast")(spark, sf)
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getDouble(2))) // (n_events, ewma)
    val errsE = f.sliding(2).map { case Array((_, l), (x, _)) => math.abs(x.toDouble - l) }.toSeq
    val errsN = f.sliding(2).map { case Array((p, _), (x, _)) => math.abs(x.toDouble - p) }.toSeq
    val r = SparkEntry.queries("el_forecast_eval")(spark, sf).head()
    assert(r.getLong(0) === (f.length - 1).toLong)
    assert(r.getDouble(1) === errsE.sum / errsE.size)
    assert(r.getDouble(2) === errsN.sum / errsN.size)
    assert(r.getLong(3) === errsE.zip(errsN).count { case (e, n) => e < n }.toLong)
  }

  test("el_holt_forecast: vector-state recurrence matches a sequential recompute, bit-exact") {
    val rows = SparkEntry.queries("el_holt_forecast")(spark, sf)
      .orderBy("day").collect()
    assert(rows.length === 30)
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
      .orderBy("day").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    var l = 0.0; var b = 0.0
    rows.zipWithIndex.foreach { case (r, i) =>
      val x = daily.getOrElse(r.getDate(0).toString, 0L)
      assert(r.getLong(1) === x)
      if (i == 0) { l = x.toDouble; b = 0.0; assert(r.isNullAt(4), "day 1 has no forecast") }
      else {
        val fc = l + b
        val lNew = (x.toDouble + l + b) / 2
        b = ((lNew - l) + b) / 2
        l = lNew
        assert(r.getDouble(4) === fc, s"forecast day ${i + 1}")
        assert(r.getDouble(5) === x.toDouble - fc)
      }
      assert(r.getDouble(2) === l, s"level day ${i + 1}")
      assert(r.getDouble(3) === b, s"trend day ${i + 1}")
    }
  }

  test("el_ewma_forecast: recurrence matches a sequential recompute, bit-exact") {
    val rows = SparkEntry.queries("el_ewma_forecast")(spark, sf)
      .orderBy("day").collect()
    assert(rows.length === 30) // fixture spans 30 calendar days

    // independent recompute: daily counts via a plain groupBy, then the
    // recurrence in driver scala (same (x + l) / 2 arithmetic)
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
      .orderBy("day").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    var level = 0.0
    rows.zipWithIndex.foreach { case (r, i) =>
      val day = r.getDate(0).toString
      val x = daily.getOrElse(day, 0L)
      assert(r.getLong(1) === x, s"count on $day")
      level = if (i == 0) x.toDouble else (x.toDouble + level) / 2
      assert(r.getDouble(2) === level, s"ewma on $day") // exact: alpha = 1/2
      assert(r.getDouble(3) === x.toDouble - level)
    }
  }
}
