package graft

import org.apache.spark.sql.functions._

/** Machine-checks the one declared query with no DuckDB oracle:
  * q29_hll_distinct (sketches differ across engines by design). The
  * check is the estimator's own contract — approx_count_distinct's
  * default relative standard deviation is 0.05, so a 3σ band of ±15%
  * around the exact distinct counts (q13's semantics) must hold at
  * every test scale.
  */
class SketchBoundsSpec extends SparkSpec {

  private val RelErr = 0.15

  test("q29 HLL estimates stay within 3-sigma of exact distinct counts") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val approx = SparkEntry.queries("q29_hll_distinct")(spark, dir)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val exact = Tables.lineitem(spark, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("parts"),
             countDistinct(col("l_suppkey")).as("supps"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(approx.keySet == exact.keySet, s"group drift at $dir")
      for ((flag, (eParts, eSupps)) <- exact) {
        val (aParts, aSupps) = approx(flag)
        assert(math.abs(aParts - eParts) <= RelErr * eParts,
          s"$dir $flag parts: approx $aParts vs exact $eParts")
        assert(math.abs(aSupps - eSupps) <= RelErr * eSupps,
          s"$dir $flag supps: approx $aSupps vs exact $eSupps")
      }
    }
  }
}
