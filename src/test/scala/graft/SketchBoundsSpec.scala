package graft

import org.apache.spark.sql.functions._

/** Error-bound checks for the sketch-distinct family.
  *
  * q29_hll_distinct is now the DETERMINISTIC portable HLL (m = 64
  * registers, oracle hash-checked), so the bound here is the estimator's
  * own contract: relative standard error 1.04/√64 ≈ 13%, 3σ ≈ 39%. The
  * raw estimator (no linear-counting correction — ln isn't bit-portable)
  * overestimates when n ≲ 2.5·m, so the band is the honest raw-HLL band,
  * not the corrected one.
  *
  * Spark's native approx_count_distinct (engine-specific sketch, hence
  * not declarable against a DuckDB oracle) keeps its 3σ = ±15% check
  * here so the built-in path stays covered too.
  */
class SketchBoundsSpec extends SparkSpec {

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  test("q29 portable HLL estimates stay within 3-sigma of exact distinct") {
    for (dir <- dirs) {
      val rows = SparkEntry.queries("q29_hll_distinct")(spark, dir).collect()
      assert(rows.nonEmpty, s"no groups at $dir")
      for (r <- rows) {
        val est   = r.getDouble(r.fieldIndex("hll_estimate"))
        val exact = r.getLong(r.fieldIndex("exact_distinct"))
        assert(math.abs(est - exact) <= 0.39 * exact,
          s"$dir ${r.getString(0)}: HLL $est vs exact $exact")
        // internal consistency: reg_sum ∈ [64, 64·2^55], zero_regs ∈ [0, 64]
        val regSum = r.getLong(r.fieldIndex("reg_sum"))
        val zeros  = r.getInt(r.fieldIndex("zero_regs"))
        assert(regSum >= 64L && regSum <= 64L * (1L << 55))
        assert(zeros >= 0 && zeros <= 64)
      }
    }
  }

  test("native approx_count_distinct stays within 3-sigma (rsd=0.05) bands") {
    for (dir <- dirs) {
      val rows = Tables.lineitem(spark, dir)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
             countDistinct(col("l_partkey")).as("exact_parts"),
             approx_count_distinct(col("l_suppkey")).as("approx_supps"),
             countDistinct(col("l_suppkey")).as("exact_supps"))
        .collect()
      assert(rows.nonEmpty)
      for (r <- rows) {
        assert(math.abs(r.getLong(1) - r.getLong(2)) <= 0.15 * r.getLong(2),
          s"$dir ${r.getString(0)} parts: ${r.getLong(1)} vs ${r.getLong(2)}")
        assert(math.abs(r.getLong(3) - r.getLong(4)) <= 0.15 * r.getLong(4),
          s"$dir ${r.getString(0)} supps: ${r.getLong(3)} vs ${r.getLong(4)}")
      }
    }
  }

  test("q60_join_card_est: CM inner product upper-bounds the exact join size at both SFs") {
    dirs.foreach { d =>
      val r = SparkEntry.queries("q60_join_card_est")(spark, d).head()
      val (exact, est, worst) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(exact > 0, s"$d: degenerate fixture")
      assert(est >= exact, s"$d: CM estimate must never undercount")
      assert(worst >= est, s"$d: min row cannot exceed max row")
      // independent exact recompute via a plain join count
      val ev = Tables.events(spark, d).select(col("user_id").as("k"))
      val or = Tables.orders(spark, d).select(col("o_custkey").as("k"))
      assert(ev.join(or, "k").count() === exact, s"$d: exact side")
    }
  }
}
