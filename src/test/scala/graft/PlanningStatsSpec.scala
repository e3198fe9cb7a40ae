package graft

import org.apache.spark.sql.functions._

/** Contract checks for the StatsQueries3 planning batch + ta_ic_profile
  * — invariants recomputed driver-side with no shared code, on top of
  * the DuckDB hash gate.
  */
class PlanningStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("el_power_analysis: the sample-size formula is self-consistent") {
    val r = SparkEntry.queries("el_power_analysis")(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    def l(n: String) = row.getLong(row.fieldIndex(n))
    val (p0, p1, delta, varSum) = (l("p0_ppm"), l("p1_ppm"), l("delta_ppm"), l("var_sum"))
    assert(delta == math.abs(p1 - p0))
    assert(varSum == p0 * (1000000L - p0) + p1 * (1000000L - p1))
    if (delta > 0) {
      val den = 10000L * delta * delta
      val n = (78489L * varSum + den - 1) / den
      assert(l("n_per_arm") == n)
      val powered = row.getInt(row.fieldIndex("powered"))
      assert(powered == (if (l("n_exposed_min") >= n) 1 else 0))
      // the ceiling really is a ceiling: n−1 arms would be underpowered
      assert((n - 1) * den < 78489L * varSum + den - 1)
    }
  }

  test("el_trend_ols: totals cover the log and the rational slope is exact") {
    val rows = SparkEntry.queries("el_trend_ols")(spark, dir).collect()
    val nEvents = Tables.events(spark, dir).count()
    def l(r: org.apache.spark.sql.Row, n: String) = r.getLong(r.fieldIndex(n))
    assert(rows.map(l(_, "total")).sum == nEvents)
    rows.foreach { r =>
      assert(l(r, "den") > 0) // >1 distinct day per type in the fixture
      assert(l(r, "slope_milli") == l(r, "num") * 1000 / l(r, "den"))
    }
    // slope magnitude is bounded by the series range: |slope| ≤ max y
    val maxDaily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000"))
      .count().agg(max("count")).head.getLong(0)
    rows.foreach(r => assert(math.abs(l(r, "slope_milli")) <= maxDaily * 1000))
  }

  test("q76_hoover_index: bounds and segment cover") {
    val rows = SparkEntry.queries("q76_hoover_index")(spark, dir).collect()
    def l(r: org.apache.spark.sql.Row, n: String) = r.getLong(r.fieldIndex(n))
    assert(rows.map(l(_, "n_cust")).sum == Tables.customer(spark, dir).count())
    rows.foreach { r =>
      val h = l(r, "hoover_bp")
      assert(h >= 0 && h < 10000) // Hoover ∈ [0, 1); 10⁴ bp = total inequality
      // sum_absdev is even-ish in scale: ≤ 2·10⁶·N by construction
      assert(l(r, "sum_absdev") <= 2L * 1000000L * l(r, "n_cust"))
    }
  }

  test("q77_chi2_independence: margins, shares and scores reconcile") {
    val rows = SparkEntry.queries("q77_chi2_independence")(spark, dir).collect()
    def l(r: org.apache.spark.sql.Row, n: String) = r.getLong(r.fieldIndex(n))
    val nOrders = Tables.orders(spark, dir).count()
    assert(rows.map(l(_, "n")).sum == nOrders)
    rows.foreach { r =>
      assert(l(r, "obs_bp2") >= 0 && l(r, "obs_bp2") <= 100000000L)
      assert(l(r, "exp_bp2") >= 0 && l(r, "exp_bp2") <= 100000000L)
      assert(l(r, "dev_bp2") == l(r, "obs_bp2") - l(r, "exp_bp2"))
      if (!r.isNullAt(r.fieldIndex("cell_score")))
        assert(l(r, "cell_score") ==
          l(r, "dev_bp2") * l(r, "dev_bp2") / l(r, "exp_bp2"))
    }
    // priorities × statuses present in the fixture are all covered
    val cells = Tables.orders(spark, dir)
      .select("o_orderpriority", "o_orderstatus").distinct().count()
    assert(rows.length == cells)
  }

  test("el_drift_tv: shares cover each half and absent types report full drift") {
    val rows = SparkEntry.queries("el_drift_tv")(spark, dir).collect()
    def l(r: org.apache.spark.sql.Row, n: String) = r.getLong(r.fieldIndex(n))
    assert(rows.map(l(_, "n_a")).sum + rows.map(l(_, "n_b")).sum ==
           Tables.events(spark, dir).count())
    rows.foreach { r =>
      assert(l(r, "dev_bp") == l(r, "p_a_bp") - l(r, "p_b_bp"))
      assert(l(r, "p_a_bp") >= 0 && l(r, "p_a_bp") <= 10000)
      assert(l(r, "p_b_bp") >= 0 && l(r, "p_b_bp") <= 10000)
      // zero count FORCES zero share (the appear/disappear case); the
      // converse doesn't hold — a tiny type can round to 0 bp — so the
      // testable invariant is exactly one-directional
      assert(l(r, "n_a") > 0 || l(r, "p_a_bp") == 0)
      assert(l(r, "n_b") > 0 || l(r, "p_b_bp") == 0)
    }
    // each half's shares sum to ≤ 10000 (integer truncation) and > 9900
    assert(rows.map(l(_, "p_a_bp")).sum <= 10000 && rows.map(l(_, "p_a_bp")).sum > 9900)
    assert(rows.map(l(_, "p_b_bp")).sum <= 10000 && rows.map(l(_, "p_b_bp")).sum > 9900)
  }

  test("el_freshness: staleness, coverage and volume reconcile with raw scans") {
    val rows = SparkEntry.queries("el_freshness")(spark, dir).collect()
    def l(r: org.apache.spark.sql.Row, n: String) = r.getLong(r.fieldIndex(n))
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("tus")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val mx = ev.map(_._2).max
    val span = mx / 86400000000L - ev.map(_._2).min / 86400000000L + 1
    assert(rows.map(l(_, "n")).sum == ev.length)
    rows.foreach { r =>
      val et = r.getString(r.fieldIndex("event_type"))
      val mine = ev.filter(_._1 == et).map(_._2)
      assert(l(r, "last_tus") == mine.max)
      assert(l(r, "staleness_us") == mx - mine.max)
      assert(l(r, "span_days") == span)
      assert(l(r, "days_active") == mine.map(_ / 86400000000L).distinct.length)
      assert(l(r, "coverage_bp") == l(r, "days_active") * 10000 / span)
      assert(l(r, "mean_daily_milli") == l(r, "n") * 1000 / span)
    }
  }

  test("dd_dedup_shift: accounting reconciles with the cluster table") {
    val rows = SparkEntry.queries("dd_dedup_shift")(spark, dir).collect()
    def l(r: org.apache.spark.sql.Row, n: String) = r.getLong(r.fieldIndex(n))
    assert(rows.map(l(_, "n_before")).sum == Tables.documents(spark, dir).count())
    rows.foreach { r =>
      assert(l(r, "n_after") == l(r, "n_before") - l(r, "n_dropped"))
      assert(l(r, "shift_bp") == l(r, "share_after_bp") - l(r, "share_before_bp"))
    }
    // total drops = Σ (n_members − 1) over dd_dedup_survivors' clusters
    val clusterDrops = SparkEntry.queries("dd_dedup_survivors")(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("n_dropped"))).sum
    assert(rows.map(l(_, "n_dropped")).sum == clusterDrops)
  }

  test("ta_ic_profile: per-language stats bracket and sit in IC range") {
    val rows = SparkEntry.queries("ta_ic_profile")(spark, dir).collect()
    assert(rows.nonEmpty)
    def l(r: org.apache.spark.sql.Row, n: String) = r.getLong(r.fieldIndex(n))
    rows.foreach { r =>
      assert(l(r, "min_ic_bp") <= l(r, "mean_ic_bp"))
      assert(l(r, "mean_ic_bp") <= l(r, "max_ic_bp"))
      assert(l(r, "min_ic_bp") >= 0 && l(r, "max_ic_bp") <= 10000)
    }
    // languages cover every lang that has a ≥2-letter doc
    val langs = Tables.documents(spark, dir)
      .filter(length(col("text")) >= 2).select("lang").distinct().count()
    assert(rows.length >= 1 && rows.length <= langs)
  }
}
