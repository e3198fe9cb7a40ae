package graft

import org.apache.spark.sql.functions._

/** Invariants for the audit/monitoring batch (StatsQueries2 +
  * AuditQueries): each query is checked against an exact identity its own
  * columns must satisfy, or a brute-force recompute on the sf0.001 corpus.
  */
class AuditSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("el_changepoint_cusum: walk returns to zero; exactly one flagged peak magnitude") {
    val rows = run("el_changepoint_cusum").collect()
    // Σ dev = Σ (n·D − T) = T·D − D·T = 0, so the last cumulative is 0
    assert(rows.last.getAs[Long]("cusum") == 0L, "CUSUM walk must end at 0")
    // dev column really is n·D − T
    val d = rows.length.toLong
    val t = rows.map(_.getAs[Long]("n")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("dev") == r.getAs[Long]("n") * d - t)
    }
    // the flagged rows are exactly those at max |cusum|
    val peak = rows.map(r => math.abs(r.getAs[Long]("cusum"))).max
    rows.foreach { r =>
      val expect = if (math.abs(r.getAs[Long]("cusum")) == peak) 1 else 0
      assert(r.getAs[Int]("is_peak") == expect)
    }
    assert(rows.count(_.getAs[Int]("is_peak") == 1) >= 1)
  }

  test("el_acf: denominator is lag-independent Σdev²; pair counts shrink by one per lag") {
    val rows = run("el_acf").collect().sortBy(_.getAs[Int]("lag_d"))
    assert(rows.map(_.getAs[Int]("lag_d")).toSeq == (1 to 7))
    val dens = rows.map(_.getAs[Long]("den")).distinct
    assert(dens.length == 1 && dens.head > 0)
    // on a gap-free daily grid of D days, lag ℓ has D − ℓ pairs
    val days = run("el_changepoint_cusum").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == days - r.getAs[Int]("lag_d"))
    }
    // |acf| ≤ 1 in basis points (Cauchy–Schwarz)
    rows.foreach(r => assert(math.abs(r.getAs[Long]("acf_bp")) <= 10000L))
  }

  test("el_assoc_rules: symmetry, support bounds, confidence within [0, 10000]") {
    val rows = run("el_assoc_rules").collect()
    val byPair = rows.map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")) -> r).toMap
    rows.foreach { r =>
      // n_both is symmetric in (lhs, rhs); lift is too
      val mirror = byPair((r.getAs[String]("rhs"), r.getAs[String]("lhs")))
      assert(mirror.getAs[Long]("n_both") == r.getAs[Long]("n_both"))
      assert(mirror.getAs[Long]("lift_bp") == r.getAs[Long]("lift_bp"))
      // support ≤ min of the marginals; confidence = support/lhs in bp
      assert(r.getAs[Long]("n_both") <=
        math.min(r.getAs[Long]("n_lhs"), r.getAs[Long]("n_rhs")))
      val conf = r.getAs[Long]("confidence_bp")
      assert(conf >= 0L && conf <= 10000L)
      assert(conf == r.getAs[Long]("n_both") * 10000L / r.getAs[Long]("n_lhs"))
    }
  }

  test("q64_benford: digit shares account for every order; expectation sums to 10000") {
    val rows = run("q64_benford").collect()
    assert(rows.map(_.getAs[Long]("expected_bp")).sum == 10000L)
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.orders(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_bp") ==
        r.getAs[Long]("share_bp") - r.getAs[Long]("expected_bp"))
    }
  }

  test("q65_column_profile: brute-force recompute of the o_custkey row") {
    val o = Tables.orders(spark, sf)
    val r = run("q65_column_profile").collect()
      .find(_.getAs[String]("col_name") == "o_custkey").get
    assert(r.getAs[Long]("n_rows") == o.count())
    assert(r.getAs[Long]("n_null") ==
      o.filter(col("o_custkey").isNull).count())
    assert(r.getAs[Long]("n_distinct") ==
      o.select("o_custkey").distinct().count())
    assert(r.getAs[String]("min_repr") ==
      o.agg(min("o_custkey")).head().getLong(0).toString)
    assert(r.getAs[String]("max_repr") ==
      o.agg(max("o_custkey")).head().getLong(0).toString)
  }

  test("ta_simpson_diversity: brute-force recompute of one source") {
    val rows = run("ta_simpson_diversity").collect()
    val src = rows.head.getAs[String]("source")
    val toks = Tables.documents(spark, sf)
      .filter(col("source") === src)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect().map(_.getAs[Long]("count"))
    val r = rows.find(_.getAs[String]("source") == src).get
    assert(r.getAs[Long]("n_tokens") == toks.sum)
    assert(r.getAs[Long]("n_types") == toks.length.toLong)
    assert(r.getAs[Long]("num") == toks.map(n => n * (n - 1)).sum)
    assert(r.getAs[Long]("den") == toks.sum * (toks.sum - 1))
    // Simpson of a nonempty distribution lies in [1/types, 1] (scaled ppm)
    assert(r.getAs[Long]("simpson_ppm") >= 0L &&
           r.getAs[Long]("simpson_ppm") <= 1000000L)
  }

  test("dd_dup_rate_by_source: per-source accounting matches dd_exact's corpus view") {
    val rows = run("dd_dup_rate_by_source").collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dups") ==
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_unique"))
      assert(r.getAs[Long]("n_unique") >= 1L)
    }
    // corpus-wide distinct texts can only merge across sources, never split
    val corpusUnique = docs.select(md5(col("text"))).distinct().count()
    assert(rows.map(_.getAs[Long]("n_unique")).sum >= corpusUnique)
  }

  test("ss_ivf_balance: shares account for every vector; deviations center on uniform") {
    val rows = run("ss_ivf_balance").collect()
    val total = rows.head.getAs[Long]("total")
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(total == Tables.embeddings(spark, sf).count())
    val cells = rows.head.getAs[Long]("n_cells")
    assert(rows.length.toLong == cells)
    // Σ n·cells = total·cells ⇒ mean dev_bp ≈ 0 up to truncation
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_bp") >= -10000L)
      assert(r.getAs[Long]("share_bp") <= 10000L)
    }
  }

  test("ss_dim_profile: one row per dimension; n = vector count; min ≤ mean ≤ max") {
    val rows = run("ss_dim_profile").collect()
    assert(rows.length == 64)
    val vecs = Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == vecs)
      val mn = r.getAs[Long]("min_micro"); val mx = r.getAs[Long]("max_micro")
      val mean = r.getAs[Long]("sum_micro").toDouble / vecs
      assert(mn <= mean && mean <= mx)
      // Σx² ≥ (Σx)²/n (Cauchy–Schwarz → non-negative variance)
      assert(r.getAs[Long]("sumsq_micro").toDouble >=
        math.pow(r.getAs[Long]("sum_micro").toDouble, 2) / vecs - 1e-6)
    }
  }
}
