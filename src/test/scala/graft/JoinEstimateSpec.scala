package graft

import org.apache.spark.sql.functions._

/** q81_join_estimate: the exact column must equal the REAL join's row
  * count (the thing the estimator predicts), the estimate must land
  * within a usable band, and the saturated regime (domain < K) must
  * degrade to exactness.
  */
class JoinEstimateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("exact_rows matches the materialized join; estimates land in band") {
    val rows = SparkEntry.queries("q81_join_estimate")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    def l(n: String, c: String) = rows(n).getLong(rows(n).fieldIndex(c))

    val ev = Tables.events(spark, dir).select(col("user_id"))
    val o = Tables.orders(spark, dir)
    val realJ1 = ev.join(o.select(col("o_custkey")),
      col("user_id") === col("o_custkey")).count()
    assert(l("events_orders_cust", "exact_rows") == realJ1)

    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"))
    val realJ2 = li.join(o.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(l("lineitem_orders_okey", "exact_rows") == realJ2)

    // usable-estimate band: K=256 gives ~6% distinct error; the
    // multiplicity-weighted sum inflates variance on the many-many
    // join, so the band is 30% — the decision this feeds (shuffle vs
    // broadcast vs refuse) only needs the order of magnitude
    rows.values.foreach { r =>
      val err = r.getLong(r.fieldIndex("err_bp"))
      assert(err < 3000, s"${r.getString(0)} err_bp=$err exceeds 30%")
    }
  }

  test("a domain smaller than K saturates the sketch: estimate IS exact") {
    import spark.implicits._
    val a = (1 to 40).flatMap(k => Seq.fill(k % 5 + 1)(k.toLong)).toDF("k")
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    val b = (20 to 60).flatMap(k => Seq.fill(k % 3 + 1)(k.toLong)).toDF("k")
      .groupBy("k").agg(count(lit(1)).as("cnt"))
    val r = graft.queries.RelationalQueries14.estimateJoin("tiny", a, b).head()
    def g(c: String) = r.getLong(r.fieldIndex(c))
    assert(g("d_est") == 60)            // |1..40 ∪ 20..60| = 60 < K → d_est is the exact count
    assert(g("est_rows") == g("exact_rows"))
    assert(g("err_bp") == 0L)
  }
}
