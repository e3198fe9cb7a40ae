package graft

import graft.plans.ApproxDistinctRewrite
import org.apache.spark.sql.functions._

/** The approx-distinct performance mode: conf-gated Rule[LogicalPlan]
  * that swaps exact COUNT(DISTINCT) for HLL++. Off = byte-identical
  * exact plans; on = sketch aggregate within the declared error. */
class ApproxRewriteSpec extends SparkSpec {

  private def withApprox[T](on: Boolean)(body: => T): T = {
    ApproxDistinctRewrite.install(spark)
    val old = spark.conf.getOption(ApproxDistinctRewrite.ConfKey)
    spark.conf.set(ApproxDistinctRewrite.ConfKey, on.toString)
    try body
    finally old.fold(spark.conf.unset(ApproxDistinctRewrite.ConfKey))(
      spark.conf.set(ApproxDistinctRewrite.ConfKey, _))
  }

  private def q = Tables.events(spark, sf)
    .groupBy("event_type")
    .agg(countDistinct(col("user_id")).as("users"),
         count(lit(1)).as("n"))

  test("conf off: plan keeps the exact distinct aggregate") {
    withApprox(on = false) {
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("count(distinct"), p)
      assert(!p.contains("approx_count_distinct"), p)
    }
  }

  test("conf on: COUNT(DISTINCT) becomes HLL++ and the estimate lands within rsd") {
    val exact = withApprox(on = false) {
      q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    withApprox(on = true) {
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("approx_count_distinct"), p)
      assert(!p.contains("count(distinct"), p)
      // plain count in the same aggregate is untouched
      val rows = q.collect()
      val total = Tables.events(spark, sf).count()
      assert(rows.map(_.getLong(2)).sum === total, "non-distinct count must stay exact")
      rows.foreach { r =>
        val est = r.getLong(1).toDouble
        val ex = exact(r.getString(0)).toDouble
        // default rsd 0.05; allow 5 sigma on small-cardinality groups
        assert(math.abs(est - ex) <= math.max(2.0, 0.25 * ex),
          s"${r.getString(0)}: est $est vs exact $ex")
      }
    }
  }

  test("multi-column distinct is out of scope and stays exact") {
    withApprox(on = true) {
      val p = Tables.events(spark, sf)
        .agg(countDistinct(col("user_id"), col("event_type")).as("pairs"))
        .queryExecution.optimizedPlan.toString
      assert(p.contains("count(distinct") && !p.contains("approx_count_distinct"), p)
    }
  }

  test("FILTER-clause distinct is out of scope and stays exact") {
    // RewriteDistinctAggregates expands a filtered distinct before user
    // rules run; the rule must not (and cannot) touch it
    val exact = withApprox(on = false) {
      Tables.events(spark, sf)
        .agg(expr("count(DISTINCT user_id) FILTER (WHERE event_type = 'click')"))
        .collect()(0).getLong(0)
    }
    withApprox(on = true) {
      val df = Tables.events(spark, sf)
        .agg(expr("count(DISTINCT user_id) FILTER (WHERE event_type = 'click')").as("click_users"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
      assert(df.collect()(0).getLong(0) === exact)
    }
  }
}
