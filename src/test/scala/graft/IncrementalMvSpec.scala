package graft

import graft.queries.RelationalQueries11
import org.apache.spark.sql.functions._

/** q70's contract: merge-of-partials equals the full recompute, and the
  * declared plan aggregates ONLY the delta — the base partition arrives
  * via the stored MV artifact, never a second fact-table scan. */
class IncrementalMvSpec extends SparkSpec {

  test("merged MV equals the full recompute") {
    val got = SparkEntry.queries("q70_incremental_mv")(spark, sf).collect()
    val full = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
           sum(col("l_quantity").cast("long")).as("sum_qty"),
           sum(functions.Portable.cents(col("l_extendedprice"))).as("revenue_cents"),
           min(date_format(col("l_shipdate"), "yyyy-MM-dd")).as("min_shipdate"),
           max(date_format(col("l_shipdate"), "yyyy-MM-dd")).as("max_shipdate"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(got.toSeq === full.toSeq)
  }

  test("declared plan scans lineitem once (delta only); base comes from the artifact") {
    RelationalQueries11.baseMv(spark, sf) // ensure the artifact exists
    val p = SparkEntry.queries("q70_incremental_mv")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val factScans = "lineitem\\.parquet".r.findAllIn(p).size
    assert(factScans === 1, s"expected exactly one fact scan, got $factScans:\n" + p)
    assert(p.contains("mv-lineitem-rev"), "base MV artifact not in the plan:\n" + p)
  }

  test("artifact invalidation retrains and still matches") {
    ArtifactStore.invalidate(spark, sf)
    val again = SparkEntry.queries("q70_incremental_mv")(spark, sf).collect()
    val first = SparkEntry.queries("q70_incremental_mv")(spark, sf).collect()
    assert(again.toSeq === first.toSeq)
  }
}
