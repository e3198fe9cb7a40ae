package graft

import graft.queries.RelationalQueries11

/** q69's runtime-filter contract: under the scoped confs Catalyst
  * injects a Bloom semi-join reduction (bloom_filter_agg on the build
  * side, might_contain on the probe side), and the pruned plan returns
  * exactly the plain join's rows. */
class BloomJoinSpec extends SparkSpec {

  test("scoped confs inject bloom_filter_agg + might_contain into the optimized plan") {
    RelationalQueries11.withBloomConfs(spark) {
      val p = RelationalQueries11.bloomJoin(spark, sf).queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"), "probe-side predicate missing:\n" + p)
      assert(p.contains("bloom_filter_agg"), "build-side aggregate missing:\n" + p)
    }
  }

  test("without the confs no filter is injected (thresholds gate the rewrite)") {
    val p = RelationalQueries11.bloomJoin(spark, sf).queryExecution.optimizedPlan.toString
    assert(!p.contains("might_contain"), "unexpected injection:\n" + p)
  }

  test("bloom-pruned result is exactly the plain join (false positives only over-admit)") {
    val pruned = SparkEntry.queries("q69_bloom_semijoin")(spark, sf).collect()
    val plain  = RelationalQueries11.bloomJoin(spark, sf).collect()
    assert(pruned.toSeq === plain.toSeq)
  }
}
