package graft

/** Locks in the scale-audit plan shapes for the canonical queries so a
  * future refactor can't silently regress pushdown/broadcast/partial-agg
  * (the .explain review SURVEY.md §7 mandates, as assertions).
  */
class PlanAssertionsSpec extends SparkSpec {

  private def plan(name: String): String =
    // formatted mode: executedPlan.toString truncates long PushedFilters
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q01: shipdate filter pushes to the parquet scan; schema pruned") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "unused column not pruned:\n" + p)
  }

  test("q02: predicate pushdown on quantity and returnflag") {
    val p = plan("q02_filter_project")
    assert(p.contains("GreaterThan(l_quantity,45.0)") && p.contains("EqualTo(l_returnflag,R)"), p)
  }

  test("q04: dimension chain broadcasts") {
    val p = plan("q04_broadcast_dims")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("dd_minhash_sig: partial min aggregation before the exchange") {
    val p = plan("dd_minhash_sig")
    val firstAgg = p.indexOf("HashAggregate")
    val firstExchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && firstExchange >= 0, p)
    // partial aggregate appears below (later in the tree dump than) the
    // final agg, and there IS an exchange between agg phases
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("el_consume_offset: TakeOrderedAndProject, no global sort") {
    val p = plan("el_consume_offset")
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
