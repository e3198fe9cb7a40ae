package graft

/** The driver's t1 smoke contract: entry() returns rows on sf0.001, and
  * every declared query runs and is non-degenerate there.
  */
class EntrySmokeSpec extends SparkSpec {

  test("entry returns >0 rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries whose CORRECT answer is zero rows at sf0.001 (the oracle
    * confirms the emptiness): the anti-join finds customers without
    * orders, and at this scale every customer has one. */
  private val emptyAtTinyScale = Set("q06_anti_join")

  test("every declared query runs and is non-degenerate on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(name) {
        if (emptyAtTinyScale(name)) assert(n >= 0) else assert(n > 0)
      }
    }
  }

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }
}
