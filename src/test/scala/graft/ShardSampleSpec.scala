package graft

import org.apache.spark.sql.functions._

/** q78_weighted_sample (A-ES via max-of-w-uniforms) and
  * q80_rendezvous_shard (HRW resharding): distribution/placement
  * properties the DuckDB hash-compare can't express, plus the plan
  * shapes that make both 100 TB-safe.
  */
class ShardSampleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q78: top-k plan, key bounds, and weight bias toward heavy orders") {
    val df = SparkEntry.queries("q78_weighted_sample")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // top-k must be TakeOrderedAndProject — never a full sort of the corpus
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
    val rows = df.collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val w = r.getLong(r.fieldIndex("weight"))
      val k = r.getLong(r.fieldIndex("es_key"))
      assert(w >= 1 && w <= 8)
      assert(k >= 0 && k < 1000000)
    }
    // the whole point of weighting: the sampled mean weight must sit
    // clearly above the corpus mean (max-of-w keys grow with w)
    val sampledMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    val corpusMean = Tables.orders(spark, dir)
      .select(least(lit(8L),
        lit(1L) + expr("cast(round(o_totalprice * 100) as bigint) div 5000000")).as("w"))
      .agg(avg("w")).head.getDouble(0)
    assert(sampledMean > corpusMean + 0.5,
      s"sampled mean weight $sampledMean should exceed corpus mean $corpusMean")
    // determinism: a second run returns the identical sample
    val again = SparkEntry.queries("q78_weighted_sample")(spark, dir).collect()
    assert(rows.map(_.toSeq.toList).toList == again.map(_.toSeq.toList).toList)
  }

  test("q80: HRW moves keys ONLY to the new node, at ~1/(N+1) churn") {
    val rows = SparkEntry.queries("q80_rendezvous_shard")(spark, dir).collect()
    def l(r: org.apache.spark.sql.Row, n: String) = r.getLong(r.fieldIndex(n))
    assert(rows.length == 6)
    val byNode = rows.map(r => r.getInt(0) -> r).toMap
    val total = rows.map(l(_, "n_after")).sum
    assert(total == Tables.customer(spark, dir).count())
    assert(rows.map(l(_, "n_before")).sum == total)
    // the rendezvous invariant: arrivals happen ONLY at the added node
    (0 until 5).foreach { n => assert(l(byNode(n), "n_arrived") == 0L,
      s"node $n must receive no keys on scale-up") }
    assert(l(byNode(5), "n_before") == 0L)
    assert(l(byNode(5), "n_arrived") == l(byNode(5), "n_after"))
    // churn ≈ 1/6 of keys (binomial band, generous ±50% relative)
    val moved = l(byNode(5), "n_after").toDouble / total
    assert(moved > 1.0 / 12 && moved < 1.0 / 4,
      s"moved fraction $moved should be near 1/6")
    // existing nodes only SHRINK (n_after <= n_before), never grow
    (0 until 5).foreach { n =>
      assert(l(byNode(n), "n_after") <= l(byNode(n), "n_before")) }
    // the per-row assignment is a map-only projection: the only
    // exchanges in the plan are the two tiny occupancy rollups + the
    // final 6-row join — no per-key window, no explode
    val plan = SparkEntry.queries("q80_rendezvous_shard")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), "assignment must not explode nodes per key")
    assert(!plan.contains("Window"), "assignment must not use a per-key window")
  }
}
