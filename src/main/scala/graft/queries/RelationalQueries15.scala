package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `q82_eager_agg` — eager aggregation (Yan & Larson, VLDB '95): push a
  * partial GROUP BY below a join when the aggregate's groups are
  * functionally determined through the join key. The canonical
  * fact-to-fact case: revenue per order priority needs
  * lineitem ⋈ orders, but lineitem only contributes SUMs keyed by
  * l_orderkey — so aggregate lineitem to one row per order FIRST
  * (map-side combined, 60k→15k rows at sf0.01, 6M→1.5M at sf1), then
  * join the collapsed form 1:1 against orders and re-aggregate to the
  * 5 priorities.
  *
  * Why it matters at 100 TB: the join's shuffle moves the COLLAPSED
  * relation (one narrow row per order) instead of every line item —
  * the wire cost drops by the per-key multiplicity (~4× here, 10-100×
  * on real fact tables), and the join hash tables shrink the same way.
  * Catalyst does not perform this rewrite (no
  * PushPartialAggregationThroughJoin in Spark 4.1), so it is declared
  * by hand — this query IS the transformation, and EagerAggSpec proves
  * the two claims that make it safe and worth it: bit-identical
  * results vs the naive form (the oracle runs the naive form), and
  * measurably fewer shuffled bytes.
  *
  * The decomposition rule (the part reviewers get wrong): SUM/COUNT
  * decompose through the pre-aggregation (Σ over a partition of
  * partials = Σ), COUNT becomes a SUM of partial counts, AVG must be
  * carried as (sum, count) — and per-ORDER aggregates like
  * n_orders are counted AFTER the collapse, where each order is
  * exactly one row, so no DISTINCT is ever shuffled.
  */
object RelationalQueries15 {

  def defs: Map[String, Q] = Map(
    "q82_eager_agg" -> Q(
      """SELECT o_orderpriority,
        |       CAST(COUNT(*) AS BIGINT) AS n_items,
        |       CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
        |       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_cents
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      eager(s, d)
    }
  )

  /** The eager (pushed) form — the declared plan. */
  private[graft] def eager(s: SparkSession, d: String): DataFrame = {
    val perOrder = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
              col("l_quantity").cast("long").as("q"),
              Portable.cents(col("l_extendedprice")).as("cents"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("pn"), sum(col("q")).as("pq"), sum(col("cents")).as("pc"))
    perOrder
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(col("pn")).as("n_items"),
           // post-collapse each order is ONE row: a plain count is the
           // distinct order count, nothing distinct ever shuffles
           count(lit(1)).as("n_orders"),
           sum(col("pq")).as("sum_qty"),
           sum(col("pc")).as("revenue_cents"))
      .orderBy("o_orderpriority")
  }

  /** The naive form (join first, aggregate after) — the baseline the
    * spec races and equates. */
  private[graft] def naive(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"),
              col("l_quantity").cast("long").as("q"),
              Portable.cents(col("l_extendedprice")).as("cents"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
           countDistinct(col("o_orderkey")).as("n_orders"),
           sum(col("q")).as("sum_qty"),
           sum(col("cents")).as("revenue_cents"))
      .orderBy("o_orderpriority")
}
