package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** `q90_interval_overlap` — the INTERVAL-OVERLAP join (Allen's-algebra
  * `overlaps` predicate), the temporal-join shape the suite's range join
  * (point-in-interval, el_range_join) and as-of join (nearest-preceding,
  * q19/q85) don't cover: pairs of INTERVALS that intersect, with the
  * intersection length.
  */
object RelationalQueries18 {

  val defs: Map[String, Q] = Map(

    // Per order: each line item occupies the shipping window
    // [l_shipdate, l_shipdate + quantity days]; count the item PAIRS
    // whose windows overlap and measure total/max overlap days — the
    // "how concurrent is fulfilment inside an order" read. Scale shape:
    // the pair generator is a CO-PARTITIONED self-equi-join on
    // l_orderkey (the overlap predicate is a residual filter, never a
    // theta join), so the fan-out is bounded by items-per-order (≤ 7 in
    // TPC-H-shaped data) at any corpus size; one map-side-combined
    // rollup per order follows. The general interval-overlap join
    // (unbounded key groups) adds the el_zorder/q72 grid-bucket move —
    // bucket by coarse time cell, join on cell, dedup — which q72
    // already demonstrates spatially.
    "q90_interval_overlap" -> Q(
      """WITH iv AS (
        |  SELECT l_orderkey, l_linenumber, l_shipdate AS s,
        |         l_shipdate + to_days(CAST(l_quantity AS INTEGER)) AS e
        |  FROM lineitem),
        |pairs AS (
        |  SELECT a.l_orderkey,
        |         CASE WHEN a.s <= b.e AND b.s <= a.e THEN 1 ELSE 0 END AS ov,
        |         CASE WHEN a.s <= b.e AND b.s <= a.e
        |              THEN date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1
        |              ELSE 0 END AS ov_days
        |  FROM iv a JOIN iv b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber)
        |SELECT l_orderkey,
        |       CAST(COUNT(*) AS BIGINT) AS item_pairs,
        |       CAST(SUM(ov) AS BIGINT) AS overlap_pairs,
        |       CAST(SUM(ov_days) AS BIGINT) AS overlap_days,
        |       CAST(MAX(ov_days) AS BIGINT) AS max_overlap_days
        |FROM pairs GROUP BY l_orderkey
        |HAVING SUM(ov) > 0
        |ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      val iv = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate").as("s"),
                expr("timestampadd(DAY, CAST(l_quantity AS INT), l_shipdate)").as("e"))
      val a = iv.select(col("l_orderkey"), col("l_linenumber").as("ln_a"),
                        col("s").as("s_a"), col("e").as("e_a"))
      val b = iv.select(col("l_orderkey"), col("l_linenumber").as("ln_b"),
                        col("s").as("s_b"), col("e").as("e_b"))
      val ov = col("s_a") <= col("e_b") && col("s_b") <= col("e_a")
      a.join(b, Seq("l_orderkey")).filter(col("ln_a") < col("ln_b"))
        .select(col("l_orderkey"),
                when(ov, 1L).otherwise(0L).as("ov"),
                when(ov, expr(
                  "timestampdiff(DAY, greatest(s_a, s_b), least(e_a, e_b))") + 1L)
                  .otherwise(0L).as("ov_days"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("item_pairs"),
             sum(col("ov")).as("overlap_pairs"),
             sum(col("ov_days")).as("overlap_days"),
             max(col("ov_days")).as("max_overlap_days"))
        .filter(col("overlap_pairs") > 0)
        .orderBy("l_orderkey")
    }
  )
}
