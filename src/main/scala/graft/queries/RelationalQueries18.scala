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
    // items-per-order is BOUNDED (≤ 7 in TPC-H-shaped data), so the
    // whole pair space fits in one row — ONE groupBy gathers each
    // order's items into an array and the ≤ k² pair fold runs in-row,
    // replacing the self-equi-join's two corpus-scale sorts with a
    // single exchange. Same-window A/B against the join form (TimeQuery
    // warm): sf0.1 1.9 ≈ 1.9 s, sf1 join 1.6–2.0 vs fold 4.6 s (the
    // interpreted-HOF per-pair cost shows while the join's sorts still
    // fit in memory), **sf10 (60M rows) join 60.9–71.4 vs fold 28.9 s**
    // — the crossover: the join's sorts start spilling and degrade
    // super-linearly while the fold stays one exchange + linear in-row
    // work. The fold is kept because it is the form that survives scale
    // (the interpretation overhead is a bounded constant per pair; the
    // spill is not bounded). The general interval-overlap join
    // (unbounded key groups) adds the el_zorder/q72 grid-bucket move —
    // bucket by coarse time cell, join on cell, dedup — which q72
    // demonstrates spatially.
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
      // Round-8 codegen upgrade: the pair fold was a flatten(transform×2)
      // HOF pipeline — one interpreted boxed closure call per PAIR plus
      // three more interpreted passes (filter/aggregate/array_max) over a
      // materialized k² array — and at sf10 that interpretation made q90
      // the suite's most expensive query (28.9 s). graft_interval_pairs
      // (functions/IntervalPairs.scala) is the same arithmetic — strict
      // a.ln < b.ln pairing (duplicate line numbers pair in neither
      // orientation), inclusive whole-day intersections — as one primitive
      // loop inside whole-stage codegen: no pair array, exact integer
      // math, bit-identical results (oracle hash unchanged; sf1/sf10 A/B
      // in SCALING.md round 8).
      graft.functions.IntervalPairStats.register(s)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"),
                struct(col("l_linenumber").as("ln"), col("l_shipdate").as("st"),
                       expr("timestampadd(DAY, CAST(l_quantity AS INT), l_shipdate)")
                         .as("en")).as("it"))
        .groupBy("l_orderkey").agg(collect_list(col("it")).as("items"))
        .select(col("l_orderkey"),
                call_function("graft_interval_pairs", col("items")).as("ps"))
        .select(col("l_orderkey"),
                col("ps.item_pairs").as("item_pairs"),
                col("ps.overlap_pairs").as("overlap_pairs"),
                col("ps.overlap_days").as("overlap_days"),
                col("ps.max_overlap_days").as("max_overlap_days"))
        .filter(col("overlap_pairs") > 0)
        .orderBy("l_orderkey")
    }
  )
}
