package graft.queries

import graft.plans.AsOf
import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** `q85_asof_native` — the native as-of join ([[graft.plans.AsOfJoinExec]],
  * the repo's one custom LogicalPlan + SparkStrategy + SparkPlan) driven
  * through the declared-query gate: enrich every event with the user's
  * most recent order at-or-before the event time.
  *
  * The same point-in-time lookup already ships in composed form —
  * `q19_asof_join` (expanding inequality join + aggregate) and
  * `el_asof_snapshot`/`q74_asof_forward` (union + window
  * `last(ignoreNulls)`) — so this query is also the A/B anchor: identical
  * semantics, different physical plan. The native operator shuffles each
  * side once at native row width, streams a forward merge with O(1) state,
  * and expands zero rows; AsOfJoinSpec proves the merge against a composed
  * reference on nulls/ties/misses, and the oracle here hash-checks it
  * against DuckDB's window formulation on real data.
  *
  * The tie-break contract: equal (user, order timestamp) pairs resolve to
  * the largest o_orderkey on both sides of the comparison (physical sort
  * tie-break column ↔ `ORDER BY ots DESC, o_orderkey DESC` in the oracle),
  * so the hash match is exact even though o_orderdate has day granularity
  * and a user can place several orders the same day.
  */
object RelationalQueries16 {
  def defs: Map[String, Q] = Map(

    "q85_asof_native" -> Q(
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |o AS (
        |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ots,
        |         o_totalprice
        |  FROM orders),
        |j AS (
        |  SELECT e.event_id, o.o_orderkey, o.o_totalprice, o.ots,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.ots DESC, o.o_orderkey DESC) AS rn
        |  FROM e LEFT JOIN o ON e.user_id = o.o_custkey AND o.ots <= e.ts)
        |SELECT event_id, o_orderkey AS last_orderkey,
        |       o_totalprice AS last_order_price, ots AS last_order_ts
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_id", "user_id", "ts")
      val o = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("ots"), col("o_totalprice"))
      AsOf.join(e, o, Seq("user_id"), Seq("o_custkey"), "ts", "ots",
          rightTieBreak = Seq("o_orderkey"))
        .select(col("event_id"), col("o_orderkey").as("last_orderkey"),
          col("o_totalprice").as("last_order_price"), col("ots").as("last_order_ts"))
        .orderBy("event_id")
    },

    // The TOLERANCE variant (pandas merge_asof / kdb window-join parity):
    // same backward lookup, but an order more than 30 days old does not
    // match — the staleness bound every feature-store read wants. Same
    // plan as q85 (the bound is evaluated inside the streamed merge, zero
    // extra passes); the oracle adds the distance predicate to the
    // expanding-join formulation.
    "q86_asof_tolerance" -> Q(
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |o AS (
        |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ots,
        |         o_totalprice
        |  FROM orders),
        |j AS (
        |  SELECT e.event_id, o.o_orderkey, o.o_totalprice, o.ots,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.ots DESC, o.o_orderkey DESC) AS rn
        |  FROM e LEFT JOIN o ON e.user_id = o.o_custkey AND o.ots <= e.ts
        |                     AND epoch_us(e.ts) - epoch_us(o.ots) <= 2592000000000)
        |SELECT event_id, o_orderkey AS last_orderkey,
        |       o_totalprice AS last_order_price, ots AS last_order_ts
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_id", "user_id", "ts")
      val o = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("ots"), col("o_totalprice"))
      AsOf.join(e, o, Seq("user_id"), Seq("o_custkey"), "ts", "ots",
          rightTieBreak = Seq("o_orderkey"), tolerance = Some(2592000000000L))
        .select(col("event_id"), col("o_orderkey").as("last_orderkey"),
          col("o_totalprice").as("last_order_price"), col("ots").as("last_order_ts"))
        .orderBy("event_id")
    },

    // The FORWARD direction natively (q74_asof_forward composes it with a
    // join+aggregate): each event's NEXT order at-or-after the event time.
    // Equal-time ties resolve to the SMALLEST o_orderkey (forward's
    // first-in-sort-order contract, mirrored in the oracle's ASC window).
    "q87_asof_forward_native" -> Q(
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |o AS (
        |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ots,
        |         o_totalprice
        |  FROM orders),
        |j AS (
        |  SELECT e.event_id, o.o_orderkey, o.o_totalprice, o.ots,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.ots ASC, o.o_orderkey ASC) AS rn
        |  FROM e LEFT JOIN o ON e.user_id = o.o_custkey AND o.ots >= e.ts)
        |SELECT event_id, o_orderkey AS next_orderkey,
        |       o_totalprice AS next_order_price, ots AS next_order_ts
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_id", "user_id", "ts")
      val o = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("ots"), col("o_totalprice"))
      AsOf.join(e, o, Seq("user_id"), Seq("o_custkey"), "ts", "ots",
          rightTieBreak = Seq("o_orderkey"), forward = true)
        .select(col("event_id"), col("o_orderkey").as("next_orderkey"),
          col("o_totalprice").as("next_order_price"), col("ots").as("next_order_ts"))
        .orderBy("event_id")
    })
}
