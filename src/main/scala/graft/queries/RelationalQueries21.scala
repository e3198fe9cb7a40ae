package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import org.apache.spark.sql.functions._

/** Round-9 relational batch: the four remaining classic TPC-H decision-
  * support shapes the suite didn't yet cover, each adapted to the corpus
  * schema (no partsupp/receiptdate here) and each carrying the shape's
  * defining optimizer challenge:
  *
  *   - `q96_waiting_suppliers` (TPC-H Q21): the double correlated
  *     EXISTS / NOT EXISTS self-join over lineitem — the hardest TPC-H
  *     query for most engines. The oracle is the LITERAL exists shape;
  *     the Spark plan is the aggregate rewrite (per-order supplier/late
  *     census), which is algebraically identical and turns two
  *     corpus-scale self-joins into one orderkey-keyed aggregate.
  *   - `q97_fair_share` (TPC-H Q20): nested IN-subqueries with a
  *     correlated aggregate threshold — who ships more than 2× the
  *     fair share of a part's quantity.
  *   - `q98_small_qty_revenue` (TPC-H Q17): correlated scalar subquery
  *     per part (quantity below half the part's mean).
  *   - `q99_dormant_customers` (TPC-H Q22): global scalar-subquery
  *     threshold + anti join (above-average balance, no recent orders).
  *
  * Money/quantity comparisons are exact-integer throughout: cents on
  * both sides, thresholds as integer cross-multiplications (2·q·n < Σq,
  * q·n > 2·Σ/n ⇒ q·n_supp > 2·tot), never a float boundary.
  */
object RelationalQueries21 {

  val defs: Map[String, Q] = Map(

    // TPC-H Q21 shape: suppliers who were the SOLE late shipper in a
    // multi-supplier 'F' order ("late" = shipped >120 days after the
    // order date — this schema has no receipt/commit dates). The oracle
    // keeps Q21's literal EXISTS/NOT-EXISTS formulation; the Spark side
    // runs the scale-correct rewrite: per (order, supplier) late-flag,
    // then a per-order census — an order qualifies iff n_supp > 1 and
    // exactly one supplier is late. Equivalence: "∃ other supplier ∧
    // ∄ other LATE supplier ∧ s late" ⇔ "late-set = {s} ∧ supp-set ⊋
    // {s}". Scale shape: one lineitem⋈orders shuffle on orderkey (the
    // honest join), two orderkey-local aggregates, then a
    // |supplier|-bounded rollup + top-k — no self-join ever
    // materializes, vs the literal plan's two extra corpus-scale joins.
    "q96_waiting_suppliers" -> Q(
      """WITH base AS (
        |  SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
        |  FROM lineitem l1 JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |    AND l1.l_shipdate > o.o_orderdate + INTERVAL 120 DAY
        |    AND EXISTS (SELECT 1 FROM lineitem l2
        |                WHERE l2.l_orderkey = l1.l_orderkey
        |                  AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        |                    WHERE l3.l_orderkey = l1.l_orderkey
        |                      AND l3.l_suppkey <> l1.l_suppkey
        |                      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 120 DAY))
        |SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
        |FROM base GROUP BY 1
        |ORDER BY numwait DESC, l_suppkey LIMIT 10""".stripMargin) { (s, d) =>
      val lo = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
                .select(col("o_orderkey"), col("o_orderdate")),
              col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
                when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 120 DAYS"), 1)
                  .otherwise(0).as("late"))
      val perOs = lo.groupBy("l_orderkey", "l_suppkey").agg(max("late").as("late"))
      perOs.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late"),
             max(when(col("late") === 1, col("l_suppkey"))).as("l_suppkey"))
        .filter(col("n_supp") > 1 && col("n_late") === 1)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).cast("long").as("numwait"))
        .orderBy(col("numwait").desc, col("l_suppkey"))
        .limit(10)
    },

    // TPC-H Q20 shape: suppliers shipping MORE THAN 2× THE FAIR SHARE
    // of a widget part's total quantity (fair share = total/n_suppliers;
    // the threshold is share-relative, so the qualifying set is stable
    // under corpus replication — an absolute fraction like Q20's 50%
    // goes empty as supplier count grows). Integer form:
    // qty·n_supp > 2·total. Scale shape: lineitem filtered by the
    // broadcast widget-part dim, one (suppkey, partkey) map-side-combined
    // aggregate, a partkey-keyed join of two aggregates of the SAME
    // relation, then a |supplier|-bounded rollup.
    "q97_fair_share" -> Q(
      """WITH wp AS (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'),
        |sp AS (SELECT l_suppkey, l_partkey,
        |              SUM(CAST(round(l_quantity*100) AS BIGINT)) AS qty_c
        |       FROM lineitem JOIN wp ON l_partkey = p_partkey GROUP BY 1,2),
        |pt AS (SELECT l_partkey, SUM(qty_c) AS tot_c, COUNT(*) AS n_supp
        |       FROM sp GROUP BY 1)
        |SELECT l_suppkey AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_parts
        |FROM sp JOIN pt USING (l_partkey)
        |WHERE qty_c * n_supp > 2 * tot_c AND n_supp > 1
        |GROUP BY 1 ORDER BY n_parts DESC, s_suppkey LIMIT 10""".stripMargin) { (s, d) =>
      val wp = Tables.part(s, d).filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"))
      val sp = Tables.lineitem(s, d)
        .join(broadcast(wp), col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(cents(col("l_quantity"))).as("qty_c"))
      val pt = sp.groupBy("l_partkey")
        .agg(sum("qty_c").as("tot_c"), count(lit(1)).as("n_supp"))
      sp.join(pt, "l_partkey")
        .filter(col("qty_c") * col("n_supp") > lit(2) * col("tot_c") &&
                col("n_supp") > 1)
        .groupBy(col("l_suppkey").as("s_suppkey"))
        .agg(count(lit(1)).cast("long").as("n_parts"))
        .orderBy(col("n_parts").desc, col("s_suppkey"))
        .limit(10)
    },

    // TPC-H Q17 shape: revenue locked in small-quantity lineitems of
    // Brand#13 parts — quantity below HALF the part's mean. The
    // correlated scalar subquery (avg per part) becomes a partkey-keyed
    // aggregate joined back; the mean compare is exact-integer
    // cross-multiplied: 2·q·n < Σq. Scale shape: one broadcast part-dim
    // filter, one partkey aggregate, one partkey-keyed self-join of the
    // filtered slice (brand-bounded, ~1/25 of lineitem), single-row out.
    "q98_small_qty_revenue" -> Q(
      """WITH b AS (SELECT l_partkey, l_quantity, l_extendedprice
        |           FROM lineitem JOIN part ON l_partkey = p_partkey
        |           WHERE p_brand = 'Brand#13'),
        |a AS (SELECT l_partkey, SUM(CAST(round(l_quantity*100) AS BIGINT)) AS sq_c,
        |             COUNT(*) AS n
        |      FROM b GROUP BY 1)
        |SELECT CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_c,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM b JOIN a USING (l_partkey)
        |WHERE 2 * CAST(round(l_quantity*100) AS BIGINT) * n < sq_c""".stripMargin) { (s, d) =>
      val brand = Tables.part(s, d).filter(col("p_brand") === "Brand#13")
        .select(col("p_partkey"))
      val b = Tables.lineitem(s, d)
        .join(broadcast(brand), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), cents(col("l_quantity")).as("q_c"),
                cents(col("l_extendedprice")).as("p_c"))
      val a = b.groupBy("l_partkey")
        .agg(sum("q_c").as("sq_c"), count(lit(1)).as("n"))
      b.join(a, "l_partkey")
        .filter(lit(2) * col("q_c") * col("n") < col("sq_c"))
        .agg(sum("p_c").cast("long").as("rev_c"),
             count(lit(1)).cast("long").as("n_lines"))
    },

    // TPC-H Q22 shape: dormant high-balance customers — balance above
    // the positive-balance average (global scalar subquery, exact via
    // integer cross-multiplication: bal·n > Σbal) with NO order since
    // 2000-01-01 (anti join on the date-filtered orders — Q22's "no
    // orders at all" is empty here because every customer orders; the
    // dormancy window keeps the semantics and the anti join). Scale
    // shape: the threshold is a 1-row broadcast relation (single job,
    // the q92 pattern); the anti join shuffles on custkey; nation is
    // broadcast; output is |nation|-bounded.
    "q99_dormant_customers" -> Q(
      """WITH g AS (SELECT SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS s_c,
        |                  COUNT(*) AS n
        |           FROM customer WHERE c_acctbal > 0)
        |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |       CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_c
        |FROM customer JOIN nation ON c_nationkey = n_nationkey CROSS JOIN g
        |WHERE CAST(round(c_acctbal*100) AS BIGINT) * n > s_c
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      val g = cust.filter(col("c_acctbal") > 0)
        .agg(sum(cents(col("c_acctbal"))).as("s_c"), count(lit(1)).as("n"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(g))
        .filter(cents(col("c_acctbal")) * col("n") > col("s_c"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, d)),
              col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).cast("long").as("n_cust"),
             sum(cents(col("c_acctbal"))).cast("long").as("bal_c"))
        .orderBy("n_name")
    }
  )
}
