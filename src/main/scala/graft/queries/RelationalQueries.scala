package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator core over the TPC-H-ish star schema — the
  * category checklist of SURVEY.md §2.B (the reference implements none of
  * these; this is the analytics surface the engine adds on top of the
  * event-log data model).
  *
  * Determinism rules (SURVEY.md §7.4): all double SUM/AVG goes through
  * exact DECIMAL (Portable.dsum/davg) so aggregation order can't drift;
  * every query ends in a fully tiebroken ORDER BY; integer outputs are
  * cast so Spark and DuckDB agree on width.
  */
object RelationalQueries {

  def defs: Map[String, Q] = Map(

    // ---- aggregation suite ------------------------------------------------

    // TPC-H Q1 shape: scan + filter + 8-way aggregate. Partial aggregation
    // (map-side combine) is automatic; the shipdate filter pushes to parquet.
    "q01_pricing_summary" -> Q(
      s"""SELECT l_returnflag, l_linestatus,
         |       ${duckDsum("l_quantity")} AS sum_qty,
         |       ${duckDsum("l_extendedprice")} AS sum_base_price,
         |       ${duckDsumProd("l_extendedprice", "CAST(1 AS DOUBLE) - l_discount")} AS sum_disc_price,
         |       ${duckDsumProd("l_extendedprice", "CAST(1 AS DOUBLE) - l_discount", "CAST(1 AS DOUBLE) + l_tax")} AS sum_charge,
         |       ${duckDavg("l_quantity")} AS avg_qty,
         |       ${duckDavg("l_extendedprice")} AS avg_price,
         |       ${duckDavg("l_discount")} AS avg_disc,
         |       COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val one = lit(1.0)
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumProd(col("l_extendedprice"), one - col("l_discount")).as("sum_disc_price"),
          dsumProd(col("l_extendedprice"), one - col("l_discount"), one + col("l_tax")).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- filter + projection (pushdown/pruning) ---------------------------

    "q02_filter_project" -> Q(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- joins ------------------------------------------------------------

    // TPC-H Q3 shape: 3-way join + agg + top-k. customer filter first, so
    // the join input shrinks before the shuffle; top-k is
    // TakeOrderedAndProject (no global sort materialization).
    "q03_join_topk_revenue" -> Q(
      s"""SELECT o_orderkey, o_orderdate,
         |       ${duckDsumProd("l_extendedprice", "CAST(1 AS DOUBLE) - l_discount")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING"),
              col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 shape: fact ⋈ dims with explicit broadcast of the small
    // dimensions — at 100 TB supplier shuffles, nation/region broadcast.
    "q04_broadcast_dims" -> Q(
      s"""SELECT n_name,
         |       ${duckDsumProd("l_extendedprice", "CAST(1 AS DOUBLE) - l_discount")} AS revenue,
         |       COUNT(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },

    // left-semi: customers that have at least one order.
    "q05_semi_join" -> Q(
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // left-anti: customers with no orders.
    "q06_anti_join" -> Q(
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // TPC-H Q13 shape: left-outer join + two-level aggregation (order-count
    // distribution, zeros included).
    "q07_outer_join_dist" -> Q(
      """WITH per_cust AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM per_cust GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // ---- window functions -------------------------------------------------

    // top-3 orders per customer by price: row_number over a partitioned
    // window, rank filter — the per-group top-k idiom.
    "q08_window_topk" -> Q(
      """WITH ranked AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
        |FROM ranked WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
                    .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    },

    // running (cumulative) spend per customer — frame ROWS UNBOUNDED
    // PRECEDING; the sum runs in exact DECIMAL (DuckDB uses segment trees
    // for windowed aggs, so double summation order differs by design).
    "q09_window_running" -> Q(
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(100 AS DOUBLE)
        |         AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
                    .orderBy(col("o_orderdate"), col("o_orderkey"))
                    .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_spend",
          sum(cents(col("o_totalprice"))).over(w).cast("double") / lit(100.0))
        .select("o_custkey", "o_orderkey", "o_orderdate", "running_spend")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },

    // lag/lead over the event stream per user (event_id is the total order;
    // ts in the file is ns so it can't be the window key on both engines).
    "q10_window_lag_lead" -> Q(
      """SELECT user_id, event_id, value,
        |       LAG(value) OVER w AS prev_value,
        |       LEAD(value) OVER w AS next_value,
        |       epoch_ns(ts) // 1000
        |         - LAG(epoch_ns(ts) // 1000) OVER w AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
        .orderBy("user_id", "event_id")
    },

    // ---- grouping sets ----------------------------------------------------

    "q11_rollup" -> Q(
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         |       ${duckDsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    "q12_cube" -> Q(
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // ---- distinct aggregation --------------------------------------------

    "q13_distinct_agg" -> Q(
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_partkey) AS nd_part,
        |       COUNT(DISTINCT l_suppkey) AS nd_supp,
        |       COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // three per-column branches instead of the 2-distinct Expand (the
      // q65 move, grouped edition): the multi-distinct plan multiplied
      // the scan x3 in-plan; per branch, groupBy(flag, key) is a
      // map-side-combined partial whose exchange carries only that
      // column's distinct pairs, and the scans prune to two columns
      val li = Tables.lineitem(s, d)
      // count(col(key)), not count(*): COUNT(DISTINCT key) ignores a
      // NULL key, so the outer count must skip the NULL-key group
      // (inert for lineitem's non-null keys; ADVICE r10)
      def nd(key: String, as: String) =
        li.select(col("l_returnflag"), col(key))
          .groupBy("l_returnflag", key).agg(count(lit(1)))
          .groupBy("l_returnflag").agg(count(col(key)).as(as))
      nd("l_partkey", "nd_part")
        .join(nd("l_suppkey", "nd_supp"), Seq("l_returnflag"))
        .join(li.groupBy("l_returnflag").agg(count(lit(1)).as("cnt")),
              Seq("l_returnflag"))
        .select(col("l_returnflag"), col("nd_part"), col("nd_supp"), col("cnt"))
        .orderBy("l_returnflag")
    },

    // ---- set operations ---------------------------------------------------

    // INTERSECT / EXCEPT branches tagged and unioned into one result.
    "q14_setops" -> Q(
      """SELECT 'active_rich' AS src, k FROM (
        |  (SELECT DISTINCT o_custkey AS k FROM orders)
        |  INTERSECT
        |  (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000))
        |UNION ALL
        |SELECT 'active_poor' AS src, k FROM (
        |  (SELECT DISTINCT o_custkey AS k FROM orders)
        |  EXCEPT
        |  (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000))
        |ORDER BY src, k""".stripMargin) { (s, d) =>
      val active = Tables.orders(s, d).select(col("o_custkey").as("k")).distinct()
      val rich   = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
                     .select(col("c_custkey").as("k"))
      active.intersect(rich).withColumn("src", lit("active_rich"))
        .unionByName(active.except(rich).withColumn("src", lit("active_poor")))
        .select("src", "k")
        .orderBy("src", "k")
    },

    // ---- scalar functions -------------------------------------------------

    "q15_string_funcs" -> Q(
      """SELECT p_partkey,
        |       upper(p_brand) AS brand_u,
        |       CAST(length(p_name) AS INTEGER) AS name_len,
        |       substring(p_type, 1, 4) AS type_pre,
        |       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |       concat_ws('|', p_brand, p_type) AS brand_type,
        |       replace(p_name, ' ', '_') AS name_snake
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 4).as("type_pre"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"))
        .orderBy("p_partkey")
    },

    "q16_date_funcs" -> Q(
      s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
         |       CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
         |       COUNT(*) AS n_orders,
         |       ${duckDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"),
                 quarter(col("o_orderdate")).as("qtr"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("yr", "qtr")
    },

    // JSON `props` extraction — regexp-based so the oracle needs no JSON
    // extension; value semantics identical on both engines.
    "q17_json_props" -> Q(
      s"""SELECT CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k,
         |       COUNT(*) AS n_events,
         |       ${duckDavg("value")} AS avg_value
         |FROM events GROUP BY 1 ORDER BY k""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
                   .cast("int").as("k"))
        .agg(count(lit(1)).as("n_events"), davg(col("value")).as("avg_value"))
        .orderBy("k")
    },

    // conditional aggregation (CASE WHEN inside agg).
    "q18_case_when" -> Q(
      """SELECT o_orderpriority,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |       COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_big,
        |       COUNT(*) AS n_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("long").as("n_finished"),
             count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
             count(lit(1)).as("n_total"))
        .orderBy("o_orderpriority")
    },

    // ---- non-equi (as-of style) join -------------------------------------

    // events ⋈ orders on user + "order placed at-or-before the event":
    // the as-of pattern, reduced to max() per event.
    "q19_asof_join" -> Q(
      """SELECT e.event_id, MAX(o.o_orderdate) AS last_order_date,
        |       COUNT(*) AS n_prior_orders
        |FROM events e
        |JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_id", "user_id", "ts")
      val o = Tables.orders(s, d).select("o_custkey", "o_orderdate")
      e.join(o, col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"))
        .groupBy("event_id")
        .agg(max(col("o_orderdate")).as("last_order_date"),
             count(lit(1)).as("n_prior_orders"))
        .orderBy("event_id")
    },

    // ---- scalar subquery --------------------------------------------------

    // orders 1.5× above the mean price; the scalar aggregate is computed
    // exactly (decimal) and broadcast, not collected on the driver.
    "q20_scalar_subquery" -> Q(
      s"""SELECT o_orderkey, o_totalprice FROM orders
         |WHERE o_totalprice > (
         |  SELECT ${duckDavg("o_totalprice")}
         |  FROM orders) * CAST(1.5 AS DOUBLE)
         |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val stats = o.agg(davg(col("o_totalprice")).as("avg_price"))
      o.crossJoin(broadcast(stats))
        .filter(col("o_totalprice") > col("avg_price") * 1.5)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }
  )
}
