package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `q88_rolling_median` — EXACT rolling median over a bounded window
  * frame, the order statistic Spark's window surface doesn't ship (the
  * built-ins give percentile_approx — estimated — or a global sort;
  * neither is an exact per-frame median).
  *
  * The move: the frame is k-BOUNDED (ROWS 4 PRECEDING), so the frame's
  * values fit in one array column — collect_list over the window,
  * sort_array, and the median is pure element arithmetic (odd → middle
  * element; even → mean of the two middles, stated as the explicit
  * `(a + b) / 2` in BOTH engines rather than either engine's built-in
  * median, whose `a + (b−a)·0.5` interpolation would differ in IEEE
  * rounding). At 100 TB this stays a per-key window with O(k log k)
  * per-row work and no extra shuffle — the frame bound is what makes an
  * exact windowed order statistic scale; unbounded frames are where the
  * histogram sketches (el_quantile_sketch) take over.
  */
object RelationalQueries17 {
  def defs: Map[String, Q] = Map(

    "q88_rolling_median" -> Q(
      """WITH w AS (
        |  SELECT o_orderkey, o_custkey,
        |         list_sort(list(o_totalprice) OVER (
        |           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS ls
        |  FROM orders)
        |SELECT o_orderkey, o_custkey,
        |       CASE WHEN len(ls) % 2 = 1 THEN ls[(len(ls) + 1) // 2]
        |            ELSE (ls[len(ls) // 2] + ls[len(ls) // 2 + 1])
        |                   / CAST(2 AS DOUBLE) END AS roll_median,
        |       CAST(len(ls) AS INTEGER) AS n_window
        |FROM w ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey").rowsBetween(-4, 0)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
                sort_array(collect_list(col("o_totalprice")).over(w)).as("ls"))
        .select(col("o_orderkey"), col("o_custkey"),
          // integer DIV for the order-statistic indexes (Spark's `/` on
          // ints is a double divide), then the explicit (a+b)/2
          expr("""CASE WHEN size(ls) % 2 = 1
                       THEN element_at(ls, CAST((size(ls) + 1) DIV 2 AS INT))
                       ELSE (element_at(ls, CAST(size(ls) DIV 2 AS INT)) +
                             element_at(ls, CAST(size(ls) DIV 2 + 1 AS INT)))
                              / CAST(2 AS DOUBLE) END""").as("roll_median"),
          size(col("ls")).cast("int").as("n_window"))
        .orderBy("o_orderkey")
    },

    // GROUPING()/GROUPING_ID() — the rollup-level discriminators that
    // make multi-level results machine-consumable (a NULL in a rollup
    // row is ambiguous: rolled-up level or a genuinely-NULL key; the
    // grouping bits disambiguate, which is why every OLAP surface ships
    // them). Bit order pinned identical in both engines (first argument
    // = most significant bit); exact-cents revenue via the Portable
    // discipline.
    "q89_grouping_id" -> Q(
      s"""SELECT o_orderpriority AS prio, o_orderstatus AS status,
         |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
         |       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
         |       CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid,
         |       COUNT(*) AS cnt,
         |       ${graft.functions.Portable.duckDsum("o_totalprice")} AS revenue
         |FROM orders
         |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
         |ORDER BY gid, prio ASC NULLS FIRST, status ASC NULLS FIRST""".stripMargin) { (s, d) =>
      import graft.functions.Portable.dsum
      Tables.orders(s, d)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(grouping(col("o_orderpriority")).cast("int").as("g_prio"),
             grouping(col("o_orderstatus")).cast("int").as("g_status"),
             grouping_id().cast("int").as("gid"),
             count(lit(1)).as("cnt"),
             dsum(col("o_totalprice")).as("revenue"))
        .select(col("o_orderpriority").as("prio"), col("o_orderstatus").as("status"),
                col("g_prio"), col("g_status"), col("gid"), col("cnt"), col("revenue"))
        .orderBy(col("gid"), col("prio").asc_nulls_first,
                 col("status").asc_nulls_first)
    })
}
