package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import org.apache.spark.sql.functions._

/** Relational operator surface, batch 2: grouping sets, percentiles,
  * pivot, moment statistics, correlated subqueries, union-by-name, array
  * functions, null handling, and sketches (SURVEY.md §2.B rows not yet
  * covered by RelationalQueries).
  */
object RelationalQueries2 {

  def defs: Map[String, Q] = Map(

    // Explicit GROUPING SETS with GROUPING() ids (rollup/cube's general
    // form; Spark exposes it through SQL).
    "q21_grouping_sets" -> Q(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
        |       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
        |       COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("q21_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
          |       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
          |       COUNT(*) AS cnt
          |FROM q21_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    // Interpolated percentiles per group. l_quantity is integer-valued, so
    // the linear interpolation (a + (b-a)·frac) is exact on both engines.
    "q22_percentiles" -> Q(
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.25) AS p25,
        |       quantile_cont(l_quantity, 0.5)  AS p50,
        |       quantile_cont(l_quantity, 0.75) AS p75,
        |       MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
             expr("percentile(l_quantity, 0.5)").as("p50"),
             expr("percentile(l_quantity, 0.75)").as("p75"),
             min(col("l_quantity")).as("qmin"),
             max(col("l_quantity")).as("qmax"))
        .orderBy("l_returnflag")
    },

    // Pivot: returnflag values become columns (Spark .pivot; oracle is the
    // equivalent conditional aggregation — same column names).
    "q23_pivot" -> Q(
      """SELECT l_linestatus,
        |       COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS A,
        |       COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS N,
        |       COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS R
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("A", "N", "R"))
        .orderBy("l_linestatus")
    },

    // Moment statistics computed EXACTLY: quantity is ≤2dp so the cents
    // sums of x and x² are exact integers; mean/variance then evaluate in
    // an identical double expression tree on both engines (built-in
    // stddev/var are NOT portable — accumulation algorithms differ).
    "q24_moments" -> Q(
      """WITH a AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |         SUM(CAST(round(l_quantity*100) AS BIGINT)) AS s1,
        |         SUM(CAST(round(l_quantity*100) AS BIGINT) * CAST(round(l_quantity*100) AS BIGINT)) AS s2
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |       CAST(s1 AS DOUBLE) / CAST(100 AS DOUBLE) / n AS mean_qty,
        |       (CAST(s2 AS DOUBLE) / CAST(10000 AS DOUBLE)
        |          - (CAST(s1 AS DOUBLE) / CAST(100 AS DOUBLE))
        |            * (CAST(s1 AS DOUBLE) / CAST(100 AS DOUBLE)) / n)
        |         / (n - 1) AS var_qty
        |FROM a ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val c  = cents(col("l_quantity"))
      val a = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(c).as("s1"), sum(c * c).as("s2"))
      val s1d = col("s1").cast("double") / lit(100.0)
      a.select(col("l_returnflag"), col("n"),
          (s1d / col("n")).as("mean_qty"),
          ((col("s2").cast("double") / lit(10000.0) - s1d * s1d / col("n"))
            / (col("n") - 1)).as("var_qty"))
        .orderBy("l_returnflag")
    },

    // Correlated EXISTS with an extra predicate: orders containing any
    // max-quantity (50) line item.
    "q25_exists_correlated" -> Q(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 50)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 50),
              col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // Union-by-name over heterogeneous sources: orders and purchase
    // events as one "transactions" feed.
    "q26_union_by_name" -> Q(
      """SELECT * FROM (
        |  SELECT 'order' AS src, o_custkey AS uid, o_totalprice AS amount FROM orders
        |  UNION ALL
        |  SELECT 'event' AS src, user_id AS uid, value AS amount
        |  FROM events WHERE event_type = 'purchase')
        |ORDER BY src, uid, amount""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .select(lit("order").as("src"), col("o_custkey").as("uid"),
                col("o_totalprice").as("amount"))
      val e = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id").as("uid"), col("value").as("amount"), lit("event").as("src"))
      o.unionByName(e)
        .orderBy("src", "uid", "amount")
    },

    // Array function suite over the embedding vectors (element access,
    // slicing, sorting, extremes — all exact float ops). The sorted
    // extremes are emitted as SCALAR columns (not ARRAY) — the driver's
    // comparator hashes cells and cannot hash list values.
    "q27_array_funcs" -> Q(
      """SELECT vec_id,
        |       CAST(len(embedding) AS INTEGER) AS dim,
        |       embedding[1] AS first_dim,
        |       list_max(embedding) AS emax,
        |       list_min(embedding) AS emin,
        |       list_sort(embedding)[1] AS bottom1,
        |       list_sort(embedding)[2] AS bottom2,
        |       list_sort(embedding)[3] AS bottom3,
        |       list_reverse_sort(embedding)[1] AS top1,
        |       list_reverse_sort(embedding)[2] AS top2,
        |       list_reverse_sort(embedding)[3] AS top3
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      // materialize the sorted array ONCE: six element_at references to an
      // inline array_sort would each re-sort the vector (no CSE in
      // repeated column refs)
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"),
                array_sort(col("embedding")).as("sorted"))
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("first_dim"),
          array_max(col("embedding")).as("emax"),
          array_min(col("embedding")).as("emin"),
          element_at(col("sorted"), 1).as("bottom1"),
          element_at(col("sorted"), 2).as("bottom2"),
          element_at(col("sorted"), 3).as("bottom3"),
          element_at(col("sorted"), -1).as("top1"),
          element_at(col("sorted"), -2).as("top2"),
          element_at(col("sorted"), -3).as("top3"))
        .orderBy("vec_id")
    },

    // Null handling: left join against an intentionally-sparse dim
    // (finished high-value orders), then COALESCE / NULLIF / null-aware
    // counts over the miss side.
    "q28_null_handling" -> Q(
      """WITH big AS (
        |  SELECT o_custkey, o_totalprice FROM orders
        |  WHERE o_orderstatus = 'F' AND o_totalprice > 300000)
        |SELECT c.c_custkey,
        |       COUNT(b.o_totalprice) AS n_big,
        |       COALESCE(MAX(b.o_totalprice), -1.0) AS best_or_neg,
        |       CASE WHEN COUNT(b.o_totalprice) = 0 THEN 'none' ELSE 'some' END AS bucket,
        |       NULLIF(COUNT(b.o_totalprice), 0) AS n_or_null
        |FROM customer c LEFT OUTER JOIN big b ON c.c_custkey = b.o_custkey
        |GROUP BY c.c_custkey
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val big = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 300000)
        .select("o_custkey", "o_totalprice")
      Tables.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_totalprice")).as("n_big"),
             coalesce(max(col("o_totalprice")), lit(-1.0)).as("best_or_neg"),
             when(count(col("o_totalprice")) === 0, "none").otherwise("some").as("bucket"),
             nullif(count(col("o_totalprice")), lit(0L)).as("n_or_null"))
        .orderBy("c_custkey")
    },

    // HLL sketch distinct, DETERMINISTIC and oracle-checked: the 100 TB
    // substitute for exact distinct, built from portable primitives so
    // DuckDB computes the identical sketch (engine-native
    // approx_count_distinct sketches differ by design and stay
    // bounds-tested in SketchBoundsSpec, undeclared). m = 64 registers
    // over the 60-bit md5 hash family: register = hv mod 64, rank =
    // leading-zero count of the remaining 54 bits + 1 (via length(bin(w)),
    // minimal in both engines). The register sum Σ 2^(-M_j) is kept EXACT
    // by scaling to integers — Σ 2^(55-M_j) as a BIGINT (≤ 64·2^55 < 2^62)
    // — and the harmonic estimate α·m²/Σ is one identical left-associated
    // double expression (mul/div are IEEE-portable; α=0.709 enters as
    // 709/1000, one correctly-rounded division, never a decimal literal).
    // Raw estimate only: the small-range linear-counting correction needs
    // ln (libm, not bit-portable), so zero_regs is emitted for callers.
    // Empty registers contribute rank 0 → 2^55 each. EXACT twin:
    // q13_distinct_agg; KMV sibling: q42_kmv_distinct.
    "q29_hll_distinct" -> Q(
      s"""WITH ${graft.functions.PortableHll.duckSketchCtes(
             Seq("l_returnflag"), "CAST(l_partkey AS VARCHAR)", "lineitem")}
         |SELECT l_returnflag, hll_estimate, reg_sum, zero_regs, exact_distinct
         |FROM sk ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      graft.functions.PortableHll
        .distinctSketch(Tables.lineitem(s, d), Seq("l_returnflag"), col("l_partkey"))
        .orderBy("l_returnflag")
    }
  )
}
