package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Relational operator surface, batch 9: the two pre-flight reports a
  * pipeline runs before trusting or joining a new corpus drop — a
  * declarative data-quality constraint audit (the Deequ/dbt-test shape)
  * and a join-key skew profile (the decide-whether-to-salt report).
  */
object RelationalQueries9 {

  def defs: Map[String, Q] = Map(

    // Data-quality constraint audit: six constraints over the star
    // schema evaluated corpus-wide in one pass each — primary-key
    // uniqueness, null keys, domain ranges, and referential integrity
    // (orphan facts via anti-join, the check that breaks silently at
    // scale when a dimension drop lags a fact drop). One row per
    // constraint with the observed violation count and a pass flag, so
    // a scheduler can gate downstream jobs on `min(passed)`. Each check
    // is a map-side-combined aggregate or an anti-join — nothing
    // quadratic, nothing collected.
    "q51_dq_audit" -> Q(
      """WITH checks AS (
        |  SELECT 'lineitem_orphan_orderkey' AS check_name,
        |         CAST((SELECT COUNT(*) FROM lineitem l
        |               WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                                 WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
        |           AS observed
        |  UNION ALL
        |  SELECT 'orders_orphan_custkey',
        |         CAST((SELECT COUNT(*) FROM orders o
        |               WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                                 WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'orders_dup_orderkey',
        |         CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT)
        |  UNION ALL
        |  SELECT 'orders_null_custkey',
        |         CAST((SELECT COUNT(*) FILTER (WHERE o_custkey IS NULL)
        |               FROM orders) AS BIGINT)
        |  UNION ALL
        |  SELECT 'lineitem_qty_out_of_range',
        |         CAST((SELECT COUNT(*) FROM lineitem
        |               WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
        |  UNION ALL
        |  SELECT 'lineitem_negative_price',
        |         CAST((SELECT COUNT(*) FROM lineitem
        |               WHERE l_extendedprice < 0) AS BIGINT))
        |SELECT check_name, observed,
        |       CAST(CASE WHEN observed = 0 THEN 1 ELSE 0 END AS INTEGER) AS passed
        |FROM checks ORDER BY check_name""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      val c  = Tables.customer(s, d)
      def check(name: String, observed: org.apache.spark.sql.DataFrame) =
        observed.select(lit(name).as("check_name"),
                        col("observed").cast("long").as("observed"))
      // independent count-when constraints over the same table share ONE
      // aggregate pass, unpivoted LAZILY to check rows via stack() — the
      // plan stays a single 1-row aggregate per table (inspectable by the
      // PlanAssertionsSpec sweep, no build-time side effects), and at
      // scale the audit pays one scan per table plus the two anti-joins,
      // not one scan per check
      def unpivot2(agg: org.apache.spark.sql.DataFrame,
                   n1: String, n2: String) =
        agg.select(expr(
          s"stack(2, '$n1', $n1, '$n2', $n2) AS (check_name, observed)"))
      val liChecks = unpivot2(
        li.agg(count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1))
                 .as("lineitem_qty_out_of_range"),
               count(when(col("l_extendedprice") < 0, 1))
                 .as("lineitem_negative_price")),
        "lineitem_qty_out_of_range", "lineitem_negative_price")
      val oChecks = unpivot2(
        o.agg((count(lit(1)) - countDistinct(col("o_orderkey")))
                .as("orders_dup_orderkey"),
              count(when(col("o_custkey").isNull, 1)).as("orders_null_custkey")),
        "orders_dup_orderkey", "orders_null_custkey")
      val frames = Seq(
        check("lineitem_orphan_orderkey",
          li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
            .agg(count(lit(1)).as("observed"))),
        check("orders_orphan_custkey",
          o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
            .agg(count(lit(1)).as("observed"))),
        liChecks, oChecks)
      frames.reduce(_.unionByName(_))
        .select(col("check_name"), col("observed"),
                when(col("observed") === 0, 1).otherwise(0).cast("int").as("passed"))
        .orderBy("check_name")
    },

    // The pure-SQL entry point as a first-class surface: the same
    // Catalyst pipeline driven through temp views + spark.sql instead of
    // the DataFrame API (a cascade user gets both; Topic.register is the
    // topic-side twin of this registration). Monthly top nation by
    // purchase revenue — window rank over a two-dim join, exact cents
    // arithmetic, identical text on both engines except for the
    // month/cents extraction idioms.
    "q53_sql_surface" -> Q(
      """WITH ev AS (
        |  SELECT CAST(epoch_ns(ts)//86400000000000 // 30 AS BIGINT) AS month_no,
        |         user_id, CAST(round(value*100) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase'),
        |rev AS (
        |  SELECT e.month_no, n.n_name,
        |         CAST(SUM(e.c) AS BIGINT) AS rev_c, COUNT(*) AS n_purchases
        |  FROM ev e
        |  JOIN customer cu ON e.user_id = cu.c_custkey
        |  JOIN nation n ON cu.c_nationkey = n.n_nationkey
        |  GROUP BY e.month_no, n.n_name),
        |rk AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY month_no
        |                               ORDER BY rev_c DESC, n_name) AS rn
        |  FROM rev)
        |SELECT month_no, n_name,
        |       CAST(rev_c AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
        |       n_purchases
        |FROM rk WHERE rn = 1 ORDER BY month_no""".stripMargin) { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("g_events")
      Tables.customer(s, d).createOrReplaceTempView("g_customer")
      Tables.nation(s, d).createOrReplaceTempView("g_nation")
      s.sql("""
        WITH ev AS (
          SELECT unix_micros(ts) div 86400000000 div 30 AS month_no,
                 user_id, CAST(round(value*100) AS BIGINT) AS c
          FROM g_events WHERE event_type = 'purchase'),
        rev AS (
          SELECT e.month_no, n.n_name,
                 SUM(e.c) AS rev_c, COUNT(*) AS n_purchases
          FROM ev e
          JOIN g_customer cu ON e.user_id = cu.c_custkey
          JOIN g_nation n ON cu.c_nationkey = n.n_nationkey
          GROUP BY e.month_no, n.n_name),
        rk AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY month_no
                                       ORDER BY rev_c DESC, n_name) AS rn
          FROM rev)
        SELECT month_no, n_name,
               CAST(rev_c AS DOUBLE) / CAST(100 AS DOUBLE) AS revenue,
               n_purchases
        FROM rk WHERE rn = 1 ORDER BY month_no""")
    },

    // Event-time RANGE window frames — the window-frame family the rest
    // of the window suite doesn't cover (q09/q30 use ROWS frames): a
    // rolling 1-hour per-user count/sum where the frame is defined by
    // the ORDER-BY VALUE (all events within 3600 s), not a row count.
    // RANGE frames are peer-inclusive, so ties in the sort key cannot
    // make the result order-dependent — exactly why they hash-match the
    // oracle where a ROWS frame over tied timestamps could not. This is
    // the sliding-window aggregate WITHOUT the explode fan-out of
    // el_hll_sliding's exact twin: each row's frame is evaluated over
    // the sorted user partition in one pass.
    "q54_range_frame" -> Q(
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(epoch_ns(ts)//1000000000 AS BIGINT) AS es,
        |         CAST(round(value*100) AS BIGINT) AS c
        |  FROM events)
        |SELECT user_id, event_id, es,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
        |       CAST(CAST(SUM(c) OVER w AS BIGINT) AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_1h
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY es
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      import graft.functions.Portable.cents
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("es")
        .rangeBetween(-3600, org.apache.spark.sql.expressions.Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
                expr("unix_micros(ts) div 1000000").as("es"),
                cents(col("value")).as("c"))
        .select(col("user_id"), col("event_id"), col("es"),
                count(lit(1)).over(w).as("n_1h"),
                (sum(col("c")).over(w).cast("double") / lit(100.0)).as("sum_1h"))
        .orderBy("user_id", "event_id")
    },

    // BAG-semantics set ops — the ALL variants q14 deliberately omits:
    // EXCEPT ALL / INTERSECT ALL preserve per-key multiplicity (a
    // customer with three 1995 orders and one 1996 order contributes
    // two surplus rows and one matched row — distinct-semantics ops
    // collapse all of that to membership). Spark plans both as a
    // count-aggregate per key + row regeneration: the shuffle carries
    // one (key, count) pair per DISTINCT key, map-side combined, never
    // the raw occurrence rows — the right bag-difference shape at scale.
    "q55_bag_setops" -> Q(
      """SELECT 'matched' AS src, k FROM (
        |  (SELECT o_custkey AS k FROM orders WHERE year(o_orderdate) = 1995)
        |  INTERSECT ALL
        |  (SELECT o_custkey AS k FROM orders WHERE year(o_orderdate) = 1996))
        |UNION ALL
        |SELECT 'surplus_95' AS src, k FROM (
        |  (SELECT o_custkey AS k FROM orders WHERE year(o_orderdate) = 1995)
        |  EXCEPT ALL
        |  (SELECT o_custkey AS k FROM orders WHERE year(o_orderdate) = 1996))
        |ORDER BY src, k""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val a = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("k"))
      val b = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey").as("k"))
      a.intersectAll(b).select(lit("matched").as("src"), col("k"))
        .unionAll(a.exceptAll(b).select(lit("surplus_95").as("src"), col("k")))
        .orderBy("src", "k")
    },

    // Join-key skew profile: the report that decides whether a join on
    // this key needs salting or AQE skew handling BEFORE the job runs.
    // One map-side-combined count per key, tiny global stats, and the
    // top-10 concentration via TakeOrdered (never a global sort of the
    // key table). All shares are one BIGINT→DOUBLE division each.
    "q52_skew_profile" -> Q(
      """WITH cnt AS (
        |  SELECT o_custkey AS key, COUNT(*) AS n FROM orders GROUP BY key),
        |tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS n_rows, COUNT(*) AS distinct_keys,
        |         CAST(MAX(n) AS BIGINT) AS max_key_rows
        |  FROM cnt),
        |topk AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS top10_rows
        |  FROM (SELECT n FROM cnt ORDER BY n DESC, key LIMIT 10))
        |SELECT t.n_rows, t.distinct_keys, t.max_key_rows,
        |       CAST(t.max_key_rows AS DOUBLE) / CAST(t.n_rows AS DOUBLE) AS top1_share,
        |       CAST(k.top10_rows AS DOUBLE) / CAST(t.n_rows AS DOUBLE) AS top10_share,
        |       CAST(t.n_rows AS DOUBLE) / CAST(t.distinct_keys AS DOUBLE) AS avg_rows_per_key
        |FROM tot t, topk k""".stripMargin) { (s, d) =>
      val cnt = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("n"))
      val tot = cnt.agg(sum(col("n")).as("n_rows"),
                        count(lit(1)).as("distinct_keys"),
                        max(col("n")).as("max_key_rows"))
      val topk = cnt.orderBy(col("n").desc, col("key")).limit(10)
        .agg(sum(col("n")).as("top10_rows"))
      tot.crossJoin(broadcast(topk))
        .select(col("n_rows"), col("distinct_keys"), col("max_key_rows"),
                (col("max_key_rows").cast("double") / col("n_rows").cast("double"))
                  .as("top1_share"),
                (col("top10_rows").cast("double") / col("n_rows").cast("double"))
                  .as("top10_share"),
                (col("n_rows").cast("double") / col("distinct_keys").cast("double"))
                  .as("avg_rows_per_key"))
    },

    // Degree-capped co-occurrence mining over the cust→supp bipartite
    // graph (the graph q50 ranks): top-20 supplier pairs by shared
    // customers — the wedge/co-purchase count behind recommendation and
    // collocation features. The 100 TB discipline is the DEGREE CAP: a
    // customer of degree d generates d·(d−1)/2 wedge rows, so one hub
    // key is quadratic — customers over dc ≤ 40 are excluded BY
    // SEMANTICS (both twins apply the rule; the same move as
    // dd_minhash's band cap, where the hot block is bounded rather than
    // hoped small). Wedges are generated bucket-locally by the cust
    // equi-self-join (shuffle on cust only), collapsed by a map-side-
    // combined (s_a, s_b) count, and the output is TakeOrdered-20.
    "q56_cooccur_topk" -> Q(
      """WITH e AS (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |d AS (SELECT cust, COUNT(*) AS dc FROM e GROUP BY cust),
        |ic AS (SELECT cust FROM d WHERE dc <= 40),
        |w AS (
        |  SELECT a.supp AS s_a, b.supp AS s_b
        |  FROM e a JOIN e b ON a.cust = b.cust AND a.supp < b.supp
        |  JOIN ic ON a.cust = ic.cust)
        |SELECT s_a, s_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM w GROUP BY s_a, s_b
        |ORDER BY n_shared DESC, s_a, s_b LIMIT 20""".stripMargin) { (s, d) =>
      // ONE exchange builds everything per customer: collect_set dedups
      // (the oracle's DISTINCT), its size is the degree (the cap
      // filter), and the wedge pairs explode from the sorted set
      // in-place — no distinct pre-pass, no degree dim, no self-join
      // re-shuffle. The explode² generates sa≥sb pairs too (~2× the
      // wedge mass) but stays cheaper than shuffling the edge list
      // three more times; A/B warm: level at sf0.1 (2.2 s — the
      // orders⋈lineitem join dominates there) and 2× at sf1
      // (11.6 → 5.9 s), i.e. the win grows with the wedge mass.
      // Since the triangle census landed, the whole pair-count frame is
      // the shared per-corpus coSupplyCounts checkpoint (built from
      // tradeEdges, so even the orders⋈lineitem join is paid once).
      RelationalQueries10.coSupplyCounts(s, d)
        .select(col("s_a"), col("s_b"), col("ns").as("n_shared"))
        .orderBy(col("n_shared").desc, col("s_a"), col("s_b"))
        .limit(20)
    }
  )
}
