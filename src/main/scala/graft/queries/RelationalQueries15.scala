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
    },

    "q83_bfs_reach" -> Q(
      s"""WITH sets AS (
         |  SELECT o.o_custkey AS cust, l.l_suppkey AS supp
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |  GROUP BY 1, 2),
         |d AS (SELECT cust, COUNT(*) AS dc FROM sets GROUP BY cust),
         |w AS (
         |  SELECT a.supp AS s_a, b.supp AS s_b
         |  FROM sets a JOIN sets b ON a.cust = b.cust AND a.supp < b.supp
         |  JOIN d ON a.cust = d.cust AND d.dc <= 40),
         |e0 AS (
         |  SELECT s_a, s_b FROM (
         |    SELECT s_a, s_b, COUNT(*) AS ns FROM w GROUP BY s_a, s_b
         |    ORDER BY ns DESC, s_a, s_b LIMIT 5000)),
         |e AS (SELECT s_a AS u, s_b AS v FROM e0
         |      UNION ALL SELECT s_b, s_a FROM e0),
         |src AS (SELECT MIN(s_a) AS s FROM e0),
         |bfs AS (
         |  WITH RECURSIVE walk(node, dist) AS (
         |    SELECT s, CAST(0 AS BIGINT) FROM src
         |    UNION
         |    SELECT e.v, walk.dist + 1 FROM walk JOIN e ON e.u = walk.node
         |    WHERE walk.dist < 4)
         |  SELECT node, MIN(dist) AS dist FROM walk GROUP BY node)
         |SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |       CAST(SUM(node) AS BIGINT) AS sum_ids
         |FROM bfs GROUP BY dist ORDER BY dist""".stripMargin) { (s, d) =>
      bfs(s, d)
    },

    // ---- Spark 4 SQL scripting (SPARK-48338) + session variables: the
    // control-flow surface, covered the same way q79 covered pipe
    // syntax — prove it's SYNTAX driving Catalyst queries, not a
    // second engine path. The scripted task: capacity planning — find
    // the smallest power-of-two daily-volume cap exceeded on at most
    // 5% of days. ONE fact pass collects the ≤366-row daily histogram
    // into an ARRAY session variable; the WHILE loop then iterates
    // driver-side over that array (HOF filter per probe), so the loop
    // costs nothing at any SF. The oracle finds the same cap
    // declaratively (min over a generated cap ladder) — equivalence of
    // the imperative and declarative forms is exactly the point.
    "q84_sql_script" -> Q(
      """WITH daily AS (
        |  SELECT epoch_ns(ts)//1000//86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM daily),
        |caps AS (SELECT CAST(1 AS BIGINT) << k AS cap
        |         FROM generate_series(0, 40) t(k)),
        |ov AS (SELECT c.cap,
        |              (SELECT CAST(COUNT(*) AS BIGINT) FROM daily
        |               WHERE n > c.cap) AS n_over
        |       FROM caps c),
        |best AS (SELECT MIN(cap) AS cap FROM ov, tot WHERE n_over * 20 <= nd)
        |SELECT b.cap, t.nd AS n_days,
        |       (SELECT n_over FROM ov WHERE ov.cap = b.cap) AS n_over,
        |       ((SELECT n_over FROM ov WHERE ov.cap = b.cap) * 10000) // t.nd
        |         AS over_bp
        |FROM best b, tot t""".stripMargin) { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("ev_script")
      s.sql("""
        BEGIN
          DECLARE days ARRAY<BIGINT>;
          DECLARE cap BIGINT DEFAULT 1;
          SET days = (SELECT collect_list(n) FROM (
            SELECT unix_micros(ts) div 86400000000 AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM ev_script GROUP BY 1));
          WHILE size(filter(days, x -> x > cap)) * 20 > size(days) DO
            SET cap = cap * 2;
          END WHILE;
          SELECT cap,
                 CAST(size(days) AS BIGINT) AS n_days,
                 CAST(size(filter(days, x -> x > cap)) AS BIGINT) AS n_over,
                 CAST(CAST(size(filter(days, x -> x > cap)) AS BIGINT) * 10000
                      div size(days) AS BIGINT) AS over_bp;
        END""")
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

  private val BfsRounds = 4

  /** `q83_bfs_reach` — single-source shortest paths, bounded rounds:
    * the frontier-expansion primitive (hop distance from a seed)
    * missing next to rank/components/k-core/triangles/label-prop in
    * the graph family. Source = the minimum node id of the q57 top-K
    * support graph; output = nodes per hop distance 0..4 with an id
    * checksum.
    *
    * Scale discipline: the classic BFS trade. Each round joins ONLY
    * the newest frontier (dist = r−1) against the edge list and
    * re-minimizes — visited nodes never re-expand, every round's frame
    * is localCheckpointed so lineage stays flat (the
    * dd_dup_clusters/q50 iterative discipline), and rounds are a
    * bounded parameter like IVF's nprobe. The oracle is a recursive
    * CTE with UNION (not UNION ALL) dedup, so neither engine ever
    * materializes the path-count explosion a 4-hop expansion of a
    * dense graph would produce. */
  private[graft] def bfs(s: SparkSession, d: String): DataFrame = {
    val e0 = RelationalQueries10.coSupplyCounts(s, d)
      .orderBy(col("ns").desc, col("s_a"), col("s_b")).limit(5000)
      .select("s_a", "s_b")
    // undirected: both directions, checkpointed once (≤ 2K rows)
    val e = e0.select(col("s_a").as("u"), col("s_b").as("v"))
      .union(e0.select(col("s_b").as("u"), col("s_a").as("v")))
      .localCheckpoint(true)
    // the seed is a 1-value control-plane read (s_a < s_b always, so
    // min(s_a) is the minimum node), same budget as a trained artifact
    val src = e0.agg(min(col("s_a"))).head.getLong(0)
    bfsFrom(e, src, BfsRounds)
  }

  /** The round loop itself, graph-agnostic so the spec can drive it on
    * constructed chains/stars where depth actually exceeds 1 (the
    * corpus support graph is near-complete at test SFs — every node is
    * one hop from the seed, which exercises nothing). `edges` must be
    * directed pairs (u, v) with both directions present for an
    * undirected walk. */
  private[graft] def bfsFrom(e: DataFrame, src: Long, rounds: Int): DataFrame = {
    var reached = e.sparkSession.range(1)
      .select(lit(src).as("node"), lit(0L).as("dist"))
    for (r <- 1 to rounds) {
      val frontier = reached.filter(col("dist") === (r - 1))
      val expanded = frontier.join(e, frontier("node") === e("u"))
        .select(e("v").as("node"), lit(r.toLong).as("dist"))
      reached = reached.union(expanded)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    reached.groupBy("dist")
      .agg(count(lit(1)).as("n_nodes"), sum(col("node")).as("sum_ids"))
      .orderBy("dist")
  }
}
