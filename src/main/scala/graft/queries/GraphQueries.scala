package graft.queries

import graft.Q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label propagation over the supplier co-supply support graph — the
  * fifth graph primitive next to rank (`q50_graph_rank`), components
  * (`dd_dup_clusters`), triangles (`q57_triangle_census`) and k-core
  * (`q63_kcore`): community detection by synchronous majority-label
  * updates (Raghavan et al. 2007), made deterministic so the DuckDB twin
  * is hash-exact.
  *
  * Determinism contract (the part plain LPA lacks): synchronous rounds,
  * neighbor-majority only (no self-vote), ties broken by MIN label —
  * the same max-count + min-key two-level idiom as ss_cluster_purity.
  * Rounds are a declared parameter (3), like q50's propagation rounds
  * and q63's peel rounds: a fixpoint loop of unknown depth is not an
  * SF-stable declared query. Output is the trajectory (labels changed,
  * community count, largest community) so convergence is visible.
  *
  * Scale shape: the graph is the SAME ≤K-edge top-K support graph as
  * q57/q63 (shared pairCache — the corpus is never re-joined); each
  * round is one equi-join of the ≤2K-row adjacency against the node
  * labels plus per-node windows over neighbor-label groups (bounded by
  * degree), checkpointed per round for flat lineage. Nothing here
  * touches event- or fact-scale data after the cached pair build.
  */
object GraphQueries {

  private val EdgeBudget = 5000
  private val Rounds     = 3

  /** q71 predicts over the STRONGEST HALF of the capped support graph —
    * the held-out-edges evaluation form of link prediction (drop the
    * weakest ties, predict what closes): at test SFs the full capped
    * graph is near-complete (every wedge closes — zero non-edges to
    * predict at ANY budget), so sparsity must come from a data-driven
    * holdout, not a smaller cap. The count() feeding the half-limit runs
    * on the ≤EdgeBudget checkpointed edge frame (control-plane, not
    * corpus-scale). */
  private[graft] def sparseHead(s: org.apache.spark.sql.SparkSession,
                                d: String): org.apache.spark.sql.DataFrame = {
    val capped = RelationalQueries10.coSupplyCounts(s, d)
      .orderBy(col("ns").desc, col("s_a"), col("s_b")).limit(EdgeBudget)
    val half = math.max((capped.count() / 2).toInt, 1)
    capped.limit(half).select("s_a", "s_b")
  }

  def defs: Map[String, Q] = Map(

    "q66_label_prop" -> Q({
      val rounds = (1 to Rounds).map { r =>
        s"""cnt$r AS MATERIALIZED (
           |  SELECT u.src, l.label, CAST(COUNT(*) AS BIGINT) AS n
           |  FROM und u JOIN lab${r - 1} l ON u.dst = l.v
           |  GROUP BY 1, 2),
           |lab$r AS MATERIALIZED (
           |  SELECT src AS v, label FROM (
           |    SELECT src, label,
           |           ROW_NUMBER() OVER (PARTITION BY src
           |                              ORDER BY n DESC, label) AS rn
           |    FROM cnt$r) WHERE rn = 1),
           |stat$r AS (
           |  SELECT CAST($r AS BIGINT) AS round,
           |         (SELECT CAST(COUNT(*) AS BIGINT)
           |          FROM lab$r a JOIN lab${r - 1} b
           |            ON a.v = b.v AND a.label <> b.label) AS n_changed,
           |         (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) FROM lab$r)
           |           AS n_communities,
           |         (SELECT CAST(MAX(c) AS BIGINT) FROM (
           |            SELECT COUNT(*) AS c FROM lab$r GROUP BY label))
           |           AS n_largest)""".stripMargin
      }.mkString(",\n")
      s"""WITH sets AS MATERIALIZED (
         |  SELECT o.o_custkey AS cust, l.l_suppkey AS supp
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |  GROUP BY 1, 2),
         |d AS (SELECT cust, COUNT(*) AS dc FROM sets GROUP BY cust),
         |w AS (
         |  SELECT a.supp AS s_a, b.supp AS s_b
         |  FROM sets a JOIN sets b ON a.cust = b.cust AND a.supp < b.supp
         |  JOIN d ON a.cust = d.cust AND d.dc <= 40),
         |e0 AS MATERIALIZED (
         |  SELECT s_a, s_b FROM (
         |    SELECT s_a, s_b, COUNT(*) AS ns FROM w GROUP BY s_a, s_b
         |    ORDER BY ns DESC, s_a, s_b LIMIT $EdgeBudget)),
         |und AS MATERIALIZED (
         |  SELECT s_a AS src, s_b AS dst FROM e0
         |  UNION ALL SELECT s_b, s_a FROM e0),
         |lab0 AS MATERIALIZED (
         |  SELECT DISTINCT src AS v, src AS label FROM und),
         |$rounds
         |SELECT * FROM ${(1 to Rounds).map(r => s"stat$r").mkString(" UNION ALL SELECT * FROM ")}
         |ORDER BY round""".stripMargin
    }) { (s, d) =>
      val e0 = RelationalQueries10.coSupplyCounts(s, d)
        .orderBy(col("ns").desc, col("s_a"), col("s_b")).limit(EdgeBudget)
        .select("s_a", "s_b")
        .localCheckpoint(true) // ≤K rows; both adjacency directions
      propagate(e0, Rounds)._1
    },

    // Newman MODULARITY of the label-propagation communities — the
    // score that says whether q66's partition actually found structure:
    // Q = Σ_c [ e_c/m − (d_c/2m)² ] reported per community (the global
    // Q is the sum of the q_contrib column). Every term derives from
    // exact integer counts over the same ≤EdgeBudget checkpointed
    // support graph (intra-edge counts, degree sums, m), so the only
    // float ops are one division and one squared division per community
    // — IEEE-portable. Cost on top of q66: two equi-joins of the ≤K
    // edge list against node-scale labels, one groupBy per term.
    "q91_modularity" -> Q({
      val rounds = (1 to Rounds).map { r =>
        s"""cnt$r AS MATERIALIZED (
           |  SELECT u.src, l.label, CAST(COUNT(*) AS BIGINT) AS n
           |  FROM und u JOIN lab${r - 1} l ON u.dst = l.v
           |  GROUP BY 1, 2),
           |lab$r AS MATERIALIZED (
           |  SELECT src AS v, label FROM (
           |    SELECT src, label,
           |           ROW_NUMBER() OVER (PARTITION BY src
           |                              ORDER BY n DESC, label) AS rn
           |    FROM cnt$r) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH sets AS MATERIALIZED (
         |  SELECT o.o_custkey AS cust, l.l_suppkey AS supp
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |  GROUP BY 1, 2),
         |d AS (SELECT cust, COUNT(*) AS dc FROM sets GROUP BY cust),
         |w AS (
         |  SELECT a.supp AS s_a, b.supp AS s_b
         |  FROM sets a JOIN sets b ON a.cust = b.cust AND a.supp < b.supp
         |  JOIN d ON a.cust = d.cust AND d.dc <= 40),
         |e0 AS MATERIALIZED (
         |  SELECT s_a, s_b FROM (
         |    SELECT s_a, s_b, COUNT(*) AS ns FROM w GROUP BY s_a, s_b
         |    ORDER BY ns DESC, s_a, s_b LIMIT $EdgeBudget)),
         |und AS MATERIALIZED (
         |  SELECT s_a AS src, s_b AS dst FROM e0
         |  UNION ALL SELECT s_b, s_a FROM e0),
         |lab0 AS MATERIALIZED (
         |  SELECT DISTINCT src AS v, src AS label FROM und),
         |$rounds,
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e0),
         |deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS dg FROM und GROUP BY src),
         |nodes AS (
         |  SELECT l.label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |         CAST(SUM(deg.dg) AS BIGINT) AS degree_sum
         |  FROM lab$Rounds l JOIN deg ON l.v = deg.v GROUP BY l.label),
         |intra AS (
         |  SELECT a.label, CAST(COUNT(*) AS BIGINT) AS intra_edges
         |  FROM e0 JOIN lab$Rounds a ON e0.s_a = a.v
         |          JOIN lab$Rounds b ON e0.s_b = b.v
         |  WHERE a.label = b.label GROUP BY a.label)
         |SELECT n.label, n.n_nodes, n.degree_sum,
         |       COALESCE(i.intra_edges, 0) AS intra_edges,
         |       CAST(COALESCE(i.intra_edges, 0) AS DOUBLE) / m.m
         |         - (CAST(n.degree_sum AS DOUBLE) / (2 * m.m))
         |           * (CAST(n.degree_sum AS DOUBLE) / (2 * m.m)) AS q_contrib
         |FROM nodes n LEFT JOIN intra i ON n.label = i.label, m
         |ORDER BY n.label""".stripMargin
    }) { (s, d) =>
      val e0 = RelationalQueries10.coSupplyCounts(s, d)
        .orderBy(col("ns").desc, col("s_a"), col("s_b")).limit(EdgeBudget)
        .select("s_a", "s_b")
        .localCheckpoint(true)
      val labels = propagate(e0, Rounds)._2
      val und = e0.select(col("s_a").as("v"))
        .unionAll(e0.select(col("s_b").as("v")))
      val deg = und.groupBy("v").agg(count(lit(1)).as("dg"))
      val nodes = labels.join(deg, "v")
        .groupBy("label")
        .agg(count(lit(1)).as("n_nodes"), sum(col("dg")).as("degree_sum"))
      val intra = e0
        .join(labels.select(col("v").as("s_a"), col("label")), "s_a")
        .join(labels.select(col("v").as("s_b"), col("label").as("label_b")), "s_b")
        .filter(col("label") === col("label_b"))
        .groupBy("label").agg(count(lit(1)).as("intra_edges"))
      val m = e0.agg(count(lit(1)).as("m"))
      nodes.join(intra, Seq("label"), "left")
        .crossJoin(broadcast(m))
        .select(col("label"), col("n_nodes"), col("degree_sum"),
                coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
                (coalesce(col("intra_edges"), lit(0L)).cast("double") / col("m")
                  - (col("degree_sum").cast("double") / (lit(2) * col("m")))
                    * (col("degree_sum").cast("double") / (lit(2) * col("m"))))
                  .as("q_contrib"))
        .orderBy("label")
    },

    // Link prediction (the 6th graph primitive): rank NON-edges of the
    // same ≤K-edge support graph by common-neighbor count with a
    // Jaccard-coefficient tie-break (Liben-Nowell & Kleinberg 2003) —
    // "which suppliers will co-supply next". Adamic-Adar is skipped on
    // purpose: its 1/log(deg) weights are not integer-exact cross-engine;
    // common-neighbors + Jaccard bp are. Scale shape: the wedge join runs
    // on the checkpointed ≤K-edge adjacency (the q57 wedge space, already
    // degree-capped in the graph's semantics), candidate pairs drop
    // existing edges via a broadcast anti-join, and the head is a
    // TakeOrdered-20 with a full deterministic tie-break.
    "q71_link_predict" -> Q(
      s"""WITH sets AS MATERIALIZED (
         |  SELECT o.o_custkey AS cust, l.l_suppkey AS supp
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |  GROUP BY 1, 2),
         |d AS (SELECT cust, COUNT(*) AS dc FROM sets GROUP BY cust),
         |w AS (
         |  SELECT a.supp AS s_a, b.supp AS s_b
         |  FROM sets a JOIN sets b ON a.cust = b.cust AND a.supp < b.supp
         |  JOIN d ON a.cust = d.cust AND d.dc <= 40),
         |ecap AS MATERIALIZED (
         |  SELECT s_a, s_b, ns FROM (
         |    SELECT s_a, s_b, COUNT(*) AS ns FROM w GROUP BY s_a, s_b
         |    ORDER BY ns DESC, s_a, s_b LIMIT $EdgeBudget)),
         |er AS (
         |  SELECT s_a, s_b,
         |         ROW_NUMBER() OVER (ORDER BY ns DESC, s_a, s_b) AS rn,
         |         COUNT(*) OVER () AS ec
         |  FROM ecap),
         |e0 AS MATERIALIZED (
         |  SELECT s_a, s_b FROM er WHERE rn <= greatest(ec // 2, 1)),
         |adj AS MATERIALIZED (
         |  SELECT s_a AS u, s_b AS v FROM e0
         |  UNION ALL SELECT s_b, s_a FROM e0),
         |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS dg FROM adj GROUP BY u),
         |cn AS MATERIALIZED (
         |  SELECT a.v AS x, b.v AS y, CAST(COUNT(*) AS BIGINT) AS common
         |  FROM adj a JOIN adj b ON a.u = b.u AND a.v < b.v
         |  GROUP BY 1, 2),
         |ne AS (
         |  SELECT cn.x, cn.y, cn.common FROM cn
         |  LEFT JOIN e0 ON e0.s_a = cn.x AND e0.s_b = cn.y
         |  WHERE e0.s_a IS NULL),
         |sc AS (
         |  SELECT ne.x AS v_a, ne.y AS v_b, ne.common,
         |         dx.dg AS deg_a, dy.dg AS deg_b,
         |         ne.common * 10000 // (dx.dg + dy.dg - ne.common) AS jaccard_bp
         |  FROM ne JOIN deg dx ON ne.x = dx.u JOIN deg dy ON ne.y = dy.u)
         |SELECT v_a, v_b, common, deg_a, deg_b,
         |       CAST(jaccard_bp AS BIGINT) AS jaccard_bp
         |FROM sc ORDER BY common DESC, jaccard_bp DESC, v_a, v_b
         |LIMIT 20""".stripMargin) { (s, d) =>
      val e0 = sparseHead(s, d)
        .localCheckpoint(true) // ≤K rows; adjacency + anti-join side
      val adj = e0.select(col("s_a").as("u"), col("s_b").as("v"))
        .unionAll(e0.select(col("s_b").as("u"), col("s_a").as("v")))
      val deg = adj.groupBy("u").agg(count(lit(1)).as("dg"))
      val cn = adj.toDF("u", "x").join(adj.toDF("u", "y"), "u")
        .filter(col("x") < col("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("common"))
      val ne = cn.join(broadcast(e0),
        cn("x") === e0("s_a") && cn("y") === e0("s_b"), "left_anti")
      ne.join(broadcast(deg.toDF("x", "deg_a")), "x")
        .join(broadcast(deg.toDF("y", "deg_b")), "y")
        .select(col("x").as("v_a"), col("y").as("v_b"), col("common"),
                col("deg_a"), col("deg_b"),
                expr("common * 10000 div (deg_a + deg_b - common)").as("jaccard_bp"))
        .orderBy(col("common").desc, col("jaccard_bp").desc, col("v_a"), col("v_b"))
        .limit(20)
    }
  )

  /** Synchronous min-tiebroken majority-label propagation on an
    * (s_a, s_b) edge frame. Returns (trajectory, final labels); factored
    * so GraphSpec can replay it on constructed graphs where community
    * structure is known (the corpus support graph at test SFs is
    * near-complete, which exercises convergence but not separation). */
  private[graft] def propagate(e0: org.apache.spark.sql.DataFrame,
                                 rounds: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val und = e0.select(col("s_a").as("src"), col("s_b").as("dst"))
      .unionAll(e0.select(col("s_b").as("src"), col("s_a").as("dst")))
      .localCheckpoint(true) // ≤2K rows; joined every round
    var labels = und.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
      .localCheckpoint(true)
    val win = Window.partitionBy(col("src"))
      .orderBy(col("n").desc, col("label"))
    val stats = (1 to rounds).map { r =>
      val next = und
        .join(labels.select(col("v").as("dst"), col("label")), "dst")
        .groupBy("src", "label").agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1)
        .select(col("src").as("v"), col("label"))
        .localCheckpoint(true) // node-scale; feeds 3 stats + next round
      val changed = next.as("a")
        .join(labels.as("b"), Seq("v"))
        .filter(col("a.label") =!= col("b.label"))
        .agg(count(lit(1)).as("n_changed"))
      val comm = next.groupBy("label").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_communities"), max(col("c")).as("n_largest"))
      val stat = changed.crossJoin(broadcast(comm))
        .select(lit(r.toLong).as("round"), col("n_changed"),
                col("n_communities"), col("n_largest"))
      labels = next
      stat
    }
    (stats.reduce(_.unionAll(_)).orderBy("round"), labels)
  }
}
