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
