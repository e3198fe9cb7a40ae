package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Triangle census over the supplier co-supply graph — the third classic
  * graph primitive next to the iterative rank (`q50_graph_rank`) and
  * connected components (`dd_dup_clusters`): how CLOSED is the
  * co-occurrence structure (global clustering coefficient), the signal
  * behind community detection and link-prediction features.
  *
  * Two scale disciplines compose:
  *
  *  1. The graph itself is the TOP-K SUPPORT GRAPH (K = 5000 edges by
  *     shared-customer count, deterministic tie-break) built from q56's
  *     degree-capped wedge pipeline — co-occurrence graphs on skewed
  *     data are near-complete (at sf0.01 every supplier pair co-supplies
  *     ≥ 100 customers), and a fixed support threshold is SF-unstable,
  *     so the edge budget is the parameter, like IVF's k/nprobe. The
  *     TakeOrdered never materializes a sorted edge universe.
  *  2. Triangles are counted on the DEGREE-ORDERED ORIENTATION (each
  *     edge points low→high (degree, id)): out-degrees are bounded by
  *     O(√m), so the wedge self-join generates Σ out-deg² = O(m^1.5)
  *     candidates (Schank & Wagner's node-iterator++ bound) instead of
  *     Σ deg² — hub nodes CANNOT explode the pair space, the same
  *     defense as q56's dc cap but achieved by orientation rather than
  *     exclusion. Closure is one more equi-join against the oriented
  *     edge set.
  *
  * The ≤K edge list and its orientation are checkpointed once (they
  * feed the degree dim and all three legs of the triangle join). Output
  * is a single all-integer summary row; closure_ppm = 3·10⁶·triangles /
  * wedges (the global clustering coefficient in parts-per-million,
  * floor division — exact in both engines).
  */
object RelationalQueries10 {

  private val EdgeBudget = 5000

  /** Degree-capped co-supply pair counts (s_a < s_b, ns = shared
    * customers), the relation q56 reports the top-20 of and the triangle
    * census cuts its top-K support graph from. Built from the
    * per-corpus [[RelationalQueries8.tradeEdges]] checkpoint (no second
    * orders⋈lineitem join), one collect_set exchange (q56's measured
    * A/B winner), checkpointed once per corpus; evicted with the
    * artifact store. */
  private val pairCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  graft.ArtifactStore.onInvalidate(pairCache.remove(_))

  private[queries] def coSupplyCounts(s: org.apache.spark.sql.SparkSession,
                                      d: String): org.apache.spark.sql.DataFrame =
    pairCache.computeIfAbsent(d, _ =>
      RelationalQueries8.tradeEdges(s, d)
        .groupBy("cust")
        .agg(sort_array(collect_set(col("supp"))).as("supps"))
        .filter(size(col("supps")) <= 40)
        .select(explode(col("supps")).as("s_a"), col("supps"))
        .select(col("s_a"), explode(col("supps")).as("s_b"))
        .filter(col("s_a") < col("s_b"))
        .groupBy("s_a", "s_b").agg(count(lit(1)).as("ns"))
        .localCheckpoint(true))

  /** `rounds` peel iterations toward the k-core of the (s_a, s_b) edge
    * frame; one trajectory row per round. `n_removed` is the drop in the
    * SURVIVOR count versus the previous round (round 1: versus the
    * distinct nodes of the input), so it counts BOTH low-degree peels and
    * nodes a peel isolated (degree-0 nodes never reappear in the next
    * degree table — without the survivor baseline they would vanish
    * uncounted and Σ n_removed would not reconcile with n_nodes).
    * Factored out so the spec can drive it on constructed graphs where
    * peeling actually fires (the corpus support graph at test SFs is
    * near-complete). */
  private[queries] def peel(e0: org.apache.spark.sql.DataFrame, k: Int,
                            rounds: Int): org.apache.spark.sql.DataFrame = {
    var e = e0
    var prev = e0.select(col("s_a").as("v")).union(e0.select(col("s_b").as("v")))
      .distinct().agg(count(lit(1)).as("n_prev"))
    val stats = (1 to rounds).map { r =>
      val deg = e.select(col("s_a").as("v"))
        .union(e.select(col("s_b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dg"))
        .localCheckpoint(true) // feeds keep, the stat row, AND the peel
      val keep = deg.filter(col("dg") >= k).select("v")
      e = e
        .join(broadcast(keep.select(col("v").as("s_a"))), "s_a")
        .join(broadcast(keep.select(col("v").as("s_b"))), "s_b")
        .select("s_a", "s_b")
        .localCheckpoint(true) // flat lineage per round (≤K rows)
      // coalesce: SUM over an emptied graph is NULL while the oracle's
      // COUNT(*) FROM keep is 0 — the twins must agree when peeling
      // dissolves the graph entirely (KcoreSpec's chain case)
      val counts = deg
        .agg(coalesce(sum(when(col("dg") >= k, 1L).otherwise(0L)), lit(0L)).as("n_keep"))
        .localCheckpoint(true) // this round's stat AND the next round's baseline
      val stat = counts.crossJoin(broadcast(prev))
        .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
        .select(lit(r.toLong).as("round"),
                col("n_keep").as("n_nodes"),
                (col("n_prev") - col("n_keep")).as("n_removed"),
                col("n_edges"))
      prev = counts.select(col("n_keep").as("n_prev"))
      stat
    }
    stats.reduce(_.unionAll(_)).orderBy("round")
  }

  def defs: Map[String, Q] = Map(

    "q57_triangle_census" -> Q(
      s"""WITH sets AS (
         |  SELECT o.o_custkey AS cust, l.l_suppkey AS supp
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         |  GROUP BY 1, 2),
         |d AS (SELECT cust, COUNT(*) AS dc FROM sets GROUP BY cust),
         |w AS (
         |  SELECT a.supp AS s_a, b.supp AS s_b
         |  FROM sets a JOIN sets b ON a.cust = b.cust AND a.supp < b.supp
         |  JOIN d ON a.cust = d.cust AND d.dc <= 40),
         |e AS (
         |  SELECT s_a, s_b FROM (
         |    SELECT s_a, s_b, COUNT(*) AS ns FROM w GROUP BY s_a, s_b
         |    ORDER BY ns DESC, s_a, s_b LIMIT $EdgeBudget)),
         |deg AS (
         |  SELECT v, COUNT(*) AS dg FROM (
         |    SELECT s_a AS v FROM e UNION ALL SELECT s_b FROM e) GROUP BY v),
         |o AS (
         |  SELECT CASE WHEN (da.dg, e.s_a) < (db.dg, e.s_b) THEN e.s_a ELSE e.s_b END AS src,
         |         CASE WHEN (da.dg, e.s_a) < (db.dg, e.s_b) THEN e.s_b ELSE e.s_a END AS dst
         |  FROM e JOIN deg da ON e.s_a = da.v JOIN deg db ON e.s_b = db.v),
         |tri AS (
         |  SELECT COUNT(*) AS n_tri
         |  FROM o a JOIN o b ON a.src = b.src AND a.dst < b.dst
         |  JOIN o c ON c.src = a.dst AND c.dst = b.dst)
         |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
         |       (SELECT CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
         |       (SELECT CAST(n_tri AS BIGINT) FROM tri) AS n_triangles,
         |       (SELECT CAST(CASE WHEN SUM(dg * (dg - 1) // 2) = 0 THEN 0
         |                    ELSE (3000000 * (SELECT n_tri FROM tri))
         |                           // SUM(dg * (dg - 1) // 2) END AS BIGINT)
         |        FROM deg) AS closure_ppm""".stripMargin) { (s, d) =>
      val e = coSupplyCounts(s, d)
        .orderBy(col("ns").desc, col("s_a"), col("s_b")).limit(EdgeBudget)
        .select("s_a", "s_b")
        .localCheckpoint(true) // ≤K rows; feeds deg + orientation
      val deg = e.select(col("s_a").as("v"))
        .union(e.select(col("s_b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dg"))
      val o = e
        .join(broadcast(deg.select(col("v").as("s_a"), col("dg").as("da"))), "s_a")
        .join(broadcast(deg.select(col("v").as("s_b"), col("dg").as("db"))), "s_b")
        .select(
          when(struct(col("da"), col("s_a")) < struct(col("db"), col("s_b")),
               col("s_a")).otherwise(col("s_b")).as("src"),
          when(struct(col("da"), col("s_a")) < struct(col("db"), col("s_b")),
               col("s_b")).otherwise(col("s_a")).as("dst"))
        .localCheckpoint(true) // ≤K rows; three legs of the triangle join
      val wedgePairs = o.select(col("src"), col("dst").as("v1"))
        .join(o.select(col("src"), col("dst").as("v2")), "src")
        .filter(col("v1") < col("v2"))
      val tri = wedgePairs
        .join(o.select(col("src").as("v1"), col("dst").as("v2")), Seq("v1", "v2"))
        .agg(count(lit(1)).as("n_tri"))
      val nodes  = deg.agg(count(lit(1)).as("n_nodes"),
                           sum(expr("dg * (dg - 1) div 2")).as("n_wedges"))
      val edges  = e.agg(count(lit(1)).as("n_edges"))
      nodes.crossJoin(broadcast(edges)).crossJoin(broadcast(tri))
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
                col("n_tri").as("n_triangles"),
                expr("cast(case when n_wedges = 0 then 0 " +
                     "else (3000000 * n_tri) div n_wedges end as bigint)")
                  .as("closure_ppm"))
    },

    // k-core peeling over the same top-K support graph — the fourth
    // classic graph primitive (after rank, components, triangles): the
    // densest-cohesion filter behind community seeding and spam-graph
    // pruning. Semantics are FOUR declared peel rounds toward the
    // 3-core (round count is the parameter, like q50's propagation
    // rounds and IVF's k/nprobe — a fixpoint loop with unknown depth is
    // not an SF-stable declared query), reporting the full trajectory
    // (nodes surviving, nodes peeled, edges left) so convergence is
    // visible in the output: a round with n_removed = 0 IS the 3-core.
    // Scale shape: each round is degree-count + two semi-join-shaped
    // equi-joins on the ≤K-edge frame (checkpointed per round to keep
    // the 4-round lineage flat — the dd_dup_clusters discipline); the
    // peel never touches the underlying corpus again.
    "q63_kcore" -> Q({
      // MATERIALIZED: every round's frames are referenced 2-4× downstream;
      // without the hint DuckDB re-inlines the whole chain per reference
      // (exponential re-evaluation of the co-supply self-join)
      val rounds = (1 to 4).map { r =>
        // n_removed baseline: previous round's SURVIVOR count (round 1:
        // distinct input nodes) so peel-isolated nodes are counted too
        val prevCount =
          if (r == 1) "(SELECT n FROM nodes0)"
          else s"(SELECT CAST(COUNT(*) AS BIGINT) FROM keep${r - 1})"
        s"""deg$r AS MATERIALIZED (
           |  SELECT v, CAST(COUNT(*) AS BIGINT) AS dg FROM (
           |    SELECT s_a AS v FROM e${r - 1} UNION ALL SELECT s_b FROM e${r - 1})
           |  GROUP BY v),
           |keep$r AS MATERIALIZED (SELECT v FROM deg$r WHERE dg >= 3),
           |e$r AS MATERIALIZED (
           |  SELECT t.s_a, t.s_b FROM e${r - 1} t
           |  JOIN keep$r ka ON t.s_a = ka.v JOIN keep$r kb ON t.s_b = kb.v),
           |stat$r AS (
           |  SELECT CAST($r AS BIGINT) AS round,
           |         (SELECT CAST(COUNT(*) AS BIGINT) FROM keep$r) AS n_nodes,
           |         $prevCount
           |           - (SELECT CAST(COUNT(*) AS BIGINT) FROM keep$r) AS n_removed,
           |         (SELECT CAST(COUNT(*) AS BIGINT) FROM e$r) AS n_edges)""".stripMargin
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
         |nodes0 AS MATERIALIZED (
         |  SELECT CAST(COUNT(DISTINCT v) AS BIGINT) AS n FROM (
         |    SELECT s_a AS v FROM e0 UNION ALL SELECT s_b FROM e0)),
         |$rounds
         |SELECT * FROM stat1 UNION ALL SELECT * FROM stat2
         |UNION ALL SELECT * FROM stat3 UNION ALL SELECT * FROM stat4
         |ORDER BY round""".stripMargin
    }) { (s, d) =>
      val e0 = coSupplyCounts(s, d)
        .orderBy(col("ns").desc, col("s_a"), col("s_b")).limit(EdgeBudget)
        .select("s_a", "s_b")
        .localCheckpoint(true)
      peel(e0, k = 3, rounds = 4)
    },

    // Blocked entity-resolution self-join — record linkage on RELATIONAL
    // attributes, the structured-data sibling of the document LSH
    // pipeline: find "interchangeable part" candidates (same noun, type,
    // and size; different brand) without ever going near the n² pair
    // space. The three disciplines every production ER join needs:
    //  1. BLOCKING as an equi-join key (noun, type, size) — Catalyst
    //     plans a hash join, never a theta join;
    //  2. a BLOCK CAP counted BEFORE pairing (the dd_band / simhash
    //     bucket defense): an over-cap block — a degenerate blocking key
    //     — is excluded from pairing and surfaced in the per-group
    //     report instead of silently going quadratic;
    //  3. canonical pair order (brand_a < brand_b, key tie-break) so the
    //     candidate set is a set.
    // Output: per (noun, type) linkage report — blocks, capped blocks,
    // candidate pairs, and the exact-cents mean price gap between
    // matched brands (the attribute-conflict signal a merge step would
    // resolve).
    "q59_similar_parts" -> Q(
      s"""WITH p AS (
         |  SELECT p_partkey, p_brand, p_type, p_size,
         |         string_split(p_name, ' ')[2] AS noun,
         |         CAST(round(p_retailprice * 100) AS BIGINT) AS cents
         |  FROM part),
         |bsz AS (
         |  SELECT noun, p_type, p_size, CAST(COUNT(*) AS BIGINT) AS bn
         |  FROM p GROUP BY 1, 2, 3),
         |pairs AS (
         |  SELECT a.noun, a.p_type,
         |         abs(a.cents - b.cents) AS gap
         |  FROM p a
         |  JOIN p b ON a.noun = b.noun AND a.p_type = b.p_type
         |          AND a.p_size = b.p_size
         |          AND (a.p_brand < b.p_brand
         |               OR (a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey))
         |  JOIN bsz s ON a.noun = s.noun AND a.p_type = s.p_type
         |            AND a.p_size = s.p_size
         |  WHERE s.bn <= 100 AND a.p_brand <> b.p_brand),
         |pc AS (
         |  SELECT noun, p_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |         CAST(SUM(gap) AS BIGINT) // COUNT(*) AS mean_gap_cents
         |  FROM pairs GROUP BY noun, p_type),
         |blocks AS (
         |  SELECT noun, p_type,
         |         CAST(COUNT(DISTINCT p_size) AS BIGINT) AS n_blocks,
         |         CAST(COUNT(DISTINCT CASE WHEN bn > 100 THEN p_size END) AS BIGINT)
         |           AS n_capped_blocks
         |  FROM bsz GROUP BY noun, p_type)
         |SELECT b.noun, b.p_type, b.n_blocks, b.n_capped_blocks,
         |       COALESCE(pc.n_pairs, 0) AS n_pairs, pc.mean_gap_cents
         |FROM blocks b
         |LEFT JOIN pc ON b.noun = pc.noun AND b.p_type = pc.p_type
         |ORDER BY b.noun, b.p_type""".stripMargin) { (s, d) =>
      val p = Tables.part(s, d).select(
        col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"),
        split(col("p_name"), " ").getItem(1).as("noun"),
        graft.functions.Portable.cents(col("p_retailprice")).as("cents"))
      val bsz = p.groupBy("noun", "p_type", "p_size").agg(count(lit(1)).as("bn"))
      // the cap must land BEFORE the self-join (the bandCandidates
      // discipline): restricting the LEFT side to under-cap blocks bounds
      // the join fan-out itself — filtering after pairing would still
      // materialize an over-cap block's n² intermediate
      val capped = broadcast(bsz.filter(col("bn") <= 100)
        .select("noun", "p_type", "p_size"))
      val a = p.join(capped, Seq("noun", "p_type", "p_size"))
        .select(col("noun"), col("p_type"), col("p_size"),
                col("p_brand").as("ba"), col("p_partkey").as("ka"), col("cents").as("ca"))
      val b = p.select(col("noun"), col("p_type"), col("p_size"),
                       col("p_brand").as("bb"), col("p_partkey").as("kb"), col("cents").as("cb"))
      val pairs = a.join(b, Seq("noun", "p_type", "p_size"))
        .filter(col("ba") < col("bb") ||
                (col("ba") === col("bb") && col("ka") < col("kb")))
        .filter(col("ba") =!= col("bb"))
        .select(col("noun"), col("p_type"), abs(col("ca") - col("cb")).as("gap"))
      val pc = pairs.groupBy("noun", "p_type")
        .agg(count(lit(1)).as("n_pairs"),
             expr("cast(sum(gap) as bigint) div count(*)").as("mean_gap_cents"))
      val blocks = bsz.groupBy("noun", "p_type")
        .agg(countDistinct(col("p_size")).as("n_blocks"),
             countDistinct(when(col("bn") > 100, col("p_size"))).as("n_capped_blocks"))
      blocks.join(pc, Seq("noun", "p_type"), "left")
        .select(col("noun"), col("p_type"), col("n_blocks"), col("n_capped_blocks"),
                coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("mean_gap_cents"))
        .orderBy("noun", "p_type")
    }
  )
}
