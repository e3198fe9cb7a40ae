package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Two sampling/placement primitives a 100 TB pipeline leans on daily,
  * both in the repo's exactly-portable integer style (md5 draws, no
  * cross-engine transcendentals):
  *
  *  - `q78_weighted_sample` — weighted sampling WITHOUT replacement
  *    (Efraimidis–Spirakis A-ES). The textbook key u^(1/w) needs
  *    pow/log, which are not bit-stable across engines; for INTEGER
  *    weights the identical distribution comes from the max-of-w-
  *    uniforms equivalence (P[max of w uniforms ≤ x] = x^w), so the
  *    key is `max of w independent md5 draws` — pure 64-bit integer
  *    arithmetic, hash-identical in Spark and DuckDB. Weights
  *    discretize to a 1..8 grid first (the standard move: continuous
  *    weights quantize to a small integer grid, cost O(w_max) draws
  *    per row). One narrow projection + TakeOrderedAndProject top-k:
  *    no shuffle of the corpus, the driver holds k rows.
  *
  *  - `q80_rendezvous_shard` — HRW (highest-random-weight) consistent
  *    hashing: key → argmax over nodes of h(key, node), and the audit
  *    of what a cluster resize moves. The property that matters at
  *    scale: adding node N+1 re-homes ONLY the keys whose new-node
  *    hash is their global max — every moved key lands on the NEW
  *    node (expected churn 1/(N+1)), vs `hash % N` re-homing ~all
  *    keys. The assignment is a per-row argmax over an 8-element
  *    struct array (no explode, no shuffle — the narrow-projection
  *    shape SCALING.md's decade audits reward); only the N-row
  *    occupancy summary aggregates.
  */
object RelationalQueries13 {

  def defs: Map[String, Q] = Map(

    // ---- A-ES weighted sample: top-20 orders by max-of-w-uniforms key.
    // Weight = 1 + cents(o_totalprice) div 5_000_000, capped at 8 (a
    // $50k-per-step grid). Ties on the 1e6-granular key are real at
    // corpus size, so o_orderkey is the deterministic tie-break.
    "q78_weighted_sample" -> Q(
      """WITH w AS (
        |  SELECT o_orderkey,
        |         least(CAST(8 AS BIGINT),
        |               1 + CAST(round(o_totalprice * 100) AS BIGINT) // 5000000) AS weight
        |  FROM orders),
        |keyed AS (
        |  SELECT o_orderkey, weight,
        |         list_max(list_transform(range(1, CAST(weight AS INT) + 1),
        |           j -> CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || '|es|' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT)
        |                % 1000000)) AS es_key
        |  FROM w)
        |SELECT o_orderkey, weight, es_key
        |FROM keyed
        |ORDER BY es_key DESC, o_orderkey
        |LIMIT 20""".stripMargin) { (s, d) =>
      // round-9 codegen form: the previous plan materialized ALL 8
      // draws per row (8 string-md5 pipelines each) and sliced to the
      // first `weight` — graft_es_key digests only the draws that
      // exist and stays in bytes (functions/EsKey.scala; bit-identical
      // to the hex-parse route, EsKeySpec pins it). Oracle unchanged.
      graft.functions.EsKey.register(s)
      val weight = least(lit(8L),
        lit(1L) + expr("cast(round(o_totalprice * 100) as bigint) div 5000000"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), weight.as("weight"))
        .withColumn("es_key", expr("graft_es_key(o_orderkey, weight)"))
        .orderBy(col("es_key").desc, col("o_orderkey"))
        .limit(20)
    },

    // ---- HRW resharding audit: assignment under 5 nodes vs 6, per-node
    // occupancy before/after and arrivals. The invariant the oracle
    // pins exactly: arrivals happen ONLY at the new node.
    "q80_rendezvous_shard" -> Q(
      """WITH h AS (
        |  SELECT c_custkey AS key, CAST(n AS INT) AS n,
        |         CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || '|hrw|' || CAST(n AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM customer, range(0, 6) t(n)),
        |a AS (
        |  SELECT key, n AS node_a FROM (
        |    SELECT key, n, ROW_NUMBER() OVER (PARTITION BY key ORDER BY hv DESC, n DESC) AS rn
        |    FROM h WHERE n < 5) WHERE rn = 1),
        |b AS (
        |  SELECT key, n AS node_b FROM (
        |    SELECT key, n, ROW_NUMBER() OVER (PARTITION BY key ORDER BY hv DESC, n DESC) AS rn
        |    FROM h) WHERE rn = 1),
        |m AS (SELECT a.key, a.node_a, b.node_b FROM a JOIN b ON a.key = b.key),
        |bef AS (SELECT node_a AS node, CAST(COUNT(*) AS BIGINT) AS n_before FROM m GROUP BY 1),
        |aft AS (SELECT node_b AS node, CAST(COUNT(*) AS BIGINT) AS n_after,
        |               CAST(SUM(CASE WHEN node_a <> node_b THEN 1 ELSE 0 END) AS BIGINT) AS n_arrived
        |        FROM m GROUP BY 1)
        |SELECT COALESCE(b.node, a.node) AS node,
        |       COALESCE(b.n_before, 0) AS n_before,
        |       COALESCE(a.n_after, 0) AS n_after,
        |       COALESCE(a.n_arrived, 0) AS n_arrived
        |FROM bef b FULL OUTER JOIN aft a ON b.node = a.node
        |ORDER BY node""".stripMargin) { (s, d) =>
      // per-row argmax: array_max over (hash, node) structs — struct
      // ordering makes max-hash win with max-node as the tie-break
      // (matching the oracle's ORDER BY hv DESC, n DESC). No explode,
      // no per-key window shuffle: the assignment is embarrassingly
      // parallel, exactly what lets HRW place 100 TB of keys in one
      // map-only pass. At corpus scale the m frame would be persisted
      // before the two occupancy rollups; here the narrow recompute is
      // cheaper than cache management.
      def hrwNode(upTo: Int) = array_max(array((0 until upTo).map { n =>
        struct(Portable.h60(concat(col("c_custkey").cast("string"),
                                   lit(s"|hrw|$n"))).as("h"),
               lit(n).as("n"))
      }: _*)).getField("n")
      val m = Tables.customer(s, d)
        .select(col("c_custkey").as("key"),
                hrwNode(5).as("node_a"), hrwNode(6).as("node_b"))
      val bef = m.groupBy(col("node_a").as("node")).agg(count(lit(1)).as("n_before"))
      val aft = m.groupBy(col("node_b").as("node"))
        .agg(count(lit(1)).as("n_after"),
             sum(when(col("node_a") =!= col("node_b"), 1L).otherwise(0L)).as("n_arrived"))
      bef.join(aft, Seq("node"), "full_outer")
        .select(col("node"),
                coalesce(col("n_before"), lit(0L)).as("n_before"),
                coalesce(col("n_after"), lit(0L)).as("n_after"),
                coalesce(col("n_arrived"), lit(0L)).as("n_arrived"))
        .orderBy("node")
    }
  )
}
