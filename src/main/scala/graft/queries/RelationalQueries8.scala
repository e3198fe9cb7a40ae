package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface, batch 8: ordered string aggregation,
  * the regexp function family, the remaining array higher-order
  * functions (exists/forall/filter/zip_with), and conditional/filtered
  * aggregates — rounding out the scalar/aggregate checklist with
  * portable formulations.
  */
object RelationalQueries8 {

  def defs: Map[String, Q] = Map(

    // Ordered string aggregation (LISTAGG/string_agg): top-3 customers
    // by balance per market segment, concatenated IN RANK ORDER. The
    // Spark side sorts (rn, name) structs before joining — collect_list
    // order is nondeterministic, array_sort makes it exact — which is
    // the portable form of DuckDB's string_agg(... ORDER BY rn).
    "q45_listagg" -> Q(
      """WITH r AS (
        |  SELECT c_mktsegment, c_name, c_acctbal,
        |         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |SELECT c_mktsegment,
        |       string_agg(c_name, ',' ORDER BY rn) AS top_names,
        |       COUNT(*) AS n
        |FROM r WHERE rn <= 3 GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy("c_mktsegment")
        .agg(array_join(
               transform(array_sort(collect_list(struct(col("rn"), col("c_name")))),
                         x => x.getField("c_name")), ",").as("top_names"),
             count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },

    // Regexp family: extract (first match), extract_all (+ count), and
    // match-test over the part strings. Patterns stay in the basic
    // character-class subset where Java regex (Spark) and RE2 (DuckDB)
    // agree.
    "q46_regexp_suite" -> Q(
      """SELECT p_partkey,
        |       CAST(regexp_extract(p_brand, '[0-9]+') AS INTEGER) AS brand_num,
        |       CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INTEGER) AS n_words,
        |       regexp_extract_all(p_name, '[a-z]+')[1] AS first_word,
        |       CAST(regexp_matches(p_name, '^[aeiou]') AS INTEGER) AS vowel_start,
        |       regexp_replace(p_type, '[AEIOU]', '_', 'g') AS type_masked
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
                regexp_extract(col("p_brand"), "[0-9]+", 0).cast("int").as("brand_num"),
                size(expr("regexp_extract_all(p_name, '[a-z]+', 0)")).as("n_words"),
                element_at(expr("regexp_extract_all(p_name, '[a-z]+', 0)"), 1).as("first_word"),
                col("p_name").rlike("^[aeiou]").cast("int").as("vowel_start"),
                regexp_replace(col("p_type"), "[AEIOU]", "_").as("type_masked"))
        .orderBy("p_partkey")
    },

    // Array higher-order functions not yet covered: exists / forall /
    // filter-count / zip_with. All comparisons and sums go through
    // explicit double casts so both engines do identical IEEE ops
    // (a bare 0.99 literal is DECIMAL in DuckDB).
    "q47_hof_suite" -> Q(
      """SELECT vec_id,
        |       CAST(list_bool_or([CAST(x AS DOUBLE) > CAST(0.99 AS DOUBLE) for x in embedding]) AS INTEGER) AS any_hot,
        |       CAST(list_bool_and([CAST(x AS DOUBLE) > CAST(-2 AS DOUBLE) for x in embedding]) AS INTEGER) AS all_gt_neg2,
        |       CAST(len([x for x in embedding if CAST(x AS DOUBLE) > CAST(0 AS DOUBLE)]) AS INTEGER) AS n_pos,
        |       CAST(embedding[1] AS DOUBLE) + CAST(embedding[len(embedding)] AS DOUBLE) AS palin1,
        |       CAST(embedding[2] AS DOUBLE) + CAST(embedding[len(embedding)-1] AS DOUBLE) AS palin2,
        |       list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS abs_max
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      val ed = transform(col("embedding"), x => x.cast("double"))
      // materialize the double array once — six HOFs reference it
      Tables.embeddings(s, d)
        .select(col("vec_id"), ed.as("ed"))
        .select(col("vec_id"),
                exists(col("ed"), _ > 0.99).cast("int").as("any_hot"),
                forall(col("ed"), _ > -2.0).cast("int").as("all_gt_neg2"),
                size(filter(col("ed"), _ > 0.0)).as("n_pos"),
                element_at(zip_with(col("ed"), reverse(col("ed")), _ + _), 1).as("palin1"),
                element_at(zip_with(col("ed"), reverse(col("ed")), _ + _), 2).as("palin2"),
                array_max(transform(col("ed"), abs(_))).as("abs_max"))
        .orderBy("vec_id")
    },

    // Conditional / filtered aggregates: count-if, bool_and/bool_or
    // (EVERY/SOME), and a filtered DISTINCT count via the NULL-ing CASE
    // (both engines skip NULLs in COUNT DISTINCT).
    "q48_conditional_aggs" -> Q(
      """SELECT l_linestatus,
        |       CAST(COUNT(CASE WHEN l_quantity = 50 THEN 1 END) AS BIGINT) AS n_max_qty,
        |       CAST(bool_and(l_quantity > 0) AS INTEGER) AS all_pos,
        |       CAST(bool_or(l_discount > CAST(0.09 AS DOUBLE)) AS INTEGER) AS any_big_disc,
        |       CAST(COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_partkey END) AS BIGINT) AS r_parts
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(count(when(col("l_quantity") === 50, 1)).as("n_max_qty"),
             expr("bool_and(l_quantity > 0)").cast("int").as("all_pos"),
             expr("bool_or(l_discount > CAST(0.09 AS DOUBLE))").cast("int").as("any_big_disc"),
             countDistinct(when(col("l_returnflag") === "R", col("l_partkey"))).as("r_parts"))
        .orderBy("l_linestatus")
    },

    // Ordered-set aggregates done portably: MODE (most frequent value,
    // ties → smallest) and the LOWER MEDIAN (k-th smallest, k=(n+1)/2)
    // per event type — both engines' native mode()/median() have
    // engine-specific tie/interpolation semantics, so both are computed
    // manually over integer cents with deterministic tie-breaks. EVERY
    // window here runs over the per-VALUE count table, never the raw
    // rows: the median is read from the cumulative count (first value
    // whose running count reaches k) — at 100 TB the value table is
    // orders of magnitude smaller than the event stream, and the scan
    // contributes one map-side-combined aggregate.
    "q49_mode_median" -> Q(
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS c FROM events),
        |cnt AS (
        |  SELECT event_type, c, COUNT(*) AS n FROM ev GROUP BY event_type, c),
        |tot AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_rows FROM cnt GROUP BY event_type),
        |md AS (
        |  SELECT event_type, c, n,
        |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, c ASC) AS rn
        |  FROM cnt),
        |cum AS (
        |  SELECT event_type, c,
        |         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY c
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM cnt),
        |med AS (
        |  SELECT u.event_type, MIN(u.c) AS med_c
        |  FROM cum u JOIN tot t ON u.event_type = t.event_type
        |  WHERE u.cum >= (t.n_rows + 1) // 2
        |  GROUP BY u.event_type)
        |SELECT m.event_type,
        |       CAST(m.c AS DOUBLE) / CAST(100 AS DOUBLE) AS mode_value,
        |       CAST(m.n AS BIGINT) AS mode_count,
        |       CAST(x.med_c AS DOUBLE) / CAST(100 AS DOUBLE) AS median_value,
        |       t.n_rows
        |FROM (SELECT * FROM md WHERE rn = 1) m
        |JOIN med x ON m.event_type = x.event_type
        |JOIN tot t ON m.event_type = t.event_type
        |ORDER BY m.event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // ONE events scan: the value table feeds mode, total, and median;
      // the eager checkpoint stops its scan+aggregate lineage from
      // re-executing per consumer (tiny frame — distinct values only)
      val cnt = Tables.events(s, d)
        .select(col("event_type"), graft.functions.Portable.cents(col("value")).as("c"))
        .groupBy("event_type", "c").agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val tot = cnt.groupBy(col("event_type").as("t_type"))
        .agg(sum(col("n")).as("n_rows"))
      val wMode = Window.partitionBy("event_type").orderBy(col("n").desc, col("c").asc)
      val md = cnt
        .withColumn("rn", row_number().over(wMode))
        .filter(col("rn") === 1)
        .select(col("event_type").as("m_type"), col("c").as("m_c"), col("n"))
      val wCum = Window.partitionBy("event_type").orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = cnt
        .withColumn("cum", sum(col("n")).over(wCum))
        .join(broadcast(tot), col("event_type") === col("t_type"))
        .filter(col("cum") >= expr("(n_rows + 1) div 2"))
        .groupBy(col("event_type").as("x_type")).agg(min(col("c")).as("med_c"))
      md.join(med, col("m_type") === col("x_type"))
        .join(broadcast(tot), col("m_type") === col("t_type"))
        .select(col("m_type").as("event_type"),
                (col("m_c").cast("double") / lit(100.0)).as("mode_value"),
                col("n").as("mode_count"),
                (col("med_c").cast("double") / lit(100.0)).as("median_value"),
                col("n_rows"))
        .orderBy("event_type")
    },

    // Convergence observability for the iterative rank: per-round
    // |delta| profile over THREE supplier rounds — the table that tells
    // a user whether q50's two rounds suffice (deltas shrinking by
    // ~damping per round) or the iteration must continue. Rounds stay a
    // parameter ([[supplierRankRounds]], like IVF's k/nprobe); each
    // round frame is eagerly materialized here because every round is
    // consumed twice (as a delta's before AND after) — without the
    // barrier the whole prefix chain re-executes per delta. Exact by
    // the same integer quantization as q50, so max/mean deltas are
    // oracle-checkable to the bit.
    "q50_rank_convergence" -> Q(
      """WITH e AS (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |degc AS (SELECT cust, COUNT(*) AS dc FROM e GROUP BY cust),
        |degs AS (SELECT supp, COUNT(*) AS ds FROM e GROUP BY supp),
        |s1 AS (
        |  SELECT e.supp,
        |         150000000 + CAST(SUM(85000000000 // (100 * d.dc)) AS BIGINT) AS r
        |  FROM e JOIN degc d ON e.cust = d.cust GROUP BY e.supp),
        |r1 AS (
        |  SELECT e.cust,
        |         150000000 + CAST(SUM((s.r * 85) // (100 * g.ds)) AS BIGINT) AS r
        |  FROM e JOIN s1 s ON e.supp = s.supp JOIN degs g ON e.supp = g.supp
        |  GROUP BY e.cust),
        |s2 AS (
        |  SELECT e.supp,
        |         150000000 + CAST(SUM((c.r * 85) // (100 * d.dc)) AS BIGINT) AS r
        |  FROM e JOIN r1 c ON e.cust = c.cust JOIN degc d ON e.cust = d.cust
        |  GROUP BY e.supp),
        |r2 AS (
        |  SELECT e.cust,
        |         150000000 + CAST(SUM((s.r * 85) // (100 * g.ds)) AS BIGINT) AS r
        |  FROM e JOIN s2 s ON e.supp = s.supp JOIN degs g ON e.supp = g.supp
        |  GROUP BY e.cust),
        |s3 AS (
        |  SELECT e.supp,
        |         150000000 + CAST(SUM((c.r * 85) // (100 * d.dc)) AS BIGINT) AS r
        |  FROM e JOIN r2 c ON e.cust = c.cust JOIN degc d ON e.cust = d.cust
        |  GROUP BY e.supp),
        |deltas AS (
        |  SELECT 2 AS rnd, ABS(b.r - a.r) AS ad FROM s2 b JOIN s1 a ON b.supp = a.supp
        |  UNION ALL
        |  SELECT 3 AS rnd, ABS(b.r - a.r) AS ad FROM s3 b JOIN s2 a ON b.supp = a.supp)
        |SELECT CAST(rnd AS INTEGER) AS round, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |       MAX(ad) AS max_abs_delta_e9,
        |       CAST(MAX(ad) AS DOUBLE) / 1000000000 AS max_abs_delta,
        |       CAST(SUM(ad) AS DOUBLE) / COUNT(*) / 1000000000 AS mean_abs_delta,
        |       CAST(SUM(CASE WHEN ad > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
        |FROM deltas GROUP BY rnd ORDER BY round""".stripMargin) { (s, d) =>
      val (_, rounds) = rankRoundsCached(s, d)
      def delta(rnd: Int, before: org.apache.spark.sql.DataFrame,
                after: org.apache.spark.sql.DataFrame) =
        after.select(col("supp").as("b_supp"), col("r").as("b_r"))
          .join(before.select(col("supp").as("a_supp"), col("r").as("a_r")),
                col("b_supp") === col("a_supp"))
          .select(lit(rnd).as("round"), abs(col("b_r") - col("a_r")).as("ad"))
      delta(2, rounds(0), rounds(1))
        .unionByName(delta(3, rounds(1), rounds(2)))
        .groupBy("round")
        .agg(count(lit(1)).as("n_suppliers"),
             max(col("ad")).as("max_abs_delta_e9"),
             (max(col("ad")).cast("double") / lit(1e9)).as("max_abs_delta"),
             (sum(col("ad")).cast("double") / count(lit(1)) / lit(1e9)).as("mean_abs_delta"),
             sum(when(col("ad") > 0, 1L).otherwise(0L)).as("n_changed"))
        .orderBy("round")
    },

    // PageRank-style rank propagation over the customer↔supplier
    // bipartite graph (distinct (cust, supp) trade edges from
    // orders⋈lineitem) — iterative distributed graph analytics in the
    // damped power-iteration shape, kept ORACLE-EXACT by integer
    // quantization: ranks live at scale 1e9, every per-edge
    // contribution is (rank·85) div (100·out_degree) in BIGINT (floor
    // division — associative, order-independent), damping base is
    // 0.15e9. Two full cust→supp→cust→supp rounds, each one equi-join +
    // map-side-combined aggregate — rounds scale linearly in edges, and
    // the degree dims join by key (broadcastable when small, shuffled
    // when not — AQE's call). The iterative sibling of the
    // connected-components loop in ClusterQueries.
    "q50_graph_rank" -> Q(
      """WITH e AS (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |degc AS (SELECT cust, COUNT(*) AS dc FROM e GROUP BY cust),
        |degs AS (SELECT supp, COUNT(*) AS ds FROM e GROUP BY supp),
        |s1 AS (
        |  SELECT e.supp,
        |         150000000 + CAST(SUM(85000000000 // (100 * d.dc)) AS BIGINT) AS r
        |  FROM e JOIN degc d ON e.cust = d.cust GROUP BY e.supp),
        |r1 AS (
        |  SELECT e.cust,
        |         150000000 + CAST(SUM((s.r * 85) // (100 * g.ds)) AS BIGINT) AS r
        |  FROM e JOIN s1 s ON e.supp = s.supp JOIN degs g ON e.supp = g.supp
        |  GROUP BY e.cust),
        |s2 AS (
        |  SELECT e.supp,
        |         150000000 + CAST(SUM((c.r * 85) // (100 * d.dc)) AS BIGINT) AS r
        |  FROM e JOIN r1 c ON e.cust = c.cust JOIN degc d ON e.cust = d.cust
        |  GROUP BY e.supp)
        |SELECT s2.supp AS s_suppkey, g.ds AS n_customers,
        |       CAST(s2.r AS DOUBLE) / CAST(1000000000 AS DOUBLE) AS rank_score
        |FROM s2 JOIN degs g ON s2.supp = g.supp
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val (degs, rounds) = rankRoundsCached(s, d)
      rounds(1).select(col("supp").as("s2_supp"), col("r").as("s2_r"))
        .join(degs, col("s2_supp") === col("ds_supp"))
        .select(col("s2_supp").as("s_suppkey"), col("ds").as("n_customers"),
                (col("s2_r").cast("double") / lit(1e9)).as("rank_score"))
        .orderBy("s_suppkey")
    }
  )

  /** The damped power iteration of q50_graph_rank with ROUNDS AS A
    * PARAMETER (the IVF k/nprobe pattern): returns the supplier-degree
    * dim (ds_supp, ds) and each round's supplier rank frame, columns
    * (supp, r) at the 1e9 integer scale.
    *
    * The edge list is materialized ONCE (eager localCheckpoint, the
    * ClusterQueries iteration pattern): it feeds both degree dims and
    * every propagation round — without the barrier the orders⋈lineitem
    * join + distinct re-executes per round and per dim. The per-round
    * degree joins stay: the degree-EMBEDDED edge layout (checkpoint
    * (cust, supp, dc, ds), no degree join per round) was A/B-measured
    * and LOST at the decade-up SF (median 6.48 s vs 5.36 s at sf1;
    * ~even at sf0.1) — the 2×-wider materialization costs more than the
    * joins it saves while the degree dims remain broadcast-sized, which
    * they are until customer-dim scale stops fitting broadcast.
    * Revisit only past that point.
    *
    * @param materialize applied to each round's supplier frame — pass
    *   `_.localCheckpoint(true)` when rounds are consumed more than
    *   once (the convergence profile), `identity` for a linear chain.
    */
  /** The distinct (cust, supp) trade-edge list, checkpointed ONCE per
    * corpus and shared by q50_graph_rank and q50_rank_convergence (the
    * bandCandidatesCached pattern): the orders⋈lineitem join + distinct
    * is the dominant cost of both queries, and each consumer would
    * otherwise rebuild it per construction. Session-lifetime; evicted by
    * ArtifactStore.invalidate. */
  private val edgeCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  graft.ArtifactStore.onInvalidate(edgeCache.remove(_))

  private[queries] def tradeEdges(s: org.apache.spark.sql.SparkSession,
                                  d: String): org.apache.spark.sql.DataFrame =
    edgeCache.computeIfAbsent(d, _ =>
      Tables.orders(s, d).select(col("o_custkey").as("cust"), col("o_orderkey"))
        .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey").as("supp")),
              col("o_orderkey") === col("l_orderkey"))
        .select(col("cust"), col("supp")).distinct()
        .localCheckpoint(true))

  /** The 3-round materialized rank chain per CORPUS, shared by
    * q50_graph_rank (reads round 2) and q50_rank_convergence (reads all
    * three + deltas) — round r of an n-round chain is identical math to
    * round r of any longer chain, so one checkpointed chain serves both.
    * Evicted with the artifact store; Warm pre-builds it, so the
    * three-round propagation cost sits on the artifact_build line. */
  private val rankCache = new java.util.concurrent.ConcurrentHashMap[
    String, (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame])]()

  graft.ArtifactStore.onInvalidate(rankCache.remove(_))

  private[queries] def rankRoundsCached(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) =
    rankCache.computeIfAbsent(d, _ => {
      val (degs, rounds) = supplierRankRounds(s, d, 3, _.localCheckpoint(true))
      (degs.localCheckpoint(true), rounds)
    })

  private def supplierRankRounds(
      s: org.apache.spark.sql.SparkSession, d: String, n: Int,
      materialize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity)
      : (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) = {
    val e = tradeEdges(s, d)
    val degc = e.groupBy(col("cust").as("dc_cust")).agg(count(lit(1)).as("dc"))
    val degs = e.groupBy(col("supp").as("ds_supp")).agg(count(lit(1)).as("ds"))
    var cur = materialize(e.join(degc, col("cust") === col("dc_cust"))
      .groupBy(col("supp"))
      .agg((lit(150000000L) +
            sum(expr("CAST(85000000000 AS BIGINT) div (100 * dc)"))).as("r")))
    val out = scala.collection.mutable.ArrayBuffer(cur)
    for (_ <- 2 to n) {
      val rI = e.join(cur.select(col("supp").as("s_supp"), col("r").as("s_r")),
                      col("supp") === col("s_supp"))
        .join(degs, col("supp") === col("ds_supp"))
        .groupBy(col("cust").as("r_cust"))
        .agg((lit(150000000L) + sum(expr("(s_r * 85) div (100 * ds)"))).as("r_r"))
      cur = materialize(e.join(rI, col("cust") === col("r_cust"))
        .join(degc, col("cust") === col("dc_cust"))
        .groupBy(col("supp"))
        .agg((lit(150000000L) + sum(expr("(r_r * 85) div (100 * dc)"))).as("r")))
      out += cur
    }
    (degs, out.toSeq)
  }
}
