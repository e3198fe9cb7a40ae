package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `q81_join_estimate` — join-SIZE estimation without running the join:
  * the pre-flight cardinality check a cost-based planner (or an
  * operator about to fan out a 100 TB shuffle) runs first. This is the
  * SAMPLING estimator family, deliberately paired with
  * `q60_join_card_est` (StatsQueries), which is the SKETCH family
  * (count-min inner product): CM gives a one-sided overestimate from
  * fixed-size state and needs no second pass; domain sampling gives an
  * unbiased two-sided estimate but must look up the sampled keys'
  * multiplicities. A planner keeps both — they disagree exactly when
  * the join is skew-dominated, which is itself the signal to check
  * q52_skew_profile before choosing a strategy.
  *
  * Method: key-domain sampling (Estan–Naughton end-biased sampling's
  * uniform core, carried by a KMV sketch). The K smallest md5 hashes
  * over the DISTINCT union key domain form a uniform sample of keys;
  * for each sampled key the exact per-side multiplicities a_k, b_k come
  * from two semi-join-sized lookups, and
  *
  *     |A ⋈ B| = Σ_k a_k·b_k  ≈  (Σ_{k∈S} a_k·b_k) · D̂ / K
  *
  * with D̂ the KMV distinct estimate (K−1)·2³²/θ. Everything is 64-bit
  * integer arithmetic on 32-bit hashes — (K−1)·2³² ≈ 1.1e12, θ ≥ K, so
  * no intermediate overflows, and the whole row is hash-identical in
  * DuckDB. When the domain has fewer than K keys the sketch saturates
  * and the "estimate" is the exact Σ a_k·b_k (scale factor 1) — the
  * oracle pins that degenerate case too.
  *
  * Scale shape: per-side per-key counts are map-side-combined groupBys
  * on the join column ONLY (the narrow projection rides the shuffle,
  * never the payload); the sample is a TakeOrdered over the distinct
  * domain (K rows to the driver — a legitimate broadcast artifact,
  * same budget as the IVF codebooks); the Σ over the sample is two
  * K-row broadcast joins. The exact side — reported here to grade the
  * estimator — is Σ a_k·b_k via the counts join, which never
  * materializes the join's row explosion either.
  *
  * Two join pairs grade both regimes at sf0.01: events⋈orders on
  * customer key is many-to-many over a domain ≪ K (saturated, exact);
  * lineitem⋈orders on order key has a domain ≫ K (genuinely sampled,
  * err_bp is the real KMV error, ~1/√K).
  */
object RelationalQueries14 {

  private val K = 256

  /** One estimated join: per-key count frames (key col aliased `k`),
    * returns the 1-row summary. */
  private[graft] def estimateJoin(name: String, aCnt: DataFrame, bCnt: DataFrame): DataFrame = {
    // ONE full-outer join of the two per-key count frames replaces the
    // round-10 shape in which EACH side's scan + groupBy executed four
    // times (domain-for-sample, domain-for-nd, the sample's two lookup
    // joins, the exact companion join) — guide §1.2 "don't compute
    // things you throw away". The joined frame is exactly the distinct
    // key domain with both multiplicities attached: nd and the exact
    // Σ ca·cb come from one aggregate pass (SUM skips the NULL products
    // of single-side keys, so the inner-join semantics are preserved),
    // and the K-smallest-hash sample carries ca/cb with it, so the
    // sampled Σ needs no lookup joins at all.
    val f = aCnt.withColumnRenamed("cnt", "ca")
      .join(bCnt.withColumnRenamed("cnt", "cb"), Seq("k"), "full_outer")
      .withColumn("hv", Portable.h32(concat(col("k").cast("string"), lit("|jest"))))
    val tot = f.agg(count(lit(1)).as("nd"),
                    coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact_rows"))
    // K smallest hashes: TakeOrdered, never a full sort; (hv, k) order
    // makes md5 collisions (deterministic in both engines) unambiguous
    val sampSum = f.orderBy(col("hv"), col("k")).limit(K)
      .agg(sum(coalesce(col("ca"), lit(0L)) * coalesce(col("cb"), lit(0L))).as("ss"),
           count(lit(1)).as("k_used"),
           max(col("hv")).as("theta"))
    sampSum.crossJoin(tot)
      .select(
        lit(name).as("join_name"),
        col("k_used"),
        when(col("nd") >= K,
             expr(s"(cast(${K - 1} as bigint) * 4294967296) div theta"))
          .otherwise(col("nd")).as("d_est"),
        when(col("nd") >= K,
             expr(s"(ss * ((cast(${K - 1} as bigint) * 4294967296) div theta)) div $K"))
          .otherwise(col("ss")).as("est_rows"),
        col("exact_rows"))
      .withColumn("err_bp",
        expr("(abs(est_rows - exact_rows) * 10000) div greatest(exact_rows, 1)"))
  }

  /** The same estimator as one DuckDB CTE block, parameterized by the
    * two (table, key) sides. */
  private def oracleFor(name: String, aSel: String, bSel: String): String =
    s"""sel_$name AS (
       |  SELECT * FROM (
       |    WITH la AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS ca FROM ($aSel) GROUP BY k),
       |    lb AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS cb FROM ($bSel) GROUP BY k),
       |    dom AS (SELECT k, ${Portable.duckH("CAST(k AS VARCHAR) || '|jest'", 8)} AS hv
       |            FROM (SELECT k FROM la UNION SELECT k FROM lb)),
       |    rk AS (SELECT k, hv, ROW_NUMBER() OVER (ORDER BY hv, k) AS rn FROM dom),
       |    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM dom),
       |    sk AS (SELECT k, hv FROM rk WHERE rn <= $K),
       |    sm AS (SELECT CAST(SUM(COALESCE(ca, 0) * COALESCE(cb, 0)) AS BIGINT) AS ss,
       |                  CAST(COUNT(*) AS BIGINT) AS k_used,
       |                  MAX(hv) AS theta
       |           FROM sk LEFT JOIN la USING (k) LEFT JOIN lb USING (k)),
       |    ex AS (SELECT CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) AS exact_rows
       |           FROM la JOIN lb USING (k))
       |    SELECT '$name' AS join_name, k_used,
       |           CASE WHEN nd.nd >= $K
       |                THEN (CAST(${K - 1} AS BIGINT) * 4294967296) // theta
       |                ELSE nd.nd END AS d_est,
       |           CASE WHEN nd.nd >= $K
       |                THEN (ss * ((CAST(${K - 1} AS BIGINT) * 4294967296) // theta)) // $K
       |                ELSE ss END AS est_rows,
       |           exact_rows,
       |           (abs((CASE WHEN nd.nd >= $K
       |                 THEN (ss * ((CAST(${K - 1} AS BIGINT) * 4294967296) // theta)) // $K
       |                 ELSE ss END) - exact_rows) * 10000)
       |             // greatest(exact_rows, 1) AS err_bp
       |    FROM sm, ex, nd))""".stripMargin

  def defs: Map[String, Q] = Map(
    "q81_join_estimate" -> Q(
      s"""WITH ${oracleFor("events_orders_cust",
                           "SELECT user_id AS k FROM events",
                           "SELECT o_custkey AS k FROM orders")},
         |${oracleFor("lineitem_orders_okey",
                      "SELECT l_orderkey AS k FROM lineitem",
                      "SELECT o_orderkey AS k FROM orders")}
         |SELECT * FROM sel_events_orders_cust
         |UNION ALL SELECT * FROM sel_lineitem_orders_okey
         |ORDER BY join_name""".stripMargin) { (s, d) =>
      def cnts(df: DataFrame, key: String) =
        df.select(col(key).as("k")).groupBy("k").agg(count(lit(1)).as("cnt"))
      val j1 = estimateJoin("events_orders_cust",
        cnts(Tables.events(s, d), "user_id"),
        cnts(Tables.orders(s, d), "o_custkey"))
      val j2 = estimateJoin("lineitem_orders_okey",
        cnts(Tables.lineitem(s, d), "l_orderkey"),
        cnts(Tables.orders(s, d), "o_orderkey"))
      j1.unionByName(j2).orderBy("join_name")
    }
  )
}
