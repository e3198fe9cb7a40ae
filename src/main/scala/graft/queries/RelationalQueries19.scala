package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Round-8 additions from the round-7 verdict:
  *
  *   - `q92_spatial_radius_scaled` — the spatial radius join with its
  *     radius DECLARED as a density-derived parameter (the IVF k/nprobe
  *     pattern), so the checked query keeps a ~constant per-cell
  *     occupancy at every scale factor — the production shape, next to
  *     q72's deliberately-wide demo radius;
  *   - `q93_mg_survivors` — the Misra–Gries guaranteed-survivor set,
  *     making the round-7 sketch (functions/MisraGries.scala) visible to
  *     the DuckDB oracle gate the way KMV/HLL are.
  */
object RelationalQueries19 {

  val defs: Map[String, Q] = Map(

    // Radius join, production configuration: q72 fixes R at 40° of the
    // 360° space so the sparse small-SF fixtures still yield pairs — at
    // sf10 that parameter is degenerate BY SEMANTICS (≈11% of the space;
    // a radius join approaches all-pairs). Here the radius is a DECLARED
    // density parameter: R = c·space/√n (c = 4), i.e. R² = c²·space²/n =
    // 2073600000000000000 / n in exact integer µdeg² (space = 360·10⁶
    // µdeg, c²·space² = 16·(360·10⁶)² ≈ 2.07·10¹⁸ < 2⁶³). Consequences,
    // all scale-invariant: expected per-cell occupancy is c² = 16 points
    // (cell edge = R), candidate pairs are Θ(9·c²·n/2) — LINEAR in n
    // where q72's fixed-R candidates are Θ(n²) — and the expected result
    // is (π·c²/2)·n ≈ 25·n pairs before the top-20 cut. The oracle
    // computes the same R² from its own COUNT(*) with integer division,
    // so both engines evaluate the identical threshold at every SF. Grid
    // cell size only needs cell ≥ R for 3×3 coverage (candidates are a
    // superset filtered by the exact d2 ≤ R² predicate), so the Spark
    // side derives cell = ⌊√R²⌋ + 1 without needing bit-exact sqrt
    // parity with the oracle. The supplier count is derived IN-PLAN
    // (round-9, per the round-8 verdict): a 1-row broadcast aggregate
    // cross-joined into the point relation — exactly how the oracle's
    // `nn` CTE reads — so the declared query is ONE job with no
    // plan-time control-plane action. R², the grid cell, and the grid
    // coordinates are all columns computed from that broadcast scalar;
    // both join sides derive the cell from the same 1-row relation, so
    // the grid keys stay consistent. At tiny SFs R exceeds the space and the join
    // degrades to all-pairs over a handful of points (n=10 → 45 pairs) —
    // correct and cheap; at sf10 (100k points) R ≈ 4.6·10⁶ µdeg (1.3% of
    // the space) and the plan stays density-bounded.
    "q92_spatial_radius_scaled" -> Q(
      """WITH nn AS (SELECT COUNT(*) AS n FROM supplier),
        |pts AS (
        |  SELECT s_suppkey AS k,
        |         (s_suppkey * 2654435761) % 360000000 AS x,
        |         (s_suppkey * 2246822519) % 360000000 AS y
        |  FROM supplier),
        |pr AS (
        |  SELECT a.k AS k_a, b.k AS k_b,
        |         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
        |  FROM pts a JOIN pts b ON a.k < b.k)
        |SELECT k_a, k_b, CAST(d2 AS BIGINT) AS d2
        |FROM pr, nn WHERE d2 <= 2073600000000000000 // nn.n
        |ORDER BY d2, k_a, k_b LIMIT 20""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d)
      // In-plan density parameter: one broadcast 1-row count relation —
      // no separate plan-time job. r2 uses exact integer `div` (matches
      // DuckDB's //); cell only needs cell ≥ R (candidates are a
      // superset re-filtered by the exact d2 ≤ r2 predicate), so a
      // double sqrt rounded up is sound without bit-exact sqrt parity.
      val nn = broadcast(sup.agg(count(lit(1)).as("n")))
      val pts = sup.select(
        col("s_suppkey").as("k"),
        ((col("s_suppkey") * 2654435761L) % 360000000L).as("x"),
        ((col("s_suppkey") * 2246822519L) % 360000000L).as("y"))
        .crossJoin(nn)
        .withColumn("r2", expr("2073600000000000000 div n"))
        .withColumn("cell", expr("cast(sqrt(cast(r2 as double)) as bigint) + 1"))
        .withColumn("cx", expr("x div cell")).withColumn("cy", expr("y div cell"))
        .drop("n", "cell")
      val offs = s.range(0, 1).select(explode(array(
        (for (dx <- -1 to 1; dy <- -1 to 1)
          yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)).as("o"))
        .select(col("o.dx").as("dx"), col("o.dy").as("dy"))
      val aExp = pts.toDF("ka", "xa", "ya", "r2", "cxa", "cya")
        .crossJoin(broadcast(offs))
        .withColumn("ncx", col("cxa") + col("dx"))
        .withColumn("ncy", col("cya") + col("dy"))
      aExp.join(pts.toDF("kb", "xb", "yb", "r2b", "cxb", "cyb").drop("r2b"),
          col("ncx") === col("cxb") && col("ncy") === col("cyb") &&
          col("ka") < col("kb"))
        .select(col("ka").as("k_a"), col("kb").as("k_b"),
                ((col("xa") - col("xb")) * (col("xa") - col("xb")) +
                 (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("d2"),
                col("r2"))
        .filter(col("d2") <= col("r2"))
        .drop("r2")
        .orderBy("d2", "k_a", "k_b")
        .limit(20)
    },

    // Misra–Gries, oracle-checked: the sketch's full counter map is
    // partition-order-dependent (correctly un-oracled; MisraGriesSpec
    // pins its guarantees instead), but the GUARANTEED-survivor set is
    // deterministic — every key with true frequency > n/(k+1) MUST be in
    // the k-counter summary (Misra & Gries 1982), so joining the exact
    // per-key counts against the sketch's survivors and filtering to
    // cnt·(k+1) > n (exact integer math, no division) yields precisely
    // the true heavy hitters with their exact counts, independent of
    // which sub-threshold counters happened to survive. A dropped heavy
    // hitter — the failure mode the guarantee forbids — would surface as
    // a missing row against the sketch-free oracle. Scale shape: the
    // sketch side is one ≤k-row broadcast (partial aggregation ships ≤k
    // counters per partition); the exact side is the plain map-side-
    // combined groupBy any exact top-k needs. l_linenumber is the
    // fixture's naturally skewed key (share of line j ∝ (8−j)/28), so
    // k = 8 → threshold n/9 keeps a stable nonempty survivor set at
    // every SF.
    "q93_mg_survivors" -> Q(
      """SELECT CAST(l_linenumber AS BIGINT) AS survivor_key,
        |       COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1
        |HAVING COUNT(*) * 9 > (SELECT COUNT(*) FROM lineitem)
        |ORDER BY survivor_key""".stripMargin) { (s, d) =>
      graft.functions.MisraGries.register(s)
      val keys = Tables.lineitem(s, d)
        .select(col("l_linenumber").cast("long").as("survivor_key"))
      val survivors = keys
        .agg(call_function("misra_gries", col("survivor_key"), lit(8)).as("m"))
        .select(explode(map_keys(col("m"))).as("survivor_key"))
      val exact = keys.groupBy("survivor_key").agg(count(lit(1)).as("n_rows"))
      val total = keys.agg(count(lit(1)).as("n_total"))
      exact
        .join(broadcast(survivors), Seq("survivor_key"), "left_semi")
        .crossJoin(broadcast(total))
        .filter(col("n_rows") * 9 > col("n_total"))
        .select(col("survivor_key"), col("n_rows"))
        .orderBy("survivor_key")
    }
  )
}
