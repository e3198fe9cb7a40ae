package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The deterministic, engine-portable HLL sketch behind q29_hll_distinct,
  * as a reusable GROUPED operator: m = 64 registers over the md5 h60
  * hash family, register sum kept exact as Σ 2^(55−M_j) in a BIGINT,
  * harmonic estimate in one left-associated double expression —
  * identical arithmetic in Spark and DuckDB, so any query built on it
  * stays oracle-checkable (native approx_count_distinct is not).
  *
  * Scale shape: two map-side-combined aggregations (key×64 registers,
  * then key), shuffling ≤ 64 longs per group — the same wire cost as a
  * real HLL sketch.
  */
object PortableHll {

  /** Append the (reg, rk) register coordinates of `valueCol`'s h60 hash
    * to each row: reg = hv mod 64, rk = leading-rank of the remaining
    * bits (0..55). `MAX(rk) GROUP BY key, reg` is then a mergeable HLL
    * register table — the building block el_hll_sliding max-merges per
    * window and EventStream.hllRegisters maintains incrementally, from
    * ONE shared definition so batch and stream cannot drift. */
  def registerCoords(df: DataFrame, valueCol: Column): DataFrame =
    df.withColumn("hv", Portable.h60(valueCol))
      .withColumn("reg", pmod(col("hv"), lit(64L)))
      .withColumn("rk",
        when(shiftright(col("hv"), 6) === 0L, lit(55))
          .otherwise(lit(55) - length(bin(shiftright(col("hv"), 6)))))

  /** Append (hll_estimate, reg_sum, zero_regs, exact_distinct) per
    * group. `keyCols` are the grouping columns; `valueCol` the counted
    * expression. exact_distinct counts distinct h60 values (hash
    * semantics, like the KMV twin). */
  def distinctSketch(df: DataFrame, keyCols: Seq[String], valueCol: Column): DataFrame = {
    val keys = keyCols.map(col)
    // register coordinates from the ONE shared definition (registerCoords)
    // — a drifted copy here would silently break q29/el_hll_daily's
    // consistency with the sliding/streaming register family
    val ranked = registerCoords(
        df.select(keys :+ valueCol.as("gv"): _*), col("gv"))
      .select(keys ++ Seq(col("hv"), col("reg"), col("rk")): _*)
    ranked
      .groupBy((keys :+ col("reg")): _*)
      .agg(max(col("rk")).as("mreg"), countDistinct(col("hv")).as("nd"))
      .groupBy(keys: _*)
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mreg AS INT))")).as("s_occ"),
           count(lit(1)).as("occ"),
           sum(col("nd")).as("nd"))
      .select(keys ++ Seq(
        (col("s_occ") + (lit(64L) - col("occ")) * lit(36028797018963968L)).as("reg_sum"),
        (lit(64L) - col("occ")).cast("int").as("zero_regs"),
        col("nd").as("exact_distinct")): _*)
      .select(keys ++ Seq(
        (lit(709).cast("double") / lit(1000).cast("double")
          * lit(4096).cast("double")
          * lit(36028797018963968L).cast("double")
          / col("reg_sum").cast("double")).as("hll_estimate"),
        col("reg_sum"), col("zero_regs"), col("exact_distinct")): _*)
  }

  /** DuckDB twin: CTE list computing the same four columns per group.
    * `keyExprs` like "l_returnflag"; `valueExpr` like
    * "CAST(l_partkey AS VARCHAR)"; `from` the source relation. */
  def duckSketchCtes(keyExprs: Seq[String], valueExpr: String, from: String): String = {
    val ks = keyExprs.mkString(", ")
    s"""h AS (
       |  SELECT $ks, ${Portable.duckH(valueExpr, 15)} AS hv
       |  FROM $from),
       |r AS (
       |  SELECT $ks, hv % 64 AS reg, hv,
       |         CASE WHEN (hv >> 6) = 0 THEN 55
       |              ELSE 55 - CAST(length(bin(hv >> 6)) AS INTEGER) END AS rk
       |  FROM h),
       |regs AS (
       |  SELECT $ks, reg, MAX(rk) AS mreg, COUNT(DISTINCT hv) AS nd
       |  FROM r GROUP BY $ks, reg),
       |a AS (
       |  SELECT $ks,
       |         CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - mreg AS INTEGER)) AS BIGINT) AS s_occ,
       |         COUNT(*) AS occ,
       |         CAST(SUM(nd) AS BIGINT) AS nd
       |  FROM regs GROUP BY $ks),
       |sk AS (
       |  SELECT $ks,
       |         CAST(709 AS DOUBLE) / CAST(1000 AS DOUBLE) * CAST(4096 AS DOUBLE)
       |           * CAST(36028797018963968 AS DOUBLE)
       |           / CAST(s_occ + (64 - occ) * 36028797018963968 AS DOUBLE) AS hll_estimate,
       |         s_occ + (64 - occ) * 36028797018963968 AS reg_sum,
       |         CAST(64 - occ AS INTEGER) AS zero_regs,
       |         nd AS exact_distinct
       |  FROM a)""".stripMargin
  }
}
