package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `ta_neyman_alloc` — Neyman-optimal allocation of a fixed sampling
  * budget across strata (Neyman 1934): the eval-set construction step
  * that beats proportional sampling whenever strata differ in variance
  * (sample where the signal varies, not where the rows are).
  *
  * The textbook weight is N_h·S_h, which collapses to ONE exact integer
  * expression here: population variance is (N·Σx² − (Σx)²)/N², so
  * N_h·S_h = √(N_h·Σx² − (Σx)²) — the whole weight is the square root
  * of an exact BIGINT. One IEEE sqrt (correctly rounded in both
  * engines) quantized to milli-units is the only float step; seats then
  * assign by LARGEST REMAINDER (Hamilton's method): base = B·W div ΣW,
  * the B − Σbase leftovers go to the largest division remainders
  * (source-name tie-break), so Σalloc = B exactly — deterministic and
  * hash-checked, where a float-share rounding would drift.
  *
  * Scale shape: one map-side-combined pass to the |sources|-row strata
  * grid; everything downstream (ΣW broadcast, the remainder rank) is
  * dimension-bounded. The rank window over the source domain is an
  * ANNOUNCED bounded global window (PlanAssertionsSpec allowlist).
  */
object SamplingQueries {

  private val Budget = 1000L

  def defs: Map[String, Q] = Map(

    "ta_neyman_alloc" -> Q(
      s"""WITH s AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx,
         |         CAST(SUM(n_chars) AS BIGINT) AS sx
         |  FROM documents GROUP BY source),
         |w AS (
         |  SELECT source, n,
         |         CAST(floor(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * 1000) AS BIGINT) AS w_milli
         |  FROM s),
         |t AS (SELECT CAST(SUM(w_milli) AS BIGINT) AS tw FROM w),
         |a AS (
         |  SELECT w.source, w.n, w.w_milli,
         |         ($Budget * w.w_milli) // t.tw AS base,
         |         ($Budget * w.w_milli) % t.tw AS rem
         |  FROM w, t),
         |l AS (SELECT CAST($Budget - SUM(base) AS BIGINT) AS leftover FROM a),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk FROM a)
         |SELECT r.source, CAST(r.n AS INTEGER) AS n_docs, r.w_milli,
         |       CAST(r.base + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END
         |            AS INTEGER) AS alloc
         |FROM r, l ORDER BY r.source""".stripMargin) { (s, d) =>
      val strata = Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
             sum(col("n_chars") * col("n_chars")).as("sxx"),
             sum(col("n_chars")).as("sx"))
      val w = strata.select(col("source"), col("n"),
        floor(sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
                * 1000).cast("long").as("w_milli"))
      val t = w.agg(sum(col("w_milli")).as("tw"))
      val a = w.crossJoin(broadcast(t))
        .select(col("source"), col("n"), col("w_milli"),
          expr(s"(${Budget}L * w_milli) div tw").as("base"),
          expr(s"(${Budget}L * w_milli) % tw").as("rem"))
      val l = a.agg((lit(Budget) - sum(col("base"))).as("leftover"))
      a.withColumn("rk",
          row_number().over(Window.orderBy(col("rem").desc, col("source"))))
        .crossJoin(broadcast(l))
        .select(col("source"), col("n").cast("int").as("n_docs"), col("w_milli"),
          (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .cast("int").as("alloc"))
        .orderBy("source")
    })
}
