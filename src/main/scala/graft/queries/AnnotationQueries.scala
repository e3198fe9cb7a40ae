package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Annotation / label-aggregation operators — the human-feedback leg of
  * a training-data pipeline (RLHF preference labels, quality-rater pools,
  * eval-set adjudication all reduce to: N noisy raters per item, one
  * aggregated label out, plus rater-reliability accounting).
  *
  * The corpus has no rater columns, so three deterministic synthetic
  * raters are derived per doc (the fixture-augmentation contract): truth
  * t = doc_id % 2, and rater j flips t when (doc_id · P_j) % 100 < 10·j —
  * rater 1 is the most reliable (10% flips), rater 3 the noisiest (30%),
  * so every reliability statistic has real spread to measure.
  *
  * All three operators are one flat projection + one map-side-combined
  * aggregate (vote: source-rollup; kappa: 3-row pair rollup; Fleiss: one
  * scalar row) — nothing joins, nothing shuffles more than the group
  * keys. Agreement statistics are EXACT RATIONALS floored to basis
  * points at the end (Spark `div` and DuckDB `//` both truncate toward
  * zero, including negative κ — the StatsQueries2 discipline). Overflow:
  * Fleiss' 10000·18n² term caps exact arithmetic at ~10⁷ items per
  * aggregation scope; beyond that the rollup shards by source first.
  */
object AnnotationQueries {

  /** Rater votes as portable SQL fragments (identical text in both
    * dialects): flip truth when the hash residue is under the rate. */
  private def rater(prime: Long, pct: Int): String =
    s"CASE WHEN (doc_id * $prime) % 100 < $pct THEN 1 - doc_id % 2 ELSE doc_id % 2 END"

  private val V1 = rater(7919L, 10)
  private val V2 = rater(104729L, 20)
  private val V3 = rater(1299709L, 30)

  private val duckLab =
    s"""lab AS (
       |  SELECT doc_id, source, doc_id % 2 AS t,
       |         $V1 AS v1, $V2 AS v2, $V3 AS v3
       |  FROM documents)""".stripMargin

  private def sparkLab(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"), col("source"), (col("doc_id") % 2).as("t"),
      expr(V1).as("v1"), expr(V2).as("v2"), expr(V3).as("v3"))

  def defs: Map[String, Q] = Map(

    // Majority-vote aggregation with truth accounting: per source, how
    // often the 2-of-3 majority recovers truth vs each rater alone (the
    // wisdom-of-crowds gain a rater pool is paid for), plus the
    // unanimity rate (the easy-item share).
    "ta_label_vote" -> Q(
      s"""WITH $duckLab,
         |vote AS (
         |  SELECT *, CASE WHEN v1 + v2 + v3 >= 2 THEN 1 ELSE 0 END AS mj FROM lab)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
         |       CAST(SUM(CASE WHEN mj = t THEN 1 ELSE 0 END) AS BIGINT) AS majority_correct,
         |       CAST(SUM(CASE WHEN v1 = v2 AND v2 = v3 THEN 1 ELSE 0 END) AS BIGINT) AS unanimous,
         |       CAST(SUM(CASE WHEN v1 = t THEN 1 ELSE 0 END) AS BIGINT) AS r1_correct,
         |       CAST(SUM(CASE WHEN v2 = t THEN 1 ELSE 0 END) AS BIGINT) AS r2_correct,
         |       CAST(SUM(CASE WHEN v3 = t THEN 1 ELSE 0 END) AS BIGINT) AS r3_correct
         |FROM vote GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      sparkLab(s, d)
        .withColumn("mj", when(col("v1") + col("v2") + col("v3") >= 2, 1).otherwise(0))
        .groupBy("source")
        .agg(count(lit(1)).as("docs"),
             sum(when(col("mj") === col("t"), 1L).otherwise(0L)).as("majority_correct"),
             sum(when(col("v1") === col("v2") && col("v2") === col("v3"), 1L)
               .otherwise(0L)).as("unanimous"),
             sum(when(col("v1") === col("t"), 1L).otherwise(0L)).as("r1_correct"),
             sum(when(col("v2") === col("t"), 1L).otherwise(0L)).as("r2_correct"),
             sum(when(col("v3") === col("t"), 1L).otherwise(0L)).as("r3_correct"))
        .orderBy("source")
    },

    // Pairwise Cohen's κ (1960): chance-corrected agreement per rater
    // pair, exact-rational — κ_bp = 10000·(n·agree − E) // (n² − E) with
    // E = a₁b₁ + a₀b₀ the chance-agreement numerator. The reliability
    // triage a rater pool runs weekly: a pair whose κ sinks while raw
    // agreement holds is converging on the MAJORITY CLASS, not on truth.
    "ta_labeler_kappa" -> Q(
      s"""WITH $duckLab,
         |pairs AS (
         |  SELECT 'r1_r2' AS pair, v1 AS a, v2 AS b FROM lab
         |  UNION ALL SELECT 'r1_r3', v1, v3 FROM lab
         |  UNION ALL SELECT 'r2_r3', v2, v3 FROM lab),
         |st AS (
         |  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree,
         |         CAST(SUM(a) AS BIGINT) AS a1, CAST(SUM(b) AS BIGINT) AS b1
         |  FROM pairs GROUP BY pair)
         |SELECT pair, n, agree,
         |       CAST((10000 * (n * agree - (a1*b1 + (n-a1)*(n-b1))))
         |            // (n*n - (a1*b1 + (n-a1)*(n-b1))) AS BIGINT) AS kappa_bp
         |FROM st ORDER BY pair""".stripMargin) { (s, d) =>
      val lab = sparkLab(s, d)
      val pairs = lab.select(lit("r1_r2").as("pair"), col("v1").as("a"), col("v2").as("b"))
        .unionAll(lab.select(lit("r1_r3").as("pair"), col("v1").as("a"), col("v3").as("b")))
        .unionAll(lab.select(lit("r2_r3").as("pair"), col("v2").as("a"), col("v3").as("b")))
      pairs.groupBy("pair")
        .agg(count(lit(1)).as("n"),
             sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"),
             sum(col("a")).as("a1"), sum(col("b")).as("b1"))
        .select(col("pair"), col("n"), col("agree"),
                expr("""(10000 * (n * agree - (a1*b1 + (n-a1)*(n-b1))))
                        div (n*n - (a1*b1 + (n-a1)*(n-b1)))""").as("kappa_bp"))
        .orderBy("pair")
    },

    // Fleiss' κ (1971) for the whole 3-rater pool: per-item pairwise
    // agreement P̄ vs chance P̄e from the pooled class prevalence, reduced
    // to the common-denominator rational κ = (3n·P̄num − 2·P̄e_num) /
    // (2·(9n² − P̄e_num)) so one truncating division at the end keeps the
    // twins hash-exact. One scalar row out.
    "ta_fleiss_kappa" -> Q(
      s"""WITH $duckLab,
         |it AS (
         |  SELECT doc_id, v1 + v2 + v3 AS k FROM lab),
         |agg AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(k) AS BIGINT) AS sk,
         |         CAST(SUM(k*(k-1) + (3-k)*(2-k)) AS BIGINT) AS pbar_num
         |  FROM it)
         |SELECT n, sk AS total_pos_votes, pbar_num,
         |       CAST(sk*sk + (3*n-sk)*(3*n-sk) AS BIGINT) AS pe_num,
         |       CAST((10000 * (3*n*pbar_num - 2*(sk*sk + (3*n-sk)*(3*n-sk))))
         |            // (2 * (9*n*n - (sk*sk + (3*n-sk)*(3*n-sk)))) AS BIGINT)
         |         AS fleiss_bp
         |FROM agg""".stripMargin) { (s, d) =>
      sparkLab(s, d)
        .select((col("v1") + col("v2") + col("v3")).as("k"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
             sum(expr("k*(k-1) + (3-k)*(2-k)")).as("pbar_num"))
        .select(col("n"), col("sk").as("total_pos_votes"), col("pbar_num"),
                expr("cast(sk*sk + (3*n-sk)*(3*n-sk) as bigint)").as("pe_num"),
                expr("""cast((10000 * (3*n*pbar_num - 2*(sk*sk + (3*n-sk)*(3*n-sk))))
                        div (2 * (9*n*n - (sk*sk + (3*n-sk)*(3*n-sk)))) as bigint)""")
          .as("fleiss_bp"))
    }
  )
}
