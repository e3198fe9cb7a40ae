package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable.{cents, duckH, h60}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventh-session statistics additions.
  *
  *  - `el_mann_whitney`: the nonparametric arm of the experimentation
  *    suite — a rank-sum (Mann-Whitney U) readout of per-user revenue
  *    between the `exp1` hash-assigned arms, complementing the
  *    mean-based `el_ab_lift`/`el_cuped` pair for heavy-tailed metrics
  *    where a t-statistic is the wrong tool.
  *  - `el_compaction_plan`: the small-files planner — given per
  *    (event_type, day) partition cells, greedily pack consecutive days
  *    into target-sized output files and report the naive-vs-planned
  *    small-file counts. The 100 TB problem this models: a
  *    `partitionBy(type, date)` writer emits one file per cell and
  *    drowns the namenode/object store in KB-scale objects; the fix is
  *    metadata-scale planning, never a second pass over rows.
  */
object StatsQueries4 {

  private val UsPerDay = 86400000000L

  /** Next-fit packing target in estimated bytes. Fixture-scaled (64 KiB)
    * so the plan produces a multi-file layout at sf0.01; a deployment
    * would set 128 MiB — the planner shape is target-independent. */
  private val TargetBytes = 65536L

  def defs: Map[String, Q] = Map(

    // Mann-Whitney U between the exp1 arms on per-user revenue. Scale
    // shape: ranks are NEVER assigned per user — the metric is
    // discretized onto a bounded grid (whole dollars, capped at 1024:
    // the el_winsorize/el_pareto_share recipe, documented as part of
    // the test's semantics), per-value arm counts aggregate map-side,
    // and the rank arithmetic runs on the ≤1026-row grid. The only
    // global window therefore sees bounded input by construction
    // (PlanAssertionsSpec pins this). With heavy ties the U statistic
    // is exact under average-rank convention: rows at value v share
    // rank cum_before + (n_v+1)/2, so 2·R1 = Σ n1_v·(2·cum_before_v +
    // n_v + 1) stays integral, and 2·U1 = 2·R1 − n1·(n1+1). The tie
    // correction Σ(t³−t) ships alongside so a consumer can form the
    // variance n0·n1/12·((N+1) − T/(N(N−1))) — the z itself needs a
    // sqrt, deliberately left out of the hash-checked surface (same
    // stance as el_ab_lift).
    "el_mann_whitney" -> Q(
      s"""WITH pu AS (
         |  SELECT user_id,
         |         ${duckH("'exp1|' || CAST(user_id AS VARCHAR)", 15)} % 2 AS variant,
         |         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
         |         CAST(SUM(CASE WHEN event_type = 'purchase'
         |                       THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
         |           AS revenue_cents
         |  FROM events GROUP BY 1, 2),
         |m AS (
         |  SELECT variant, LEAST(revenue_cents // 100, 1024) AS yb
         |  FROM pu WHERE t_view IS NOT NULL),
         |g AS (
         |  SELECT yb,
         |         CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |         CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
         |  FROM m GROUP BY yb),
         |r AS (
         |  SELECT yb, n0, n1,
         |         COALESCE(SUM(n0 + n1) OVER (
         |           ORDER BY yb ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS cum_before
         |  FROM g)
         |SELECT CAST(SUM(n0) AS BIGINT) AS n_control,
         |       CAST(SUM(n1) AS BIGINT) AS n_treatment,
         |       CAST(SUM(n1 * (2 * cum_before + n0 + n1 + 1)) AS BIGINT) AS rank_sum_treat_x2,
         |       CAST(SUM(n1 * (2 * cum_before + n0 + n1 + 1))
         |            - SUM(n1) * (SUM(n1) + 1) AS BIGINT) AS u_treat_x2,
         |       CAST(SUM((n0 + n1) * (n0 + n1) * (n0 + n1) - (n0 + n1)) AS BIGINT) AS tie_term
         |FROM r""".stripMargin) { (s, d) =>
      val pu = Tables.events(s, d)
        .withColumn("variant",
          pmod(h60(concat(lit("exp1|"), col("user_id").cast("string"))), lit(2L)))
        .groupBy("user_id", "variant")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t_view"),
             sum(when(col("event_type") === "purchase", cents(col("value")))
               .otherwise(0L)).as("revenue_cents"))
        .filter(col("t_view").isNotNull)
      val g = pu
        .select(col("variant"), least(expr("revenue_cents div 100"), lit(1024L)).as("yb"))
        .groupBy("yb")
        .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
             sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"))
      // bounded-by-construction global window: ≤ 1026 distinct yb rows
      val w = Window.orderBy(col("yb"))
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("cum_before", coalesce(sum(col("n0") + col("n1")).over(w), lit(0L)))
        .agg(sum(col("n0")).as("n_control"),
             sum(col("n1")).as("n_treatment"),
             sum(col("n1") * (lit(2L) * col("cum_before") + col("n0") + col("n1") + lit(1L)))
               .as("rank_sum_treat_x2"),
             sum((col("n0") + col("n1")) * (col("n0") + col("n1")) * (col("n0") + col("n1"))
               - (col("n0") + col("n1"))).as("tie_term"))
        .select(col("n_control"), col("n_treatment"), col("rank_sum_treat_x2"),
          (col("rank_sum_treat_x2") - col("n_treatment") * (col("n_treatment") + lit(1L)))
            .as("u_treat_x2"),
          col("tie_term"))
    },

    // Small-files compaction planner. Rows collapse once into
    // (event_type, day) cells with an estimated byte size (fixed row
    // overhead + variable props/type payload — the estimator a writer
    // gets from task metrics for free); packing is next-fit in day
    // order per type: a cell starts in file floor(cum_before/target),
    // so files exceed the target by at most one cell and no cell
    // splits (day-aligned files keep partition pruning). Reported per
    // type: the naive one-file-per-cell layout's small-file count vs
    // the planned layout's file count/small-file count/max file size.
    // Every window is partitioned by event_type; everything after the
    // first aggregate is cell-dimension scale (types × days).
    "el_compaction_plan" -> Q(
      """WITH cells AS (
        |  SELECT event_type, epoch_ns(ts)//86400000000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n_rows,
        |         CAST(SUM(28 + length(props) + length(event_type)) AS BIGINT) AS cell_bytes
        |  FROM events GROUP BY 1, 2),
        |packed AS (
        |  SELECT event_type, day, n_rows, cell_bytes,
        |         COALESCE(SUM(cell_bytes) OVER (
        |           PARTITION BY event_type ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 65536
        |           AS file_id
        |  FROM cells),
        |files AS (
        |  SELECT event_type, file_id,
        |         CAST(COUNT(*) AS BIGINT) AS f_cells,
        |         CAST(SUM(cell_bytes) AS BIGINT) AS f_bytes
        |  FROM packed GROUP BY 1, 2)
        |SELECT event_type,
        |       CAST(SUM(f_cells) AS BIGINT) AS n_cells,
        |       CAST(SUM(f_bytes) AS BIGINT) AS total_bytes,
        |       CAST(COUNT(*) AS BIGINT) AS planned_files,
        |       CAST(SUM(CASE WHEN f_bytes < 32768 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS planned_small_files,
        |       CAST(MAX(f_bytes) AS BIGINT) AS max_file_bytes,
        |       (SELECT CAST(SUM(CASE WHEN c.cell_bytes < 32768 THEN 1 ELSE 0 END) AS BIGINT)
        |        FROM cells c WHERE c.event_type = files.event_type) AS naive_small_files
        |FROM files GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val cells = Tables.events(s, d)
        .select(col("event_type"), expr(s"unix_micros(ts) div $UsPerDay").as("day"),
                (lit(28) + length(col("props")) + length(col("event_type"))).as("row_bytes"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("n_rows"), sum(col("row_bytes")).cast("long").as("cell_bytes"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val packed = cells
        .withColumn("cum_before", coalesce(sum(col("cell_bytes")).over(w), lit(0L)))
        .withColumn("file_id", expr(s"cum_before div $TargetBytes"))
      val files = packed.groupBy("event_type", "file_id")
        .agg(count(lit(1)).as("f_cells"), sum(col("cell_bytes")).as("f_bytes"))
      val perType = files.groupBy("event_type")
        .agg(sum(col("f_cells")).as("n_cells"),
             sum(col("f_bytes")).as("total_bytes"),
             count(lit(1)).as("planned_files"),
             sum(when(col("f_bytes") < TargetBytes / 2, 1L).otherwise(0L))
               .as("planned_small_files"),
             max(col("f_bytes")).as("max_file_bytes"))
      val naive = cells.groupBy("event_type")
        .agg(sum(when(col("cell_bytes") < TargetBytes / 2, 1L).otherwise(0L))
          .as("naive_small_files"))
      perType.join(broadcast(naive), Seq("event_type"))
        .orderBy("event_type")
    })
}
