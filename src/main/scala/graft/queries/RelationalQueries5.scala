package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Batch 5: exact correlation, histograms, unpivot, array search — the
  * long tail of §2.B scalar/agg families, all with the established
  * integer-exact portability discipline.
  */
object RelationalQueries5 {

  def defs: Map[String, Q] = Map(

    // Pearson correlation computed EXACTLY from integer-cents moment sums
    // (built-in corr/covar accumulate doubles in engine-specific order);
    // the closed-form double expression is identical on both engines.
    // Moment magnitudes matter: cents-squared of PRICE columns would
    // overflow a long at sf0.1 (Spark wraps silently, DuckDB widens to
    // HUGEINT — a silent cross-engine divergence); quantity × discount
    // moments stay ≤ ~1e8 at any SF.
    "q38_corr_manual" -> Q(
      """WITH m AS (
        |  SELECT COUNT(*) AS n,
        |         SUM(CAST(round(l_quantity*100) AS BIGINT)) AS sx,
        |         SUM(CAST(round(l_discount*100) AS BIGINT)) AS sy,
        |         SUM(CAST(round(l_quantity*100) AS BIGINT)
        |             * CAST(round(l_quantity*100) AS BIGINT)) AS sxx,
        |         SUM(CAST(round(l_discount*100) AS BIGINT)
        |             * CAST(round(l_discount*100) AS BIGINT)) AS syy,
        |         SUM(CAST(round(l_quantity*100) AS BIGINT)
        |             * CAST(round(l_discount*100) AS BIGINT)) AS sxy
        |  FROM lineitem)
        |SELECT n,
        |       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |         / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |            * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS corr_qty_disc
        |FROM m""".stripMargin) { (s, d) =>
      import graft.functions.Portable.cents
      val x = cents(col("l_quantity"))
      val y = cents(col("l_discount"))
      val m = Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      m.select(col("n"),
        ((col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy"))
          / (sqrt(col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx"))
             * sqrt(col("n").cast("double") * col("syy") - col("sy").cast("double") * col("sy"))))
          .as("corr_qty_disc"))
    },

    // Histogram via manual equal-width buckets (no width_bucket in the
    // oracle dialect; floor division is exactly portable). events.value
    // spans [0, 200): 10 buckets of width 20.
    "q39_histogram" -> Q(
      """SELECT CAST(floor(value / 20) AS INTEGER) AS bucket,
        |       COUNT(*) AS n_events,
        |       MIN(value) AS lo, MAX(value) AS hi
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(floor(col("value") / 20).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n_events"),
             min(col("value")).as("lo"), max(col("value")).as("hi"))
        .orderBy("bucket")
    },

    // Unpivot: wide per-flag aggregates to long (metric, value) rows.
    // Spark's unpivot API; the oracle uses UNPIVOT over the same pivot.
    "q40_unpivot" -> Q(
      """WITH wide AS (
        |  SELECT l_returnflag,
        |         CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)
        |           / CAST(100 AS DOUBLE) AS sum_qty,
        |         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
        |           / CAST(100 AS DOUBLE) AS sum_price
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, v
        |FROM wide UNPIVOT (v FOR metric IN (sum_qty, sum_price))
        |ORDER BY l_returnflag, metric""".stripMargin) { (s, d) =>
      import graft.functions.Portable.dsum
      val wide = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
             dsum(col("l_extendedprice")).as("sum_price"))
      wide.unpivot(
          ids = Array(col("l_returnflag")),
          values = Array(col("sum_qty"), col("sum_price")),
          variableColumnName = "metric",
          valueColumnName = "v")
        .orderBy("l_returnflag", "metric")
    },

    // Array search primitives over document tokens: membership, position,
    // overlap with a marker set.
    "q41_array_search" -> Q(
      """SELECT doc_id,
        |       list_contains(string_split(text,' '), 'spark') AS has_spark,
        |       CAST(list_position(string_split(text,' '), 'the') AS INTEGER) AS first_the,
        |       list_has_any(string_split(text,' '), ['join','merge','sort']) AS mentions_ops
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = split(col("text"), " ")
      Tables.documents(s, d).select(
        col("doc_id"),
        array_contains(toks, "spark").as("has_spark"),
        // both engines yield 0 for no-match (verified empirically)
        array_position(toks, "the").cast("int").as("first_the"),
        arrays_overlap(toks, array(lit("join"), lit("merge"), lit("sort"))).as("mentions_ops"))
        .orderBy("doc_id")
    }
  )
}
