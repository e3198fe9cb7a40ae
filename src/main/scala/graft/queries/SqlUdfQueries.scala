package graft.queries

import graft.{Q, Tables}

/** Spark 4 SQL user-defined functions — the `CREATE FUNCTION` surface
  * (SPARK-46246): a scalar SQL UDF and a SQL TABLE function, both
  * declared in SQL and used from SQL, completing the UDF family next to
  * the typed Aggregator / TypedImperativeAggregate / codegen Expression
  * legs (SURVEY §2.B "UDF/UDAF/UDTF").
  *
  * Why this leg matters at 100 TB: SQL UDFs are NOT black-box functions —
  * the analyzer's ResolveSQLFunctions INLINES the body into the calling
  * plan, so `graft_cents(x)` optimizes, prunes, and codegens exactly like
  * writing the expression inline (SqlUdfSpec pins the plan: zero UDF
  * nodes, the TVF expanded to its explode). A Scala `udf()` at the same
  * spot is an opaque row-at-a-time lambda that blocks pushdown.
  *
  * The declared query is a quantity-threshold CCDF: the TABLE function
  * generates the threshold ladder, the scalar function renders exact
  * cents, and the fact table collapses to a ≤50-row quantity histogram
  * before the 50×50 broadcast non-equi join — ladder work is
  * dimension-scale, one fact pass.
  */
object SqlUdfQueries {

  private def viewTag(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Register the two SQL functions (idempotent — OR REPLACE, fixed
    * bodies). Shared with the spec. */
  private[graft] def registerSqlFns(s: org.apache.spark.sql.SparkSession): Unit = {
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_cents(x DOUBLE)
             RETURNS BIGINT RETURN CAST(round(x * 100) AS BIGINT)""")
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_ladder(lo INT, hi INT)
             RETURNS TABLE(t INT) RETURN SELECT explode(sequence(lo, hi)) AS t""")
  }

  def defs: Map[String, Q] = Map(

    "q73_sql_macro" -> Q(
      """WITH h AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT unnest(range(1, 51)) AS t)
        |SELECT CAST(t.t AS INTEGER) AS qty_ge,
        |       CAST(SUM(h.n) AS BIGINT) AS n_items,
        |       CAST(SUM(h.c) AS BIGINT) AS revenue_cents
        |FROM t JOIN h ON h.q >= t.t
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      registerSqlFns(s)
      val v = s"g_li_${viewTag(d)}"
      Tables.lineitem(s, d).createOrReplaceTempView(v)
      s.sql(s"""
        WITH h AS (
          SELECT CAST(l_quantity AS BIGINT) AS q,
                 COUNT(*) AS n,
                 SUM(graft_cents(l_extendedprice)) AS c
          FROM $v GROUP BY 1)
        SELECT t.t AS qty_ge,
               SUM(h.n) AS n_items,
               SUM(h.c) AS revenue_cents
        FROM graft_ladder(1, 50) t JOIN h ON h.q >= t.t
        GROUP BY t.t ORDER BY qty_ge""")
    },

    // GROUP BY ALL / ORDER BY ALL (Spark 3.4/4.0 adopted DuckDB's
    // shorthand — both engines resolve the clause, so the twins share
    // the IDIOM, not just the result): the analyzer expands ALL to the
    // non-aggregate select list, proving the resolution matches the
    // explicit form the rest of the surface uses.
    "q75_group_by_all" -> Q(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |GROUP BY ALL ORDER BY ALL""".stripMargin) { (s, d) =>
      val v = s"g_li_${viewTag(d)}"
      Tables.lineitem(s, d).createOrReplaceTempView(v)
      s.sql(s"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS qty
        FROM $v
        GROUP BY ALL ORDER BY ALL""")
    }
  )
}
