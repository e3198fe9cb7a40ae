package graft.queries

import graft.{Q, Tables}

/** Twelfth relational batch: Spark 4's SQL PIPE syntax (SPARK-49555,
  * the `|>` operator chain from the SQL:2023 pipe-syntax line of work)
  * — the linear query form BI layers increasingly emit. The query is
  * WRITTEN in pipe syntax and must plan/execute identically to the
  * nested form; the DuckDB oracle states the same semantics in classic
  * SQL, so the hash gate proves the pipe chain really is just syntax.
  */
object RelationalQueries12 {

  def defs: Map[String, Q] = Map(

    // Priority-level revenue profile, as a pipe chain: scan → filter →
    // project (EXTEND) → aggregate → derived ratio (EXTEND again) →
    // order. One map-side-combined aggregate over orders; everything
    // in exact integer cents.
    "q79_pipe_syntax" -> Q(
      """WITH f AS (
        |  SELECT o_orderpriority,
        |         CAST(round(o_totalprice*100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderstatus <> 'P'),
        |a AS (
        |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(cents) AS BIGINT) AS total_cents
        |  FROM f GROUP BY 1)
        |SELECT o_orderpriority, n, total_cents,
        |       CAST(total_cents // n AS BIGINT) AS avg_cents
        |FROM a ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("g_orders")
      s.sql("""
        FROM g_orders
        |> WHERE o_orderstatus <> 'P'
        |> EXTEND CAST(round(o_totalprice*100) AS BIGINT) AS cents
        |> AGGREGATE COUNT(*) AS n, SUM(cents) AS total_cents
           GROUP BY o_orderpriority
        |> EXTEND total_cents div n AS avg_cents
        |> SELECT o_orderpriority, n, total_cents, avg_cents
        |> ORDER BY o_orderpriority
      """)
    }
  )
}
