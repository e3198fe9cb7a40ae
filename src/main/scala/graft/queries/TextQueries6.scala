package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Sixth text batch: windowed lexical diversity.
  *
  * `ta_sttr` — standardized type-token ratio (Johnson 1944; the MATTR/
  * STTR family corpus linguistics uses instead of raw TTR, whose value
  * collapses with document length): the token stream is cut into
  * NON-OVERLAPPING windows of [[TextQueries6.W]] tokens, each full
  * window's distinct-type count is measured, and the per-source mean is
  * reported in integer basis points. Raw TTR is already declared
  * (ta_token_stats); the windowed form is the length-robust one, and a
  * drop in sttr_bp against a source's baseline is the repetition signal
  * quality filters alarm on (complementary to ta_repetition's n-gram
  * view).
  *
  * Scale shape: one posexplode to (doc, window, token) rows, then two
  * map-side-combined aggregates — (doc, window) distinct-type counts
  * (window dim ≤ tokens/W per doc), then the source rollup. Partial
  * windows are dropped in the WHERE (both engines), so every window
  * contributes exactly W tokens and the basis-point ratio is exact
  * integer arithmetic.
  */
object TextQueries6 {

  private[queries] val W = 25

  def defs: Map[String, Q] = Map(

    "ta_sttr" -> Q(
      s"""WITH t AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
         |p AS (
         |  SELECT doc_id, source, toks[CAST(u.i AS INTEGER)] AS tok,
         |         (u.i - 1) // $W AS win, len(toks) AS n_tok
         |  FROM t, unnest(range(1, len(toks) + 1)) u(i)),
         |w AS (
         |  SELECT doc_id, source, win, CAST(COUNT(DISTINCT tok) AS BIGINT) AS types
         |  FROM p WHERE (win + 1) * $W <= n_tok
         |  GROUP BY 1, 2, 3)
         |SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docs_windowed,
         |       CAST(COUNT(*) AS BIGINT) AS n_windows,
         |       CAST(SUM(types) AS BIGINT) AS sum_types,
         |       CAST(SUM(types) * 10000 // (COUNT(*) * $W) AS BIGINT) AS sttr_bp
         |FROM w GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val p = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")),
                size(split(col("text"), " ")).as("n_tok"))
        .select(col("doc_id"), col("source"), col("tok"),
                expr(s"pos div $W").as("win"), col("n_tok"))
        .filter((col("win") + 1) * W <= col("n_tok"))
      p.groupBy("doc_id", "source", "win")
        .agg(countDistinct(col("tok")).as("types"))
        .groupBy("source")
        .agg(countDistinct(col("doc_id")).as("docs_windowed"),
             count(lit(1)).as("n_windows"),
             sum(col("types")).as("sum_types"),
             expr(s"sum(types) * 10000 div (count(*) * $W)").as("sttr_bp"))
        .orderBy("source")
    }
  )
}
