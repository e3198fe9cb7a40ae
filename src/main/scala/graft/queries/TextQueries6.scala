package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Sixth text batch: windowed lexical diversity + letter-repeat
  * concentration.
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
      // round-9 codegen form: the previous plan posexploded every token
      // into (doc, window, token) rows and shuffled the token stream
      // for the per-window countDistinct (14.7 s at sf10, the worst
      // remaining census). graft_sttr_stats computes each document's
      // (n_windows, sum_types) in ONE in-row pass (per-window hash set,
      // ≤ W entries); the only shuffle left is the |sources|-bounded
      // rollup. TextCensusSpec pins kernel ≡ the exploded form; the
      // oracle (and its hash) is unchanged.
      graft.functions.SttrStats.register(s)
      Tables.documents(s, d)
        .select(col("source"),
                expr(s"graft_sttr_stats(text, $W)").as("st"))
        .select(col("source"), col("st.n_windows").as("w_doc"),
                col("st.sum_types").as("t_doc"))
        .filter(col("w_doc") > 0)
        .groupBy("source")
        .agg(count(lit(1)).as("docs_windowed"),
             sum(col("w_doc")).as("n_windows"),
             sum(col("t_doc")).as("sum_types"))
        .select(col("source"), col("docs_windowed"), col("n_windows"),
                col("sum_types"),
                expr(s"sum_types * 10000 div (n_windows * $W)").as("sttr_bp"))
        .orderBy("source")
    },

    // Index of coincidence (Friedman 1922) per document over the first
    // 256 letters, rolled up per language: IC = Σ f(f−1) / (n(n−1)) in
    // integer basis points — the repeat-probability of two sampled
    // letters, a classic language/gibberish discriminator (English ≈
    // 667 bp over 26 letters; uniform noise ≈ 385 bp) that complements
    // ta_langid's n-gram vote with a distribution-shape signal. Scale
    // shape: letter frequencies come from a FLAT codegen projection —
    // 26 per-letter length(replace(…)) diffs over the capped 256-char
    // prefix folded by one array aggregate — so nothing per-char ever
    // explodes or shuffles (the first cut posexploded 256 rows/doc and
    // measured 7.1 s warm at sf0.1; this shape is 1.4 s — the
    // measured-anatomy lesson from SCALING.md round 5). The only
    // shuffle is the ≤1-row-per-doc language rollup. All-integer:
    // per-doc ic_bp is an exact integer ratio, the rollup reports its
    // integer mean plus min/max.
    "ta_ic_profile" -> Q(
      """WITH h AS (
        |  SELECT doc_id, lang, lower(substring(text, 1, 256)) AS head
        |  FROM documents),
        |ch AS (
        |  -- iterate the LOWERED head's own length: lower() can change
        |  -- codepoint count (e.g. U+0130), and the Spark side counts
        |  -- every letter of the lowered head
        |  SELECT h.doc_id, h.lang, substring(h.head, CAST(u.i AS INTEGER), 1) AS c
        |  FROM h, unnest(range(1, length(h.head) + 1)) u(i)),
        |f AS (
        |  SELECT doc_id, lang, c, CAST(COUNT(*) AS BIGINT) AS f
        |  FROM ch WHERE c BETWEEN 'a' AND 'z' GROUP BY 1, 2, 3),
        |ic AS (
        |  SELECT doc_id, lang, CAST(SUM(f) AS BIGINT) AS n,
        |         CAST(SUM(f * (f - 1)) AS BIGINT) AS rep
        |  FROM f GROUP BY 1, 2),
        |pd AS (
        |  SELECT doc_id, lang, (rep * 10000) // (n * (n - 1)) AS ic_bp
        |  FROM ic WHERE n >= 2)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(ic_bp) // COUNT(*) AS BIGINT) AS mean_ic_bp,
        |       CAST(MIN(ic_bp) AS BIGINT) AS min_ic_bp,
        |       CAST(MAX(ic_bp) AS BIGINT) AS max_ic_bp
        |FROM pd GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      // round-9 codegen form: the 26 per-letter replace() passes each
      // copied the 256-char head (~26 allocations/doc, 13.2 s at sf10);
      // graft_ic_stats folds the letter frequencies in one pass and
      // returns (n, rep) directly. Identical letter semantics (raw
      // 'a'..'z' chars of the lowered head); oracle unchanged.
      graft.functions.IcStats.register(s)
      val ic = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
                lower(substring(col("text"), 1, 256)).as("head"))
        .select(col("doc_id"), col("lang"),
                expr("graft_ic_stats(head)").as("st"))
        .select(col("doc_id"), col("lang"),
                col("st.n").as("n"), col("st.rep").as("rep"))
        .filter(col("n") >= 2)
        .select(col("doc_id"), col("lang"),
                expr("(rep * 10000) div (n * (n - 1))").as("ic_bp"))
      ic.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
             expr("sum(ic_bp) div count(*)").as("mean_ic_bp"),
             min(col("ic_bp")).as("min_ic_bp"),
             max(col("ic_bp")).as("max_ic_bp"))
        .orderBy("lang")
    }
  )
}
