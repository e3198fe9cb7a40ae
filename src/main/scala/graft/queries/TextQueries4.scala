package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Domain-similarity profiling over `documents` — the input to mixture
  * design (`ta_mixture_weights`): which sources are near-duplicates of
  * each other DISTRIBUTIONALLY, before any pairwise doc comparison.
  *
  * Total-variation distance between per-source unigram distributions,
  * parts-per-million integers (TV = Σ_token |ppm_a − ppm_b| over the
  * vocabulary union; the ½ factor is dropped — monotone, and keeping the
  * sum integral avoids a halving that truncates). TV is chosen over KL
  * exactly because it needs no logarithm: every value is a BIGINT, so
  * partial-aggregation order can never move a bit and the DuckDB twin is
  * hash-exact.
  *
  * Scale shape: one (source, token) map-side-combined aggregate over the
  * corpus (the only row-scale pass), collapsed to a |sources|×|vocab|
  * dense grid (zeros materialized via vocab × source-totals cross join —
  * both broadcast-size dims), then the pair space is |vocab| equi-join
  * rows × |sources|² /2 — bounded by the DIMS, not the corpus. At open
  * vocabulary the grid dimension is the hashed-bucket family instead
  * (ta_dsir_weights' 1024-bucket move), which caps the grid at
  * |sources|×2^k regardless of corpus size.
  */
object TextQueries4 {

  def defs: Map[String, Q] = Map(

    "ta_source_tv" -> Q(
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (
        |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tok GROUP BY source, token),
        |tot AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY source),
        |vocab AS (SELECT DISTINCT token FROM tok),
        |grid AS (
        |  SELECT t.source, v.token, (COALESCE(c.c, 0) * 1000000) // t.n AS ppm
        |  FROM tot t CROSS JOIN vocab v
        |  LEFT JOIN cnt c ON c.source = t.source AND c.token = v.token)
        |SELECT a.source AS source_a, b.source AS source_b,
        |       CAST(SUM(ABS(a.ppm - b.ppm)) AS BIGINT) AS tv_ppm
        |FROM grid a JOIN grid b ON a.token = b.token AND a.source < b.source
        |GROUP BY source_a, source_b
        |ORDER BY source_a, source_b""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("token"))
      val cnt = tok.groupBy("source", "token").agg(count(lit(1)).as("c"))
      // per-source token totals = Σ size(split): the array length equals
      // the exploded row count, so this branch never materializes the
      // token rows a second time (map-side sum to |sources| partials)
      val tot = Tables.documents(s, d)
        .groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("n"))
      val vocab = cnt.select("token").distinct()
      // zeros matter: a token present in a but absent in b contributes
      // ppm_a to the distance — the dense grid materializes them
      val grid = tot.crossJoin(broadcast(vocab))
        .join(cnt, Seq("source", "token"), "left")
        .select(col("source"), col("token"),
                expr("(coalesce(c, 0) * 1000000) div n").as("ppm"))
      val a = grid.select(col("source").as("source_a"), col("token"), col("ppm").as("pa"))
      val b = grid.select(col("source").as("source_b"), col("token").as("tb"), col("ppm").as("pb"))
      a.join(b, col("token") === col("tb") && col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(sum(abs(col("pa") - col("pb"))).as("tv_ppm"))
        .orderBy("source_a", "source_b")
    }
  )
}
