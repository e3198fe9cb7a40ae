package graft.queries

import graft.{Q, Tables}
import graft.functions.Vectors.nativeNorm
import graft.functions.FloatDot
import org.apache.spark.sql.functions._

/** Second audit batch — corpus-composition and index-health reports:
  *
  *  - `ta_simpson_diversity`: per-source vocabulary concentration
  *    (Simpson 1949) — the diversity screen that needs no logarithms,
  *    so it stays exact-integer end to end.
  *  - `dd_dup_rate_by_source`: per-source exact-duplicate rate — which
  *    ingest feeds are polluting the corpus.
  *  - `ss_ivf_balance`: IVF cell-occupancy balance off the SAME trained
  *    quantizer as `ss_ivf_assign` — a skewed cell turns nprobe into a
  *    table scan, so this is the index-health read a vector store runs
  *    after every training.
  *
  * Reference note: the cascade broker's consumers see only raw bytes
  * (/root/reference/src/broker/main.rs:53); these are the composition
  * audits a corpus owner layers on, as one-pass Spark aggregates.
  *
  * Integer discipline: Simpson is Σn(n−1) / N(N−1) — numerator and
  * denominator are exact BIGINTs (ppm ratio by truncating division,
  * identical in both engines); dup rates and cell shares are basis
  * points on exact counts. Overflow: N(N−1) passes BIGINT up to
  * N ≈ 3·10⁹ tokens per source (≈ sf3000 per shard) — beyond that the
  * ratio would roll up from per-shard partials in DECIMAL(38,0).
  */
object AuditQueries2 {

  def defs: Map[String, Q] = Map(

    // Per-source Simpson concentration of the token distribution: the
    // probability two tokens drawn without replacement from a source
    // are the same type. Scale shape: explode → (source, token) counts
    // (map-side combined, vocabulary-scale result), then the per-source
    // Σn(n−1) and N collapse to a |sources|-row frame. High ppm = the
    // source repeats a narrow vocabulary (boilerplate smell — the
    // log-free twin of ta_repetition's screens).
    "ta_simpson_diversity" -> Q(
      """WITH tk AS (
        |  SELECT source, unnest(string_split(text,' ')) AS token FROM documents),
        |tc AS (
        |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM tk GROUP BY 1, 2)
        |SELECT source,
        |       CAST(SUM(n) AS BIGINT) AS n_tokens,
        |       CAST(COUNT(*) AS BIGINT) AS n_types,
        |       CAST(SUM(n * (n - 1)) AS BIGINT) AS num,
        |       CAST(SUM(n) * (SUM(n) - 1) AS BIGINT) AS den,
        |       CAST((SUM(n * (n - 1)) * 1000000) // (SUM(n) * (SUM(n) - 1)) AS BIGINT)
        |         AS simpson_ppm
        |FROM tc GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("token"))
        .groupBy("source", "token").agg(count(lit(1)).as("n"))
        .groupBy("source")
        .agg(sum(col("n")).as("n_tokens"),
             count(lit(1)).as("n_types"),
             sum(col("n") * (col("n") - 1)).as("num"))
        .select(col("source"), col("n_tokens"), col("n_types"), col("num"),
                (col("n_tokens") * (col("n_tokens") - 1)).as("den"),
                expr("(num * 1000000) div (n_tokens * (n_tokens - 1))")
                  .as("simpson_ppm"))
        .orderBy("source")
    },

    // Per-source exact-duplicate rate: docs vs distinct text
    // fingerprints (md5 — the dd_exact discipline; the 32-hex string is
    // the shuffle key, never the document). dup_rate_bp gates an ingest
    // feed before the expensive near-dup passes run on it.
    "dd_dup_rate_by_source" -> Q(
      """SELECT source,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
        |       CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dups,
        |       CAST(((COUNT(*) - COUNT(DISTINCT md5(text))) * 10000) // COUNT(*)
        |            AS BIGINT) AS dup_rate_bp
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(md5(col("text"))).as("n_unique"))
        .select(col("source"), col("n_docs"), col("n_unique"),
                (col("n_docs") - col("n_unique")).as("n_dups"),
                expr("((n_docs - n_unique) * 10000) div n_docs")
                  .as("dup_rate_bp"))
        .orderBy("source")
    },

    // IVF cell-occupancy balance, off the same trained refined-centroid
    // assignment as ss_ivf_assign (ArtifactStore-cached — no retrain).
    // dev_bp = occupancy deviation from uniform in basis points; a cell
    // at +9000 bp means nprobe=1 probes a tenth of the corpus and the
    // quantizer needs re-k. Cell count is read from the assignment
    // itself (empty cells exist only as absent rows — both engines
    // derive the same set).
    "ss_ivf_balance" -> Q(
      s"""WITH ${SimilarityQueries2.duckRefinedCte(SimilarityQueries2.NSEEDS)},
        |asg AS (SELECT vec_id, cluster FROM refined WHERE rn = 1),
        |k AS (SELECT CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n_cells FROM asg),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM asg)
        |SELECT CAST(asg.cluster AS INTEGER) AS cluster,
        |       CAST(COUNT(*) AS BIGINT) AS n, k.n_cells, t.total,
        |       CAST((COUNT(*) * 10000) // t.total AS BIGINT) AS share_bp,
        |       CAST((COUNT(*) * k.n_cells * 10000) // t.total - 10000 AS BIGINT)
        |         AS dev_bp
        |FROM asg CROSS JOIN k CROSS JOIN t
        |GROUP BY asg.cluster, k.n_cells, t.total
        |ORDER BY cluster""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", nativeNorm(col("embedding")))
      val asg = SimilarityQueries2.refined(e, d).filter(col("rn") === 1)
        .select(col("vec_id"), col("ccluster").cast("int").as("cluster"))
      val k = asg.agg(countDistinct(col("cluster")).as("n_cells"))
      val t = asg.agg(count(lit(1)).as("total"))
      asg.groupBy("cluster").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(k)).crossJoin(broadcast(t))
        .select(col("cluster"), col("n"), col("n_cells"), col("total"),
                expr("(n * 10000) div total").as("share_bp"),
                expr("(n * n_cells * 10000) div total - 10000").as("dev_bp"))
        .orderBy("cluster")
    },

    // Exact Gini coefficient of the document-length distribution —
    // the inequality audit behind sequence-packing efficiency
    // (ta_pack_sequences wastes padding exactly where lengths are
    // unequal). The mean-absolute-difference form G = Σᵢⱼ|xᵢ−xⱼ| /
    // (2n²μ) is computed on the GROUPED length grid: |distinct
    // lengths|² pairs via a broadcast nested-loop self-join of the
    // tiny value grid (≈10² rows — never the n² document pairs, never
    // a global sort/rank over the corpus). All-integer: num and den
    // exact BIGINTs, ratio in truncated ppm. Overflow: num ≤ n²·maxlen
    // — exact through ~10⁷ docs at BIGINT; past that the grid partials
    // would roll up in DECIMAL(38,0).
    "ta_length_gini" -> Q(
      """WITH lens AS (
        |  SELECT len(string_split(text,' ')) AS lv FROM documents),
        |g AS (SELECT lv, CAST(COUNT(*) AS BIGINT) AS c FROM lens GROUP BY lv),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_docs,
        |             CAST(SUM(lv * c) AS BIGINT) AS sum_len FROM g),
        |p AS (SELECT CAST(SUM(a.c * b.c * ABS(a.lv - b.lv)) AS BIGINT) AS gini_num
        |      FROM g a CROSS JOIN g b)
        |SELECT t.n_docs, t.sum_len, p.gini_num,
        |       CAST(2 * t.n_docs * t.sum_len AS BIGINT) AS gini_den,
        |       CAST((p.gini_num * 1000000) // (2 * t.n_docs * t.sum_len) AS BIGINT)
        |         AS gini_ppm
        |FROM t CROSS JOIN p""".stripMargin) { (s, d) =>
      val g = Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("long").as("lv"))
        .groupBy("lv").agg(count(lit(1)).as("c"))
      val t = g.agg(sum(col("c")).as("n_docs"),
                    sum(col("lv") * col("c")).as("sum_len"))
      val p = g.crossJoin(broadcast(g.select(col("lv").as("lv2"),
                                             col("c").as("c2"))))
        .agg(sum(col("c") * col("c2") * abs(col("lv") - col("lv2")))
               .as("gini_num"))
      broadcast(t).crossJoin(broadcast(p))
        .select(col("n_docs"), col("sum_len"), col("gini_num"),
                (lit(2L) * col("n_docs") * col("sum_len")).as("gini_den"),
                expr("(gini_num * 1000000) div (2 * n_docs * sum_len)")
                  .as("gini_ppm"))
    }
  )
}
