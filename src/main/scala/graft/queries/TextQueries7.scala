package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Text analysis, part 7: pairwise translation-metric overlap on the
  * dedup candidate set, and the corpus bigram branching census.
  */
object TextQueries7 {

  val defs: Map[String, Q] = Map(

    // BLEU-2 overlap between near-dup CANDIDATE pairs — the
    // translation-metric read on the same pairs the Jaccard/containment
    // verifiers score: set-clipped unigram+bigram precision with the
    // length-ratio brevity penalty, geometric-meaned (sqrt, not
    // exp/log — ln() is not bit-portable across engines, sqrt is IEEE).
    // Asymmetric by construction (BLEU scores a CANDIDATE against a
    // REFERENCE), so both directions are emitted per pair, like
    // dd_containment. Pair count is the SAME capped LSH band-candidate
    // set every verifier uses (bandCandidatesCached — trained once per
    // corpus), so the pass is candidate-bounded at any scale; token/
    // bigram sets are built only for pair-touched docs (semi-join
    // first, the verify-set-only rule).
    "ta_bleu_pairs" -> Q(
      s"""WITH ${DedupQueries.duckCandCte},
         |t AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tlen,
         |         list_distinct(string_split(text, ' ')) AS uni,
         |         CASE WHEN len(string_split(text, ' ')) >= 2
         |              THEN list_distinct(
         |                [array_to_string((string_split(text, ' '))[i:i+1], ' ')
         |                 for i in range(1, len(string_split(text, ' ')))])
         |              ELSE CAST([] AS VARCHAR[]) END AS bi
         |  FROM documents),
         |pq AS (
         |  SELECT c.da, c.db, ta.tlen AS la, tb.tlen AS lb,
         |         CAST(len(list_intersect(ta.uni, tb.uni)) AS DOUBLE)
         |           / len(ta.uni) AS p1_ab,
         |         CASE WHEN len(ta.bi) = 0 THEN 0.0
         |              ELSE CAST(len(list_intersect(ta.bi, tb.bi)) AS DOUBLE)
         |                / len(ta.bi) END AS p2_ab,
         |         CAST(len(list_intersect(ta.uni, tb.uni)) AS DOUBLE)
         |           / len(tb.uni) AS p1_ba,
         |         CASE WHEN len(tb.bi) = 0 THEN 0.0
         |              ELSE CAST(len(list_intersect(ta.bi, tb.bi)) AS DOUBLE)
         |                / len(tb.bi) END AS p2_ba
         |  FROM cand c
         |  JOIN t ta ON c.da = ta.doc_id
         |  JOIN t tb ON c.db = tb.doc_id)
         |SELECT da, db,
         |       least(1.0, CAST(la AS DOUBLE) / lb) * sqrt(p1_ab * p2_ab) AS bleu_ab,
         |       least(1.0, CAST(lb AS DOUBLE) / la) * sqrt(p1_ba * p2_ba) AS bleu_ba,
         |       p1_ab, p2_ab
         |FROM pq ORDER BY da, db""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = DedupQueries.bandCandidatesCached(docs, d)
      val ids = cand.select(col("da").as("doc_id"))
        .union(cand.select(col("db").as("doc_id"))).distinct()
      val t = docs.join(ids, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
                size(col("toks")).cast("long").as("tlen"),
                array_distinct(col("toks")).as("uni"),
                when(size(col("toks")) >= 2,
                  array_distinct(expr(
                    "transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', slice(toks, i, 2)))")))
                  .otherwise(array().cast("array<string>")).as("bi"))
      val pq = cand
        .join(t.select(col("doc_id").as("ta_id"), col("tlen").as("la"),
                       col("uni").as("a_uni"), col("bi").as("a_bi")),
              col("da") === col("ta_id"))
        .join(t.select(col("doc_id").as("tb_id"), col("tlen").as("lb"),
                       col("uni").as("b_uni"), col("bi").as("b_bi")),
              col("db") === col("tb_id"))
        .select(col("da"), col("db"), col("la"), col("lb"),
          (size(array_intersect(col("a_uni"), col("b_uni"))).cast("double")
            / size(col("a_uni"))).as("p1_ab"),
          when(size(col("a_bi")) === 0, lit(0.0))
            .otherwise(size(array_intersect(col("a_bi"), col("b_bi"))).cast("double")
              / size(col("a_bi"))).as("p2_ab"),
          (size(array_intersect(col("a_uni"), col("b_uni"))).cast("double")
            / size(col("b_uni"))).as("p1_ba"),
          when(size(col("b_bi")) === 0, lit(0.0))
            .otherwise(size(array_intersect(col("a_bi"), col("b_bi"))).cast("double")
              / size(col("b_bi"))).as("p2_ba"))
      pq.select(col("da"), col("db"),
          (least(lit(1.0), col("la").cast("double") / col("lb"))
            * sqrt(col("p1_ab") * col("p2_ab"))).as("bleu_ab"),
          (least(lit(1.0), col("lb").cast("double") / col("la"))
            * sqrt(col("p1_ba") * col("p2_ba"))).as("bleu_ba"),
          col("p1_ab"), col("p2_ab"))
        .orderBy("da", "db")
    },

    // Bigram BRANCHING census per language — the corpus-graph statistic
    // under every bigram LM: how many distinct successors does a word
    // have (KN's continuation counts aggregate this same quantity into
    // probabilities; here it is the raw census a tokenizer/LM team reads
    // before choosing model size). avg branch in basis points keeps the
    // row integer-exact (no ln(), no float aggregation). One adjacent-
    // pair explode → two map-side-combined aggregates; output rows =
    // languages.
    "ta_succ_diversity" -> Q(
      """WITH bg AS (
        |  SELECT d.lang,
        |         (string_split(d.text, ' '))[u.i] AS w1,
        |         (string_split(d.text, ' '))[u.i + 1] AS w2
        |  FROM documents d, unnest(range(1, len(string_split(d.text, ' ')))) u(i)
        |  WHERE len(string_split(d.text, ' ')) >= 2),
        |per AS (
        |  SELECT lang, w1, CAST(COUNT(*) AS BIGINT) AS c,
        |         CAST(COUNT(DISTINCT w2) AS BIGINT) AS branch
        |  FROM bg GROUP BY lang, w1)
        |SELECT lang,
        |       CAST(SUM(c) AS BIGINT) AS bigram_tokens,
        |       CAST(COUNT(*) AS BIGINT) AS distinct_unigrams,
        |       CAST(SUM(branch) AS BIGINT) AS distinct_bigrams,
        |       CAST(MAX(branch) AS BIGINT) AS max_branch,
        |       CAST(SUM(branch) * 10000 // COUNT(*) AS BIGINT) AS avg_branch_bp
        |FROM per GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      // adjacent pairs via the one-pass bigram-shingle kernel (round 10,
      // functions/Shingles.scala, mode 2: <2-token docs yield no pairs,
      // matching the size filter). A 2-token shingle contains exactly
      // one space — tokens are space-free by construction — so one
      // split recovers (w1, w2) in codegen, replacing the interpreted
      // per-pair slice lambda.
      graft.functions.Shingles.register(s)
      val bg = Tables.documents(s, d)
        .select(col("lang"),
                explode(call_function("graft_shingles",
                  col("text"), lit(2), lit(2))).as("sh"))
        .select(col("lang"), split(col("sh"), " ").as("pr"))
        .select(col("lang"),
                element_at(col("pr"), 1).as("w1"), element_at(col("pr"), 2).as("w2"))
      bg.groupBy("lang", "w1")
        .agg(count(lit(1)).as("c"), count_distinct(col("w2")).as("branch"))
        .groupBy("lang")
        .agg(sum(col("c")).as("bigram_tokens"),
             count(lit(1)).as("distinct_unigrams"),
             sum(col("branch")).as("distinct_bigrams"),
             max(col("branch")).as("max_branch"),
             expr("cast(sum(branch) * 10000 div count(1) as bigint)").as("avg_branch_bp"))
        .orderBy("lang")
    }
  )
}
