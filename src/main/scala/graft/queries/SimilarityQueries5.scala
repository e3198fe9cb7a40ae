package graft.queries

import graft.{Q, Tables}
import graft.functions.Vectors._
import graft.functions.FloatDot
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus diversity profile over `embeddings` — the MEAN PAIRWISE cosine
  * within each label, computed with ZERO pair joins via the sum-vector
  * identity: for unit vectors u_i,
  *
  *     Σ_{i≠j} cos(u_i, u_j) = ‖Σ u_i‖² − Σ‖u_i‖²
  *
  * so mean pairwise similarity = (‖S‖² − Σ‖u‖²) / (n(n−1)) from one
  * corpus pass. This is the diversity/redundancy score data-selection
  * methods (SemDeDup, cluster pruning) rank clusters by: a label whose
  * mean pairwise cosine approaches 1 is redundant (prunable); near 0 it
  * is diverse. The naive form is n² cosine pairs — at 100 TB that is
  * the difference between one scan and an impossible join.
  *
  * Portability: cross-row float sums are order-dependent, and the
  * DECIMAL(24,12) route (Portable.dsumUnit) rounds the double→decimal
  * cast differently per engine (shortest-repr vs exact-binary — the
  * divergence Portable.cents documents), which showed up here as ~1e-13
  * drift over 64-dim component sums. So cross-row sums use an exact
  * integer grid instead: floor(x·1e9) per term (one IEEE multiply +
  * floor, both portable), BIGINT sum (order-independent), one division
  * back to double. The ≤1e-9-per-term quantization is documented
  * semantics, not noise — both twins state the identical grid. Grid
  * headroom: per-dim sums reach 1e9·n_label, exact in a double to
  * n_label ≈ 9e6; beyond that the grid coarsens, same widening note as
  * Portable.cents.
  *
  * Scale shape: unit-normalize per row (IEEE per-row ops), one
  * (label, dim) aggregate — state is |labels|·dim, dimension-bounded,
  * never corpus-bounded — then ‖S‖² folds sequentially over the ≤dim
  * collected component sums per label (same sequential-fold invariant
  * as Vectors.dot). The per-row ‖u‖² (≈1 up to float rounding)
  * aggregates through the same integer grid at 1e-12 grain.
  */
object SimilarityQueries5 {

  /** nprobe settings the recall curve sweeps — the tuning knob every IVF
    * deployment chooses by exactly this measurement. */
  private val Sweep = Seq(1, 2, 4)

  def defs: Map[String, Q] = Map(

    // The IVF TUNING CURVE: recall@3 AND candidate cost per nprobe in
    // one result — the measurement that picks nprobe in production
    // (ss_ann_recall pins one config; dd_band_tune is the same move for
    // MinHash banding). Scale shape: the candidate frame is built ONCE
    // at the widest nprobe with the probe rank attached, checkpointed
    // (10 queries × 4 cells × cell membership — probe-bounded, tiny),
    // and every sweep point is a filter + rank over it; ground truth is
    // one corpus pass against the 10-query broadcast, computed once.
    // All output columns are integers (hits, basis-point recall, exact
    // candidate counts), so the curve is oracle-exact.
    "ss_recall_curve" -> Q({
      import graft.queries.SimilarityQueries2.{NSEEDS, duckRefinedCte}
      val sweepSql = Sweep.map { np =>
        s"""pt$np AS (
           |  SELECT $np AS nprobe,
           |         (SELECT COUNT(*) FROM cand WHERE prn <= $np) AS n_cands,
           |         COALESCE((
           |           SELECT COUNT(*) FROM (
           |             SELECT qid, vec_id,
           |                    ROW_NUMBER() OVER (PARTITION BY qid
           |                      ORDER BY cosine DESC, vec_id) AS rank
           |             FROM cand WHERE prn <= $np) a
           |           JOIN truth t ON a.qid = t.qid AND a.vec_id = t.vec_id
           |           WHERE a.rank <= 3), 0) AS n_hits)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${duckRefinedCte(NSEEDS)},
         |members AS (
         |  SELECT vec_id, embedding, cluster FROM refined WHERE rn = 1),
         |probes AS (
         |  SELECT vec_id AS qid, embedding AS qv, cluster AS qcluster, rn AS prn
         |  FROM refined
         |  WHERE rn <= ${Sweep.max} AND vec_id >= $NSEEDS AND vec_id < ${NSEEDS + 10}),
         |cand AS (
         |  SELECT p.qid, m.vec_id, p.prn,
         |         ${duckCosine("p.qv", "m.embedding")} AS cosine
         |  FROM probes p JOIN members m
         |    ON p.qcluster = m.cluster AND p.qid <> m.vec_id),
         |q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id >= $NSEEDS AND vec_id < ${NSEEDS + 10}),
         |tranked AS (
         |  SELECT q.qid, e.vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY q.qid
         |           ORDER BY ${duckCosine("e.embedding", "q.qv")} DESC, e.vec_id) AS rank
         |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
         |truth AS (SELECT qid, vec_id FROM tranked WHERE rank <= 3),
         |$sweepSql
         |SELECT CAST(nprobe AS INTEGER) AS nprobe,
         |       CAST(n_cands AS BIGINT) AS n_cands,
         |       CAST(n_hits AS BIGINT) AS n_hits,
         |       CAST((10000 * n_hits) // 30 AS BIGINT) AS recall_bp
         |FROM (${Sweep.map(np => s"SELECT * FROM pt$np").mkString(" UNION ALL ")})
         |ORDER BY nprobe""".stripMargin
    }) { (s, d) =>
      import graft.queries.SimilarityQueries2.{NSEEDS, refined}
      FloatDot.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", nativeNorm(col("embedding")))
      val r = refined(e, d, NSEEDS)
      val members = r.filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("nrm"),
                col("ccluster").as("cluster"))
      val probes = r.filter(col("rn") <= Sweep.max &&
                            col("vec_id") >= NSEEDS && col("vec_id") < NSEEDS + 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
                col("nrm").as("qnrm"), col("ccluster").as("qcluster"),
                col("rn").as("prn"))
      val cand = probes
        .join(members, col("qcluster") === col("cluster") &&
                       col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"), col("prn"),
                (nativeDot(col("qv"), col("embedding"))
                   / (col("qnrm") * col("nrm"))).as("cosine"))
        .localCheckpoint(true) // probe-bounded; every sweep point reads it
      val q = e.filter(col("vec_id") >= NSEEDS && col("vec_id") < NSEEDS + 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
                col("nrm").as("qnrm"))
      val wT = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
      val truth = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
                (nativeDot(col("embedding"), col("qv"))
                   / (col("nrm") * col("qnrm"))).as("cosine"))
        .withColumn("rank", row_number().over(wT))
        .filter(col("rank") <= 3)
        .select(col("qid"), col("vec_id"))
        .localCheckpoint(true) // 30 rows, read once per sweep point
      val wA = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
      val points = Sweep.map { np =>
        val sub = cand.filter(col("prn") <= np)
        val nc = sub.agg(count(lit(1)).as("n_cands"))
        val hits = sub.withColumn("rank", row_number().over(wA))
          .filter(col("rank") <= 3)
          .join(truth, Seq("qid", "vec_id"))
          .agg(count(lit(1)).as("n_hits"))
        nc.crossJoin(broadcast(hits))
          .select(lit(np).as("nprobe"), col("n_cands"), col("n_hits"),
                  expr("cast((10000 * n_hits) div 30 as bigint)").as("recall_bp"))
      }
      points.reduce(_ union _).orderBy("nprobe")
    },

    // Embedding outlier drop-list: for each label, the 3 members least
    // aligned with the label's reference vector — the per-VECTOR verdict
    // behind CLIP-score-style curation (rank by similarity to the class
    // anchor; the bottom tail is mislabeled/noise and gets dropped or
    // re-queued for review). Complements ss_label_profile (per-label
    // aggregate) and ss_coreset_sample (per-CELL medoid/outlier off the
    // trained quantizer): this is the label-conditioned drop list, with
    // the margin to the label mean as the evidence column. Reference =
    // smallest-vec_id member (the portable anchor ss_label_profile
    // established — a float centroid mean is accumulation-order-unstable
    // across engines; the per-label mean it reports goes through the
    // exact DECIMAL route instead). Scale shape: one pass for the k
    // codegen'd dots against a broadcast label-sized anchor dim, the
    // rank window partitions per LABEL (bounded), and output is 3 rows
    // per label.
    "ss_outlier_docs" -> Q(
      s"""WITH ref AS (
         |  SELECT label, MIN(vec_id) AS ref_id FROM embeddings GROUP BY label),
         |rv AS (
         |  SELECT r.label, r.ref_id, e.embedding AS ref_v
         |  FROM ref r JOIN embeddings e ON e.vec_id = r.ref_id),
         |scored AS (
         |  SELECT e.label, e.vec_id, ${duckCosine("e.embedding", "rv.ref_v")} AS c
         |  FROM embeddings e JOIN rv ON e.label = rv.label
         |  WHERE e.vec_id <> rv.ref_id),
         |m AS (
         |  SELECT label, ${graft.functions.Portable.duckDavgUnit("c")} AS mean_c
         |  FROM scored GROUP BY label),
         |rk AS (
         |  SELECT label, vec_id, c,
         |         ROW_NUMBER() OVER (PARTITION BY label ORDER BY c, vec_id) AS rn
         |  FROM scored)
         |SELECT rk.label, CAST(rk.rn AS INTEGER) AS rank, rk.vec_id,
         |       rk.c AS cosine, m.mean_c AS label_mean,
         |       m.mean_c - rk.c AS margin
         |FROM rk JOIN m ON rk.label = m.label
         |WHERE rk.rn <= 3
         |ORDER BY rk.label, rank""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", nativeNorm(col("embedding")))
      val ref = e.groupBy("label").agg(min(col("vec_id")).as("ref_id"))
      val rv = ref.join(
        e.select(col("vec_id"), col("embedding").as("ref_v"), col("nrm").as("ref_nrm")),
        col("ref_id") === col("vec_id")).drop("vec_id")
      val scored = e.join(broadcast(rv), Seq("label"))
        .filter(col("vec_id") =!= col("ref_id"))
        .select(col("label"), col("vec_id"),
                (nativeDot(col("embedding"), col("ref_v")) / (col("nrm") * col("ref_nrm"))).as("c"))
      val m = scored.groupBy("label")
        .agg(graft.functions.Portable.davgUnit(col("c")).as("mean_c"))
      scored
        .withColumn("rn", row_number().over(
          Window.partitionBy("label").orderBy(col("c"), col("vec_id"))))
        .filter(col("rn") <= 3)
        .join(m, "label")
        .select(col("label"), col("rn").cast("int").as("rank"), col("vec_id"),
                col("c").as("cosine"), col("mean_c").as("label_mean"),
                (col("mean_c") - col("c")).as("margin"))
        .orderBy("label", "rank")
    },

    "ss_label_diversity" -> Q(
      s"""WITH e AS (
         |  SELECT label, vec_id, embedding, ${duckNorm("embedding")} AS nrm
         |  FROM embeddings),
         |u AS (
         |  SELECT label, vec_id,
         |         [CAST(embedding[i] AS DOUBLE) / nrm
         |            for i in range(1, len(embedding)+1)] AS uv
         |  FROM e),
         |comp AS (
         |  SELECT label, vec_id,
         |         unnest(range(1, len(uv)+1)) AS pos, unnest(uv) AS cval
         |  FROM u),
         |sp AS (
         |  SELECT label, pos,
         |         CAST(CAST(SUM(CAST(floor(cval * 1e9) AS BIGINT)) AS BIGINT)
         |              AS DOUBLE) / 1e9 AS s
         |  FROM comp GROUP BY label, pos),
         |sq AS (
         |  SELECT label, list_sum([x * x for x in list(s ORDER BY pos)]) AS sumsq
         |  FROM sp GROUP BY label),
         |rs AS (
         |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |         CAST(CAST(SUM(CAST(floor(list_sum([x * x for x in uv]) * 1e12)
         |                          AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12 AS ssq
         |  FROM u GROUP BY label)
         |SELECT CAST(rs.label AS INTEGER) AS label, rs.n_vecs,
         |       (sq.sumsq - rs.ssq)
         |         / CAST(rs.n_vecs * (rs.n_vecs - 1) AS DOUBLE) AS mean_pair_cos,
         |       sqrt(sq.sumsq) / CAST(rs.n_vecs AS DOUBLE) AS centroid_norm
         |FROM rs JOIN sq ON rs.label = sq.label
         |ORDER BY label""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val u = Tables.embeddings(s, d)
        .withColumn("nrm", nativeNorm(col("embedding")))
        .select(col("label"), col("vec_id"),
                transform(col("embedding"), x => x.cast("double") / col("nrm")).as("uv"))
      val sp = u
        .select(col("label"), posexplode(col("uv")).as(Seq("pos0", "cval")))
        .groupBy(col("label"), (col("pos0") + 1).as("pos"))
        .agg((sum(floor(col("cval") * lit(1e9)).cast("long")).cast("double")
                / lit(1e9)).as("s"))
      val sq = sp.groupBy("label")
        .agg(aggregate(
               sort_array(collect_list(struct(col("pos"), col("s")))),
               lit(0.0),
               (acc, x) => acc + x.getField("s") * x.getField("s")).as("sumsq"))
      val rs = u
        .select(col("label"),
                aggregate(col("uv"), lit(0.0), (acc, x) => acc + x * x).as("ssq_row"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
             (sum(floor(col("ssq_row") * lit(1e12)).cast("long")).cast("double")
                / lit(1e12)).as("ssq"))
      rs.join(sq, "label")
        .select(col("label").cast("int").as("label"), col("n_vecs"),
                ((col("sumsq") - col("ssq"))
                   / (col("n_vecs") * (col("n_vecs") - 1)).cast("double"))
                  .as("mean_pair_cos"),
                (sqrt(col("sumsq")) / col("n_vecs").cast("double")).as("centroid_norm"))
        .orderBy("label")
    },

    // Hybrid retrieval with reciprocal-rank fusion (Cormack et al.,
    // SIGIR 2009): a sparse arm (token-set Jaccard vs the query
    // document, the more-like-this lexical signal) and a dense arm
    // (cosine vs the query document's embedding) each produce a
    // top-50 list; RRF fuses them as Σ 1/(60+rank), here in exact
    // integer millionths so the fused score is hash-portable. The
    // production hybrid-search shape: arms are computed independently
    // (inverted index / ANN index at scale), only rank lists meet.
    // Scale shape: the query doc's token set broadcasts (one doc, not
    // the corpus); overlap is an equi-join on token + map-side-combined
    // count — never a doc×doc pair join; the dense arm is the
    // broadcast-query corpus scan of ss_cosine_topk; both arms bound
    // to 50 rows by TakeOrdered BEFORE the rank windows (which
    // therefore see ≤50 rows — allowlisted global windows), and the
    // fusion join is 50×50.
    "ss_hybrid_rrf" -> Q(
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |g AS (SELECT DISTINCT doc_id, token FROM tok),
         |q AS (SELECT token FROM g WHERE doc_id = 0),
         |qn AS (SELECT CAST(COUNT(*) AS BIGINT) AS qn FROM q),
         |nd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nd FROM g GROUP BY doc_id),
         |ov AS (
         |  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS ov
         |  FROM g JOIN q USING (token) WHERE g.doc_id <> 0 GROUP BY g.doc_id),
         |lexr AS (
         |  SELECT o.doc_id, (o.ov * 10000) // (qn.qn + n.nd - o.ov) AS jacc_s
         |  FROM ov o JOIN nd n ON o.doc_id = n.doc_id, qn),
         |lex AS (
         |  SELECT doc_id, jacc_s,
         |         CAST(ROW_NUMBER() OVER (ORDER BY jacc_s DESC, doc_id) AS BIGINT) AS r_lex
         |  FROM lexr ORDER BY jacc_s DESC, doc_id LIMIT 50),
         |dq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |dens AS (
         |  SELECT e.vec_id AS doc_id, ${duckCosine("e.embedding", "dq.qv")} AS cosine
         |  FROM embeddings e, dq WHERE e.vec_id <> 0),
         |den AS (
         |  SELECT doc_id, cosine,
         |         CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS r_den
         |  FROM dens ORDER BY cosine DESC, doc_id LIMIT 50),
         |f AS (
         |  SELECT COALESCE(l.doc_id, dn.doc_id) AS doc_id,
         |         COALESCE(1000000 // (60 + l.r_lex), 0)
         |           + COALESCE(1000000 // (60 + dn.r_den), 0) AS rrf_s,
         |         l.r_lex, dn.r_den
         |  FROM lex l FULL OUTER JOIN den dn ON l.doc_id = dn.doc_id)
         |SELECT doc_id, rrf_s, r_lex, r_den FROM f
         |ORDER BY rrf_s DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      // round 11: the corpus-wide (doc, token) DISTINCT exchange — which
      // every lexical-arm consumer re-executed — is now the in-row
      // first-occurrence-distinct token kernel (graft_shingles n=1
      // mode 1 ≡ distinct split tokens, empties kept); nd is just the
      // array size, map-side, no explode at all.
      graft.functions.Shingles.register(s)
      val dtok = Tables.documents(s, d)
        .select(col("doc_id"), expr("graft_shingles(text, 1, 1)").as("toks"))
      val q = dtok.filter(col("doc_id") === 0)
        .select(explode(col("toks")).as("token"))
      val qn = q.agg(count(lit(1)).as("qn"))
      val nd = dtok.select(col("doc_id"), size(col("toks")).cast("long").as("nd"))
      val ov = dtok.filter(col("doc_id") =!= 0)
        .select(col("doc_id"), explode(col("toks")).as("token"))
        .join(broadcast(q), "token")
        .groupBy("doc_id").agg(count(lit(1)).as("ov"))
      val lex = ov.join(nd, "doc_id").crossJoin(broadcast(qn))
        .select(col("doc_id"), expr("(ov * 10000) div (qn + nd - ov)").as("jacc_s"))
        .orderBy(col("jacc_s").desc, col("doc_id")).limit(50)
        .withColumn("r_lex",
          row_number().over(Window.orderBy(col("jacc_s").desc, col("doc_id"))).cast("long"))
      val e = Tables.embeddings(s, d).withColumn("nrm", nativeNorm(col("embedding")))
      val dq = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), col("nrm").as("qnrm"))
      val den = e.crossJoin(broadcast(dq)).filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("doc_id"),
                (nativeDot(col("embedding"), col("qv"))
                   / (col("nrm") * col("qnrm"))).as("cosine"))
        .orderBy(col("cosine").desc, col("doc_id")).limit(50)
        .withColumn("r_den",
          row_number().over(Window.orderBy(col("cosine").desc, col("doc_id"))).cast("long"))
      lex.join(den, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
                (coalesce(expr("1000000 div (60 + r_lex)"), lit(0L))
                   + coalesce(expr("1000000 div (60 + r_den)"), lit(0L))).as("rrf_s"),
                col("r_lex"), col("r_den"))
        .orderBy(col("rrf_s").desc, col("doc_id"))
        .limit(10)
    },

    // MMR diversified re-ranking (Carbonell & Goldstein, SIGIR 1998):
    // greedy selection of 5 results from the top-20 cosine candidates,
    // each step maximizing λ·relevance − (1−λ)·max-similarity-to-
    // already-selected (λ = 0.7) — the redundancy-suppressing re-rank
    // every retrieval stack bolts onto its ANN head. The greedy loop is
    // inherently sequential, so it runs UNROLLED over the k=5 steps on
    // the CANDIDATE frame (20 rows, checkpointed once — index-head
    // scale, never corpus scale): per step one max-over-selected
    // aggregate (≤20·|sel| rows) and one TakeOrdered-1. The corpus is
    // touched exactly once, by the candidate scan (the ss_cosine_topk
    // broadcast-query shape). Scores are fixed IEEE trees over portable
    // cosines — hash-exact; ties break on doc_id. The DuckDB twin
    // unrolls the same five steps (MATERIALIZED: each step is
    // referenced by every later step's NOT-IN and max-sim join).
    "ss_mmr_diversify" -> Q({
      val steps = (2 to 5).map { i =>
        s"""sel${i - 1} AS MATERIALIZED (
           |  ${(1 until i).map(j => s"SELECT doc_id FROM s$j").mkString(" UNION ALL ")}),
           |p$i AS MATERIALIZED (
           |  SELECT c.doc_id, c.rel, 0.7*c.rel - 0.3*MAX(s.s) AS mmr
           |  FROM ce c JOIN sims s ON c.doc_id = s.da
           |  JOIN sel${i - 1} ss ON s.db = ss.doc_id
           |  WHERE c.doc_id NOT IN (SELECT doc_id FROM sel${i - 1})
           |  GROUP BY c.doc_id, c.rel),
           |s$i AS MATERIALIZED (
           |  SELECT doc_id, rel, mmr, CAST($i AS BIGINT) AS rank
           |  FROM p$i ORDER BY mmr DESC, doc_id LIMIT 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH dq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cand AS MATERIALIZED (
         |  SELECT vec_id AS doc_id, cos AS rel FROM (
         |    SELECT e.vec_id, ${duckCosine("e.embedding", "dq.qv")} AS cos
         |    FROM embeddings e, dq WHERE e.vec_id <> 0)
         |  ORDER BY cos DESC, vec_id LIMIT 20),
         |ce AS MATERIALIZED (
         |  SELECT c.doc_id, c.rel, e.embedding
         |  FROM cand c JOIN embeddings e ON c.doc_id = e.vec_id),
         |sims AS MATERIALIZED (
         |  SELECT a.doc_id AS da, b.doc_id AS db,
         |         ${duckCosine("a.embedding", "b.embedding")} AS s
         |  FROM ce a, ce b WHERE a.doc_id <> b.doc_id),
         |s1 AS MATERIALIZED (
         |  SELECT doc_id, rel, 0.7*rel - 0.3*0.0 AS mmr, CAST(1 AS BIGINT) AS rank
         |  FROM ce ORDER BY rel DESC, doc_id LIMIT 1),
         |$steps
         |SELECT rank, doc_id, rel, mmr FROM (
         |  SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
         |  UNION ALL SELECT * FROM s4 UNION ALL SELECT * FROM s5)
         |ORDER BY rank""".stripMargin
    }) { (s, d) =>
      FloatDot.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", nativeNorm(col("embedding")))
      val dq = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), col("nrm").as("qnrm"))
      val ce = e.crossJoin(broadcast(dq)).filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("doc_id"),
                (nativeDot(col("embedding"), col("qv"))
                   / (col("nrm") * col("qnrm"))).as("rel"),
                col("embedding"), col("nrm"))
        .orderBy(col("rel").desc, col("doc_id")).limit(20)
        .localCheckpoint(true) // 20-row candidate head; feeds sims + all steps
      val a = ce.select(col("doc_id").as("da"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = ce.select(col("doc_id").as("db"), col("embedding").as("eb"), col("nrm").as("nb"))
      val sims = a.crossJoin(broadcast(b)).filter(col("da") =!= col("db"))
        .select(col("da"), col("db"),
                (nativeDot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("s"))
        .localCheckpoint(true) // 20×19 pairwise sims, built once
      var sel = ce
        .select(col("doc_id"), col("rel"),
                (lit(0.7) * col("rel") - lit(0.3) * lit(0.0)).as("mmr"))
        .orderBy(col("rel").desc, col("doc_id")).limit(1)
        .withColumn("rank", lit(1L))
      (2 to 5).foreach { i =>
        val ms = sims.join(broadcast(sel.select(col("doc_id").as("db"))), "db")
          .groupBy("da").agg(max(col("s")).as("ms"))
        val pick = ce.join(sel.select("doc_id"), Seq("doc_id"), "left_anti")
          .join(ms.withColumnRenamed("da", "doc_id"), "doc_id")
          .select(col("doc_id"), col("rel"),
                  (lit(0.7) * col("rel") - lit(0.3) * col("ms")).as("mmr"))
          .orderBy(col("mmr").desc, col("doc_id")).limit(1)
          .withColumn("rank", lit(i.toLong))
        sel = sel.unionByName(pick).localCheckpoint(true) // ≤5 rows
      }
      sel.select(col("rank"), col("doc_id"), col("rel"), col("mmr")).orderBy("rank")
    },

    // IVF cluster purity vs the supervised labels — the external
    // cluster-quality report (purity per cell, majority label) that
    // tells an ANN/clustering deployment whether its cells align with
    // any semantic partition. Reuses the SAME trained refined-centroid
    // assignment as ss_ivf_assign (shared artifact — the index
    // definition cannot drift from its own evaluation). Scale shape:
    // per-(cell, label) counts map-side combine to a |cells|×|labels|
    // grid; purity and the majority label come from the max-count +
    // min-label two-level aggregate on that GRID (the mm_pixel_hist
    // determinism discipline — no argmax nondeterminism).
    "ss_cluster_purity" -> Q(
      s"""WITH ${SimilarityQueries2.duckRefinedCte(SimilarityQueries2.NSEEDS)},
         |a AS (SELECT cluster, label FROM refined WHERE rn = 1),
         |cl AS (
         |  SELECT cluster, label, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM a GROUP BY cluster, label),
         |t AS (
         |  SELECT cluster, CAST(SUM(c) AS BIGINT) AS n_members,
         |         CAST(COUNT(*) AS BIGINT) AS n_labels,
         |         CAST(MAX(c) AS BIGINT) AS majority_count
         |  FROM cl GROUP BY cluster)
         |SELECT CAST(t.cluster AS INTEGER) AS cluster, t.n_members, t.n_labels,
         |       CAST(MIN(cl.label) AS INTEGER) AS majority_label, t.majority_count,
         |       (t.majority_count * 10000) // t.n_members AS purity_bp
         |FROM t JOIN cl ON t.cluster = cl.cluster AND cl.c = t.majority_count
         |GROUP BY t.cluster, t.n_members, t.n_labels, t.majority_count
         |ORDER BY cluster""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", nativeNorm(col("embedding")))
      val a = SimilarityQueries2.refined(e, d).filter(col("rn") === 1)
        .select(col("ccluster").as("cluster"), col("label"))
      val cl = a.groupBy("cluster", "label").agg(count(lit(1)).as("c"))
      val t = cl.groupBy("cluster")
        .agg(sum(col("c")).as("n_members"), count(lit(1)).as("n_labels"),
             max(col("c")).as("majority_count"))
      t.join(cl, "cluster")
        .filter(col("c") === col("majority_count"))
        .groupBy("cluster", "n_members", "n_labels", "majority_count")
        .agg(min(col("label")).as("majority_label"))
        .select(col("cluster").cast("int").as("cluster"), col("n_members"),
                col("n_labels"), col("majority_label").cast("int").as("majority_label"),
                col("majority_count"),
                expr("(majority_count * 10000) div n_members").as("purity_bp"))
        .orderBy("cluster")
    }
  )
}
