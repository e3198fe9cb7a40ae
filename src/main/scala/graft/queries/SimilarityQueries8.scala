package graft.queries

import graft.{Q, Tables}
import graft.functions.FloatDot
import graft.functions.Vectors._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search, part 8: IVF-PQ — the composite index (coarse
  * quantizer + product quantization of RESIDUALS) that production ANN
  * systems actually deploy at billion-vector scale, completing the
  * family next to the standalone IVF (SimilarityQueries2) and standalone
  * PQ (SimilarityQueries3):
  *
  *   1. every vector is assigned to its nearest refined IVF cell (the
  *      k=8 coarse quantizer artifact, shared with ss_ivf_* — one
  *      training, three index families);
  *   2. the RESIDUAL (vector − cell centroid) is what PQ encodes — the
  *      residual distribution is centered and tighter than the raw
  *      vectors, which is why IVFADC reconstructs better than PQ alone
  *      at the same code budget (ss_ivfpq_codes exposes exactly this:
  *      its recon_mse is directly comparable to ss_pq_codes');
  *   3. search probes the nprobe=2 nearest cells, computes the QUERY's
  *      residual per probed cell, builds one 8×16 ADC table per
  *      (query, cell), and candidates score as 8 table lookups — the
  *      scan never touches raw vectors, the 100 TB point of the design.
  *
  * Training re-runs the established integer-quantized k-means step
  * (floor(x·10⁴) summed as BIGINT — exact/associative, so DuckDB and
  * Spark train the identical codebook) over residual sub-blocks, and
  * every distance is a flat left-associated squared-L2 expansion
  * (identical fold order to DuckDB's list_sum), so codes, recon error,
  * and the final ADC ranking are all hash-checked against the oracle.
  *
  * Scale shape: both trained dims are bounded artifacts (coarse: k·64
  * doubles; residual codebook: 8·16·8 = 1024 doubles) broadcast as
  * literals; the residual computation is one corpus-pass zip_with
  * against the broadcast centroid dim; the ADC join is an equi-join on
  * (cell, block, code) against a ≤ 2·8·16-row query-side table — no
  * pair explosion anywhere.
  */
object SimilarityQueries8 {

  private val K      = 8  // coarse cells (shared ivf-centroids-k8 artifact)
  private val M      = 8  // PQ sub-blocks
  private val SUBDIM = 8  // dims per block
  private val KC     = 16 // sub-centroids per block
  private val DIM    = 64
  private val NPROBE = 2

  /** Residual-PQ codebook per corpus: (block, centroid id, 8 components).
    * Bounded at M·KC·SUBDIM = 1024 doubles; JVM-cached like the plain PQ
    * codebook and pre-built by [[Warm]]. */
  private val resPqCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Int, Long, Array[Double])]]()

  graft.ArtifactStore.onInvalidate(resPqCache.remove(_))

  /** Coarse-quantizer dim (cluster, cvec) as a broadcastable frame. */
  private def coarseDim(s: SparkSession, e: DataFrame, dir: String): DataFrame = {
    import s.implicits._
    SimilarityQueries2.centroids(e, dir, K)
      .map { case (c, v, _) => (c, v.toSeq) }.toDF("ccl", "cvec")
  }

  /** (vec_id, cluster, rv): every vector's residual against its assigned
    * refined cell centroid — pure elementwise arithmetic (no fold), so
    * Spark's zip_with and DuckDB's list comprehension agree bit-for-bit. */
  private def residuals(s: SparkSession, e: DataFrame, dir: String): DataFrame =
    SimilarityQueries2.refined(e, dir, K).filter(col("rn") === 1)
      .select(col("vec_id"), col("ccluster").as("cluster"), col("embedding"))
      .join(broadcast(coarseDim(s, e, dir)), col("cluster") === col("ccl"))
      .select(col("vec_id"), col("cluster"),
              zip_with(col("embedding"), col("cvec"),
                       (x, c) => x.cast("double") - c).as("rv"))

  /** Residual sub-blocks: (vec_id, cluster, b, sub). */
  private def resSubVecs(res: DataFrame): DataFrame =
    res.select(col("vec_id"), col("cluster"),
        explode(transform(sequence(lit(0), lit(M - 1)), b =>
          struct(b.cast("int").as("b"),
                 slice(col("rv"), b * SUBDIM + 1, lit(SUBDIM)).as("sub")))).as("s"))
      .select(col("vec_id"), col("cluster"),
              col("s.b").as("b"), col("s.sub").as("sub"))

  /** Flat left-associated squared L2 over a SUBDIM block — top-level
    * codegen'd expressions, fold order identical to DuckDB's list_sum. */
  private def sqDist(a: Column, c: Column): Column =
    (1 to SUBDIM).map { j =>
      val d = element_at(a, j) - element_at(c, j)
      d * d
    }.reduce(_ + _)

  /** Train the residual codebook: seed sub-centroids from the first KC
    * vectors' residual blocks, one integer-quantized k-means refinement,
    * collect the bounded artifact. */
  private[queries] def trainResPq(s: SparkSession, e: DataFrame,
                                  dir: String): Seq[(Int, Long, Array[Double])] =
    resPqCache.computeIfAbsent(dir, _ => {
      val sv = resSubVecs(residuals(s, e, dir))
      val seeds = sv.filter(col("vec_id") < KC)
        .select(col("b").as("sb"), col("vec_id").as("sid"), col("sub").as("ssub"))
      val w = Window.partitionBy("vec_id", "b").orderBy(col("dist"), col("sid"))
      val a0 = sv.join(broadcast(seeds), col("b") === col("sb"))
        .select(col("vec_id"), col("b"), col("sid"),
                sqDist(col("sub"), col("ssub")).as("dist"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id").as("avid"), col("b").as("ab"), col("sid"))
      a0.join(sv, col("avid") === col("vec_id") && col("ab") === col("b"))
        .select(col("b"), col("sid"), posexplode(col("sub")).as(Seq("j", "x")))
        .groupBy("b", "sid", "j")
        .agg(sum(floor(col("x") * 10000).cast("long")).as("sq"),
             count(lit(1)).as("n"))
        .select(col("b"), col("sid"), col("j"),
          (col("sq").cast("double") / lit(10000.0) / col("n").cast("double")).as("cj"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getLong(1)))
        .toSeq
        .map { case ((b, sid), rows) =>
          (b, sid, rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray)
        }
        .sortBy(t => (t._1, t._2))
    })

  /** Residual codebook as a broadcastable dim (cb, csid, cv). */
  private def resCentDf(s: SparkSession, e: DataFrame, dir: String): DataFrame = {
    import s.implicits._
    trainResPq(s, e, dir).map { case (b, sid, cv) => (b, sid, cv.toSeq) }
      .toDF("cb", "csid", "cv")
  }

  /** The residual codebook as a LITERAL array-of-structs (cb, csid, cv) —
    * the broadcast form a streaming ingest edge needs: per-row code
    * assignment over this literal is STATELESS, so the same trained
    * codebook serves batch queries and
    * [[graft.streaming.VectorIngestStream]] without retraining (the
    * centroidArrayFor pattern, M·KC·SUBDIM = 1024 doubles). */
  private[graft] def codebookArrayFor(spark: SparkSession, dir: String): Column = {
    FloatDot.register(spark)
    val e = Tables.embeddings(spark, dir).withColumn("nrm", nativeNorm(col("embedding")))
    array(trainResPq(spark, e, dir).map { case (b, sid, cv) =>
      struct(lit(b).as("cb"), lit(sid).as("csid"),
             array(cv.map(lit(_)): _*).as("cv"))
    }: _*)
  }

  /** PQ geometry for ingest-edge callers (blocks, dims per block). */
  private[graft] val pqGeometry: (Int, Int) = (M, SUBDIM)

  /** (vec_id, cluster, b, code, bdist): every residual block assigned to
    * its nearest refined sub-centroid (tiebreak smaller id). */
  private def resCodesDf(s: SparkSession, e: DataFrame, dir: String): DataFrame = {
    val w = Window.partitionBy("vec_id", "b").orderBy(col("dist"), col("csid"))
    resSubVecs(residuals(s, e, dir))
      .join(broadcast(resCentDf(s, e, dir)), col("b") === col("cb"))
      .select(col("vec_id"), col("cluster"), col("b"), col("csid"),
              sqDist(col("sub"), col("cv")).as("dist"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cluster"),
              col("b"), col("csid").as("code"), col("dist").as("bdist"))
  }

  /** Oracle CTE list: the shared IVF coarse quantizer
    * (duckRefinedCte(K): centroid + refined), residuals, residual
    * sub-blocks, and the trained residual codebook down to
    * pcodes(vec_id, cluster, b, code, bdist). */
  private def duckIvfPqCte: String =
    s"""${SimilarityQueries2.duckRefinedCte(K)},
       |res AS (
       |  SELECT r.vec_id, r.cluster,
       |         [CAST(r.embedding[j] AS DOUBLE) - c.cvec[j]
       |          for j in range(1, ${DIM + 1})] AS rv
       |  FROM refined r JOIN centroid c ON r.cluster = c.cluster
       |  WHERE r.rn = 1),
       |rsv AS (
       |  SELECT vec_id, cluster, b,
       |         [rv[$SUBDIM*b + j] for j in range(1, ${SUBDIM + 1})] AS sub
       |  FROM res, range(0, $M) t(b)),
       |pseeds AS (SELECT vec_id AS sid, b, sub AS ssub FROM rsv WHERE vec_id < $KC),
       |pd0 AS (
       |  SELECT v.vec_id, v.b, s.sid,
       |         list_sum([(v.sub[j] - s.ssub[j]) * (v.sub[j] - s.ssub[j])
       |                   for j in range(1, ${SUBDIM + 1})]) AS dist
       |  FROM rsv v JOIN pseeds s ON v.b = s.b),
       |pa0 AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, b ORDER BY dist, sid) AS rn
       |  FROM pd0),
       |pcomp AS (
       |  SELECT a.b, a.sid, j,
       |         SUM(CAST(floor(v.sub[j] * 10000) AS BIGINT)) AS sq,
       |         COUNT(*) AS n
       |  FROM pa0 a JOIN rsv v ON a.vec_id = v.vec_id AND a.b = v.b,
       |       range(1, ${SUBDIM + 1}) t(j)
       |  WHERE a.rn = 1
       |  GROUP BY a.b, a.sid, j),
       |pcent AS (
       |  SELECT b, sid,
       |         list(CAST(sq AS DOUBLE) / CAST(10000 AS DOUBLE) / CAST(n AS DOUBLE)
       |              ORDER BY j) AS cv
       |  FROM pcomp GROUP BY b, sid),
       |pd1 AS (
       |  SELECT v.vec_id, v.cluster, v.b, c.sid,
       |         list_sum([(v.sub[j] - c.cv[j]) * (v.sub[j] - c.cv[j])
       |                   for j in range(1, ${SUBDIM + 1})]) AS dist
       |  FROM rsv v JOIN pcent c ON v.b = c.b),
       |pr1 AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, b ORDER BY dist, sid) AS rn
       |  FROM pd1),
       |pcodes AS (
       |  SELECT vec_id, cluster, b, sid AS code, dist AS bdist FROM pr1 WHERE rn = 1)""".stripMargin

  private def pivot8(valueOf: Int => String, bCol: String = "b"): String =
    (0 until M).map(b => s"MAX(CASE WHEN $bCol = $b THEN ${valueOf(b)} END)").mkString(" + ")

  /** Oracle CTE list through `ranked(qid, vec_id, adc_dist, rank)`: the
    * full IVFADC probe — query residual per probed cell, per-block ADC
    * table, candidate scoring, per-query ranking. */
  private def duckIvfPqAnnCte: String =
    s"""$duckIvfPqCte,
       |probes AS (
       |  SELECT r.vec_id AS qid, r.cluster AS pcell,
       |         [CAST(r.embedding[j] AS DOUBLE) - c.cvec[j]
       |          for j in range(1, ${DIM + 1})] AS qrv
       |  FROM refined r JOIN centroid c ON r.cluster = c.cluster
       |  WHERE r.rn <= $NPROBE AND r.vec_id >= $KC AND r.vec_id < ${KC + 10}),
       |qsv AS (
       |  SELECT qid, pcell, b,
       |         [qrv[$SUBDIM*b + j] for j in range(1, ${SUBDIM + 1})] AS qsub
       |  FROM probes, range(0, $M) t(b)),
       |qd AS (
       |  SELECT q.qid, q.pcell, q.b, c.sid,
       |         list_sum([(q.qsub[j] - c.cv[j]) * (q.qsub[j] - c.cv[j])
       |                   for j in range(1, ${SUBDIM + 1})]) AS qdist
       |  FROM qsv q JOIN pcent c ON q.b = c.b),
       |adc AS (
       |  SELECT q.qid, m.vec_id,
       |         (${pivot8(_ => "q.qdist", "q.b")}) AS adc_dist
       |  FROM pcodes m JOIN qd q
       |    ON m.cluster = q.pcell AND m.b = q.b AND m.code = q.sid
       |  WHERE m.vec_id <> q.qid
       |  GROUP BY q.qid, m.vec_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dist, vec_id) AS rank
       |  FROM adc)""".stripMargin

  /** The IVFADC probe, ranked: (qid, vec_id, adc_dist, rank) for queries
    * vec_id ∈ [KC, KC+10) probing their NPROBE nearest cells. */
  private def ivfPqRanked(s: SparkSession, e: DataFrame, d: String): DataFrame = {
    // query residual per probed cell (rn <= NPROBE), then its per-block
    // ADC table against the residual codebook
    val qres = SimilarityQueries2.refined(e, d, K)
      .filter(col("rn") <= NPROBE && col("vec_id") >= KC && col("vec_id") < KC + 10)
      .select(col("vec_id").as("qid"), col("ccluster").as("pcell"), col("embedding"))
      .join(broadcast(coarseDim(s, e, d)), col("pcell") === col("ccl"))
      .select(col("qid"), col("pcell"),
              zip_with(col("embedding"), col("cvec"),
                       (x, c) => x.cast("double") - c).as("qrv"))
    val qsv = qres.select(col("qid"), col("pcell"),
        explode(transform(sequence(lit(0), lit(M - 1)), b =>
          struct(b.cast("int").as("b"),
                 slice(col("qrv"), b * SUBDIM + 1, lit(SUBDIM)).as("qsub")))).as("s"))
      .select(col("qid"), col("pcell"), col("s.b").as("qb"), col("s.qsub").as("qsub"))
    val qd = qsv.join(broadcast(resCentDf(s, e, d)), col("qb") === col("cb"))
      .select(col("qid"), col("pcell"), col("qb"), col("csid"),
              sqDist(col("qsub"), col("cv")).as("qdist"))
    val adc = resCodesDf(s, e, d)
      .join(broadcast(qd),
            col("cluster") === col("pcell") && col("b") === col("qb") &&
            col("code") === col("csid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id")
      .agg((0 until M).map(b => max(when(col("b") === b, col("qdist"))))
             .reduce(_ + _).as("adc_dist"))
    val w = Window.partitionBy("qid").orderBy(col("adc_dist"), col("vec_id"))
    adc.withColumn("rank", row_number().over(w))
  }

  // ss_lsh_multiprobe geometry — matches ss_lsh_ann's 8-bit signature
  private val LSHBITS = 8
  private val NFLIP   = 2 // extra probe buckets per query (T=2)

  def defs: Map[String, Q] = Map(

    // Multi-probe LSH ANN (Lv et al. VLDB 2007): instead of more hash
    // tables, probe the buckets MOST LIKELY to hold near neighbors — the
    // query's own bucket plus the buckets reached by flipping its
    // nearest-margin signature bits (smallest |dot(v, plane_b)| = the
    // hyperplanes the query sits closest to, hence most likely to have
    // split it from a neighbor). Candidates grow ~(1+T)× for ONE table's
    // memory where classic LSH would pay T extra tables; n_cand rides
    // along so the recall/cost gain over ss_lsh_ann's single bucket is
    // visible in the result. All deterministic: margins are the same
    // codegen'd dots as the signature, flip choice tie-breaks by bit
    // index, buckets are distinct by construction so no candidate dedup
    // is needed.
    "ss_lsh_multiprobe" -> Q(
      s"""WITH sigs AS (
         |  SELECT vec_id, label, embedding,
         |         ${duckLshSignature("embedding", DIM, LSHBITS)} AS sig
         |  FROM embeddings),
         |qm AS (
         |  SELECT vec_id AS qid, b,
         |         list_sum([CAST(embedding[i] AS DOUBLE) *
         |                   ([CAST(CAST(('0x' || substring(md5('lsh|' || CAST(b AS VARCHAR) || '|' || CAST(d AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) - 2147483648.0
         |                     for d in range(0, $DIM)])[i]
         |                   for i in range(1, $DIM + 1)]) AS m
         |  FROM embeddings, range(0, $LSHBITS) t(b)
         |  WHERE vec_id < 10),
         |fl AS (
         |  SELECT qid, b,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY abs(m), b) AS rn
         |  FROM qm),
         |probes AS (
         |  SELECT s.vec_id AS qid, s.embedding AS qv, s.sig AS psig
         |  FROM sigs s WHERE s.vec_id < 10
         |  UNION ALL
         |  SELECT s.vec_id, s.embedding, xor(s.sig, 1 << f.b)
         |  FROM sigs s JOIN fl f ON s.vec_id = f.qid
         |  WHERE f.rn <= $NFLIP),
         |cand AS (
         |  SELECT p.qid, m.vec_id, m.label,
         |         ${duckCosine("p.qv", "m.embedding")} AS cosine
         |  FROM probes p JOIN sigs m ON m.sig = p.psig AND m.vec_id <> p.qid),
         |ranked AS (
         |  SELECT *, COUNT(*) OVER (PARTITION BY qid) AS n_cand,
         |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
         |  FROM cand)
         |SELECT qid, vec_id, label, cosine,
         |       CAST(n_cand AS INTEGER) AS n_cand, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val sigs = Tables.embeddings(s, d)
        .withColumn("sig", lshSignature(col("embedding"), DIM, LSHBITS))
        .withColumn("nrm", nativeNorm(col("embedding")))
      // per-query flip choice: sort (|margin|, bit) structs, take the
      // NFLIP nearest planes — same ordering as the oracle's rank
      val margins = array((0 until LSHBITS).map { b =>
        struct(abs(nativeDot(col("embedding"), planeLit(b, DIM))).as("am"),
               lit(b).as("b"))
      }: _*)
      val q = sigs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
                col("nrm").as("qnrm"), col("sig").as("qsig"),
                array_sort(margins).as("ms"))
        .select(col("qid"), col("qv"), col("qnrm"),
          explode(array(
            (col("qsig") +: (1 to NFLIP).map { i =>
              col("qsig").bitwiseXOR(
                expr(s"shiftleft(1, element_at(ms, $i).b)"))
            }): _*)).as("psig"))
      val wN = Window.partitionBy("qid")
      val wR = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
      q.join(sigs, col("sig") === col("psig") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), col("label"),
                (nativeDot(col("qv"), col("embedding")) /
                  (col("qnrm") * col("nrm"))).as("cosine"))
        .withColumn("n_cand", count(lit(1)).over(wN).cast("int"))
        .withColumn("rank", row_number().over(wR))
        .filter(col("rank") <= 3)
        .select(col("qid"), col("vec_id"), col("label"), col("cosine"),
                col("n_cand"), col("rank").cast("int").as("rank"))
        .orderBy("qid", "rank")
    },

    // IVF-PQ codes: the compressed index — each vector stored as its
    // cell id + 8 residual codes. recon_mse is the per-vector residual
    // reconstruction error, directly comparable to ss_pq_codes' raw-PQ
    // recon_mse at the identical code budget (same M, KC): the residual
    // encoding's tighter distribution is THE reason IVFADC exists.
    "ss_ivfpq_codes" -> Q(
      s"""WITH $duckIvfPqCte
         |SELECT vec_id, CAST(MAX(cluster) AS INTEGER) AS cell,
         |       ${(0 until M).map(b => s"CAST(MAX(CASE WHEN b = $b THEN code END) AS INTEGER) AS code$b").mkString(",\n         |       ")},
         |       (${pivot8(_ => "bdist")}) / CAST($DIM AS DOUBLE) AS recon_mse
         |FROM pcodes GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", nativeNorm(col("embedding")))
      val codeCols = (0 until M).map(b =>
        max(when(col("b") === b, col("code"))).cast("int").as(s"code$b"))
      val mse = (0 until M).map(b => max(when(col("b") === b, col("bdist"))))
        .reduce(_ + _) / lit(DIM.toDouble)
      resCodesDf(s, e, d)
        .groupBy("vec_id")
        .agg(max(col("cluster")).cast("int").as("cell"),
             (codeCols :+ mse.as("recon_mse")): _*)
        .orderBy("vec_id")
    },

    // IVF-PQ ADC top-3 search (FAISS IVFADC): queries probe their
    // NPROBE=2 nearest cells; per probed cell the query's RESIDUAL
    // against that cell's centroid yields one 8×16 ADC table, and
    // candidates in the cell score as 8 lookups via an equi-join on
    // (cell, block, code). A candidate lives in exactly one cell, so the
    // (qid, vec_id) group sums one table's 8 block terms in fixed order.
    "ss_ivfpq_ann" -> Q(
      s"""WITH $duckIvfPqAnnCte
         |SELECT qid, vec_id, adc_dist, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", nativeNorm(col("embedding")))
      ivfPqRanked(s, e, d)
        .filter(col("rank") <= 3)
        .select(col("qid"), col("vec_id"), col("adc_dist"),
                col("rank").cast("int").as("rank"))
        .orderBy("qid", "rank")
    },

    // IVFADC recall@3 against EXACT squared-L2 ground truth — the
    // apples-to-apples eval for a distance-based compressed index (the
    // cosine recall gate is ss_ann_recall's): the full-precision
    // brute-force top-3 by the same metric the ADC approximates, joined
    // against the probe's top-3. Both sides tie-break by vec_id, so the
    // recall of the approximation is itself deterministic and
    // oracle-checked. Scale shape: truth is one corpus pass against a
    // 10-query broadcast (the corpus never shuffles); the ADC side is
    // cell-bounded; the final join is 30 rows.
    "ss_ivfpq_recall" -> Q(
      s"""WITH $duckIvfPqAnnCte,
         |ann AS (SELECT qid, vec_id FROM ranked WHERE rank <= 3),
         |q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |  WHERE vec_id >= $KC AND vec_id < ${KC + 10}),
         |tcand AS (
         |  SELECT q.qid, e.vec_id,
         |         list_sum([(CAST(e.embedding[j] AS DOUBLE) - CAST(q.qv[j] AS DOUBLE))
         |                   * (CAST(e.embedding[j] AS DOUBLE) - CAST(q.qv[j] AS DOUBLE))
         |                   for j in range(1, ${DIM + 1})]) AS l2
         |  FROM embeddings e, q WHERE e.vec_id <> q.qid),
         |tranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2, vec_id) AS rank
         |  FROM tcand),
         |truth AS (SELECT qid, vec_id FROM tranked WHERE rank <= 3),
         |hits AS (
         |  SELECT t.qid, COUNT(*) AS n FROM truth t
         |  JOIN ann a ON t.qid = a.qid AND t.vec_id = a.vec_id GROUP BY t.qid)
         |SELECT q2.qid, CAST(COALESCE(h.n, 0) AS INTEGER) AS n_hits,
         |       CAST(COALESCE(h.n, 0) AS DOUBLE) / 3.0 AS recall_at_3
         |FROM (SELECT DISTINCT qid FROM q) q2 LEFT JOIN hits h ON q2.qid = h.qid
         |ORDER BY q2.qid""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", nativeNorm(col("embedding")))
      val ann = ivfPqRanked(s, e, d).filter(col("rank") <= 3)
        .select(col("qid"), col("vec_id"))
      val q = e.filter(col("vec_id") >= KC && col("vec_id") < KC + 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      // exact squared L2, flat left-associated 64-term expansion — same
      // fold order as the oracle's list_sum comprehension
      val l2 = (1 to DIM).map { j =>
        val dlt = element_at(col("embedding"), j).cast("double") -
          element_at(col("qv"), j).cast("double")
        dlt * dlt
      }.reduce(_ + _)
      val wT = Window.partitionBy(col("qid")).orderBy(col("l2"), col("vec_id"))
      val truth = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), l2.as("l2"))
        .withColumn("rank", row_number().over(wT))
        .filter(col("rank") <= 3)
        .select(col("qid"), col("vec_id"))
      val hits = truth.join(ann, Seq("qid", "vec_id"))
        .groupBy("qid").agg(count(lit(1)).as("n"))
      q.select(col("qid")).distinct()
        .join(hits, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("n"), lit(0L)).cast("int").as("n_hits"),
                (coalesce(col("n"), lit(0L)).cast("double") / lit(3.0)).as("recall_at_3"))
        .orderBy("qid")
    }
  )
}
