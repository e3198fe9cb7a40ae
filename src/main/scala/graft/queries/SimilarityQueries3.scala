package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search, part 3: PRODUCT QUANTIZATION — the ANN memory
  * compression one level past int8 scalar quantization (ss_quantize_int8):
  * the 64-dim vector splits into M=8 sub-blocks of 8 dims, each block
  * quantizes independently to one of KC=16 trained sub-centroids, so a
  * vector compresses to 8 half-byte codes (64× smaller than float32),
  * and search runs Asymmetric Distance Computation (ADC): the query
  * precomputes its distance to every sub-centroid (one 8×16 table) and
  * a candidate's approximate distance is just 8 table lookups summed.
  *
  * Training follows the IVF recipe exactly (SimilarityQueries2): seed
  * sub-centroids from the first KC vectors' blocks, one k-means
  * refinement step over INTEGER-QUANTIZED component sums (floor(x·10⁴)
  * summed as BIGINT — exact/associative, hence engine-portable where a
  * float mean is not), re-assign against the refined centroids. All
  * distances are squared-L2 computed as a sequential left fold
  * (aggregate ∘ zip_with == DuckDB's list_sum comprehension,
  * bit-for-bit), sums across the 8 blocks are written as one
  * left-associated expression — so codes, reconstruction error, and ADC
  * rankings are all DuckDB-oracle-checked exactly.
  */
object SimilarityQueries3 {

  private val M      = 8  // sub-blocks
  private val SUBDIM = 8  // dims per block (M·SUBDIM = 64)
  private val KC     = 16 // sub-centroids per block

  /** Trained codebook per corpus dir: (block, centroid id, 8 components).
    * Bounded at M·KC·SUBDIM = 1024 doubles — the train-once artifact
    * pattern; evicted by ArtifactStore.invalidate. */
  private val pqCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Int, Long, Array[Double])]]()

  graft.ArtifactStore.onInvalidate(pqCache.remove(_))

  /** (vec_id, b, sub): each vector exploded into its M double-cast
    * sub-blocks. */
  private def subVecs(e: DataFrame): DataFrame =
    e.select(col("vec_id"), explode(transform(sequence(lit(0), lit(M - 1)), b =>
        struct(b.cast("int").as("b"),
               transform(slice(col("embedding"), b * SUBDIM + 1, lit(SUBDIM)),
                         x => x.cast("double")).as("sub")))).as("s"))
     .select(col("vec_id"), col("s.b").as("b"), col("s.sub").as("sub"))

  /** Squared L2 over the fixed SUBDIM block, expanded to a flat
    * left-associated sum of element_at terms: top-level expressions
    * whole-stage-codegen (with subexpression elimination), where the
    * equivalent aggregate∘zip_with HOF evaluates interpreted (~2×
    * wall-clock on the 256k-row assignment joins at sf0.1). The
    * addition order is identical to DuckDB's list_sum left fold, so
    * parity is unchanged. */
  private def sqDist(a: Column, c: Column): Column =
    (1 to SUBDIM).map { j =>
      val d = element_at(a, j) - element_at(c, j)
      d * d
    }.reduce(_ + _)

  private[queries] def trainPq(e: DataFrame, dir: String): Seq[(Int, Long, Array[Double])] =
    pqCache.computeIfAbsent(dir, _ => {
      val sv = subVecs(e)
      val seeds = sv.filter(col("vec_id") < KC)
        .select(col("b").as("sb"), col("vec_id").as("sid"), col("sub").as("ssub"))
      val d0 = sv.join(broadcast(seeds), col("b") === col("sb"))
        .select(col("vec_id"), col("b"), col("sid"),
                sqDist(col("sub"), col("ssub")).as("dist"))
      val w = Window.partitionBy("vec_id", "b").orderBy(col("dist"), col("sid"))
      val a0 = d0.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
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

  /** Trained codebook as a broadcastable dim (b, sid, cv). */
  private def centDf(s: SparkSession, e: DataFrame, dir: String): DataFrame = {
    import s.implicits._
    trainPq(e, dir).map { case (b, sid, cv) => (b, sid, cv.toSeq) }
      .toDF("cb", "csid", "cv")
  }

  /** (vec_id, b, code, bdist): every sub-block assigned to its nearest
    * refined sub-centroid (tiebreak smaller id), with the block's
    * squared reconstruction error. */
  private def codesDf(s: SparkSession, e: DataFrame, dir: String): DataFrame = {
    val w = Window.partitionBy("vec_id", "b").orderBy(col("dist"), col("csid"))
    subVecs(e).join(broadcast(centDf(s, e, dir)), col("b") === col("cb"))
      .select(col("vec_id"), col("b"), col("csid"),
              sqDist(col("sub"), col("cv")).as("dist"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("b"), col("csid").as("code"), col("dist").as("bdist"))
  }

  /** Shared oracle CTE list: defines sv, seeds, cent (refined codebook),
    * and codes(vec_id, b, code, bdist). */
  private val duckPqCte: String =
    s"""sv AS (
       |  SELECT vec_id, b,
       |         [CAST(embedding[$SUBDIM*b + j] AS DOUBLE) for j in range(1, ${SUBDIM + 1})] AS sub
       |  FROM embeddings, range(0, $M) t(b)),
       |seeds AS (SELECT vec_id AS sid, b, sub AS ssub FROM sv WHERE vec_id < $KC),
       |d0 AS (
       |  SELECT v.vec_id, v.b, s.sid,
       |         list_sum([(v.sub[j] - s.ssub[j]) * (v.sub[j] - s.ssub[j])
       |                   for j in range(1, ${SUBDIM + 1})]) AS dist
       |  FROM sv v JOIN seeds s ON v.b = s.b),
       |a0 AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, b ORDER BY dist, sid) AS rn
       |  FROM d0),
       |comp AS (
       |  SELECT a.b, a.sid, j,
       |         SUM(CAST(floor(v.sub[j] * 10000) AS BIGINT)) AS sq,
       |         COUNT(*) AS n
       |  FROM a0 a JOIN sv v ON a.vec_id = v.vec_id AND a.b = v.b,
       |       range(1, ${SUBDIM + 1}) t(j)
       |  WHERE a.rn = 1
       |  GROUP BY a.b, a.sid, j),
       |cent AS (
       |  SELECT b, sid,
       |         list(CAST(sq AS DOUBLE) / CAST(10000 AS DOUBLE) / CAST(n AS DOUBLE)
       |              ORDER BY j) AS cv
       |  FROM comp GROUP BY b, sid),
       |d1 AS (
       |  SELECT v.vec_id, v.b, c.sid,
       |         list_sum([(v.sub[j] - c.cv[j]) * (v.sub[j] - c.cv[j])
       |                   for j in range(1, ${SUBDIM + 1})]) AS dist
       |  FROM sv v JOIN cent c ON v.b = c.b),
       |r1 AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, b ORDER BY dist, sid) AS rn
       |  FROM d1),
       |codes AS (SELECT vec_id, b, sid AS code, dist AS bdist FROM r1 WHERE rn = 1)""".stripMargin

  private def pivot8(valueOf: Int => String, bCol: String = "b"): String =
    (0 until M).map(b => s"MAX(CASE WHEN $bCol = $b THEN ${valueOf(b)} END)").mkString(" + ")

  def defs: Map[String, Q] = Map(

    // PQ codes + reconstruction-error profile: the compressed index
    // itself. recon_mse sums the 8 per-block squared errors in one
    // left-associated expression (aggregating doubles would be
    // order-dependent) over the 64 dims.
    "ss_pq_codes" -> Q(
      s"""WITH $duckPqCte
         |SELECT vec_id,
         |       ${(0 until M).map(b => s"CAST(MAX(CASE WHEN b = $b THEN code END) AS INTEGER) AS code$b").mkString(",\n         |       ")},
         |       (${pivot8(_ => "bdist")}) / CAST(64 AS DOUBLE) AS recon_mse
         |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
      val codeCols = (0 until M).map(b =>
        max(when(col("b") === b, col("code"))).cast("int").as(s"code$b"))
      val mse = (0 until M).map(b => max(when(col("b") === b, col("bdist"))))
        .reduce(_ + _) / lit(64.0)
      codesDf(s, e, d)
        .groupBy("vec_id")
        .agg(codeCols.head, (codeCols.tail :+ mse.as("recon_mse")): _*)
        .orderBy("vec_id")
    },

    // PQ-ADC top-3 search: each query (vec_id in [16,26)) computes one
    // 8×16 distance table to the codebook (a broadcastable dim of 128
    // rows), then a candidate's approximate distance is 8 lookups —
    // codes meet the table in an equi-join on (block, code), and the 8
    // block terms re-sum in fixed order. The scan never touches raw
    // candidate vectors: THE point of PQ at 100 TB (the index is codes
    // + one codebook, 64× smaller than float32).
    "ss_pq_ann" -> Q(
      s"""WITH $duckPqCte,
         |qd AS (
         |  SELECT v.vec_id AS qid, v.b, c.sid,
         |         list_sum([(v.sub[j] - c.cv[j]) * (v.sub[j] - c.cv[j])
         |                   for j in range(1, ${SUBDIM + 1})]) AS qdist
         |  FROM sv v JOIN cent c ON v.b = c.b
         |  WHERE v.vec_id >= $KC AND v.vec_id < ${KC + 10}),
         |adc AS (
         |  SELECT q.qid, m.vec_id,
         |         (${pivot8(_ => "q.qdist", "q.b")}) AS adc_dist
         |  FROM codes m JOIN qd q ON m.b = q.b AND m.code = q.sid
         |  WHERE m.vec_id <> q.qid
         |  GROUP BY q.qid, m.vec_id),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dist, vec_id) AS rank
         |  FROM adc)
         |SELECT qid, vec_id, adc_dist, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 3 ORDER BY qid, rank""".stripMargin) { (s, d) =>
      val e  = Tables.embeddings(s, d)
      val qd = subVecs(e.filter(col("vec_id") >= KC && col("vec_id") < KC + 10))
        .join(broadcast(centDf(s, e, d)), col("b") === col("cb"))
        .select(col("vec_id").as("qid"), col("b").as("qb"), col("csid"),
                sqDist(col("sub"), col("cv")).as("qdist"))
      val adc = codesDf(s, e, d)
        .join(broadcast(qd), col("b") === col("qb") && col("code") === col("csid"))
        .filter(col("vec_id") =!= col("qid"))
        .groupBy("qid", "vec_id")
        .agg((0 until M).map(b => max(when(col("b") === b, col("qdist"))))
               .reduce(_ + _).as("adc_dist"))
      val w = Window.partitionBy("qid").orderBy(col("adc_dist"), col("vec_id"))
      adc.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("qid"), col("vec_id"), col("adc_dist"), col("rank").cast("int").as("rank"))
        .orderBy("qid", "rank")
    }
  )
}
