package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING ANN ingest: the ingest-time half of the IVF index, the
  * NearDupGateStream/DecontamStream pattern applied to vectors. The
  * coarse quantizer is trained ONCE on the corpus (the persisted
  * `ivf-centroids-k*` artifact, SimilarityQueries2); every incoming
  * vector then assigns itself to its nearest cell PER ROW — the
  * centroids enter the plan as a k-element literal, so assignment is a
  * stateless codegen'd expression: no state store, no watermark, no
  * shuffle on the stream side, composable with any trigger. A vector
  * stream sunk with its `cluster` column is immediately
  * probe-searchable (probe = equi-join on the cell id), which is
  * exactly how a production IVF index absorbs new vectors between
  * retrains.
  *
  * Equivalence contract (StreamingAnnSpec): the per-row argmax here
  * computes cosines with the SAME nativeDot expression over the SAME
  * centroid literals as the batch `refined` path, and resolves ties the
  * same way (highest cos, then smallest cell id) — so streamed cell
  * assignments are bit-identical to `ss_ivf_assign`, and a probe over
  * the streamed table reproduces `ss_ivf_ann`.
  */
object VectorIngestStream {

  import graft.functions.Vectors._

  /** (cos, cell) scored structs of a row's embedding against every
    * centroid in the literal: the shared kernel of [[assignCells]] and
    * [[probeCells]]. */
  private def scored(centArr: Column): Column = {
    val nrm = nativeNorm(col("embedding"))
    transform(centArr, c => struct(
      (nativeDot(col("embedding"), c.getField("cvec")) /
        (nrm * c.getField("cnrm"))).as("cos"),
      // negated id: struct max-ordering then prefers the SMALLEST cell
      // on cos ties — the batch window's (cos desc, ccluster asc)
      (-c.getField("ccluster")).as("negc")))
  }

  /** Nearest cell per row, stateless: works identically on a batch and
    * a streaming frame. Output: (input columns..., cluster,
    * cluster_cos) — the `ss_ivf_assign` shape. */
  def assignCells(vecs: DataFrame, centArr: Column): DataFrame =
    vecs
      .withColumn("best", array_max(scored(centArr)))
      .withColumn("cluster", -col("best.negc"))
      .withColumn("cluster_cos", col("best.cos"))
      .drop("best")

  /** The `nprobe` nearest cells per row, exploded — the query-side
    * expansion of an IVF probe, same stateless shape. Output adds
    * (probe_cell, probe_cos). */
  def probeCells(vecs: DataFrame, centArr: Column, nprobe: Int): DataFrame = {
    // array_sort comparator: cos DESC, then cell id ASC (negc DESC)
    val sorted = array_sort(scored(centArr), (l, r) =>
      when(l.getField("cos") > r.getField("cos"), -1)
        .when(l.getField("cos") < r.getField("cos"), 1)
        .when(l.getField("negc") > r.getField("negc"), -1)
        .when(l.getField("negc") < r.getField("negc"), 1)
        .otherwise(0))
    vecs
      .withColumn("p", explode(slice(sorted, 1, nprobe)))
      .withColumn("probe_cell", -col("p.negc"))
      .withColumn("probe_cos", col("p.cos"))
      .drop("p")
  }

  /** The streaming assignment over a parquet vector directory/glob,
    * against `corpusDir`'s trained k-cell quantizer. Cell counts are
    * published per micro-batch as observed metrics
    * (`observedMetrics("ivf_ingest")`) so an operator watches cell
    * balance from query progress — the retrain trigger a production
    * index monitors (one cell absorbing the stream means the quantizer
    * has drifted). */
  def stream(spark: SparkSession, corpusDir: String, streamPath: String,
             k: Int = 8): DataFrame = {
    val schema = graft.Tables.embeddings(spark, corpusDir).schema
    val centArr = graft.queries.SimilarityQueries2.centroidArrayFor(spark, corpusDir, k)
    assignCells(spark.readStream.schema(schema).parquet(streamPath), centArr)
      .observe("ivf_ingest",
        count(lit(1)).as("n_vecs"),
        approx_count_distinct(col("cluster")).as("n_cells_hit"))
  }

  /** IVF-PQ codes per row, stateless — the ingest-time half of the
    * COMPOSITE index (SimilarityQueries8): after [[assignCells]], the
    * row's RESIDUAL against its assigned cell's centroid (looked up in
    * the same centroid literal) is PQ-encoded block by block against the
    * trained residual-codebook literal. Everything is per-row expression
    * work — no state store, no shuffle — so a vector stream lands
    * ADC-searchable (cell id + M codes) without retraining either
    * quantizer.
    *
    * Equivalence contract (StreamingAnnSpec): residual arithmetic is the
    * same elementwise zip_with as the batch path, per-block distance the
    * same flat left fold, and the argmin tie rule (smallest distance,
    * then smallest code id — struct min-ordering) matches the batch
    * window's (dist asc, csid asc) — so streamed codes are bit-identical
    * to `ss_ivfpq_codes`.
    *
    * Output: input columns + (cluster, cluster_cos, codes) where codes
    * is an M-element array of (b, code, bdist). */
  def assignPqCodes(vecs: DataFrame, centArr: Column, codebookArr: Column): DataFrame = {
    val (m, subdim) = graft.queries.SimilarityQueries8.pqGeometry
    // assigned cell's centroid vector from the SAME literal the
    // assignment ranked against (cells are distinct: one match)
    val cvec = element_at(
      filter(centArr, c => c.getField("ccluster") === col("cluster")), 1)
      .getField("cvec")
    def sqDist(a: Column, c: Column): Column =
      (1 to subdim).map { j =>
        val d = element_at(a, j) - element_at(c, j)
        d * d
      }.reduce(_ + _)
    assignCells(vecs, centArr)
      .withColumn("rv",
        zip_with(col("embedding"), cvec, (x, c) => x.cast("double") - c))
      .withColumn("codes", transform(sequence(lit(0), lit(m - 1)), b => {
        val sub  = slice(col("rv"), b * subdim + 1, lit(subdim))
        // (dist, sid) struct min-ordering == the batch (dist, csid) asc
        val best = array_min(transform(
          filter(codebookArr, c => c.getField("cb") === b),
          c => struct(sqDist(sub, c.getField("cv")).as("dist"),
                      c.getField("csid").as("sid"))))
        struct(b.cast("int").as("b"),
               best.getField("sid").as("code"),
               best.getField("dist").as("bdist"))
      }))
      .drop("rv")
  }

  /** Streaming IVF-PQ ingest over a parquet vector directory: cell
    * assignment + residual PQ codes per row against `corpusDir`'s two
    * trained artifacts, with per-batch reconstruction-error metrics
    * (rising recon error is the codebook-drift retrain signal). */
  def streamPq(spark: SparkSession, corpusDir: String, streamPath: String,
               k: Int = 8): DataFrame = {
    val schema = graft.Tables.embeddings(spark, corpusDir).schema
    val centArr = graft.queries.SimilarityQueries2.centroidArrayFor(spark, corpusDir, k)
    val codebook = graft.queries.SimilarityQueries8.codebookArrayFor(spark, corpusDir)
    assignPqCodes(spark.readStream.schema(schema).parquet(streamPath), centArr, codebook)
      .observe("ivfpq_ingest",
        count(lit(1)).as("n_vecs"),
        sum(aggregate(col("codes"), lit(0.0), (a, c) => a + c.getField("bdist")))
          .as("sum_recon_err"))
  }
}
