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
}
