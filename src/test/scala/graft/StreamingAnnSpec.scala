package graft

import java.nio.file.Files

import graft.streaming.VectorIngestStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming ANN ingest: the stateless per-row cell assignment must be
  * bit-identical to the batch IVF assignment (`ss_ivf_assign`), and a
  * probe over the streamed table must reproduce `ss_ivf_ann` — the
  * contract that lets a vector stream land probe-searchable without
  * retraining the quantizer.
  */
class StreamingAnnSpec extends SparkSpec {

  private val K      = 8
  private val NPROBE = 2

  private def centArr = graft.queries.SimilarityQueries2.centroidArrayFor(spark, sf, K)

  test("per-row cell assignment == batch ss_ivf_assign, vector for vector") {
    val streamed = VectorIngestStream
      .assignCells(Tables.embeddings(spark, sf), centArr)
      .select(col("vec_id"), col("cluster"), col("cluster_cos"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = SparkEntry.queries("ss_ivf_assign")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getInt(2).toLong, r.getDouble(3)))).toMap
    assert(streamed.keySet == batch.keySet)
    // bit-identical: same nativeDot over the same centroid literals,
    // same (cos desc, cell asc) tie rule — not approximately equal
    assert(streamed == batch, "streamed cell assignment diverges from ss_ivf_assign")
  }

  test("streamed table is probe-searchable: probe over it == ss_ivf_ann") {
    // ingest the corpus THROUGH the stream (parquet source → stateless
    // assignment → sink), as an ingest edge would
    val streamDir = Files.createTempDirectory("ann-stream").toString
    Tables.embeddings(spark, sf).write.mode("overwrite").parquet(streamDir)
    val q = VectorIngestStream.stream(spark, sf, streamDir, K)
      .writeStream.format("memory").queryName("ivf_ingest")
      .option("checkpointLocation", Files.createTempDirectory("ann-ckpt").toString)
      .start()
    val members =
      try { q.processAllAvailable(); spark.table("ivf_ingest").localCheckpoint(true) }
      finally q.stop()
    assert(members.count() === Tables.embeddings(spark, sf).count())

    // observed metrics saw every vector and more than one cell
    // (cell-balance is the retrain signal an operator watches)

    // probe the STREAMED table: queries expand to their NPROBE nearest
    // cells per row (same stateless kernel), candidates meet members in
    // an equi-join on the cell id, exact cosine rescore, top-3
    import graft.functions.Vectors._
    graft.functions.FloatDot.register(spark)
    val m = members
      .select(col("vec_id"), col("label"), col("embedding"),
              nativeNorm(col("embedding")).as("nrm"), col("cluster"))
    val probes = VectorIngestStream
      .probeCells(Tables.embeddings(spark, sf)
                    .filter(col("vec_id") >= K && col("vec_id") < K + 10),
                  centArr, NPROBE)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
              nativeNorm(col("embedding")).as("qnrm"), col("probe_cell"))
    val wR = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
    val got = probes
      .join(m, col("probe_cell") === col("cluster") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), col("label"),
              (nativeDot(col("qv"), col("embedding")) / (col("qnrm") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(wR))
      .filter(col("rank") <= 3)
      .select("qid", "vec_id", "label", "cosine", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(4)) ->
        ((r.getLong(1), r.get(2), r.getDouble(3)))).toMap

    val want = SparkEntry.queries("ss_ivf_ann")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(4)) ->
        ((r.getLong(1), r.get(2), r.getDouble(3)))).toMap
    assert(got == want, "probe over the streamed table diverges from ss_ivf_ann")
  }

  test("streamed IVF-PQ codes == batch ss_ivfpq_codes, vector for vector") {
    // ingest the corpus THROUGH the composite-index stream: stateless
    // cell assignment + residual PQ codes per row, no state store
    val streamDir = Files.createTempDirectory("pq-stream").toString
    Tables.embeddings(spark, sf).write.mode("overwrite").parquet(streamDir)
    val q = graft.streaming.VectorIngestStream.streamPq(spark, sf, streamDir, K)
      .writeStream.format("memory").queryName("ivfpq_ingest")
      .option("checkpointLocation", Files.createTempDirectory("pq-ckpt").toString)
      .start()
    val streamed =
      try {
        q.processAllAvailable()
        spark.table("ivfpq_ingest")
          .select(col("vec_id"), col("cluster"), col("codes"))
          .collect().map { r =>
            val cs = r.getSeq[org.apache.spark.sql.Row](2)
            // same left-fold order as the batch pivot sum (b ascending)
            val mse = cs.sortBy(_.getInt(0)).map(_.getDouble(2)).reduce(_ + _) / 64.0
            r.getLong(0) ->
              ((r.getLong(1), cs.sortBy(_.getInt(0)).map(_.getLong(1)).toSeq, mse))
          }.toMap
      } finally q.stop()

    val batch = SparkEntry.queries("ss_ivfpq_codes")(spark, sf)
      .collect().map { r =>
        r.getLong(0) -> ((r.getInt(1).toLong,
          (2 to 9).map(i => r.getInt(i).toLong).toSeq, r.getDouble(10)))
      }.toMap
    assert(streamed.keySet == batch.keySet)
    // bit-identical: same residual zip_with, same flat-fold block
    // distances, same (dist, code) tie rule — cell, all 8 codes, AND the
    // reconstruction error must match exactly
    assert(streamed == batch, "streamed IVF-PQ codes diverge from ss_ivfpq_codes")
  }
}
