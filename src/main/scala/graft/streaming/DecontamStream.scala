package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STREAMING decontamination: the trained benchmark Bloom filter
  * (graft.queries.PipelineQueries.trainedBloom — 128 words, bounded by
  * the eval suite) applied to a document STREAM as a pure stateless
  * projection: grams, probe positions, and bit tests all evaluate
  * per-row against literal arrays, so the probe needs no shuffle, no
  * state store, and no watermark — it composes with any trigger and
  * scales embarrassingly. This is the shape a 100 TB ingest pipeline
  * wants: train the filter once on the (small) eval suite, then gate
  * every incoming document at ingest time, BEFORE it ever lands in the
  * training corpus.
  */
object DecontamStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Per-row probe: (doc_id, n_grams, bloom_hits, contaminated).
    * Works identically on a batch frame and a streaming frame — the
    * batch/stream equivalence test runs both through this. */
  def probe(docs: DataFrame, words: Array[Long]): DataFrame = {
    val flit  = array(words.map(lit(_)): _*)
    // 32 single-bit masks as literals: shiftleft needs a literal shift
    // amount, and an element_at lookup is codegen-friendly either way
    val masks = array((0 until 32).map(i => lit(1L << i)): _*)
    def bitSet(p: Column): Column =
      (element_at(flit, (p / 32).cast("int") + 1)
        .bitwiseAND(element_at(masks, pmod(p, lit(32)).cast("int") + 1))) =!= 0L
    def hit(g: Column): Column =
      (0 to 2).map(j => bitSet(graft.queries.PipelineQueries.posOf(g, lit(j))))
        .reduce(_ && _)
    // distinct-gram kernel (round 10, functions/Shingles.scala, mode 3:
    // first-occurrence distinct, empty for <6-token docs) — identical
    // gram SET to the batch gramStream's row-level distinct
    graft.functions.Shingles.register(docs.sparkSession)
    docs
      .select(col("doc_id"),
              call_function("graft_shingles",
                col("text"), lit(6), lit(3)).as("gs"))
      .select(col("doc_id"),
              size(col("gs")).as("n_grams"),
              size(filter(col("gs"), hit(_))).as("bloom_hits"))
      .withColumn("contaminated", (col("bloom_hits") > 0).cast("int"))
  }

  /** The streaming probe over a parquet document directory/glob, gated
    * by the filter trained on `corpusDir`'s benchmark split. */
  def stream(spark: SparkSession, corpusDir: String, streamPath: String): DataFrame = {
    val (words, _) = graft.queries.PipelineQueries.trainedBloom(spark, corpusDir)
    probe(spark.readStream.schema(docSchema).parquet(streamPath), words)
  }
}
