package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING trained-classifier gate (round 10): score incoming
  * documents against the persisted multinomial-NB weight grid that
  * `ta_nb_confusion` trains — the fourth ingest-edge gate, beside
  * quality ([[QualityGateStream]]), near-dup ([[NearDupGateStream]])
  * and benchmark contamination ([[DecontamStream]]).
  *
  * The model is the EXACT artifact of the declared batch query: add-one
  * smoothed per-class token log-weights on a 1e-6 integer grid
  * (BIGINTs), trained on the even doc_id half, persisted once per
  * corpus via [[graft.ArtifactStore]] (the IVF-centroid pattern) and
  * entered into the plan as ONE map literal — so scoring is a per-row
  * stateless fold (split → per-token weight lookup → 5 integer sums →
  * argmax), no state store, no watermark, no stream-side shuffle, and
  * composes with any trigger. Integer weight sums are order-free, which
  * is what makes the streaming fold and the batch query's
  * groupBy-aggregate provably identical (StreamingNbGateSpec pins it).
  *
  * The vocabulary-bounded map (|vocab|×5 longs) is the same broadcast
  * rationale as the batch query's grid join: on a 100 TB corpus the
  * vocabulary grows sublinearly and the model a production gate ships
  * is capped to a fixed vocab anyway — everything out-of-vocab scores
  * the smoothed default w0, exactly as in training.
  *
  * Verdict ladder (first failing rule wins, the funnel convention):
  * `nb_mismatch` (predicted class ≠ the document's declared lang — the
  * metadata-vs-content disagreement a crawler gate quarantines) →
  * `accept`.
  */
object NbGateStream {

  /** Class order is pinned (and must match ta_nb_confusion's integer
    * encoding: de=5, en=4, es=3, fr=2, zh=1). */
  val Classes: Seq[String] = Seq("de", "en", "es", "fr", "zh")
  private val ClassIdx: Seq[Long] = Seq(5L, 4L, 3L, 2L, 1L)

  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Map[String, Seq[Long]], Seq[Long])]()

  graft.ArtifactStore.onInvalidate { dir => modelCache.remove(dir) }

  /** Train (or reload) the NB weight artifact for a corpus: the same
    * even-half fit as ta_nb_confusion — per-(lang, token) smoothed
    * log-weights and the per-lang out-of-vocab default, both on the
    * 1e-6 integer grid. Persisted as two parquet files; the JVM cache
    * holds the collected (token → weights-in-class-order) map. The
    * collect is vocabulary-bounded, never corpus-bounded. */
  def model(spark: SparkSession, dir: String): (Map[String, Seq[Long]], Seq[Long]) =
    modelCache.computeIfAbsent(dir, _ => {
      val path = graft.ArtifactStore.pathFor(dir, "nb-weights")
      val (hfs, p) = graft.Topic.fs(spark, path)
      if (!hfs.exists(p)) {
        val tok = graft.Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"),
                  explode(split(col("text"), " ")).as("token"))
        val train = tok.filter(col("doc_id") % 2 === 0)
        val cnts = train.groupBy("lang", "token").agg(count(lit(1)).as("c"))
        val tot = train.groupBy("lang").agg(count(lit(1)).as("n"))
        val vocab = train.select("token").distinct()
        val nv = vocab.agg(count(lit(1)).as("nv"))
        val grid = tot.crossJoin(vocab).crossJoin(broadcast(nv))
          .join(cnts, Seq("lang", "token"), "left")
          .select(col("lang"), col("token"),
                  round(log((coalesce(col("c"), lit(0L)) + lit(1.0)) /
                            (col("n") + col("nv"))) * lit(1000000.0))
                    .cast("long").as("w"))
        val dflt = tot.crossJoin(broadcast(nv))
          .select(col("lang"),
                  round(log(lit(1.0) / (col("n") + col("nv"))) * lit(1000000.0))
                    .cast("long").as("w0"))
        grid.write.mode("overwrite").parquet(s"$path/grid")
        dflt.coalesce(1).write.mode("overwrite").parquet(s"$path/dflt")
      }
      val gridRows = spark.read.parquet(s"$path/grid").collect()
      val w0ByLang = spark.read.parquet(s"$path/dflt").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val w0 = Classes.map(w0ByLang)
      val wmap = gridRows
        .groupBy(_.getString(1)) // token
        .map { case (tkn, rows) =>
          val byLang = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
          // every (lang, token) pair exists in the grid (tot × vocab
          // cross join), so this lookup is total
          tkn -> Classes.map(byLang)
        }
      (wmap, w0)
    })

  /** Per-row verdict over a document frame (batch or streaming — the
    * equivalence test runs both through this): integer score fold per
    * class, argmax with ta_nb_confusion's exact tie-break encoding. */
  def gate(docs: DataFrame, wmap: Map[String, Seq[Long]], w0: Seq[Long]): DataFrame = {
    val wmapLit: Column = typedlit(wmap)
    val w0Lit: Column   = typedlit(w0)
    val scored = docs
      .withColumn("scores",
        aggregate(split(col("text"), " "),
          expr("array(0L, 0L, 0L, 0L, 0L)"),
          (acc, t) => zip_with(acc,
            coalesce(element_at(wmapLit, t), w0Lit),
            (a, b) => a + b)))
      // the batch query's deterministic argmax: max(score*8 + classIdx)
      .withColumn("enc", greatest(ClassIdx.zipWithIndex.map { case (ix, i) =>
        element_at(col("scores"), i + 1) * 8 + lit(ix)
      }: _*))
      .withColumn("pred_lang",
        when(pmod(col("enc"), lit(8L)) === 5, "de")
          .when(pmod(col("enc"), lit(8L)) === 4, "en")
          .when(pmod(col("enc"), lit(8L)) === 3, "es")
          .when(pmod(col("enc"), lit(8L)) === 2, "fr")
          .otherwise("zh"))
    scored.withColumn("verdict",
      when(col("pred_lang") =!= col("lang"), "nb_mismatch").otherwise("accept"))
  }

  /** The streaming gate over a parquet document directory/glob, with
    * per-micro-batch verdict counts as observed metrics (the operator's
    * drift alarm: a mismatch-rate jump means the crawler's declared
    * languages stopped matching its content). */
  def stream(spark: SparkSession, corpusDir: String, streamPath: String): DataFrame = {
    val (wmap, w0) = model(spark, corpusDir)
    gate(spark.readStream.schema(DecontamStream.docSchema).parquet(streamPath),
         wmap, w0)
      .observe("nb_gate",
        count(lit(1)).as("n_docs"),
        sum(when(col("verdict") === "accept", 1L).otherwise(0L)).as("n_accepted"),
        sum(when(col("verdict") === "nb_mismatch", 1L).otherwise(0L)).as("n_mismatch"))
  }
}
