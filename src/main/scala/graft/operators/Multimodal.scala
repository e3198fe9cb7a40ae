package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed multimodal pipeline plumbing: opaque binary payloads with typed
  * metadata, batch-decoded per partition.
  *
  * The container ships no image/audio codecs, so `decode` is a
  * DETERMINISTIC STAND-IN (byte-histogram "features" + header-derived fake
  * dimensions) — clearly marked below. Everything around it is the real
  * production shape: a `binary` payload column, a typed Dataset, and
  * `mapPartitions` so a real decoder would amortize per-partition setup
  * (model load, codec init) exactly where the stub sits. This is the
  * Scala/JVM equivalent of the Python `mapInPandas` batch-UDF pattern.
  */
object Multimodal {

  /** An asset row: payload plus metadata (the image/audio/video model). */
  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte])

  /** Decoded features: what a codec + feature extractor would emit. */
  final case class AssetFeatures(
      asset_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, histogram: Array[Long])

  /** Wrap documents as binary assets (the corpus carries no real media;
    * utf-8 bytes stand in for an encoded payload). */
  def assetsFromDocuments(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("asset_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col("text"), "UTF-8").as("payload")).as[Asset]
  }

  /** Per-partition batch decode.
    *
    * STUB: a real implementation would initialize the codec/model once
    * per partition here and decode each payload; this stand-in derives
    * deterministic pseudo-features from the bytes so the pipeline shape
    * (partition-amortized setup, one output row per asset, fixed-width
    * feature schema) is fully exercised and testable offline.
    */
  def decode(assets: Dataset[Asset], histBins: Int = 16): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real decoder setup would happen once, here
      it.map { a =>
        val hist = new Array[Long](histBins)
        var i = 0
        while (i < a.payload.length) {
          hist(java.lang.Byte.toUnsignedInt(a.payload(i)) % histBins) += 1
          i += 1
        }
        AssetFeatures(
          a.asset_id, a.kind, a.payload.length,
          width = a.payload.length % 640 + 1,
          height = a.payload.length % 480 + 1,
          histogram = hist)
      }
    }
  }

  /** Downstream analytics over decoded features stay in DataFrame land:
    * per-kind size/shape stats — the handoff point back to Catalyst. */
  def kindStats(features: Dataset[AssetFeatures]): DataFrame =
    features.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n_assets"),
           sum(col("byte_len")).as("total_bytes"),
           max(col("width")).as("max_width"),
           max(col("height")).as("max_height"))
      .orderBy("kind")
}
