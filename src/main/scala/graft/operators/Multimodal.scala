package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed multimodal pipeline plumbing: opaque binary payloads with typed
  * metadata, batch-decoded per partition.
  *
  * Image payloads are decoded FOR REAL: the JDK ships PNG/BMP/GIF/JPEG
  * codecs in `javax.imageio`, so `decode` parses actual encoded bytes and
  * emits true pixel dimensions plus a luminance histogram computed from
  * the decoded raster. Audio is ALSO real: `javax.sound.sampled` ships a
  * WAV/AIFF/AU container parser, so [[pcmEnergy]] decodes actual PCM
  * samples (the declared fake-raster twin is `mm_audio_energy`). Video
  * codecs are not in the JDK, so those payloads take the documented
  * fallback (byte histogram, 0×0 dimensions — the "no codec" signal).
  * The pipeline shape is the production one either way: a `binary`
  * payload column, a typed Dataset, and `mapPartitions` so per-partition
  * setup (codec registry scan, model load) amortizes across the batch —
  * the Scala/JVM equivalent of the Python `mapInPandas` batch-UDF
  * pattern.
  */
object Multimodal {

  /** An asset row: payload plus metadata (the image/audio/video model). */
  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte])

  /** Decoded features: real pixel dims + luminance histogram for images;
    * byte histogram with 0×0 dims for payloads with no JVM codec. */
  final case class AssetFeatures(
      asset_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, histogram: Array[Long])

  /** A deterministic synthetic image: dimensions derived from the seed,
    * pixels a fixed gradient-plus-seed pattern, PNG-encoded through the
    * real `javax.imageio` writer — so the decode path exercises an actual
    * codec round-trip offline. */
  def syntheticImage(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (x * 7 + y * 13 + seed).toInt & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A deterministic synthetic audio clip: 16-bit mono PCM, a sine tone
    * for the first `silentFrom` samples and literal silence after,
    * WAV-encoded through the real `javax.sound.sampled` writer — so the
    * decode path exercises an actual container round-trip offline. */
  def syntheticWav(nSamples: Int, freqHz: Double, silentFrom: Int,
                   sampleRate: Float = 8000f): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v: Int =
        if (i >= silentFrom) 0
        else (math.sin(2 * math.Pi * freqHz * i / sampleRate) * 12000).toInt
      data(2 * i) = (v & 0xff).toByte // little-endian per the format below
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(data), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Wrap documents as binary assets. `image`-kind assets carry REAL
    * PNG payloads and `audio`-kind assets REAL WAV payloads (both
    * synthesized deterministically from the doc id, since the corpus
    * ships no media); `video` kinds carry the utf-8 text bytes as an
    * opaque stand-in payload (no JVM video codec exists to feed). */
  def assetsFromDocuments(docs: DataFrame): Dataset[Asset] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      col("text"))
      .as[(Long, String, String)]
      .map { case (id, kind, text) =>
        val payload = kind match {
          case "image" =>
            syntheticImage((id % 48 + 16).toInt, (id % 32 + 16).toInt, id)
          case "audio" =>
            val n = (1024 + id % 512).toInt
            syntheticWav(n, 110.0 + id % 330, silentFrom = (n * (id % 5) / 8).toInt)
          case _ => text.getBytes("UTF-8")
        }
        Asset(id, kind, payload)
      }
  }

  /** Per-partition batch decode.
    *
    * Images go through `ImageIO.read` — a real codec parse of the
    * payload bytes (PNG/BMP/GIF/JPEG headers + raster): true
    * width/height, luminance histogram over decoded pixels. Payloads no
    * installed reader claims (audio/video here — the JDK has no such
    * codecs) fall back to a deterministic byte histogram with 0×0
    * dimensions. The ImageIO plugin registry lookup is the per-partition
    * setup cost this `mapPartitions` shape amortizes.
    */
  def decode(assets: Dataset[Asset], histBins: Int = 16): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        // gate on the TYPED kind, never content-sniffing: a text payload
        // that happens to start with a codec magic ("BM", "GIF8") must
        // not be misdecoded as an image — and malformed headers can make
        // ImageIO plugins throw RuntimeExceptions, hence NonFatal
        val img =
          if (a.kind != "image") null
          else
            try ImageIO.read(new ByteArrayInputStream(a.payload))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img != null) {
          val hist = new Array[Long](histBins)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 +
                         ((rgb >> 8) & 0xff) * 587 +
                         (rgb & 0xff) * 114) / 1000
              hist(lum * histBins / 256) += 1
              x += 1
            }
            y += 1
          }
          AssetFeatures(a.asset_id, a.kind, a.payload.length,
                        img.getWidth, img.getHeight, hist)
        } else {
          val hist = new Array[Long](histBins)
          var i = 0
          while (i < a.payload.length) {
            hist(java.lang.Byte.toUnsignedInt(a.payload(i)) % histBins) += 1
            i += 1
          }
          AssetFeatures(a.asset_id, a.kind, a.payload.length,
                        width = 0, height = 0, histogram = hist)
        }
      }
    }
  }

  /** Per-asset perceptual hash. `decoded` distinguishes the raster hash
    * from the byte-pool fallback — the two families are NOT comparable
    * (the same raster in an unsupported container byte-hashes
    * differently), so a near-dup consumer must group on it. */
  final case class AssetHash(asset_id: Long, kind: String,
                             decoded: Boolean, phash: Long)

  /** Perceptual average-hash (aHash) over the REAL decoded raster:
    * luminance average-pooled to 8×8 cells, one bit per cell (cell mean >
    * global mean). Content-addressed, not byte-addressed — the same
    * raster re-encoded through a different container (PNG vs BMP) hashes
    * identically, which is what image near-dup needs and what a byte
    * hash (mm_decode_meta's content_hash) cannot give. Payloads that do
    * not decode — non-image kinds, AND image kinds in codecs the JVM
    * lacks or with corrupt bytes — fall back to a byte-sequence pool
    * over 64 buckets (same bit rule) with `decoded = false`, so the
    * column is total but the two hash families never mix silently.
    * Runs in the same `mapPartitions`
    * shape as [[decode]] (codec-registry setup amortized per partition);
    * the declared oracle twin over a deterministic fake raster is
    * `mm_phash` (queries/MultimodalQueries.scala). */
  def averageHash(assets: Dataset[Asset]): Dataset[AssetHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val img =
          if (a.kind != "image") null
          else
            try ImageIO.read(new ByteArrayInputStream(a.payload))
            catch { case scala.util.control.NonFatal(_) => null }
        val cells = new Array[Long](64)
        val counts = new Array[Long](64)
        if (img != null) {
          val (w, h) = (img.getWidth, img.getHeight)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 +
                         ((rgb >> 8) & 0xff) * 587 +
                         (rgb & 0xff) * 114) / 1000
              val cell = (y * 8 / h) * 8 + (x * 8 / w)
              cells(cell) += lum; counts(cell) += 1
              x += 1
            }
            y += 1
          }
        } else {
          val n = a.payload.length
          var i = 0
          while (i < n) {
            val cell = (i.toLong * 64 / n).toInt
            cells(cell) += java.lang.Byte.toUnsignedInt(a.payload(i))
            counts(cell) += 1
            i += 1
          }
        }
        var total = 0L; var totalN = 0L; var c = 0
        while (c < 64) { total += cells(c); totalN += counts(c); c += 1 }
        val mean = if (totalN == 0) 0L else total / totalN
        var hash = 0L; c = 0
        while (c < 64) {
          if (counts(c) > 0 && cells(c) / counts(c) > mean) hash |= (1L << c)
          c += 1
        }
        AssetHash(a.asset_id, a.kind, decoded = img != null, phash = hash)
      }
    }
  }

  /** Decoded audio features: real sample statistics for payloads the JVM
    * sound stack parses, byte-pool fallback (decoded=false) otherwise.
    * The two families never mix silently — same contract as
    * [[AssetHash.decoded]]. */
  final case class AudioFeatures(
      asset_id: Long, kind: String, decoded: Boolean, sample_rate: Int,
      n_samples: Long, n_frames: Int, energy_total: Long,
      silence_frames: Int, silence_ratio: Double)

  /** REAL audio decode + energy/silence profiling: `javax.sound.sampled`
    * parses the container (WAV/AIFF/AU ship with the JDK), non-16-bit
    * PCM is converted through the real `AudioSystem` conversion path,
    * and per-frame energy is Σ sample² in integer arithmetic — a frame
    * is "silence" when its mean square is below `silenceMeanSq` (VAD's
    * energy gate). Payloads the sound stack rejects — video/text kinds,
    * truncated headers — fall back to bytes-as-unsigned-samples with
    * `decoded = false` (the same fake-decode rule as the declared
    * `mm_audio_energy` twin, so the fallback stays oracle-shaped).
    * Same `mapPartitions` batch shape as [[decode]]: the audio provider
    * registry lookup amortizes per partition. Σ sample² in a Long holds
    * to ~8.6e9 max-amplitude samples per asset (≈ 12 days of 8 kHz
    * audio) — beyond that, frame the clip upstream. */
  def pcmEnergy(assets: Dataset[Asset], frameSamples: Int = 256,
                silenceMeanSq: Long = 1000000L): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    require(frameSamples > 0)
    assets.mapPartitions { it =>
      it.map { a =>
        val decoded: Option[(Int, Array[Int])] =
          try {
            val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(a.payload))
            val f = raw.getFormat
            val target = new javax.sound.sampled.AudioFormat(
              f.getSampleRate, 16, f.getChannels, true, false)
            val ais =
              if (f.getSampleSizeInBits == 16 && !f.isBigEndian &&
                  f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) raw
              else javax.sound.sampled.AudioSystem.getAudioInputStream(target, raw)
            val bytes = ais.readAllBytes()
            val ch = ais.getFormat.getChannels
            // mono mix by taking channel 0 — deterministic, and the
            // energy gate doesn't need the full downmix
            val stride = 2 * ch
            val samples = new Array[Int](bytes.length / stride)
            var i = 0
            while (i < samples.length) {
              samples(i) = ((bytes(i * stride + 1) << 8) |
                            (bytes(i * stride) & 0xff))
              i += 1
            }
            Some((ais.getFormat.getSampleRate.toInt, samples))
          } catch { case scala.util.control.NonFatal(_) => None }
        val (rate, samples, isReal) = decoded match {
          case Some((r, s)) => (r, s, true)
          case None =>
            val s = new Array[Int](a.payload.length)
            var i = 0
            while (i < s.length) {
              s(i) = java.lang.Byte.toUnsignedInt(a.payload(i)); i += 1
            }
            (0, s, false)
        }
        val nFrames = (samples.length + frameSamples - 1) / frameSamples
        var energy = 0L; var silence = 0; var fr = 0
        while (fr < nFrames) {
          val from = fr * frameSamples
          val until = math.min(from + frameSamples, samples.length)
          var ss = 0L; var i = from
          while (i < until) { val v = samples(i).toLong; ss += v * v; i += 1 }
          energy += ss
          if (ss < silenceMeanSq * (until - from)) silence += 1
          fr += 1
        }
        AudioFeatures(a.asset_id, a.kind, isReal, rate, samples.length.toLong,
          nFrames, energy, silence,
          if (nFrames == 0) 0.0 else silence.toDouble / nFrames)
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
