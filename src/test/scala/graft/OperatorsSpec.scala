package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Multimodal
import graft.streaming.EventStream
import graft.functions.Portable

/** Multimodal plumbing, stream-static enrichment, and portable-hash
  * invariants. */
class OperatorsSpec extends SparkSpec {

  test("multimodal decode: real image dims; one feature row per asset") {
    val docs     = Tables.documents(spark, sf)
    val features = Multimodal.decode(Multimodal.assetsFromDocuments(docs))
    val n        = docs.count()
    assert(features.count() === n)
    // image assets: the codec-decoded dimensions equal the generated
    // ones (doc_id % 48 + 16 × doc_id % 32 + 16), and the luminance
    // histogram mass equals the pixel count — a REAL ImageIO round-trip
    val images = features.filter(f => f.kind == "image").collect()
    assert(images.nonEmpty)
    images.foreach { f =>
      assert(f.width === (f.asset_id % 48 + 16).toInt, s"asset ${f.asset_id}")
      assert(f.height === (f.asset_id % 32 + 16).toInt, s"asset ${f.asset_id}")
      assert(f.histogram.sum === f.width.toLong * f.height, s"asset ${f.asset_id}")
      assert(f.byte_len > 8) // PNG header + data, not raw text
    }
    // non-image assets (no JVM codec): byte histogram mass == byte length
    val bad = features
      .filter(f => f.kind != "image" && (f.histogram.sum != f.byte_len || f.width != 0))
      .count()
    assert(bad === 0)
    // stats handoff keeps totals; video assets carry the raw text bytes
    // (image/audio carry real PNG/WAV payloads instead)
    val stats = Multimodal.kindStats(features)
    assert(stats.agg(sum(col("n_assets"))).head().getLong(0) === n)
    val textBytes = docs.filter(col("doc_id") % 3 === 2)
      .agg(sum(length(encode(col("text"), "UTF-8")))).head().getLong(0)
    assert(stats.filter(col("kind") === "video")
      .agg(sum(col("total_bytes"))).head().getLong(0) === textBytes)
  }

  test("pcmEnergy decodes real WAV: sample-exact silence detection, typed fallback") {
    import spark.implicits._
    // 4096 samples at 8 kHz: a 220 Hz tone for the first half, literal
    // zeros after → with 256-sample frames, exactly 8 loud + 8 silent
    val wav = Multimodal.syntheticWav(4096, 220.0, silentFrom = 2048)
    val assets = Seq(
      Multimodal.Asset(1L, "audio", wav),
      Multimodal.Asset(2L, "audio", "not audio at all".getBytes("UTF-8"))).toDS()
    val f = Multimodal.pcmEnergy(assets).collect().map(x => x.asset_id -> x).toMap

    val real = f(1L)
    assert(real.decoded && real.sample_rate === 8000)
    assert(real.n_samples === 4096L && real.n_frames === 16)
    assert(real.silence_frames === 8, s"got ${real.silence_frames}")
    assert(real.silence_ratio === 0.5)
    // the tone's energy survives the WAV container round-trip: mean
    // square of a 12000-amplitude sine ≈ amp²/2 per loud sample
    assert(real.energy_total > 2048L * 12000L * 12000L / 4)

    // an undecodable payload takes the byte-pool fallback, flagged
    val fb = f(2L)
    assert(!fb.decoded && fb.sample_rate === 0)
    assert(fb.n_samples === 16L)

    // the full corpus pipeline: every audio asset decodes for real, and
    // the silence fraction matches its generator (id%5)/8 complement
    val docs  = Tables.documents(spark, sf).limit(60)
    val audio = Multimodal.pcmEnergy(Multimodal.assetsFromDocuments(docs))
      .filter(a => a.kind == "audio").collect()
    assert(audio.nonEmpty)
    audio.foreach { a =>
      assert(a.decoded, s"asset ${a.asset_id} did not decode")
      assert(a.n_samples === 1024 + a.asset_id % 512, s"asset ${a.asset_id}")
    }
  }

  test("averageHash is content-addressed: container-invariant, raster-sensitive") {
    import spark.implicits._
    // the same raster encoded as PNG and as BMP must hash identically —
    // that is the perceptual property a byte hash cannot give
    def reencode(png: Array[Byte], fmt: String): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val png  = Multimodal.syntheticImage(40, 24, seed = 7)
    val bmp  = reencode(png, "bmp")
    assert(!java.util.Arrays.equals(png, bmp)) // different bytes...
    val other = Multimodal.syntheticImage(40, 24, seed = 1000) // different raster
    val assets = Seq(
      Multimodal.Asset(1L, "image", png),
      Multimodal.Asset(2L, "image", bmp),
      Multimodal.Asset(3L, "image", other),
      Multimodal.Asset(4L, "audio", "not an image".getBytes("UTF-8"))).toDS()
    val all = Multimodal.averageHash(assets).collect().map(h => h.asset_id -> h).toMap
    val hs  = all.view.mapValues(_.phash).toMap
    assert(hs(1L) == hs(2L), "...same raster, same hash")
    assert(hs(1L) != hs(3L), "different raster must differ")
    assert(hs.contains(4L)) // non-image fallback is total
    // the two hash families are flagged apart: raster hashes carry
    // decoded=true, the byte-pool fallback decoded=false
    assert(all(1L).decoded && all(2L).decoded && all(3L).decoded)
    assert(!all(4L).decoded)
    // declared fake-raster twin stays consistent: one row per doc,
    // bucket sizes partition the corpus
    val rows = SparkEntry.queries("mm_phash")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length.toLong == nDocs)
    assert(rows.forall(_.getLong(1) >= 0L)) // 62-bit hash stays positive
  }

  test("graft_window_min equals the declarative transform/slice form") {
    import spark.implicits._
    graft.functions.WindowMin.register(spark)
    val df = Seq(
      Seq.empty[Long], Seq(5L), Seq(9L, 2L), Seq(4L, 4L, 4L),
      Seq(7L, 3L, 8L, 1L), Seq(10L, 9L, 8L, 7L, 6L, 5L),
      Seq(-3L, 0L, -9L, 2L, 2L, -1L, 4L)).toDF("hs")
    val w = 4
    val native = df.select(call_function("graft_window_min", col("hs"), lit(w)).as("m"))
      .collect().map(_.getSeq[Long](0).toList)
    val declarative = df.select(
      when(size(col("hs")) >= w,
        transform(sequence(lit(0), size(col("hs")) - w), j =>
          array_min(slice(col("hs"), j + 1, lit(w)))))
        .otherwise(array().cast("array<bigint>")).as("m"))
      .collect().map(_.getSeq[Long](0).toList)
    assert(native.toSeq === declarative.toSeq)
  }

  test("stream-static enrich joins the customer dim without losing events") {
    val dir = java.nio.file.Files.createTempDirectory("enrich").toString + "/t"
    Tables.events(spark, sf).limit(500).repartition(2).write.parquet(dir)
    val q = EventStream.enrich(EventStream.ingest(spark, dir, 1),
                               Tables.customer(spark, sf))
      .writeStream.format("memory").queryName("enriched").outputMode("append")
      .option("checkpointLocation",
              java.nio.file.Files.createTempDirectory("ckpt-enrich").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("enriched")
    assert(out.count() === 500) // left outer: no event dropped
    // every matched row carries the right customer name
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("k"), col("c_name").as("expected_name"))
    val mismatched = out.filter(col("c_name").isNotNull)
      .join(dim, col("user_id") === col("k"))
      .filter(col("c_name") =!= col("expected_name"))
    assert(mismatched.count() === 0)
  }

  test("portable hash columns equal JVM md5 derivation") {
    import spark.implicits._
    val words = Seq("spark", "join", "the", "a", "stream").toDF("w")
    val got = words.select(col("w"), Portable.h32(col("w")).as("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def jvm(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    got.foreach { case (w, h) => assert(h === jvm(w), w) }
  }

  test("dsum is partition-order independent") {
    val df  = Tables.lineitem(spark, sf).select(col("l_extendedprice").as("x"))
    val one = df.coalesce(1).agg(Portable.dsum(col("x"))).head().getDouble(0)
    val many = df.repartition(7).agg(Portable.dsum(col("x"))).head().getDouble(0)
    assert(one === many)
  }
}
