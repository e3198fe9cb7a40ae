package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the round-10 fake-raster kernels (functions/PixelKernels.scala)
  * against naive per-document reference folds on the corpus, plus
  * constructed edges (empty text, single char, exact row/frame/grid
  * boundaries, all-dark borders, the br ≤ 8 dhash cap, the 256-sample
  * audio cap). The references recompute each declared query's exploded
  * semantics directly from the string — 1-based codepoint positions,
  * floor-division means — so a kernel bug cannot hide behind a shared
  * implementation.
  */
class PixelKernelsSpec extends SparkSpec {

  private def cps(t: String): Array[Int] = t.codePoints().toArray

  // --- references: straight transcriptions of the oracle SQL ---

  private def refLap(t: String): (Long, Long, Long) = {
    val p = cps(t)
    var n = 0L; var e = 0L; var mx = 0L
    for (i <- 2 to p.length - 1) { // 1-based center, needs i+1 <= len
      val m = (i - 1) % 32
      if (m != 0 && m != 31) {
        val lap = p(i - 2).toLong - 2L * p(i - 1) + p(i)
        n += 1; e += lap * lap; mx = math.max(mx, math.abs(lap))
      }
    }
    (n, e, mx)
  }

  private def refDhash(t: String): (Long, Long, Long) = {
    val p = cps(t)
    val cells = (0 until p.length).filter(_ < 1152)
      .groupBy(i => (i / 128, (i % 32) / 4))
      .map { case (k, is) => k -> (is.map(p(_).toLong).sum / is.size) }
    var np = 0L; var dh = 0L; var bs = 0L
    for (b <- 0 to 8; c <- 0 to 6) {
      if (cells.contains((b, c + 1))) {
        np += 1
        if (cells((b, c)) > cells((b, c + 1))) { dh += 1L << (b * 7 + c); bs += 1 }
      }
    }
    (np, dh, bs)
  }

  private def refResize(t: String): (Long, Long, Long) = {
    val p = cps(t)
    val blocks = (0 until p.length)
      .groupBy(i => (i / 128, (i % 32) / 4))
      .map { case (k, is) => k -> (is.map(p(_).toLong).sum / is.size) }
    if (blocks.isEmpty) (0L, 0L, 0L)
    else (blocks.keys.map(_._1).max + 1L, blocks.size.toLong, blocks.values.sum)
  }

  private def refBorder(t: String): (Long, Long, Long, Long) = {
    val p = cps(t)
    val rows = (0 until p.length).groupBy(_ / 32)
      .map { case (r, is) => r -> (is.map(p(_).toLong).sum / is.size < 105) }
    val n = rows.size.toLong
    val dark = rows.values.count(identity).toLong
    val bright = rows.filter(!_._2).keys
    val top = if (bright.isEmpty) n else bright.min.toLong
    val bottom = n - 1 - (if (bright.isEmpty) -1L else bright.max.toLong)
    (n, dark, top, bottom)
  }

  private def refAudioFp(t: String): (Long, Long, Long) = {
    val p = cps(t).take(256).map(_.toLong)
    val frames = p.grouped(16).map(g => g.map(x => x * x).sum).toArray
    var fp = 0L; var bs = 0L
    for (f <- 1 until frames.length) {
      if (frames(f) > frames(f - 1)) { fp += 1L << (f - 1); bs += 1 }
    }
    (frames.length.toLong, fp, bs)
  }

  private val edges = Seq(
    "", "a", " ", "\u0000",
    "a" * 31, "a" * 32, "a" * 33,            // row boundaries
    "a" * 127, "a" * 128, "a" * 129,         // block-row boundaries
    "a" * 255, "a" * 256, "a" * 257,         // audio cap
    "a" * 1151, "a" * 1152, "a" * 1153,      // dhash br <= 8 cap
    (0 until 300).map(i => ('a' + i % 26).toChar).mkString, // varied rows
    "\u0001" * 100,                           // all-dark rows
    ("z" * 40) + ("\u0001" * 40) + ("z" * 40),    // bright-dark-bright rows
    "ab😀cd" * 30)                  // supplementary codepoints

  test("kernel structs equal reference folds on corpus and edges") {
    val corpus = Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).toSeq
    for (t <- corpus ++ edges) {
      val u = UTF8String.fromString(t)
      val l = functions.LapStats.stats(u)
      assert((l.getLong(0), l.getLong(1), l.getLong(2)) === refLap(t), s"lap: ${t.take(40)}")
      val d = functions.DhashStats.stats(u)
      assert((d.getLong(0), d.getLong(1), d.getLong(2)) === refDhash(t), s"dhash: ${t.take(40)}")
      val r = functions.ResizeStats.stats(u)
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === refResize(t), s"resize: ${t.take(40)}")
      val b = functions.BorderStats.stats(u)
      assert((b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3)) === refBorder(t),
        s"border: ${t.take(40)}")
      val a = functions.AudioFpStats.stats(u)
      assert((a.getLong(0), a.getLong(1), a.getLong(2)) === refAudioFp(t), s"audio: ${t.take(40)}")
    }
  }

  test("declared mm queries run green through the kernels (codegen path)") {
    // end-to-end through SQL registration + whole-stage codegen, not
    // just the static evals above
    val names = Seq("mm_sharpness", "mm_dhash", "mm_resize",
                    "mm_border_detect", "mm_audio_fingerprint")
    val nDocs = Tables.documents(spark, sf).count()
    for (n <- names) {
      val out = SparkEntry.queries(n)(spark, sf)
      assert(out.count() > 0, n)
      if (n != "mm_audio_fingerprint") // single-frame docs drop there
        assert(out.count() <= nDocs, n)
    }
  }

  test("graft_phash equals the exploded mean/bit aggregate on corpus and edges") {
    import org.apache.spark.sql.functions._
    functions.PhashVal.register(spark)
    import spark.implicits._
    val edges = Seq((9001L, "a"), (9002L, "ab"), (9003L, "zzz aa 😀 q"),
                    (9004L, "x" * 200)).toDF("doc_id", "text")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(edges).filter(length(col("text")) > 0)
    val byKernel = docs.select(col("doc_id"), expr("graft_phash(text)").as("h"))
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val px = docs
      .select(col("doc_id"),
              posexplode(expr("slice(split(text, ''), 1, 62)")).as(Seq("j", "ch")))
      .select(col("doc_id"), col("j"), ascii(col("ch")).as("p"))
    val stats = px.groupBy(col("doc_id").as("m_doc"))
      .agg(expr("CAST(SUM(p) AS BIGINT) div COUNT(1)").as("mean"))
    val byExplode = px.join(stats, col("doc_id") === col("m_doc"))
      .groupBy("doc_id")
      .agg(sum(when(col("p") > col("mean"), expr("shiftleft(CAST(1 AS BIGINT), j)"))
        .otherwise(0L)).as("h"))
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(byKernel === byExplode)
  }

  test("audio fingerprint drops single-frame docs like the exploded form") {
    import spark.implicits._
    val view = Seq((1L, "x" * 10), (2L, "x" * 17), (3L, ""))
      .toDF("doc_id", "text")
    view.createOrReplaceTempView("pk_docs")
    functions.PixelKernels.registerAll(spark)
    val out = spark.sql(
      """SELECT doc_id, st.n_frames FROM
        |  (SELECT doc_id, graft_audio_fp(text) AS st FROM pk_docs)
        |WHERE st.n_frames > 1""".stripMargin).collect()
    assert(out.map(_.getLong(0)).toSet === Set(2L))
  }
}
