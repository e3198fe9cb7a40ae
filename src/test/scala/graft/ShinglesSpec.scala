package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the round-10 shingle kernels (functions/Shingles.scala) against
  * reference folds of the HOF forms they replaced: token split on
  * single space KEEPING empties, positional n-gram join with ' ',
  * whole-doc vs empty fallback, first-occurrence array_distinct order,
  * and the h32 hash (first 8 md5 hex chars as unsigned) — the last
  * verified against Portable.h32's Spark expression so the md5
  * byte-slice shortcut is proven equal to md5(concat_ws(...)).
  */
class ShinglesSpec extends SparkSpec {

  private def refShingles(t: String, n: Int, mode: Int): Seq[String] = {
    val toks = t.split(" ", -1).toSeq
    if (toks.length < n) {
      if (mode >= 2) Seq.empty else Seq(t)
    } else {
      val all = (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
      if (mode == 1 || mode == 3) all.distinct else all
    }
  }

  private val edges = Seq(
    "", "a", " ", "  ", "a b", "a b c", "a b c d",
    "a  b c",          // empty middle token
    " a b c ",         // leading/trailing empties
    "x x x x x x x x", // all-duplicate shingles
    "ab😀 cd ef gh",   // multibyte codepoints inside tokens
    (1 to 80).map(i => s"t${i % 7}").mkString(" "))

  test("graft_shingles matches reference on corpus and edges, all modes") {
    val corpus = Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).toSeq
    for (t <- corpus ++ edges; n <- Seq(2, 3, 6, 8); mode <- 0 to 3) {
      val got = functions.Shingles.strings(UTF8String.fromString(t), n, mode)
        .array.map(_.asInstanceOf[UTF8String].toString).toSeq
      assert(got === refShingles(t, n, mode), s"n=$n mode=$mode text=${t.take(40)}")
    }
  }

  test("graft_shingle_h32 equals Portable.h32 over the string shingles") {
    import spark.implicits._
    functions.Shingles.register(spark)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .union(edges.zipWithIndex.map { case (t, i) => (100000L + i, t) }
        .toDF("doc_id", "text"))
    for (mode <- Seq(0, 2)) {
      val viaStrings = docs.select(col("doc_id"),
          explode(call_function("graft_shingles", col("text"), lit(3), lit(mode))).as("s"))
        .select(col("doc_id"), functions.Portable.h32(col("s")).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val viaKernel = docs.select(col("doc_id"),
          explode(call_function("graft_shingle_h32", col("text"), lit(3), lit(mode))).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(viaKernel === viaStrings, s"mode=$mode")
    }
  }

  test("graft_shingle_h32 distinct mode dedups on gram bytes, keeps order") {
    // two different grams could hash equal (not in this fixture, but the
    // contract is dedup-on-gram); verify the distinct hashed stream is
    // exactly the hash of the distinct string stream, in order
    for (t <- edges) {
      val strs = functions.Shingles.strings(UTF8String.fromString(t), 3, 1)
        .array.map(_.asInstanceOf[UTF8String].toString).toSeq
      val hs = functions.Shingles.h32s(UTF8String.fromString(t), 3, 1)
        .array.map(_.asInstanceOf[Long]).toSeq
      val md = java.security.MessageDigest.getInstance("MD5")
      val expect = strs.map { sh =>
        val d = md.digest(sh.getBytes("UTF-8"))
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }
      assert(hs === expect, t.take(40))
    }
  }

  test("graft_rolling_fp equals the interpreted aggregate fold") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(tok: String): Long = {
      val d = md.digest(tok.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val corpus = Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).toSeq
    for (t <- corpus ++ edges) {
      val want = t.split(" ", -1)
        .foldLeft(0L)((acc, tok) => (acc * 31 + h32(tok)) % 1000000007L)
      assert(functions.Shingles.rollingFp(UTF8String.fromString(t)) === want,
        t.take(40))
    }
  }

  test("graft_simhash equals the per-token h16 bit-vote fold") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h16(tok: String): Int = {
      val d = md.digest(tok.getBytes("UTF-8"))
      ((d(0) & 0xff) << 8) | (d(1) & 0xff)
    }
    val corpus = Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).toSeq
    for (t <- corpus ++ edges) {
      val hs = t.split(" ", -1).map(h16)
      val want = (0 until 16).map { b =>
        val vote = hs.map(h => if (((h >> b) & 1) == 1) 1 else -1).sum
        if (vote > 0) 1 << b else 0
      }.sum
      val st = functions.Shingles.simhash(UTF8String.fromString(t))
      assert((st.getInt(0), st.getInt(1)) === ((want, hs.length)), t.take(40))
    }
  }

  test("graft_cdc_chunks equals the HOF boundary chain") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(tok: String): Long = {
      val d = md.digest(tok.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    def h60(t: String): Long = {
      val d = md.digest(t.getBytes("UTF-8"))
      var v = 0L
      for (i <- 0 until 8) v = (v << 8) | (d(i) & 0xffL)
      v >>> 4
    }
    val corpus = Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).toSeq
    for (t <- corpus ++ edges) {
      val toks = t.split(" ", -1)
      val cuts = (1 to toks.length).filter(p => h32(toks(p - 1)) % 8 == 0)
      val starts = 1 +: cuts.map(_ + 1)
      val ends = cuts :+ toks.length
      val want = starts.zip(ends)
        .filter { case (st, en) => en - st + 1 > 0 }
        .map { case (st, en) =>
          (h60(toks.slice(st - 1, en).mkString(" ")), (en - st + 1).toLong) }
      val got = functions.Shingles.cdcChunks(UTF8String.fromString(t))
        .array.map { r =>
          val row = r.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
          (row.getLong(0), row.getLong(1))
        }.toSeq
      assert(got === want, t.take(40))
    }
  }

  test("graft_tile_md5 equals explode+substring+md5 distinct, codepoint-aligned") {
    import org.apache.spark.sql.functions._
    val corpus = Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).toSeq
    // reference: the declared SQL form (substring is CODEPOINT-based,
    // digests over the UTF-8 encoding, row-level distinct keeps first
    // occurrence order irrelevant — compare as sets per doc)
    for (t <- corpus ++ edges; w <- Seq(1, 3, 16)) {
      val cps = t.codePoints().toArray
      val nTiles = cps.length / w
      val want = (0 until nTiles).map { i =>
        val tile = new String(cps, i * w, w)
        java.security.MessageDigest.getInstance("MD5")
          .digest(tile.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }.distinct
      val got = functions.Shingles
        .tileMd5(org.apache.spark.unsafe.types.UTF8String.fromString(t), w)
        .array.map(_.toString).toSeq
      assert(got === want, s"w=$w ${t.take(40)}")
    }
    // and through the registered SQL function against the old plan form
    functions.Shingles.register(spark)
    val byKernel = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(call_function("graft_tile_md5", col("text"), lit(16))).as("th"))
      .orderBy("doc_id", "th").collect().toSeq.map(_.toSeq)
    val tileIdx = when(expr("length(text) div 16") > 0,
      expr("sequence(1, length(text) div 16)")).otherwise(array().cast("array<int>"))
    val byExplode = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), explode(tileIdx).as("i"))
      .select(col("doc_id"),
              md5(expr("encode(substring(text, CAST((i - 1) * 16 + 1 AS INT), 16), 'UTF-8')")).as("th"))
      .distinct()
      .orderBy("doc_id", "th").collect().toSeq.map(_.toSeq)
    assert(byKernel === byExplode)
  }

  test("graft_rep_stats equals the exploded count profile") {
    val corpus = Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).toSeq
    for (t <- corpus ++ edges) {
      val sh = refShingles(t, 3, 0)
      val counts = sh.groupBy(identity).map(_._2.size)
      val want = (sh.size.toLong, counts.size.toLong, counts.max.toLong)
      val st = functions.Shingles.repStats(UTF8String.fromString(t), 3)
      assert((st.getLong(0), st.getLong(1), st.getLong(2)) === want, t.take(40))
    }
  }
}
