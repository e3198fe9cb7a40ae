package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated inputs driven through Spark in bulk (one job per
  * property, not one per case — a Spark action per ScalaCheck case would
  * be minutes per property).
  *
  * Property 1 cross-implements the Portable hash family: the Catalyst
  * expression (md5 → substring → conv) must agree with a plain JVM
  * MessageDigest + BigInt parse on arbitrary strings — the DuckDB oracle
  * side is this same definition in SQL, so JVM≡Spark here is the leg of
  * the triangle the oracle gate can't see.
  *
  * Property 2 generalizes SessionWindowSpec: for arbitrary per-user gap
  * sequences — with exact-gap boundaries generated OFTEN (the case µs
  * corpus data never produces, which hid the round-5 oracle boundary
  * bug) — the native session_window session set must equal the
  * lag-islands session set per user.
  */
class PropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  test("Portable h60/h32/h16 match a JVM reference implementation on arbitrary strings") {
    import graft.functions.Portable._
    val gen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf('a', 'b', ' ', '|', '\t', 'µ', '中')).map(_.mkString))
    val strs = sample(gen, 300, 42L).distinct.filter(_.nonEmpty)

    def ref(s: String, hexChars: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(hexChars), 16)
    }

    import spark.implicits._
    val got = strs.toDF("s")
      .select(col("s"), h60(col("s")).as("h60"), h32(col("s")).as("h32"),
              h16(col("s")).as("h16"))
      .collect()
    got.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) === ref(s, 15), s"h60 mismatch for ${s.take(40)}")
      assert(r.getLong(2) === ref(s, 8),  s"h32 mismatch for ${s.take(40)}")
      assert(r.getInt(3).toLong === ref(s, 4), s"h16 mismatch for ${s.take(40)}")
    }
    assert(got.length >= 100) // the generator actually produced coverage
  }

  test("session_window ≡ lag-islands on generated gap sequences incl. exact boundaries") {
    val GapUs = 1800000000L
    // per-event gap generator: exact boundary with high probability, plus
    // under-gap, over-gap, zero, and off-by-one-µs cases
    val gapGen = Gen.frequency(
      3 -> Gen.const(GapUs),              // exactly the gap (merges)
      1 -> Gen.const(GapUs + 1L),         // one µs over (splits)
      1 -> Gen.const(GapUs - 1L),         // one µs under (merges)
      1 -> Gen.const(0L),                 // simultaneous
      3 -> Gen.chooseNum(1L, 4L * GapUs)) // arbitrary
    val userGen = Gen.chooseNum(2, 15).flatMap(n => Gen.listOfN(n, gapGen))
    val users = sample(userGen, 60, 7L)

    val t0 = 1700000000000000L // µs
    val rows = users.zipWithIndex.flatMap { case (gaps, u) =>
      gaps.scanLeft(t0)(_ + _).zipWithIndex.map { case (tus, i) =>
        (u.toLong * 1000 + i, tus * 1000L, u.toLong) // (event_id, ts_ns, user)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("propsess").toString
    spark.createDataFrame(rows).toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.parquet(s"$dir/events.parquet")

    val native  = SparkEntry.queries("el_session_window")(spark, dir)
      .select(col("user_id"), col("n_events"), col("start_us"))
    val islands = SparkEntry.queries("el_sessionize")(spark, dir)
      .select(col("user_id"), col("n_events"), col("start_us"))
    assert(native.exceptAll(islands).isEmpty && islands.exceptAll(native).isEmpty,
      "session_window and lag-islands disagree on a generated fixture")
    // the generator actually hit the boundary: some user merged an
    // exact-gap successor (session longer than one event with gap == Gap)
    assert(users.exists(_.contains(GapUs)))
  }
}
