package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.TopK

/** Property tests over the core invariants SURVEY.md §5 calls out:
  * offset density/ordering, top-k aggregator equivalence, portable-hash
  * ranges and cross-implementation agreement, session-boundary
  * equivalence. Uses raw ScalaCheck generators with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache), driven
  * through Spark in bulk — one job per property, not one per case.
  */
class PropertySpec extends SparkSpec {

  private val rows: Gen[List[(Long, Long, Double)]] = Gen.listOfN(60,
    for {
      id <- Gen.choose(0L, 10000L)
      ts <- Gen.choose(0L, 1000000L)
      v  <- Gen.choose(-1000, 1000)
    } yield (id, ts, v.toDouble))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("Topic.publish assigns dense offsets in (ts, event_id) order for arbitrary batches") {
    import spark.implicits._
    samples(rows, 4).foreach { data =>
      val distinct = data.distinctBy(r => (r._2, r._1))
      val dir = java.nio.file.Files.createTempDirectory("prop").toString + "/t"
      val df = distinct.toDF("event_id", "tsl", "value")
        .withColumn("ts", timestamp_micros(col("tsl"))).drop("tsl")
      Topic.publish(df, dir)
      val log = spark.read.parquet(dir)
        .select("offset", "ts", "event_id").orderBy("offset").collect()
      // dense 0..n-1
      assert(log.map(_.getLong(0)).toSeq === (0L until distinct.size.toLong))
      // offset order == (ts, event_id) order
      val expected = distinct.map(r => (r._2, r._1)).sorted.map(_._2)
      assert(log.map(_.getLong(2)).toSeq === expected)
    }
  }

  test("Topic.mirror converges to offset-identity under arbitrary publish splits") {
    import spark.implicits._
    // arbitrary batch boundaries: the mirror must converge to the same
    // (offset, event_id) ledger no matter how publishes interleave with
    // mirror passes, and every pass must copy exactly the delta
    val splits: Gen[List[Int]] =
      Gen.listOfN(3, Gen.choose(1, 20)) // batch sizes
    samples(rows, 2).zip(samples(splits, 2)).foreach { case (data, sizes) =>
      val distinct = data.distinctBy(r => (r._2, r._1))
      val base = java.nio.file.Files.createTempDirectory("prop-mirror").toString
      val src = s"$base/src"; val mir = s"$base/mir"
      var rest = distinct
      var copied = 0L
      sizes.foreach { sz =>
        val (batch, tail) = rest.splitAt(math.min(sz, rest.size))
        rest = tail
        if (batch.nonEmpty) {
          val df = batch.toDF("event_id", "tsl", "value")
            .withColumn("ts", timestamp_micros(col("tsl"))).drop("tsl")
          Topic.publish(df, src)
          val r = Topic.mirror(spark, src, mir)
          assert(r.rowsCopied === batch.size.toLong) // exactly the delta
          copied += r.rowsCopied
        }
      }
      assert(Topic.mirror(spark, src, mir).rowsCopied === 0L) // fixpoint
      val a = spark.read.parquet(src).select("offset", "event_id")
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val b = spark.read.parquet(mir).select("offset", "event_id")
        .orderBy("offset").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(a === b)
      assert(copied === a.size.toLong)
      val f = Topic.fsck(spark, mir)
      assert(f.ok && f.gaps === 0L && f.rows === a.size.toLong)
    }
  }

  test("TopK aggregator equals sort-and-take for arbitrary groups") {
    import spark.implicits._
    samples(rows, 4).foreach { data =>
      val ds = data.map { case (id, ts, v) => (id % 5, v, id) }
        .distinctBy(t => (t._1, t._3)).toDS()
      val got = ds.groupByKey(_._1).agg(new TopK(3).toColumn.name("top"))
        .collect().toMap
      val want = ds.collect().toSeq.groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(t => (t._2, t._3))
          .sortBy { case (score, id) => (-score, id) }.take(3)
      }
      assert(got.view.mapValues(_.toSeq).toMap === want)
    }
  }

  test("graft_window_min equals a reference sliding-min for arbitrary arrays") {
    import spark.implicits._
    graft.functions.WindowMin.register(spark)
    val arrays: Gen[List[List[Long]]] = Gen.listOfN(40,
      Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.choose(Long.MinValue / 2, Long.MaxValue / 2))))
    for (w <- Seq(1, 2, 4, 7); data <- samples(arrays, 2)) {
      val got = data.toDF("hs")
        .select(call_function("graft_window_min", col("hs"), lit(w)).as("m"))
        .collect().map(_.getSeq[Long](0).toList).toList
      val want = data.map(a => if (a.size < w) Nil else a.sliding(w).map(_.min).toList)
      assert(got === want, s"w=$w")
    }
  }

  test("portable hashes stay in range") {
    import spark.implicits._
    samples(Gen.listOfN(30, Gen.alphaNumStr), 4).foreach { words =>
      val df = words.toDF("w").select(
        graft.functions.Portable.h16(col("w")).as("h16"),
        graft.functions.Portable.h32(col("w")).as("h32"),
        graft.functions.Portable.h60(col("w")).as("h60"))
      val r = df.agg(min("h16"), max("h16"), min("h32"), max("h32"),
                     min("h60"), max("h60")).head()
      assert(r.getInt(0) >= 0 && r.getInt(1) < (1 << 16))
      assert(r.getLong(2) >= 0L && r.getLong(3) < (1L << 32))
      assert(r.getLong(4) >= 0L && r.getLong(5) < (1L << 60))
    }
  }

  /** The Catalyst expression (md5 → substring → conv) must agree with a
    * plain JVM MessageDigest + parse on arbitrary strings — the DuckDB
    * oracle side is this same definition in SQL, so JVM≡Spark here is
    * the leg of the triangle the oracle gate can't see. */
  test("Portable h60/h32/h16 match a JVM reference implementation on arbitrary strings") {
    import graft.functions.Portable._
    val gen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf('a', 'b', ' ', '|', '\t', 'µ', '中')).map(_.mkString))
    val strs = samples(gen, 300).distinct.filter(_.nonEmpty)

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

  /** Generalizes SessionWindowSpec: for arbitrary per-user gap sequences
    * — with exact-gap boundaries generated OFTEN (the case µs corpus data
    * never produces, which hid the round-5 oracle boundary bug) — the
    * native session_window session set must equal the lag-islands set. */
  test("session_window ≡ lag-islands on generated gap sequences incl. exact boundaries") {
    val GapUs = 1800000000L
    val gapGen = Gen.frequency(
      3 -> Gen.const(GapUs),              // exactly the gap (merges)
      1 -> Gen.const(GapUs + 1L),         // one µs over (splits)
      1 -> Gen.const(GapUs - 1L),         // one µs under (merges)
      1 -> Gen.const(0L),                 // simultaneous
      3 -> Gen.chooseNum(1L, 4L * GapUs)) // arbitrary
    val userGen = Gen.chooseNum(2, 15).flatMap(n => Gen.listOfN(n, gapGen))
    val users = samples(Gen.listOfN(60, userGen), 1).flatten

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
    // the generator actually hit the boundary
    assert(users.exists(_.contains(GapUs)))
  }
}
