package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.TopK

/** Property tests over the core invariants SURVEY.md §5 calls out:
  * offset density/ordering, top-k aggregator equivalence, portable-hash
  * ranges. Uses raw ScalaCheck generators with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache).
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
}
