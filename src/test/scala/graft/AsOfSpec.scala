package graft

import org.apache.spark.sql.functions._

/** Brute-force and cross-query invariants for the time-travel /
  * conversion-latency / keyword / pixel-profile batch.
  */
class AsOfSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("el_funnel_latency: histogram matches a driver-side replay of the log") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val lats = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val tv = views.min
        val ps = es.filter(e => e._2 == "purchase" && e._3 > tv).map(_._3)
        if (ps.isEmpty) None else Some(ps.min - tv)
      }
    }
    def bucket(latUs: Long): Long = {
      val lm = latUs / 60000000L
      if (lm < 1) 0L else if (lm < 5) 1L else if (lm < 15) 5L
      else if (lm < 60) 15L else if (lm < 240) 60L else 240L
    }
    val brute = lats.groupBy(bucket).map { case (b, ls) =>
      b -> (ls.size.toLong, ls.min, ls.max)
    }
    val out = run("el_funnel_latency").collect()
    assert(out.map(_.getAs[Long]("n_users")).sum == lats.size)
    out.foreach { r =>
      val (n, lo, hi) = brute(r.getAs[Long]("bucket_lo_min"))
      assert(r.getAs[Long]("n_users") == n)
      assert(r.getAs[Long]("min_lat_us") == lo)
      assert(r.getAs[Long]("max_lat_us") == hi)
    }
    assert(out.length == brute.size)
  }

  test("el_asof_snapshot: agrees with the el_scd2_intervals table at the cut") {
    val tcut = Tables.events(spark, sf)
      .agg(min(expr("unix_micros(ts)"))).collect()(0).getLong(0) + 1296000000000L
    val iv = SparkEntry.queries("el_scd2_intervals")(spark, sf).collect()
    val expect = iv.filter { r =>
      r.getAs[Long]("valid_from") <= tcut &&
      (r.getAs[Any]("valid_to") == null || r.getAs[Long]("valid_to") > tcut)
    }.map(r => r.getAs[Long]("user_id") ->
      (r.getAs[Int]("version"), r.getAs[String]("event_type"),
       r.getAs[Long]("valid_from"))).toMap
    val out = run("el_asof_snapshot").collect()
    assert(out.length == expect.size, "snapshot row count != intervals covering the cut")
    out.foreach { r =>
      val (v, t, from) = expect(r.getAs[Long]("user_id"))
      assert(r.getAs[Int]("version") == v)
      assert(r.getAs[String]("event_type") == t)
      assert(r.getAs[Long]("valid_from") == from)
      assert(r.getAs[Long]("held_us") == tcut - from)
    }
    // exactly one state per user active at the cut
    assert(out.map(_.getAs[Long]("user_id")).distinct.length == out.length)
  }

  test("ta_keywords_per_doc: per-doc top-3 matches a brute-force tf-idf") {
    val out = run("ta_keywords_per_doc").collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").filter(_.nonEmpty))
    val dfm = docs.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val nDocs = docs.count(_._2.nonEmpty).toLong
    docs.filter(_._2.nonEmpty).foreach { case (id, ts) =>
      val tf = ts.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      val scored = tf.toSeq.map { case (t, f) =>
        (t, f, dfm(t), f * (((nDocs - dfm(t)) * 10000L) / (dfm(t) + 1)))
      }.sortBy { case (t, _, _, s) => (-s, t) }.take(3)
      val got = out(id).sortBy(_.getAs[Int]("rank"))
      assert(got.length == scored.length, s"doc $id keyword count")
      got.zip(scored).foreach { case (row, (t, f, df, sc)) =>
        assert(row.getAs[String]("token") == t, s"doc $id token")
        assert(row.getAs[Long]("tf") == f)
        assert(row.getAs[Long]("df") == df)
        assert(row.getAs[Long]("score_s") == sc)
      }
    }
  }

  test("mm_pixel_hist: profile matches a byte-level brute force") {
    val out = run("mm_pixel_hist").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    Tables.documents(spark, sf).select("doc_id", "text").collect().foreach { dr =>
      val id = dr.getAs[Long]("doc_id")
      val px = dr.getAs[String]("text").take(256).map(_.toLong)
      if (px.nonEmpty) {
        val byBucket = px.groupBy(_ / 32).map { case (b, ps) => b -> ps.size.toLong }
        val modeCount = byBucket.values.max
        val r = out(id)
        assert(r.getAs[Long]("n_px") == px.size)
        assert(r.getAs[Long]("n_buckets") == byBucket.size)
        assert(r.getAs[Long]("mode_count") == modeCount)
        assert(r.getAs[Long]("mode_bucket") ==
          byBucket.filter(_._2 == modeCount).keys.min)
        assert(r.getAs[Long]("dynamic_range") == px.max - px.min)
      } else assert(!out.contains(id))
    }
  }
}
