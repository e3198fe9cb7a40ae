package graft

import org.apache.spark.sql.functions._

/** Invariants for the growth-analytics batch (GrowthQueries) and the
  * hybrid-retrieval / compressibility additions: each declared query is
  * checked against either a brute-force recompute on the sf0.001 corpus
  * or an exact self-consistency identity its own columns must satisfy.
  */
class GrowthSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("el_lifecycle: classes partition actives; totals match distinct users") {
    val rows = run("el_lifecycle").collect()
    // new + retained + resurrected partition the day's active set
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") ==
        r.getAs[Long]("n_new") + r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"),
        s"class partition broken on day ${r.getAs[Long]("day_idx")}")
    }
    // every user is new exactly once; churning marks every activity gap,
    // so across consecutive days: retained(d+1) = active(d) − churning(d)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum == users)
    rows.sortBy(_.getAs[Long]("day_idx")).sliding(2).foreach { case Array(a, b) =>
      if (b.getAs[Long]("day_idx") == a.getAs[Long]("day_idx") + 1)
        assert(b.getAs[Long]("n_retained") ==
          a.getAs[Long]("n_active") - a.getAs[Long]("n_churning"),
          s"retention/churn identity broken at day ${a.getAs[Long]("day_idx")}")
    }
    // brute force one middle day: recompute the four classes directly
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = ud.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted }
    val day = rows(rows.length / 2).getAs[Long]("day_idx")
    def cls(days: Array[Long]): Option[String] = {
      val i = days.indexOf(day)
      if (i < 0) None
      else if (i == 0) Some("new")
      else if (days(i - 1) == day - 1) Some("retained")
      else Some("resurrected")
    }
    val brute = byUser.values.flatMap(cls(_)).groupBy(x => x).view.mapValues(_.size).toMap
    val r = rows.find(_.getAs[Long]("day_idx") == day).get
    assert(r.getAs[Long]("n_new") == brute.getOrElse("new", 0))
    assert(r.getAs[Long]("n_retained") == brute.getOrElse("retained", 0))
    assert(r.getAs[Long]("n_resurrected") == brute.getOrElse("resurrected", 0))
  }

  test("el_seasonal_profile: grid covers the log; shares and deviations are exact") {
    val rows = run("el_seasonal_profile").collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total, "grid does not cover the log")
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val tt = rs.head.getAs[Long]("type_total")
      assert(rs.map(_.getAs[Long]("n")).sum == tt)
      rs.foreach { r =>
        assert(r.getAs[Long]("share_bp") == r.getAs[Long]("n") * 10000 / tt)
        assert(r.getAs[Long]("dev_bp") == r.getAs[Long]("n") * 24 * 10000 / tt - 10000)
      }
    }
  }

  test("el_pareto_share: CCDF is monotone and threshold 1 covers everything") {
    val rows = run("el_pareto_share").collect().sortBy(_.getAs[Long]("threshold"))
    val t1 = rows.head
    assert(t1.getAs[Long]("threshold") == 1L)
    assert(t1.getAs[Long]("users_share_bp") == 10000L, "threshold 1 must cover all users")
    assert(t1.getAs[Long]("events_share_bp") == 10000L)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_users_ge") >= b.getAs[Long]("n_users_ge"), "CCDF not monotone")
      assert(a.getAs[Long]("n_events_ge") >= b.getAs[Long]("n_events_ge"))
    }
    // brute-force one ladder rung against per-user counts
    val counts = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(_.getAs[Long]("count"))
    val mid = rows(rows.length / 2)
    val t = mid.getAs[Long]("threshold")
    assert(mid.getAs[Long]("n_users_ge") == counts.count(_ >= t))
    assert(mid.getAs[Long]("n_events_ge") == counts.filter(_ >= t).sum)
  }

  test("el_cuped: theta and adjusted means satisfy the CUPED identity") {
    val rows = run("el_cuped").collect()
    assert(rows.length == 2)
    val n  = rows.map(_.getAs[Long]("n_users")).sum
    val sx = rows.map(_.getAs[Long]("pre_cents")).sum
    val theta = rows.head.getAs[Double]("theta")
    assert(theta == rows(1).getAs[Double]("theta"), "theta must be pooled, not per-arm")
    rows.foreach { r =>
      val meanPost = r.getAs[Long]("post_cents").toDouble / r.getAs[Long]("n_users")
      assert(r.getAs[Double]("mean_post") == meanPost)
      val adj = meanPost - theta *
        (r.getAs[Long]("pre_cents").toDouble / r.getAs[Long]("n_users") - sx.toDouble / n)
      assert(math.abs(r.getAs[Double]("adj_mean_post") - adj) < 1e-9,
        s"CUPED identity broken for ${r.getAs[String]("variant")}")
    }
    // theta against a brute-force covariance over the per-user table
    val b = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"),
              col("event_type"), graft.functions.Portable.cents(col("value")).as("vc"))
    val day0 = b.agg(min(col("d"))).collect()(0).getLong(0)
    val pu = b.groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase" && col("d") < day0 + 15,
                    col("vc")).otherwise(0L)).as("x"),
           sum(when(col("event_type") === "purchase" && col("d") >= day0 + 15,
                    col("vc")).otherwise(0L)).as("y"))
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))
    val (nn, sxx, syy, sx2, sxy) = pu.foldLeft((0L, 0L, 0L, 0L, 0L)) {
      case ((c, a, bb, x2, xy), (x, y)) => (c + 1, a + x, bb + y, x2 + x * x, xy + x * y)
    }
    assert(syy == rows.map(_.getAs[Long]("post_cents")).sum)
    val bruteTheta = (nn * sxy - sxx * syy).toDouble / (nn * sx2 - sxx * sxx).toDouble
    assert(math.abs(theta - bruteTheta) < 1e-12)
  }

  test("el_bootstrap_ci: interval matches a driver-side hash-replay of all 32 replicates") {
    val r = run("el_bootstrap_ci").collect()(0)
    assert(r.getAs[Double]("boot_lo") <= r.getAs[Double]("boot_median") &&
           r.getAs[Double]("boot_median") <= r.getAs[Double]("boot_hi"))
    // brute force: same md5-based Poisson(1) inverse-CDF weights in the JVM
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val cuts = Array(1580030168L, 3160060337L, 3950075421L, 4213413783L,
                     4279248373L, 4292415291L, 4294609777L)
    def w(h: Long): Long = { val i = cuts.indexWhere(h < _); if (i < 0) 7L else i.toLong }
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), graft.functions.Portable.cents(col("value")).as("x"))
      .collect().map(row => (row.getAs[Long]("event_id"), row.getAs[Long]("x")))
    assert(r.getAs[Long]("n_purchases") == purchases.length)
    val means = (0 until 32).map { b =>
      var sw = 0L; var swx = 0L
      purchases.foreach { case (id, x) =>
        val wt = w(h32(s"boot|$b|$id")); sw += wt; swx += wt * x
      }
      if (sw == 0) 0.0 else swx.toDouble / sw.toDouble
    }.sorted
    assert(r.getAs[Double]("boot_lo") == means(1))
    assert(r.getAs[Double]("boot_hi") == means(30))
    assert(r.getAs[Double]("boot_median") == (means(15) + means(16)) / 2)
    assert(r.getAs[Double]("point_mean_cents") ==
      purchases.map(_._2).sum.toDouble / purchases.length)
    // the interval should bracket the point estimate on a healthy sample
    assert(r.getAs[Double]("boot_lo") <= r.getAs[Double]("point_mean_cents") &&
           r.getAs[Double]("point_mean_cents") <= r.getAs[Double]("boot_hi"))
  }

  test("el_survival: ladder matches per-user lifetimes; censoring counted") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("user_id").agg(min(col("d")).as("fd"), max(col("d")).as("ld"))
      .collect().map(r => (r.getAs[Long]("fd"), r.getAs[Long]("ld")))
    val maxDay = ud.map(_._2).max
    val rows = run("el_survival").collect().sortBy(_.getAs[Long]("min_lifetime_days"))
    assert(rows.head.getAs[Long]("min_lifetime_days") == 0L)
    assert(rows.head.getAs[Long]("n_surviving") == ud.length)
    assert(rows.head.getAs[Long]("surviving_bp") == 10000L)
    rows.foreach { r =>
      val t = r.getAs[Long]("min_lifetime_days")
      val surv = ud.filter { case (f, l) => l - f >= t }
      assert(r.getAs[Long]("n_surviving") == surv.length)
      assert(r.getAs[Long]("n_censored") == surv.count(_._2 == maxDay))
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_surviving") <= a.getAs[Long]("n_surviving"),
        "survival CCDF not monotone")
    }
  }

  test("el_stickiness: trailing-7-day WAU matches a direct window recompute") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = run("el_stickiness").collect()
    rows.foreach { r =>
      val d = r.getAs[Long]("day_idx")
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.filter(x => x._2 >= d - 6 && x._2 <= d).map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("dau") == dau, s"dau at $d")
      assert(r.getAs[Long]("wau") == wau, s"wau at $d")
      assert(r.getAs[Long]("stickiness_bp") == dau * 10000 / wau)
      assert(dau <= wau)
    }
    // one row per active day
    assert(rows.map(_.getAs[Long]("day_idx")).toSet == ud.map(_._2).toSet)
  }

  test("ta_vocab_growth: prefix vocabularies match; curve is monotone to the full vocab") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").filter(_.nonEmpty).toSet)
    val rows = run("ta_vocab_growth").collect().sortBy(_.getAs[Long]("n_docs_prefix"))
    val total = docs.flatMap(_._2).distinct.length.toLong
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs_prefix")
      val brute = docs.filter(_._1 < n).flatMap(_._2).distinct.length.toLong
      assert(r.getAs[Long]("vocab_size") == brute, s"prefix $n")
      assert(r.getAs[Long]("vocab_total") == total)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("vocab_size") <= b.getAs[Long]("vocab_size"))
    }
    assert(rows.last.getAs[Long]("vocab_size") == total,
      "largest rung must reach the full vocabulary on the test corpus")
  }

  test("ta_compressibility: per-source ratios match a brute-force recompute") {
    val out = run("ta_compressibility").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("total_bigrams"), r.getAs[Long]("distinct_bigrams"),
         r.getAs[Long]("distinct_bp"))).toMap
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
    val brute = docs.groupBy(_.getAs[String]("source")).map { case (src, rs) =>
      val perDoc = rs.map(_.getAs[String]("text").split(" ", -1))
        .filter(_.length >= 2) // match the query's size(toks) >= 2 guard:
        // sliding(2) on a 1-token doc emits a partial window (a phantom bigram)
        .map { toks =>
          val bi = toks.sliding(2).map(_.mkString(" ")).toSeq
          (bi.size.toLong, bi.distinct.size.toLong)
        }
      src -> (perDoc.map(_._1).sum, perDoc.map(_._2).sum)
    }
    brute.foreach { case (src, (nb, ndis)) =>
      val (onb, ond, obp) = out(src)
      assert(onb == nb, s"$src total bigrams")
      assert(ond == ndis, s"$src distinct bigrams")
      assert(obp == ndis * 10000 / nb, s"$src ratio")
    }
  }

  test("ss_hybrid_rrf: fused scores recompute from ranks; dense arm agrees with ss_cosine_topk") {
    val fused = run("ss_hybrid_rrf").collect()
    assert(fused.length == 10)
    fused.foreach { r =>
      val rl = Option(r.getAs[Any]("r_lex")).map(_.asInstanceOf[Long])
      val rd = Option(r.getAs[Any]("r_den")).map(_.asInstanceOf[Long])
      assert(rl.isDefined || rd.isDefined, "a fused doc must appear in some arm")
      val expect = rl.map(v => 1000000L / (60 + v)).getOrElse(0L) +
                   rd.map(v => 1000000L / (60 + v)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_s") == expect)
    }
    // the dense arm's head must agree with ss_cosine_topk's qid=0 list
    val topk = SparkEntry.queries("ss_cosine_topk")(spark, sf).collect()
      .filter(_.getAs[Long]("qid") == 0L)
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq
    val densHead = fused.flatMap { r =>
      Option(r.getAs[Any]("r_den")).map(v =>
        (v.asInstanceOf[Long], r.getAs[Long]("doc_id")))
    }.filter(_._1 <= 5)
    assert(densHead.nonEmpty, "no dense-arm head docs reached the fused top 10")
    densHead.foreach { case (rank, docId) =>
      assert(topk(rank.toInt - 1) == docId,
        s"dense rank $rank disagrees with ss_cosine_topk: $docId vs ${topk(rank.toInt - 1)}")
    }
  }
}
