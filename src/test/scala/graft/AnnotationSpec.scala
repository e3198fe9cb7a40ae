package graft

/** Annotation-aggregation invariants at sf0.001: driver-side replay of
  * the synthetic rater pool, the wisdom-of-crowds ordering, and both κ
  * statistics against textbook formulas in exact rational arithmetic. */
class AnnotationSpec extends SparkSpec {

  private def raters = Tables.documents(spark, sf)
    .select("doc_id", "source").collect()
    .map { r =>
      val id = r.getLong(0); val t = id % 2
      def v(p: Long, pct: Int) = if ((id * p) % 100 < pct) 1 - t else t
      (r.getString(1), t, v(7919L, 10), v(104729L, 20), v(1299709L, 30))
    }

  test("ta_label_vote: driver replay; majority beats the noisiest rater overall") {
    val rows = SparkEntry.queries("ta_label_vote")(spark, sf).collect()
    val bySrc = raters.groupBy(_._1)
    rows.foreach { r =>
      val xs = bySrc(r.getString(0))
      assert(r.getLong(1) === xs.length.toLong)
      assert(r.getLong(2) === xs.count { case (_, t, a, b, c) => (a + b + c >= 2) == (t == 1) || ((a + b + c < 2) && t == 0) }.toLong)
      assert(r.getLong(3) === xs.count { case (_, _, a, b, c) => a == b && b == c }.toLong)
      assert(r.getLong(4) === xs.count { case (_, t, a, _, _) => a == t }.toLong)
      assert(r.getLong(5) === xs.count { case (_, t, _, b, _) => b == t }.toLong)
      assert(r.getLong(6) === xs.count { case (_, t, _, _, c) => c == t }.toLong)
    }
    val mjTot = rows.map(_.getLong(2)).sum
    val r3Tot = rows.map(_.getLong(6)).sum
    assert(mjTot > r3Tot, "2-of-3 majority must beat the 30%-noise rater")
  }

  test("ta_labeler_kappa: exact Cohen formula; reliability orders the pairs") {
    val rows = SparkEntry.queries("ta_labeler_kappa")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def kappa(va: Seq[Int], vb: Seq[Int]): (Long, Long, Long) = {
      val n = va.length.toLong
      val agree = va.zip(vb).count { case (a, b) => a == b }.toLong
      val a1 = va.count(_ == 1).toLong; val b1 = vb.count(_ == 1).toLong
      val e = a1 * b1 + (n - a1) * (n - b1)
      (n, agree, 10000L * (n * agree - e) / (n * n - e))
    }
    val v1 = raters.map(_._3.toInt).toSeq
    val v2 = raters.map(_._4.toInt).toSeq
    val v3 = raters.map(_._5.toInt).toSeq
    assert(rows("r1_r2") === kappa(v1, v2))
    assert(rows("r1_r3") === kappa(v1, v3))
    assert(rows("r2_r3") === kappa(v2, v3))
    // the pair containing the noisiest rater agrees least after chance correction
    assert(rows("r1_r2")._3 > rows("r2_r3")._3)
  }

  test("ta_fleiss_kappa: matches the pooled-prevalence formula; bounded by 1") {
    val r = SparkEntry.queries("ta_fleiss_kappa")(spark, sf).collect()(0)
    val ks = raters.map { case (_, _, a, b, c) => (a + b + c).toLong }
    val n = ks.length.toLong
    val sk = ks.sum
    val pbarNum = ks.map(k => k * (k - 1) + (3 - k) * (2 - k)).sum
    val peNum = sk * sk + (3 * n - sk) * (3 * n - sk)
    assert(r.getLong(0) === n && r.getLong(1) === sk && r.getLong(2) === pbarNum)
    assert(r.getLong(3) === peNum)
    assert(r.getLong(4) === 10000L * (3 * n * pbarNum - 2 * peNum) / (2 * (9 * n * n - peNum)))
    assert(r.getLong(4) <= 10000L)
  }
}
