package graft

/** mm_phash_pairs semantic gate against BRUTE FORCE: on the small
  * fixture every all-pairs Hamming distance is computable in the
  * driver, so the multi-index guarantee is checked directly —
  * pigeonhole recall (every pair within Hamming ≤3 MUST surface) and
  * precision (every reported pair is genuine and within the ≤8 ball).
  */
class PhashPairsSpec extends SparkSpec {

  /** The declared query's hash rule, recomputed sequentially: first
    * ≤62 chars as pixels, bit j set iff pixel j exceeds the integer
    * mean. */
  private def aHash(text: String): Long = {
    val px = text.take(62).map(_.toLong)
    val mean = px.sum / px.length
    px.zipWithIndex.foldLeft(0L) { case (h, (p, j)) =>
      if (p > mean) h | (1L << j) else h
    }
  }

  // sf0.01 (500 docs): big enough that Hamming<=3 pairs exist, small
  // enough that 125k brute-force distances are instant in the driver
  override def sf: String = "/root/testdata/sf0.01"

  test("pigeonhole recall at Hamming<=3 and precision at <=8 vs brute force") {
    val docs = Tables.documents(spark, sf).collect()
      .filter(_.getAs[String]("text").nonEmpty)
      .map(r => r.getAs[Long]("doc_id") -> aHash(r.getAs[String]("text")))
      .toMap
    val brute = (for {
      (da, ha) <- docs; (db, hb) <- docs if da < db
      d = java.lang.Long.bitCount(ha ^ hb)
    } yield (da, db) -> d).toMap

    val got = SparkEntry.queries("mm_phash_pairs")(spark, sf).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) -> r.getAs[Int]("hamming"))
      .toMap

    // precision: every reported pair is a real pair at its true distance
    got.foreach { case (k, d) =>
      assert(brute.contains(k) && brute(k) === d && d <= 8,
        s"pair $k reported at $d but brute force says ${brute.get(k)}")
    }
    // recall: the multi-index guarantee (any pair with <=3 differing
    // bits shares at least one intact 16-bit band); the [2,256] bucket
    // cap cannot drop such a pair here — 500 docs can't overfill a cap
    // larger than the corpus, and a shared band means the bucket is >=2
    val close = brute.filter(_._2 <= 3).keySet
    assert(close.nonEmpty, "fixture has no Hamming<=3 pairs — test is vacuous")
    val missed = close -- got.keySet
    assert(missed.isEmpty, s"pigeonhole recall violated for $missed")
  }
}
