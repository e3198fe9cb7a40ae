package graft

/** Brute-force validation of `dd_simhash_pairs`: recompute the 60-bit
  * SimHash, the 4×15-bit banding, and the bucket cap in plain Scala and
  * compare the reported pair set exactly. Also asserts the Manku
  * pigeonhole property on this corpus: every Hamming-≤3 pair agrees on
  * at least one full band, so the band join loses pairs ONLY to the
  * bucket cap, never to the banding itself.
  */
class SimhashPairsSpec extends SparkSpec {

  private val Cap = 50

  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def simhash(tokens: Array[String]): Long = {
    val hs = tokens.map(h60)
    (0 until 60).map { b =>
      val vote = hs.map(h => if (((h >> b) & 1L) == 1L) 1L else -1L).sum
      if (vote > 0) 1L << b else 0L
    }.sum
  }

  test("dd_simhash_pairs matches a brute-force banded search") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), simhash(r.getString(1).split(" "))))
    val bands = for ((id, sh) <- docs; b <- 0 until 4)
      yield (b, (sh >> (15 * b)) & 32767L, id, sh)
    val bucketSize = bands.groupBy(t => (t._1, t._2)).view.mapValues(_.length).toMap
    val keep = bands.filter(t => bucketSize((t._1, t._2)) <= Cap)
    val expected = keep.groupBy(t => (t._1, t._2)).values.toSeq.flatMap { arr =>
      val m = arr.toSeq
      for {
        a <- m; b <- m
        if a._3 < b._3 && java.lang.Long.bitCount(a._4 ^ b._4) <= 3
      } yield (a._3, b._3, java.lang.Long.bitCount(a._4 ^ b._4))
    }.toSet

    val got = SparkEntry.queries("dd_simhash_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)

    // pigeonhole: every ≤3 pair in the whole corpus shares a full band
    val sigs = docs.toMap
    for {
      (ida, sa) <- docs; (idb, sb) <- docs
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= 3
    } {
      val shares = (0 until 4).exists(b =>
        ((sa >> (15 * b)) & 32767L) == ((sb >> (15 * b)) & 32767L))
      assert(shares, s"pair ($ida,$idb) within Hamming 3 shares no band")
    }
    assert(sigs.size === docs.length)
  }
}
