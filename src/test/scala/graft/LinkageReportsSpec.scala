package graft

import org.apache.spark.sql.functions._

/** The three round-6 linkage/curation reports: blocked ER on parts, the
  * cross-source near-dup matrix, and the per-label embedding drop list —
  * each pinned against a brute-force recompute at sf0.001. */
class LinkageReportsSpec extends SparkSpec {

  test("q59_similar_parts: pair counts match brute-force within-block enumeration") {
    val got = SparkEntry.queries("q59_similar_parts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"),
              split(col("p_name"), " ").getItem(1).as("noun"),
              functions.Portable.cents(col("p_retailprice")).as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3),
                 r.getString(4), r.getLong(5)))

    val byBlock = parts.groupBy(p => (p._5, p._3, p._4))
    val capped = byBlock.filter(_._2.length > 100).keySet
    val brutePairs = byBlock.filter(_._2.length <= 100).toSeq.flatMap { case (_, psArr) =>
      val ps = psArr.toSeq
      for {
        a <- ps; b <- ps
        if a._2 < b._2 || (a._2 == b._2 && a._1 < b._1) // canonical order
        if a._2 != b._2                                  // different brand
      } yield ((a._5, a._3), math.abs(a._6 - b._6))
    }
    val bruteByGroup = brutePairs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    got.foreach { case ((noun, typ), (nBlocks, nCapped, nPairs)) =>
      val blockSizes = byBlock.keys.filter(k => k._1 == noun && k._2 == typ)
      assert(nBlocks === blockSizes.size.toLong, s"blocks for ($noun,$typ)")
      assert(nCapped === capped.count(k => k._1 == noun && k._2 == typ).toLong)
      assert(nPairs === bruteByGroup.getOrElse((noun, typ), Seq.empty).size.toLong,
        s"pairs for ($noun,$typ)")
    }
    // total accounting: every brute pair is claimed by exactly one group
    assert(got.values.map(_._3).sum === brutePairs.size.toLong)
  }

  test("dd_cross_source_dup: the matrix is exactly the >= 0.5 slice of verified pairs") {
    val matrix = SparkEntry.queries("dd_cross_source_dup")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    // independent route: the declared verified-jaccard pairs + source dim
    val src = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val verified = SparkEntry.queries("dd_ngram_jaccard")(spark, sf).collect()
      .filter(_.getDouble(2) >= 0.5)
      .map { r =>
        val sa: String = src(r.getLong(0))
        val sb: String = src(r.getLong(1))
        if (sa <= sb) (sa, sb) else (sb, sa)
      }
    val want = verified.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(matrix === want)
    // ordering invariant: source_a <= source_b on every row
    matrix.keys.foreach { case (a, b) => assert(a <= b) }
  }

  test("ss_outlier_docs: bottom-3 per label matches a brute recompute") {
    val got = SparkEntry.queries("ss_outlier_docs")(spark, sf).collect()

    val e = Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byLabel = e.groupBy(_._3)
    got.groupBy(_.getInt(0)).foreach { case (label, rows) =>
      val members = byLabel(label)
      val ref = members.minBy(_._1)
      val scored = members.filter(_._1 != ref._1)
        .map(m => (m._1, cos(m._2, ref._2)))
        .sortBy(m => (m._2, m._1))
      val want = scored.take(3).map(_._1).toSeq
      assert(rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq === want, s"label $label")
      // margin is vs the label mean and non-negative only below the mean;
      // the bottom-3 must sit at or below every other member's cosine
      val worstKept = scored.drop(3).headOption.map(_._2)
      worstKept.foreach { w =>
        rows.foreach(r => assert(r.getDouble(3) <= w + 1e-12))
      }
    }
  }
}
