package graft

import org.apache.spark.sql.functions._

/** Brute-force validation of the round-6 corpus-metric queries:
  * `ss_label_diversity` (sum-vector identity vs literal O(n²) pairwise
  * cosine), `ta_burstiness` (analytic zero-inclusive VMR vs a dense
  * materialized doc×token grid), and `ta_ngram_coverage` (distributed
  * gram pipeline vs an in-memory sliding-window census).
  */
class CorpusMetricsSpec extends SparkSpec {

  test("ss_label_diversity: identity matches literal pairwise cosine mean") {
    val rows = SparkEntry.queries("ss_label_diversity")(spark, sf).collect()
    val vecs = Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val label = r.getAs[Int]("label")
      val us = vecs(label).map(unit)
      val n = us.length
      assert(r.getAs[Long]("n_vecs") === n.toLong)
      var s = 0.0; var c = 0
      for (i <- 0 until n; j <- (i + 1) until n) {
        s += us(i).zip(us(j)).map { case (a, b) => a * b }.sum; c += 1
      }
      val brute = s / c
      val got = r.getAs[Double]("mean_pair_cos")
      // 1e-6 bound: the declared query quantizes cross-row sums to an
      // exact 1e-9 grid (see SimilarityQueries5 scaladoc), which shifts
      // the identity by ≤ ~128e-9/(n-1) vs this full-precision brute force
      assert(math.abs(got - brute) < 1e-6,
        s"label $label: identity $got vs brute $brute")
    }
  }

  test("ta_burstiness: VMR matches a dense zero-inclusive grid") {
    val rows = SparkEntry.queries("ta_burstiness")(spark, sf).collect()
    assert(rows.length === 20)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    val nDocs = docs.length
    rows.foreach { r =>
      val token = r.getAs[String]("token")
      val counts = docs.map(_._2.count(_ == token).toDouble)
      val mean = counts.sum / nDocs
      val varPop = counts.map(c => (c - mean) * (c - mean)).sum / nDocs
      val brute = varPop / mean
      val got = r.getAs[Double]("vmr")
      assert(math.abs(got - brute) < 1e-9, s"token $token: $got vs $brute")
      assert(r.getAs[Long]("n_docs") === nDocs.toLong)
      assert(r.getAs[Long]("df") === docs.count(_._2.contains(token)).toLong)
    }
    // bursty content repeats where present: max_c must reach the VMR's
    // implied concentration for at least one token (sanity, not oracle)
    assert(rows.exists(_.getAs[Long]("max_c") >= 2L))
  }

  test("ta_ngram_coverage: matches an in-memory sliding-window census") {
    val rows = SparkEntry.queries("ta_ngram_coverage")(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ")))
    assert(rows.length === docs.length)
    val grams: Map[Long, Set[String]] = docs.map { case (id, toks) =>
      id -> toks.sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
    }.toMap
    val df = grams.values.flatten.toSeq.groupBy(identity).view.mapValues(_.size).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val g = grams(id)
      val shared = g.count(df(_) >= 2)
      assert(r.getAs[Long]("n_grams") === g.size.toLong)
      assert(r.getAs[Long]("shared_grams") === shared.toLong)
      val bp = if (g.isEmpty) 0L else shared.toLong * 10000L / g.size
      assert(r.getAs[Long]("coverage_bp") === bp)
    }
  }
}
