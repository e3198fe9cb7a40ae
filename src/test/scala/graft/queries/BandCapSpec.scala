package graft.queries

import org.apache.spark.sql.functions._

/** The enforced LSH band-bucket cap: a near-identical-content family
  * larger than BandCap must be EXCLUDED from candidate generation (its
  * pair fan-out is quadratic — the one way LSH degrades to all-pairs),
  * while normal buckets still produce their pairs. The family remains
  * visible to the band-stats surface as an over_cap bucket.
  */
class BandCapSpec extends graft.SparkSpec {

  test("over-cap band buckets are excluded from candidates but reported in stats") {
    import spark.implicits._
    val n = DedupQueries.BandCap.toInt + 1 // 10001: one over the cap
    val family = spark.range(n)
      .select(col("id").as("doc_id"), lit("aaa bbb ccc ddd eee").as("text"))
    val pair = Seq(
      (20001L, "xxx yyy zzz www vvv"),
      (20002L, "xxx yyy zzz www vvv")).toDF("doc_id", "text")
    val docs = family.unionByName(pair)

    val cands = DedupQueries.bandCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 10001-member family would contribute ~5·10⁷ pairs; the cap
    // drops it entirely, leaving exactly the 2-member bucket's pair
    assert(cands == Set((20001L, 20002L)))

    val sizes = DedupQueries.bandedDf(docs)
      .groupBy("bid", "bkey").agg(count(lit(1)).as("bucket_size"))
      .groupBy("bucket_size").agg(count(lit(1)).as("n_buckets"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each doc lands in 2 band buckets: family → two buckets of 10001,
    // the pair → two buckets of 2
    assert(sizes(n.toLong) == 2L)
    assert(sizes(2L) == 2L)
    assert(sizes.keys.count(_ > DedupQueries.BandCap) == 1)
  }
}
