package graft

import java.nio.file.Files

/** dd_dup_spans semantic gate on a CONSTRUCTED corpus: a known shared
  * token run must come back as exactly one maximal span with the right
  * offsets in both documents, and the df∈[2,3] rarity cap must drop a
  * span shared by four docs (the stated popular-family tradeoff).
  */
class DupSpansSpec extends SparkSpec {

  private def corpus(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("dupspans").toString
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'src0' AS source",
                  "CAST(length(text) AS BIGINT) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def spans(dir: String) =
    SparkEntry.queries("dd_dup_spans")(spark, dir).collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db"),
                 r.getAs[Long]("start_a"), r.getAs[Long]("start_b"),
                 r.getAs[Long]("span_len"))).toSeq

  // distinct filler tokens so no accidental 8-gram repeats across docs
  private def filler(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("a shared 15-token run surfaces as one maximal span at the right offsets") {
    val shared = (0 until 15).map(i => s"dup$i").mkString(" ")
    // doc 0: 5 filler + shared (span starts at token 5)
    // doc 1: 9 filler + shared (span starts at token 9)
    val dir = corpus(Seq(
      0L -> (filler("a", 5) + " " + shared + " " + filler("z", 6)),
      1L -> (filler("b", 9) + " " + shared),
      2L -> filler("c", 30)))
    assert(spans(dir) === Seq((0L, 1L, 5L, 9L, 15L)))
  }

  test("a run shared by 4 docs falls outside the rarity cap; by 3 stays in") {
    val shared = (0 until 12).map(i => s"com$i").mkString(" ")
    def doc(id: Long, tag: String) = id -> (filler(tag, 3) + " " + shared)
    val four  = corpus(Seq(doc(0, "a"), doc(1, "b"), doc(2, "c"), doc(3, "d")))
    assert(spans(four).isEmpty, "df=4 grams must be dropped by the cap")
    val three = corpus(Seq(doc(0, "a"), doc(1, "b"), doc(2, "c")))
    // 3 docs sharing the run → all 3 pairs report the span
    assert(spans(three).map(t => (t._1, t._2)).sorted ===
      Seq((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(spans(three).forall(t => t._5 === 12L))
  }

  test("runs below the 10-token minimum are suppressed") {
    val short = (0 until 9).map(i => s"sh$i").mkString(" ")
    val dir = corpus(Seq(
      0L -> (filler("a", 4) + " " + short),
      1L -> (filler("b", 4) + " " + short)))
    assert(spans(dir).isEmpty, "9-token shared run is under the span floor")
  }
}
