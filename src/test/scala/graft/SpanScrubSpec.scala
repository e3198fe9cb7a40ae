package graft

/** dd_span_scrub semantic gate: the window-based gaps-and-islands
  * interval union is recomputed in the driver with a plain sorted fold
  * over dd_dup_spans' own output, and the token counts are checked
  * against the actual text — different machinery for every derived
  * column, so a window-frame or merge-convention bug cannot pass.
  */
class SpanScrubSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  test("scrub accounting equals a driver-side interval union of the detected spans") {
    val spans = SparkEntry.queries("dd_dup_spans")(spark, d).collect()
      .map(r => (r.getAs[Long]("db"), r.getAs[Long]("start_b"), r.getAs[Long]("span_len")))
    assert(spans.nonEmpty, "fixture has no dup spans — test is vacuous")

    // driver-side union, same merge convention (merge only on overlap:
    // a new island starts when s >= running max end)
    val expected = spans.groupBy(_._1).map { case (doc, ss) =>
      val merged = ss.map(s => (s._2, s._2 + s._3)).sorted
        .foldLeft(List.empty[(Long, Long)]) {
          case ((ps, pe) :: tail, (s0, e0)) if s0 < pe =>
            (ps, math.max(pe, e0)) :: tail
          case (acc, iv) => iv :: acc
        }
      doc -> (merged.size.toLong, merged.map { case (a, b) => b - a }.sum)
    }

    val toks = Tables.documents(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").length.toLong).toMap

    val got = SparkEntry.queries("dd_span_scrub")(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("tokens_removed"),
         r.getAs[Long]("n_tokens"), r.getAs[Long]("tokens_kept"))).toMap

    assert(got.keySet === expected.keySet,
      "scrubbed docs must be exactly the span-pair larger sides")
    got.foreach { case (doc, (nSpans, removed, nTokens, kept)) =>
      val (eSpans, eRemoved) = expected(doc)
      assert(nSpans === eSpans, s"doc $doc island count")
      assert(removed === eRemoved, s"doc $doc union length")
      assert(nTokens === toks(doc), s"doc $doc token count vs real text")
      assert(kept === nTokens - removed, s"doc $doc kept accounting")
      assert(removed > 0 && kept >= 0, s"doc $doc bounds")
    }
  }
}
