package graft

/** ta_bpe_merges semantic gate: the distributed, window-based merge
  * (run-parity leftmost-greedy) must equal a plain sequential BPE
  * reference (Sennrich et al. 2016) executed word-by-word on the same
  * vocabulary — winners, tie-breaks, counts, all three rounds.
  */
class BpeSpec extends SparkSpec {

  test("ta_bpe_merges equals sequential reference BPE on the corpus vocab") {
    // reference: vocab → 3 sequential merge rounds
    val vocab = scala.collection.mutable.Map.empty[String, Long]
    Tables.documents(spark, sf).collect().foreach { r =>
      r.getAs[String]("text").split(" ").filter(_.nonEmpty)
        .foreach(w => vocab(w) = vocab.getOrElse(w, 0L) + 1)
    }
    var repr: Map[String, (Vector[String], Long)] =
      vocab.toMap.map { case (w, c) => w -> (w.split("").toVector, c) }
    val expect = (1 to 3).map { _ =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      repr.valuesIterator.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1)); pc(k) = pc.getOrElse(k, 0L) + c; i += 1
        }
      }
      val ((wl, wr), cnt) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      repr = repr.map { case (w, (syms, c)) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == wl && syms(i + 1) == wr) {
            out += wl + wr; i += 2
          } else { out += syms(i); i += 1 }
        }
        w -> (out.result(), c)
      }
      (wl, wr, cnt)
    }

    val got = SparkEntry.queries("ta_bpe_merges")(spark, sf).collect()
      .sortBy(_.getAs[Int]("merge_round"))
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
                 r.getAs[Long]("cnt")))
      .toSeq
    assert(got == expect, s"distributed merges $got != sequential reference $expect")

    // ENCODE side (ta_bpe_encode): per-document token counts under the
    // final vocabulary must equal the sequential reference applied
    // word-by-word — the vocab-join inference path introduces no drift.
    val symCount: Map[String, Int] = repr.map { case (w, (syms, _)) => w -> syms.length }
    val expectDocs = Tables.documents(spark, sf).collect().map { r =>
      val ws = r.getAs[String]("text").split(" ").filter(_.nonEmpty)
      (r.getAs[Long]("doc_id"), ws.length.toLong,
       ws.map(_.length.toLong).sum, ws.map(w => symCount(w).toLong).sum)
    }.sortBy(_._1).toSeq
    val gotDocs = SparkEntry.queries("ta_bpe_encode")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
                 r.getAs[Long]("n_base_symbols"), r.getAs[Long]("n_tokens")))
      .sortBy(_._1).toSeq
    assert(gotDocs == expectDocs,
      s"distributed encode diverges from sequential reference (first: " +
        s"${gotDocs.zip(expectDocs).find(p => p._1 != p._2)})")
  }
}
