package graft

/** ANN quality gates: the IVF index (refined centroids) must recover a
  * meaningful share of the TRUE nearest neighbors — computed here by
  * exact brute force, the same semantics as ss_cosine_topk — at BOTH
  * declared configs (k=8/nprobe=2 and k=16/nprobe=3). The corpus
  * embeddings are random (no cluster structure), so recall is bounded by
  * the probed share of the corpus plus the direction correlation the
  * quantizer captures; the floors asserted here are well above the
  * ~nprobe/k share a random probe would recover.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val vecs = Tables.embeddings(spark, sf)
    .collect()
    .map(r => r.getAs[Long]("vec_id") ->
      r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    .toMap

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Mean top-3 recall of the named ANN query vs exact brute force. */
  private def recallOf(queryName: String, qids: Seq[Long]): Double = {
    val ann = SparkEntry.queries(queryName)(spark, sf)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet }
    assert(ann.keySet == qids.toSet, s"missing query ids: ${qids.toSet -- ann.keySet}")
    val exact = qids.map { q =>
      val qv = vecs(q)
      q -> vecs.view.filterKeys(_ != q).toSeq
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(3).map(_._1).toSet
    }.toMap
    qids.map(q => (ann(q) & exact(q)).size.toDouble / 3).sum / qids.size
  }

  test("ss_ivf_ann probe-2 of 8 cells recall vs exact top-3") {
    // nprobe=2 of 8 cells scans ~25% of a structureless corpus; the
    // centroid correlation must lift recall clearly above that floor
    val r = recallOf("ss_ivf_ann", 8L until 18L)
    assert(r >= 0.3, s"k=8/probe-2 recall $r below floor")
  }

  test("ss_ivf_ann_k16 probe-3 of 16 cells recall vs exact top-3") {
    // nprobe=3 of 16 cells scans ~19% of the corpus — smaller share,
    // finer cells; the floor sits above the random-probe baseline
    val r = recallOf("ss_ivf_ann_k16", 16L until 26L)
    assert(r >= 0.25, s"k=16/probe-3 recall $r below floor")
  }
}
