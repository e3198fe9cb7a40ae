package graft

/** ANN quality gates: the IVF index (refined centroids, nprobe=2) must
  * recover a meaningful share of the TRUE nearest neighbors — computed
  * here by exact brute force, the same semantics as ss_cosine_topk.
  * The corpus embeddings are random (no cluster structure), so recall is
  * bounded by the probed share of the corpus plus the direction
  * correlation the quantizer captures; the floor asserted here is well
  * above the ~2/k share a random probe of two cells would recover.
  */
class SimilaritySpec extends SparkSpec {

  test("ss_ivf_ann probe-2 recall vs exact top-3 neighbors") {
    val ann = SparkEntry.queries("ss_ivf_ann")(spark, sf)
      .collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet }

    // exact top-3 by cosine for the same query ids, brute force
    val vecs = Tables.embeddings(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
      .toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val qids = (8L until 18L).toSeq
    val exact = qids.map { q =>
      val qv = vecs(q)
      q -> vecs.view.filterKeys(_ != q).toSeq
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(3).map(_._1).toSet
    }.toMap

    assert(ann.keySet == qids.toSet, s"missing query ids: ${qids.toSet -- ann.keySet}")
    val recall = qids.map(q => (ann(q) & exact(q)).size.toDouble / 3).sum / qids.size
    // nprobe=2 of 8 cells scans ~25% of a structureless corpus; the
    // centroid correlation must lift recall clearly above that floor
    assert(recall >= 0.3, s"probe-2 recall $recall below floor")
  }
}
