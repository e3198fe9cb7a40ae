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

  test("ss_pq_ann ADC recall beats chance by an order of magnitude; codes reconstruct") {
    // PQ on STRUCTURELESS random embeddings keeps little direction
    // signal (8 blocks × 16 centroids), so the honest gate is a
    // chance-multiple, not an absolute: top-3 by ADC must land ≥10×
    // random selection (measured ~20× at this fixture).
    import org.apache.spark.sql.functions._
    val qids = (16L until 26L).toSeq
    val ann = SparkEntry.queries("ss_pq_ann")(spark, sf)
      .collect().groupBy(_.getAs[Long]("qid"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet }
    assert(ann.keySet == qids.toSet)
    // exact squared-L2 top-3 (same metric ADC approximates)
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      s
    }
    val exact = qids.map { q =>
      val qv = vecs(q)
      q -> vecs.view.filterKeys(_ != q).toSeq
        .map { case (id, v) => (id, l2(qv, v)) }
        .sortBy { case (id, dd) => (dd, id) }
        .take(3).map(_._1).toSet
    }.toMap
    val recall = qids.map(q => (ann(q) & exact(q)).size.toDouble / 3).sum / qids.size
    val chance = 3.0 / (vecs.size - 1)
    assert(recall >= 10 * chance, s"ADC recall $recall below 10× chance ($chance)")

    // reconstruction sanity: quantizing to the trained codebook must
    // beat the zero-vector quantizer (mean squared component value)
    val rows = SparkEntry.queries("ss_pq_codes")(spark, sf).collect()
    val meanMse = rows.map(_.getAs[Double]("recon_mse")).sum / rows.length
    val zeroMse = vecs.values.map(v => v.map(x => x.toDouble * x).sum / 64).sum / vecs.size
    assert(meanMse > 0 && meanMse < zeroMse,
      s"recon_mse $meanMse not inside (0, zero-baseline $zeroMse)")
    // every code addresses a real centroid
    for (b <- 0 until 8; r <- rows) {
      val c = r.getAs[Int](s"code$b")
      assert(c >= 0 && c < 16, s"code$b=$c out of range")
    }
  }

  test("ss_ann_recall reports exactly the recall the brute-force gate computes") {
    val qids = (8L until 18L).toSeq
    val rows = SparkEntry.queries("ss_ann_recall")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("qid")).toSet == qids.toSet)
    val reported = rows.map(r => r.getAs[Long]("qid") -> r.getAs[Int]("n_hits")).toMap
    val ann = SparkEntry.queries("ss_ivf_ann")(spark, sf).collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    qids.foreach { q =>
      val qv = vecs(q)
      val exact = vecs.view.filterKeys(_ != q).toSeq
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(3).map(_._1).toSet
      assert(reported(q) == (ann(q) & exact).size,
        s"qid $q: reported ${reported(q)} hits != recomputed ${(ann(q) & exact).size}")
    }
    // the ratio column is hits/3 and the mean sits above the suite's floor
    rows.foreach(r => assert(
      r.getAs[Double]("recall_at_3") == r.getAs[Int]("n_hits") / 3.0))
    val mean = rows.map(_.getAs[Double]("recall_at_3")).sum / rows.length
    assert(mean >= 0.3, s"mean recall $mean below the ss_ivf_ann floor")
  }

  test("ss_rp_project: JL sign projection preserves norms in expectation") {
    val rows = SparkEntry.queries("ss_rp_project")(spark, sf).collect()
    assert(rows.length == vecs.size)
    val ratios = rows.map(_.getAs[Double]("norm_ratio"))
    // per-vector: χ²-style concentration (RDIM=16 → sd ≈ 0.35); band is
    // loose enough to never flake, tight enough to catch a wrong matrix
    assert(ratios.forall(r => r > 0.05 && r < 5.0),
      s"norm ratio escaped (0.05, 5): ${ratios.min} .. ${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3, s"mean norm ratio $mean (expected ≈1)")
    // y0 spot-check: recompute the first projected coordinate directly
    val first = rows.minBy(_.getAs[Long]("vec_id"))
    val v = vecs(first.getAs[Long]("vec_id"))
    val y0 = v.indices.map { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp|0|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val s = if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
      v(i).toDouble * s
    }.sum
    assert(math.abs(first.getAs[Double]("y0") - y0) < 1e-9,
      s"y0 ${first.getAs[Double]("y0")} != direct $y0")
  }

  test("ss_mmr_diversify: selection matches a brute-force greedy MMR replay") {
    val out = SparkEntry.queries("ss_mmr_diversify")(spark, sf).collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // brute force: same candidates (top-20 cosine to vec 0), same greedy
    val qv = vecs(0L)
    val cands = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, qv)) }
      .sortBy { case (id, rel) => (-rel, id) }.take(20)
    var selected = Vector.empty[Long]
    val picks = (1 to 5).map { _ =>
      val scored = cands.filterNot(c => selected.contains(c._1)).map { case (id, rel) =>
        val ms = if (selected.isEmpty) 0.0
                 else selected.map(sid => cos(vecs(id), vecs(sid))).max
        (id, 0.7 * rel - 0.3 * ms)
      }
      val best = scored.minBy { case (id, sc) => (-sc, id) }
      selected = selected :+ best._1
      best
    }
    out.zip(picks).foreach { case (row, (id, sc)) =>
      assert(row.getAs[Long]("doc_id") == id,
        s"rank ${row.getAs[Long]("rank")}: ${row.getAs[Long]("doc_id")} != brute $id")
      assert(math.abs(row.getAs[Double]("mmr") - sc) < 1e-12)
    }
    // diversification must actually reorder vs pure relevance beyond rank 1
    assert(out.head.getAs[Long]("doc_id") == cands.head._1,
      "rank 1 must be the pure-relevance argmax")
  }

  test("ss_cluster_purity: recomputes from the shared ss_ivf_assign table") {
    val assign = SparkEntry.queries("ss_ivf_assign")(spark, sf).collect()
      .map(r => (r.getAs[Int]("cluster"), r.getAs[Int]("label")))
    val purity = SparkEntry.queries("ss_cluster_purity")(spark, sf).collect()
    assert(purity.map(_.getAs[Long]("n_members")).sum == assign.length,
      "members must partition the corpus")
    val byCluster = assign.groupBy(_._1)
    assert(purity.map(_.getAs[Int]("cluster")).toSet == byCluster.keySet)
    purity.foreach { r =>
      val labels = byCluster(r.getAs[Int]("cluster")).map(_._2)
      val counts = labels.groupBy(identity).map { case (l, xs) => l -> xs.length }
      val mc = counts.values.max
      assert(r.getAs[Long]("n_members") == labels.length)
      assert(r.getAs[Long]("n_labels") == counts.size)
      assert(r.getAs[Long]("majority_count") == mc)
      assert(r.getAs[Int]("majority_label") == counts.filter(_._2 == mc).keys.min)
      assert(r.getAs[Long]("purity_bp") == mc.toLong * 10000 / labels.length)
    }
  }
}
