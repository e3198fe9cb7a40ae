package graft

import org.apache.spark.sql.functions._

/** Independent semantic checks for the round-4 curation/retrieval batch
  * (BM25 search, source profile, CDC chunk dedup, coreset sample) —
  * brute-force recomputes that share no code with the query plans, plus
  * the shift-resistance property that motivates CDC over fixed-width
  * chunking.
  */
class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
  private def h32(s: String): Long  = java.lang.Long.parseLong(md5hex(s).take(8), 16)
  private def h60(s: String): Long  = java.lang.Long.parseLong(md5hex(s).take(15), 16)

  test("ta_bm25_search: scores match a driver-side BM25 recompute; ranking is the true top-10") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val qterms = Seq("table", "scan", "fast")
    val n = docs.size.toLong
    val totalLen = docs.values.map(_.size.toLong).sum
    val avgdlS = totalLen * 1000L / n
    val df = qterms.map(t => t -> docs.values.count(_.contains(t)).toLong).toMap
    def score(toks: Seq[String]): (Long, Long) = {
      val len = toks.size.toLong
      val terms = qterms.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None
        else {
          val idfS   = (n - df(t)) * 10000L / (df(t) + 1L)
          val normS  = 250L + 750L * len * 1000L / avgdlS
          val denomS = tf * 1000L + 1200L * normS / 1000L
          Some(idfS * tf * 2200L / denomS)
        }
      }
      (terms.size.toLong, terms.sum)
    }
    val expected = docs.toSeq
      .map { case (id, toks) => (id, score(toks)) }
      .filter(_._2._1 > 0)
      .sortBy { case (id, (_, s)) => (-s, id) }
      .take(10)
    val got = SparkEntry.queries("ta_bm25_search")(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
                 (r.getLong(r.fieldIndex("n_terms")), r.getLong(r.fieldIndex("score_s")))))
    assert(got.toSeq == expected, "BM25 top-10 diverges from brute force")
  }

  test("ta_source_profile: shares and verdicts match a brute-force per-source recompute") {
    val rows = Tables.documents(spark, dir)
      .select("source", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = rows.groupBy(_._1)
    val got = SparkEntry.queries("ta_source_profile")(spark, dir).collect()
    assert(got.length == bySrc.size)
    for (r <- got) {
      val src  = r.getString(r.fieldIndex("source"))
      val g    = bySrc(src)
      val nd   = g.length.toLong
      val dup  = nd - g.map(x => h60(x._2)).distinct.length
      val shrt = g.count(_._3 < 100).toLong
      assert(r.getLong(r.fieldIndex("n_docs")) == nd)
      assert(r.getLong(r.fieldIndex("dup_docs")) == dup)
      assert(r.getLong(r.fieldIndex("dup_permille")) == dup * 1000 / nd)
      assert(r.getLong(r.fieldIndex("short_permille")) == shrt * 1000 / nd)
      val keep = if (dup * 1000 / nd < 500 && shrt * 1000 / nd < 300) 1 else 0
      assert(r.getInt(r.fieldIndex("keep")) == keep, s"verdict for $src")
    }
  }

  /** The CDC rule, brute-force: cut AFTER any token with h32 ≡ 0 (mod 8). */
  private def cdcChunks(toks: Seq[String]): Seq[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    var cur = scala.collection.mutable.ArrayBuffer[String]()
    for (t <- toks) {
      cur += t
      if (h32(t) % 8 == 0) { out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer() }
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq
  }

  test("dd_cdc_chunks: duplicated-chunk table matches a brute-force CDC pass") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val all = docs.flatMap { case (id, toks) =>
      cdcChunks(toks).map(c => (h60(c.mkString(" ")), id, c.size.toLong)) }
    val expected = all.groupBy(_._1).collect {
      case (ch, g) if g.length >= 2 =>
        ch -> (g.length.toLong, g.map(_._2).distinct.length.toLong,
               g.map(_._3).min, g.map(_._2).min)
    }
    val got = SparkEntry.queries("dd_cdc_chunks")(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("chunk_hash")) ->
        (r.getLong(r.fieldIndex("n_copies")), r.getLong(r.fieldIndex("n_docs")),
         r.getLong(r.fieldIndex("n_tokens")), r.getLong(r.fieldIndex("first_doc"))))
      .toMap
    assert(got == expected, "CDC dedup table diverges from brute force")
  }

  test("CDC boundaries are shift-resistant; fixed-width chunking is not") {
    val base = Tables.documents(spark, dir)
      .filter(length(col("text")) > 200)
      .select("text").head().getString(0).split(" ", -1).toSeq
    val shifted = "inserted" +: base
    // chunks strictly after the first cut point are IDENTICAL under CDC
    val a = cdcChunks(base)
    val b = cdcChunks(shifted)
    assert(a.length > 2, "fixture doc long enough to have several chunks")
    assert(a.tail == b.tail,
      "inserting one leading token must only perturb the first chunk")
    // the fixed-width rule loses every downstream chunk to the shift
    def fixed(toks: Seq[String]) = toks.grouped(20).toSeq
    assert(fixed(base).tail != fixed(shifted).tail,
      "fixed-width chunking should break on the same insertion (the motivation)")
  }

  private def splitOf(id: Long): String = {
    val b = h60(id.toString) % 100
    if (b < 90) "train" else if (b < 95) "val" else "test"
  }

  test("dd_split_leakage: exactly the cross-split subset of the candidate pairs") {
    val cand = SparkEntry.queries("dd_minhash_pairs")(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("da")), r.getLong(r.fieldIndex("db")))).toSet
    val expected = cand.filter { case (a, b) => splitOf(a) != splitOf(b) }
    val got = SparkEntry.queries("dd_split_leakage")(spark, dir).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    for (r <- got) {
      assert(r.getString(r.fieldIndex("split_a")) == splitOf(r.getLong(0)))
      assert(r.getString(r.fieldIndex("split_b")) == splitOf(r.getLong(1)))
      val ti = if (Seq(r.getString(2), r.getString(3)).contains("train")) 1 else 0
      assert(r.getInt(r.fieldIndex("train_involved")) == ti)
    }
  }

  test("dd_incremental: verdicts match a brute-force replay of the candidate pairs") {
    val cand = SparkEntry.queries("dd_minhash_pairs")(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("da")), r.getLong(r.fieldIndex("db"))))
    val isNew = (id: Long) => id % 10 >= 8
    val partners = cand.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val newIds = Tables.documents(spark, dir).select("doc_id").collect()
      .map(_.getLong(0)).filter(isNew).sorted
    val expected = newIds.map { id =>
      val ps = partners.getOrElse(id, Array.empty[Long])
      val v =
        if (ps.exists(p => !isNew(p))) "dup_of_snapshot"
        else if (ps.exists(p => isNew(p) && p < id)) "dup_in_batch"
        else "fresh"
      id -> v
    }.toSeq
    val got = SparkEntry.queries("dd_incremental")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(got == expected)
  }

  test("ta_shuffle_shards: shards partition the corpus; assignment matches the salted hash") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
    val byShard = docs.groupBy { case (id, _) => h60(s"shuf1|$id") % 16 }
    val got = SparkEntry.queries("ta_shuffle_shards")(spark, dir).collect()
    assert(got.map(_.getLong(got.head.fieldIndex("n_docs"))).sum == docs.length)
    for (r <- got) {
      val sh = r.getLong(r.fieldIndex("shard"))
      val g  = byShard(sh)
      assert(r.getLong(r.fieldIndex("n_docs")) == g.length)
      assert(r.getLong(r.fieldIndex("total_tokens")) == g.map(_._2).sum)
      assert(r.getLong(r.fieldIndex("first_doc")) == g.map(_._1).min)
    }
  }

  test("ta_length_buckets: buckets partition the corpus and price the padding") {
    val lens = Tables.documents(spark, dir).select("text").collect()
      .map(_.getString(0).split(" ", -1).length.toLong)
    def bucketOf(n: Long): Long =
      (3 to 12).map(p => 1L << p).find(n <= _).getOrElse(8192L)
    val expected = lens.groupBy(bucketOf).view
      .mapValues(g => (g.length.toLong, g.sum)).toMap
    val got = SparkEntry.queries("ta_length_buckets")(spark, dir).collect()
    assert(got.map(_.getLong(1)).sum == lens.length)
    for (r <- got) {
      val b = r.getLong(r.fieldIndex("bucket"))
      val (n, tot) = expected(b)
      assert(r.getLong(r.fieldIndex("n_docs")) == n)
      assert(r.getLong(r.fieldIndex("total_tokens")) == tot)
      assert(r.getLong(r.fieldIndex("padding_waste")) == b * n - tot)
    }
  }

  test("ta_dsir_weights: top-20 matches a driver-side importance-weight recompute") {
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).toSeq))
    def buckets(toks: Seq[String]): Seq[Long] =
      if (toks.size < 2) Seq.empty
      else toks.sliding(2).map(p => h32(p.mkString(" ")) % 1024).toSeq
    val inst = docs.flatMap { case (id, src, toks) =>
      buckets(toks).map(b => (id, src, b)) }
    val rawTotal = inst.size.toLong
    val tgtTotal = inst.count { case (_, s, _) => s == "src0" || s == "src1" }.toLong
    val dppm = inst.groupBy(_._3).view.mapValues { g =>
      val nt = g.count { case (_, s, _) => s == "src0" || s == "src1" }.toLong
      nt * 1000000L / tgtTotal - g.size.toLong * 1000000L / rawTotal
    }.toMap
    val expected = docs.filter(_._3.size >= 2).map { case (id, _, toks) =>
      val bs = buckets(toks)
      val w  = bs.map(dppm).sum
      (id, bs.size.toLong, w, w * 1000 / bs.size)  // JVM / truncates like div
    }.sortBy { case (id, _, _, nw) => (-nw, id) }.take(20)
    val got = SparkEntry.queries("ta_dsir_weights")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
  }

  test("el_ab_lift: variant partition is exhaustive and rates match brute force") {
    def us(t: java.sql.Timestamp): Long =
      (t.getTime / 1000) * 1000000L + t.getNanos / 1000
    val events = Tables.events(spark, dir)
      .select("user_id", "event_type", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), us(r.getTimestamp(2)), r.getDouble(3)))
    val byUser = events.groupBy(_._1)
    def variantOf(u: Long): String =
      if (h60(s"exp1|$u") % 2 == 0) "control" else "treatment"
    val per = byUser.map { case (u, es) =>
      val tView = es.filter(_._2 == "view").map(_._3).minOption
      val tPur  = es.filter(_._2 == "purchase").map(_._3).minOption
      val cents = es.filter(_._2 == "purchase").map(e => math.round(e._4 * 100)).sum
      (variantOf(u), tView, tPur, cents)
    }.toSeq
    val got = SparkEntry.queries("el_ab_lift")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("control", "treatment"))
    for ((v, r) <- got) {
      val g = per.filter(_._1 == v)
      val exposed   = g.count(_._2.isDefined).toLong
      val converted = g.count(x => x._2.isDefined && x._3.isDefined &&
        x._3.get > x._2.get).toLong
      val revenue   = g.filter(_._2.isDefined).map(_._4).sum
      assert(r.getLong(r.fieldIndex("n_exposed")) == exposed, s"$v exposed")
      assert(r.getLong(r.fieldIndex("n_converted")) == converted, s"$v converted")
      assert(r.getLong(r.fieldIndex("conv_ppm")) == converted * 1000000L / exposed)
      assert(r.getLong(r.fieldIndex("revenue_cents")) == revenue, s"$v revenue")
      assert(r.getLong(r.fieldIndex("cents_per_exposed")) == revenue / exposed)
    }
    // the two variants partition the exposed population
    val totalExposed = per.count(_._2.isDefined).toLong
    assert(got.values.map(_.getLong(1)).sum == totalExposed)
  }

  test("ss_coreset_sample agrees with ss_centroid_profile and its members") {
    val profile = SparkEntry.queries("ss_centroid_profile")(spark, dir).collect()
      .map(r => r.getInt(r.fieldIndex("cluster")) ->
        (r.getLong(r.fieldIndex("n_members")),
         r.getDouble(r.fieldIndex("min_cos")), r.getDouble(r.fieldIndex("max_cos"))))
      .toMap
    val assign = SparkEntry.queries("ss_ivf_assign")(spark, dir).collect()
      .map(r => r.getLong(r.fieldIndex("vec_id")) -> r.getInt(r.fieldIndex("cluster")))
      .toMap
    val got = SparkEntry.queries("ss_coreset_sample")(spark, dir).collect()
    assert(got.length == profile.size)
    for (r <- got) {
      val c = r.getInt(r.fieldIndex("cluster"))
      val (n, mn, mx) = profile(c)
      assert(r.getLong(r.fieldIndex("n_members")) == n)
      // medoid/outlier cos are the cell's max/min cohesion by definition
      assert(r.getDouble(r.fieldIndex("medoid_cos")) == mx)
      assert(r.getDouble(r.fieldIndex("outlier_cos")) == mn)
      // and both picks are genuine members of the cell
      assert(assign(r.getLong(r.fieldIndex("medoid_id"))) == c)
      assert(assign(r.getLong(r.fieldIndex("outlier_id"))) == c)
    }
  }
}
