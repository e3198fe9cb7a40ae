package graft

import org.apache.spark.sql.functions._

/** Brute-force contracts for the compressed-first-pass retrieval pair
  * (SimilarityQueries7) — full driver-side replays of both pipelines at
  * sf0.001 (500 vectors), sharing no code with the plans.
  */
class CompressedRetrievalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def corpus(): Map[Long, Array[Float]] =
    Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    // FloatDot's exact fold: float→double per element, left-to-right
    def dot(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("ss_binary_hamming: XOR-popcount ranks match a bit-level replay") {
    val vecs = corpus()
    def bits(v: Array[Float]): Array[Int] = v.map(x => if (x >= 0) 1 else 0)
    def hamming(a: Array[Float], b: Array[Float]): Long =
      bits(a).zip(bits(b)).count { case (x, y) => x != y }.toLong

    val rows = SparkEntry.queries("ss_binary_hamming")(spark, dir).collect()
    assert(rows.length == 50) // 10 anchors × top-5
    val got = rows.map { r =>
      (r.getLong(r.fieldIndex("qid")), r.getLong(r.fieldIndex("vec_id"))) ->
        (r.getLong(r.fieldIndex("hamming")), r.getInt(r.fieldIndex("rank")))
    }.toMap
    for (qid <- 0L until 10L) {
      val expected = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (hamming(vecs(qid), v), id) }
        .sorted.take(5).zipWithIndex
      expected.foreach { case ((h, id), i) =>
        assert(got((qid, id)) == ((h, i + 1)),
          s"qid=$qid id=$id expected (h=$h rank=${i + 1}) got ${got.get((qid, id))}")
      }
    }
  }

  test("ss_rerank_int8: stage-1 integer scores and final ranks match a replay") {
    val vecs = corpus()
    // trained quantizer, recomputed from raw data (no shared code)
    val dim = 64
    val mn = Array.tabulate(dim)(j => vecs.values.map(_(j).toDouble).min)
    val sc = Array.tabulate(dim)(j => (vecs.values.map(_(j).toDouble).max - mn(j)) / 255.0)
    def code(v: Array[Float]): Array[Long] = Array.tabulate(dim) { j =>
      val c = if (sc(j) == 0) 0.0
              else math.min(math.floor((v(j).toDouble - mn(j)) / sc(j)), 255.0)
      c.toLong - 128L
    }
    def s1(a: Array[Float], b: Array[Float]): Long =
      code(a).zip(code(b)).map { case (x, y) => x * y }.sum

    val rows = SparkEntry.queries("ss_rerank_int8")(spark, dir).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val qid = r.getLong(r.fieldIndex("qid")); val id = r.getLong(r.fieldIndex("vec_id"))
      assert(r.getLong(r.fieldIndex("s1")) == s1(vecs(qid), vecs(id)))
      assert(r.getInt(r.fieldIndex("s1_rank")) <= 50)
      assert(math.abs(r.getDouble(r.fieldIndex("cosine")) - cosine(vecs(qid), vecs(id))) == 0.0)
    }
    // final ranking = exact cosine order WITHIN the stage-1 candidate set
    for (qid <- 0L until 10L) {
      val cand = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => ((-s1(vecs(qid), v), id), id) }
        .sortBy(_._1).take(50).map(_._2)
      val expected = cand.map(id => (-cosine(vecs(qid), vecs(id)), id)).sorted.take(5).map(_._2)
      val gotIds = rows.filter(r => r.getLong(r.fieldIndex("qid")) == qid)
        .sortBy(_.getInt(rows.head.fieldIndex("rank"))).map(_.getLong(rows.head.fieldIndex("vec_id")))
      assert(gotIds.toSeq == expected, s"qid=$qid")
    }
  }

  test("ss_rerank_int8: the compressed pass is a good prefilter here — top-1 agreement with exact search") {
    // quality floor, not a tautology: the exact top-1 neighbor must
    // survive stage 1 and win stage 2 for every anchor at this fixture
    // (measured property of the quantizer on this corpus; a regression
    // here means the codes or the candidate width silently degraded)
    val vecs = corpus()
    val rows = SparkEntry.queries("ss_rerank_int8")(spark, dir).collect()
    for (qid <- 0L until 10L) {
      val exact1 = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => ((-cosine(vecs(qid), v), id), id) }.sortBy(_._1).head._2
      val got1 = rows.filter(r => r.getLong(r.fieldIndex("qid")) == qid &&
                                  r.getInt(r.fieldIndex("rank")) == 1)
        .head.getLong(rows.head.fieldIndex("vec_id"))
      assert(got1 == exact1, s"qid=$qid exact=$exact1 got=$got1")
    }
  }

  test("ss_compressed_recall: bounds hold and int8 dominates binary at every k") {
    val rows = SparkEntry.queries("ss_compressed_recall")(spark, dir).collect()
    def l(r: org.apache.spark.sql.Row, n: String) = r.getLong(r.fieldIndex(n))
    assert(rows.length == 6) // 2 methods × k ∈ {1,5,10}
    rows.foreach { r =>
      assert(l(r, "hits") <= l(r, "possible"))
      assert(l(r, "recall_bp") >= 0 && l(r, "recall_bp") <= 10000)
      assert(l(r, "possible") == 10L * r.getInt(r.fieldIndex("k")))
    }
    // 8-bit codes carry strictly more signal than 1-bit codes on this
    // corpus — a measured ordering; a flip means a code builder broke
    val by = rows.map(r => (r.getString(r.fieldIndex("method")),
                            r.getInt(r.fieldIndex("k"))) -> l(r, "recall_bp")).toMap
    Seq(1, 5, 10).foreach(k => assert(by(("int8", k)) >= by(("binary", k)), s"k=$k"))
  }

  test("int8 codes are stateless: streamed codes == batch codes, vector for vector") {
    // the VectorIngestStream contract applied to the int8 quantizer —
    // codes come from literals, so the SAME expression runs on a
    // parquet stream with no state store and lands identical codes
    import java.nio.file.Files
    val streamDir = Files.createTempDirectory("int8-stream").toString
    Tables.embeddings(spark, dir).write.mode("overwrite").parquet(streamDir)
    val codeCol = graft.queries.SimilarityQueries7.int8Codes(spark, dir)
    val q = spark.readStream
      .schema(Tables.embeddings(spark, dir).schema)
      .parquet(streamDir)
      .select(col("vec_id"), codeCol.as("c"))
      .writeStream.format("memory").queryName("int8_ingest")
      .option("checkpointLocation", Files.createTempDirectory("int8-ckpt").toString)
      .start()
    val streamed =
      try { q.processAllAvailable()
            spark.table("int8_ingest").collect()
              .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap }
      finally q.stop()
    val batch = Tables.embeddings(spark, dir)
      .select(col("vec_id"), codeCol.as("c")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(streamed == batch)
  }
}
