package graft

/** mm_resize: the pooled grid must equal a driver-side 4x4 box
  * downsample of the byte grid, per doc. */
class ResizeSpec extends SparkSpec {

  test("mm_resize equals a brute-force average pool at sf0.001") {
    val got = SparkEntry.queries("mm_resize")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap

    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .filter(_._2.nonEmpty) // empty docs emit no row in either engine
    assert(got.size === docs.length)
    docs.foreach { case (id, text) =>
      val pixels = text.map(_.toLong)
      val blocks = pixels.zipWithIndex
        .groupBy { case (_, i) => (i / 32 / 4, i % 32 / 4) }
        .view.mapValues(ps => ps.map(_._1).sum / ps.length).toMap // integer mean
      val inH = (text.length + 31) / 32
      val outH = blocks.keys.map(_._1).max + 1
      val (gInH, gOutH, gBlocks, gSum) = got(id)
      assert(gInH === inH.toLong, s"doc $id in_h")
      assert(gOutH === outH.toLong, s"doc $id out_h")
      assert(gBlocks === blocks.size.toLong, s"doc $id n_blocks")
      assert(gSum === blocks.values.sum, s"doc $id checksum")
    }
  }
}
