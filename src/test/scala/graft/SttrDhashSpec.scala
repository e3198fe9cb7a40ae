package graft

import org.apache.spark.sql.functions._

/** ta_sttr / mm_dhash pinned against driver-side recomputation at
  * sf0.001, plus the brightness-invariance property that motivates a
  * gradient hash. */
class SttrDhashSpec extends SparkSpec {

  test("ta_sttr: windowed type counts equal a driver-side recompute") {
    val W = 25
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perSource = docs.groupBy(_._2).view.mapValues { ds =>
      val wins = ds.flatMap { case (id, _, text) =>
        text.split(" ", -1).grouped(W).filter(_.length == W)
          .map(w => (id, w.distinct.length.toLong))
      }
      (wins.map(_._1).distinct.length.toLong, wins.length.toLong, wins.map(_._2).sum)
    }.toMap
    val got = SparkEntry.queries("ta_sttr")(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet === perSource.filter(_._2._2 > 0).keySet)
    got.foreach { r =>
      val (dw, nw, st) = perSource(r.getString(0))
      assert(r.getLong(1) === dw && r.getLong(2) === nw && r.getLong(3) === st,
        s"source ${r.getString(0)}")
      assert(r.getLong(4) === st * 10000 / (nw * W), "sttr_bp")
      assert(r.getLong(4) <= 10000, "TTR is a ratio")
    }
  }

  test("mm_border_detect: leading/trailing dark runs match a driver recompute") {
    val got = SparkEntry.queries("mm_border_detect")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    Tables.documents(spark, sf).select("doc_id", "text").collect().foreach { row =>
      val id = row.getLong(0); val text = row.getString(1)
      val dark = text.grouped(32).map { r =>
        r.map(_.toLong).sum / r.length < 105
      }.toArray
      val n = dark.length.toLong
      val top = dark.indexWhere(!_) match { case -1 => n; case i => i.toLong }
      val bot = dark.lastIndexWhere(!_) match { case -1 => n; case i => n - 1 - i }
      assert(got(id) === ((n, dark.count(identity).toLong, top, bot)), s"doc $id")
    }
  }

  test("mm_dhash: bits match a driver-side pooled-gradient recompute; brightness-invariant") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def hash(text: String, shift: Int): (Long, Long, Long) = {
      val px = text.getBytes("UTF-8").zipWithIndex.map { case (b, i) =>
        // query reads chars via substring+ascii; soup is pure ASCII
        (((i / 32) / 4), ((i % 32) / 4), (text.charAt(i).toLong + shift))
      }
      val means = px.groupBy(p => (p._1, p._2)).view
        .mapValues(v => v.map(_._3).sum / v.length).toMap
      var dh = 0L; var set = 0L; var pairs = 0L
      means.keys.toSeq.sorted.foreach { case (br, bc) =>
        if (br <= 8 && means.contains((br, bc + 1))) {
          pairs += 1
          if (means((br, bc)) > means((br, bc + 1))) {
            set += 1; dh |= 1L << (br * 7 + bc)
          }
        }
      }
      (pairs, dh, set)
    }
    val got = SparkEntry.queries("mm_dhash")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === hash(text, 0), s"doc $id")
      // a global brightness shift leaves every inequality, hence the hash
      assert(hash(text, 40)._2 === hash(text, 0)._2, s"doc $id brightness")
    }
  }
}
