package graft

import org.apache.spark.sql.functions._

/** Second privacy batch: PII detection/redaction invariants pinned
  * against the augmentation contract, t-closeness against independent
  * recomputation at sf0.001. */
class Privacy2Spec extends SparkSpec {

  test("pr_pii_scan: counts follow the doc_id % 7 plant exactly; Luhn splits candidates") {
    val rows = SparkEntry.queries("pr_pii_scan")(spark, sf).collect()
    val ids = Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    def planted(src: String, m: Long) = ids.count { case (id, s) => s == src && id % 7 == m }.toLong
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(2) === planted(src, 0), s"emails in $src")
      assert(r.getLong(3) === planted(src, 1), s"phones in $src")
      assert(r.getLong(4) === planted(src, 2), s"ips in $src")
      assert(r.getLong(5) === planted(src, 3), s"cc candidates in $src")
      // Luhn accepts exactly the doc_id % 14 == 3 half of the plants
      assert(r.getLong(6) === ids.count { case (id, s) => s == src && id % 14 == 3 }.toLong,
        s"luhn-valid in $src")
      assert(r.getLong(6) <= r.getLong(5), "valid cannot exceed candidates")
      assert(r.getLong(7) === planted(src, 0) + planted(src, 1) + planted(src, 2) + planted(src, 3),
        s"docs_flagged in $src (one plant per doc)")
    }
  }

  test("pr_redact_audit: redaction accounting agrees with the scan") {
    val scan = SparkEntry.queries("pr_pii_scan")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5),
                                   r.getLong(7))).toMap
    val red = SparkEntry.queries("pr_redact_audit")(spark, sf).collect()
    red.foreach { r =>
      val (nPii, flagged) = scan(r.getString(0))
      assert(r.getLong(2) === flagged, "docs_redacted == docs_flagged")
      assert(r.getLong(3) === nPii, "n_redactions == total detections")
      // every planted PII string is longer than its replacement token
      assert(r.getLong(4) >= 0 || r.getLong(3) == 0, "net chars removed when anything matched")
    }
  }

  test("pr_generalize: ladder is monotone and chosen is the finest width meeting k") {
    val rows = SparkEntry.queries("pr_generalize")(spark, sf).orderBy("w").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(625, 1250, 2500, 5000, 10000))
    // independent recompute of one rung
    val bal = Tables.customer(spark, sf)
      .select("c_nationkey", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    rows.foreach { r =>
      val w = r.getInt(0)
      val sizes = bal.groupBy { case (n, b) => (n, math.floor(b / w).toLong) }
        .values.map(_.size.toLong)
      assert(r.getLong(1) === sizes.size.toLong, s"n_classes w=$w")
      assert(r.getLong(2) === sizes.min, s"min_class w=$w")
      assert(r.getLong(3) === sizes.filter(_ < 10).sum, s"rows_below_k w=$w")
      assert(r.getLong(4) === (if (sizes.min >= 10) 1L else 0L))
    }
    // coarser widths never increase class count; chosen flags exactly the min meeting width
    assert(rows.map(_.getLong(1)).toSeq === rows.map(_.getLong(1)).sorted.reverse.toSeq)
    val meeting = rows.filter(_.getLong(4) == 1L).map(_.getInt(0))
    val chosen = rows.filter(_.getLong(5) == 1L).map(_.getInt(0)).toSeq
    assert(chosen === meeting.sorted.headOption.toSeq)
  }

  test("pr_t_closeness: exact-rational TV distance against driver-side recomputation") {
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey"), floor(col("c_acctbal") / 2500).cast("long").as("band"),
              col("c_mktsegment"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getString(2)))
    val n = cust.length.toLong
    val segTot = cust.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
    val classes = cust.groupBy(_._1)
    val tBp = classes.map { case (_, members) =>
      val nC = members.length.toLong
      val num = segTot.map { case (s, nS) =>
        val nCs = members.count(_._2 == s).toLong
        math.abs(nCs * n - nS * nC)
      }.sum
      num * 10000L / (2L * nC * n)
    }.toSeq

    val rows = SparkEntry.queries("pr_t_closeness")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum === classes.size.toLong, "class count")
    assert(rows.map(_.getLong(2)).sum === n, "row count")
    val expected = tBp.groupBy(_ / 500).view.mapValues(v => (v.length.toLong, v.min, v.max)).toMap
    rows.foreach { r =>
      val (cnt, mn, mx) = expected(r.getLong(0))
      assert(r.getLong(1) === cnt && r.getLong(3) === mn && r.getLong(4) === mx,
        s"band ${r.getLong(0)}")
      assert(r.getLong(4) <= 10000L, "TV distance is at most 1")
    }
  }
}
