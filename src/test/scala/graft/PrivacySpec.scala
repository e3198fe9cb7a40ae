package graft

import org.apache.spark.sql.functions._

/** Privacy audits: invariants pinned against independent recomputation
  * at sf0.001. */
class PrivacySpec extends SparkSpec {

  test("pr_k_anonymity: thresholds are monotone and class stats are true") {
    val rows = SparkEntry.queries("pr_k_anonymity")(spark, sf).orderBy("k").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(2, 5, 10, 20))

    val sizes = Tables.customer(spark, sf)
      .groupBy("c_nationkey", "c_mktsegment").count()
      .select("count").as[Long](spark.implicits.newLongEncoder).collect()
    val nRows = sizes.sum
    rows.foreach { r =>
      val k = r.getInt(0)
      assert(r.getLong(1) === sizes.length.toLong, "n_classes")
      assert(r.getLong(2) === sizes.min, "min_class")
      assert(r.getLong(3) === sizes.count(_ < k).toLong, s"classes_below k=$k")
      assert(r.getLong(4) === sizes.filter(_ < k).sum, s"rows_below k=$k")
      assert(r.getLong(5) === sizes.filter(_ < k).sum * 10000 / nRows, "risk_bp")
    }
    // monotone in k
    assert(rows.map(_.getLong(3)).toSeq === rows.map(_.getLong(3)).sorted.toSeq)
    assert(rows.map(_.getLong(4)).toSeq === rows.map(_.getLong(4)).sorted.toSeq)
  }

  test("pr_l_diversity: histogram accounts for every row and every class") {
    val rows = SparkEntry.queries("pr_l_diversity")(spark, sf).collect()
    val cust = Tables.customer(spark, sf)
    val classes = cust
      .groupBy(col("c_nationkey"), floor(col("c_acctbal") / 2500).as("b"))
      .agg(countDistinct(col("c_mktsegment")).as("l"), count(lit(1)).as("sz"))
      .collect()
    assert(rows.map(_.getLong(1)).sum === classes.length.toLong)
    assert(rows.map(_.getLong(2)).sum === cust.count())
    rows.foreach { r =>
      val l = r.getLong(0)
      val in = classes.filter(_.getLong(2) == l)
      assert(r.getLong(1) === in.length.toLong, s"n_classes at l=$l")
      assert(r.getLong(2) === in.map(_.getLong(3)).sum, s"n_rows at l=$l")
      assert(r.getLong(3) === in.map(_.getLong(3)).min && r.getLong(4) === in.map(_.getLong(3)).max)
      // l can never exceed the class size
      assert(l <= r.getLong(4))
    }
  }

  test("pr_dp_sensitivity: clip bounds are true order statistics, monotone in q") {
    val rows = SparkEntry.queries("pr_dp_sensitivity")(spark, sf).orderBy("q").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(50, 95, 99, 100))

    val perUser = Tables.events(spark, sf)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), sum(functions.Portable.cents(col("value"))).as("c"))
      .groupBy("user_id")
      .agg(max(col("n")).as("de"), max(col("c")).as("dc"), sum(col("n")).as("te"))
      .collect()
    val n = perUser.length
    def kth(vs: Array[Long], q: Int): Long = vs.sorted.apply(((n.toLong * q + 99) / 100).toInt - 1)
    val de = perUser.map(_.getLong(1)); val dc = perUser.map(_.getLong(2)); val te = perUser.map(_.getLong(3))
    rows.foreach { r =>
      val q = r.getInt(0)
      assert(r.getLong(1) === kth(de, q), s"daily events at q=$q")
      assert(r.getLong(2) === kth(dc, q), s"daily cents at q=$q")
      assert(r.getLong(3) === kth(te, q), s"total events at q=$q")
      assert(r.getLong(4) === n.toLong)
    }
    // q=100 is the exact max; bounds are monotone in q
    assert(rows.last.getLong(1) === de.max && rows.last.getLong(3) === te.max)
    Seq(1, 2, 3).foreach { c =>
      val vs = rows.map(_.getLong(c)).toSeq
      assert(vs === vs.sorted, s"column $c monotone")
    }
  }
}
