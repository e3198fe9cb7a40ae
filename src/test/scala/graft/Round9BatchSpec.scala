package graft

import org.apache.spark.sql.functions._

/** Oracle-independent ground truth for the round-9 batch: each declared
  * query is recomputed brute-force (driver-side Scala over the collected
  * sf0.001 tables, or the literal un-rewritten SQL) and compared exactly.
  * This is the LinkageReportsSpec discipline — the DuckDB hash gate
  * proves engine parity, these prove the SEMANTICS are the ones claimed.
  */
class Round9BatchSpec extends SparkSpec {

  test("q96: aggregate rewrite equals the literal EXISTS/NOT-EXISTS Q21 shape") {
    Seq("lineitem", "orders").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t)
    }
    val literal = spark.sql(
      """WITH base AS (
        |  SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
        |  FROM lineitem l1 JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |    AND l1.l_shipdate > o.o_orderdate + INTERVAL 120 DAYS
        |    AND EXISTS (SELECT 1 FROM lineitem l2
        |                WHERE l2.l_orderkey = l1.l_orderkey
        |                  AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        |                    WHERE l3.l_orderkey = l1.l_orderkey
        |                      AND l3.l_suppkey <> l1.l_suppkey
        |                      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 120 DAYS))
        |SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
        |FROM base GROUP BY 1
        |ORDER BY numwait DESC, l_suppkey LIMIT 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = SparkEntry.queries("q96_waiting_suppliers")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === literal)
  }

  test("ta_gopher_rules: rule fail counts match a driver-side recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val stops = Set("the", "a", "of", "to", "in")
    var (wcF, lenF, stopF, repF, ttrF, anyF) = (0L, 0L, 0L, 0L, 0L, 0L)
    docs.foreach { case (_, text) =>
      val toks = text.split(" ")
      val wc = toks.length.toLong
      val sl = toks.map(_.length.toLong).sum
      val byTok = toks.groupBy(identity)
      val nd = byTok.size.toLong
      val mx = byTok.values.map(_.length).max.toLong
      val st = toks.count(stops.contains).toLong
      val f1 = wc < 25 || wc > 75
      val f2 = sl < 4 * wc || sl > 10 * wc
      val f3 = st < 2
      val f4 = 5 * mx >= wc
      val f5 = 10 * nd < 3 * wc
      if (f1) wcF += 1; if (f2) lenF += 1; if (f3) stopF += 1
      if (f4) repF += 1; if (f5) ttrF += 1
      if (f1 || f2 || f3 || f4 || f5) anyF += 1
    }
    val got = SparkEntry.queries("ta_gopher_rules")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("any_rule" -> anyF, "mean_len" -> lenF,
      "repetition" -> repF, "stopword" -> stopF, "ttr" -> ttrF,
      "wc_bounds" -> wcF))
    // the battery must discriminate at this SF: some rule fires, none
    // fires on everything
    assert(anyF > 0 && anyF < docs.length)
  }

  test("ta_nb_confusion: confusion matrix matches a driver-side NB on the same grid") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val train = docs.filter(_._1 % 2 == 0)
    val toks = train.flatMap { case (_, l, t) => t.split(" ").map(l -> _) }
    val cnts = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tot = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val vocab = toks.map(_._2).toSet
    val nv = vocab.size.toLong
    val langs = tot.keys.toSeq.sorted
    val idx = Map("de" -> 5L, "en" -> 4L, "es" -> 3L, "fr" -> 2L, "zh" -> 1L)
    def w(lang: String, token: String): Long =
      if (vocab.contains(token))
        math.round(math.log((cnts.getOrElse((lang, token), 0L) + 1.0) /
          (tot(lang) + nv)) * 1000000.0)
      else math.round(math.log(1.0 / (tot(lang) + nv)) * 1000000.0)
    val confusion = docs.filter(_._1 % 2 == 1).map { case (_, trueLang, text) =>
      val ts = text.split(" ")
      val enc = langs.map { l =>
        ts.map(t => w(l, t)).sum * 8 + idx(l)
      }.max
      val pred = ((enc % 8) + 8) % 8 match {
        case 5 => "de"; case 4 => "en"; case 3 => "es"; case 2 => "fr"
        case _ => "zh"
      }
      (trueLang, pred)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("ta_nb_confusion")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === confusion)
  }

  test("el_did and el_qte: cells and quantiles match driver-side recompute") {
    val p = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0) % 2, r.getLong(1), functions.Portable.centsJvm(r.getDouble(2))))
    val postUs = java.time.Instant.parse("2024-01-16T00:00:00Z").toEpochMilli * 1000L
    def cell(v: Long, post: Boolean): (Long, Long) = {
      val xs = p.filter(x => x._1 == v && (x._2 >= postUs) == post).map(_._3)
      (xs.sum, xs.length.toLong)
    }
    val did = SparkEntry.queries("el_did")(spark, sf).collect().head
    assert((did.getLong(0), did.getLong(1)) === cell(1, post = false))
    assert((did.getLong(2), did.getLong(3)) === cell(1, post = true))
    assert((did.getLong(4), did.getLong(5)) === cell(0, post = false))
    assert((did.getLong(6), did.getLong(7)) === cell(0, post = true))

    def quantile(v: Long, q100: Long): Long = {
      val xs = p.filter(_._1 == v).map(_._3).sorted
      xs(((q100 * xs.length + 99) / 100 - 1).toInt) // ceil(q·n/100)-th, 1-based
    }
    SparkEntry.queries("el_qte")(spark, sf).collect().foreach { r =>
      val q = r.getLong(0)
      assert(r.getLong(1) === quantile(1, q), s"treat p$q")
      assert(r.getLong(2) === quantile(0, q), s"ctrl p$q")
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2))
    }
  }

  test("el_entropy_rate: per-state entropy matches driver-side recompute") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
              col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      ordered.zip(ordered.drop(1))
    }
    val byCur = trans.groupBy(_._1)
    val want = byCur.map { case (cur, ps) =>
      val n = ps.length.toLong
      val h = ps.groupBy(_._2).values.map { g =>
        val c = g.length.toLong
        math.round(1000000.0 * c * (math.log(n.toDouble / c) / math.log(2.0)) / n)
      }.sum
      cur -> (n, h)
    }
    val got = SparkEntry.queries("el_entropy_rate")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
  }

  test("q97/q98/q99: thresholds match driver-side recompute") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 functions.Portable.centsJvm(r.getDouble(3)),
                 functions.Portable.centsJvm(r.getDouble(4))))

    // q97: fair-share shippers among widget parts
    val widget = Tables.part(spark, sf).filter(col("p_name").contains("widget"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val sp = li.filter(l => widget.contains(l._2))
      .groupBy(l => (l._3, l._2)).view.mapValues(_.map(_._4).sum).toMap
    val pt = sp.groupBy(_._1._2).view
      .mapValues(m => (m.values.sum, m.size.toLong)).toMap
    val q97want = sp.toSeq.collect {
      case ((supp, part), qc) if qc * pt(part)._2 > 2 * pt(part)._1 && pt(part)._2 > 1 =>
        supp
    }.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (k, n) => (-n, k) }.take(10)
    val q97got = SparkEntry.queries("q97_fair_share")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(q97got === q97want)

    // q98: small-quantity revenue over Brand#13
    val brand = Tables.part(spark, sf).filter(col("p_brand") === "Brand#13")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val b = li.filter(l => brand.contains(l._2))
    val agg = b.groupBy(_._2).view.mapValues(g => (g.map(_._4).sum, g.length.toLong)).toMap
    val small = b.filter { l => val (sq, n) = agg(l._2); 2 * l._4 * n < sq }
    val q98 = SparkEntry.queries("q98_small_qty_revenue")(spark, sf).collect().head
    assert(q98.getLong(0) === small.map(_._5).sum)
    assert(q98.getLong(1) === small.length.toLong)

    // q99: dormant high-balance customers per nation
    val cust = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val pos = cust.filter(_._3 > 0)
    val (sC, n) = (pos.map(c => functions.Portable.centsJvm(c._3)).sum, pos.length.toLong)
    val cutoff = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
    val active = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val nationName = Tables.nation(spark, sf).select("n_nationkey", "n_name")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val want = cust.filter { c =>
      functions.Portable.centsJvm(c._3) * n > sC && !active.contains(c._1)
    }.groupBy(c => nationName(c._2)).view
      .mapValues(g => (g.length.toLong, g.map(x => functions.Portable.centsJvm(x._3)).sum))
      .toMap
    val got = SparkEntry.queries("q99_dormant_customers")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === want)
    assert(cutoff.getTime > 0) // silence unused warning-level lint
  }
}
