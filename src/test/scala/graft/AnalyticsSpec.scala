package graft

import org.apache.spark.sql.functions._

/** Independent semantic checks for the EventLogQueries2 / DedupQueries2
  * operators — each declared query is value-checked against the DuckDB
  * oracle; these assert the operator CONTRACTS against brute-force
  * recomputations that share no code with the query plans.
  */
class AnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("el_attribution: every model's credit sums to the conversion count") {
    val rows = SparkEntry.queries("el_attribution")(spark, dir).collect()
    assert(rows.nonEmpty)
    val nConv = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    val li = rows.head.fieldIndex("last_touch_convs")
    val fi = rows.head.fieldIndex("first_touch_convs")
    val ci = rows.head.fieldIndex("linear_credit")
    assert(rows.map(_.getLong(li)).sum == nConv)
    assert(rows.map(_.getLong(fi)).sum == nConv)
    assert(math.abs(rows.map(_.getDouble(ci)).sum - nConv.toDouble) < 1e-6)
    // touch types are exactly the three touch channels (+ 'none' when a
    // purchase has no prior-week touches)
    assert(rows.map(_.getString(0)).toSet
      .subsetOf(Set("click", "view", "signup", "none")))
  }

  test("el_streaks: gaps-and-islands output matches brute-force streak runs") {
    val rows = SparkEntry.queries("el_streaks")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val days = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).sorted.toVector).toMap
    assert(rows.keySet == days.keySet)
    for ((u, ds) <- days) {
      // brute-force runs of consecutive days
      val runs = ds.foldLeft(Vector.empty[Vector[Long]]) { (acc, d) =>
        if (acc.nonEmpty && acc.last.last == d - 1) acc.init :+ (acc.last :+ d)
        else acc :+ Vector(d)
      }
      val (active, nStreaks, longest) = rows(u)
      assert(active == ds.size, s"user $u active")
      assert(nStreaks == runs.size, s"user $u streaks")
      assert(longest == runs.map(_.size).max.toLong, s"user $u longest")
    }
  }

  test("el_rfm_segments: partition is exhaustive and monetary adds up") {
    val rows = SparkEntry.queries("el_rfm_segments")(spark, dir).collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_users"))).sum == nUsers)
    val totalPurchase = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("long"))).head.getLong(0)
    val mSum = rows.map(_.getDouble(rows.head.fieldIndex("monetary_total"))).sum
    assert(math.abs(mSum - totalPurchase / 100.0) < 1e-6)
    // bins stay in range
    for (r <- rows; i <- 0 to 2)
      assert(r.getInt(i) >= 0 && r.getInt(i) <= 4)
  }

  test("el_hll_sliding: exact sliding distinct is right; sketch error bounded") {
    val rows = SparkEntry.queries("el_hll_sliding")(spark, dir).collect()
    assert(rows.nonEmpty)
    val dayUsers = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
              graft.functions.Portable.h60(col("user_id")).as("hv"))
      .distinct().collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(rows.length == dayUsers.size) // one window per observed day
    for (r <- rows) {
      val end = r.getLong(0)
      val expected = (end - 6 to end).flatMap(dayUsers.get).flatten.toSet
      assert(r.getLong(r.fieldIndex("exact_distinct")) == expected.size, s"day $end")
      val est   = r.getDouble(r.fieldIndex("hll_estimate"))
      val zeros = r.getInt(r.fieldIndex("zero_regs"))
      // The sf0.001 windows sit deep in the small-range regime
      // (n ≈ 15 « m = 64), where the raw harmonic estimator is biased
      // high BY DESIGN — that is why zero_regs is emitted: callers apply
      // linear counting m·ln(m/V) when zeros remain. Assert the emitted
      // registers support that correction; the raw estimate only gets a
      // one-sided sanity bound (it must not UNDERcount here).
      if (zeros > 0) {
        val lc = 64.0 * math.log(64.0 / zeros)
        assert(math.abs(lc - expected.size) <= math.max(3.0, 0.35 * expected.size),
          s"day $end: linear-count $lc vs exact ${expected.size}")
        assert(est > expected.size * 0.6,
          s"day $end: raw est $est undercuts exact ${expected.size}")
      } else {
        // dense regime: the raw estimator's 3σ band (σ ≈ 1.04/√64)
        assert(math.abs(est - expected.size) <= 0.4 * expected.size,
          s"day $end: est $est vs exact ${expected.size}")
      }
    }
  }

  test("streaming HLL registers match the batch register table exactly") {
    import org.apache.spark.sql.streaming.Trigger
    val topic = java.nio.file.Files.createTempDirectory("hlltopic").toString + "/t"
    Tables.events(spark, dir).repartition(4).write.parquet(topic)
    val q = graft.streaming.EventStream.hllRegisters(
        graft.streaming.EventStream.ingest(spark, topic, 1))
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete")
      .option("checkpointLocation",
              java.nio.file.Files.createTempDirectory("hllckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("hll_regs")
    // batch register table from the same shared coordinate function
    val batch = graft.functions.PortableHll.registerCoords(
        Tables.events(spark, dir)
          .select(expr("unix_micros(ts) div 86400000000").as("day"), col("user_id")),
        col("user_id"))
      .groupBy("day", "reg").agg(max(col("rk")).as("mreg"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // and a 7-day max-merge of the STREAMED registers reproduces the
    // declared query's window estimates
    val merged = streamed
      .withColumn("wday", explode(sequence(col("day"), col("day") + 6)))
      .groupBy("wday", "reg").agg(max(col("mreg")).as("mreg"))
      .groupBy("wday")
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mreg AS INT))")).as("s_occ"),
           count(lit(1)).as("occ"))
      .select(col("wday"),
              (lit(709).cast("double") / lit(1000).cast("double")
                * lit(4096).cast("double") * lit(36028797018963968L).cast("double")
                / (col("s_occ") + (lit(64L) - col("occ")) * lit(36028797018963968L))
                    .cast("double")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val declared = SparkEntry.queries("el_hll_sliding")(spark, dir).collect()
    assert(declared.nonEmpty)
    for (r <- declared)
      assert(math.abs(merged(r.getLong(0)) -
        r.getDouble(r.fieldIndex("hll_estimate"))) < 1e-9)
  }

  test("el_winsorize: thresholds are true k-th smallest and clipping adds up") {
    val rows = SparkEntry.queries("el_winsorize")(spark, dir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    for (r <- rows) {
      val t  = r.getString(0)
      val cs = ev.filter(_._1 == t).map(_._2).sorted
      val n  = cs.length
      val p05 = cs(math.max(1, n * 5 / 100) - 1)
      val p95 = cs(math.max(1, n * 95 / 100) - 1)
      assert(r.getDouble(r.fieldIndex("p05")) == p05 / 100.0, s"$t p05")
      assert(r.getDouble(r.fieldIndex("p95")) == p95 / 100.0, s"$t p95")
      assert(r.getLong(r.fieldIndex("n_clipped_low")) == cs.count(_ < p05).toLong)
      assert(r.getLong(r.fieldIndex("n_clipped_high")) == cs.count(_ > p95).toLong)
      val wmean = cs.map(c => math.min(math.max(c, p05), p95)).sum.toDouble / n / 100.0
      assert(math.abs(r.getDouble(r.fieldIndex("winsorized_mean")) - wmean) < 1e-9, s"$t mean")
    }
  }

  test("q50_graph_rank: two propagation rounds match a brute-force recompute") {
    val rows = SparkEntry.queries("q50_graph_rank")(spark, dir).collect()
    assert(rows.nonEmpty)
    val edges = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dc = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ds = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val B  = 150000000L
    val s1 = edges.groupBy(_._2).view.mapValues(es =>
      B + es.map { case (c, _) => 85000000000L / (100L * dc(c)) }.sum).toMap
    val r1 = edges.groupBy(_._1).view.mapValues(es =>
      B + es.map { case (_, sp) => s1(sp) * 85L / (100L * ds(sp)) }.sum).toMap
    val s2 = edges.groupBy(_._2).view.mapValues(es =>
      B + es.map { case (c, _) => r1(c) * 85L / (100L * dc(c)) }.sum).toMap
    assert(rows.length == ds.size)
    for (r <- rows) {
      val sp = r.getLong(0)
      assert(r.getLong(r.fieldIndex("n_customers")) == ds(sp))
      assert(math.abs(r.getDouble(r.fieldIndex("rank_score")) - s2(sp) / 1e9) < 1e-12, s"supp $sp")
    }
  }

  test("dd_jaccard_histogram: deciles partition exactly the verified pair set") {
    val pairs = SparkEntry.queries("dd_ngram_jaccard")(spark, dir).collect()
      .map(_.getDouble(2))
    val hist = SparkEntry.queries("dd_jaccard_histogram")(spark, dir).collect()
    assert(hist.map(_.getLong(hist.head.fieldIndex("n_pairs"))).sum == pairs.length.toLong)
    for (h <- hist) {
      val dec  = h.getInt(0)
      val mine = pairs.filter(j => math.min(9, math.floor(j * 10).toInt) == dec)
      assert(h.getLong(h.fieldIndex("n_pairs")) == mine.length.toLong)
      assert(h.getDouble(h.fieldIndex("min_jaccard")) == mine.min)
      assert(h.getDouble(h.fieldIndex("max_jaccard")) == mine.max)
    }
  }

  test("el_quantile_sketch: exact quantiles right; estimate within one bin width") {
    val rows = SparkEntry.queries("el_quantile_sketch")(spark, dir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    for (r <- rows) {
      val t  = r.getString(0)
      val q  = r.getInt(1)
      val cs = ev.filter(_._1 == t).map(_._2).sorted
      val k  = math.max(1, cs.length * q / 100)
      assert(r.getDouble(r.fieldIndex("exact_value")) == cs(k - 1) / 100.0, s"$t q$q exact")
      val binWidth = (cs.max - cs.min + 1).toDouble / 32 / 100.0
      assert(math.abs(r.getDouble(r.fieldIndex("err"))) <= binWidth + 0.01,
        s"$t q$q err ${r.getDouble(r.fieldIndex("err"))} vs bin $binWidth")
    }
    // per type, estimates are monotone in q
    for ((_, rs) <- rows.groupBy(_.getString(0))) {
      val byQ = rs.sortBy(_.getInt(1)).map(_.getDouble(rs.head.fieldIndex("est_value")))
      assert(byQ.zip(byQ.tail).forall { case (a, b) => a <= b })
    }
  }

  test("ta_inverted_index: counts and capped postings match a brute-force index") {
    val rows = SparkEntry.queries("ta_inverted_index")(spark, dir).collect()
    assert(rows.nonEmpty)
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byTok = tok.groupBy(_._2)
    assert(rows.length == byTok.size)
    for (r <- rows) {
      val t    = r.getString(0)
      val docs = byTok(t).map(_._1).distinct.sorted
      assert(r.getLong(r.fieldIndex("df")) == docs.length.toLong)
      assert(r.getLong(r.fieldIndex("n_occurrences")) == byTok(t).length.toLong)
      assert(r.getString(r.fieldIndex("postings")) == docs.take(10).mkString(","))
    }
  }

  test("streaming value histogram: grid matches batch; quantile read-off is bin-accurate") {
    import org.apache.spark.sql.streaming.Trigger
    val topic = java.nio.file.Files.createTempDirectory("histtopic").toString + "/t"
    Tables.events(spark, dir).repartition(4).write.parquet(topic)
    val q = graft.streaming.EventStream.valueHistogram(
        graft.streaming.EventStream.ingest(spark, topic, 1))
      .writeStream.format("memory").queryName("val_hist")
      .outputMode("complete")
      .option("checkpointLocation",
              java.nio.file.Files.createTempDirectory("histckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("val_hist")
    val batch = graft.streaming.EventStream.valueHistogram(Tables.events(spark, dir))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // read p90 per type off the STREAMED grid; must land within one bin
    // (1000 cents) of the exact p90
    val grid = streamed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = Tables.events(spark, dir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((t, cs) <- exact) {
      val k = math.max(1, cs.length * 90 / 100)
      val p90exact = cs(k - 1)
      val bins = grid.filter(_._1 == t).sortBy(_._2)
      var cum = 0L
      val hit = bins.find { case (_, _, c) => cum += c; cum >= k }.get
      val p90est = hit._2 * 1000 // bin lower bound in cents
      assert(math.abs(p90est - p90exact) <= 1000, s"$t: est $p90est exact $p90exact")
    }
  }

  test("q51_dq_audit / q52_skew_profile: reports match brute-force recomputes") {
    val audit = SparkEntry.queries("q51_dq_audit")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(audit.size == 6)
    for ((_, (obs, passed)) <- audit) assert(passed == (if (obs == 0) 1 else 0))
    // brute-force the two referential checks
    val orderKeys = Tables.orders(spark, dir).select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val orphanLi = Tables.lineitem(spark, dir).select("l_orderkey").collect()
      .count(r => !orderKeys.contains(r.getLong(0)))
    assert(audit("lineitem_orphan_orderkey")._1 == orphanLi.toLong)
    val custKeys = Tables.customer(spark, dir).select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    val orphanO = Tables.orders(spark, dir).select("o_custkey").collect()
      .count(r => !custKeys.contains(r.getLong(0)))
    assert(audit("orders_orphan_custkey")._1 == orphanO.toLong)

    val skew = SparkEntry.queries("q52_skew_profile")(spark, dir).head()
    val counts = Tables.orders(spark, dir).select("o_custkey").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val nRows = counts.values.sum
    assert(skew.getLong(skew.fieldIndex("n_rows")) == nRows)
    assert(skew.getLong(skew.fieldIndex("distinct_keys")) == counts.size.toLong)
    assert(skew.getLong(skew.fieldIndex("max_key_rows")) == counts.values.max)
    val top10 = counts.values.toSeq.sorted.reverse.take(10).sum
    assert(math.abs(skew.getDouble(skew.fieldIndex("top10_share")) -
      top10.toDouble / nRows) < 1e-12)
  }

  test("streaming histogram state survives a restart: two tranches, one grid") {
    import org.apache.spark.sql.streaming.Trigger
    // count-based state makes double-processing VISIBLE (a max-merge
    // sketch would silently absorb a replay) — so this is the op that
    // proves checkpointed state recovery, not just sink idempotence
    val topic = java.nio.file.Files.createTempDirectory("rsttopic").toString + "/t"
    val ckpt  = java.nio.file.Files.createTempDirectory("rstckpt").toString
    val ev    = Tables.events(spark, dir)
    def runOnce(): Unit = {
      val q = graft.streaming.EventStream.valueHistogram(
          graft.streaming.EventStream.ingest(spark, topic, 1))
        .writeStream.format("memory").queryName("rst_hist")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // tranche 1: half the events, run to completion, stop
    ev.filter(col("event_id") % 2 === 0).repartition(2).write.parquet(topic)
    runOnce()
    val afterHalf = spark.table("rst_hist").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // tranche 2: the rest lands, RESTART from the same checkpoint
    ev.filter(col("event_id") % 2 === 1).repartition(2).write.mode("append").parquet(topic)
    runOnce()
    val finalGrid = spark.table("rst_hist").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.streaming.EventStream.valueHistogram(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(finalGrid == batch, "restarted stream must equal one-shot batch")
    // and the restart really CONTINUED (tranche-1 counts grew, not reset)
    assert(afterHalf.values.sum < finalGrid.values.sum)
    assert(afterHalf.forall { case (k, v) => finalGrid(k) >= v })
  }

  test("el_theta_sketch_ops: full-set regime collapses to exact; overlaps verified") {
    val rows = SparkEntry.queries("el_theta_sketch_ops")(spark, dir).collect()
    assert(rows.length == 10) // 5 types choose 2
    // sf0.001 has ~15 distinct users per type, far below k=64 — every
    // sketch IS its set, so the estimators must equal the exact counts
    // BIT-EXACTLY (2^60/2^60 is an exact double ratio)
    for (r <- rows) {
      assert(r.getDouble(r.fieldIndex("inter_est")) ==
             r.getLong(r.fieldIndex("exact_inter")).toDouble,
        s"${r.getString(0)}/${r.getString(1)} inter")
      assert(r.getDouble(r.fieldIndex("union_est")) ==
             r.getLong(r.fieldIndex("exact_union")).toDouble,
        s"${r.getString(0)}/${r.getString(1)} union")
    }
    // brute-force the exact intersections from raw hash sets
    val sets = Tables.events(spark, dir)
      .select(col("event_type"), graft.functions.Portable.h60(col("user_id")).as("hv"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    for (r <- rows) {
      val (ta, tb) = (r.getString(0), r.getString(1))
      assert(r.getLong(r.fieldIndex("exact_inter")) == (sets(ta) & sets(tb)).size.toLong)
      assert(r.getLong(r.fieldIndex("exact_union")) == (sets(ta) | sets(tb)).size.toLong)
    }
  }

  test("q51_dq_audit: injected violations are counted, not just clean zeros") {
    // the fixtures are clean, so passed=1 everywhere — doctor a corpus
    // copy with one violation per constraint class and audit THAT
    val bad = java.nio.file.Files.createTempDirectory("dqbad").toString
    val o   = Tables.orders(spark, dir)
    val li  = Tables.lineitem(spark, dir)
    Tables.customer(spark, dir).write.parquet(s"$bad/customer.parquet")
    // orders: one duplicated o_orderkey + one orphan/null custkey row
    val oDup   = o.limit(1)
    val oBadFk = o.limit(1)
      .withColumn("o_orderkey", lit(999999991L))
      .withColumn("o_custkey", lit(999999999L)) // no such customer
    o.unionByName(oDup).unionByName(oBadFk).write.parquet(s"$bad/orders.parquet")
    // lineitem: one orphan orderkey, one qty out of range, one negative price
    li.unionByName(li.limit(1).withColumn("l_orderkey", lit(888888881L)))
      .unionByName(li.limit(1).withColumn("l_quantity", lit(0L)))
      .unionByName(li.limit(1).withColumn("l_extendedprice", lit(-1.0)))
      .write.parquet(s"$bad/lineitem.parquet")
    val audit = SparkEntry.queries("q51_dq_audit")(spark, bad).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(audit("orders_dup_orderkey") == (1L, 0))
    assert(audit("orders_orphan_custkey") == (1L, 0))
    assert(audit("lineitem_orphan_orderkey") == (1L, 0))
    assert(audit("lineitem_qty_out_of_range") == (1L, 0))
    assert(audit("lineitem_negative_price") == (1L, 0))
    assert(audit("orders_null_custkey")._2 == 1) // still clean
  }

  test("el_equidepth_hist: buckets partition rows, stay ordered, and balance within tie size") {
    val rows = SparkEntry.queries("el_equidepth_hist")(spark, dir).collect()
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    for ((t, rs0) <- rows.groupBy(_.getString(0))) {
      val rs = rs0.sortBy(_.getInt(1))
      val cs = ev.filter(_._1 == t).map(_._2)
      val n  = cs.length
      // exhaustive: bucket masses sum to the row count
      assert(rs.map(_.getLong(rs.head.fieldIndex("n_rows"))).sum == n.toLong)
      // ordered, non-overlapping value ranges
      for (Array(a, b) <- rs.sliding(2).map(_.toArray))
        assert(a.getDouble(a.fieldIndex("hi_value")) < b.getDouble(b.fieldIndex("lo_value")))
      // equi-depth up to tie granularity: no bucket deviates from n/8 by
      // more than the largest single-value multiplicity
      val maxTie = cs.groupBy(identity).values.map(_.length).max
      for (r <- rs)
        assert(math.abs(r.getLong(r.fieldIndex("n_rows")) - n / 8.0) <= maxTie + 1,
          s"$t bucket ${r.getInt(1)}")
    }
  }

  test("el_bot_regularity: CV matches brute force; flag is threshold-consistent") {
    val rows = SparkEntry.queries("el_bot_regularity")(spark, dir).collect()
    assert(rows.nonEmpty)
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues { es =>
        val sorted = es.sortBy(e => (e._3, e._2)).map(_._3)
        sorted.zip(sorted.tail).map { case (a, b) => (b - a) / 1000000L }
      }.toMap
    for (r <- rows) {
      val gs = gaps(r.getLong(0))
      assert(r.getLong(r.fieldIndex("n_gaps")) == gs.length.toLong)
      val mean = gs.sum.toDouble / gs.length
      val cv = math.sqrt(gs.map(g => g.toDouble * g).sum / gs.length - mean * mean) / mean
      assert(math.abs(r.getDouble(r.fieldIndex("gap_cv")) - cv) < 1e-9,
        s"user ${r.getLong(0)}")
      assert(r.getInt(r.fieldIndex("bot_flag")) == (if (cv < 0.3) 1 else 0))
    }
    // synthetic fixture users are human-bursty — none should flag
    assert(rows.forall(_.getInt(rows.head.fieldIndex("bot_flag")) == 0))
  }

  test("dd_chunk_dedup: retention matches a brute-force chunk census") {
    val rows = SparkEntry.queries("dd_chunk_dedup")(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toVector).toMap
    assert(rows.length == docs.size)
    // global chunk multiplicity + canonical owner
    val chunks = docs.toVector.flatMap { case (id, toks) =>
      toks.grouped(20).zipWithIndex.map { case (c, i) => (id, i.toLong, c.mkString(" ")) }
    }
    val mult  = chunks.groupBy(_._3).view.mapValues(_.size).toMap
    val owner = chunks.groupBy(_._3).view
      .mapValues(_.map { case (id, i, _) => (id, i) }.min).toMap
    assert(chunks.count(c => mult(c._3) > 1) > 0, "fixture must contain dup chunks")
    for (r <- rows) {
      val id = r.getLong(0)
      val mine = chunks.filter(_._1 == id)
      assert(r.getInt(r.fieldIndex("n_chunks")) == mine.size)
      assert(r.getInt(r.fieldIndex("n_dup_chunks")) == mine.count(c => mult(c._3) > 1))
      val removed = mine.count { case (d, i, t) =>
        mult(t) > 1 && (d, i) != owner(t) }
      assert(r.getInt(r.fieldIndex("n_removed")) == removed)
      val share = (mine.size - removed).toDouble / mine.size
      assert(math.abs(r.getDouble(r.fieldIndex("retained_share")) - share) < 1e-12)
    }
  }

  test("el_cep_pattern: counts match a driver-side regex over brute-built sequences") {
    val rows = SparkEntry.queries("el_cep_pattern")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    val seqs = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
              col("event_id"), substring(col("event_type"), 1, 1).as("c"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (_, evs) =>
        evs.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getString(3)).mkString
      }.toSeq
    val pats = Map("browse_to_buy" -> "vc*p", "error_then_buy" -> "ep",
                   "signup_to_first_buy" -> "s[^p]*p")
    pats.foreach { case (name, p) =>
      val counts = seqs.map(s => p.r.findAllMatchIn(s).length.toLong)
      assert(rows(name) === ((counts.count(_ > 0).toLong, counts.sum, counts.max)),
        s"pattern $name")
    }
  }
}
