package graft

import org.apache.spark.sql.functions._

/** Independent semantic checks for the StatsQueries operators — each
  * declared query is already value-checked against the DuckDB oracle;
  * these assert the operator CONTRACTS against brute-force
  * recomputations that share no code with the query plans.
  */
class StatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("el_cms_counts: estimates dominate exact counts and sum-preserve per row") {
    val rows = SparkEntry.queries("el_cms_counts")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val est   = r.getLong(r.fieldIndex("cms_est"))
      val exact = r.getLong(r.fieldIndex("exact_n"))
      assert(est >= exact, s"CMS undercounted user ${r.get(0)}: $est < $exact")
      assert(r.getLong(r.fieldIndex("overcount")) == est - exact)
    }
    // the sketch must cover every key exactly once
    val exactUsers = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(rows.length == exactUsers)
  }

  test("streaming CMS grid answers point queries identically to the batch sketch") {
    import org.apache.spark.sql.streaming.Trigger
    val topic = java.nio.file.Files.createTempDirectory("cmstopic").toString + "/t"
    Tables.events(spark, dir).repartition(4).write.parquet(topic)
    val q = graft.streaming.EventStream.cmsCells(
        graft.streaming.EventStream.ingest(spark, topic, 1))
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete")
      .option("checkpointLocation",
              java.nio.file.Files.createTempDirectory("cmsckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // point-read every user's estimate from the STREAMED grid and
    // compare with the oracle-checked batch query's rows
    val grid = spark.table("cms_cells")
      .select(col("d").as("gd"), col("cell").as("gcell"), col("cnt"))
    val keyed = queries.StatsQueries.withCmsCells(
      Tables.events(spark, dir).groupBy("user_id").agg(count(lit(1)).as("exact_n")),
      "user_id")
    val streamedEst = keyed
      .join(grid, col("d") === col("gd") && col("cell") === col("gcell"))
      .groupBy("user_id")
      .agg(min(col("cnt")).as("cms_est"), min(col("exact_n")).as("exact_n"))
    val batch = SparkEntry.queries("el_cms_counts")(spark, dir)
      .select(col("user_id"), col("cms_est"), col("exact_n"))
    assert(streamedEst.exceptAll(batch).isEmpty && batch.exceptAll(streamedEst).isEmpty)
  }

  test("el_bitmap_overlap: packed-word intersections equal brute-force set intersections") {
    val tu = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val rows = SparkEntry.queries("el_bitmap_overlap")(spark, dir).collect()
    assert(rows.length == tu.keys.toSeq.combinations(2).size)
    for (r <- rows) {
      val (ta, tb) = (r.getString(0), r.getString(1))
      val (sa, sb) = (tu(ta), tu(tb))
      assert(r.getLong(r.fieldIndex("users_a")) == sa.size)
      assert(r.getLong(r.fieldIndex("users_b")) == sb.size)
      val inter = (sa & sb).size
      assert(r.getLong(r.fieldIndex("overlap")) == inter, s"($ta,$tb)")
      val jac = inter.toDouble / (sa.size + sb.size - inter).toDouble
      assert(math.abs(r.getDouble(r.fieldIndex("jaccard")) - jac) < 1e-12)
    }
  }

  test("ss_semdedup: verdicts match a brute-force greedy pass over the cells") {
    val rows = SparkEntry.queries("ss_semdedup")(spark, dir).collect()
    assert(rows.nonEmpty)
    // brute force: raw vectors + the query's own cell assignment (the
    // trained quantizer is the shared artifact under test elsewhere);
    // dominance (ANY smaller-id cell-mate above τ) recomputed in Scala.
    val vecs = Tables.embeddings(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cells = rows.groupBy(_.getInt(1))
    for ((_, members) <- cells; m <- members) {
      val vid  = m.getLong(0)
      val kept = m.getInt(m.fieldIndex("kept")) == 1
      val dominated = members.exists { o =>
        o.getLong(0) < vid && cos(vecs(o.getLong(0)), vecs(vid)) >= 0.25
      }
      assert(kept == !dominated, s"vec $vid kept=$kept dominated=$dominated")
    }
  }

  test("ta_mixture_weights: weights normalize and boost compresses extremes") {
    val rows = SparkEntry.queries("ta_mixture_weights")(spark, dir).collect()
    assert(rows.nonEmpty)
    val wSum = rows.map(_.getDouble(rows.head.fieldIndex("weight"))).sum
    assert(math.abs(wSum - 1.0) < 1e-6, s"weights sum to $wSum")
    val sSum = rows.map(_.getDouble(rows.head.fieldIndex("natural_share"))).sum
    assert(math.abs(sSum - 1.0) < 1e-9)
    // temperature < 1 upweights small sources, downweights large ones:
    // boost must be antitone in token count across the extremes
    val byTok = rows.sortBy(_.getLong(rows.head.fieldIndex("n_tokens")))
    val bIdx  = rows.head.fieldIndex("boost")
    assert(byTok.head.getDouble(bIdx) > byTok.last.getDouble(bIdx),
      "smallest source should get the larger boost")
    for (r <- rows)
      assert(math.abs(r.getDouble(bIdx) -
        r.getDouble(r.fieldIndex("weight")) / r.getDouble(r.fieldIndex("natural_share"))) < 1e-12)
  }

  test("el_anomaly_zscore: returned rows are the true per-type |z| top-5") {
    val rows = SparkEntry.queries("el_anomaly_zscore")(spark, dir).collect()
    assert(rows.nonEmpty)
    // brute force from raw events
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = ev.groupBy(_._2)
    for ((t, es) <- byType) {
      val cs   = es.map { case (_, _, v) => math.round(v * 100).toDouble }
      val mean = cs.sum / cs.length
      val std  = math.sqrt(cs.map(c => c * c).sum / cs.length - mean * mean)
      val top = es.map { case (id, _, v) =>
          (id, math.abs((math.round(v * 100).toDouble - mean) / std))
        }.sortBy { case (id, za) => (-za, id) }.take(5).map(_._1)
      val got = rows.filter(_.getString(1) == t).sortBy(_.getInt(rows.head.fieldIndex("rank")))
        .map(_.getLong(0)).toSeq
      assert(got == top.toSeq, s"type $t: $got vs $top")
    }
  }
}
