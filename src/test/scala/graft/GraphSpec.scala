package graft

import org.apache.spark.sql.functions._

/** Invariants for the batch-3 additions: label propagation on constructed
  * graphs (where the expected communities are known by hand), plus
  * brute-force recomputes for the trigram miner and the length Gini.
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("propagate: barbell graph separates into its two triangles") {
    // two triangles {1,2,3} and {4,5,6} bridged by edge 3-4 — hand-traced
    // synchronous min-tiebroken LPA converges to communities {1} and {3}
    // after 3 rounds
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
                (4L, 5L), (4L, 6L), (5L, 6L)).toDF("s_a", "s_b")
    val (traj, labels) = graft.queries.GraphQueries.propagate(e, 3)
    val t = traj.collect().sortBy(_.getAs[Long]("round"))
    // round 1: every node must change (no self-vote, identity start)
    assert(t.head.getAs[Long]("n_changed") == 6L)
    assert(t.last.getAs[Long]("n_communities") == 2L)
    assert(t.last.getAs[Long]("n_largest") == 3L)
    val byNode = labels.collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("label")).toMap
    assert(Set(1L, 2L, 3L).map(byNode) == Set(1L))
    assert(Set(4L, 5L, 6L).map(byNode) == Set(3L))
  }

  test("q66_label_prop: trajectory accounting on the corpus support graph") {
    val t = run("q66_label_prop").collect().sortBy(_.getAs[Long]("round"))
    assert(t.length == 3)
    t.foreach { r =>
      assert(r.getAs[Long]("n_communities") >= 1L)
      assert(r.getAs[Long]("n_largest") >= 1L)
      // the largest community can never exceed the node universe implied
      // by changed + unchanged labels (all nodes carry a label each round)
      assert(r.getAs[Long]("n_largest") <= 10000L)
    }
    // identity start + no self-vote ⇒ round 1 relabels every node
    assert(t.head.getAs[Long]("n_changed") > 0L)
  }

  test("q71_link_predict: brute-force common-neighbor/Jaccard recompute at sf0.001") {
    val got = run("q71_link_predict").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // rebuild the same sparse head driver-side, straight from the declared query's
    // own edge frame: predicted pairs must be non-edges with true CN counts
    val edges = got // sanity only if non-empty
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
    // recompute the top-500 edge set exactly as the query does
    val e0 = graft.queries.GraphQueries.sparseHead(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    e0.foreach { case (a, b) =>
      adj(a) = adj.getOrElse(a, Set.empty) + b
      adj(b) = adj.getOrElse(b, Set.empty) + a
    }
    val eset = e0.toSet
    val all = adj.keys.toSeq.sorted
    val cands = for {
      i <- all.indices; j <- (i + 1) until all.length
      a = all(i); b = all(j)
      if !eset.contains((a, b))
      cn = (adj(a) intersect adj(b)).size if cn > 0
    } yield {
      val (da, db) = (adj(a).size.toLong, adj(b).size.toLong)
      (a, b, cn.toLong, da, db, cn.toLong * 10000 / (da + db - cn))
    }
    val expect = cands.sortBy(t => (-t._3, -t._6, t._1, t._2)).take(20)
    assert(got.toSeq === expect)
    assert(edges.forall { case (a, b, cn, da, db, _) =>
      cn <= math.min(da, db) && a < b }, "CN bounded by min degree; canonical order")
  }

  test("el_path_trigrams: brute-force recompute at sf0.001") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("tus"),
              col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("tus"),
                 r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val expected = ev.groupBy(_._1).values.flatMap { rows =>
      val seq = rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq
      seq.sliding(3).filter(_.length == 3).map(w => (w(0), w(1), w(2)))
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val top = expected.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
    val got = run("el_path_trigrams").collect()
      .map(r => ((r.getAs[String]("t1"), r.getAs[String]("t2"),
                  r.getAs[String]("t3")), r.getAs[Long]("n"))).toSeq
    assert(got == top)
  }

  test("ta_length_gini: brute-force pairwise recompute at sf0.001") {
    val lens = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("l"))
      .collect().map(_.getAs[Long]("l"))
    val n = lens.length.toLong
    val s = lens.sum
    var num = 0L
    for (a <- lens; b <- lens) num += math.abs(a - b)
    val r = run("ta_length_gini").head()
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("sum_len") == s)
    assert(r.getAs[Long]("gini_num") == num)
    assert(r.getAs[Long]("gini_den") == 2L * n * s)
    assert(r.getAs[Long]("gini_ppm") == num * 1000000L / (2L * n * s))
  }
}
