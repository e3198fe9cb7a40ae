package graft.queries

import org.apache.spark.sql.functions._

/** k-core peeling: the declared query's trajectory invariants on the
  * corpus graph, plus the peel loop driven on a constructed graph where
  * peeling actually fires (the test-SF support graph is near-complete,
  * so the corpus run alone would never exercise a removal).
  */
class KcoreSpec extends graft.SparkSpec {

  test("peel: constructed clique+tail graph peels to the known 3-core") {
    // K5 on nodes 1..5 (degrees ≥ 4), a pendant path 5-10-11, and a
    // detached triangle 20-21-22 (degrees 2 — below k=3)
    val clique = for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)
    val edges = clique ++ Seq((5L, 10L), (10L, 11L), (20L, 21L), (20L, 22L), (21L, 22L))
    val e0 = spark.createDataFrame(edges).toDF("s_a", "s_b")
    val out = RelationalQueries10.peel(e0, k = 3, rounds = 3).collect()

    // round 1: 10, 11, 20, 21, 22 peel (degrees 2,1,2,2,2); K5 survives
    val r1 = out(0)
    assert(r1.getAs[Long]("n_nodes") == 5)
    assert(r1.getAs[Long]("n_removed") == 5)
    assert(r1.getAs[Long]("n_edges") == 10)
    // rounds 2-3: fixpoint — the K5 is the 3-core, nothing else moves
    Seq(out(1), out(2)).foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 5)
      assert(r.getAs[Long]("n_removed") == 0)
      assert(r.getAs[Long]("n_edges") == 10)
    }
  }

  test("peel: cascade graph — a chain collapses entirely under k=2 over rounds") {
    // path 1-2-3-4-5: endpoints peel first, then the chain unravels
    // inward one node per side per round — exercises MULTI-round decay
    val path = (1L to 4L).map(i => (i, i + 1))
    val e0 = spark.createDataFrame(path).toDF("s_a", "s_b")
    val out = RelationalQueries10.peel(e0, k = 2, rounds = 3).collect()
    assert(out(0).getAs[Long]("n_nodes") == 3)  // 2,3,4 survive round 1
    assert(out(0).getAs[Long]("n_removed") == 2) // endpoints 1, 5
    assert(out(0).getAs[Long]("n_edges") == 2)  // 2-3, 3-4
    assert(out(1).getAs[Long]("n_nodes") == 1)  // only 3 has degree 2... peeled next
    assert(out(1).getAs[Long]("n_removed") == 2) // 2 and 4 drop below k
    assert(out(2).getAs[Long]("n_nodes") == 0)  // chain fully dissolved
    assert(out(2).getAs[Long]("n_removed") == 1) // node 3, ISOLATED by round 2's
                                                 // peel — counted via the
                                                 // survivor-baseline accounting
    assert(out(2).getAs[Long]("n_edges") == 0)
    // the trajectory reconciles: survivors + all removals = input nodes
    assert(out(2).getAs[Long]("n_nodes") +
      out.map(_.getAs[Long]("n_removed")).sum == 5)
  }

  test("q63_kcore: corpus trajectory is monotone and convergence-consistent") {
    val rows = graft.SparkEntry.queries("q63_kcore")(spark, sf).collect()
    assert(rows.length == 4)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_nodes") <= a.getAs[Long]("n_nodes"), "nodes grew")
      assert(b.getAs[Long]("n_edges") <= a.getAs[Long]("n_edges"), "edges grew")
      // survivor-baseline accounting: removals explain the node drop exactly
      assert(b.getAs[Long]("n_nodes") + b.getAs[Long]("n_removed") ==
        a.getAs[Long]("n_nodes"), "n_removed does not reconcile")
      // a converged round stays converged with identical state
      if (a.getAs[Long]("n_removed") == 0) {
        assert(b.getAs[Long]("n_removed") == 0)
        assert(b.getAs[Long]("n_nodes") == a.getAs[Long]("n_nodes"))
        assert(b.getAs[Long]("n_edges") == a.getAs[Long]("n_edges"))
      }
    }
  }
}
