package graft

import org.apache.spark.sql.functions._

/** Connected-component invariants for the duplicate-cluster stage (the
  * oracle already cross-checks values against a recursive-CTE closure;
  * these assert the graph semantics directly).
  */
class ClusterSpec extends SparkSpec {

  test("dup clusters: candidate pairs land in one cluster; ids are component minima") {
    val clusters = SparkEntry.queries("dd_dup_clusters")(spark, sf)
      .select("doc_id", "cluster_id", "cluster_size")
    val lab = clusters.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // transitivity: every candidate edge connects same-cluster docs
    val pairs = SparkEntry.queries("dd_minhash_pairs")(spark, sf)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(lab(a) == lab(b), s"edge ($a,$b) split across clusters")
    }

    // the cluster id IS the minimum member id of its component
    val byCluster = lab.groupBy(_._2).view.mapValues(_.keys.min)
    byCluster.foreach { case (cid, minDoc) =>
      assert(cid == minDoc, s"cluster $cid not its min member $minDoc")
    }

    // sizes agree with membership counts
    val sizes = clusters.collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    val expected = lab.groupBy(_._2).map { case (c, m) => (c, m.size.toLong) }.toSet
    assert(sizes == expected)

    // survivors view is consistent: one row per cluster, dropped = size-1
    val surv = SparkEntry.queries("dd_dedup_survivors")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(surv.map(_._1).toSet == lab.values.toSet)
    surv.foreach { case (cid, members, dropped) =>
      assert(dropped == members - 1)
      assert(members == lab.count(_._2 == cid))
    }
  }
}
