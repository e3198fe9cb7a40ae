package graft

import org.apache.spark.sql.functions._

/** Brute-force validation of `q57_triangle_census`: rebuild the support
  * graph in plain Scala (degree-capped co-supply pairs → top-K edges),
  * enumerate triangles naively over the adjacency sets, and compare
  * every summary column. At sf0.001 the graph is the complete K10
  * (every supplier pair co-supplies), so the expected census is also
  * checkable in closed form — a second, independent witness.
  */
class TriangleSpec extends SparkSpec {

  test("q57_triangle_census matches naive enumeration (and K10 closed form)") {
    val row = SparkEntry.queries("q57_triangle_census")(spark, sf).collect().head

    // rebuild: distinct (cust, supp) edges, degree cap 40, pair counts
    val ol = Tables.orders(spark, sf)
      .select(col("o_custkey").as("cust"), col("o_orderkey"))
      .join(Tables.lineitem(spark, sf)
              .select(col("l_orderkey"), col("l_suppkey").as("supp")),
            col("o_orderkey") === col("l_orderkey"))
      .select("cust", "supp").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = ol.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
      .filter(_._2.length <= 40)
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((_, supps) <- bySupp; i <- supps.indices; j <- (i + 1) until supps.length)
      pairCounts((supps(i), supps(j))) =
        pairCounts.getOrElse((supps(i), supps(j)), 0L) + 1L
    val edges = pairCounts.toSeq
      .sortBy { case ((a, b), ns) => (-ns, a, b) }.take(5000).map(_._1)

    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val edgeSet = edges.toSet
    val triangles = (for {
      (a, b) <- edges
      c <- adj(a) if c != b && adj(b).contains(c)
    } yield Set(a, b, c)).distinct.length

    assert(row.getAs[Long]("n_nodes") === nodes.length.toLong)
    assert(row.getAs[Long]("n_edges") === edges.length.toLong)
    assert(row.getAs[Long]("n_wedges") === wedges)
    assert(row.getAs[Long]("n_triangles") === triangles.toLong)
    assert(row.getAs[Long]("closure_ppm") ===
      (if (wedges == 0) 0L else 3000000L * triangles / wedges))

    // closed-form witness: sf0.001's support graph is the complete K10
    if (nodes.length == 10 && edges.length == 45) {
      assert(triangles === 120) // C(10,3)
      assert(wedges === 360)    // 10 * C(9,2)
      assert(row.getAs[Long]("closure_ppm") === 1000000L) // fully closed
    }
  }
}
