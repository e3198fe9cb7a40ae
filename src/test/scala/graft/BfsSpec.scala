package graft

import org.apache.spark.sql.functions._

/** q83_bfs_reach: the corpus support graph is near-complete at test
  * SFs (everything is 1 hop from the seed — the oracle row count says
  * so), so the ROUND LOGIC is driven here on constructed graphs where
  * depth, unreachability, and the bounded-round cutoff all fire.
  */
class BfsSpec extends SparkSpec {

  import graft.queries.RelationalQueries15.bfsFrom

  private def undirected(pairs: (Long, Long)*) = {
    import spark.implicits._
    val e0 = pairs.toDF("u", "v")
    e0.union(e0.select(col("v"), col("u")))
  }

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("a chain reports one node per hop, cut off at the round bound") {
    // 0-1-2-3-4-5-6: rounds=4 must reach 0..4 and NOT see 5, 6
    val e = undirected((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val m = asMap(bfsFrom(e, 0L, 4))
    assert(m == Map(0L -> (1L, 0L), 1L -> (1L, 1L), 2L -> (1L, 2L),
                    3L -> (1L, 3L), 4L -> (1L, 4L)), m)
  }

  test("shortest path wins when a long and a short route coexist") {
    // 0-1-2-3 and the shortcut 0-3: node 3 must report dist 1, and the
    // frontier discipline must not resurrect it at dist 3
    val e = undirected((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))
    val m = asMap(bfsFrom(e, 0L, 4))
    assert(m(1L) == (2L, 4L), m) // nodes 1 and 3 both at dist 1
    assert(m(2L) == (1L, 2L), m)
    assert(!m.contains(3L))
  }

  test("disconnected components never appear") {
    val e = undirected((0L, 1L), (10L, 11L), (11L, 12L))
    val m = asMap(bfsFrom(e, 0L, 4))
    assert(m.values.map(_._1).sum == 2L, m) // just 0 and 1
    assert(m.keySet == Set(0L, 1L))
  }

  test("corpus query: hop-0 is the seed alone and counts cover the graph") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q83_bfs_reach")(spark, dir).collect()
    assert(rows.head.getLong(0) == 0L && rows.head.getLong(1) == 1L)
    // every reported node is in the support graph's node set (≤ count)
    val total = rows.map(_.getLong(1)).sum
    assert(total >= 1)
  }
}
