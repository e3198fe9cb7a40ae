package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Scale-posture plan checks: partition pruning on partitioned topics and
  * join-strategy hints. */
class PartitionPruningSpec extends SparkSpec {

  test("sharded topic reads prune partitions on the shard predicate") {
    val dir = Files.createTempDirectory("prune").toString + "/t"
    Topic.publishPartitioned(Tables.events(spark, sf), dir, shards = 4)
    val q    = spark.read.parquet(dir).filter(col("shard") === 2)
    val plan = q.queryExecution.executedPlan.toString
    // the shard predicate must land in PartitionFilters (pruned at
    // planning), not PushedFilters (evaluated per row group)
    assert(plan.contains("PartitionFilters: [isnotnull(shard"), plan)
    assert(q.count() === Tables.events(spark, sf)
      .filter(pmod(col("event_id"), lit(4)) === 2).count())
  }

  test("join strategy hints are honored (shuffle_hash vs default sort-merge)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val l = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf)
      val defaultPlan = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(defaultPlan.contains("SortMergeJoin"), defaultPlan)
      val hinted = l.join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(hinted.contains("ShuffledHashJoin"), hinted)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
