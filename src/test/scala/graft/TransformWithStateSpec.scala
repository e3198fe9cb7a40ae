package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{EventStream, UserStatsProcessor}

/** transformWithState (modern stateful API) — final per-user state must
  * equal the batch aggregates, across multiple micro-batches. */
class TransformWithStateSpec extends SparkSpec {

  test("UserStatsProcessor final state matches batch per-user aggregates") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = Files.createTempDirectory("tws").toString + "/t"
      Tables.events(spark, sf).limit(600).repartition(3).write.parquet(dir)
      val out = UserStatsProcessor(
        EventStream.typed(EventStream.ingest(spark, dir, maxFilesPerTrigger = 1)))
      val q = out.toDF().writeStream.format("memory").queryName("tws")
        .outputMode("update")
        .option("checkpointLocation", Files.createTempDirectory("tws-ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // last update per user is the committed state
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("n_events").desc)
      val finalState = spark.table("tws")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "n_events", "total_cents", "max_event_id")
      val want = spark.read.parquet(dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
             sum(round(col("value") * 100).cast("long")).as("total_cents"),
             max(col("event_id")).as("max_event_id"))
      assert(finalState.exceptAll(want).isEmpty && want.exceptAll(finalState).isEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
