package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Scratch probe: does InjectRuntimeFilter fire on a shuffle join with
  * lowered thresholds in local mode? (dev aid for the q69 design). */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")

    val o = Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val l = Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
    val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    val plan = j.queryExecution.optimizedPlan.toString
    println("=== optimized contains bloom: " + plan.contains("bloom"))
    println(plan.linesIterator.filter(s => s.toLowerCase.contains("bloom") || s.toLowerCase.contains("might")).mkString("\n"))
    val phys = j.queryExecution.executedPlan.toString
    println("=== physical contains BloomFilter: " + phys.toLowerCase.contains("bloom"))
    j.show()
    spark.stop()
  }
}
