package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for ss_semdedup_sweep vs ss_semdedup at a
  * given SF dir — times each sub-plan so the 100×-slower stage is
  * measured, not guessed. `runMain graft.tools.SweepProbe [sfDir]`. */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.FloatDot.register(spark)
    import graft.queries.SimilarityQueries2Probe._
    def timed(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val n = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    val m = members(spark, d)
    timed("members.count")(m.count())
    timed("cells")(m.groupBy("cluster").count().collect().map { r =>
      println(s"  cell ${r.getLong(0)}: ${r.getLong(1)}"); 1L }.sum)
    timed("pairs.count (join only, no dot in output)")(pairCount(spark, d))
    timed("survivors25.count (dot in join cond)")(survivorCount(spark, d, 0.25))
    timed("mx.count (max agg over survivors)")(mxCount(spark, d, 0.25))
    spark.stop()
  }
}
