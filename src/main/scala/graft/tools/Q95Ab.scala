package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 A/B for q95's partial-aggregate degradation (round-9 sf100
  * audit: the (supplier, quarter) group domain grows with the corpus —
  * 28M groups at sf100 — so map-side combine stops collapsing and
  * nearly the whole input crosses the exchange anyway, while every map
  * task still pays the full hash-map build + sort-spill of the partial
  * aggregate it gets nothing from).
  *
  * Arms:
  *   a. declared     — groupBy(suppkey, qtr): partial + final aggregate;
  *   b. repartition  — repartition(suppkey, qtr) THEN groupBy: the
  *                     child's hash partitioning satisfies the
  *                     aggregate's required distribution, so Spark plans
  *                     ONE complete-mode aggregate after the exchange —
  *                     the same rows cross the wire (they crossed under
  *                     (a) too, uncollapsed), but no map-side hash build
  *                     is paid. This is the "skip useless partial agg"
  *                     rewrite expressible in the public DataFrame API.
  *
  * `runMain graft.tools.Q95Ab [sfDir] [reps]`
  */
object Q95Ab {
  def main(args: Array[String]): Unit = {
    val d    = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Portable.cents

    def revProj: DataFrame = graft.Tables.lineitem(spark, d)
      .select(col("l_suppkey"),
              expr("year(l_shipdate) * 10 + (month(l_shipdate) + 2) div 3")
                .cast("long").as("qtr"),
              (cents(col("l_extendedprice")) * cents(lit(1) - col("l_discount")))
                .as("rev_c"))

    def finish(rev: DataFrame): DataFrame = rev
      .withColumn("rnk", rank().over(
        Window.partitionBy("qtr").orderBy(col("rev_c").desc)))
      .filter(col("rnk") <= 3)
      .select(col("qtr"), col("rnk").cast("long").as("rnk"),
              col("l_suppkey"), col("rev_c"))
      .orderBy("qtr", "rnk", "l_suppkey")

    def declared: DataFrame =
      finish(revProj.groupBy("l_suppkey", "qtr").agg(sum("rev_c").as("rev_c")))

    def repart: DataFrame =
      finish(revProj.repartition(col("l_suppkey"), col("qtr"))
        .groupBy("l_suppkey", "qtr").agg(sum("rev_c").as("rev_c")))

    def time(tag: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // result parity first (order-insensitive): the rewrite must be exact
    val a = declared.collect().map(_.toSeq).toSet
    val b = repart.collect().map(_.toSeq).toSet
    println(s"parity: ${a == b} (${a.size} rows)")

    for (r <- 1 to reps) {
      time(s"declared   rep$r", declared)
      time(s"repartition rep$r", repart)
    }
    spark.stop()
  }
}
