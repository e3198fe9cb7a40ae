package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 A/B (round-7 verdict item 6): Spark's AQE skew-join split vs
  * `plans/SkewPlanner`'s manual salting, measured on a synthesized
  * hot-key fixture at suite scales — the numbers behind SCALING.md's
  * "when does the advisory defer to AQE" rule.
  *
  * `runMain graft.tools.SkewAb [rows] [reps]` (default 6M — the sf1
  * events shape; use 60M for the sf10 decade). Fixture: one user holds
  * 50% of the fact rows, 149 cold users share the rest; dim = one row
  * per user. Join is pinned to sort-merge (broadcast would dissolve the
  * exchange under test — the regime salting exists for is
  * dim-NOT-broadcastable). Three arms, identical results:
  *
  *   aqe_skew — AQE on, skewJoin on, DEFAULT size thresholds (the
  *              question is whether real-scale partitions trip them);
  *   salted   — AQE coalescing on but skewJoin off, SkewPlanner's
  *              (key, salt) join;
  *   naive    — AQE skewJoin off, plain shuffle join: the hot key's
  *              whole row mass on one reducer (the failure mode).
  */
object SkewAb {

  private def timed(body: => Long): (Double, Long) = {
    val t0 = System.nanoTime(); val n = body
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 6000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = s"/tmp/skewab/$rows"
    val fact = s"$dir/fact.parquet"; val dim = s"$dir/dim.parquet"
    if (!new java.io.File(fact).exists()) {
      spark.range(rows).select(
        col("id").as("event_id"),
        when(col("id") < rows / 2, lit(0L))
          .otherwise(pmod(col("id"), lit(149)) + 1L).as("user_id"),
        md5(col("id").cast("string")).as("props"))
        .write.mode("overwrite").parquet(fact)
      spark.range(150).select(col("id").as("user_id"),
        md5(col("id").cast("string")).as("tag"))
        .write.mode("overwrite").parquet(dim)
    }

    def frames(): (DataFrame, DataFrame) =
      (spark.read.parquet(fact), spark.read.parquet(dim))

    // The measured body: join + aggregate (tiny result, real shuffle).
    // Both wide columns are kept LIVE through to the final output —
    // otherwise Catalyst prunes them out of the scan and the shuffled
    // fact row collapses to the 8-byte key (measured: the hot partition
    // then compresses below AQE's 256 MB skew threshold and NO arm is
    // ever skewed in bytes). collect(), not head(): Dataset.head runs a
    // separate limit-QueryExecution, so the plan inspected afterwards
    // would be the never-executed initial plan.
    def body(joined: DataFrame): DataFrame =
      joined.groupBy("user_id")
        .agg(count(lit(1)).as("n"), max("tag").as("mt"),
             sum(length(col("props"))).as("sl"))
        .agg(sum("n"), max("mt"), sum("sl"))
    def run(joined: DataFrame): Long =
      body(joined).collect()(0).getLong(0)

    // did AQE actually split the join? (answers "do real-scale partitions
    // trip the DEFAULT thresholds", the question this tool exists for)
    def skewSplit(joined: DataFrame): Boolean = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      val fin = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      def nodes(p: SparkPlan): Seq[SparkPlan] =
        p.collect { case n => n }.flatMap {
          case q: QueryStageExec => q +: nodes(q.plan)
          case n                 => Seq(n)
        }
      if (sys.env.contains("SKEWAB_DEBUG")) println(fin.toString)
      nodes(fin).exists {
        case j: SortMergeJoinExec => j.isSkewJoin
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.isSkewJoin
        case _ => false
      }
    }

    def withConf(pairs: (String, String)*)(body: => (Double, Long)): (Double, Long) = {
      val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    val noBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    for (rep <- 1 to reps) {
      val (f, d) = frames()

      var aqeSplit = false
      val (tAqe, nAqe) = withConf(noBroadcast ++ Seq(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true"): _*) {
        // inspect the EXECUTED query's final adaptive plan (the join
        // subtree alone would only show the pre-execution initial plan)
        val q = body(f.join(d, "user_id"))
        val r = timed(q.collect()(0).getLong(0))
        aqeSplit = skewSplit(q)
        r
      }
      // same arm with forceOptimizeSkewedJoin: splitting the join breaks
      // the downstream same-key aggregate's reuse of the join's hash
      // partitioning, so stock AQE REFUSES to split (split=false above);
      // force accepts the extra exchange in trade
      var aqeForcedSplit = false
      val (tForce, nForce) = withConf(noBroadcast ++ Seq(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true"): _*) {
        val q = body(f.join(d, "user_id"))
        val r = timed(q.collect()(0).getLong(0))
        aqeForcedSplit = skewSplit(q)
        r
      }
      val (tSalt, nSalt) = withConf(noBroadcast ++ Seq(
        "spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
        timed {
          val (strat, j) = graft.plans.SkewPlanner
            .skewAwareJoin(f, d, "user_id", col("event_id"))
          require(strat == "salted", s"planner chose $strat on the skewed fixture")
          run(j)
        }
      }
      val (tNaive, nNaive) = withConf(noBroadcast ++ Seq(
        "spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
        timed(run(f.join(d, "user_id")))
      }
      require(nAqe == rows && nForce == rows && nSalt == rows && nNaive == rows,
        s"arms disagree: $nAqe / $nForce / $nSalt / $nNaive vs $rows")
      println(f"rows=$rows rep$rep: aqe_skew=$tAqe%.2f s (split=$aqeSplit)  " +
        f"aqe_forced=$tForce%.2f s (split=$aqeForcedSplit)  " +
        f"salted=$tSalt%.2f s  naive=$tNaive%.2f s")
    }
    spark.stop()
  }
}
