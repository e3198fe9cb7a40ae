package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.ApproxDistinctRewrite

/** Dev aid: A/B the [[graft.plans.ApproxDistinctRewrite]] performance
  * mode on COUNT(DISTINCT) shapes at a given SF — the measurement the
  * rule's existence claim rests on (off by default; no oracle query runs
  * with it on). Two shapes:
  *
  *   - `pure`: per-day COUNT(DISTINCT user_id) — the el_hll_daily shape;
  *     exact planning is a two-level hash aggregate (distinct expand-free
  *     fast path).
  *   - `mixed`: COUNT(DISTINCT user_id) + COUNT(*) + SUM(value) per day —
  *     exact planning goes through RewriteDistinctAggregates' Expand
  *     (multiplies the scan by the aggregate count), which is where the
  *     sketch rewrite is expected to pay.
  *
  * `runMain graft.tools.ApproxAb [sfDir] [reps] [distinctCol]` — prints
  * warm per-rep seconds for each (shape, mode) and the estimate/exact
  * counts so the error bound is visible next to the speedup.
  * `distinctCol` defaults to `user_id` (low cardinality — the
  * el_hll_daily shape); pass `event_id` for the row-scale-distinct case
  * the rewrite exists for.
  */
object ApproxAb {
  def main(args: Array[String]): Unit = {
    val d    = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val dcol = if (args.length > 2) args(2) else "user_id"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ApproxDistinctRewrite.install(spark)

    val ev = Tables.events(spark, d)
      .select(to_date(col("ts")).as("day"), col(dcol), col("value"))

    def pure()  = ev.groupBy("day").agg(count_distinct(col(dcol)).as("du"))
    def mixed() = ev.groupBy("day").agg(
      count_distinct(col(dcol)).as("du"),
      count(lit(1)).as("n"), sum(col("value")).as("sv"))

    def run(tag: String, mode: Boolean, f: () => org.apache.spark.sql.DataFrame): Unit = {
      spark.conf.set(ApproxDistinctRewrite.ConfKey, mode.toString)
      f().count() // warm: plan + codegen outside the timed reps
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        f().count()
        println(f"$tag%-14s rep$i: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      spark.conf.set(ApproxDistinctRewrite.ConfKey, "false")
    }

    run("pure/exact",   mode = false, pure _)
    run("pure/approx",  mode = true,  pure _)
    run("mixed/exact",  mode = false, mixed _)
    run("mixed/approx", mode = true,  mixed _)

    // error visibility: total distinct, exact vs sketch
    spark.conf.set(ApproxDistinctRewrite.ConfKey, "false")
    val exact = ev.agg(count_distinct(col(dcol))).head().getLong(0)
    spark.conf.set(ApproxDistinctRewrite.ConfKey, "true")
    val est = ev.agg(count_distinct(col(dcol))).head().getLong(0)
    spark.conf.set(ApproxDistinctRewrite.ConfKey, "false")
    println(f"distinct $dcol%s: exact=$exact approx=$est err=${
      math.abs(est - exact).toDouble / math.max(exact, 1L) * 100}%.2f%%")
    spark.stop()
  }
}
