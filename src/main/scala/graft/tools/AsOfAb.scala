package graft.tools

import graft.Tables
import graft.plans.AsOf
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B/C of the three as-of join formulations on the q85 workload
  * (events enriched with the latest prior order), same output contract:
  *
  *   native  — AsOfJoinExec: shuffle each side once, streamed merge
  *   bcast   — BroadcastAsOfJoinExec: ship orders whole, index per
  *             executor, stream events unshuffled and unsorted
  *   expand  — inequality join then window rn=1 (the q19 family)
  *   union   — union both sides into one frame, window last(ignoreNulls)
  *             (the el_asof_snapshot / q74 family)
  *
  * `runMain graft.tools.AsOfAb <sfDir> [dimDir]`; prints warm medians and
  * asserts all variants produce identical checksums first. The optional
  * `dimDir` reads ORDERS from a different scale than events — the
  * growing-fact / fixed-dimension regime where the broadcast form is the
  * designed winner (a 100 TB fact enriched against a snapshot dim). Dev
  * aid, not part of the driver contract — the measured numbers live in
  * SCALING.md.
  */
object AsOfAb {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dimD = if (args.length > 1) args(1) else d
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def e = Tables.events(spark, d).select("event_id", "user_id", "ts")
    def o = Tables.orders(spark, dimD).select(
      col("o_orderkey"), col("o_custkey"),
      col("o_orderdate").cast("timestamp").as("ots"), col("o_totalprice"))

    def native(): DataFrame =
      AsOf.join(e, o, Seq("user_id"), Seq("o_custkey"), "ts", "ots", Seq("o_orderkey"),
          broadcastRight = Some(false))
        .select(col("event_id"), col("o_orderkey").as("k"),
          col("o_totalprice").as("p"), col("ots").as("t"))

    def bcast(): DataFrame =
      AsOf.join(e, o, Seq("user_id"), Seq("o_custkey"), "ts", "ots", Seq("o_orderkey"),
          broadcastRight = Some(true))
        .select(col("event_id"), col("o_orderkey").as("k"),
          col("o_totalprice").as("p"), col("ots").as("t"))

    def expand(): DataFrame = {
      val j = e.join(o, col("user_id") === col("o_custkey") && col("ots") <= col("ts"), "left")
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("ots").desc_nulls_last, col("o_orderkey").desc_nulls_last)
      j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_id"), col("o_orderkey").as("k"),
          col("o_totalprice").as("p"), col("ots").as("t"))
    }

    def union(): DataFrame = {
      // one frame, ordered so every order at time <= ts precedes the event
      // row; last(ignoreNulls) carries the most recent order forward.
      val ev = e.select(col("user_id").as("u"), col("ts").as("at"), lit(1).as("is_ev"),
        col("event_id"), lit(null: java.lang.Long).as("o_orderkey"),
        lit(null: java.lang.Double).as("o_totalprice"), lit(null).cast("timestamp").as("ots"))
      val or = o.select(col("o_custkey").as("u"), col("ots").as("at"), lit(0).as("is_ev"),
        lit(null: java.lang.Long).as("event_id"), col("o_orderkey"),
        col("o_totalprice"), col("ots"))
      val w = Window.partitionBy(col("u"))
        .orderBy(col("at"), col("is_ev"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.unionByName(or)
        .withColumn("k", last(col("o_orderkey"), ignoreNulls = true).over(w))
        .withColumn("p", last(col("o_totalprice"), ignoreNulls = true).over(w))
        .withColumn("t", last(col("ots"), ignoreNulls = true).over(w))
        .filter(col("is_ev") === 1)
        .select("event_id", "k", "p", "t")
    }

    def checksum(df: DataFrame): String =
      df.agg(count(lit(1)), sum(col("event_id").cast("decimal(38,0)")),
        sum(col("k").cast("decimal(38,0)")),
        sum(unix_micros(col("t")).cast("decimal(38,0)"))).collect()(0).toString

    val variants = Seq("native" -> native _, "bcast" -> bcast _,
      "expand" -> expand _, "union" -> union _)
    val sums = variants.map { case (n, f) => n -> checksum(f()) }
    require(sums.map(_._2).distinct.size == 1, s"variants disagree: $sums")
    println(s"checksum ok: ${sums.head._2}")

    for ((name, f) <- variants) {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name%-8s median=${times(2)}%6.2f s  min=${times.head}%6.2f  max=${times.last}%6.2f")
    }
  }
}
