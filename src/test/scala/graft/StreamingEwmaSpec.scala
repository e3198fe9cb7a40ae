package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{DayCount, EwmaStream}

/** Streaming EWMA ≡ batch recursive CTE, bit-exact, with state carried
  * across micro-batches and late days dropped. */
class StreamingEwmaSpec extends SparkSpec {

  test("EwmaStream equals the batch smoother per series and the declared query globally") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      // densified per-type daily series over the global calendar (the
      // same zero-fill contract the batch query implements)
      val daily = Tables.events(spark, sf)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c")).collect()
        .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      val allDays = {
        val ds = daily.map(_._2)
        val d0 = ds.min(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
        val d1 = ds.max(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
        (0 to (d1.toEpochDay - d0.toEpochDay).toInt).map(i => d0.plusDays(i.toLong))
      }
      val types = daily.map(_._1).distinct.sorted
      val byKey = daily.groupBy(r => (r._1, r._2)).view.mapValues(_.head._3).toMap
      val dense = for {
        t <- types; (d, i) <- allDays.zipWithIndex
      } yield DayCount(t, i + 1, byKey.getOrElse((t, d), 0L))

      // plus the global series, to compare against the declared query
      val globalByDay = daily.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val all = allDays.zipWithIndex.map { case (d, i) =>
        DayCount("__all", i + 1, globalByDay.getOrElse(d, 0L)) }

      val rows = (dense ++ all).toVector
      val (first, second) = rows.partition(_.di <= allDays.length / 2)

      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[DayCount]
      val q = EwmaStream(mem.toDS()).toDF()
        .writeStream.format("memory").queryName("ewma_s").outputMode("append")
        .option("checkpointLocation", Files.createTempDirectory("ewma-ckpt").toString)
        .start()
      // a series whose FIRST arrival is mid-chain must not seed (the
      // anchor-only rule); it recovers when day 1 and the replayed day
      // arrive in order
      mem.addData(DayCount("__gap", 2, 70L)); q.processAllAvailable()
      mem.addData(first: _*); q.processAllAvailable()
      // replay a stale day to prove the late-drop rule
      mem.addData(DayCount("__all", 1, 999L)); q.processAllAvailable()
      mem.addData(second: _*); q.processAllAvailable()
      mem.addData(DayCount("__gap", 1, 40L), DayCount("__gap", 2, 70L))
      q.processAllAvailable()
      q.stop()

      val got = spark.table("ewma_s").collect()
        .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap

      // driver-side sequential fold, same arithmetic
      (types :+ "__all").foreach { t =>
        var level = 0.0
        rows.filter(_.series == t).sortBy(_.di).zipWithIndex.foreach { case (r, i) =>
          level = if (i == 0) r.n.toDouble else (r.n.toDouble + level) / 2
          assert(got((t, r.di)) === ((r.n, level)), s"$t di=${r.di}")
        }
      }
      // the unseeded mid-chain row emitted nothing; the in-order replay
      // then seeded at day 1 and folded day 2 exactly like the batch
      assert(got(("__gap", 1)) === ((40L, 40.0)))
      assert(got(("__gap", 2)) === ((70L, 55.0)))
      assert(!got.contains(("__gap", 3)))
      assert(got.size === rows.size + 2, "late replay must not emit")

      // the global series equals the declared batch query, bit-exact
      val batch = SparkEntry.queries("el_ewma_forecast")(spark, sf)
        .orderBy("day").collect()
      batch.zipWithIndex.foreach { case (r, i) =>
        assert(got(("__all", i + 1))._2 === r.getDouble(2), s"batch twin day ${i + 1}")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
