package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries guarantees, pinned against exact counts under several
  * partitionings (the summary's CONTENTS are partition-order-dependent;
  * its GUARANTEES are not — that invariance is what this spec checks,
  * and why the sketch has no DuckDB-oracle query). */
class MisraGriesSpec extends SparkSpec {

  import spark.implicits._

  private def summary(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Long] = {
    graft.functions.MisraGries.register(spark)
    df.selectExpr(s"misra_gries(key, $k) AS mg")
      .head().getMap[Long, Long](0).toMap
  }

  test("every heavy hitter survives; estimates are lower bounds within n/(k+1)") {
    val k = 8
    // skewed stream: key i appears ~ n/2^i times plus a uniform tail
    val rows = (1L to 6L).flatMap(i => Seq.fill((2000 >> i.toInt))(i)) ++
               (100L to 400L).map(identity)
    val n = rows.size.toLong
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val thr = n / (k + 1)

    for (parts <- Seq(1, 3, 7)) {
      val df = rows.toDF("key").repartition(parts)
      val mg = summary(df, k)
      assert(mg.size <= k)
      // completeness: every key with true count > n/(k+1) is present
      exact.filter(_._2 > thr).keys.foreach { key =>
        assert(mg.contains(key), s"heavy hitter $key missing at parts=$parts")
      }
      // soundness: every estimate is a lower bound within n/(k+1)
      mg.foreach { case (key, est) =>
        val t = exact(key)
        assert(est <= t, s"$key overestimated: $est > $t")
        assert(t - est <= thr, s"$key error ${t - est} > $thr at parts=$parts")
      }
    }
  }

  test("partial aggregation path: per-group summaries through a real shuffle") {
    graft.functions.MisraGries.register(spark)
    val ev = Tables.events(spark, sf).select(col("event_type"), col("user_id"))
    val exact = ev.groupBy("event_type", "user_id").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val totals = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = 16
    val mg = ev.repartition(8)
      .groupBy("event_type").agg(expr(s"misra_gries(user_id, $k)").as("hh"))
      .collect().map(r => r.getString(0) -> r.getMap[Long, Long](1).toMap).toMap
    mg.foreach { case (et, m) =>
      val thr = totals(et) / (k + 1)
      assert(m.size <= k)
      m.foreach { case (u, est) =>
        val t = exact((et, u))
        assert(est <= t && t - est <= thr,
          s"group $et key $u: est=$est true=$t thr=$thr")
      }
      exact.collect { case ((e2, u), t) if e2 == et && t > thr => u }.foreach { u =>
        assert(m.contains(u), s"group $et heavy hitter $u missing")
      }
    }
  }

  test("k=1 degenerates to the Boyer-Moore majority candidate") {
    val rows = Seq.fill(60)(7L) ++ (1L to 40L) // 7 has strict majority
    val mg = summary(rows.toDF("key").repartition(4), 1)
    assert(mg.keySet === Set(7L))
  }
}
