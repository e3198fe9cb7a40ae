package graft

import org.apache.spark.sql.functions._

/** Pins the round-9 A-ES sampling kernel: graft_es_key must be
  * bit-identical to the declarative route it replaced (8 literal md5
  * draws via hex-substring parse, sliced to the first `weight`) and,
  * per draw, to Portable.h60 — on the corpus keys and on adversarial
  * longs (negative, zero, Long.MaxValue).
  */
class EsKeySpec extends SparkSpec {

  private def declarativeKey(key: org.apache.spark.sql.Column,
                             w: org.apache.spark.sql.Column) = {
    val draws = array((1 to 8).map { j =>
      pmod(functions.Portable.h60(
             concat(key.cast("string"), lit("|es|"), lit(j).cast("string"))),
           lit(1000000L))
    }: _*)
    array_max(slice(draws, lit(1), w.cast("int")))
  }

  test("graft_es_key equals the declarative md5 route on corpus keys") {
    functions.EsKey.register(spark)
    val weight = least(lit(8L),
      lit(1L) + expr("cast(round(o_totalprice * 100) as bigint) div 5000000"))
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderkey"), weight.as("w"))
      .select(col("o_orderkey"),
              expr("graft_es_key(o_orderkey, w)").as("kernel"),
              declarativeKey(col("o_orderkey"), col("w")).as("declarative"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"key ${r.getLong(0)}")
    }
  }

  test("graft_es_key matches h60 draw-by-draw on adversarial keys and every weight") {
    functions.EsKey.register(spark)
    import spark.implicits._
    val keys = Seq(0L, -1L, -987654321L, Long.MaxValue, Long.MinValue + 1, 42L)
    val cases = for (k <- keys; w <- 1L to 8L) yield (k, w)
    val got = cases.toDF("k", "w")
      .select(col("k"), col("w"), expr("graft_es_key(k, w)").as("kernel"),
              declarativeKey(col("k"), col("w")).as("declarative"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === r.getLong(3), s"key ${r.getLong(0)} w ${r.getLong(1)}")
    }
  }
}
