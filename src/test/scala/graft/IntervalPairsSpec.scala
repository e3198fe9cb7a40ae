package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_interval_pairs (the codegen'd q90 kernel) ≡ the HOF fold it
  * replaced, on adversarial groups: duplicates ids, touching intervals,
  * containment, empty/singleton groups, null elements. The DataFrame path
  * exercises whole-stage codegen; a codegen-disabled pass pins the
  * interpreted eval to the same bytes. */
class IntervalPairsSpec extends SparkSpec {

  import spark.implicits._

  // (group, id, startDay, endDay) — days keep expected values head-computable
  private val rows: Seq[(Int, Int, Int, Int)] = Seq(
    // g1: classic overlaps — [0,10],[5,15],[20,25]
    (1, 1, 0, 10), (1, 2, 5, 15), (1, 3, 20, 25),
    // g2: duplicate ids pair in NEITHER orientation (strict a.id < b.id)
    (2, 1, 0, 10), (2, 1, 5, 15), (2, 2, 8, 12),
    // g3: touching endpoints count (inclusive intervals): [0,5] ∩ [5,9] = 1 day
    (3, 1, 0, 5), (3, 2, 5, 9),
    // g4: disjoint — a row the q90 HAVING would drop but the kernel still folds
    (4, 1, 0, 1), (4, 2, 10, 11),
    // g5: singleton — no pairs at all
    (5, 1, 0, 100),
    // g6: containment + triple overlap
    (6, 1, 0, 30), (6, 2, 5, 10), (6, 3, 8, 20))

  private def grouped = rows.toDF("g", "id", "sd", "ed")
    .select(col("g"),
            struct(col("id"),
                   expr("timestampadd(DAY, sd, TIMESTAMP '2024-01-01 00:00:00')").as("st"),
                   expr("timestampadd(DAY, ed, TIMESTAMP '2024-01-01 00:00:00')").as("en")).as("it"))
    .groupBy("g").agg(collect_list(col("it")).as("items"))

  private def viaKernel = {
    graft.functions.IntervalPairStats.register(spark)
    grouped.select(col("g"), call_function("graft_interval_pairs", col("items")).as("ps"))
      .select(col("g"), col("ps.item_pairs"), col("ps.overlap_pairs"),
              col("ps.overlap_days"), col("ps.max_overlap_days"))
      .orderBy("g")
  }

  /** The exact HOF pipeline q90 shipped before round 8 — the reference
    * semantics the kernel must be bit-identical to. */
  private def viaHof = grouped
    .withColumn("pd", expr(
      """flatten(transform(items, a -> transform(items, b ->
        |  CASE WHEN a.id >= b.id THEN CAST(NULL AS BIGINT)
        |       WHEN a.st <= b.en AND b.st <= a.en
        |       THEN timestampdiff(DAY, greatest(a.st, b.st),
        |                          least(a.en, b.en)) + CAST(1 AS BIGINT)
        |       ELSE CAST(0 AS BIGINT) END)))""".stripMargin))
    .select(col("g"),
            expr("cast(size(filter(pd, x -> x IS NOT NULL)) as bigint)").as("item_pairs"),
            expr("cast(size(filter(pd, x -> x > 0)) as bigint)").as("overlap_pairs"),
            expr("coalesce(aggregate(filter(pd, x -> x IS NOT NULL), cast(0 as bigint), " +
                 "(acc, x) -> acc + x), cast(0 as bigint))").as("overlap_days"),
            expr("coalesce(array_max(pd), cast(0 as bigint))").as("max_overlap_days"))
    .orderBy("g")

  test("kernel ≡ HOF fold on adversarial groups, codegen AND interpreted") {
    val expected = viaHof.collect().map(_.toSeq)
    assert(viaKernel.collect().map(_.toSeq) === expected)
    // interpreted eval path (nullSafeEval) must agree byte-for-byte
    val keys = Seq("spark.sql.codegen.wholeStage", "spark.sql.codegen.factoryMode")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "false"); spark.conf.set(keys(1), "NO_CODEGEN")
      assert(viaKernel.collect().map(_.toSeq) === expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("hand-checked values: g1 and g3") {
    val m = viaKernel.collect().map(r => r.getInt(0) -> r.toSeq.tail).toMap
    // g1: pairs (1,2): ∩=[5,10]→6d; (1,3): none; (2,3): none
    assert(m(1) === Seq(3L, 1L, 6L, 6L))
    // g2: only (id1,id2) pairs survive the strict ordering — dup id1 never self-pairs
    //     (1a,2): [8,10]→3d; (1b,2): [8,12]→5d
    assert(m(2) === Seq(2L, 2L, 8L, 5L))
    // g3: touching endpoint = 1 inclusive day
    assert(m(3) === Seq(1L, 1L, 1L, 1L))
    // g4: pair exists, no overlap
    assert(m(4) === Seq(1L, 0L, 0L, 0L))
    // g5: singleton
    assert(m(5) === Seq(0L, 0L, 0L, 0L))
    // g6: (1,2): [5,10]→6; (1,3): [8,20]→13; (2,3): [8,10]→3
    assert(m(6) === Seq(3L, 3L, 22L, 13L))
  }

  test("empty array, null element, DATE-typed intervals") {
    graft.functions.IntervalPairStats.register(spark)
    // empty group array → all-zero struct (q90's HAVING then drops it)
    val empty = spark.sql(
      """SELECT graft_interval_pairs(
        |  CAST(array() AS ARRAY<STRUCT<id INT, st TIMESTAMP, en TIMESTAMP>>)) AS ps""".stripMargin)
      .select("ps.*").head().toSeq
    assert(empty === Seq(0L, 0L, 0L, 0L))
    // a NULL element is skipped, not a crash
    val withNull = spark.sql(
      """SELECT graft_interval_pairs(array(
        |  named_struct('id', 1, 'st', TIMESTAMP '2024-01-01', 'en', TIMESTAMP '2024-01-05'),
        |  CAST(NULL AS STRUCT<id INT, st TIMESTAMP, en TIMESTAMP>),
        |  named_struct('id', 2, 'st', TIMESTAMP '2024-01-03', 'en', TIMESTAMP '2024-01-09')
        |)) AS ps""".stripMargin).select("ps.*").head().toSeq
    assert(withNull === Seq(1L, 1L, 3L, 3L))
    // DATE inputs take the days-int path (unit 1) with identical semantics
    val dates = spark.sql(
      """SELECT graft_interval_pairs(array(
        |  named_struct('id', 1, 'st', DATE '2024-01-01', 'en', DATE '2024-01-05'),
        |  named_struct('id', 2, 'st', DATE '2024-01-03', 'en', DATE '2024-01-09')
        |)) AS ps""".stripMargin).select("ps.*").head().toSeq
    assert(dates === Seq(1L, 1L, 3L, 3L))
    // type errors are analysis-time and named
    val err = intercept[Exception](spark.sql(
      "SELECT graft_interval_pairs(array(1, 2, 3))").collect())
    assert(err.getMessage.contains("graft_interval_pairs"))
  }
}
