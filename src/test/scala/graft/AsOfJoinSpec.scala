package graft

import graft.plans.AsOf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native as-of join against a composed join+window reference
  * implementation, on crafted edge cases and a seeded random sweep; plus
  * the physical-plan contract (exec node present, one exchange per side,
  * no row-expanding join, no window). Every semantic case runs through
  * BOTH physical forms — the co-partitioned streamed merge
  * ([[graft.plans.AsOfJoinExec]]) and the broadcast-index variant
  * ([[graft.plans.BroadcastAsOfJoinExec]]) — by pinning `broadcastRight`,
  * so the two execs are proven interchangeable on the same fixtures.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Both physical forms, pinned: Some(false) = streamed merge,
    * Some(true) = broadcast index. */
  private val bothExecs: Seq[Option[Boolean]] = Seq(Some(false), Some(true))

  /** Composed reference: inequality left join, keep the row with the
    * greatest (time, tiebreak) per left row — the semantics the native
    * operator must reproduce, written the expensive expanding way. */
  private def composed(left: DataFrame, right: DataFrame): DataFrame = {
    val j = left.join(right,
      col("k") === col("rk") && col("rt").isNotNull && col("rt") <= col("t"),
      "left")
    val w = Window.partitionBy(col("lid"))
      .orderBy(col("rt").desc_nulls_last, col("rid").desc_nulls_last)
    j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  private def native(left: DataFrame, right: DataFrame,
      bc: Option[Boolean]): DataFrame =
    AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt", Seq("rid"),
      broadcastRight = bc)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.select("lid", "rid", "rv").collect()
      .map(r => (0 until 3).map(i => if (r.isNullAt(i)) "∅" else r.get(i).toString).mkString("|"))
      .sorted.toSeq

  test("edge cases: nulls, ties, unmatched, key gaps") {
    val left = Seq(
      (1L, Some(10L), Some(100L)),  // matches rid=2 (rt=90 beats rt=50)
      (2L, Some(10L), Some(90L)),   // exact-time match rid=2
      (3L, Some(10L), Some(40L)),   // before all right rows -> null
      (4L, Some(10L), None),        // null left time -> null
      (5L, None, Some(100L)),       // null left key -> null
      (6L, Some(20L), Some(100L)),  // tie rt=60 twice -> larger rid=6
      (7L, Some(30L), Some(100L)),  // key with no right rows -> null
      (8L, Some(40L), Some(100L))   // key whose right rows are all later -> null
    ).toDF("lid", "k", "t")
    val right = Seq(
      (1L, Some(10L), Some(50L), "a"),
      (2L, Some(10L), Some(90L), "b"),
      (3L, Some(10L), None, "nullts"),    // null right time: never matches
      (4L, Some(10L), Some(120L), "late"),
      (5L, Some(20L), Some(60L), "t1"),
      (6L, Some(20L), Some(60L), "t2"),   // time tie, larger rid wins
      (7L, None, Some(10L), "nullkey"),
      (8L, Some(40L), Some(200L), "later")
    ).toDF("rid", "rk", "rt", "rv")

    val want = sortedRows(composed(left, right))
    for (bc <- bothExecs) {
      val got = sortedRows(native(left, right, bc))
      assert(got === want, s"broadcastRight=$bc")
      assert(got === Seq(
        "1|2|b", "2|2|b", "3|∅|∅", "4|∅|∅", "5|∅|∅", "6|6|t2", "7|∅|∅", "8|∅|∅"))
    }
  }

  test("seeded random sweep matches the composed reference") {
    val rnd = new scala.util.Random(42)
    def time(): Option[Long] = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(1000).toLong)
    def key(): Option[Long] = if (rnd.nextInt(25) == 0) None else Some(rnd.nextInt(40).toLong)
    val left = (1L to 3000L).map(i => (i, key(), time())).toDF("lid", "k", "t")
    val right = (1L to 1500L).map(i => (i, key(), time(), s"v$i")).toDF("rid", "rk", "rt", "rv")
    val want = sortedRows(composed(left, right))
    for (bc <- bothExecs) {
      // skew the partitioning going in: the merge must re-cluster both
      // sides; the broadcast form must index across partitions correctly
      val gotDf = native(left.repartition(7), right.repartition(3, col("rv")), bc)
      assert(sortedRows(gotDf) === want, s"broadcastRight=$bc")
      assert(gotDf.count() === 3000L) // left-outer: exactly one row per left row
    }
  }

  /** Composed forward reference: smallest (rt, rid) with rt >= t. */
  private def composedFwd(left: DataFrame, right: DataFrame): DataFrame = {
    val j = left.join(right,
      col("k") === col("rk") && col("rt").isNotNull && col("rt") >= col("t"),
      "left")
    val w = Window.partitionBy(col("lid"))
      .orderBy(col("rt").asc_nulls_last, col("rid").asc_nulls_last)
    j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  test("forward direction: crafted ties and a seeded sweep match the composed form") {
    val left = Seq(
      (1L, Some(10L), Some(50L)),   // next is rt=60 tie -> SMALLEST rid=5
      (2L, Some(10L), Some(60L)),   // exact-time match, same tie rule
      (3L, Some(10L), Some(300L)),  // after all right rows -> null
      (4L, Some(10L), None),        // null left time -> null
      (5L, Some(20L), Some(10L))    // key with no right rows -> null
    ).toDF("lid", "k", "t")
    val right = Seq(
      (5L, Some(10L), Some(60L), "t1"),
      (6L, Some(10L), Some(60L), "t2"),
      (7L, Some(10L), Some(90L), "later"),
      (8L, Some(10L), None, "nullts")
    ).toDF("rid", "rk", "rt", "rv")
    val wantCrafted = sortedRows(composedFwd(left, right))
    val rnd = new scala.util.Random(7)
    def time(): Option[Long] = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(1000).toLong)
    val bl = (1L to 2500L).map(i => (i, Some(rnd.nextInt(40).toLong), time())).toDF("lid", "k", "t")
    val br = (1L to 1200L).map(i => (i, Some(rnd.nextInt(40).toLong), time(), s"v$i")).toDF("rid", "rk", "rt", "rv")
    val wantSweep = sortedRows(composedFwd(bl, br))
    for (bc <- bothExecs) {
      val got = sortedRows(AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt",
        Seq("rid"), forward = true, broadcastRight = bc))
      assert(got === wantCrafted, s"broadcastRight=$bc")
      assert(got === Seq("1|5|t1", "2|5|t1", "3|∅|∅", "4|∅|∅", "5|∅|∅"))
      assert(sortedRows(AsOf.join(bl, br, Seq("k"), Seq("rk"), "t", "rt",
        Seq("rid"), forward = true, broadcastRight = bc)) === wantSweep,
        s"broadcastRight=$bc")
    }
  }

  test("tolerance bounds the match distance in both directions") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 130L)).toDF("lid", "k", "t")
    val right = Seq((1L, 1L, 90L, "a"), (2L, 1L, 135L, "b")).toDF("rid", "rk", "rt", "rv")
    // tolerance vs the composed form on the random fixture
    val rnd = new scala.util.Random(11)
    val bl = (1L to 2000L).map(i => (i, Some(rnd.nextInt(30).toLong), Some(rnd.nextInt(500).toLong))).toDF("lid", "k", "t")
    val br = (1L to 900L).map(i => (i, Some(rnd.nextInt(30).toLong), Some(rnd.nextInt(500).toLong), s"v$i")).toDF("rid", "rk", "rt", "rv")
    val tol = 25L
    val wantSweep = sortedRows {
      val j = bl.join(br, col("k") === col("rk") && col("rt") <= col("t")
        && col("t") - col("rt") <= tol, "left")
      val w = Window.partitionBy(col("lid"))
        .orderBy(col("rt").desc_nulls_last, col("rid").desc_nulls_last)
      j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    }
    for (bc <- bothExecs) {
      def bk(tol: Option[Long]) = sortedRows(AsOf.join(left, right,
        Seq("k"), Seq("rk"), "t", "rt", Seq("rid"), tolerance = tol, broadcastRight = bc))
      def fw(tol: Option[Long]) = sortedRows(AsOf.join(left, right,
        Seq("k"), Seq("rk"), "t", "rt", Seq("rid"), forward = true, tolerance = tol,
        broadcastRight = bc))
      assert(bk(None) === Seq("1|1|a", "2|1|a"), s"broadcastRight=$bc")
      assert(bk(Some(10L)) === Seq("1|1|a", "2|∅|∅"))  // 130-90=40 > 10
      assert(bk(Some(40L)) === Seq("1|1|a", "2|1|a"))  // boundary inclusive
      assert(fw(None) === Seq("1|2|b", "2|2|b"))
      assert(fw(Some(5L)) === Seq("1|∅|∅", "2|2|b"))   // 135-100=35 > 5
      assert(sortedRows(AsOf.join(bl, br, Seq("k"), Seq("rk"), "t", "rt", Seq("rid"),
        tolerance = Some(tol), broadcastRight = bc)) === wantSweep, s"broadcastRight=$bc")
    }
  }

  test("tolerance rejects a non-temporal time column type") {
    val left = Seq((1L, 1L, "x")).toDF("lid", "k", "t")
    val right = Seq((1L, 1L, "y", "v")).toDF("rid", "rk", "rt", "rv")
    intercept[IllegalArgumentException] {
      AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt", Seq("rid"), tolerance = Some(1L))
    }
  }

  test("plan: native exec, one exchange per side, no expanding join, no window") {
    val left = (1L to 100L).map(i => (i, i % 10, i * 2)).toDF("lid", "k", "t")
    val right = (1L to 50L).map(i => (i, i % 10, i * 3, s"v$i")).toDF("rid", "rk", "rt", "rv")
    val df = AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt", Seq("rid"),
      broadcastRight = Some(false))
    // formatted explain renders the post-EnsureRequirements plan exactly once
    // (executedPlan.toString under AQE repeats it as Current + Initial)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(plan.contains("AsOfJoin")) // SparkPlan.nodeName strips "Exec"
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("Window") && !plan.contains("Union"))
  }

  test("pre-clustered child skips its shuffle") {
    val left = (1L to 100L).map(i => (i, i % 10, i * 2)).toDF("lid", "k", "t")
      .repartition(4, col("k"))
    val right = (1L to 50L).map(i => (i, i % 10, i * 3, s"v$i")).toDF("rid", "rk", "rt", "rv")
      .repartition(4, col("rk"))
    val df = AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt", Seq("rid"),
      broadcastRight = Some(false))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    // the two user REPARTITION exchanges are the only ones — the as-of
    // join itself added none (ClusteredDistribution already satisfied)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2)
    assert("REPARTITION".r.findAllIn(plan).size === 2)
    assert(!plan.contains("ENSURE_REQUIREMENTS"))
  }

  test("broadcast plan: zero shuffles, zero sorts, broadcast exchange on the right") {
    val left = (1L to 100L).map(i => (i, i % 10, i * 2)).toDF("lid", "k", "t")
    val right = (1L to 50L).map(i => (i, i % 10, i * 3, s"v$i")).toDF("rid", "rk", "rt", "rv")
    val df = AsOf.join(left, right, Seq("k"), Seq("rk"), "t", "rt", Seq("rid"),
      broadcastRight = Some(true))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(plan.contains("BroadcastAsOfJoin"))
    assert(plan.contains("BroadcastExchange"))
    assert(!plan.contains("Exchange hashpartitioning")) // the whole point
    assert(!plan.contains("Sort ")) // left streams unsorted; right sorts in-index
    // left partitioning passes through: a small right never reshapes the fact
    assert(df.rdd.getNumPartitions === left.rdd.getNumPartitions)
  }

  test("auto choice: small right broadcasts by stats, pinned false shuffles, " +
      "threshold -1 disables") {
    val left = (1L to 100L).map(i => (i, i % 10, i * 2)).toDF("lid", "k", "t")
    val right = (1L to 50L).map(i => (i, i % 10, i * 3, s"v$i")).toDF("rid", "rk", "rt", "rv")
    def planOf(bc: Option[Boolean]) = AsOf.join(left, right,
      Seq("k"), Seq("rk"), "t", "rt", Seq("rid"), broadcastRight = bc)
      .queryExecution.executedPlan.toString
    // a 50-row LocalRelation sits far below autoBroadcastJoinThreshold
    assert(planOf(None).contains("BroadcastAsOfJoin"))
    assert(!planOf(Some(false)).contains("BroadcastAsOfJoin"))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      assert(!planOf(None).contains("BroadcastAsOfJoin"))
    } finally spark.conf.set(key, prior)
  }
}
