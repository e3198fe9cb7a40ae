package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd interval-overlap pair fold — the hot kernel of the
  * interval-overlap join (q90) in one whole-stage-codegen expression.
  *
  * Input: `ARRAY<STRUCT<id, start, end>>` — one bounded group's intervals
  * (id: INT/BIGINT tiebreaker, start/end: both TIMESTAMP or both DATE).
  * Output: `STRUCT<item_pairs, overlap_pairs, overlap_days,
  * max_overlap_days>` (all BIGINT) over every ordered pair `a.id < b.id`
  * (strict — duplicate ids pair in neither orientation, matching the
  * self-join form's `a.ln < b.ln`):
  *
  *   - `item_pairs`    — pairs considered,
  *   - `overlap_pairs` — pairs whose `[start, end]` intervals intersect,
  *   - `overlap_days`  — Σ intersection lengths, in whole days, counted
  *     inclusively (`days(min(end) − max(start)) + 1`, truncating division
  *     — identical to `timestampdiff(DAY, ...) + 1` for the nonnegative
  *     deltas intersection guarantees),
  *   - `max_overlap_days` — the largest single intersection (0 when none).
  *
  * Why an Expression and not the `flatten(transform(...))` +
  * `aggregate/filter/array_max` HOF pipeline it replaces: higher-order
  * lambdas evaluate interpreted — one boxed closure call per PAIR, then
  * three more interpreted array passes over the materialized k² pair
  * array. At sf10 (60M lineitem rows) that interpretation made q90 the
  * single most expensive query in the suite (28.9 s). This kernel is the
  * same arithmetic as a primitive loop inside whole-stage codegen: one
  * pass, no intermediate pair array, exact integer math — bit-identical
  * results (the A/B and the unchanged oracle hash pin that), only the
  * execution speed changes. Scale shape is unchanged: the caller
  * guarantees bounded groups (≤7 items/order in TPC-H-shaped data), so
  * the k² fold is a bounded constant per row; this removes the constant's
  * interpretation overhead. Null elements/fields are skipped (collect_list
  * never produces them; defensive, not contractual).
  */
case class IntervalPairStats(child: Expression) extends UnaryExpression {

  /** (ok, µs-per-day scale): TimestampType is physically µs-long,
    * DateType is days-int — both reduce to integer day math. */
  private def timeInfo(dt: DataType): Option[Boolean] = dt match {
    case TimestampType | TimestampNTZType => Some(true)  // long micros
    case DateType                         => Some(false) // int days
    case _                                => None
  }

  private def fields: Option[(DataType, DataType)] = child.dataType match {
    case ArrayType(StructType(Array(id, st, en)), _)
        if (id.dataType == IntegerType || id.dataType == LongType) &&
          timeInfo(st.dataType).isDefined && st.dataType == en.dataType =>
      Some((id.dataType, st.dataType))
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (fields.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_interval_pairs expects ARRAY<STRUCT<id INT|BIGINT, start, end>> " +
        s"with start/end both TIMESTAMP or both DATE, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("item_pairs", LongType, nullable = false),
    StructField("overlap_pairs", LongType, nullable = false),
    StructField("overlap_days", LongType, nullable = false),
    StructField("max_overlap_days", LongType, nullable = false)))

  override def prettyName: String = "graft_interval_pairs"

  /** µs per day when timestamps; 1 when the inputs are already days. */
  private def unit: Long = if (timeInfo(fields.get._2).get) 86400000000L else 1L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val (idT, tsT) = fields.get
    val n0 = arr.numElements()
    val ids = new Array[Long](n0); val sts = new Array[Long](n0); val ens = new Array[Long](n0)
    var n = 0; var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) {
        val r = arr.getStruct(i, 3)
        if (!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2)) {
          ids(n) = if (idT == IntegerType) r.getInt(0).toLong else r.getLong(0)
          sts(n) = if (tsT == DateType) r.getInt(1).toLong else r.getLong(1)
          ens(n) = if (tsT == DateType) r.getInt(2).toLong else r.getLong(2)
          n += 1
        }
      }
      i += 1
    }
    val u = unit
    var pairs = 0L; var ovp = 0L; var ovd = 0L; var mx = 0L
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (ids(i) != ids(j)) {
          pairs += 1L
          val s = math.max(sts(i), sts(j)); val e = math.min(ens(i), ens(j))
          if (s <= e) { val d = (e - s) / u + 1L; ovp += 1L; ovd += d; if (d > mx) mx = d }
        }
        j += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](pairs, ovp, ovd, mx))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (idT, tsT) = fields.get
      val idGet = if (idT == IntegerType) "(long) %s.getInt(0)" else "%s.getLong(0)"
      val tGet  = (f: Int) =>
        if (tsT == DateType) s"(long) %s.getInt($f)" else s"%s.getLong($f)"
      val n0 = ctx.freshName("n0"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val r = ctx.freshName("r")
      val ids = ctx.freshName("ids"); val sts = ctx.freshName("sts"); val ens = ctx.freshName("ens")
      val p = ctx.freshName("pairs"); val ovp = ctx.freshName("ovp")
      val ovd = ctx.freshName("ovd"); val mx = ctx.freshName("mx")
      val s = ctx.freshName("s"); val e = ctx.freshName("e"); val d = ctx.freshName("d")
      s"""
         |int $n0 = $a.numElements();
         |long[] $ids = new long[$n0]; long[] $sts = new long[$n0]; long[] $ens = new long[$n0];
         |int $n = 0;
         |for (int $i = 0; $i < $n0; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    InternalRow $r = $a.getStruct($i, 3);
         |    if (!$r.isNullAt(0) && !$r.isNullAt(1) && !$r.isNullAt(2)) {
         |      $ids[$n] = ${idGet.format(r)};
         |      $sts[$n] = ${tGet(1).format(r)};
         |      $ens[$n] = ${tGet(2).format(r)};
         |      $n++;
         |    }
         |  }
         |}
         |long $p = 0L; long $ovp = 0L; long $ovd = 0L; long $mx = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  for (int $j = $i + 1; $j < $n; $j++) {
         |    if ($ids[$i] != $ids[$j]) {
         |      $p++;
         |      long $s = Math.max($sts[$i], $sts[$j]);
         |      long $e = Math.min($ens[$i], $ens[$j]);
         |      if ($s <= $e) {
         |        long $d = ($e - $s) / ${unit}L + 1L;
         |        $ovp++; $ovd += $d; if ($d > $mx) $mx = $d;
         |      }
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { java.lang.Long.valueOf($p), java.lang.Long.valueOf($ovp),
         |                 java.lang.Long.valueOf($ovd), java.lang.Long.valueOf($mx) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IntervalPairStats {
  def build(children: Seq[Expression]): IntervalPairStats = {
    require(children.size == 1,
      s"graft_interval_pairs requires exactly 1 argument, got ${children.size}")
    IntervalPairStats(children.head)
  }

  /** Idempotently register `graft_interval_pairs` on an existing session
    * (the runtime flavor of GraftExtensions.injectFunction). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier("graft_interval_pairs")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[IntervalPairStats].getName, "graft_interval_pairs"),
        (children: Seq[Expression]) => IntervalPairStats.build(children))
    }
  }
}
