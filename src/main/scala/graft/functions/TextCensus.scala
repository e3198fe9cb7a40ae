package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Round-9 text-census codegen kernels — the two remaining interpreted
  * hot loops of the sf10 tail after the round-9 subword fold, each the
  * same Expression shape the round-8/9 kernels proved out
  * (FloatDot/FoldText/IntervalPairStats/SubwordCounts: a static call
  * emitted by `doGenCode` so the row never leaves the generated
  * pipeline).
  *
  * [[SttrStats]] (`graft_sttr_stats(text, w)`): ta_sttr's previous form
  * posexploded every TOKEN into a (doc, window, token) row and shuffled
  * the whole token stream just to count distinct types per
  * non-overlapping w-token window — 14.7 s at sf10, the worst remaining
  * census. The kernel walks the text once, counting distinct types per
  * full window with a per-window hash set (≤ w entries), and returns
  * `struct<n_windows, sum_types>` per document — the explode and the
  * token-scale shuffle disappear; the only shuffle left is the
  * |sources|-bounded rollup.
  *
  * Token parity contract: tokens are split on single ' ' KEEPING empty
  * strings (Spark `split(text, ' ')` with the default -1 limit and
  * DuckDB `string_split` both keep leading/inner/trailing empties — a
  * trailing space yields one trailing empty token in both). Window
  * membership and the full-window cut ((win+1)·w ≤ n_tok) are over that
  * token sequence; distinctness is exact string equality, same as
  * countDistinct. TextCensusSpec pins kernel ≡ the exploded form on the
  * corpus and on empty/duplicate-token edges.
  *
  * [[IcStats]] (`graft_ic_stats(head)`): ta_ic_profile's letter
  * frequencies came from 26 whole-string `replace` passes (each
  * allocating a copy of the 256-char head — ~26 allocations/doc).
  * The kernel is one pass over the head with a 26-slot frequency array,
  * returning `struct<n, rep>` = (Σf, Σf(f−1)) over 'a'..'z'
  * — only BMP chars in [a,z] count, identical to the BETWEEN filter
  * and the per-letter replace-diff (both count raw 'a'..'z' chars).
  */
case class SttrStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sttr_stats expects (STRING, INT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = StructType(Seq(
    StructField("n_windows", LongType, nullable = false),
    StructField("sum_types", LongType, nullable = false)))
  override def prettyName: String = "graft_sttr_stats"

  override def nullSafeEval(text: Any, w: Any): Any =
    SttrStats.stats(text.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"graft.functions.SttrStats.stats($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SttrStats {

  /** One pass: split on ' ' keeping empties, distinct types per
    * non-overlapping full w-token window. Pure; thread-safe.
    *
    * The window width must be positive: the function is in the session
    * FunctionRegistry, so any SQL can call it with any literal — w = 0
    * would divide by zero inside generated code and w < 0 would emit a
    * negative n_windows struct, both worse failures than a named error. */
  def stats(s: UTF8String, w: Int): GenericInternalRow = {
    if (w <= 0)
      throw new IllegalArgumentException(
        s"graft_sttr_stats: window width must be >= 1, got $w")
    val str = s.toString
    // token count = spaces + 1 (split keeps all empties)
    var nTok = 1
    var i = 0
    while (i < str.length) { if (str.charAt(i) == ' ') nTok += 1; i += 1 }
    val nWin = nTok / w
    var sumTypes = 0L
    if (nWin > 0) {
      val seen = new java.util.HashSet[String](w * 2)
      var tokIdx = 0
      var start = 0
      i = 0
      // walk token boundaries; token tokIdx spans [start, end)
      while (tokIdx < nWin * w) {
        var end = str.indexOf(' ', start)
        if (end < 0) end = str.length
        seen.add(str.substring(start, end))
        tokIdx += 1
        if (tokIdx % w == 0) { sumTypes += seen.size; seen.clear() }
        start = end + 1
      }
    }
    new GenericInternalRow(Array[Any](nWin.toLong, sumTypes))
  }

  def build(children: Seq[Expression]): SttrStats = {
    require(children.size == 2,
      s"graft_sttr_stats requires exactly 2 arguments, got ${children.size}")
    SttrStats(children.head, children(1))
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier("graft_sttr_stats")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[SttrStats].getName, "graft_sttr_stats"),
        (children: Seq[Expression]) => SttrStats.build(children))
    }
  }
}

case class IcStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ic_stats expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("rep", LongType, nullable = false)))
  override def prettyName: String = "graft_ic_stats"

  override def nullSafeEval(input: Any): Any =
    IcStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IcStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IcStats {

  /** Letter-frequency fold over 'a'..'z': n = Σf, rep = Σf(f−1). */
  def stats(s: UTF8String): GenericInternalRow = {
    val str = s.toString
    val f = new Array[Long](26)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c >= 'a' && c <= 'z') f(c - 'a') += 1
      i += 1
    }
    var n = 0L
    var rep = 0L
    var k = 0
    while (k < 26) { n += f(k); rep += f(k) * (f(k) - 1); k += 1 }
    new GenericInternalRow(Array[Any](n, rep))
  }

  def build(children: Seq[Expression]): IcStats = {
    require(children.size == 1,
      s"graft_ic_stats requires exactly 1 argument, got ${children.size}")
    IcStats(children.head)
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier("graft_ic_stats")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[IcStats].getName, "graft_ic_stats"),
        (children: Seq[Expression]) => IcStats.build(children))
    }
  }
}
