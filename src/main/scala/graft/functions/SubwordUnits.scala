package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_subword_units(text)` — the fixed-stride subword segmentation
  * kernel behind `ta_subword_units`, as ONE codegen'd pass over the raw
  * text: split on single spaces, then cut every token into consecutive
  * 2-code-point units.
  *
  * Why an Expression (round-9, per the round-8 verdict): the declarative
  * form is `flatten(transform(split(text,' '), tok =>
  * transform(sequence(1, length(tok), 2), p => substr(tok, p, 2))))` —
  * higher-order functions are NOT whole-stage-codegen'd, so every unit
  * paid an interpreted lambda dispatch plus a per-token `sequence` array
  * allocation; at the sf10 decade that interpreted walk was the suite's
  * largest remaining hot kernel (13.9 s, 5.8×/decade — the decade ratio
  * is the unit-row explosion downstream, but the constant factor was
  * this loop). The kernel walks the UTF8String once, emitting each unit
  * directly — no toks array, no sequence arrays, no lambda frames. The
  * FloatDot/FoldText/IntervalPairStats pattern: `doGenCode` emits a
  * static call so the row stays inside the generated pipeline.
  *
  * Parity contract: unit boundaries count CODE POINTS, matching both
  * `Column.substr` (UTF8String code-point indexing, what the previous
  * HOF form used) and the oracle's DuckDB `substring` (also
  * character-based) — SubwordUnitsSpec pins kernel ≡ HOF on the fixture
  * plus surrogate-pair/diacritic/empty-token edges. Empty tokens
  * (consecutive/leading/trailing spaces) emit no units in every
  * formulation: Spark's HOF guarded them, DuckDB's range(1,1,2) is
  * empty, and the kernel's token walk skips zero-length spans.
  */
case class SubwordUnits(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_subword_units expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_subword_units"

  override def nullSafeEval(input: Any): Any =
    SubwordUnits.units(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SubwordUnits.units($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordUnits {

  /** One pass: tokens are maximal spans between ' ' (U+0020); each token
    * yields ⌈codepoints/2⌉ units of ≤2 code points. Pure; thread-safe. */
  def units(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val out = new java.util.ArrayList[UTF8String](math.max(8, n / 2))
    var i = 0
    while (i < n) {
      var j = str.indexOf(' ', i)
      if (j < 0) j = n
      var p = i
      while (p < j) {
        // 2 code points per unit; the separator is BMP so a surrogate
        // pair never straddles a token boundary
        var q = p + Character.charCount(str.codePointAt(p))
        if (q < j) q += Character.charCount(str.codePointAt(q))
        out.add(UTF8String.fromString(str.substring(p, q)))
        p = q
      }
      i = j + 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  def build(children: Seq[Expression]): SubwordUnits = {
    require(children.size == 1,
      s"graft_subword_units requires exactly 1 argument, got ${children.size}")
    SubwordUnits(children.head)
  }

  /** Idempotently register `graft_subword_units` on an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier("graft_subword_units")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[SubwordUnits].getName, "graft_subword_units"),
        (children: Seq[Expression]) => SubwordUnits.build(children))
    }
  }
}

/** `graft_subword_counts(text)` — [[SubwordUnits]] with the per-document
  * unit pre-count FUSED into the kernel: returns
  * `array<struct<unit:string, c:bigint>>`, one entry per DISTINCT unit of
  * the document. Documents repeat units heavily (2-char units over a
  * bounded alphabet), so ta_subword_units' first aggregation level —
  * groupBy(unit, doc_id), whose only job was exactly this dedup — was
  * shuffling every occurrence row just to count duplicates the kernel
  * can count in-row. With the fused form the explode emits one row per
  * (doc, distinct unit) and the ONLY shuffle left is the final
  * unit-keyed rollup, map-side combined. Per-row state is a HashMap
  * bounded by the document's distinct-unit count (alphabet², tiny).
  * Entry order is insertion order (first occurrence) — callers
  * aggregate, so order never reaches a result. */
case class SubwordCounts(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_subword_counts expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("unit", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("c",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_subword_counts"

  override def nullSafeEval(input: Any): Any =
    SubwordCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SubwordCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordCounts {

  /** Same token/unit walk as [[SubwordUnits.units]], counting into an
    * insertion-ordered map instead of emitting occurrences. */
  def counts(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.length
    val m = new java.util.LinkedHashMap[String, Long]()
    var i = 0
    while (i < n) {
      var j = str.indexOf(' ', i)
      if (j < 0) j = n
      var p = i
      while (p < j) {
        var q = p + Character.charCount(str.codePointAt(p))
        if (q < j) q += Character.charCount(str.codePointAt(q))
        val u = str.substring(p, q)
        m.merge(u, 1L, (a, b) => a + b)
        p = q
      }
      i = j + 1
    }
    val out = new Array[AnyRef](m.size())
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      k += 1
    }
    new GenericArrayData(out)
  }

  def build(children: Seq[Expression]): SubwordCounts = {
    require(children.size == 1,
      s"graft_subword_counts requires exactly 1 argument, got ${children.size}")
    SubwordCounts(children.head)
  }

  /** Idempotently register `graft_subword_counts` on an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier("graft_subword_counts")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[SubwordCounts].getName, "graft_subword_counts"),
        (children: Seq[Expression]) => SubwordCounts.build(children))
    }
  }
}
