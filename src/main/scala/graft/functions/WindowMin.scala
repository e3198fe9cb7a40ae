package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd sliding-window minima over an ARRAY<BIGINT> column:
  * `graft_window_min(hs, w)` returns the n-w+1 window minima of `hs`
  * (empty when n < w) — the hot inner step of winnowing fingerprints
  * (Schleimer et al. 2003), where the declarative form
  * `transform(sequence(...), j -> array_min(slice(hs, j+1, w)))`
  * evaluates as interpreted HOF lambdas with per-window array copies.
  * This expression runs the same loop as a primitive nest inside
  * whole-stage codegen; values are identical (min is order-free), only
  * the execution speed changes. Tier (b) of the custom-operator ladder,
  * like FloatDot.
  */
case class WindowMin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_window_min requires (ARRAY<BIGINT>, INT literal), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_window_min"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val w   = b.asInstanceOf[Int]
    val n   = arr.numElements()
    if (w <= 0 || n < w) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val res = new Array[Long](n - w + 1)
    var i = 0
    while (i < n) {
      // getLong on a null slot silently yields 0/garbage — fail loudly
      // instead of returning a wrong minimum (hash arrays are dense)
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"graft_window_min: null element at index $i (input must be a dense array)")
      i += 1
    }
    i = 0
    while (i + w <= n) {
      var m = arr.getLong(i)
      var j = i + 1
      while (j < i + w) {
        val v = arr.getLong(j)
        if (v < m) m = v
        j += 1
      }
      res(i) = m
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val res = ctx.freshName("res")
      val i   = ctx.freshName("i")
      val j   = ctx.freshName("j")
      val m   = ctx.freshName("m")
      val v   = ctx.freshName("v")
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |int $n = $a.numElements();
         |if ($b <= 0 || $n < $b) {
         |  ${ev.value} = $uad.fromPrimitiveArray(new long[0]);
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) {
         |      throw new IllegalArgumentException(
         |        "graft_window_min: null element (input must be a dense array)");
         |    }
         |  }
         |  long[] $res = new long[$n - $b + 1];
         |  for (int $i = 0; $i + $b <= $n; $i++) {
         |    long $m = $a.getLong($i);
         |    for (int $j = $i + 1; $j < $i + $b; $j++) {
         |      long $v = $a.getLong($j);
         |      if ($v < $m) $m = $v;
         |    }
         |    $res[$i] = $m;
         |  }
         |  ${ev.value} = $uad.fromPrimitiveArray($res);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WindowMin {
  def build(children: Seq[Expression]): WindowMin = {
    require(children.size == 2,
      s"graft_window_min requires exactly 2 arguments, got ${children.size}")
    WindowMin(children.head, children(1))
  }

  /** Idempotently register `graft_window_min` on the session registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier("graft_window_min")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[WindowMin].getName, "graft_window_min"),
        (children: Seq[Expression]) => WindowMin.build(children))
    }
  }
}
