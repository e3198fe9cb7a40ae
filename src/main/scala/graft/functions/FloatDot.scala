package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two ARRAY<FLOAT> columns.
  *
  * The portable baseline (Vectors.dot) is an `aggregate(zip_with(...))`
  * fold; higher-order-function lambdas evaluate interpreted, one boxed
  * call per element. This expression compiles to a tight primitive loop
  * inside whole-stage codegen — same left-to-right double accumulation,
  * so results are bit-identical to the fold (and to the DuckDB oracle);
  * only the execution speed changes. This is tier (b) of the task's
  * custom-operator ladder: a scalar Catalyst Expression, not a UDF.
  *
  * Array elements must be non-null (embedding vectors are dense); lengths
  * are defensively min()'d.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** Arity-checked builder shared by both registration paths — indexing
    * children directly would surface as an IndexOutOfBoundsException from
    * inside analysis instead of a usable error. */
  def build(children: Seq[Expression]): FloatDot = {
    require(children.size == 2,
      s"graft_dot requires exactly 2 arguments, got ${children.size}")
    FloatDot(children.head, children(1))
  }

  /** Idempotently register `graft_dot` on a session's function registry so
    * `call_function("graft_dot", a, b)` resolves — the runtime-injection
    * flavor of SparkSessionExtensions.injectFunction. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier("graft_dot")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[FloatDot].getName, "graft_dot"),
        (children: Seq[Expression]) => FloatDot.build(children))
    }
  }
}
