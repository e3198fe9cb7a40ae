package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over ARRAY<FLOAT>/ARRAY<DOUBLE> columns
  * (each side independently float or double — embedding·embedding and
  * embedding·hyperplane both stay in one expression).
  *
  * The portable baseline (Vectors.dot) is an `aggregate(zip_with(...))`
  * fold; higher-order-function lambdas evaluate interpreted, one boxed
  * call per element. This expression compiles to a tight primitive loop
  * inside whole-stage codegen — same left-to-right double accumulation,
  * so results are bit-identical to the fold (and to the DuckDB oracle);
  * only the execution speed changes. This is tier (b) of the task's
  * custom-operator ladder: a scalar Catalyst Expression, not a UDF.
  *
  * Array elements must be non-null (vectors are dense); lengths are
  * defensively min()'d.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires ARRAY<FLOAT|DOUBLE> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  private def get(x: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType => x.getFloat(i).toDouble
    case _         => x.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x  = a.asInstanceOf[ArrayData]
    val y  = b.asInstanceOf[ArrayData]
    val lt = elemType(left.dataType).get
    val rt = elemType(right.dataType).get
    val n  = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      acc += get(x, i, lt) * get(y, i, rt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def accessor(arr: String, i: String, dt: DataType): String = dt match {
        case FloatType => s"(double)$arr.getFloat($i)"
        case _         => s"$arr.getDouble($i)"
      }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val la = accessor(a, i, elemType(left.dataType).get)
      val ra = accessor(b, i, elemType(right.dataType).get)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $la * $ra;
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
