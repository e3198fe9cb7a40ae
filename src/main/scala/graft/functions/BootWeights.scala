package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** el_bootstrap_ci's Poisson(1) replication weights, all 32 replicates
  * in one pass per event (round 11).
  *
  * The declared weight for replicate b is the inverse Poisson(1) CDF
  * applied to Portable.h32("boot|b|event_id") — the round-10 form
  * evaluated 32 separate interpreted md5(concat(cast…)) → hex →
  * conv(substring…) expression chains per event, each allocating the
  * concat buffer, the 32-char hex rendering and its substring. This
  * kernel digests the same bytes ("boot|" ++ b ++ "|" ++ id, ASCII
  * decimal renderings — byte-identical to the CAST(… AS VARCHAR)
  * concatenation in both engines) with one thread-local MessageDigest
  * and reads the first 4 digest bytes as the unsigned 32-bit value
  * directly (the Shingles.h32Of identity, pinned there against
  * Portable.h32). The CDF breakpoints are the same hardcoded
  * floor(cdf·2³²) literals as the declared CASE ladder.
  */
case class BootWeights(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_boot_weights"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BIGINT, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    BootWeights.weights(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BootWeights.weights($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BootWeights {

  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** "boot|b|" for b = 0..31 — the static digest prefixes. */
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(32)(b => s"boot|$b|".getBytes("US-ASCII"))

  /** floor(CDF_Poisson(1)(w) · 2³²) for w = 0..6 — the declared CASE
    * ladder's literals; h ≥ the last breakpoint means w = 7. */
  private val breaks: Array[Long] = Array(
    1580030168L, 3160060337L, 3950075421L, 4213413783L,
    4279248373L, 4292415291L, 4294609777L)

  def weights(id: Long): GenericArrayData = {
    val idBytes = java.lang.Long.toString(id).getBytes("US-ASCII")
    val md = md5.get()
    val out = new Array[Any](32)
    var b = 0
    while (b < 32) {
      md.reset()
      md.update(prefixes(b))
      md.update(idBytes)
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var w = 0
      while (w < 7 && h >= breaks(w)) w += 1
      out(b) = w.toLong
      b += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier("graft_boot_weights")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(ident,
        new ExpressionInfo(classOf[BootWeights].getName, "graft_boot_weights"),
        children => { require(children.size == 1); BootWeights(children.head) })
    }
  }
}
