package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `graft_es_key(key, weight)` — q78's A-ES (Efraimidis–Spirakis by
  * max-of-uniforms) sampling key as one codegen kernel: the maximum of
  * `weight` portable uniform draws for `key`, each draw the house
  * `pmod(h60(key || '|es|' || j), 1e6)`.
  *
  * Why an Expression (round 9): the declarative form materialized ALL 8
  * draws per row as a literal-width array (each draw = a string concat,
  * an md5 over the string, a 15-hex-char substring, and a base-16 conv)
  * and sliced to the first `weight` — for a top-20-of-corpus query that
  * is 8 string md5 pipelines per ROW regardless of weight (14.1 s at
  * sf10, the largest fixable post-census tail entry). The kernel digests
  * only the `weight` draws that exist and never leaves bytes: the
  * 60-bit value IS the first 8 digest bytes (big-endian, unsigned)
  * shifted right 4 — bit-identical to parsing the first 15 hex chars —
  * so the oracle (which keeps the literal md5/substring SQL) is
  * unchanged. EsKeySpec pins kernel ≡ the array/slice form and ≡
  * Portable.h60 per draw.
  */
case class EsKey(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_es_key expects (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_es_key"

  override def nullSafeEval(key: Any, w: Any): Any =
    EsKey.esKey(key.asInstanceOf[Long], w.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, w) => s"graft.functions.EsKey.esKey($k, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object EsKey {

  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** max over j in [1, w] of pmod(h60(s"$key|es|$j"), 1e6). h60 = first
    * 15 hex chars of the md5 = top 60 bits of the digest. w must be >= 1
    * (q78 floors its weight at 1); the function is in the session
    * FunctionRegistry, and a silent -1 for a zero weight would sort
    * below every real key instead of failing loudly. */
  def esKey(key: Long, w: Long): Long = {
    if (w < 1)
      throw new IllegalArgumentException(
        s"graft_es_key: weight must be >= 1, got $w")
    val md = md5.get()
    var best = -1L
    var j = 1L
    while (j <= w) {
      md.reset()
      val dig = md.digest((key.toString + "|es|" + j).getBytes(StandardCharsets.UTF_8))
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
      val draw = (v >>> 4) % 1000000L
      if (draw > best) best = draw
      j += 1
    }
    best
  }

  def build(children: Seq[Expression]): EsKey = {
    require(children.size == 2,
      s"graft_es_key requires exactly 2 arguments, got ${children.size}")
    EsKey(children.head, children(1))
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier("graft_es_key")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[EsKey].getName, "graft_es_key"),
        (children: Seq[Expression]) => EsKey.build(children))
    }
  }
}
