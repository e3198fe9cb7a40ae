package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_fold_text(s)` — Unicode text canonicalization for dedup /
  * contamination pipelines: NFD-decompose, strip combining marks
  * (category Mn), case-fold to lowercase, re-compose to NFC. The
  * standard pre-dedup fold ("école" / "Ecole" / "ecole" all hash
  * identically) that Spark has no built-in for (`lower` keeps accents;
  * there is no `strip_accents`).
  *
  * Parity contract with the DuckDB oracle (`lower(strip_accents(x))`,
  * utf8proc-backed): utf8proc's accent strip is the same NFD → drop-Mn
  * pipeline (its `UTF8PROC_STRIPMARK` removes exactly the nonspacing
  * marks a canonical decomposition exposes), and for the Latin-1
  * diacritics the suite's queries construct (é à ü), both engines land
  * on the identical ASCII bytes, so the comparison is exact-string, not
  * float-fuzzy. Lower/strip commute for these inputs (case mapping
  * never introduces or consumes a combining mark in Latin).
  *
  * Execution shape: a scalar expression inside whole-stage codegen —
  * `doGenCode` emits a static call (the loop body is a JDK Normalizer
  * pass, the same pattern as Spark's own regexp/string expressions) so
  * the row stays in the generated pipeline with no interpreted-eval
  * fallback and no UDF boxing.
  */
case class FoldText(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fold_text expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fold_text"

  override def nullSafeEval(input: Any): Any =
    FoldText.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FoldText.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FoldText {

  /** NFD → drop Mn → lowercase(ROOT) → NFC. Pure function of the input
    * string — safe to call from generated code on any thread. */
  def fold(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: ASCII never changes shape under NFD/NFC and lowercases
    // per-char — skip the Normalizer allocation for the common case
    var ascii = true
    var i = 0
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return UTF8String.fromString(str.toLowerCase(java.util.Locale.ROOT))
    val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    val lowered = sb.toString.toLowerCase(java.util.Locale.ROOT)
    UTF8String.fromString(Normalizer.normalize(lowered, Normalizer.Form.NFC))
  }

  def build(children: Seq[Expression]): FoldText = {
    require(children.size == 1,
      s"graft_fold_text requires exactly 1 argument, got ${children.size}")
    FoldText(children.head)
  }

  /** Idempotently register `graft_fold_text` on an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier("graft_fold_text")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[FoldText].getName, "graft_fold_text"),
        (children: Seq[Expression]) => FoldText.build(children))
    }
  }
}
