package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_jaro_winkler(a, b)` — the Jaro–Winkler string similarity
  * (Winkler 1990), the fuzzy-match scorer record-linkage / entity-
  * resolution verification steps use after blocking. Spark ships
  * `levenshtein` but nothing Jaro-family; this is the classic
  * parameterization, matching DuckDB's `jaro_winkler_similarity`
  * (probed: prefix weight 0.1, prefix cap 4, boost only when
  * jaro > 0.7 — 'aXXXX'/'aYYYY' returns the unboosted 0.4667,
  * 'abcdefghij'/'abcdefghiX' returns the cap-4 0.96):
  *
  *   jaro = (m/|a| + m/|b| + (m−t)/m) / 3, with the match window
  *   ⌊max(|a|,|b|)/2⌋ − 1 and t = half the out-of-order matches;
  *   jw = jaro + 0.1·min(prefix,4)·(1−jaro)  when jaro > 0.7.
  *
  * Unit caveat, documented not hidden: this implementation iterates
  * UTF-16 code units (Java chars) while DuckDB's iterates bytes — the
  * two agree exactly on ASCII, which is what the declared queries feed
  * it (TPC-H-shaped names). Score DOUBLES are never hash-compared
  * against the oracle: the declared query compares the thresholded PAIR
  * SET at θ = 0.8412345, a threshold no small-denominator rational
  * (which is all jw can be: denominators 30·|a|·|b|·m) can sit within
  * one ulp of, so engine-local summation order cannot flip a row in or
  * out. The same reasoning makes the 0.7 boost-threshold edge moot: at
  * jaro = 0.7 exactly, even the maximal boost reaches only 0.82 < θ.
  *
  * Codegen: static call inside whole-stage codegen (loop kernels don't
  * inline; the call keeps the row in the generated pipeline — the
  * FloatDot/FoldText pattern).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects (STRING, STRING), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerSim.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {

  /** Classic Jaro–Winkler over UTF-16 code units. Pure; thread-safe. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString; val b = ub.toString
    val la = a.length; val lb = b.length
    // Both-empty returns 0.0 to match DuckDB's jaro_winkler_similarity
    // ('','') = 0.0 (probed on DuckDB 1.0) — the parity contract above
    // covers the empty edge too, even though the classic definition
    // would call two empty strings identical (latent here: p_name
    // inputs are never empty, so the oracle gate can't see the edge).
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both match sequences in order
    var t = 0; var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // t/2 is INTEGER division on purpose: the raw out-of-order count can
    // be odd (e.g. 'abcdef'/'bcadef' → 3), and DuckDB truncates (probed:
    // 0.9444..., the t=1 value, not the t=1.5 value 0.9166...)
    val jaro = (md / la + md / lb + (md - (t / 2)) / md) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val pMax = math.min(4, math.min(la, lb))
      while (p < pMax && a.charAt(p) == b.charAt(p)) p += 1
      jaro + 0.1 * p * (1.0 - jaro)
    } else jaro
  }

  def build(children: Seq[Expression]): JaroWinklerSim = {
    require(children.size == 2,
      s"graft_jaro_winkler requires exactly 2 arguments, got ${children.size}")
    JaroWinklerSim(children(0), children(1))
  }

  /** Idempotently register `graft_jaro_winkler` on an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier("graft_jaro_winkler")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[JaroWinklerSim].getName, "graft_jaro_winkler"),
        (children: Seq[Expression]) => JaroWinklerSim.build(children))
    }
  }
}
