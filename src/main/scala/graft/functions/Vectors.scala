package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns, built from Spark's
  * codegen'd higher-order functions (no UDFs).
  *
  * Portability invariant (verified empirically): a left-to-right fold of
  * per-index double products — Spark's `aggregate(zip_with(...))` — is
  * bit-identical to DuckDB's `list_sum` over the same product list, so
  * cosine similarities hash-match the oracle with NO rounding. Keep the
  * fold order sequential; never sum float products via a shuffled
  * aggregate.
  */
object Vectors {

  /** dot(a, b) in double, sequential fold over indices. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Codegen'd dot for float×float vectors (FloatDot expression) — call
    * `FloatDot.register(spark)` once per session first. Bit-identical to
    * `dot` (same sequential accumulation), ~order-of-magnitude faster in
    * pair loops. Keep the HOF `dot` for mixed-type inputs (e.g. double
    * hyperplane literals). */
  def nativeDot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def nativeNorm(a: Column): Column = sqrt(nativeDot(a, a))

  /** Cosine similarity — every step (fold, sqrt, divide) is IEEE-exact and
    * engine-portable. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB fragment: dot of two list expressions in double, same fold. */
  def duckDot(a: String, b: String): String =
    s"list_sum([CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE) for i in range(1, len($a)+1)])"

  def duckNorm(a: String): String = s"sqrt(${duckDot(a, a)})"

  def duckCosine(a: String, b: String): String =
    s"(${duckDot(a, b)} / (${duckNorm(a)} * ${duckNorm(b)}))"

  /** Deterministic pseudo-random hyperplane weight for LSH bit `b`,
    * dimension `d`: the 32-bit md5 hash of "lsh|b|d", centered at zero.
    * Computable identically in SQL (Portable.duckH) and in Scala (below),
    * so Spark can inline the planes as literals while the oracle derives
    * them in a CTE.
    */
  def planeWeight(b: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"lsh|$b|$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16).toDouble - 2147483648.0
  }

  /** Literal array column for hyperplane `b` over `dim` dimensions. */
  def planeLit(b: Int, dim: Int): Column =
    array((0 until dim).map(d => lit(planeWeight(b, d))): _*)

  /** Random-hyperplane LSH signature (`nBits` bits) of an embedding:
    * bit b set iff dot(v, plane_b) > 0. Integer result, exactly portable.
    * Uses the codegen'd graft_dot (float vec × double plane literal) —
    * call `FloatDot.register(spark)` on the session first.
    */
  def lshSignature(v: Column, dim: Int, nBits: Int): Column =
    (0 until nBits).map { b =>
      when(nativeDot(v, planeLit(b, dim)) > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)

  /** DuckDB fragment for the same signature (sig of `vecExpr`). */
  def duckLshSignature(vecExpr: String, dim: Int, nBits: Int): String = {
    val bitTerms = (0 until nBits).map { b =>
      val plane =
        s"[CAST(CAST(('0x' || substring(md5('lsh|$b|' || CAST(d AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) - 2147483648.0 for d in range(0, $dim)]"
      s"CASE WHEN list_sum([CAST(($vecExpr)[i] AS DOUBLE) * ($plane)[i] for i in range(1, $dim+1)]) > 0 THEN ${1 << b} ELSE 0 END"
    }
    s"(${bitTerms.mkString(" + ")})"
  }
}
