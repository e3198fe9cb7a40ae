package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic primitives.
  *
  * Every declared query is hash-compared against DuckDB executing ANSI-ish
  * SQL on the same parquet (Verify.scala / the driver's oracle). Two things
  * are NOT portable across engines and must never reach a checked result:
  *   - engine-native hash functions (Spark `xxhash64` vs DuckDB `hash`),
  *   - floating-point aggregation order (partial aggs sum in different
  *     orders; windowed sums use different algorithms, e.g. segment trees).
  *
  * Portable substitutes:
  *   - hashes derive from `md5` (identical hex in both engines); a prefix of
  *     the hex digest is parsed as an integer. DuckDB equivalent:
  *     `CAST(('0x' || substring(md5(x), 1, N)) AS BIGINT)`.
  *   - SUM/AVG of doubles goes through an exact DECIMAL cast per row, so the
  *     aggregate value is order-independent, then back to DOUBLE. Per-row
  *     double arithmetic (mul/add/div) is IEEE-754-exact and portable.
  *
  * Reference note: the cascade broker has no hashing at all (round-robin
  * placement, /root/reference/src/producer/main.rs:196); these primitives
  * exist for the dedup/similarity extension surface.
  */
object Portable {

  /** 60-bit hash: first 15 hex chars of md5, as BIGINT. */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** 32-bit hash: first 8 hex chars of md5, as BIGINT (value < 2^32). */
  def h32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** 16-bit hash: first 4 hex chars of md5, as INT. */
  def h16(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 4), 16, 10).cast("int")

  /** DuckDB SQL fragment for the same hash families. */
  def duckH(expr: String, hexChars: Int): String =
    s"CAST(('0x' || substring(md5($expr), 1, $hexChars)) AS BIGINT)"

  /** Money/measure columns in the corpus carry ≤2 decimal places, so the
    * exact-sum scheme is INTEGER CENTS: `round(x*100)` is unambiguous
    * (inputs sit ~1e-10 from an integer — no .5 ties, so Spark's
    * shortest-repr rounding and DuckDB's exact-binary rounding agree),
    * the long sum is order-independent, long→double conversion is IEEE
    * round-to-nearest in both engines, and the final division by a power
    * of ten (exactly representable) is one correctly-rounded op. Decimal
    * types are deliberately avoided: Spark casts double→decimal via the
    * shortest string repr while DuckDB rounds the exact binary value, and
    * decimal→double diverges by 1 ulp once the scaled integer exceeds
    * 2^53.
    *
    * Overflow headroom: cents sums fit a long up to ~9×10^16 dollars;
    * 2-factor/3-factor product sums up to ~9×10^14 / ~9×10^12 row-sums —
    * fine at any driver SF. A 100 TB deployment would widen to
    * DECIMAL(38,x) and give up oracle bit-parity, not correctness.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")
  def duckCents(expr: String): String = s"CAST(round(($expr)*100) AS BIGINT)"

  /** JVM-side twin of [[cents]] for stateful processors: HALF_UP on the
    * shortest decimal repr — math.round would round half-toward-+inf and
    * diverge on negative .5 cents. One definition so batch/stream cents
    * cannot drift (UserStatsProcessor, SessionCloser). */
  def centsJvm(v: Double): Long =
    BigDecimal.valueOf(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Order-independent exact sum of a ≤2dp double column, as double. */
  def dsum(c: Column): Column =
    sum(cents(c)).cast("double") / lit(100.0)

  /** Order-independent mean of a ≤2dp double column (exact sum / count). */
  def davg(c: Column): Column =
    sum(cents(c)).cast("double") / lit(100.0) / count(c)

  /** Exact sum of a product of ≤2dp factors (e.g. price × (1-discount)):
    * each factor goes to integer cents, the product is exact integer
    * arithmetic, and one descale at the end. */
  def dsumProd(factors: Column*): Column =
    sum(factors.map(cents).reduce(_ * _)).cast("double") /
      lit(math.pow(10, 2 * factors.size))

  /** DuckDB fragments mirroring the above. */
  def duckDsum(expr: String): String =
    s"CAST(SUM(${duckCents(expr)}) AS DOUBLE) / CAST(100 AS DOUBLE)"
  def duckDavg(expr: String): String =
    s"CAST(SUM(${duckCents(expr)}) AS DOUBLE) / CAST(100 AS DOUBLE) / COUNT($expr)"
  def duckDsumProd(exprs: String*): String =
    s"CAST(SUM(${exprs.map(duckCents).mkString(" * ")}) AS DOUBLE) / CAST(${math.pow(10, 2 * exprs.size).toLong} AS DOUBLE)"

  /** For unit-scale values (|v| ≤ ~2000, e.g. cosines) with full double
    * precision: DECIMAL at scale 12 — the scaled sum stays below 2^53 so
    * both engines' decimal→double conversion is exact. */
  def dsumUnit(c: Column): Column = sum(c.cast("decimal(24,12)")).cast("double")
  def davgUnit(c: Column): Column =
    (sum(c.cast("decimal(24,12)")).cast("double") / count(c)).cast("double")
  def duckDsumUnit(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(24,12))) AS DOUBLE)"
  def duckDavgUnit(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(24,12))) AS DOUBLE) / COUNT($expr) AS DOUBLE)"

  /** Whitespace tokens of a document (documents.text is single-space). */
  def tokens(c: Column): Column = split(c, " ")
}
