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

  /** Order-independent exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(28,6)")).cast("double")

  /** Order-independent mean of a double column (exact sum / count). */
  def davg(c: Column): Column =
    (sum(c.cast("decimal(28,6)")).cast("double") / count(c)).cast("double")

  /** DuckDB fragments mirroring dsum/davg. */
  def duckDsum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,6))) AS DOUBLE)"
  def duckDavg(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(28,6))) AS DOUBLE) / COUNT($expr) AS DOUBLE)"

  /** Microsecond-truncated event time — events.ts is ns-precision parquet;
    * Spark truncates to µs on read, the oracle must CAST(ts AS TIMESTAMP). */
  def tsUs(c: Column): Column = c

  /** Whitespace tokens of a document (documents.text is single-space). */
  def tokens(c: Column): Column = split(c, " ")
}
