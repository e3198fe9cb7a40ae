package graft

import org.apache.spark.sql.functions._

/** The remaining Spark 4 SQL-API surfaces a production query service
  * leans on: parameterized `spark.sql` (named and positional markers —
  * the injection-safe templating path), `IDENTIFIER()` for templated
  * table/column names, and the ANSI-mode `try_*` family (NULL instead
  * of runtime error — the semantics ETL needs when one bad row must
  * not kill a 100 TB job).
  */
class ParameterizedSqlSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("named parameter markers bind literals injection-safely") {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_p")
    val want = spark.sql(
      "SELECT count(*) AS n FROM orders_p WHERE o_orderpriority = '1-URGENT'")
      .head.getLong(0)
    val got = spark.sql(
      "SELECT count(*) AS n FROM orders_p WHERE o_orderpriority = :prio",
      Map("prio" -> "1-URGENT")).head.getLong(0)
    assert(got == want && want > 0)
    // a malicious value stays a VALUE — no injection, just zero matches
    val inj = spark.sql(
      "SELECT count(*) AS n FROM orders_p WHERE o_orderpriority = :prio",
      Map("prio" -> "' OR '1'='1")).head.getLong(0)
    assert(inj == 0L)
  }

  test("positional markers bind in order") {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_p")
    val n = spark.sql(
      "SELECT count(*) AS n FROM orders_p WHERE o_totalprice > ? AND o_orderpriority = ?",
      Array(100000.0, "1-URGENT")).head.getLong(0)
    val want = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 100000.0 && col("o_orderpriority") === "1-URGENT")
      .count()
    assert(n == want && want > 0)
  }

  test("IDENTIFIER() templates table and column names from parameters") {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_p")
    val got = spark.sql(
      "SELECT max(IDENTIFIER(:c)) AS m FROM IDENTIFIER(:t)",
      Map("c" -> "o_orderkey", "t" -> "orders_p")).head.getLong(0)
    val want = Tables.orders(spark, dir).agg(max("o_orderkey")).head.getLong(0)
    assert(got == want)
  }

  test("try_* family: NULL instead of ANSI runtime errors") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "these semantics only matter under ANSI mode, which Spark 4 defaults on")
    val r = spark.sql(
      """SELECT try_divide(1, 0)                       AS div0,
        |       try_cast('not a number' AS BIGINT)     AS badcast,
        |       try_add(9223372036854775807, 1)        AS ovf,
        |       try_element_at(array(1, 2), 9)         AS oob,
        |       try_to_timestamp('garbage')            AS badts""".stripMargin).head
    (0 until 5).foreach(i => assert(r.isNullAt(i), s"field $i must be NULL"))
    // and the non-try forms DO raise under ANSI — the contrast that
    // makes try_* a deliberate choice, not a default
    intercept[Exception](spark.sql("SELECT 1/0").collect())
    intercept[Exception](
      spark.sql("SELECT CAST('not a number' AS BIGINT)").collect())
  }
}
