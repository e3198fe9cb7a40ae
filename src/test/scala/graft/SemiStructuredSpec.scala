package graft

import org.apache.spark.sql.functions._

/** XML / VARIANT parsing: the construction preconditions the round-trip
  * queries rely on, plus pinned literal semantics for the operators. */
class SemiStructuredSpec extends SparkSpec {

  test("fixture columns carry no XML-special characters (the q61 precondition)") {
    val bad = Tables.orders(spark, sf)
      .filter(col("o_orderstatus").rlike("[&<>\"]") ||
              col("o_orderpriority").rlike("[&<>\"]"))
      .count()
    assert(bad === 0L, "XML construction would need escaping")
  }

  test("from_xml maps attributes under the default '_' prefix; elements by name") {
    val r = spark.sql(
      """SELECT from_xml('<o id="9" s="F"><t>1.25</t></o>',
        |                '_id BIGINT, _s STRING, t DOUBLE') AS st""".stripMargin).head()
    val st = r.getStruct(0)
    assert(st.getLong(0) === 9L && st.getString(1) === "F" && st.getDouble(2) === 1.25)
  }

  test("variant_get pins path, array-index, and missing-path semantics") {
    val r = spark.sql(
      """SELECT variant_get(parse_json('{"m":{"k":7},"a":[10,20]}'), '$.m.k', 'bigint'),
        |       variant_get(parse_json('{"a":[10,20]}'), '$.a[0]', 'bigint'),
        |       try_variant_get(parse_json('{"a":1}'), '$.z', 'bigint')""".stripMargin).head()
    assert(r.getLong(0) === 7L && r.getLong(1) === 10L && r.isNullAt(2))
  }

  test("double -> string -> double round trip is lossless for fixture totals") {
    val diverged = Tables.orders(spark, sf)
      .filter(col("o_totalprice").cast("string").cast("double") =!= col("o_totalprice"))
      .count()
    assert(diverged === 0L)
  }
}
