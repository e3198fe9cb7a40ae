package graft

import org.apache.spark.sql.functions._

/** Keeps the xpath_* function family covered after q61 moved to a
  * single from_xml parse (round 10): xpath_string over the generated
  * order documents must agree with from_xml's attribute mapping — the
  * two extraction routes are interchangeable on this shape, which is
  * exactly why the declared query keeps only the one-parse form.
  */
class XmlPathSpec extends SparkSpec {

  test("xpath_string(@status) == from_xml's _status on corpus rows") {
    val xml = concat(
      lit("<order id=\""), col("o_orderkey"),
      lit("\" status=\""), col("o_orderstatus"),
      lit("\"><total>"), col("o_totalprice").cast("string"),
      lit("</total><prio>"), col("o_orderpriority"),
      lit("</prio></order>"))
    val rows = Tables.orders(spark, sf)
      .withColumn("x", xml)
      .select(
        col("o_orderstatus"),
        expr("xpath_string(x, '/order/@status')").as("via_xpath"),
        expr("from_xml(x, '_status STRING')._status").as("via_from_xml"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) === r.getString(0), "xpath drifted from source")
      assert(r.getString(2) === r.getString(0), "from_xml drifted from source")
    }
  }

  test("xpath family edges: missing path, element text, boolean") {
    import spark.implicits._
    val df = Seq(
      """<order id="7" status="O"><total>1.5</total><prio>HIGH</prio></order>""",
      """<order id="8" status=""><total>2</total><prio></prio></order>""")
      .toDF("x")
      .select(
        expr("xpath_string(x, '/order/@status')").as("status"),
        expr("xpath_string(x, '/order/prio')").as("prio"),
        expr("xpath_string(x, '/order/missing')").as("missing"),
        expr("xpath_boolean(x, '/order/total')").as("has_total"),
        expr("xpath_double(x, '/order/total')").as("total"))
      .collect()
    assert(df(0).getString(0) === "O")
    assert(df(0).getString(1) === "HIGH")
    assert(df(0).getString(2) === "") // xpath_string yields "" for a missing path
    assert(df(0).getBoolean(3))
    assert(df(0).getDouble(4) === 1.5)
    assert(df(1).getString(0) === "")
    assert(df(1).getDouble(4) === 2.0)
  }
}
