package graft

import graft.queries.SqlUdfQueries
import org.apache.spark.sql.functions._

/** SQL UDFs must INLINE: the plan carries no black-box UDF node, the
  * scalar body matches Portable.cents bit-for-bit, and the TVF expands
  * to its explode. */
class SqlUdfSpec extends SparkSpec {

  test("scalar SQL UDF inlines and equals Portable.cents on every lineitem row") {
    SqlUdfQueries.registerSqlFns(spark)
    Tables.lineitem(spark, sf).createOrReplaceTempView("sqludf_li")
    val df = spark.sql(
      "SELECT graft_cents(l_extendedprice) AS a FROM sqludf_li")
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("udf"), "SQL UDF must inline, not plan a UDF node:\n" + p)
    val direct = Tables.lineitem(spark, sf)
      .select(functions.Portable.cents(col("l_extendedprice")).as("a"))
    assert(df.exceptAll(direct).isEmpty && direct.exceptAll(df).isEmpty)
  }

  test("SQL table function expands inline and LATERAL-joins") {
    SqlUdfQueries.registerSqlFns(spark)
    val rows = spark.sql("SELECT t FROM graft_ladder(3, 6)").collect().map(_.getInt(0))
    assert(rows.sorted.toSeq === Seq(3, 4, 5, 6))
    val p = spark.sql("SELECT t FROM graft_ladder(3, 6)")
      .queryExecution.optimizedPlan.toString
    assert(p.contains("explode") || p.contains("Generate"),
      "TVF should expand to its generator:\n" + p)
  }

  test("q73_sql_macro equals the DataFrame formulation") {
    val got = SparkEntry.queries("q73_sql_macro")(spark, sf).collect()
    val h = Tables.lineitem(spark, sf)
      .groupBy(col("l_quantity").cast("long").as("q"))
      .agg(count(lit(1)).as("n"),
           sum(functions.Portable.cents(col("l_extendedprice"))).as("c"))
    val t = spark.range(1, 51).select(col("id").cast("int").as("t"))
    val expect = t.join(h, col("q") >= col("t"))
      .groupBy("t").agg(sum(col("n")).as("n_items"), sum(col("c")).as("rev"))
      .orderBy("t").collect()
    assert(got.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ===
           expect.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("q79_pipe_syntax: the pipe chain optimizes to the classic form's plan") {
    val piped = SparkEntry.queries("q79_pipe_syntax")(spark, sf)
    Tables.orders(spark, sf).createOrReplaceTempView("g_orders")
    val classic = spark.sql("""
      SELECT o_orderpriority, COUNT(*) AS n,
             SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS total_cents,
             SUM(CAST(round(o_totalprice*100) AS BIGINT))
               div COUNT(*) AS avg_cents
      FROM g_orders WHERE o_orderstatus <> 'P'
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    // same rows AND the same physical operator skeleton — |> is syntax,
    // not a different engine path
    assert(piped.collect().toSeq === classic.collect().toSeq)
    def skeleton(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect { case n => n.nodeName }
        .filterNot(_.contains("WholeStageCodegen"))
    assert(skeleton(piped) === skeleton(classic))
  }

  test("q84_sql_script: the scripted WHILE search finds the minimal valid cap") {
    val dir = "/root/testdata/sf0.01"
    val r = SparkEntry.queries("q84_sql_script")(spark, dir).head()
    def g(c: String) = r.getLong(r.fieldIndex(c))
    val cap = g("cap")
    assert((cap & (cap - 1)) == 0 && cap >= 1, s"cap $cap must be a power of two")
    assert(g("over_bp") <= 500, "at most 5% of days may exceed the cap")
    // MINIMALITY: the next cap down must violate the 5% rule (unless
    // cap is already 1) — recomputed from the raw daily histogram
    if (cap > 1) {
      import org.apache.spark.sql.functions._
      val daily = Tables.events(spark, dir)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
      val nd = daily.count()
      val overAtHalf = daily.filter(col("n") > cap / 2).count()
      assert(overAtHalf * 20 > nd,
        s"cap/2 = ${cap / 2} already satisfies the rule — the loop overshot")
    }
    // session variables survive outside scripting: the other half of
    // the Spark 4 variable surface (DECLARE/SET VAR at session scope)
    spark.sql("DECLARE OR REPLACE VARIABLE graft_probe BIGINT DEFAULT 3")
    spark.sql("SET VAR graft_probe = graft_probe * 14")
    assert(spark.sql("SELECT graft_probe AS v").head.getLong(0) == 42L)
  }
}
