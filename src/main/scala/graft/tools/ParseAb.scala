package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Anatomy of the per-row parse queries (q61/q62/q37): where does the
  * wall go — scan, the parse projection, or the final sort+noop?
  * (dev aid, not part of the driver contract).
  * `runMain graft.tools.ParseAb <sfDir>`. */
object ParseAb {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(df: => DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$tag%-36s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    val o = Tables.orders(spark, d)
    val xml = concat(
      lit("<order id=\""), col("o_orderkey"),
      lit("\" status=\""), col("o_orderstatus"),
      lit("\"><total>"), col("o_totalprice").cast("string"),
      lit("</total><prio>"), col("o_orderpriority"),
      lit("</prio></order>"))
    time("q61 scan only")(o)
    time("q61 scan+sort")(o.orderBy("o_orderkey"))
    time("q61 concat only")(o.withColumn("x", xml).select("o_orderkey", "x"))
    time("q61 concat+parse, no sort")(
      o.withColumn("x", xml)
        .select(col("o_orderkey"),
          expr("from_xml(x, '_id BIGINT, _status STRING, total DOUBLE, prio STRING')").as("st")))
    time("q61 spread+concat+parse, no sort")(
      Tables.spread(o, "o_orderkey").withColumn("x", xml)
        .select(col("o_orderkey"),
          expr("from_xml(x, '_id BIGINT, _status STRING, total DOUBLE, prio STRING')").as("st")))
    val parsed = o.withColumn("x", xml)
      .select(col("o_orderkey"),
        expr("from_xml(x, '_id BIGINT, _status STRING, total DOUBLE, prio STRING')").as("st"))
    time("q61 parse+4 extracts, no sort")(
      parsed.select(col("o_orderkey"), col("st._id"), col("st._status"),
                    col("st.total"), col("st.prio")))
    time("q61 parse+4 extracts+sort")(
      parsed.select(col("o_orderkey"), col("st._id"), col("st._status"),
                    col("st.total"), col("st.prio")).orderBy("o_orderkey"))
    time("q61 full (declared)")(graft.SparkEntry.queries("q61_xml_extract")(spark, d))
    spark.stop()
  }
}
