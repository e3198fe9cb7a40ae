package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Vectors._

/** Scratch micro-benchmark for operator hot paths (dev aid, not part of
  * the driver contract). `runMain graft.tools.Micro <sfDir>`. */
object Micro {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val e = Tables.embeddings(spark, d)
    time("scan only")(e.count())
    time("norms (1 fold/vec)")(e.select(norm(col("embedding")).as("n")).filter(col("n") > 0).count())
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val joined = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
    time("cross join only")(joined.count())
    time("join + dot fold")(joined.select(dot(col("embedding"), col("qv")).as("dt")).filter(col("dt") > -1e9).count())
    time("join + dot fold x2")(joined.select((dot(col("embedding"), col("qv")) + dot(col("qv"), col("qv"))).as("dt")).filter(col("dt") > -1e9).count())
    // edit-distance anatomy: the levenshtein projection must land after a
    // lineage barrier or it collapses into the join's single map-side
    // partition (see SketchQueries.dd_edit_distance)
    val t = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("source"),
              substring(regexp_replace(col("text"), "[^a-z ]", ""), 1, 40).as("head"))
    val a = t.select(t.columns.map(c => col(c).as(s"a_$c")): _*)
    val b = t.select(t.columns.map(c => col(c).as(s"b_$c")): _*)
    val pairs = a.join(b, col("a_lang") === col("b_lang") && col("a_source") === col("b_source") &&
      col("a_doc_id") < col("b_doc_id"))
    time("edit: lev in-plan (serial)")(pairs.select(levenshtein(col("a_head"), col("b_head")).as("ed")).filter(col("ed") <= 20).count())
    time("edit: lev after barrier")(pairs.repartition(col("a_doc_id")).localCheckpoint(false)
      .select(levenshtein(col("a_head"), col("b_head")).as("ed")).filter(col("ed") <= 20).count())
    spark.stop()
  }
}
