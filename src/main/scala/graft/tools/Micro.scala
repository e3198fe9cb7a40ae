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

    // bigram-hash recipe anatomy (ta_dsir_weights): element_at×2 inside
    // a transform lambda vs slice+concat_ws vs exploded positions
    import graft.functions.Portable.h32
    val tk = Tables.documents(spark, d).select(col("doc_id"), split(col("text"), " ").as("toks"))
    val bgElem = when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1), i =>
          pmod(h32(concat_ws(" ",
            element_at(col("toks"), i), element_at(col("toks"), i + 1))), lit(1024L))))
      .otherwise(array().cast("array<long>"))
    val bgSlice = when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1), i =>
          pmod(h32(concat_ws(" ", slice(col("toks"), i, lit(2)))), lit(1024L))))
      .otherwise(array().cast("array<long>"))
    time("bigram: element_at lambda")(tk.select(col("doc_id"), explode(bgElem).as("b")).filter(col("b") >= 0).count())
    time("bigram: slice lambda")(tk.select(col("doc_id"), explode(bgSlice).as("b")).filter(col("b") >= 0).count())
    time("bigram: posexplode then hash")(tk
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p", "t")))
      .withColumn("t2", lead(col("t"), 1).over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("p")))
      .filter(col("t2").isNotNull)
      .select(pmod(h32(concat_ws(" ", col("t"), col("t2"))), lit(1024L)).as("b"))
      .filter(col("b") >= 0).count())

    // dsir anatomy: which pass is slow
    val bg = tk.select(col("doc_id"),
      when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1), i =>
          pmod(h32(concat_ws(" ", slice(col("toks"), i, lit(2)))), lit(1024L))))
        .otherwise(array().cast("array<long>")).as("bs"))
    time("dsir p1: bucket agg 1024")(bg.select(explode(col("bs")).as("b"))
      .groupBy("b").agg(count(lit(1))).count())
    val fake = typedlit((0 until 1024).map(_.toLong))
    time("dsir p2: per-doc sum")(bg.select(col("doc_id"), explode(col("bs")).as("b"))
      .select(col("doc_id"), element_at(fake, col("b").cast("int") + 1).as("dp"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"), sum(col("dp")).as("w"))
      .filter(col("w") > Long.MinValue).count())
    time("dsir p2b: no element_at")(bg.select(col("doc_id"), explode(col("bs")).as("b"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"), sum(col("b")).as("w"))
      .filter(col("w") > Long.MinValue).count())
    // flat projection: explode POSITIONS, hash outside any lambda
    val flat = tk
      .select(col("doc_id"), col("toks"),
        explode(when(size(col("toks")) >= 2, sequence(lit(1), size(col("toks")) - 1))
          .otherwise(array().cast("array<int>"))).as("i"))
      .select(col("doc_id"),
        pmod(h32(concat_ws(" ", slice(col("toks"), col("i"), lit(2)))), lit(1024L)).as("b"))
    time("dsir p1 flat: bucket agg")(flat.groupBy("b").agg(count(lit(1))).count())
    time("dsir p2 flat: per-doc sum")(flat
      .groupBy("doc_id").agg(count(lit(1)).as("n"), sum(col("b")).as("w"))
      .filter(col("w") > Long.MinValue).count())
    spark.stop()
  }
}
