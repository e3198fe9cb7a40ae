package graft

import org.apache.spark.sql.functions._

/** Pins the round-9 text-census kernels against the declarative forms
  * they replaced: graft_sttr_stats ≡ the posexplode + per-window
  * countDistinct plan, graft_ic_stats ≡ the 26-replace letter fold —
  * on the corpus and on constructed edges (empty tokens, trailing
  * space, all-duplicate windows, non-letters, surrogate pairs).
  */
class TextCensusSpec extends SparkSpec {

  private val W = 25

  test("graft_sttr_stats equals the exploded per-window countDistinct on the corpus") {
    functions.SttrStats.register(spark)
    val docs = Tables.documents(spark, sf)
    val kernel = docs
      .select(col("doc_id"), expr(s"graft_sttr_stats(text, $W)").as("st"))
      .select(col("doc_id"), col("st.n_windows").as("nw"), col("st.sum_types").as("ty"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exploded = docs
      .select(col("doc_id"),
              posexplode(split(col("text"), " ")).as(Seq("pos", "tok")),
              size(split(col("text"), " ")).as("n_tok"))
      .select(col("doc_id"), col("tok"), expr(s"pos div $W").as("win"), col("n_tok"))
      .filter((col("win") + 1) * W <= col("n_tok"))
      .groupBy("doc_id", "win").agg(countDistinct(col("tok")).as("types"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nw"), sum("types").as("ty"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docs with zero full windows emit (0,0) from the kernel and no row
    // from the exploded form
    kernel.foreach { case (id, (nw, ty)) =>
      assert(exploded.getOrElse(id, (0L, 0L)) === (nw, ty), s"doc $id")
    }
    assert(kernel.keySet.size === docs.count())
  }

  test("graft_sttr_stats token/window edges match split semantics") {
    functions.SttrStats.register(spark)
    import spark.implicits._
    // w=2 windows over: duplicates, empty tokens from double/trailing
    // spaces, exactly-full and partial windows
    val cases = Seq(
      "a a a a",        // 2 full windows, all-dup: types 1+1
      "a b c",          // 1 full window (a,b), partial (c) dropped
      "a  b c",         // tokens: a,"",b,c → windows (a,""),(b,c) → 2+2
      "a b ",           // tokens: a,b,"" → 1 full window (a,b)
      "x",              // no full window
      "")               // split("") = [""] → 0 full windows of 2... n_tok=1
    val got = cases.toDF("text")
      .select(expr("graft_sttr_stats(text, 2)").as("st"))
      .select(col("st.n_windows"), col("st.sum_types"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = cases.map { t =>
      val toks = t.split(" ", -1).toSeq
      val full = toks.length / 2
      val types = (0 until full).map(w => toks.slice(w * 2, w * 2 + 2).distinct.size.toLong).sum
      (full.toLong, types)
    }
    assert(got === want)
  }

  test("graft_ic_stats equals the 26-replace fold on the corpus and edges") {
    functions.IcStats.register(spark)
    import spark.implicits._
    val heads = Tables.documents(spark, sf)
      .select(lower(substring(col("text"), 1, 256)).as("head"))
      .as[String].collect().toSeq ++ Seq(
        "", "zzz", "a1b2c3!@#", "ñøé", "😀aa", "A B C" // upper excluded: input is pre-lowered in the query
      )
    val got = heads.toDF("head")
      .select(expr("graft_ic_stats(head)").as("st"))
      .select(col("st.n"), col("st.rep"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = heads.map { h =>
      val f = ('a' to 'z').map(c => h.count(_ == c).toLong)
      (f.sum, f.map(x => x * (x - 1)).sum)
    }
    assert(got === want)
  }
}
