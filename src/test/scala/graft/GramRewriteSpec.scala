package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the round-10 gram-family shuffle removals against the naive
  * forms they replaced (each was oracle-green before the rewrite, so
  * naive ≡ rewrite ⇒ the oracle contract is untouched):
  *
  *  - dd_sorted_neighborhood: LEAD(k)-in-the-ranking-window vs the
  *    round-9 exploded self-join on (lang, rank+k);
  *  - ta_gram_novelty: first-seen counts via the gram→first_doc
  *    dimension vs the round-9 per-gram window over the full stream;
  *  - kernel mode 3 as a .distinct() replacement: the exact row set of
  *    explode(mode 2).distinct() on corpus text.
  *
  * Corpus plus hand-built fixtures for the seams the rewrites
  * introduce: langs with fewer docs than the w=3 neighborhood, tied
  * sort heads, docs below the gram width, duplicate grams across docs.
  */
class GramRewriteSpec extends SparkSpec {

  // fixture dirs are deleted after the suite (ADVICE r10: they leaked)
  private val tmpDirs = scala.collection.mutable.Buffer.empty[String]
  private def tmpDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    tmpDirs += dir
    dir
  }
  override def afterAll(): Unit = {
    try tmpDirs.foreach(d =>
      scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively())
    finally super.afterAll()
  }

  private def rows(name: String, dir: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq.map(_.toSeq)

  /** The round-9 dd_sorted_neighborhood: ranked self-join on rank+off. */
  private def sortedNeighborhoodNaive(dir: String): Seq[Seq[Any]] = {
    // shingleSet is DedupQueries-private, so the naive reference
    // re-derives only the PAIR STRUCTURE (lang, da, db, rank_gap) via
    // the round-9 ranked self-join; jaccard values are pinned by the
    // DuckDB oracle, pair identity is what the LEAD rewrite changes
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("head"), col("doc_id"))
    val r = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
              substring(regexp_replace(col("text"), "[^a-z ]", ""), 1, 40).as("head"))
      .withColumn("rn", row_number().over(w))
    val a = r.select(col("lang").as("la"), col("doc_id").as("da"), col("rn").as("ra"),
                     explode(sequence(lit(1), lit(3))).as("off"))
      .withColumn("target", col("ra") + col("off"))
    val b = r.select(col("lang").as("lb"), col("doc_id").as("db"), col("rn").as("rb"))
    a.join(b, col("la") === col("lb") && col("target") === col("rb"))
      .select(col("la").as("lang"), col("da"), col("db"),
              col("off").cast("int").as("rank_gap"))
      .orderBy("lang", "da", "db")
      .collect().toSeq.map(_.toSeq)
  }

  test("sorted-neighborhood LEAD rewrite emits exactly the join's pairs (corpus)") {
    val got = rows("dd_sorted_neighborhood", sf).map(_.take(4))
    assert(got === sortedNeighborhoodNaive(sf))
  }

  test("sorted-neighborhood LEAD rewrite: langs smaller than the window, tied heads") {
    import spark.implicits._
    val dir = tmpDir("gram_sn")
    val docs = Seq(
      // lang with ONE doc (no successors at any k), two docs, three docs
      (1L, "aa", "solo doc text here", "s1"),
      (2L, "bb", "first of two", "s1"), (3L, "bb", "second of two", "s1"),
      (4L, "cc", "x y z", "s1"), (5L, "cc", "x y z", "s1"), (6L, "cc", "x y z", "s1"),
      // tied 40-char heads (identical normalized prefixes, order falls to doc_id)
      (7L, "dd", "same same same same tail7", "s2"),
      (8L, "dd", "same same same same tail8", "s2"),
      (9L, "dd", "same same same same tail9", "s2"),
      (10L, "dd", "same same same same tail10", "s2"),
      (11L, "dd", "zz distinct", "s2"))
      .toDF("doc_id", "lang", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = rows("dd_sorted_neighborhood", dir).map(_.take(4))
    assert(got === sortedNeighborhoodNaive(dir))
    // lang "aa" emits nothing; lang "bb" exactly one gap-1 pair
    assert(!got.exists(_.head == "aa"))
    assert(got.count(_.head == "bb") === 1)
    // lang "cc": 2+1 pairs (gaps 1,2 from rank1; gap 1 from rank2)
    assert(got.count(_.head == "cc") === 3)
  }

  /** The round-9 ta_gram_novelty: per-gram window over the full stream. */
  private def gramNoveltyNaive(dir: String): Seq[Seq[Any]] = {
    graft.functions.Shingles.register(spark)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
              explode(call_function("graft_shingles", col("text"), lit(6), lit(2))).as("g"))
      .distinct()
      .withColumn("first_doc", min(col("doc_id")).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_grams"),
           sum(when(col("first_doc") === col("doc_id"), 1).otherwise(0))
             .cast("int").as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
              (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
      .orderBy("doc_id")
      .collect().toSeq.map(_.toSeq)
  }

  test("gram-novelty dimension rewrite equals the per-gram window (corpus)") {
    assert(rows("ta_gram_novelty", sf) === gramNoveltyNaive(sf))
  }

  test("gram-novelty rewrite: short docs, all-novel docs, all-stale docs") {
    import spark.implicits._
    val dir = tmpDir("gram_nv")
    val docs = Seq(
      (1L, "en", "a b c d e f g h", "s"),         // all grams first-seen here
      (2L, "en", "a b c d e f g h", "s"),         // exact dup: zero novel
      (3L, "en", "a b c d e f NEW tail words x", "s"), // mixed
      (4L, "en", "too short", "s"),               // <6 tokens: NO output row
      (5L, "en", "c d e f g h extra", "s"))
      .toDF("doc_id", "lang", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = rows("ta_gram_novelty", dir)
    assert(got === gramNoveltyNaive(dir))
    assert(!got.exists(_.head == 4L))             // gram-less doc absent
    assert(got.find(_.head == 2L).get(2) === 0)   // dup doc: 0 novel
  }

  test("kernel mode 3 is exactly explode(mode 2).distinct() on corpus text") {
    graft.functions.Shingles.register(spark)
    val docs = Tables.documents(spark, sf)
    def set(mode: Int, dedup: Boolean) = {
      val e = docs.select(col("doc_id"),
        explode(call_function("graft_shingles", col("text"), lit(6), lit(mode))).as("g"))
      (if (dedup) e.distinct() else e)
        .orderBy("doc_id", "g").collect().toSeq.map(_.toSeq)
    }
    assert(set(3, dedup = false) === set(2, dedup = true))
  }
}
