package graft

import java.nio.file.{Files, Paths}

/** Ingest resilience: a 100 TB crawl WILL contain truncated/corrupt
  * parquet parts; the ops dial is `spark.sql.files.ignoreCorruptFiles`.
  * Pin both contracts: default = loud failure (silent data loss is
  * worse than a crash), flag on = the readable rows survive. */
class CorruptFileSpec extends SparkSpec {

  private def mixedDir(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("corrupt-mix").toString
    (1 to 100).map(i => (i.toLong, s"row$i")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // drop a truncated "parquet" file next to the good part
    Files.write(Paths.get(dir, "part-00099-corrupt.snappy.parquet"),
      Array[Byte]('P', 'A', 'R', '1', 0, 1, 2, 3))
    dir
  }

  test("default: corrupt part fails the read loudly") {
    val dir = mixedDir()
    val e = intercept[Exception] {
      spark.read.parquet(dir).count()
    }
    val msg = String.valueOf(e.getMessage) + String.valueOf(e.getCause)
    assert(msg.toLowerCase.contains("parquet") || msg.toLowerCase.contains("corrupt") ||
           msg.toLowerCase.contains("footer"), s"unexpected error: $msg")
  }

  test("ignoreCorruptFiles=true: readable rows survive, corrupt part skipped") {
    val dir = mixedDir()
    val old = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      assert(spark.read.parquet(dir).count() === 100L)
    } finally old.fold(spark.conf.unset("spark.sql.files.ignoreCorruptFiles"))(
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", _))
  }
}
