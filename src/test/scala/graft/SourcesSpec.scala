package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.FileFormats
import graft.streaming.EventStream

/** File-format round-trips and the SparkSessionExtensions injection. */
class SourcesSpec extends SparkSpec {

  private def events = Tables.events(spark, sf).limit(300)

  test("jsonl round-trip preserves the event rows") {
    val dir = Files.createTempDirectory("jsonl").toString + "/d"
    FileFormats.writeJsonl(events, dir)
    val back = FileFormats.readJsonl(spark, dir, EventStream.topicSchema)
    assert(back.count() === 300)
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
  }

  test("csv round-trip preserves the event rows (µs timestamps)") {
    val dir = Files.createTempDirectory("csv").toString + "/d"
    FileFormats.writeCsv(events, dir)
    val back = FileFormats.readCsv(spark, dir, EventStream.topicSchema)
    assert(back.count() === 300)
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
  }

  test("orc round-trip preserves the event rows and pushes filters") {
    val dir = Files.createTempDirectory("orc").toString + "/d"
    FileFormats.writeOrc(events, dir)
    val back = FileFormats.readOrc(spark, dir)
    assert(back.count() === 300)
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
    // ORC scans push predicates like parquet does
    val plan = back.filter(col("event_id") === 7L).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("event_id"), plan)
  }

  test("GraftExtensions injects graft_dot for SQL on a fresh session") {
    // force a NEW session over the shared context (getOrCreate would
    // hand back the active session, which has no extensions bound)
    val old = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      val v = s2.sql(
        """SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                 array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d""".stripMargin)
        .head().getDouble(0)
      assert(v === 9.0)
      val wm = s2.sql("SELECT graft_window_min(array(3L, 1L, 2L, 5L, 4L), 3) AS m")
        .head().getSeq[Long](0)
      assert(wm == Seq(1L, 1L, 2L))
    } finally {
      old.foreach { o =>
        SparkSession.setDefaultSession(o)
        SparkSession.setActiveSession(o)
      }
    }
  }

  test("binaryFile source ingests opaque media payloads with metadata") {
    // the ingestion path for real image/audio corpora: files land as
    // (path, modificationTime, length, content) rows; pathGlobFilter
    // selects a modality without listing-side surprises
    val dir = Files.createTempDirectory("binsrc")
    val payloads = (0 until 6).map { i =>
      val ext = if (i % 2 == 0) "jpg" else "wav"
      val bytes = Array.tabulate[Byte](64 + i * 17)(j => ((i * 31 + j) % 251).toByte)
      java.nio.file.Files.write(dir.resolve(s"m$i.$ext"), bytes)
      (s"m$i.$ext", bytes)
    }.toMap
    val all = spark.read.format("binaryFile").load(dir.toString)
      .select(element_at(split(col("path"), "/"), -1).as("name"),
              col("length"), col("content"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getAs[Array[Byte]](2))).toMap
    assert(all.keySet === payloads.keySet)
    payloads.foreach { case (n, bytes) =>
      assert(all(n)._1 === bytes.length.toLong, s"$n length")
      assert(all(n)._2.toSeq === bytes.toSeq, s"$n content round-trip")
    }
    // modality selection via pathGlobFilter prunes at the listing
    val jpgs = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.jpg").load(dir.toString)
    assert(jpgs.count() === 3L)
    // and the decode-metadata shape from MultimodalQueries applies as-is
    val meta = jpgs.select(md5(col("content")).as("h"), (col("length") % 640 + 1).as("w"))
    assert(meta.collect().length === 3)
  }
}
