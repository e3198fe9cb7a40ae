package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.streaming.DecontamStream
import org.apache.spark.sql.functions._

/** The streaming Bloom decontamination probe: stateless per-row
  * projection, so the STREAM result must equal the batch result row for
  * row, and both must agree with the declared ta_bloom_contamination
  * query on the corpus side. Benchmark documents probed against their
  * own filter are all flagged (every gram is in the filter by
  * construction — Bloom filters have no false negatives).
  */
class StreamingDecontamSpec extends SparkSpec {

  test("stream == batch, agrees with the declared query, no false negatives") {
    val (words, _) = graft.queries.PipelineQueries.trainedBloom(spark, sf)

    // batch probe over the corpus
    val batch = DecontamStream.probe(Tables.documents(spark, sf), words)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap

    // the same probe as a STREAM over a copy of the parquet file
    val streamDir = Files.createTempDirectory("decontam-stream")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
               streamDir.resolve("documents.parquet"),
               StandardCopyOption.REPLACE_EXISTING)
    val q = DecontamStream.stream(spark, sf, streamDir.toString)
      .writeStream.format("memory").queryName("decontam")
      .option("checkpointLocation",
              Files.createTempDirectory("decontam-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("decontam")
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      assert(streamed == batch, "stream result differs from batch probe")
    } finally q.stop()

    // agreement with the declared (shuffle-based) batch query on the
    // corpus docs it covers
    val declared = SparkEntry.queries("ta_bloom_contamination")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    for ((id, (ng, bh)) <- declared)
      assert(batch(id) == ((ng, bh)), s"doc $id: probe ${batch(id)} vs declared ($ng,$bh)")

    // no false negatives: every benchmark doc's grams are IN the filter
    val benchIds = batch.keySet.filter(_ % 50 == 0)
    assert(benchIds.nonEmpty)
    for (id <- benchIds) {
      val (ng, bh) = batch(id)
      assert(bh == ng, s"benchmark doc $id: $bh of $ng grams hit (false negative!)")
    }
  }
}
