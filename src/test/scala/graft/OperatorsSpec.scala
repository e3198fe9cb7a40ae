package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Multimodal
import graft.streaming.EventStream
import graft.functions.Portable

/** Multimodal plumbing, stream-static enrichment, and portable-hash
  * invariants. */
class OperatorsSpec extends SparkSpec {

  test("multimodal decode: one feature row per asset, exact byte accounting") {
    val docs     = Tables.documents(spark, sf)
    val features = Multimodal.decode(Multimodal.assetsFromDocuments(docs))
    val n        = docs.count()
    assert(features.count() === n)
    // histogram mass == byte length, for every asset
    val bad = features.filter(f => f.histogram.sum != f.byte_len).count()
    assert(bad === 0)
    // stats handoff keeps totals
    val stats = Multimodal.kindStats(features)
    assert(stats.agg(sum(col("n_assets"))).head().getLong(0) === n)
    val totalBytes = docs.agg(sum(length(encode(col("text"), "UTF-8")))).head().getLong(0)
    assert(stats.agg(sum(col("total_bytes"))).head().getLong(0) === totalBytes)
  }

  test("stream-static enrich joins the customer dim without losing events") {
    val dir = java.nio.file.Files.createTempDirectory("enrich").toString + "/t"
    Tables.events(spark, sf).limit(500).repartition(2).write.parquet(dir)
    val q = EventStream.enrich(EventStream.ingest(spark, dir, 1),
                               Tables.customer(spark, sf))
      .writeStream.format("memory").queryName("enriched").outputMode("append")
      .option("checkpointLocation",
              java.nio.file.Files.createTempDirectory("ckpt-enrich").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("enriched")
    assert(out.count() === 500) // left outer: no event dropped
    // every matched row carries the right customer name
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("k"), col("c_name").as("expected_name"))
    val mismatched = out.filter(col("c_name").isNotNull)
      .join(dim, col("user_id") === col("k"))
      .filter(col("c_name") =!= col("expected_name"))
    assert(mismatched.count() === 0)
  }

  test("portable hash columns equal JVM md5 derivation") {
    import spark.implicits._
    val words = Seq("spark", "join", "the", "a", "stream").toDF("w")
    val got = words.select(col("w"), Portable.h32(col("w")).as("h")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def jvm(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    got.foreach { case (w, h) => assert(h === jvm(w), w) }
  }

  test("dsum is partition-order independent") {
    val df  = Tables.lineitem(spark, sf).select(col("l_extendedprice").as("x"))
    val one = df.coalesce(1).agg(Portable.dsum(col("x"))).head().getDouble(0)
    val many = df.repartition(7).agg(Portable.dsum(col("x"))).head().getDouble(0)
    assert(one === many)
  }
}
