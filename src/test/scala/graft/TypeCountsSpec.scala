package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{EventStream, TypeCountsProcessor}

/** MapState counts ≡ batch groupBy(user, type), across micro-batches. */
class TypeCountsSpec extends SparkSpec {

  test("TypeCountsProcessor final per-(user, type) counts match the batch aggregate") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      val evs = Tables.events(spark, sf).limit(500)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .as[EventStream.Event].collect()
      val (a, b) = evs.splitAt(evs.length / 2)

      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[EventStream.Event]
      val q = TypeCountsProcessor(mem.toDS()).toDF()
        .writeStream.format("memory").queryName("type_counts")
        .outputMode("update")
        .option("checkpointLocation", Files.createTempDirectory("tc-ckpt").toString)
        .start()
      mem.addData(a.toSeq: _*); q.processAllAvailable()
      mem.addData(b.toSeq: _*); q.processAllAvailable()
      q.stop()

      // last update per (user, type) is the committed count
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type").orderBy(col("n").desc)
      val got = spark.table("type_counts")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "event_type", "n").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

      val want = evs.groupBy(e => (e.user_id, e.event_type))
        .view.mapValues(_.length.toLong).toMap
      assert(got === want)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
