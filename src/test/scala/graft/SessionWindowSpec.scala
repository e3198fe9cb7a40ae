package graft

import org.apache.spark.sql.functions._

/** Pins the session-gap boundary semantics on a crafted exact-gap
  * fixture. `session_window` merges a successor WITHIN gap of the latest
  * event INCLUSIVE — an event exactly gap later still merges — which is
  * the same strictly-greater split rule as el_sessionize's islands. This
  * spec exists because the first draft of the el_session_window oracle
  * split at equality and still hash-matched all three SFs: µs-resolution
  * data never hits the boundary, so only a crafted fixture can tell the
  * two rules apart. Both sessionizers must agree everywhere, including
  * at the boundary.
  */
class SessionWindowSpec extends SparkSpec {

  private val GapNs = 1800L * 1000000000L // 30 minutes in ns

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("sesswin").toString
    val t0 = 1700000000000000000L
    // user 1: three events — +0, +29:59 (inside gap), then exactly +30:00
    // after the second: ONE session under both rules (inclusive merge)
    val rows = Seq(
      (0L, t0, 1L),
      (1L, t0 + GapNs - 1000000000L, 1L),           // 29:59 after first
      (2L, t0 + 2L * GapNs - 1000000000L, 1L),      // exactly 30:00 after second
      // user 2: a lone event, then one far past any gap
      (3L, t0, 2L),
      (4L, t0 + 10L * GapNs, 2L))
    spark.createDataFrame(rows).toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("click"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .write.parquet(s"$dir/events.parquet") // ts as long nanos: the legacy read path
    dir
  }

  test("session_window merges at exactly gap, agreeing with the islands rule") {
    val native  = SparkEntry.queries("el_session_window")(spark, fixtureDir)
    val islands = SparkEntry.queries("el_sessionize")(spark, fixtureDir)
    val nativeU1  = native.filter(col("user_id") === 1).count()
    val islandsU1 = islands.filter(col("user_id") === 1).count()
    assert(nativeU1 === 1, s"session_window should merge at exactly gap, got $nativeU1 sessions")
    assert(islandsU1 === 1, s"islands (strict >) should merge at exactly gap, got $islandsU1 sessions")
    // both split a genuinely over-gap successor
    assert(native.filter(col("user_id") === 2).count() === 2)
    assert(islands.filter(col("user_id") === 2).count() === 2)
    // and the session COUNTS per user agree in full
    val a = native.select("user_id", "n_events")
    val b = islands.select("user_id", "n_events")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("session_window intervals carry end = last event + gap") {
    val u2 = SparkEntry.queries("el_session_window")(spark, fixtureDir)
      .filter(col("user_id") === 2).orderBy("start_us")
      .select(col("start_us"), col("end_us")).collect()
    assert(u2.length === 2)
    u2.foreach { r =>
      // single-event sessions: end - start == gap exactly
      assert(r.getLong(1) - r.getLong(0) === GapNs / 1000L)
    }
  }
}
