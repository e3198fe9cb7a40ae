package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Tables.events casts TIMESTAMP_NTZ → TimestampType, a session-
      // timezone-dependent conversion: pin UTC like Verify/SparkSpec so
      // a non-UTC host benches the same plans it verifies
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session so the first timed query doesn't absorb startup
    // cost: one shuffle job for executor threads + one REAL plan (scan →
    // join → agg) for the parquet reader and codegen caches
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // train-once artifacts (IVF centroids, PQ codebook, LSH candidates,
    // Bloom, cluster labels) are built HERE, timed separately: on a
    // fresh corpus they'd otherwise land inside whichever query benches
    // first (dd_containment: 0.78 s warm vs 7.6 s artifact-cold at sf1)
    // and a cleared artifact dir would read as a query-perf regression
    val ta0 = System.nanoTime()
    val artifactsOk =
      try { graft.queries.Warm.all(spark, sfDir); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] artifact warm FAILED: ${e.getMessage}"); false }
    val artifactSec = (System.nanoTime() - ta0) / 1e9
    // Two timed passes per query; a query's time is the MIN of the two
    // (steady state). Pass 1 on a fresh JVM pays Catalyst analysis, code
    // generation, and JIT compilation — one-time-per-plan costs that
    // amortize to nothing over a real workload (and a 100 TB run), but
    // at sf0.1 they are the SAME magnitude as the queries themselves:
    // measured across two fresh-JVM runs of this bench, individual
    // queries swung 0.65 s ↔ 3.0 s while the sum of per-query minima
    // agreed to ~3%. Same philosophy as the artifact_build split above —
    // compile cost is not query cost — and both totals are printed so
    // nothing is hidden: "value" is the steady-state sum, "cold_value"
    // is the pass-1 sum on this JVM.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    // The timing action is a NOOP-SINK WRITE, not count() (changed round
    // 10): under count() Catalyst eliminates row-preserving joins whose
    // only contribution is columns nobody aggregates — ss_semdedup's
    // pair join (2.5e9 cosine evaluations at sf10) benched at ~1 s
    // because the left-outer join against its distinct drops side never
    // ran (SCALING.md round 9). The noop sink executes the SAME plan
    // Verify's write path pays — every column materialized, no
    // action-dependent plan surgery — without parquet encode/IO noise.
    // tools/ActionAudit lists which declared queries the count() action
    // was under-measuring and by how many plan nodes.
    def pass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // escape hatch for time-budgeted harnesses: SPARK_GRAFT_BENCH_PASSES=1
    // restores single-pass timing (value == cold_value)
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val pass1 = pass()
    val results =
      if (nPasses <= 1) pass1
      else {
        val pass2 = pass()
        pass1.map { case (k, v) => k -> math.min(v, pass2(k)) }
      }
    // millisecond precision: run-to-run noise is ±15%, and full-double
    // repr made the round-1 JSON line long enough that the driver's
    // output capture truncated it to 64 of 80 query entries
    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    // failed queries carry no timing (an abort time is not a query time)
    val timed = results.filterNot { case (k, _) => failed.contains(k) }
    val qs = timed.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val fj = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (timed.nonEmpty) timed.values.sum else 0.0
    val cold = pass1.filterNot { case (k, _) => failed.contains(k) }.values.sum
    // artifact training on its own metric line — NOT part of "total"
    println(s"""{"metric":"artifact_build","value":${r3(artifactSec)},"unit":"sec","ok":$artifactsOk,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$fj,"sf":"$sfDir"}""")
    // Cascade-path throughput: the reference's entire workload is
    // publish + point-read over a topic log (BASELINE.md — 10 events,
    // synchronous, two mutexes, 3 seeks per read; no published numbers).
    // Measure the same path here at corpus scale so the round artifacts
    // carry absolute events/s for the write path, the batched read, and
    // the point-read latency the reference serializes on. Failures never
    // abort the query bench (its own metric line reports ok=false).
    // SPARK_GRAFT_BENCH_THROUGHPUT=0 skips the stage.
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_THROUGHPUT", "1") == "1") {
      val dir = java.nio.file.Files.createTempDirectory("graft-bench-topic").toString
      try {
        val ev = Tables.events(spark, sfDir).localCheckpoint(true)
        val nEv = ev.count()
        val tp0 = System.nanoTime()
        Topic.publish(ev, s"$dir/t", knownHighWaterMark = Some(-1L))
        val pubSec = (System.nanoTime() - tp0) / 1e9
        val tc0 = System.nanoTime()
        val nRead = Topic.consume(spark, s"$dir/t", 0L, nEv.toInt).count()
        val conSec = (System.nanoTime() - tc0) / 1e9
        val nPoint = 50
        val tr0 = System.nanoTime()
        var i = 0
        while (i < nPoint) { Topic.consume(spark, s"$dir/t", (i * 997L) % nEv, 1).count(); i += 1 }
        val pointMs = (System.nanoTime() - tr0) / 1e6 / nPoint
        // same reads through a RESIDENT reader (relation resolved once):
        // the serving-layer pattern for repeated point lookups
        val reader = Topic.openReader(spark, s"$dir/t")
        val tv0 = System.nanoTime()
        i = 0
        while (i < nPoint) { Topic.consumeVia(reader, (i * 997L) % nEv, 1).count(); i += 1 }
        val residentMs = (System.nanoTime() - tv0) / 1e6 / nPoint
        println(s"""{"metric":"cascade_throughput","publish_events_per_sec":${r3(nEv / pubSec)},"batch_read_events_per_sec":${r3(nRead / conSec)},"point_read_ms":${r3(pointMs)},"resident_point_read_ms":${r3(residentMs)},"n_events":$nEv,"ok":true,"sf":"$sfDir"}""")
      } catch { case e: Throwable =>
        // String.valueOf: a null message must not NPE inside the guard;
        // strip control chars so the metric line stays one-line JSON
        val msg = String.valueOf(e.getMessage).take(120)
          .map(c => if (c < ' ' || c == '"' || c == '\\') ' ' else c)
        println(s"""{"metric":"cascade_throughput","ok":false,"err":"$msg"}""")
      } finally {
        scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
      }
    }
    // One short, independently parseable line PER QUERY (round 11): the
    // combined "queries" map above rides one very long line that the
    // driver's tail capture truncates (PERF_r10 per_query={},
    // prev/now_bench_ok=false in both rounds). Short lines near the end
    // of output survive any tail window. Additions-only: the combined
    // map line above and the final total line below are unchanged.
    timed.foreach { case (k, v) =>
      println(s"""{"metric":"query","name":"$k","sec":${r3(v)},"cold_sec":${r3(pass1(k))}}""")
    }
    // The per-query line above grew past the driver's tail-capture window
    // (BENCH_r01..r03 all parsed as null). The LAST line printed must be a
    // complete, short JSON record so any tail capture can parse the result.
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${timed.size},"passes":$nPasses,"cold_value":${r3(cold)},"failed":$fj,"sf":"$sfDir"}""")
    spark.stop()
    // a bench with failures must not read as a clean round (round-4 r04
    // recorded rc=0 with 43 failed queries)
    if (failed.nonEmpty) sys.exit(1)
  }
}
