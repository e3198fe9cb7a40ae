package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** A SparkSession serves many queries at once in production; this spec
  * drives a mixed batch of declared queries CONCURRENTLY on the shared
  * session — including every trained-artifact family (IVF centroids, PQ
  * codebook, quantizer stats, Bloom words, LSH candidates) with caches
  * freshly invalidated so trainings actually race — and asserts every
  * result is identical to its serial run. The per-key `computeIfAbsent`
  * in the artifact caches is what makes same-artifact training safe;
  * this is the test that would catch a regression to racy get/put (double
  * training is only wasted work, but a torn parquet artifact write is a
  * wrong ANSWER on the next read).
  */
class ConcurrencySpec extends SparkSpec {

  private val names = Seq(
    "q03_join_topk_revenue",   // join + top-k
    "el_sessionize",           // window islands
    "ta_tfidf",                // explode + agg
    "ss_ivf_ann",              // centroid artifact
    "ss_pq_ann",               // PQ codebook artifact
    "ss_quantize_int8",        // quantizer stats artifact
    "ta_bloom_contamination",  // Bloom words artifact
    "dd_containment")          // LSH candidate artifact

  test("concurrent declared queries on one session match their serial results") {
    implicit val ec: ExecutionContext = ExecutionContext.global
    ArtifactStore.invalidate(spark, sf)
    val serial = names.map(n => n -> SparkEntry.queries(n)(spark, sf).collect().toSeq).toMap

    ArtifactStore.invalidate(spark, sf) // force the trainings to race
    val conc = Await.result(
      Future.sequence(names.map(n =>
        Future(n -> SparkEntry.queries(n)(spark, sf).collect().toSeq))),
      10.minutes).toMap

    names.foreach { n =>
      assert(conc(n) == serial(n), s"$n diverged under concurrent execution")
    }
  }

  // The round-6 shared-frame caches (rank chain, co-supply pairs, gram
  // table + span frame, BPE tokenizer, minhash estimate pairs, simhash
  // signatures): each pair of consumers below shares one corpus-keyed
  // computeIfAbsent entry, so racing BOTH consumers right after an
  // invalidate exercises simultaneous first-build on every cache.
  private val sharedFrameConsumers = Seq(
    "q50_graph_rank", "q50_rank_convergence", // rank-chain cache
    "q56_cooccur_topk", "q57_triangle_census", // co-supply pair cache
    "dd_dup_spans", "dd_span_scrub",           // gram + span caches
    "ta_bpe_merges", "ta_bpe_encode",          // BPE tokenizer cache
    "dd_minhash_pairs", "dd_est_calibration",  // estimate-pair cache
    "dd_simhash_pairs",                        // signature cache
    "el_ewma_forecast", "el_forecast_eval",    // smoothed-chain cache
    "el_holt_forecast")                        // Holt chain (shares the dense view)

  test("racing consumers of one shared cached frame stay serial-identical") {
    implicit val ec: ExecutionContext = ExecutionContext.global
    ArtifactStore.invalidate(spark, sf)
    val serial = sharedFrameConsumers
      .map(n => n -> SparkEntry.queries(n)(spark, sf).collect().toSeq).toMap

    ArtifactStore.invalidate(spark, sf) // both consumers must rebuild
    val conc = Await.result(
      Future.sequence(sharedFrameConsumers.map(n =>
        Future(n -> SparkEntry.queries(n)(spark, sf).collect().toSeq))),
      10.minutes).toMap

    sharedFrameConsumers.foreach { n =>
      assert(conc(n) == serial(n), s"$n diverged under concurrent execution")
    }
  }
}
