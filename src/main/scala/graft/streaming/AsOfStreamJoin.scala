package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** STREAM-STREAM as-of join — both sides unbounded. [[AsOfEnrichStream]]
  * covers the stream-static case (micro-batch re-plan against a snapshot
  * dimension); this operator is the other half, Flink's event-time
  * temporal join: a left stream of probes (trades, events) enriched with
  * the most recent right row (quote, dimension update) AT THE PROBE'S
  * EVENT TIME, both sides arriving out of order within a watermark bound.
  *
  * Why not the native [[graft.plans.AsOfJoinExec]] here: a per-batch
  * as-of join only sees rights that happen to share the micro-batch, and
  * Structured Streaming's stream-stream join conditions can't express
  * "greatest rt <= lt" (it needs an aggregate over the matched set, which
  * append-mode joins forbid). The correct primitive is keyed state:
  *
  *   - buffer left rows until the WATERMARK passes their event time —
  *     only then is the right history at-or-before that time complete
  *     (no row on either side may arrive below the watermark);
  *   - buffer right rows, retaining per key ONLY the latest row at-or-
  *     below the watermark plus everything above it — any future left
  *     has `lt` > watermark, so its backward match is either that latest
  *     row or something newer. This is the O(1)-per-quiet-key retention
  *     Flink's temporal join state uses; right history never grows with
  *     stream length, only with in-flight disorder.
  *
  * Arrival discipline is Spark's own: the stateful operator's late-event
  * filter drops input rows AT-OR-BELOW the watermark before they reach
  * this function (empirically `t <= wm`, pinned in the spec), so every
  * buffered row arrived strictly above the watermark and the emission
  * check (`t <= wm`) fires exactly once per left row, on the first
  * invocation after the watermark passes it.
  *
  * Emission therefore needs no reconciliation: a left row emits exactly
  * once, with exactly the match the batch operator would give it
  * (AsOfStreamJoinSpec proves stream ≡ [[graft.plans.AsOf.join]] on the
  * fixture, and pins the incremental emission/eviction schedule on a
  * crafted MemoryStream). Match contract is the native exec's backward
  * rule: greatest (rt, id) with rt <= lt, inclusive, unmatched → nulls.
  *
  * Left rows buffered per key are bounded by the watermark delay × key
  * arrival rate, the same budget every watermarked stateful op holds;
  * timeouts (EventTimeTimeout at the earliest pending left) flush keys
  * that go quiet. At 100 TB-scale this state shards by key across
  * executors like any `groupByKey` — there is no global structure.
  */
object AsOfStreamJoin {

  /** Unified input row: µs event time (`tus`) so match arithmetic is
    * exact; `t` carries the watermark tag (the event-time-timeout checker
    * requires the watermarked column to reach the stateful operator). */
  case class In(key: Long, isLeft: Boolean, t: java.sql.Timestamp,
                tus: Long, id: Long, value: Double)

  /** One output per left row, nulls when no right at-or-before it. */
  case class Out(key: Long, left_id: Long, left_tus: Long,
                 match_id: Option[Long], match_tus: Option[Long],
                 match_value: Option[Double])

  /** Keyed state: pending (unemittable) lefts + retained right history. */
  case class S(pending: List[(Long, Long)], rights: List[(Long, Long, Double)])

  /** One state transition, both directions.
    *
    * BACKWARD (`fwd = false`): a left at `lt` finalizes when `wm >= lt`
    * (its at-or-before history is sealed); match = greatest (rt, id) with
    * rt <= lt, optionally within `tolUs`; retention keeps the latest
    * right at-or-below the watermark plus everything above.
    *
    * FORWARD (`fwd = true`): the match window is [lt, lt + tol] — the
    * tolerance is MANDATORY for liveness (an unbounded forward as-of can
    * never finalize: the matching right may always still be coming). A
    * left finalizes when `wm >= lt + tol`; match = smallest (rt, id) in
    * the window; retention keeps rights with rt >= wm − tol (exactly the
    * interval-join state budget: bounded by tolerance × arrival rate,
    * independent of stream length).
    */
  private def step(fwd: Boolean, tolUs: Option[Long])(
      key: Long, rows: Iterator[In], state: GroupState[S]): Iterator[Out] = {
    val s0 = state.getOption.getOrElse(S(Nil, Nil))
    var pending = s0.pending
    var rights  = s0.rights
    rows.foreach { r =>
      if (r.isLeft) pending ::= ((r.tus, r.id))
      else rights  ::= ((r.tus, r.id, r.value))
    }
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val fwdTol = tolUs.getOrElse(0L) // validated present for forward in join()

    // sorted ascending by (rt, id): backward picks the LAST eligible
    // (largest tie-break), forward the FIRST in-window (smallest)
    val hist = rights.sortBy(r => (r._1, r._2))
    def deadline(lt: Long): Long = if (fwd) lt + fwdTol else lt
    val (ready, still) = pending.partition(p => deadline(p._1) <= wmUs)
    val out = ready.sorted.map { case (lt, lid) =>
      val m =
        if (fwd) hist.dropWhile(_._1 < lt).headOption.filter(_._1 <= lt + fwdTol)
        else hist.takeWhile(_._1 <= lt).lastOption
          .filter(r => tolUs.forall(t => lt - r._1 <= t))
      Out(key, lid, lt, m.map(_._2), m.map(_._1), m.map(_._3))
    }

    // retention: every unseen left has lt > wm and every pending one has
    // deadline(lt) > wm; backward needs the latest right at-or-below the
    // watermark plus everything above, forward everything with
    // rt >= wm − tol (older rights are below every future window)
    val kept =
      if (fwd) hist.dropWhile(_._1 < wmUs - fwdTol)
      else {
        val (below, above) = hist.partition(_._1 <= wmUs)
        below.lastOption.toList ++ above
      }

    if (still.isEmpty && kept.isEmpty) state.remove()
    else {
      state.update(S(still, kept))
      // flush lefts even if the key goes quiet: wake when the watermark
      // passes the earliest pending deadline (strictly above the current
      // watermark, which the `still` partition guarantees)
      if (still.nonEmpty)
        state.setTimeoutTimestamp(still.map(p => deadline(p._1)).min / 1000L + 1L)
    }
    out.iterator
  }

  /** Join `left` (cols `key, t, id`) to `right` (cols `key, t, id,
    * value`), both STREAMING DataFrames, with watermark `delay` on the
    * unified event time. Output: one row per left row once the watermark
    * seals its match window — (key, left_id, left_tus, match_id,
    * match_tus, match_value), nulls when none.
    *
    * BACKWARD (default): match = greatest (t, id) right row with
    * t <= left t, optionally within `tolerance` µs. FORWARD: match =
    * smallest (t, id) right row with left t <= t <= left t + tolerance;
    * `tolerance` is REQUIRED forward — without a bound the operator could
    * never finalize a left row (liveness), the same reason Spark requires
    * time bounds on stream-stream joins. */
  def join(left: DataFrame, right: DataFrame, delay: String,
           forward: Boolean = false, tolerance: Option[Long] = None): DataFrame = {
    require(!forward || tolerance.nonEmpty,
      "forward stream-stream as-of needs a tolerance: without an upper " +
        "bound on the match window no left row can ever finalize")
    require(tolerance.forall(_ >= 0), s"tolerance must be >= 0, got $tolerance")
    val spark: SparkSession = left.sparkSession
    import spark.implicits._
    val l = left.select(col("key").cast("long").as("key"),
      lit(true).as("isLeft"), col("t").cast("timestamp").as("t"),
      col("id").cast("long").as("id"), lit(0.0).as("value"))
    val r = right.select(col("key").cast("long").as("key"),
      lit(false).as("isLeft"), col("t").cast("timestamp").as("t"),
      col("id").cast("long").as("id"), col("value").cast("double").as("value"))
    l.unionByName(r)
      .withWatermark("t", delay)
      .select(col("key"), col("isLeft"), col("t"),
        unix_micros(col("t")).as("tus"), col("id"), col("value"))
      .as[In]
      .groupByKey(_.key)
      .flatMapGroupsWithState[S, Out](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step(forward, tolerance))
      .toDF()
  }
}
