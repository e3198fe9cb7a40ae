package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ExpiredTimerInfo, TTLConfig, ValueState, ListState}
import graft.streaming.EventStream.Event

/** Timer-driven session closing — the remaining arbitrary-state
  * primitives `transformWithState` offers that the engine did not yet
  * exercise: EVENT-TIME TIMERS (a session emits when the watermark
  * passes its gap deadline, not when the next event happens to arrive —
  * `EventStream.sessionCounts` closes sessions only via the windowing
  * operator; this closes them from user code) and LIST STATE (a bounded
  * sample of the session's event ids rides along for debugging/joining,
  * the pattern for "give me exemplars per session" without unbounded
  * state).
  *
  * Protocol per key: fold arriving events into the running session
  * accumulator; if an event lands more than [[SessionCloser.GapMs]]
  * after the current session's end, the old session is emitted
  * immediately (the stream analogue of the batch gap rule) and a fresh
  * one starts; otherwise the session extends. Every batch re-arms ONE
  * event-time timer at session_end + gap (previous timers deleted — the
  * listTimers/deleteTimer protocol), and when the WATERMARK crosses that
  * deadline with no extension, handleExpiredTimer emits the session and
  * clears all state. State per key is one small accumulator + a
  * ≤ [[SessionCloser.MaxSampleIds]] id list — bounded regardless of
  * session length.
  *
  * Out-of-order contract: each batch re-chains (open session ∪ batch
  * events) through one interval fold, so WITHIN everything the
  * processor still holds the grouping is exactly the batch
  * session_window's — stragglers lower the start, straggler chains
  * merge with each other and can bridge forward into the open session,
  * and gap splits close eagerly. The one divergence is an event
  * belonging to a session EMITTED in a previous batch: closed sessions
  * are not retracted (the same emit-on-close trade Kafka Streams makes
  * with zero grace) — it starts or joins a new session instead. Size
  * the watermark delay to the lateness you need exact.
  *
  * StreamingSessionCloserSpec proves the emitted sessions equal the
  * batch `session_window` aggregation (same 30-minute gap) on the same
  * events, including sessions closed by timer at stream end, and
  * covers the straggler branches.
  */
final case class SessionAcc(startUs: Long, endUs: Long, n: Long, cents: Long)
final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                               n_events: Long, cents: Long, sample_ids: Seq[Long])

class SessionCloser extends StatefulProcessor[Long, Event, ClosedSession] {

  @transient private var acc: ValueState[SessionAcc] = _
  @transient private var ids: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    acc = getHandle.getValueState[SessionAcc](
      "sessionAcc", Encoders.product[SessionAcc], TTLConfig.NONE)
    ids = getHandle.getListState[Long](
      "sampleIds", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def cents(v: Double): Long = graft.functions.Portable.centsJvm(v)

  /** Full-precision epoch micros: Timestamp.getTime is ms-truncated —
    * the sub-millisecond digits live in getNanos. */
  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000 * 1000000 + ts.getNanos / 1000

  private def emit(key: Long, a: SessionAcc): ClosedSession = {
    val sample = ids.get().toSeq
    acc.clear(); ids.clear()
    ClosedSession(key, a.startUs, a.endUs, a.n, a.cents, sample)
  }

  /** A session interval mid-fold: the open state and every new event
    * become items of this shape, chained by the gap rule. */
  private final case class Item(startUs: Long, endUs: Long, n: Long,
                                cents: Long, sampleIds: Seq[Long])

  override def handleInputRows(key: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[ClosedSession] = {
    val gapUs = SessionCloser.GapMs * 1000
    // ONE interval-chaining fold over (open session ∪ batch events),
    // ordered by start: this uniformly handles on-time extension, gap
    // splits, start-lowering stragglers, straggler chains that merge
    // with EACH OTHER, and chains that bridge forward into the open
    // session — the exact batch session_window grouping over everything
    // this processor still holds. (Only events belonging to sessions
    // emitted in PREVIOUS batches diverge — see the contract above.)
    val stateItem =
      if (acc.exists()) Seq({ val a = acc.get(); Item(a.startUs, a.endUs, a.n, a.cents, ids.get().toSeq) })
      else Seq.empty
    val eventItems = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      .map(e => Item(micros(e.ts), micros(e.ts), 1L, cents(e.value), Seq(e.event_id)))
    val items = (stateItem ++ eventItems).sortBy(i => (i.startUs, i.endUs))

    val out = Seq.newBuilder[ClosedSession]
    if (items.nonEmpty) {
      var cur = items.head
      items.tail.foreach { it =>
        if (it.startUs - cur.endUs <= gapUs)
          cur = Item(cur.startUs, math.max(cur.endUs, it.endUs), cur.n + it.n,
                     cur.cents + it.cents,
                     (cur.sampleIds ++ it.sampleIds).take(SessionCloser.MaxSampleIds))
        else {
          out += ClosedSession(key, cur.startUs, cur.endUs, cur.n, cur.cents, cur.sampleIds)
          cur = it
        }
      }
      // the final chained group stays open in state
      acc.update(SessionAcc(cur.startUs, cur.endUs, cur.n, cur.cents))
      ids.clear()
      cur.sampleIds.foreach(ids.appendValue)
    }
    // re-arm the gap deadline for the open session. The expiry rounds
    // the µs end UP to the next ms and adds one: the timer must fire
    // strictly AFTER end+gap, or a boundary event at exactly end+gap
    // (which the pinned session semantics MERGE) could find its session
    // already flushed.
    if (acc.exists()) {
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer((acc.get().endUs + 999) / 1000 + SessionCloser.GapMs + 1)
    }
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
    if (acc.exists()) Iterator.single(emit(key, acc.get()))
    else Iterator.empty
}

object SessionCloser {
  /** Session gap, matching the batch `session_window(ts, '30 minutes')`. */
  val GapMs: Long = 30L * 60 * 1000
  /** Bounded per-session exemplar ids carried in ListState. */
  val MaxSampleIds = 16

  /** Wire the closer over a typed event stream (input must carry a
    * watermark on `ts` for the event-time timers to fire). */
  def apply(events: Dataset[Event]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionCloser, TimeMode.EventTime(), OutputMode.Append())
  }
}
