package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of `el_ewma_forecast`: the α = 1/2 exponential
  * smoother as KEYED STREAMING STATE instead of a recursive CTE — the
  * same linear recurrence, carried forward one day at a time as the
  * stream drains, per series key (here: event_type — each type smooths
  * independently, so state scales with the key dimension, never the
  * event volume).
  *
  * The recurrence is a left fold over days, so streaming is its NATURAL
  * execution shape: the batch query recomputes the chain from the
  * anchor; the stream pays O(1) per new day per key. State is exactly
  * (last day index, level) — 16 bytes per series. Late or replayed days
  * (di ≤ last seen) are DROPPED, not folded: folding a day twice
  * corrupts the level silently, and the recurrence cannot be repaired
  * retroactively without replaying the chain — the watermark/dedup
  * stage upstream owns lateness (EventStream's lateness-audit pattern).
  *
  * Arithmetic is bit-identical to the batch twin: counts are integers,
  * (x + l) / 2 in doubles, same fold order (ascending day) —
  * StreamingEwmaSpec pins stream ≡ batch to the last bit.
  *
  * Seeding rule: the chain anchors ONLY at di = 1. A series whose first
  * arrival is a mid-chain day must not seed from it — the level would
  * diverge from the batch chain irreparably — so pre-anchor rows drop
  * until day 1 arrives (the upstream densified daily aggregate emits
  * days in order, making this a crash-replay corner, not the steady
  * state).
  */
final case class DayCount(series: String, di: Int, n: Long)
final case class EwmaPoint(series: String, di: Int, n: Long, ewma: Double)
private final case class EwmaState(di: Int, level: Double)

class EwmaProcessor extends StatefulProcessor[String, DayCount, EwmaPoint] {

  @transient private var state: ValueState[EwmaState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[EwmaState](
      "ewma", Encoders.product[EwmaState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[DayCount],
                               timerValues: TimerValues): Iterator[EwmaPoint] = {
    // fold in day order within the batch; the recurrence is order-defined
    val inOrder = rows.toSeq.sortBy(_.di)
    var cur = if (state.exists()) Some(state.get()) else None
    val out = Seq.newBuilder[EwmaPoint]
    inOrder.foreach { r =>
      cur match {
        case Some(st) if r.di <= st.di => () // late/replayed day: dropped
        case Some(st) =>
          val lvl = (r.n.toDouble + st.level) / 2
          cur = Some(EwmaState(r.di, lvl))
          out += EwmaPoint(key, r.di, r.n, lvl)
        case None if r.di == 1 => // the chain anchors ONLY at day 1: a
          // mid-chain first arrival must not seed the level (it would
          // silently diverge from the batch chain forever); such rows
          // drop until the anchor shows up
          cur = Some(EwmaState(r.di, r.n.toDouble))
          out += EwmaPoint(key, r.di, r.n, r.n.toDouble)
        case None => ()
      }
    }
    cur.foreach(state.update)
    out.result().iterator
  }
}

object EwmaStream {
  /** Wire the smoother over a (series, day-index, count) stream. */
  def apply(days: Dataset[DayCount]): Dataset[EwmaPoint] = {
    import days.sparkSession.implicits._
    days.groupByKey(_.series)
      .transformWithState(new EwmaProcessor, TimeMode.None(), OutputMode.Append())
  }
}
