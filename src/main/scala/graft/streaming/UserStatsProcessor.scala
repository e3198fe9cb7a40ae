package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.streaming.EventStream.Event

/** Per-user rolling statistics via `transformWithState` — the modern
  * arbitrary-state API (Spark 4), successor to flatMapGroupsWithState
  * (EventStream.offsetTracker shows the classic form).
  *
  * State: one UserStats per user (count, exact cents sum, high-water
  * event id), updated per micro-batch, emitted in Update mode. The cents
  * discipline (Portable.scala) applies inside state too — a running
  * double sum would drift under replay/merge.
  *
  * Requires the RocksDB state store provider
  * (spark.sql.streaming.stateStore.providerClass).
  */
final case class UserStats(user_id: Long, n_events: Long, total_cents: Long, max_event_id: Long)

class UserStatsProcessor extends StatefulProcessor[Long, Event, UserStats] {

  @transient private var state: ValueState[UserStats] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[UserStats](
      "userStats", Encoders.product[UserStats], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[UserStats] = {
    val prev = if (state.exists()) state.get() else UserStats(key, 0L, 0L, -1L)
    var n  = prev.n_events
    var c  = prev.total_cents
    var mx = prev.max_event_id
    rows.foreach { e =>
      n += 1
      c += graft.functions.Portable.centsJvm(e.value)
      if (e.event_id > mx) mx = e.event_id
    }
    val next = UserStats(key, n, c, mx)
    state.update(next)
    Iterator.single(next)
  }
}

object UserStatsProcessor {
  /** Wire the processor over a typed event stream. */
  def apply(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
