package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, MapState}
import graft.streaming.EventStream.Event

/** Per-user per-event-type rolling counts via MAP STATE — completing the
  * `transformWithState` state-family coverage (ValueState:
  * UserStatsProcessor; ListState + timers: SessionCloser). MapState is
  * the right primitive when the per-key sub-keyspace is dynamic but
  * bounded (event types here): updates touch ONLY the sub-key's entry —
  * a ValueState holding a whole map would rewrite the full map per
  * event, and the state store could not evict sub-entries
  * independently. Emits the updated (user, type, count) rows per batch
  * in Update mode; TypeCountsSpec pins the final state to the batch
  * groupBy(user, type) counts across micro-batches.
  */
final case class TypeCount(user_id: Long, event_type: String, n: Long)

class TypeCountsProcessor extends StatefulProcessor[Long, Event, TypeCount] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long](
      "typeCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[TypeCount] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { e =>
      val cur = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
      counts.updateValue(e.event_type, cur + 1L)
      touched += e.event_type
    }
    touched.iterator.map(t => TypeCount(key, t, counts.getValue(t)))
  }
}

object TypeCountsProcessor {
  def apply(events: Dataset[Event]): Dataset[TypeCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor, TimeMode.None(), OutputMode.Update())
  }
}
