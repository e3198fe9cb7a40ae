package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Native session-window aggregation over the event log.
  *
  * `el_sessionize` proves the gaps-and-islands formulation (lag + running
  * sum); this is the SPARK-NATIVE twin: `functions.session_window`, the
  * same merge-on-overlap operator Structured Streaming uses for stateful
  * session aggregation (streaming/EventStream.scala's session pane), run
  * in batch. One shuffle on the grouping key, sessions merged inside the
  * partition — at 100 TB this is strictly one exchange by user_id and no
  * window sort over the full log, which is why the native operator is
  * preferred over the islands form when per-session (not per-event)
  * output is all that's needed.
  *
  * Semantics note the oracle mirrors exactly: session_window treats an
  * event at t as the interval [t, t+gap) and merges OVERLAPPING
  * intervals, so a successor exactly gap after its predecessor starts a
  * NEW session (strict <), while the lag-based el_sessionize splits only
  * on gap STRICTLY GREATER — the island twin here uses `>=` to match.
  * Session end is last-event + gap by definition of the merged interval.
  */
object EventLogQueries3 {

  private val GapUs = 1800000000L // 30 minutes

  def defs: Map[String, Q] = Map(

    "el_session_window" -> Q(
      s"""WITH e AS (
         |  SELECT user_id, epoch_ns(ts) // 1000 AS tus FROM events),
         |g AS (
         |  SELECT user_id, tus,
         |         CASE WHEN LAG(tus) OVER w IS NULL OR tus - LAG(tus) OVER w >= $GapUs
         |              THEN 1 ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
         |s AS (
         |  SELECT user_id, tus,
         |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus
         |                           ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM g)
         |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |       MIN(tus) AS start_us,
         |       MAX(tus) + $GapUs AS end_us,
         |       MAX(tus) + $GapUs - MIN(tus) AS dur_us
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, start_us""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("n_events"),
                unix_micros(col("session_window.start")).as("start_us"),
                unix_micros(col("session_window.end")).as("end_us"),
                (unix_micros(col("session_window.end"))
                  - unix_micros(col("session_window.start"))).as("dur_us"))
        .orderBy("user_id", "start_us")
    }
  )
}
