package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `el_attribution_ushape` — position-based (U-shaped) multi-touch
  * attribution, the third standard model next to el_attribution's
  * first/last/linear: 40% of each conversion's credit to the FIRST
  * touch, 40% to the LAST, 20% split over the middles.
  *
  * Kept hash-exact by crediting in integer ppm with a stated remainder
  * rule: mid = 200000 div (n−2) per middle touch, and the flooring
  * remainder 200000 − (n−2)·mid goes to the FIRST touch — so every
  * conversion's credits sum to EXACTLY 1,000,000 (the invariant the
  * rollup exposes: Σ credit over all types = 10⁶ · conversions).
  * Degenerate paths follow the model's conventions: n=1 → 10⁶ to the
  * only touch; n=2 → 500,000 each (first and last halves of the U);
  * n=0 → 10⁶ on 'none' so untouched conversions stay visible.
  *
  * Scale shape: same lineage as el_attribution — the 7-day touch
  * window is a user-keyed equi-join with a range predicate, positions
  * come from per-conversion windows (bounded by a user's week of
  * touches), and the rollup map-side-combines to the type domain.
  */
object EventLogQueries5 {

  private val WeekUs = 604800000000L

  def defs: Map[String, Q] = Map(

    "el_attribution_ushape" -> Q(
      s"""WITH conv AS (
         |  SELECT event_id AS conv_id, user_id, epoch_ns(ts)//1000 AS cts
         |  FROM events WHERE event_type = 'purchase'),
         |t AS (
         |  SELECT user_id, event_id AS tid, event_type AS ttype,
         |         epoch_ns(ts)//1000 AS tts
         |  FROM events WHERE event_type IN ('click','view','signup')),
         |j AS (
         |  SELECT c.conv_id, t.ttype, t.tts, t.tid
         |  FROM conv c LEFT JOIN t
         |    ON c.user_id = t.user_id AND t.tts <= c.cts
         |   AND t.tts > c.cts - $WeekUs),
         |r AS (
         |  SELECT conv_id, coalesce(ttype, 'none') AS touch_type,
         |         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY tts DESC, tid DESC) AS rn_last,
         |         ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY tts ASC,  tid ASC)  AS rn_first,
         |         CAST(COUNT(ttype) OVER (PARTITION BY conv_id) AS BIGINT) AS n
         |  FROM j),
         |cr AS (
         |  SELECT touch_type,
         |         CASE WHEN n <= 1 THEN 1000000
         |              WHEN n = 2 THEN 500000
         |              WHEN rn_first = 1
         |                THEN 400000 + (200000 - (n-2) * (200000 // (n-2)))
         |              WHEN rn_last = 1 THEN 400000
         |              ELSE 200000 // (n-2) END AS credit
         |  FROM r)
         |SELECT touch_type,
         |       CAST(SUM(credit) AS BIGINT) AS credit_ppm,
         |       CAST(COUNT(*) AS INTEGER) AS n_touches
         |FROM cr GROUP BY touch_type ORDER BY touch_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("conv_id"), col("user_id").as("cu"),
                unix_micros(col("ts")).as("cts"))
      val touch = ev.filter(col("event_type").isin("click", "view", "signup"))
        .select(col("user_id").as("tu"), col("event_id").as("tid"),
                col("event_type").as("ttype"), unix_micros(col("ts")).as("tts"))
      val wLast  = Window.partitionBy("conv_id").orderBy(col("tts").desc, col("tid").desc)
      val wFirst = Window.partitionBy("conv_id").orderBy(col("tts").asc,  col("tid").asc)
      val wN     = Window.partitionBy("conv_id")
      conv.join(touch,
          col("cu") === col("tu") && col("tts") <= col("cts") &&
          col("tts") > col("cts") - lit(WeekUs), "left")
        .select(col("conv_id"), coalesce(col("ttype"), lit("none")).as("touch_type"),
                col("tts"), col("tid"), col("ttype"))
        .withColumn("rn_last",  row_number().over(wLast))
        .withColumn("rn_first", row_number().over(wFirst))
        .withColumn("n", count(col("ttype")).over(wN).cast("long"))
        .select(col("touch_type"),
          when(col("n") <= 1, lit(1000000L))
            .when(col("n") === 2, lit(500000L))
            .when(col("rn_first") === 1,
              lit(400000L) + (lit(200000L) -
                (col("n") - 2) * expr("200000L div (n - 2)")))
            .when(col("rn_last") === 1, lit(400000L))
            .otherwise(expr("200000L div (n - 2)")).as("credit"))
        .groupBy("touch_type")
        .agg(sum(col("credit")).cast("long").as("credit_ppm"),
             count(lit(1)).cast("int").as("n_touches"))
        .orderBy("touch_type")
    })
}
