package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof twins of the remaining bounded-lookback per-key windows
  * (round 10, extending el_gap_histogram_skewsafe's two-level pattern).
  *
  * Per-key windows are the one shape with NO planner mitigation: AQE's
  * skew split never touches window exchanges, and salting breaks frame
  * semantics. The round-10 SkewAudit measured the exposure at sf10
  * under the hot-key fixtures (one key holding 50% of rows):
  * q54_range_frame 2.8 → 51 s, q88_rolling_median 4.3 → 70 s — while
  * el_resample_ffill stayed flat (3-4 s both arms: its window runs over
  * the 21-day GRID, bounded per user at any event count, so it needs no
  * twin). Both twins here are EXACT — declared beside the naive forms
  * with the identical oracle SQL — and both follow the same recipe:
  *
  *   1. bucket the ORDER-BY axis at (or above) the lookback width, so a
  *      row's frame spans at most its own and the previous bucket;
  *   2. the own-bucket part is the same window, partitioned by
  *      (key, bucket) — a hot key spreads over #buckets tasks;
  *   3. the cross-boundary part flows through BOUNDED per-bucket
  *      summaries (a probe-union running sum for q54's RANGE frame, a
  *      ≤k-row tail array for q88's ROWS frame), never through a
  *      whole-key partition.
  *
  * Robustness constant on an unskewed corpus: ~1.5-2.5× the naive form
  * (extra scan + the summary machinery) — the price of never funneling
  * a hot key through one task. Measured arms in SCALING.md round 10.
  */
object SkewSafeQueries {

  def defs: Map[String, Q] = Map(

    // q54's rolling 1-hour RANGE frame, two-level. Bucket = 1 h (the
    // frame width), so frame(row) = [es-3600, es] intersects exactly
    // buckets b-1 and b.
    //   own bucket  — the SAME range window inside (user, bucket): the
    //     partition floor bW > es-3600, so partition clipping IS the
    //     frame ∩ bucket-b intersection;
    //   prev bucket — a probe union: each event emits a probe at
    //     (user, b-1, t = es-3600); one descending running count/sum
    //     over each (user, bucket) partition reads, at every probe row,
    //     the count/sum of that bucket's data rows with es' >= es-3600
    //     (data sorts before probes at tied t, matching the frame's
    //     closed lower bound). Probes then join back by event id.
    "q54_range_frame_skewsafe" -> Q(
      RelationalQueries9.defs("q54_range_frame").oracle.get) { (s, d) =>
      import graft.functions.Portable.cents
      val W = 3600L
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
                expr("unix_micros(ts) div 1000000").as("es"),
                cents(col("value")).as("c"))
        .withColumn("b", expr(s"es div ${W}L"))
      // own-bucket contribution: identical frame, (user, bucket) keyed
      val wIn = Window.partitionBy("user_id", "b").orderBy("es")
        .rangeBetween(-W, Window.currentRow)
      val within = ev.select(col("user_id"), col("event_id"), col("es"),
        count(lit(1)).over(wIn).as("n_in"),
        sum(col("c")).over(wIn).as("s_in"))
      // prev-bucket contribution via probe union: kind 0 = data row in
      // its own bucket, kind 1 = probe pinned to the PREVIOUS bucket at
      // the frame's lower bound
      val data = ev.select(col("user_id"), col("b").as("pb"),
        col("es").as("t"), lit(0).as("kind"), col("c"), lit(null).cast("long").as("pid"))
      val probes = ev.select(col("user_id"), (col("b") - 1).as("pb"),
        (col("es") - W).as("t"), lit(1).as("kind"),
        lit(0L).as("c"), col("event_id").as("pid"))
      val wP = Window.partitionBy("user_id", "pb")
        .orderBy(col("t").desc, col("kind").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = data.unionAll(probes)
        .select(col("pid"),
          col("kind"),
          sum(when(col("kind") === 0, 1L).otherwise(0L)).over(wP).as("n_prev"),
          sum(when(col("kind") === 0, col("c")).otherwise(0L)).over(wP).as("s_prev"))
        .filter(col("kind") === 1)
        .select(col("pid"), col("n_prev"), col("s_prev"))
      within.join(prev, within("event_id") === prev("pid"))
        .select(col("user_id"), col("event_id"), col("es"),
          (col("n_in") + col("n_prev")).as("n_1h"),
          ((col("s_in") + col("s_prev")).cast("double") / lit(100.0)).as("sum_1h"))
        .orderBy("user_id", "event_id")
    },

    // q88's exact rolling median over ROWS 4 PRECEDING, two-level.
    // Bucket = order month; the 5-row frame reaches past the bucket
    // boundary only through the last ≤4 rows of EARLIER buckets, so:
    //   own bucket  — the same collect_list window inside (cust, month)
    //     plus the row's within-bucket rank;
    //   prev tail   — per-(cust, month) summary of its last ≤4 prices
    //     (in order), then one window over the per-customer MONTH
    //     timeline (bounded by the date range at any order count)
    //     concatenates preceding tails; the row takes the final
    //     (5 - rank) of them when its own bucket is short.
    // The merged value set per row is identical to the naive frame, so
    // the sorted-array median is bit-identical.
    "q88_rolling_median_skewsafe" -> Q(
      RelationalQueries17.defs("q88_rolling_median").oracle.get) { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
                col("o_totalprice"))
        .withColumn("b", expr("year(o_orderdate) * 12 + month(o_orderdate)"))
      val wIn = Window.partitionBy("o_custkey", "b")
        .orderBy("o_orderdate", "o_orderkey")
      val rows = o
        .withColumn("rn", row_number().over(wIn))
        .withColumn("ls_in",
          collect_list(col("o_totalprice")).over(wIn.rowsBetween(-4, 0)))
      // per-(cust, month) tail: that bucket's last ≤4 prices, in order
      val wDesc = Window.partitionBy("o_custkey", "b")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val tails = o
        .withColumn("rd", row_number().over(wDesc))
        .filter(col("rd") <= 4)
        .groupBy("o_custkey", "b")
        .agg(array_sort(collect_list(
          struct(col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))))
          .as("tl"))
        .select(col("o_custkey"), col("b"),
          expr("transform(tl, x -> x.o_totalprice)").as("tail"))
      // preceding buckets' tails, concatenated chronologically on the
      // month timeline (≤ #months rows per customer)
      val wB = Window.partitionBy("o_custkey").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
      val prev = tails
        .withColumn("prev_all", flatten(collect_list(col("tail")).over(wB)))
        .select(col("o_custkey").as("pc"), col("b").as("pbk"), col("prev_all"))
      rows.join(prev, rows("o_custkey") === prev("pc") && rows("b") === prev("pbk"))
        .withColumn("ls", expr(
          """CASE WHEN rn >= 5 THEN ls_in
             |     ELSE concat(
             |       slice(prev_all,
             |             greatest(size(prev_all) - (5 - rn) + 1, 1),
             |             CASE WHEN size(prev_all) < 5 - rn
             |                  THEN size(prev_all) ELSE 5 - rn END),
             |       ls_in)
             |END""".stripMargin))
        .select(col("o_orderkey"), col("o_custkey"),
          sort_array(col("ls")).as("ls"))
        .select(col("o_orderkey"), col("o_custkey"),
          expr("""CASE WHEN size(ls) % 2 = 1
                       THEN element_at(ls, CAST((size(ls) + 1) DIV 2 AS INT))
                       ELSE (element_at(ls, CAST(size(ls) DIV 2 AS INT)) +
                             element_at(ls, CAST(size(ls) DIV 2 + 1 AS INT)))
                              / CAST(2 AS DOUBLE) END""").as("roll_median"),
          size(col("ls")).cast("int").as("n_window"))
        .orderBy("o_orderkey")
    }
  )
}
