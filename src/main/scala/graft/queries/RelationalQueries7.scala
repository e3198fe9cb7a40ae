package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch 7: deterministic hash-sampling (the 100 TB survey path) and the
  * compaction view of the event log.
  */
object RelationalQueries7 {

  def defs: Map[String, Q] = Map(

    // Quantiles over a DETERMINISTIC 10% hash sample: h60(key) mod 10 = 0
    // selects the same rows in any engine (TABLESAMPLE/rand() would not
    // reproduce), then exact interpolated quantiles on the sample — the
    // scale substitute for exact global quantiles (t-digest style
    // sketches are engine-specific, hash samples are portable).
    "q44_sampled_quantile" -> Q(
      s"""WITH s AS (
         |  SELECT l_quantity FROM lineitem
         |  WHERE ${duckH("CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)", 15)} % 10 = 0)
         |SELECT COUNT(*) AS n_sampled,
         |       quantile_cont(l_quantity, 0.5) AS sample_median,
         |       quantile_cont(l_quantity, 0.9) AS sample_p90
         |FROM s""".stripMargin) { (s, d) =>
      // round 11: BOTH quantiles from ONE percentile buffer — the
      // two-aggregate form built and sorted two copies of the 10%
      // sample per task (guide §5: per-task state).
      Tables.lineitem(s, d)
        .filter(h60(concat(col("l_orderkey").cast("string"), lit("|"),
                           col("l_linenumber").cast("string"))) % 10 === 0)
        .agg(count(lit(1)).as("n_sampled"),
             expr("percentile(l_quantity, array(0.5D, 0.9D))").as("pq"))
        .select(col("n_sampled"),
                element_at(col("pq"), 1).as("sample_median"),
                element_at(col("pq"), 2).as("sample_p90"))
    },

    // Compaction view: latest event per user (the Kafka log-compaction
    // read; Topic.compact is the rewrite form over persisted offsets,
    // this is the query form over the raw log).
    "el_compact_latest" -> Q(
      """WITH ranked AS (
        |  SELECT user_id, event_id, event_type, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id AS latest_event_id, event_type, value
        |FROM ranked WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("latest_event_id"),
                col("event_type"), col("value"))
        .orderBy("user_id")
    }
  )
}
