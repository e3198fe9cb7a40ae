package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface, batch 3: window-function variants,
  * extended string/date suites, map functions, bitwise ops, and TF-IDF
  * (the last §2.B scalar-function families).
  */
object RelationalQueries3 {

  def defs: Map[String, Q] = Map(

    // Ranking-family window functions beyond row_number: ntile,
    // percent_rank, cume_dist, first/last/nth value over a full frame.
    "q30_window_variants" -> Q(
      """SELECT o_custkey, o_orderkey,
        |       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cdist,
        |       first_value(o_orderkey) OVER wf AS cheapest,
        |       last_value(o_orderkey) OVER wf AS priciest,
        |       nth_value(o_orderkey, 2) OVER wf AS second_cheapest
        |FROM orders
        |WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
        |       wf AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w  = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"),
        first(col("o_orderkey")).over(wf).as("cheapest"),
        last(col("o_orderkey")).over(wf).as("priciest"),
        nth_value(col("o_orderkey"), 2).over(wf).as("second_cheapest"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Extended string suite: pad/trim/translate/repeat/split_part/
    // position/prefix tests.
    "q31_string_suite2" -> Q(
      """SELECT p_partkey,
        |       lpad(p_brand, 12, '*') AS brand_pad,
        |       rpad(p_type, 10, '.') AS type_pad,
        |       trim('  ' || p_name || ' ') AS name_trim,
        |       translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
        |       repeat(left(p_brand, 2), 2) AS brand_echo,
        |       split_part(p_name, ' ', 2) AS name_word2,
        |       CAST(strpos(p_name, 'o') AS INTEGER) AS first_o,
        |       starts_with(p_type, 'PRO') AS is_promo,
        |       reverse(p_brand) AS brand_rev
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        rpad(col("p_type"), 10, ".").as("type_pad"),
        trim(concat(lit("  "), col("p_name"), lit(" "))).as("name_trim"),
        translate(col("p_name"), "aeiou", "AEIOU").as("name_vowels"),
        repeat(substring(col("p_brand"), 1, 2), 2).as("brand_echo"),
        expr("split_part(p_name, ' ', 2)").as("name_word2"),
        instr(col("p_name"), "o").cast("int").as("first_o"),
        col("p_type").startsWith("PRO").as("is_promo"),
        reverse(col("p_brand")).as("brand_rev"))
        .orderBy("p_partkey")
    },

    // Extended date suite: interval arithmetic, day diffs, month ends,
    // day-of-week (DuckDB is 0-based Sunday, Spark 1-based — aligned).
    "q32_date_suite2" -> Q(
      """SELECT o_orderkey,
        |       o_orderdate + INTERVAL 30 DAY AS due_date,
        |       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since_epoch_start,
        |       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
        |       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |       CAST(EXTRACT(doy FROM o_orderdate) AS INTEGER) AS doy
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("int")
          .as("days_since_epoch_start"),
        last_day(col("o_orderdate")).cast("timestamp").as("month_end"),
        dayofweek(col("o_orderdate")).cast("int").as("dow"),
        dayofyear(col("o_orderdate")).cast("int").as("doy"))
        .orderBy("o_orderkey")
    },

    // Map construction + lookup (map_from_arrays / element_at; DuckDB map
    // subscript yields a single-element list, hence [1]).
    "q33_map_funcs" -> Q(
      """SELECT doc_id,
        |       map(['lang','source'], [lang, source])['lang'][1] AS m_lang,
        |       map(['lang','source'], [lang, source])['source'][1] AS m_source,
        |       CAST(cardinality(map(['lang','source'], [lang, source])) AS INTEGER) AS m_size
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val m = map_from_arrays(array(lit("lang"), lit("source")),
                              array(col("lang"), col("source")))
      Tables.documents(s, d).select(
        col("doc_id"),
        element_at(m, "lang").as("m_lang"),
        element_at(m, "source").as("m_source"),
        size(m).as("m_size"))
        .orderBy("doc_id")
    },

    // Bitwise operators + greatest/least over the event id space.
    "q35_bitwise" -> Q(
      """SELECT event_id,
        |       event_id & 255 AS low_byte,
        |       event_id | 4096 AS with_flag,
        |       xor(event_id, user_id) AS x_or,
        |       event_id << 2 AS shl,
        |       event_id >> 3 AS shr,
        |       greatest(value, CAST(100 AS DOUBLE)) AS at_least_100,
        |       least(value, CAST(100 AS DOUBLE)) AS at_most_100
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        col("event_id").bitwiseAND(255).as("low_byte"),
        col("event_id").bitwiseOR(4096).as("with_flag"),
        col("event_id").bitwiseXOR(col("user_id")).as("x_or"),
        shiftleft(col("event_id"), 2).as("shl"),
        shiftright(col("event_id"), 3).as("shr"),
        greatest(col("value"), lit(100.0)).as("at_least_100"),
        least(col("value"), lit(100.0)).as("at_most_100"))
        .orderBy("event_id")
    },

    // TF-IDF over documents. idf is kept LINEAR (N/df, exact double
    // division) — ln() is libm-dependent and not bit-portable across
    // engines; the ranking semantics are what's under test. Top 5 terms
    // per document, df from a self-aggregated dimension join.
    "ta_tfidf" -> Q(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
        |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token,
        |         CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
        |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |                               ORDER BY tfidf DESC, token) AS rnk
        |  FROM scored)
        |SELECT doc_id, token, tfidf, CAST(rnk AS INTEGER) AS rnk
        |FROM ranked WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      // tf IS the distinct (doc, token) dimension, so document frequency
      // is a plain COUNT over it — the old COUNT(DISTINCT doc_id) over
      // the raw token stream re-ran the explode a second time and paid
      // the two-phase distinct expansion (ta_keywords_per_doc already
      // used this shape); the tf exchange is reused across both branches
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val n  = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      val w  = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token"))
      tf.join(broadcast(df), "token")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("token"),
          (col("tf").cast("double") * (col("n_docs").cast("double") / col("df"))).as("tfidf"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .orderBy("doc_id", "rnk")
    }
  )
}
