package graft.queries

import graft.{Q, Tables}
import graft.functions.{KmvSketch, Portable}
import graft.functions.Portable.duckH
import org.apache.spark.sql.functions._

/** Sketch + edit-distance dedup queries: the deterministic-approximation
  * family (KMV distinct) and the last near-dup measure (Levenshtein).
  */
object SketchQueries {

  private val K = 64

  def defs: Map[String, Q] = Map(

    // KMV distinct sketch (custom TypedImperativeAggregate) vs the SQL
    // restatement of the same estimator: k smallest distinct h60 hashes,
    // estimate (k-1)·2^60/kth_min, exact count below k. Also emits the
    // exact distinct for error inspection.
    "q42_kmv_distinct" -> Q(
      s"""WITH h AS (
         |  SELECT DISTINCT l_returnflag, ${duckH("CAST(l_partkey AS VARCHAR)", 15)} AS hv
         |  FROM lineitem),
         |ranked AS (
         |  SELECT l_returnflag, hv,
         |         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
         |         COUNT(*) OVER (PARTITION BY l_returnflag) AS nd
         |  FROM h)
         |SELECT l_returnflag,
         |       CASE WHEN MAX(nd) < $K THEN CAST(MAX(nd) AS DOUBLE)
         |            ELSE CAST(${K - 1} AS DOUBLE) * 1152921504606846976
         |                   / MAX(CASE WHEN rn = $K THEN hv END) END AS kmv_estimate,
         |       MAX(nd) AS exact_distinct
         |FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      KmvSketch.register(s)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
                Portable.h60(col("l_partkey").cast("string")).as("hv"),
                col("l_partkey"))
        .groupBy("l_returnflag")
        // distinct over the HASH (not the key) so the comparison column
        // means the same thing as the oracle's nd-over-distinct-hv even
        // under a (astronomically rare) h60 collision
        .agg(call_function("kmv_distinct", col("hv")).as("kmv_estimate"),
             countDistinct(col("hv")).as("exact_distinct"))
        .orderBy("l_returnflag")
    },

    // Edit-distance near-dup: Levenshtein over 40-char prefixes of
    // same-(lang, source) document pairs — the blocking key bounds the
    // O(n·m) comparisons exactly like the jaccard verifier. The prefix is
    // normalized to [a-z ] first: Spark's levenshtein is codepoint-based
    // while DuckDB's is byte-based, so any multibyte character would
    // silently diverge — on the normalized alphabet they coincide.
    "dd_edit_distance" -> Q(
      """WITH t AS (
        |  SELECT doc_id, lang, source,
        |         substring(regexp_replace(text, '[^a-z ]', '', 'g'), 1, 40) AS head
        |  FROM documents)
        |SELECT a.doc_id AS da, b.doc_id AS db,
        |       CAST(levenshtein(a.head, b.head) AS INTEGER) AS edit_dist
        |FROM t a JOIN t b
        |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.head, b.head) <= 20
        |ORDER BY da, db""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
                substring(regexp_replace(col("text"), "[^a-z ]", ""), 1, 40).as("head"))
      val a = t.select(t.columns.map(c => col(c).as(s"a_$c")): _*)
      val b = t.select(t.columns.map(c => col(c).as(s"b_$c")): _*)
      a.join(b, col("a_lang") === col("b_lang") && col("a_source") === col("b_source") &&
                col("a_doc_id") < col("b_doc_id"))
        // The Levenshtein projection must run AFTER a real fan-out: the
        // optimizer pushes projections through RepartitionByExpression, so
        // a bare repartition still evaluates the O(n·m) DP on the join's
        // single map-side partition (measured 5× slower). The lazy
        // localCheckpoint is a lineage barrier: pairs land in the
        // repartitioned layout first, then the DP runs 32-way parallel.
        .repartition(col("a_doc_id"))
        .localCheckpoint(false)
        .select(col("a_doc_id").as("da"), col("b_doc_id").as("db"),
                levenshtein(col("a_head"), col("b_head")).cast("int").as("edit_dist"))
        .filter(col("edit_dist") <= 20)
        .orderBy("da", "db")
    }
  )
}
