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
    // MinHash-band candidate pairs (DedupQueries.bandCandidates) — LSH
    // proposes, the O(n·m) DP disposes, so the comparison count is
    // bounded by the LSH bucket sizes at any corpus scale (round 1
    // blocked on (lang, source), which is quadratic when one bucket is
    // the corpus, and needed a localCheckpoint lineage barrier to
    // parallelize the DP over millions of pairs — both gone now that the
    // candidate set is small). The prefix is normalized to [a-z ] first:
    // Spark's levenshtein is codepoint-based while DuckDB's is
    // byte-based, so any multibyte character would silently diverge — on
    // the normalized alphabet they coincide.
    "dd_edit_distance" -> Q(
      s"""WITH ${DedupQueries.duckCandCte},
         |t AS (
         |  SELECT doc_id,
         |         substring(regexp_replace(text, '[^a-z ]', '', 'g'), 1, 40) AS head
         |  FROM documents)
         |SELECT c.da, c.db,
         |       CAST(levenshtein(ta.head, tb.head) AS INTEGER) AS edit_dist
         |FROM cand c
         |JOIN t ta ON c.da = ta.doc_id
         |JOIN t tb ON c.db = tb.doc_id
         |WHERE levenshtein(ta.head, tb.head) <= 20
         |ORDER BY da, db""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val t = docs.select(col("doc_id"),
        substring(regexp_replace(col("text"), "[^a-z ]", ""), 1, 40).as("head"))
      val ta = t.select(col("doc_id").as("ta_id"), col("head").as("a_head"))
      val tb = t.select(col("doc_id").as("tb_id"), col("head").as("b_head"))
      DedupQueries.bandCandidatesCached(docs, d)
        .join(ta, col("da") === col("ta_id"))
        .join(tb, col("db") === col("tb_id"))
        .select(col("da"), col("db"),
                levenshtein(col("a_head"), col("b_head")).cast("int").as("edit_dist"))
        .filter(col("edit_dist") <= 20)
        .orderBy("da", "db")
    }
  )
}
