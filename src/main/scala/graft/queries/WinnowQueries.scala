package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable.duckH
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
  * "Winnowing: Local Algorithms for Document Fingerprinting"): hash every
  * k-gram, slide a w-window over the hash sequence, keep each window's
  * minimum — guarantees any shared substring of length ≥ w+k-1 produces a
  * shared fingerprint. The substantive "rolling hash fingerprint" of the
  * text-analysis mandate (ta_fingerprint is the whole-document digest).
  *
  * k = 3 tokens, w = 4 windows; hashes are the portable h32.
  */
object WinnowQueries {

  private val W = 4

  /** 3-token shingle hashes straight from the text (ordered, NOT
    * distinct — winnowing is positional; <3-token docs yield an empty
    * hash sequence, matching the oracle's range()). The one-pass
    * byte-slice kernel (round 10, functions/Shingles.scala, mode 2)
    * replaced the interpreted transform/slice/concat_ws + per-element
    * h32 lambda chain; values are byte-identical. Callers must register
    * [[graft.functions.Shingles]] on the session. */
  private def kgramHashes(text: Column): Column =
    call_function("graft_shingle_h32", text, lit(3), lit(2))

  private val duckKgramHashes: String =
    s"""[${duckH("array_to_string(toks[i:i+2], ' ')", 8)}
       | for i in range(1, len(toks) - 1)]""".stripMargin.replace("\n", " ")

  /** Distinct window minima over the hash sequence; short docs degrade
    * to a single whole-sequence minimum, empty sequences to no
    * fingerprints (identical tiering in the oracle). The minima loop is
    * the codegen'd `graft_window_min` expression (same values as the
    * declarative transform/slice/array_min form, which evaluates as
    * interpreted HOF lambdas with a per-window array copy — measured
    * hotspot of both winnow queries); callers must register
    * [[graft.functions.WindowMin]] on the session first. */
  private def fingerprints(hs: Column): Column =
    array_distinct(
      when(size(hs) >= W, call_function("graft_window_min", hs, lit(W)))
        .when(size(hs) > 0, array(array_min(hs)))
        .otherwise(array().cast("array<bigint>")))

  private val duckFingerprints: String =
    s"""list_distinct(CASE WHEN len(hs) >= $W
       | THEN [list_min(hs[j:j+${W - 1}]) for j in range(1, len(hs) - ${W - 2})]
       | WHEN len(hs) > 0 THEN [list_min(hs)]
       | ELSE [] END)""".stripMargin.replace("\n", " ")

  def defs: Map[String, Q] = Map(

    // Per-document winnowed fingerprint profile.
    "ta_winnowing" -> Q(
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
         |h AS (SELECT doc_id, $duckKgramHashes AS hs FROM t),
         |f AS (SELECT doc_id, $duckFingerprints AS fps FROM h)
         |SELECT doc_id, CAST(len(fps) AS INTEGER) AS n_fingerprints,
         |       list_min(fps) AS min_fp, list_max(fps) AS max_fp
         |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
      graft.functions.WindowMin.register(s)
      graft.functions.Shingles.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"), kgramHashes(col("text")).as("hs"))
        .select(col("doc_id"), fingerprints(col("hs")).as("fps"))
        .select(col("doc_id"), size(col("fps")).as("n_fingerprints"),
                array_min(col("fps")).as("min_fp"), array_max(col("fps")).as("max_fp"))
        .orderBy("doc_id")
    },

    // Candidate near-dup pairs sharing a RARE winnowed fingerprint
    // (document frequency ≤ 3) — explode + df-filter + self equi-join,
    // the moss/plagiarism-detector blocking shape; rarity bounds the
    // bucket sizes at any corpus scale.
    "dd_winnow_pairs" -> Q(
      s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
         |h AS (SELECT doc_id, $duckKgramHashes AS hs FROM t),
         |f AS (SELECT doc_id, unnest($duckFingerprints) AS fp FROM h),
         |rare AS (
         |  SELECT fp FROM f GROUP BY fp HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 3),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         |  FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  JOIN rare r ON a.fp = r.fp)
         |SELECT da, db FROM cand ORDER BY da, db""".stripMargin) { (s, d) =>
      graft.functions.WindowMin.register(s)
      graft.functions.Shingles.register(s)
      val f = Tables.documents(s, d)
        .select(col("doc_id"), kgramHashes(col("text")).as("hs"))
        .select(col("doc_id"), explode(fingerprints(col("hs"))).as("fp"))
      // (doc, fp) pairs are unique post-array_distinct, so a count over
      // the fp window IS the document frequency — one pipeline instead of
      // a separate aggregate + join back, saving a full recompute of the
      // winnow lineage (at real scale one would checkpoint `f` instead;
      // a per-query cache is a session-lifetime leak under Verify/Bench)
      val wdf = org.apache.spark.sql.expressions.Window.partitionBy("fp")
      val fr = f.withColumn("df", count(lit(1)).over(wdf))
        .filter(col("df") >= 2 && col("df") <= 3)
      val a  = fr.select(col("fp"), col("doc_id").as("da"))
      val b  = fr.select(col("fp").as("fp2"), col("doc_id").as("db"))
      a.join(b, col("fp") === col("fp2") && col("da") < col("db"))
        .select("da", "db").distinct()
        .orderBy("da", "db")
    }
  )
}
