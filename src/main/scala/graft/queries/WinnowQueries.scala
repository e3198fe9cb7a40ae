package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable.{duckH, h32}
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

  /** 3-token shingle hashes from a materialized toks column (ordered,
    * NOT distinct — winnowing is positional). Guarded for <3 tokens:
    * two-arg sequence(0, negative) counts DOWN and element_at(_, 0)
    * throws, where the oracle's range() is just empty. */
  private def kgramHashes(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3), i =>
        // slice+concat_ws, not element_at×3: each element_at is a
        // separately-interpreted lambda subexpression (measured ~4×
        // slower than one slice per gram at sf0.1)
        h32(concat_ws(" ", slice(toks, i + 1, lit(3))))))
      .otherwise(array().cast("array<bigint>"))

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
      Tables.documents(s, d)
        .repartition(col("doc_id")) // spread the per-doc hashing (1-file scan)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), kgramHashes(col("toks")).as("hs"))
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
      val f = Tables.documents(s, d)
        .repartition(col("doc_id")) // spread the per-doc hashing (1-file scan)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), kgramHashes(col("toks")).as("hs"))
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
