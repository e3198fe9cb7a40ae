package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable.{duckH, h60}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-hygiene and incremental dedup: the two dedup consumers a
  * production pipeline runs AFTER the candidate generator — checking
  * that near-duplicates don't straddle the train/val/test boundary
  * (evaluation leakage), and deduplicating a new crawl DELTA against a
  * prior corpus snapshot (at 100 TB nobody re-dedups the full corpus
  * per crawl; the delta joins against the persisted candidate index).
  * Both consume [[DedupQueries.bandCandidatesCached]] — the capped LSH
  * band-candidate artifact — so pair work stays bounded by bucket caps
  * and NO new pair generator is introduced.
  */
object DedupQueries3 {

  /** The ta_split_assign rule, shared verbatim: hash-bucket of doc_id. */
  private def splitOf(c: Column): Column = {
    val b = pmod(h60(c), lit(100L))
    when(b < 90, "train").when(b < 95, "val").otherwise("test")
  }

  private def duckSplit(expr: String): String =
    s"""CASE WHEN ${duckH(s"CAST($expr AS VARCHAR)", 15)} % 100 < 90 THEN 'train'
       |     WHEN ${duckH(s"CAST($expr AS VARCHAR)", 15)} % 100 < 95 THEN 'val'
       |     ELSE 'test' END""".stripMargin

  def defs: Map[String, Q] = Map(

    // Train/val/test LEAKAGE pairs: near-dup candidates whose endpoints
    // land in different splits under the ta_split_assign hash rule.
    // A val/test doc with a train near-twin inflates benchmarks exactly
    // like verbatim contamination (the reason The Pile / GPT-3 dedup
    // their eval sets against train) — and because the split is
    // assigned by doc_id hash, near-dup FAMILIES straddle it with high
    // probability. Scale shape: one scan of the persisted candidate
    // artifact + a per-endpoint hash — no shingling, no new pairs; the
    // report is bounded by the (already-capped) candidate count.
    "dd_split_leakage" -> Q(
      s"""WITH ${DedupQueries.duckCandCte},
         |lk AS (
         |  SELECT da, db, ${duckSplit("da")} AS split_a, ${duckSplit("db")} AS split_b
         |  FROM cand)
         |SELECT da, db, split_a, split_b,
         |       CASE WHEN split_a = 'train' OR split_b = 'train' THEN 1 ELSE 0 END
         |         AS train_involved
         |FROM lk WHERE split_a <> split_b
         |ORDER BY da, db""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      DedupQueries.bandCandidatesCached(docs, d)
        .select(col("da"), col("db"),
                splitOf(col("da")).as("split_a"), splitOf(col("db")).as("split_b"))
        .filter(col("split_a") =!= col("split_b"))
        .select(col("da"), col("db"), col("split_a"), col("split_b"),
          when(col("split_a") === "train" || col("split_b") === "train", 1)
            .otherwise(0).as("train_involved"))
        .orderBy("da", "db")
    },

    // Incremental dedup of a crawl delta against a snapshot: docs with
    // doc_id ≡ 8,9 (mod 10) play the NEW batch, the other 80% the prior
    // snapshot. Every new doc gets the production verdict: drop as
    // `dup_of_snapshot` (near-dups an existing doc), drop as
    // `dup_in_batch` (near-dups a smaller-id doc within the delta — the
    // same greedy keep-first rule as ss_semdedup), or keep as `fresh`.
    // Scale shape: the candidate artifact is read once, symmetrized by
    // a 2× projection union (no join), and the verdict is one max-flag
    // aggregate per new doc; the snapshot corpus is never rescanned —
    // the whole point of incremental dedup at 100 TB.
    "dd_incremental" -> Q(
      s"""WITH ${DedupQueries.duckCandCte},
         |sym AS (
         |  SELECT da AS x, db AS y FROM cand
         |  UNION ALL
         |  SELECT db AS x, da AS y FROM cand),
         |flags AS (
         |  SELECT x,
         |         MAX(CASE WHEN y % 10 < 8 THEN 1 ELSE 0 END) AS has_old,
         |         MAX(CASE WHEN y % 10 >= 8 AND y < x THEN 1 ELSE 0 END) AS has_prior_new
         |  FROM sym WHERE x % 10 >= 8 GROUP BY x)
         |SELECT d.doc_id,
         |       CASE WHEN f.has_old = 1 THEN 'dup_of_snapshot'
         |            WHEN f.has_prior_new = 1 THEN 'dup_in_batch'
         |            ELSE 'fresh' END AS verdict
         |FROM documents d LEFT JOIN flags f ON d.doc_id = f.x
         |WHERE d.doc_id % 10 >= 8
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = DedupQueries.bandCandidatesCached(docs, d)
      val sym = cand.select(col("da").as("x"), col("db").as("y"))
        .unionAll(cand.select(col("db").as("x"), col("da").as("y")))
      val flags = sym.filter(col("x") % 10 >= 8)
        .groupBy("x")
        .agg(max(when(col("y") % 10 < 8, 1).otherwise(0)).as("has_old"),
             max(when(col("y") % 10 >= 8 && col("y") < col("x"), 1).otherwise(0))
               .as("has_prior_new"))
      docs.select("doc_id").filter(col("doc_id") % 10 >= 8)
        .join(flags, col("doc_id") === col("x"), "left")
        .select(col("doc_id"),
          when(col("has_old") === 1, "dup_of_snapshot")
            .when(col("has_prior_new") === 1, "dup_in_batch")
            .otherwise("fresh").as("verdict"))
        .orderBy("doc_id")
    }
  )
}
