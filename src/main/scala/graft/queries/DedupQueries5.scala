package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import graft.functions.Portable.h32

/** b-bit minwise hashing (Li & König, CACM 2011): store only the lowest
  * b bits of each minhash value — at b=2 that is a 30× signature-memory
  * cut against the 61-bit mins — and recover Jaccard from the collision
  * rate with the debiasing the truncation demands: a random non-matching
  * pair still collides with probability 1/2^b, so
  *
  *   Ĵ_b = (P̂ − 1/2^b) / (1 − 1/2^b),  P̂ = collisions / K
  *
  * (the r→0 form of the paper's estimator — exact for the universal-hash
  * family here, whose values spread uniformly mod 2^b). The query scores
  * the SAME capped LSH candidate set as dd_minhash_pairs with both
  * estimators side by side — full-width matches next to 2-bit matches —
  * so the compression's estimator variance is measured, not asserted,
  * and every number is hash-checked (integers until one final division).
  *
  * Scale shape: the pair frame is the per-corpus checkpointed candidate
  * artifact (estPairsCached); signatures for the b-bit comparison are
  * recomputed ONLY for documents appearing in some pair (the
  * candidateShingleSides semi-join discipline), so no second corpus-wide
  * shingle pass exists.
  */
object DedupQueries5 {

  private val K = 8
  private val B = 2            // bits kept per minhash value
  private val M = 1 << B       // modulus (4)

  def defs: Map[String, Q] = Map(

    "dd_bbit_minhash" -> Q(
      s"""WITH ${DedupQueries.duckCandCte},
         |j AS (
         |  SELECT c.da, c.db,
         |         (${(0 until K).map(j => s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END").mkString(" + ")}) AS cf,
         |         (${(0 until K).map(j => s"CASE WHEN a.s$j % $M = b.s$j % $M THEN 1 ELSE 0 END").mkString(" + ")}) AS cb
         |  FROM cand c
         |  JOIN sig a ON a.doc_id = c.da
         |  JOIN sig b ON b.doc_id = c.db)
         |SELECT da, db,
         |       CAST(cf AS INTEGER) AS matches_full,
         |       CAST(cb AS INTEGER) AS matches_b2,
         |       CAST(cf AS DOUBLE) / CAST($K AS DOUBLE) AS est_full,
         |       CAST($M * cb - $K AS DOUBLE) / CAST(${(M - 1) * K} AS DOUBLE) AS est_b2
         |FROM j ORDER BY da, db""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = DedupQueries.estPairsCached(docs, d).select("da", "db")
      // signatures only for documents some pair touches — the corpus is
      // never re-shingled for this comparison
      val ids = cand.select(col("da").as("doc_id"))
        .union(cand.select(col("db").as("doc_id"))).distinct()
      val sig = DedupQueries.sigDf(docs.join(ids, Seq("doc_id"), "left_semi"))
      val sa = sig.select(
        (col("doc_id").as("a_id") +: (0 until K).map(j => col(s"s$j").as(s"a$j"))): _*)
      val sb = sig.select(
        (col("doc_id").as("b_id") +: (0 until K).map(j => col(s"s$j").as(s"b$j"))): _*)
      val cf = (0 until K).map(j => when(col(s"a$j") === col(s"b$j"), 1).otherwise(0))
        .reduce(_ + _)
      val cb = (0 until K).map(j =>
          when(col(s"a$j") % M === col(s"b$j") % M, 1).otherwise(0))
        .reduce(_ + _)
      cand.join(sa, col("da") === col("a_id"))
        .join(sb, col("db") === col("b_id"))
        .select(col("da"), col("db"),
          cf.cast("int").as("matches_full"),
          cb.cast("int").as("matches_b2"))
        .select(col("da"), col("db"), col("matches_full"), col("matches_b2"),
          (col("matches_full").cast("double") / lit(K.toDouble)).as("est_full"),
          ((lit(M) * col("matches_b2") - lit(K)).cast("double")
            / lit(((M - 1) * K).toDouble)).as("est_b2"))
        .orderBy("da", "db")
    },

    // Densified ONE-PERMUTATION hashing (Shrivastava & Li, ICML 2014):
    // the modern minhash speedup — hash every shingle ONCE, partition
    // the 32-bit hash space into K bins, keep the min per bin, and fill
    // an EMPTY bin by borrowing from the nearest non-empty bin to its
    // cyclic right with a +t·2³² offset per borrow step (the offset
    // keeps borrowed values distinct across bins; ≤ K·2³² fits a
    // BIGINT). K× fewer hash computations than the classic K-permutation
    // signature at (asymptotically) the same collision-probability-=-
    // Jaccard guarantee; this query GRADES that trade on the same capped
    // LSH candidate pairs, emitting the OPH match count next to the
    // classic full-width count. Scale shape: one shingle pass for
    // PAIR-TOUCHED docs only (the semi-join discipline), K conditional
    // min aggregates (map-side combined), densification as a flat
    // 8-branch coalesce-with-offset CASE per bin — pure codegen.
    "dd_oph_minhash" -> Q({
      val binMins = (0 until K).map(j =>
        s"MIN(CASE WHEN h % $K = $j THEN h END) AS m$j").mkString(", ")
      def dens(j: Int) =
        (0 until K).map { t =>
          val src = (j + t) % K
          s"WHEN m$src IS NOT NULL THEN m$src + ${t.toLong * 4294967296L}"
        }.mkString("CASE ", " ", " END")
      val densCols = (0 until K).map(j => s"${dens(j)} AS o$j").mkString(", ")
      val aCols = (0 until K).map(j => s"sg.o$j AS a$j").mkString(", ")
      val bCols = (0 until K).map(j => s"sg.o$j AS b$j").mkString(", ")
      val cntOph = (0 until K).map(j =>
        s"CASE WHEN a.a$j = b.b$j THEN 1 ELSE 0 END").mkString(" + ")
      val cntFull = (0 until K).map(j =>
        s"CASE WHEN sa.s$j = sb.s$j THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH ${DedupQueries.duckCandCte},
         |t AS (SELECT doc_id, ${DedupQueries.duckShingles} AS sh FROM documents),
         |hx AS (
         |  SELECT doc_id, ${graft.functions.Portable.duckH("s", 8)} AS h
         |  FROM t, unnest(sh) u(s)),
         |bins AS (SELECT doc_id, $binMins FROM hx GROUP BY doc_id),
         |sg AS (SELECT doc_id, $densCols FROM bins),
         |j AS (
         |  SELECT c.da, c.db,
         |         ($cntOph) AS co, ($cntFull) AS cf
         |  FROM cand c
         |  JOIN (SELECT sg.doc_id, $aCols FROM sg) a ON a.doc_id = c.da
         |  JOIN (SELECT sg.doc_id, $bCols FROM sg) b ON b.doc_id = c.db
         |  JOIN sig sa ON sa.doc_id = c.da
         |  JOIN sig sb ON sb.doc_id = c.db)
         |SELECT da, db,
         |       CAST(co AS INTEGER) AS matches_oph,
         |       CAST(cf AS INTEGER) AS matches_full,
         |       CAST(co AS DOUBLE) / CAST($K AS DOUBLE) AS est_oph
         |FROM j ORDER BY da, db""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = DedupQueries.estPairsCached(docs, d).select("da", "db", "matches")
      val ids = cand.select(col("da").as("doc_id"))
        .union(cand.select(col("db").as("doc_id"))).distinct()
      val sub = docs.join(ids, Seq("doc_id"), "left_semi")
      // one base hash per DISTINCT shingle (set semantics — a bin min is
      // unaffected by duplicates, but the oracle's unnest(sh) is over
      // the distinct shingle SET, so mirror it)
      val hx = sub
        .select(col("doc_id"),
                explode(DedupQueries.shingleSet(col("text"))).as("sgl"))
        .select(col("doc_id"), h32(col("sgl")).as("h"))
      val binAggs = (0 until K).map(j =>
        min(when(pmod(col("h"), lit(K)) === j, col("h"))).as(s"m$j"))
      val bins = hx.groupBy("doc_id").agg(binAggs.head, binAggs.tail: _*)
      // densify: borrow from the nearest non-empty bin to the cyclic
      // right, +t·2³² per borrow step — the same CASE order as the
      // oracle (first non-null wins)
      def dens(j: Int) = (0 until K).map { t =>
        val src = (j + t) % K
        (col(s"m$src").isNotNull, col(s"m$src") + lit(t.toLong * 4294967296L))
      }.foldRight(lit(null).cast("long")) {
        case ((cond, v), acc) => when(cond, v).otherwise(acc)
      }
      val sg = bins.select(
        (col("doc_id") +: (0 until K).map(j => dens(j).as(s"o$j"))): _*)
      val sa = sg.select(
        (col("doc_id").as("a_id") +: (0 until K).map(j => col(s"o$j").as(s"a$j"))): _*)
      val sb = sg.select(
        (col("doc_id").as("b_id") +: (0 until K).map(j => col(s"o$j").as(s"b$j"))): _*)
      val co = (0 until K).map(j =>
        when(col(s"a$j") === col(s"b$j"), 1).otherwise(0)).reduce(_ + _)
      cand.join(sa, col("da") === col("a_id"))
        .join(sb, col("db") === col("b_id"))
        .select(col("da"), col("db"),
          co.cast("int").as("matches_oph"),
          col("matches").cast("int").as("matches_full"),
          (co.cast("double") / lit(K.toDouble)).as("est_oph"))
        .orderBy("da", "db")
    })
}
