package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication surface over `documents` — the LLM-training-pipeline
  * extension mandated by the north star (SURVEY.md §2.B last row): exact,
  * MinHash+LSH banding, SimHash, and n-gram Jaccard, all as shuffle-lean
  * Spark plans with exact DuckDB oracles.
  *
  * Scale notes (100 TB posture):
  *   - exact dedup is one hash-groupBy (map-side combined);
  *   - minhash candidates come from equi-joins on band keys — never a
  *     theta-join; the pair space is bounded by band-bucket sizes;
  *   - jaccard verification joins only within (lang, source) buckets;
  *   - everything is per-row HOFs + equi-joins, so AQE can handle skewed
  *     buckets (hot bands) by splitting them.
  */
object DedupQueries {

  private val K = 8 // minhash permutations; 2 bands of 4 rows

  /** 3-token shingles from a MATERIALIZED token-array column, distinct,
    * with a <3-token guard. The tokens must be a projected column, not the
    * `split(...)` expression itself — every `element_at` reference
    * re-evaluates its input expression, so inlining the split makes each
    * shingle re-tokenize the whole document (~3× split per shingle). */
  private def shinglesFrom(toks: Column): Column =
    array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(0), size(toks) - 3), i =>
          concat_ws(" ",
            element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))
        .otherwise(array(concat_ws(" ", toks))))

  /** Same shingle set in DuckDB. */
  private val duckShingles: String =
    """CASE WHEN len(string_split(text,' ')) >= 3
      |  THEN list_distinct([array_to_string((string_split(text,' '))[i:i+2],' ')
      |                      for i in range(1, len(string_split(text,' '))-1)])
      |  ELSE [text] END""".stripMargin.replace("\n", " ")

  /** Permutation family: ONE md5 base hash per shingle (the expensive
    * step), then K affine universal hashes (a_j·h + b_j) mod p over the
    * 32-bit base — 8× fewer digest computations than hashing per
    * permutation, identical arithmetic on both engines (a < 2^30 and
    * h < 2^32 keep the product under 2^62: no BIGINT overflow, which
    * DuckDB would raise and Spark would silently wrap).
    */
  private val P = (1L << 61) - 1

  private def mh(tag: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
  private val A: Seq[Long] = (0 until K).map(j => (mh(s"minhashA|$j") % (1L << 30)) | 1L)
  private val B: Seq[Long] = (0 until K).map(j => mh(s"minhashB|$j") % P)

  private def duckSig(j: Int): String =
    s"list_min([(${A(j)} * h + ${B(j)}) % $P for h in hs])"

  /** doc_id + s0..s7 + band0/band1 (md5 of each half of the signature).
    *
    * Shape: explode shingles → md5 in a whole-stage-codegen projection →
    * groupBy(doc_id) with K min() aggregates. The mins combine map-side,
    * so the shuffle carries K longs per document regardless of shingle
    * count — strictly better than an interpreted per-element HOF fold,
    * and the same values (min of (a·h+b) mod p over the same set).
    */
  private def sigDf(docs: DataFrame): DataFrame = {
    val exploded = docs
      // the corpus is one parquet file = one scan partition; spread the
      // CPU-dense shingle+md5 projection across the cluster
      .repartition(col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(shinglesFrom(col("toks"))).as("s"))
      .select(col("doc_id"), h32(col("s")).as("h"))
    val withSigs = exploded
      .groupBy("doc_id")
      .agg(min((lit(A(0)) * col("h") + lit(B(0))) % P).as("s0"),
           (1 until K).map(j => min((lit(A(j)) * col("h") + lit(B(j))) % P).as(s"s$j")): _*)
    withSigs
      .withColumn("band0", md5(concat_ws(",", (0 until K / 2).map(j => col(s"s$j")): _*)))
      .withColumn("band1", md5(concat_ws(",", (K / 2 until K).map(j => col(s"s$j")): _*)))
  }

  private val duckSigCte: String = {
    val sigs  = (0 until K).map(j => s"${duckSig(j)} AS s$j").mkString(", ")
    val half0 = (0 until K / 2).map(j => s"CAST(s$j AS VARCHAR)").mkString(" || ',' || ")
    val half1 = (K / 2 until K).map(j => s"CAST(s$j AS VARCHAR)").mkString(" || ',' || ")
    s"""sh_t AS (SELECT doc_id, $duckShingles AS sh FROM documents),
       |hs_t AS (SELECT doc_id, [${duckH("s", 8)} for s in sh] AS hs FROM sh_t),
       |sig AS (SELECT doc_id, $sigs FROM hs_t),
       |banded AS (SELECT *, md5($half0) AS band0, md5($half1) AS band1 FROM sig)""".stripMargin
  }

  def defs: Map[String, Q] = Map(

    // Exact dedup: content-hash groups (the `sha2/md5 + groupBy` idiom).
    // One shuffle on the hash; map-side combine does the heavy lifting.
    "dd_exact" -> Q(
      """SELECT md5(text) AS text_hash, COUNT(*) AS n_copies,
        |       MIN(doc_id) AS canonical_id
        |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_id"))
        .orderBy("text_hash")
    },

    // MinHash signatures: K=8 permutation mins over 3-token shingles,
    // banded 4+4 for LSH candidate generation.
    "dd_minhash_sig" -> Q(
      s"""WITH $duckSigCte
         |SELECT doc_id, ${(0 until K).map(j => s"s$j").mkString(", ")}, band0, band1
         |FROM banded ORDER BY doc_id""".stripMargin) { (s, d) =>
      sigDf(Tables.documents(s, d)).orderBy("doc_id")
    },

    // MinHash+LSH near-dup candidates: pairs sharing either band bucket,
    // scored by signature agreement (estimated Jaccard). Candidates come
    // from two EQUI-joins on band keys unioned + deduped — the scalable
    // formulation (no theta join; bucket sizes bound the pair space).
    "dd_minhash_pairs" -> Q(
      s"""WITH $duckSigCte,
         |pairs AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db,
         |         CAST((${(0 until K).map(j => s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END").mkString(" + ")})
         |              AS DOUBLE) / $K AS est_jaccard
         |  FROM banded a JOIN banded b ON a.band0 = b.band0 AND a.doc_id < b.doc_id
         |  UNION
         |  SELECT a.doc_id AS da, b.doc_id AS db,
         |         CAST((${(0 until K).map(j => s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END").mkString(" + ")})
         |              AS DOUBLE) / $K AS est_jaccard
         |  FROM banded a JOIN banded b ON a.band1 = b.band1 AND a.doc_id < b.doc_id)
         |SELECT da, db, est_jaccard FROM pairs ORDER BY da, db""".stripMargin) { (s, d) =>
      // no cache(): Verify/Bench run dozens of queries in one session and
      // a per-call cache is never unpersisted (storage-memory leak); the
      // two band branches recompute the small signature aggregate instead
      val sig = sigDf(Tables.documents(s, d))
      val a   = sig.select(sig.columns.map(c => col(c).as(s"a_$c")): _*)
      val b   = sig.select(sig.columns.map(c => col(c).as(s"b_$c")): _*)
      def candidates(band: String) =
        a.join(b, col(s"a_$band") === col(s"b_$band") && col("a_doc_id") < col("b_doc_id"))
      val est = (0 until K).map(j => when(col(s"a_s$j") === col(s"b_s$j"), 1).otherwise(0))
        .reduce(_ + _).cast("double") / K
      candidates("band0").unionByName(candidates("band1"))
        .select(col("a_doc_id").as("da"), col("b_doc_id").as("db"), est.as("est_jaccard"))
        .dropDuplicates("da", "db")
        .orderBy("da", "db")
    },

    // SimHash: 16-bit fingerprint — per-token 16-bit hashes vote per bit
    // position; bit set iff the vote is positive. Pure HOFs, one pass.
    "dd_simhash" -> Q(
      """SELECT doc_id,
        |       CAST(list_sum([CASE WHEN list_sum(
        |              [CASE WHEN ((CAST(('0x' || substring(md5(t),1,4)) AS INTEGER) >> b) & 1) = 1
        |                    THEN 1 ELSE -1 END for t in string_split(text,' ')]) > 0
        |            THEN 1 << b ELSE 0 END for b in range(0,16)]) AS INTEGER) AS simhash,
        |       CAST(len(string_split(text,' ')) AS INTEGER) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      // materialize the per-token hash array once; 16 bit-vote aggregates
      // each reference it (an inline expression would re-split + re-hash
      // the document 16 times)
      val base = Tables.documents(s, d).select(
        col("doc_id"),
        transform(split(col("text"), " "), t => h16(t)).as("hs"))
      val simhash = (0 until 16).map { b =>
        val vote = aggregate(col("hs"), lit(0L), (acc, h) =>
          acc + when(shiftright(h, b).bitwiseAND(lit(1)) === 1, 1L).otherwise(-1L))
        when(vote > 0, lit(1 << b)).otherwise(lit(0))
      }.reduce(_ + _)
      base.select(col("doc_id"), simhash.as("simhash"), size(col("hs")).as("n_tokens"))
        .orderBy("doc_id")
    },

    // n-gram (3-token shingle) Jaccard, verified pairwise WITHIN
    // (lang, source) buckets — the blocking key bounds the pair count so
    // the self-join stays an equi-join at any scale.
    "dd_ngram_jaccard" -> Q(
      s"""WITH t AS (
         |  SELECT doc_id, lang, source, $duckShingles AS sh FROM documents)
         |SELECT a.doc_id AS da, b.doc_id AS db,
         |       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |         / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         |FROM t a JOIN t b
         |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         |ORDER BY da, db""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("lang"), col("source"), shinglesFrom(col("toks")).as("sh"))
      val a = t.select(t.columns.map(c => col(c).as(s"a_$c")): _*)
      val b = t.select(t.columns.map(c => col(c).as(s"b_$c")): _*)
      a.join(b, col("a_lang") === col("b_lang") && col("a_source") === col("b_source") &&
                col("a_doc_id") < col("b_doc_id"))
        .select(col("a_doc_id").as("da"), col("b_doc_id").as("db"),
          (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
           size(array_union(col("a_sh"), col("b_sh")))).as("jaccard"))
        .orderBy("da", "db")
    }
  )
}
