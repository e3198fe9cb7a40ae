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

  /** Distinct 3-token shingles (first-occurrence order, <3-token docs
    * degrade to the whole text) straight from the text column — the
    * one-pass byte-slice kernel (functions/Shingles.scala, mode 1),
    * which replaced the round-1..9 split + transform/slice/concat_ws
    * HOF + array_distinct chain: HOF lambdas never codegen, and the
    * array_distinct was O(n²) interpreted string comparison per doc. */
  private[queries] def shingleSet(text: Column): Column = {
    graft.functions.Shingles.register(org.apache.spark.sql.SparkSession.active)
    call_function("graft_shingles", text, lit(3), lit(1))
  }

  /** Same shingle set in DuckDB. */
  private[queries] val duckShingles: String =
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
  private[queries] def sigDf(docs: DataFrame): DataFrame = {
    graft.functions.Shingles.register(docs.sparkSession)
    val exploded = docs
      // positional shingles with whole-doc fallback (mode 0), NOT the
      // distinct mode: min() is unaffected by duplicate shingles, so
      // dedup would be pure overhead before a min-aggregate (set
      // semantics only matter where arrays are compared, i.e.
      // dd_ngram_jaccard). The kernel hashes each shingle's byte slice
      // in place (functions/Shingles.scala) — no token array, no HOF
      // lambda, no per-shingle string; values are byte-identical to
      // h32(concat_ws(' ', slice(toks, i+1, 3))).
      .select(col("doc_id"),
              explode(call_function("graft_shingle_h32",
                col("text"), lit(3), lit(0))).as("h"))
    val withSigs = exploded
      .groupBy("doc_id")
      .agg(min((lit(A(0)) * col("h") + lit(B(0))) % P).as("s0"),
           (1 until K).map(j => min((lit(A(j)) * col("h") + lit(B(j))) % P).as(s"s$j")): _*)
    withSigs
      .withColumn("band0", md5(concat_ws(",", (0 until K / 2).map(j => col(s"s$j")): _*)))
      .withColumn("band1", md5(concat_ws(",", (K / 2 until K).map(j => col(s"s$j")): _*)))
  }

  /** Degenerate-band cap, ENFORCED: a band bucket holding a
    * near-identical-content family grows with the corpus, and its
    * bucket-local pair fan-out is quadratic in the family size — the one
    * way LSH blocking degrades to all-pairs at 100 TB. Buckets over this
    * size are excluded from candidate generation (every verifier consumes
    * [[bandCandidates]], so jaccard / edit-distance / cluster propagation
    * all inherit the bound) and reported out-of-band by `dd_band_stats`
    * as "trivially duplicated — handle with exact dedup, not pairwise
    * verification" (the MinHashLSH standard practice). The SAME cap is
    * stated in the DuckDB CTEs, so the oracle semantics and the code
    * agree exactly; the fixtures sit orders of magnitude below it
    * (largest fixture bucket ≈ 10² members), so fixture counts are
    * unchanged by enforcement. */
  private[queries] val BandCap = 10000L

  /** Band-bucket membership: (doc_id, bid, bkey) — one row per document
    * per band. The bucket surface shared by candidate generation and the
    * `dd_band_stats` report. */
  /** Per-ROW band keys — the stateless twin of [[sigDf]]: the same
    * shingles, the same K affine permutations, the same band md5s, but
    * the min runs as an array HOF inside the row instead of an
    * explode+groupBy, so the expression needs no shuffle and no state.
    * Values are identical to sigDf's (min over the same multiset).
    * This is what lets a STREAMING frame compute its band keys at
    * ingest (streaming/NearDupGateStream) — batch keeps sigDf, whose
    * exploded aggregate is faster when the corpus is scanned anyway. */
  private[graft] def rowBands(docs: DataFrame): DataFrame = {
    graft.functions.Shingles.register(docs.sparkSession)
    val sigs = (0 until K).map { j =>
      array_min(transform(col("hs"), h => (lit(A(j)) * h + lit(B(j))) % P)).as(s"s$j")
    }
    docs
      .select(col("doc_id"),
              call_function("graft_shingle_h32",
                col("text"), lit(3), lit(0)).as("hs"))
      .select(col("doc_id") +: sigs: _*)
      .select(col("doc_id"),
        md5(concat_ws(",", (0 until K / 2).map(j => col(s"s$j")): _*)).as("band0"),
        md5(concat_ws(",", (K / 2 until K).map(j => col(s"s$j")): _*)).as("band1"))
  }

  private[graft] def bandedDf(docs: DataFrame): DataFrame =
    sigDf(docs).select(col("doc_id"),
        explode(array(
          struct(lit(0).as("bid"), col("band0").as("bkey")),
          struct(lit(1).as("bid"), col("band1").as("bkey")))).as("bk"))
      .select(col("doc_id"), col("bk.bid").as("bid"), col("bk.bkey").as("bkey"))

  /** LSH candidate pairs (da < db) from shared band buckets — the ONLY
    * pair generator the dedup verifiers are allowed to use: every
    * pairwise measure (jaccard, edit distance) runs on this bounded set,
    * never on a coarse (lang, source)-blocked cross product that turns
    * quadratic when one bucket is the corpus. Single signature pass,
    * bucket-local pair fan-out, over-[[BandCap]] buckets skipped — so the
    * per-bucket work is ≤ cap² by construction, with AQE skew-splitting
    * handling the in-between sizes.
    */
  private[queries] def bandCandidates(docs: DataFrame): DataFrame =
    bandedDf(docs)
      .groupBy("bid", "bkey").agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")) <= BandCap)
      .select(explode(col("ds")).as("da"), col("ds"))
      .select(col("da"), explode(col("ds")).as("db"))
      .filter(col("da") < col("db"))
      .distinct()

  /** The candidate frame per corpus dir, materialized once: FOUR
    * declared verifiers (jaccard, edit distance, containment, cluster
    * propagation) consume the same candidate set, and each would
    * otherwise re-run the whole signature lineage (shingle → md5 →
    * K-min aggregate → banding). Persisted as a PARQUET ARTIFACT (the
    * same two-layer pattern as the IVF centroids / PQ codebooks): the
    * first caller builds and writes it, every later caller — in this JVM
    * or any other — reads the same materialized frame, so per-verifier
    * cost no longer depends on execution order. Unlike the centroids the
    * artifact stays DISTRIBUTED (a parquet scan, never collected): the
    * pair set is near-dup-scale, not constant-size, so it must not ride
    * the driver. `ArtifactStore.invalidate(dir)` drops both layers. */
  private val candCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  graft.ArtifactStore.onInvalidate(candCache.remove(_))

  private[queries] def bandCandidatesCached(docs: DataFrame, dir: String): DataFrame =
    candCache.computeIfAbsent(dir, _ => {
      val spark = docs.sparkSession
      val path = graft.ArtifactStore.pathFor(dir, "lsh-band-candidates")
      val (hfs, p) = graft.Topic.fs(spark, path)
      if (!hfs.exists(p))
        bandCandidates(docs).write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    })

  /** Capped band-candidate pairs WITH their signature agreement count:
    * (da, db, matches) — shared by dd_minhash_pairs (est = matches/K)
    * and dd_est_calibration (matches buckets vs exact Jaccard).
    *
    * Single-pass formulation: ONE signature aggregate, bands exploded to
    * (band_id, band_key) rows, bucket members gathered with collect_list
    * and pairs generated INSIDE each bucket — no self-join, so the
    * expensive shingle+md5+groupBy lineage runs exactly once (the
    * round-1 two-joins-of-two-sides plan ran it 4×). Over-BandCap
    * buckets are skipped (reported by dd_band_stats), so the per-bucket
    * collect_list + pair fan-out is ≤ cap² at any corpus scale; AQE
    * splits the skewed-but-under-cap reducers. `matches` is functionally
    * determined by the pair, so the dropDuplicates is deterministic. */
  /** estPairs per CORPUS (the tradeEdges pattern): dd_minhash_pairs and
    * dd_est_calibration each ran the signature+band+pair lineage before;
    * the candidate-bounded pair frame is now checkpointed once and both
    * read it. Evicted with the artifact store. */
  private val estPairsCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  graft.ArtifactStore.onInvalidate(estPairsCache.remove(_))

  private[queries] def estPairsCached(docs: DataFrame, dir: String): DataFrame =
    estPairsCache.computeIfAbsent(dir, _ => estPairs(docs).localCheckpoint(true))

  private[queries] def estPairs(docs: DataFrame): DataFrame = {
    val sig    = sigDf(docs)
    val member = struct(col("doc_id") +: (0 until K).map(j => col(s"s$j")): _*)
    val banded = sig.select(member.as("m"),
        explode(array(
          struct(lit(0).as("bid"), col("band0").as("bkey")),
          struct(lit(1).as("bid"), col("band1").as("bkey")))).as("bk"))
      .select(col("m"), col("bk.bid").as("bid"), col("bk.bkey").as("bkey"))
    val matches = (0 until K).map(j => when(col(s"a.s$j") === col(s"b.s$j"), 1).otherwise(0))
      .reduce(_ + _)
    banded
      .groupBy("bid", "bkey").agg(collect_list(col("m")).as("ms"))
      .filter(size(col("ms")) <= BandCap)
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
              matches.cast("int").as("matches"))
      .dropDuplicates("da", "db")
  }

  /** Shingle sets for CANDIDATE documents only: the verifiers' pair set
    * touches a tiny fraction of the corpus, so shingling every document
    * twice (once per join side) is pure waste — semi-join the docs down
    * to the ids appearing in any pair FIRST, then shingle. At 100 TB
    * this is the difference between re-tokenizing the corpus per
    * verifier and re-tokenizing only the near-dup set. (The DuckDB
    * oracles keep the unfiltered `t` CTE — the final equi-join makes
    * the results identical either way.) */
  private[queries] def candidateShingleSides(docs: DataFrame, cand: DataFrame)
      : (DataFrame, DataFrame) = {
    val ids = cand.select(col("da").as("doc_id"))
      .union(cand.select(col("db").as("doc_id"))).distinct()
    val t = docs.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shingleSet(col("text")).as("sh"))
    (t.select(col("doc_id").as("ta_id"), col("sh").as("a_sh")),
     t.select(col("doc_id").as("tb_id"), col("sh").as("b_sh")))
  }

  /** Per-band bucket sizes in DuckDB (defines `bsz(bid, bkey,
    * bucket_size)`); append after `banded`. */
  private[queries] val duckBszCte: String =
    """bsz AS (
      |  SELECT 0 AS bid, band0 AS bkey, COUNT(*) AS bucket_size FROM banded GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 1 AS bid, band1 AS bkey, COUNT(*) AS bucket_size FROM banded GROUP BY 1, 2)""".stripMargin

  /** The same capped candidate set in DuckDB (prefix with WITH; defines
    * `banded`, `bsz`, and `cand(da, db)`). */
  private[queries] lazy val duckCandCte: String =
    s"""$duckSigCte,
       |$duckBszCte,
       |cand AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db
       |  FROM banded a JOIN banded b ON a.band0 = b.band0 AND a.doc_id < b.doc_id
       |  JOIN bsz s0 ON s0.bid = 0 AND s0.bkey = a.band0
       |  WHERE s0.bucket_size <= $BandCap
       |  UNION
       |  SELECT a.doc_id AS da, b.doc_id AS db
       |  FROM banded a JOIN banded b ON a.band1 = b.band1 AND a.doc_id < b.doc_id
       |  JOIN bsz s1 ON s1.bid = 1 AND s1.bkey = a.band1
       |  WHERE s1.bucket_size <= $BandCap)""".stripMargin

  private[queries] val duckSigCte: String = {
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
    // The pair builder is shared with dd_est_calibration via estPairs.
    "dd_minhash_pairs" -> Q(
      s"""WITH $duckSigCte,
         |$duckBszCte,
         |pairs AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db,
         |         CAST((${(0 until K).map(j => s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END").mkString(" + ")})
         |              AS DOUBLE) / $K AS est_jaccard
         |  FROM banded a JOIN banded b ON a.band0 = b.band0 AND a.doc_id < b.doc_id
         |  JOIN bsz s0 ON s0.bid = 0 AND s0.bkey = a.band0
         |  WHERE s0.bucket_size <= $BandCap
         |  UNION
         |  SELECT a.doc_id AS da, b.doc_id AS db,
         |         CAST((${(0 until K).map(j => s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END").mkString(" + ")})
         |              AS DOUBLE) / $K AS est_jaccard
         |  FROM banded a JOIN banded b ON a.band1 = b.band1 AND a.doc_id < b.doc_id
         |  JOIN bsz s1 ON s1.bid = 1 AND s1.bkey = a.band1
         |  WHERE s1.bucket_size <= $BandCap)
         |SELECT da, db, est_jaccard FROM pairs ORDER BY da, db""".stripMargin) { (s, d) =>
      estPairsCached(Tables.documents(s, d), d)
        .select(col("da"), col("db"),
                (col("matches").cast("double") / K).as("est_jaccard"))
        .orderBy("da", "db")
    },

    // Sketch CALIBRATION: the accuracy report for the MinHash estimator —
    // candidate pairs bucketed by signature agreement (0..K matching
    // permutations), each bucket scored against the EXACT shingle
    // Jaccard. The per-bucket exact summary is the POOLED ratio
    // Σ|A∩B| / Σ|A∪B| (one integer division — bit-portable where a mean
    // of per-pair doubles is not) plus order-independent min/max. This
    // is how an operator decides whether K=8 permutations suffice for
    // the dedup threshold in use, the same observability role
    // ss_centroid_profile plays for the IVF index. Cost: the shared
    // estPairs build + two candidate-bounded equi-joins.
    "dd_est_calibration" -> Q(
      s"""WITH $duckSigCte,
         |$duckBszCte,
         |pairs AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db,
         |         CAST((${(0 until K).map(j => s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END").mkString(" + ")})
         |              AS INTEGER) AS matches
         |  FROM banded a JOIN banded b ON a.band0 = b.band0 AND a.doc_id < b.doc_id
         |  JOIN bsz s0 ON s0.bid = 0 AND s0.bkey = a.band0
         |  WHERE s0.bucket_size <= $BandCap
         |  UNION
         |  SELECT a.doc_id AS da, b.doc_id AS db,
         |         CAST((${(0 until K).map(j => s"CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END").mkString(" + ")})
         |              AS INTEGER) AS matches
         |  FROM banded a JOIN banded b ON a.band1 = b.band1 AND a.doc_id < b.doc_id
         |  JOIN bsz s1 ON s1.bid = 1 AND s1.bkey = a.band1
         |  WHERE s1.bucket_size <= $BandCap),
         |t AS (SELECT doc_id, $duckShingles AS sh FROM documents),
         |j AS (
         |  SELECT p.matches,
         |         CAST(len(list_intersect(ta.sh, tb.sh)) AS BIGINT) AS inter,
         |         CAST(len(list_distinct(list_concat(ta.sh, tb.sh))) AS BIGINT) AS uni
         |  FROM pairs p
         |  JOIN t ta ON p.da = ta.doc_id
         |  JOIN t tb ON p.db = tb.doc_id)
         |SELECT matches,
         |       CAST(matches AS DOUBLE) / CAST($K AS DOUBLE) AS est_jaccard,
         |       COUNT(*) AS n_pairs,
         |       CAST(CAST(SUM(inter) AS BIGINT) AS DOUBLE)
         |         / CAST(CAST(SUM(uni) AS BIGINT) AS DOUBLE) AS pooled_jaccard,
         |       MIN(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE)) AS min_exact,
         |       MAX(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE)) AS max_exact
         |FROM j GROUP BY matches ORDER BY matches""".stripMargin) { (s, d) =>
      val docs  = Tables.documents(s, d)
      val pairs = estPairsCached(docs, d)
      val (ta, tb) = candidateShingleSides(docs, pairs.select(col("da"), col("db")))
      pairs
        .join(ta, col("da") === col("ta_id"))
        .join(tb, col("db") === col("tb_id"))
        .select(col("matches"),
          size(array_intersect(col("a_sh"), col("b_sh"))).cast("long").as("inter"),
          size(array_union(col("a_sh"), col("b_sh"))).cast("long").as("uni"))
        .groupBy("matches")
        .agg(count(lit(1)).as("n_pairs"),
             (sum(col("inter")).cast("double") / sum(col("uni")).cast("double"))
               .as("pooled_jaccard"),
             min(col("inter").cast("double") / col("uni")).as("min_exact"),
             max(col("inter").cast("double") / col("uni")).as("max_exact"))
        .select(col("matches"),
                (col("matches").cast("double") / K).as("est_jaccard"),
                col("n_pairs"), col("pooled_jaccard"),
                col("min_exact"), col("max_exact"))
        .orderBy("matches")
    },

    // Band-bucket size distribution + the over-cap report: the out-of-band
    // companion to the enforced BandCap — at 100 TB this is the query an
    // operator runs to see how much "trivially duplicated" mass was
    // excluded from pairwise verification (over_cap=1 rows) and how the
    // candidate-pair budget distributes over bucket sizes. candidate_pairs
    // counts size·(size−1)/2 per bucket BEFORE the cap, so the over-cap
    // rows quantify exactly the work the cap avoided.
    "dd_band_stats" -> Q(
      s"""WITH $duckSigCte,
         |$duckBszCte
         |SELECT CAST(bucket_size AS INTEGER) AS bucket_size,
         |       COUNT(*) AS n_buckets,
         |       CAST(bucket_size * COUNT(*) AS BIGINT) AS total_members,
         |       CAST((bucket_size * (bucket_size - 1)) // 2 * COUNT(*) AS BIGINT) AS candidate_pairs,
         |       CAST(bucket_size > $BandCap AS INTEGER) AS over_cap
         |FROM bsz GROUP BY bucket_size ORDER BY bucket_size""".stripMargin) { (s, d) =>
      bandedDf(Tables.documents(s, d))
        .groupBy("bid", "bkey").agg(count(lit(1)).as("bucket_size"))
        .groupBy("bucket_size").agg(count(lit(1)).as("n_buckets"))
        .select(col("bucket_size").cast("int").as("bucket_size"),
                col("n_buckets"),
                (col("bucket_size") * col("n_buckets")).as("total_members"),
                (expr("bucket_size * (bucket_size - 1) div 2") * col("n_buckets"))
                  .as("candidate_pairs"),
                (col("bucket_size") > BandCap).cast("int").as("over_cap"))
        .orderBy("bucket_size")
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
      // one-pass kernel (round 10, functions/Shingles.scala): the
      // previous form materialized a per-token h16 array and ran 16
      // interpreted aggregate() bit-vote lambdas over it; the kernel
      // hashes each token's byte slice and votes all 16 bits in one
      // walk. Values identical (ShinglesSpec pins the vote fold).
      graft.functions.Shingles.register(s)
      // sort first, fold after (the q61 move: the ORDER BY's range
      // sampler executes a map-only child twice)
      Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy("doc_id")
        .select(col("doc_id"), call_function("graft_simhash", col("text")).as("st"))
        .select(col("doc_id"), col("st.simhash").as("simhash"),
                col("st.n_tokens").as("n_tokens"))
    },

    // Containment |A∩B|/|A| — the ASYMMETRIC near-dup measure Jaccard
    // misses: a short document quoted wholesale inside a long one has
    // low Jaccard (the union is large) but containment ≈ 1 from the
    // short side. Same band-candidate bounding as the other verifiers;
    // emitted both directions per pair.
    "dd_containment" -> Q(
      s"""WITH $duckCandCte,
         |t AS (SELECT doc_id, $duckShingles AS sh FROM documents)
         |SELECT c.da, c.db,
         |       CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE)
         |         / len(ta.sh) AS contain_a,
         |       CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE)
         |         / len(tb.sh) AS contain_b
         |FROM cand c
         |JOIN t ta ON c.da = ta.doc_id
         |JOIN t tb ON c.db = tb.doc_id
         |ORDER BY da, db""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = bandCandidatesCached(docs, d)
      val (ta, tb) = candidateShingleSides(docs, cand)
      cand
        .join(ta, col("da") === col("ta_id"))
        .join(tb, col("db") === col("tb_id"))
        .select(col("da"), col("db"),
          size(array_intersect(col("a_sh"), col("b_sh"))).as("inter"),
          size(col("a_sh")).as("na"), size(col("b_sh")).as("nb"))
        .select(col("da"), col("db"),
          (col("inter").cast("double") / col("na")).as("contain_a"),
          (col("inter").cast("double") / col("nb")).as("contain_b"))
        .orderBy("da", "db")
    },

    // n-gram (3-token shingle) Jaccard, verified ONLY on MinHash-band
    // candidates (`bandCandidates`): LSH proposes, exact Jaccard
    // disposes. The candidate set — not a (lang, source) block that goes
    // quadratic when one bucket is the whole corpus — bounds the pair
    // count at any scale; shingle sets meet the candidates in two
    // doc_id equi-joins.
    "dd_ngram_jaccard" -> Q(
      s"""WITH $duckCandCte,
         |t AS (SELECT doc_id, $duckShingles AS sh FROM documents)
         |SELECT c.da, c.db,
         |       CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE)
         |         / len(list_distinct(list_concat(ta.sh, tb.sh))) AS jaccard
         |FROM cand c
         |JOIN t ta ON c.da = ta.doc_id
         |JOIN t tb ON c.db = tb.doc_id
         |ORDER BY da, db""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = bandCandidatesCached(docs, d)
      val (ta, tb) = candidateShingleSides(docs, cand)
      cand
        .join(ta, col("da") === col("ta_id"))
        .join(tb, col("db") === col("tb_id"))
        .select(col("da"), col("db"),
          (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
           size(array_union(col("a_sh"), col("b_sh")))).as("jaccard"))
        .orderBy("da", "db")
    },

    // Dedup YIELD CURVE: the threshold-tuning report — candidate pairs
    // bucketed by Jaccard decile, so an operator picking the dedup
    // threshold sees how many pairs each setting would merge BEFORE
    // running the merge. Same candidate set and Jaccard arithmetic as
    // dd_ngram_jaccard (one more tiny aggregate over the verified
    // pairs); decile = floor(j·10) is one IEEE multiply+floor, and
    // min/max per decile are order-independent.
    "dd_jaccard_histogram" -> Q(
      s"""WITH $duckCandCte,
         |t AS (SELECT doc_id, $duckShingles AS sh FROM documents),
         |j AS (
         |  SELECT c.da, c.db,
         |         CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE)
         |           / len(list_distinct(list_concat(ta.sh, tb.sh))) AS jaccard
         |  FROM cand c
         |  JOIN t ta ON c.da = ta.doc_id
         |  JOIN t tb ON c.db = tb.doc_id)
         |SELECT CAST(least(9, CAST(floor(jaccard * 10) AS BIGINT)) AS INTEGER) AS decile,
         |       COUNT(*) AS n_pairs,
         |       MIN(jaccard) AS min_jaccard, MAX(jaccard) AS max_jaccard
         |FROM j GROUP BY decile ORDER BY decile""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = bandCandidatesCached(docs, d)
      val (ta, tb) = candidateShingleSides(docs, cand)
      cand
        .join(ta, col("da") === col("ta_id"))
        .join(tb, col("db") === col("tb_id"))
        .select((size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
                 size(array_union(col("a_sh"), col("b_sh")))).as("jaccard"))
        .groupBy(least(lit(9L), floor(col("jaccard") * 10).cast("long")).cast("int")
                   .as("decile"))
        .agg(count(lit(1)).as("n_pairs"),
             min(col("jaccard")).as("min_jaccard"),
             max(col("jaccard")).as("max_jaccard"))
        .orderBy("decile")
    },

    // LSH banding PARAMETER TUNING: the S-curve detection probability
    // P(s) = 1 − (1 − s^r)^b evaluated at each observed Jaccard decile's
    // midpoint for three (b,r) splits of the K=8 signature — the report
    // that decides whether to rebands before a full-corpus dedup run
    // (current config b=2·r=4 vs the higher-recall b=4·r=2 / b=8·r=1).
    // Every power is UNROLLED to stated IEEE squarings/multiplies on a
    // per-decile constant (never a pow() library call, whose libm vs
    // StrictMath results differ in the last ulp), so even the double
    // columns hash-match the oracle. Scale shape: one tiny aggregate
    // over the already-bounded verified-pair set; the curve arithmetic
    // runs on ≤10 rows.
    "dd_band_tune" -> Q(
      s"""WITH $duckCandCte,
         |t AS (SELECT doc_id, $duckShingles AS sh FROM documents),
         |j AS (
         |  SELECT CAST(least(9, CAST(floor(
         |           CAST(len(list_intersect(ta.sh, tb.sh)) AS DOUBLE)
         |             / len(list_distinct(list_concat(ta.sh, tb.sh))) * 10)
         |           AS BIGINT)) AS INTEGER) AS decile
         |  FROM cand c
         |  JOIN t ta ON c.da = ta.doc_id
         |  JOIN t tb ON c.db = tb.doc_id),
         |h AS (SELECT decile, COUNT(*) AS n_pairs FROM j GROUP BY decile),
         |m AS (SELECT *, (CAST(decile AS DOUBLE) + 0.5) / 10.0 AS s_mid FROM h),
         |p AS (
         |  SELECT decile, n_pairs, s_mid,
         |         (s_mid * s_mid) * (s_mid * s_mid) AS s4,
         |         s_mid * s_mid AS s2
         |  FROM m)
         |SELECT decile, CAST(n_pairs AS BIGINT) AS n_pairs, s_mid,
         |       1.0 - (1.0 - s4) * (1.0 - s4) AS p_b2r4,
         |       1.0 - ((1.0 - s2) * (1.0 - s2)) * ((1.0 - s2) * (1.0 - s2)) AS p_b4r2,
         |       1.0 - (((1.0 - s_mid) * (1.0 - s_mid)) * ((1.0 - s_mid) * (1.0 - s_mid)))
         |           * (((1.0 - s_mid) * (1.0 - s_mid)) * ((1.0 - s_mid) * (1.0 - s_mid)))
         |         AS p_b8r1
         |FROM p ORDER BY decile""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cand = bandCandidatesCached(docs, d)
      val (ta, tb) = candidateShingleSides(docs, cand)
      val h = cand
        .join(ta, col("da") === col("ta_id"))
        .join(tb, col("db") === col("tb_id"))
        .select((size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
                 size(array_union(col("a_sh"), col("b_sh")))).as("jaccard"))
        .groupBy(least(lit(9L), floor(col("jaccard") * 10).cast("long")).cast("int")
                   .as("decile"))
        .agg(count(lit(1)).as("n_pairs"))
      val sMid = (col("decile").cast("double") + lit(0.5)) / lit(10.0)
      val s2   = col("s_mid") * col("s_mid")
      val s4   = (col("s_mid") * col("s_mid")) * (col("s_mid") * col("s_mid"))
      val u    = lit(1.0) - col("s_mid")
      h.withColumn("s_mid", sMid)
        .select(col("decile"), col("n_pairs"), col("s_mid"),
          (lit(1.0) - (lit(1.0) - s4) * (lit(1.0) - s4)).as("p_b2r4"),
          (lit(1.0) - ((lit(1.0) - s2) * (lit(1.0) - s2)) *
                      ((lit(1.0) - s2) * (lit(1.0) - s2))).as("p_b4r2"),
          (lit(1.0) - ((u * u) * (u * u)) * ((u * u) * (u * u))).as("p_b8r1"))
        .orderBy("decile")
    },

    // Sorted-neighborhood blocking — the SECOND blocking family next to
    // LSH banding (classic entity-resolution method: sort by a
    // similarity-preserving key, compare only rank-adjacent records).
    // Ranking is PARTITIONED by lang (never a global sort; at corpus
    // scale the partition key widens to (lang, key-prefix) ranges), and
    // the w=3 neighborhood meets in an EQUI-join — each record explodes
    // its 3 successor ranks, so there is no theta join and the pair
    // count is exactly w·n. Near-identical docs sort adjacent on the
    // normalized 40-char head, so the window catches them with w·n
    // comparisons where LSH needs K hashes/doc — the classic
    // recall-vs-cost alternative; emitted with verify-stage Jaccard.
    "dd_sorted_neighborhood" -> Q(
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |         substring(regexp_replace(text, '[^a-z ]', '', 'g'), 1, 40) AS head,
         |         $duckShingles AS sh
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang, sh,
         |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY head, doc_id) AS rn
         |  FROM t),
         |cand AS (
         |  SELECT a.lang AS lang, a.doc_id AS da, b.doc_id AS db,
         |         CAST(b.rn - a.rn AS INTEGER) AS rank_gap,
         |         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |           / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         |  FROM r a JOIN r b ON a.lang = b.lang AND b.rn - a.rn BETWEEN 1 AND 3)
         |SELECT lang, da, db, rank_gap, jaccard
         |FROM cand ORDER BY lang, da, db""".stripMargin) { (s, d) =>
      // Decide pairs on NARROW rows, attach the heavy shingle arrays
      // once (guide §8). The ranking window sees only (doc_id, lang,
      // head) — the per-lang funnel (≤ |langs| tasks, unavoidable for a
      // global per-lang rank) now moves ~50 bytes/row instead of the
      // arrays; rank-adjacency comes from LEAD(doc_id, k) in the same
      // window (no self-join), and the w=3 pair stream stays narrow
      // until the two doc-keyed joins attach sh. The shingle dimension
      // is repartitioned BY ITS JOIN KEY at the session's shuffle width,
      // so the kernel runs full-width on every core (the single-file
      // test corpus would otherwise compute it on 1–8 scan tasks) and
      // the exchange it pays is the join's own, reused across both
      // sides — the round-9 form shuffled the arrays through the window
      // AND both sides of a ×3-exploded rank join.
      val nSh = s.conf.get("spark.sql.shuffle.partitions").toInt
      val dim = Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .repartition(nSh, col("doc_id"))
        .select(col("doc_id"), shingleSet(col("text")).as("sh"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("head"), col("doc_id"))
      def nb(k: Int) = struct(
        lit(k).as("off"), lead(col("doc_id"), k).over(w).as("db"))
      val pairs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
                substring(regexp_replace(col("text"), "[^a-z ]", ""), 1, 40).as("head"))
        .select(col("lang"), col("doc_id").as("da"),
                array(nb(1), nb(2), nb(3)).as("nbs"))
        .select(col("lang"), col("da"), explode(col("nbs")).as("st"))
        .filter(col("st.db").isNotNull)
        .select(col("lang"), col("da"), col("st.db").as("db"),
                col("st.off").cast("int").as("rank_gap"))
      pairs
        .join(dim.select(col("doc_id").as("a_id"), col("sh").as("sha")),
              col("da") === col("a_id"))
        .join(dim.select(col("doc_id").as("b_id"), col("sh").as("shb")),
              col("db") === col("b_id"))
        .select(col("lang"), col("da"), col("db"), col("rank_gap"),
                (size(array_intersect(col("sha"), col("shb"))).cast("double") /
                 size(array_union(col("sha"), col("shb")))).as("jaccard"))
        .orderBy("lang", "da", "db")
    }
  )
}
