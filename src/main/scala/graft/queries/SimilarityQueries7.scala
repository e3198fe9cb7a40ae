package graft.queries

import graft.{Q, Tables}
import graft.functions.FloatDot
import graft.functions.Vectors.{duckCosine, nativeDot, nativeNorm}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventh similarity batch — the two COMPRESSED-FIRST-PASS retrieval
  * shapes production vector search actually deploys in front of exact
  * scoring:
  *
  *  - `ss_rerank_int8`: two-stage retrieval — a cheap INTEGER dot over
  *    trained int8 codes prunes the corpus to R candidates per query,
  *    then exact fp32 cosine re-ranks only those. The int8 scan reads
  *    8× less than fp32; the exact math touches R rows, not N.
  *  - `ss_binary_hamming`: 1-bit (sign) quantization — each 64-dim
  *    vector packs to TWO 32-bit words, candidates rank by XOR-popcount
  *    Hamming distance. 32× compression; distance is 2 xors + 2
  *    popcounts, no floating point at all in the scan.
  *
  * Reference note: the cascade reference stores opaque event payloads
  * (/root/reference/src/broker/main.rs:53) and has no vector surface;
  * these are the retrieval operators its consumers would bolt on, in
  * the preference order a 100 TB corpus forces (bit/byte codes scan,
  * floats only rerank).
  *
  * Scale shape (both): stage 1 shuffles only narrow (qid, vec_id,
  * score) triples — embeddings NEVER ride the candidate shuffle; the
  * stage-2 equi-join back to the corpus is candidate-bounded (R·|q|
  * rows). The int8 codes derive from the same trained per-dim quantizer
  * as ss_quantize_int8 (collected DIM-row artifact, re-entering as
  * literals), so stage-1 scores are EXACT BIGINTs in both engines and
  * the whole pipeline hash-matches the oracle.
  */
object SimilarityQueries7 {

  private val DIM = 64
  /** Stage-1 candidate width: how many int8 survivors get exact rerank. */
  private val R = 50

  /** Centered int8 code array from the trained per-dim quantizer —
    * shared by ss_rerank_int8 and ss_compressed_recall so the code
    * definition cannot drift. A STATELESS expression (quantizer enters
    * as literals), so it applies unchanged to a streaming frame — the
    * VectorIngestStream contract; CompressedRetrievalSpec proves
    * streamed codes ≡ batch codes. */
  private[graft] def int8Codes(s: org.apache.spark.sql.SparkSession, d: String) = {
    val stats = SimilarityQueries2.quantStats(Tables.embeddings(s, d), d)
    val mns = array(stats.map { case (mn, _) => lit(mn) }: _*)
    val scs = array(stats.map { case (_, sc) => lit(sc) }: _*)
    transform(col("embedding"), (x, i) => {
      val mn = element_at(mns, i + 1)
      val sc = element_at(scs, i + 1)
      // clamp BOTH ends: a streamed vector can land below the trained
      // per-dim min, and floor((x−mn)/sc) would escape int8 range
      (when(sc === 0, lit(0.0))
        .otherwise(greatest(least(floor((x.cast("double") - mn) / sc), lit(255.0)),
                            lit(0.0)))
        .cast("long") - 128L)
    })
  }

  /** DuckDB twin of [[int8Codes]] (stats + arrs + codes CTE chain). */
  private def duckCodes: String =
    s"""stats AS (
       |  SELECT j, MIN(CAST(embedding[j] AS DOUBLE)) AS mn,
       |         MAX(CAST(embedding[j] AS DOUBLE)) AS mx
       |  FROM embeddings, range(1, ${DIM + 1}) t(j) GROUP BY j),
       |arrs AS (
       |  SELECT list(mn ORDER BY j) AS mns,
       |         list((mx - mn) / CAST(255 AS DOUBLE) ORDER BY j) AS scs
       |  FROM stats),
       |codes AS (
       |  SELECT vec_id, label,
       |         [CAST(CASE WHEN scs[i] = 0 THEN 0
       |                    ELSE greatest(least(floor((CAST(embedding[i] AS DOUBLE) - mns[i]) / scs[i]),
       |                                        CAST(255 AS DOUBLE)), CAST(0 AS DOUBLE)) END
       |               AS BIGINT) - 128
       |          for i in range(1, ${DIM + 1})] AS c
       |  FROM embeddings, arrs)""".stripMargin

  /** Sign-bit word packers — shared by ss_binary_hamming and
    * ss_compressed_recall. */
  private def word(from: Int, until: Int, shiftBase: Int) =
    expr(s"""aggregate(
            |  zip_with(slice(embedding, $from, ${until - from + 1}),
            |           sequence(${from - shiftBase}, ${until - shiftBase}),
            |           (x, i) -> CASE WHEN x >= 0 THEN shiftleft(CAST(1 AS BIGINT), i)
            |                     ELSE CAST(0 AS BIGINT) END),
            |  0L, (a, v) -> a + v)""".stripMargin)

  private def duckPk: String =
    s"""pk AS (
       |  SELECT vec_id, label, embedding,
       |         CAST(list_sum([CASE WHEN embedding[i] >= 0
       |                        THEN CAST(1 AS BIGINT) << (i - 1) ELSE 0 END
       |                        for i in range(1, 33)]) AS BIGINT) AS lo,
       |         CAST(list_sum([CASE WHEN embedding[i] >= 0
       |                        THEN CAST(1 AS BIGINT) << (i - 33) ELSE 0 END
       |                        for i in range(33, ${DIM + 1})]) AS BIGINT) AS hi
       |  FROM embeddings)""".stripMargin

  def defs: Map[String, Q] = Map(

    // Two-stage int8 → fp32 retrieval. code_j = clamp(floor((x_j−mn_j)/
    // sc_j), 255) (the ss_quantize_int8 trained quantizer), stage-1
    // score = Σ (code−128)(qcode−128) — a centered integer dot, exact
    // BIGINT. Top-R survivors per query (deterministic tiebreak) join
    // back to the corpus for exact cosine; final output is the exact
    // top-5 with the stage-1 rank alongside — s1_rank ≠ rank rows are
    // exactly the re-orderings the fp32 pass exists to fix.
    "ss_rerank_int8" -> Q(
      s"""WITH $duckCodes,
         |q AS (SELECT vec_id AS qid, c AS qc FROM codes WHERE vec_id < 10),
         |s1 AS (
         |  SELECT q.qid, e.vec_id,
         |         CAST(list_sum([e.c[i] * q.qc[i] for i in range(1, ${DIM + 1})]) AS BIGINT) AS s1
         |  FROM codes e, q WHERE e.vec_id <> q.qid),
         |r1 AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s1 DESC, vec_id) AS s1_rank
         |  FROM s1),
         |cand AS (SELECT * FROM r1 WHERE s1_rank <= $R),
         |rr AS (
         |  SELECT cand.qid, cand.vec_id, cand.s1, cand.s1_rank, e.label,
         |         ${duckCosine("e.embedding", "qe.embedding")} AS cosine
         |  FROM cand JOIN embeddings e ON e.vec_id = cand.vec_id
         |            JOIN embeddings qe ON qe.vec_id = cand.qid),
         |r2 AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
         |  FROM rr)
         |SELECT qid, vec_id, label, s1, CAST(s1_rank AS INTEGER) AS s1_rank,
         |       cosine, CAST(rank AS INTEGER) AS rank
         |FROM r2 WHERE rank <= 5 ORDER BY qid, rank""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val codes = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), col("embedding"), int8Codes(s, d).as("c"))
      val q = codes.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("c").as("qc"))
      // stage 1: narrow triples only — c/qc are consumed by the fold,
      // embeddings never enter this shuffle
      val w1 = Window.partitionBy(col("qid")).orderBy(col("s1").desc, col("vec_id"))
      val cand = codes.select(col("vec_id"), col("c"))
        .crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
                expr("aggregate(zip_with(c, qc, (a, b) -> a * b), 0L, (a, x) -> a + x)").as("s1"))
        .withColumn("s1_rank", row_number().over(w1))
        .filter(col("s1_rank") <= R)
      // stage 2: candidate-bounded exact rerank — norms too are computed
      // AFTER the join, so the only corpus-wide float work is stage 1's
      // integer fold (no N-row norm pass hiding in the plan)
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"), col("embedding"))
      val qe = Tables.embeddings(s, d).filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
                nativeNorm(col("embedding")).as("qnrm"))
      val w2 = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
      cand.join(e, "vec_id").join(broadcast(qe), "qid")
        .select(col("qid"), col("vec_id"), col("label"), col("s1"),
                col("s1_rank").cast("int").as("s1_rank"),
                (nativeDot(col("embedding"), col("qv")) /
                  (nativeNorm(col("embedding")) * col("qnrm"))).as("cosine"))
        .withColumn("rank", row_number().over(w2).cast("int"))
        .filter(col("rank") <= 5)
        .orderBy("qid", "rank")
    },

    // Binary (sign-bit) quantization + Hamming scan: 64 dims → two
    // 32-bit words (lo = dims 1..32, hi = 33..64; two words because a
    // 1<<63 BIGINT shift overflows portably), distance = popcount(lo⊕lo')
    // + popcount(hi⊕hi'). Top-5 per query by (hamming asc, vec_id), with
    // exact cosine alongside as the quality read. The scan does NO float
    // math and moves 8 bytes/vector — the cheapest first-pass filter a
    // vector store owns; its survivors feed the same rerank join as
    // ss_rerank_int8's stage 2.
    "ss_binary_hamming" -> Q(
      s"""WITH $duckPk,
         |q AS (SELECT vec_id AS qid, embedding AS qv, lo AS qlo, hi AS qhi
         |      FROM pk WHERE vec_id < 10),
         |s1 AS (
         |  SELECT q.qid, e.vec_id, e.label,
         |         CAST(bit_count(xor(e.lo, q.qlo)) + bit_count(xor(e.hi, q.qhi)) AS BIGINT)
         |           AS hamming,
         |         ${duckCosine("e.embedding", "q.qv")} AS cosine
         |  FROM pk e, q WHERE e.vec_id <> q.qid),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY hamming, vec_id) AS rank
         |  FROM s1)
         |SELECT qid, vec_id, label, hamming, cosine, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      // the scan really is float-free: only (vec_id, label, lo, hi)
      // enter the pair stage, cosine is computed on the ≤ 5·|q|
      // survivors after a join back to the corpus
      val pk = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), word(1, 32, 1).as("lo"),
                word(33, DIM, 33).as("hi"))
      val q = pk.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("lo").as("qlo"), col("hi").as("qhi"))
      val w = Window.partitionBy(col("qid")).orderBy(col("hamming"), col("vec_id"))
      val cand = pk.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), col("label"),
                (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
                 bit_count(col("hi").bitwiseXOR(col("qhi")))).cast("long").as("hamming"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 5)
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val qe = Tables.embeddings(s, d).filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
                nativeNorm(col("embedding")).as("qnrm"))
      cand.join(e, "vec_id").join(broadcast(qe), "qid")
        .select(col("qid"), col("vec_id"), col("label"), col("hamming"),
                (nativeDot(col("embedding"), col("qv")) /
                  (nativeNorm(col("embedding")) * col("qnrm"))).as("cosine"),
                col("rank"))
        .orderBy("qid", "rank")
    },

    // Recall@k of the two COMPRESSED rankings against exact cosine —
    // the compression/quality tradeoff table. For k ∈ {1,5,10}: hits =
    // |top-k_method ∩ top-k_exact| summed over the 10 anchors, recall
    // in integer bp. Rankings are fully deterministic (score desc /
    // distance asc, vec_id tiebreak), intersections are equi-joins on
    // (qid, vec_id) between rank-bounded sets — every set is ≤ 10·k
    // rows, so the comparison stage is constant-size no matter the
    // corpus; the only corpus-scale work is the three scans themselves.
    "ss_compressed_recall" -> Q(
      s"""WITH $duckCodes,
         |$duckPk,
         |qe AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
         |exact AS (
         |  SELECT qe.qid, e.vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY qe.qid
         |           ORDER BY ${duckCosine("e.embedding", "qe.qv")} DESC, e.vec_id) AS rank
         |  FROM embeddings e, qe WHERE e.vec_id <> qe.qid),
         |qc AS (SELECT vec_id AS qid, c AS qc FROM codes WHERE vec_id < 10),
         |m_int8 AS (
         |  SELECT qc.qid, e.vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY qc.qid
         |           ORDER BY list_sum([e.c[i] * qc.qc[i] for i in range(1, ${DIM + 1})]) DESC,
         |                    e.vec_id) AS rank
         |  FROM codes e, qc WHERE e.vec_id <> qc.qid),
         |qb AS (SELECT vec_id AS qid, lo AS qlo, hi AS qhi FROM pk WHERE vec_id < 10),
         |m_bin AS (
         |  SELECT qb.qid, e.vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY qb.qid
         |           ORDER BY bit_count(xor(e.lo, qb.qlo)) + bit_count(xor(e.hi, qb.qhi)),
         |                    e.vec_id) AS rank
         |  FROM pk e, qb WHERE e.vec_id <> qb.qid),
         |meth AS (
         |  SELECT 'int8' AS method, qid, vec_id, rank FROM m_int8
         |  UNION ALL SELECT 'binary', qid, vec_id, rank FROM m_bin),
         |ks AS (SELECT * FROM (VALUES (1),(5),(10)) t(k)),
         |hits AS (
         |  SELECT m.method, ks.k, CAST(COUNT(*) AS BIGINT) AS hits
         |  FROM meth m JOIN ks ON m.rank <= ks.k
         |       JOIN exact x ON x.qid = m.qid AND x.vec_id = m.vec_id AND x.rank <= ks.k
         |  GROUP BY 1, 2),
         |grid AS (SELECT mm.method, ks.k
         |         FROM (VALUES ('int8'),('binary')) mm(method) CROSS JOIN ks)
         |SELECT g.method, g.k, CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
         |       CAST(10 * g.k AS BIGINT) AS possible,
         |       CAST((COALESCE(h.hits, 0) * 10000) // (10 * g.k) AS BIGINT) AS recall_bp
         |FROM grid g LEFT JOIN hits h ON h.method = g.method AND h.k = g.k
         |ORDER BY g.method, g.k""".stripMargin) { (s, d) =>
      FloatDot.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", nativeNorm(col("embedding")))
      val qe = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nrm").as("qnrm"))
      val exact = e.crossJoin(broadcast(qe)).filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
                (nativeDot(col("embedding"), col("qv")) / (col("nrm") * col("qnrm"))).as("sc"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("sc").desc, col("vec_id"))))
        .filter(col("rank") <= 10).select("qid", "vec_id", "rank")

      val codes = Tables.embeddings(s, d).select(col("vec_id"), int8Codes(s, d).as("c"))
      val qc = codes.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("c").as("qc"))
      val mInt8 = codes.crossJoin(broadcast(qc)).filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
                expr("aggregate(zip_with(c, qc, (a, b) -> a * b), 0L, (a, x) -> a + x)").as("sc"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("sc").desc, col("vec_id"))))
        .filter(col("rank") <= 10)

      val pk = Tables.embeddings(s, d)
        .withColumn("lo", word(1, 32, 1)).withColumn("hi", word(33, DIM, 33))
      val qb = pk.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("lo").as("qlo"), col("hi").as("qhi"))
      val mBin = pk.crossJoin(broadcast(qb)).filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
                (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
                 bit_count(col("hi").bitwiseXOR(col("qhi")))).as("dist"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("dist"), col("vec_id"))))
        .filter(col("rank") <= 10)

      val meth = mInt8.select(lit("int8").as("method"), col("qid"), col("vec_id"), col("rank"))
        .unionByName(mBin.select(lit("binary").as("method"), col("qid"), col("vec_id"), col("rank")))
      val ks = { import s.implicits._; broadcast(Seq(1, 5, 10).toDF("k")) }
      val grid = { import s.implicits._
        broadcast(Seq("int8", "binary").toDF("method").crossJoin(ks)) }
      val hits = meth.join(ks, col("rank") <= col("k"))
        .join(exact.withColumnRenamed("rank", "xrank"), Seq("qid", "vec_id"))
        .filter(col("xrank") <= col("k"))
        .groupBy("method", "k")
        .agg(count(lit(1)).as("hits"))
      // zero-hit cells must still report (binary@1 IS zero at sf0.001)
      grid.join(hits, Seq("method", "k"), "left")
        .select(col("method"), col("k"),
                coalesce(col("hits"), lit(0L)).as("hits"),
                (lit(10L) * col("k")).as("possible"),
                expr("(coalesce(hits, 0) * 10000) div (10 * k)").as("recall_bp"))
        .orderBy("method", "k")
    }
  )
}
