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
      // dedup (flag, hv) FIRST in a plain codegen HashAggregate, then
      // aggregate the deduped stream: mixing the KMV object aggregate
      // with COUNT(DISTINCT hv) planned a four-level ObjectHashAggregate
      // chain whose partial keyed (flag, hv) ran the interpreted sketch
      // update once per RAW row (60M at sf10, 20.8 s); over the distinct
      // stream the sketch sees each hash once and exact_distinct is a
      // plain COUNT (same values — KMV is duplicate-insensitive, and the
      // distinct is over the HASH so the comparison column still means
      // the oracle's nd-over-distinct-hv even under an astronomically
      // rare h60 collision).
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
                Portable.h60(col("l_partkey").cast("string")).as("hv"))
        .distinct()
        .groupBy("l_returnflag")
        .agg(call_function("kmv_distinct", col("hv")).as("kmv_estimate"),
             count(lit(1)).as("exact_distinct"))
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
    },

    // Theta-style SET OPERATIONS over KMV k-min sketches — the sketch
    // algebra that answers "how many users do these two event types
    // share" without ever joining raw id sets: per type keep the k=64
    // smallest h60 hashes; intersection estimate = |k-set overlap below
    // θ| · 2^60/θ with θ = min of the two type thresholds; union
    // estimate = (k−1)·2^60/θᵤ from the merged k-set. Sets smaller than
    // k degrade to EXACT (θ = 2^60 makes the estimator collapse to the
    // overlap count — the fixtures exercise both regimes across scale
    // factors). The exact intersection rides along as the verification
    // companion (it is precisely the raw-id join the sketch exists to
    // avoid at scale — a deployment keeps the sketches). All integer
    // until the two divisions; 2^60 is a power of two, so full-set
    // estimates are bit-exact equal to the exact counts.
    "el_theta_sketch_ops" -> Q(
      s"""WITH uh AS (
         |  SELECT DISTINCT event_type, ${duckH("CAST(user_id AS VARCHAR)", 15)} AS hv
         |  FROM events),
         |rk AS (
         |  SELECT event_type, hv,
         |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
         |         COUNT(*) OVER (PARTITION BY event_type) AS nd
         |  FROM uh),
         |sk AS (SELECT event_type, hv, rn, nd FROM rk WHERE rn <= $K),
         |th AS (
         |  SELECT event_type,
         |         CASE WHEN MIN(nd) >= $K THEN MAX(CASE WHEN rn = $K THEN hv END)
         |              ELSE 1152921504606846976 END AS theta,
         |         CAST(MIN(nd) AS BIGINT) AS nd
         |  FROM sk GROUP BY event_type),
         |pairs AS (
         |  SELECT a.event_type AS ta, b.event_type AS tb,
         |         least(a.theta, b.theta) AS theta, a.nd AS nda, b.nd AS ndb
         |  FROM th a JOIN th b ON a.event_type < b.event_type),
         |pm AS (
         |  SELECT p.ta, p.tb, COUNT(*) AS k_overlap
         |  FROM pairs p
         |  JOIN sk x ON x.event_type = p.ta AND x.hv < p.theta
         |  JOIN sk y ON y.event_type = p.tb AND y.hv = x.hv
         |  GROUP BY p.ta, p.tb),
         |upart AS (
         |  SELECT p.ta, p.tb, s.hv FROM pairs p JOIN sk s ON s.event_type = p.ta
         |  UNION
         |  SELECT p.ta, p.tb, s.hv FROM pairs p JOIN sk s ON s.event_type = p.tb),
         |urk AS (
         |  SELECT ta, tb, hv,
         |         ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY hv) AS rn,
         |         COUNT(*) OVER (PARTITION BY ta, tb) AS nu
         |  FROM upart),
         |uth AS (
         |  SELECT ta, tb, MAX(CASE WHEN rn = $K THEN hv END) AS theta_u,
         |         CAST(MIN(nu) AS BIGINT) AS nu
         |  FROM urk GROUP BY ta, tb),
         |ex AS (
         |  SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS exact_inter
         |  FROM uh a JOIN uh b ON a.hv = b.hv AND a.event_type < b.event_type
         |  GROUP BY ta, tb)
         |SELECT p.ta, p.tb,
         |       CAST(coalesce(m.k_overlap, 0) AS BIGINT) AS k_overlap,
         |       CAST(coalesce(m.k_overlap, 0) AS DOUBLE)
         |         * CAST(1152921504606846976 AS DOUBLE)
         |         / CAST(p.theta AS DOUBLE) AS inter_est,
         |       CASE WHEN u.nu >= $K
         |            THEN CAST(${K - 1} AS DOUBLE)
         |                 * CAST(1152921504606846976 AS DOUBLE)
         |                 / CAST(u.theta_u AS DOUBLE)
         |            ELSE CAST(u.nu AS DOUBLE) END AS union_est,
         |       CAST(coalesce(e.exact_inter, 0) AS BIGINT) AS exact_inter,
         |       p.nda + p.ndb - coalesce(e.exact_inter, 0) AS exact_union
         |FROM pairs p
         |JOIN uth u ON p.ta = u.ta AND p.tb = u.tb
         |LEFT JOIN pm m ON p.ta = m.ta AND p.tb = m.tb
         |LEFT JOIN ex e ON p.ta = e.ta AND p.tb = e.tb
         |ORDER BY p.ta, p.tb""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val two60 = 1152921504606846976L
      val uh = Tables.events(s, d)
        .select(col("event_type"), Portable.h60(col("user_id")).as("hv"))
        .distinct()
        .localCheckpoint(true) // feeds the sketches AND the exact companion
      val rk = uh
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("hv")))
        .withColumn("nd", count(lit(1)).over(Window.partitionBy("event_type")))
      val sk = rk.filter(col("rn") <= K)
      val th = sk.groupBy("event_type")
        .agg(when(min(col("nd")) >= K, max(when(col("rn") === K, col("hv"))))
               .otherwise(lit(two60)).as("theta"),
             min(col("nd")).as("nd"))
      val a = th.select(col("event_type").as("ta"), col("theta").as("tha"),
                        col("nd").as("nda"))
      val b = th.select(col("event_type").as("tb"), col("theta").as("thb"),
                        col("nd").as("ndb"))
      val pairs = a.join(broadcast(b), col("ta") < col("tb")) // |types|² dim — broadcast BNL, never a shuffled cartesian
        .select(col("ta"), col("tb"), least(col("tha"), col("thb")).as("theta"),
                col("nda"), col("ndb"))
      val ska = sk.select(col("event_type").as("sa_t"), col("hv").as("sa_hv"))
      val skb = sk.select(col("event_type").as("sb_t"), col("hv").as("sb_hv"))
      val pm = pairs
        .join(ska, col("sa_t") === col("ta") && col("sa_hv") < col("theta"))
        .join(skb, col("sb_t") === col("tb") && col("sb_hv") === col("sa_hv"))
        .groupBy(col("ta").as("m_ta"), col("tb").as("m_tb"))
        .agg(count(lit(1)).as("k_overlap"))
      val upart = pairs.join(ska, col("sa_t") === col("ta"))
        .select(col("ta"), col("tb"), col("sa_hv").as("uhv"))
        .union(pairs.join(skb, col("sb_t") === col("tb"))
          .select(col("ta"), col("tb"), col("sb_hv").as("uhv")))
        .distinct()
      val uth = upart
        .withColumn("rn", row_number().over(
          Window.partitionBy("ta", "tb").orderBy("uhv")))
        .withColumn("nu", count(lit(1)).over(Window.partitionBy("ta", "tb")))
        .groupBy(col("ta").as("u_ta"), col("tb").as("u_tb"))
        .agg(max(when(col("rn") === K, col("uhv"))).as("theta_u"),
             min(col("nu")).as("nu"))
      val ea = uh.select(col("event_type").as("ea_t"), col("hv").as("ea_hv"))
      val eb = uh.select(col("event_type").as("eb_t"), col("hv").as("eb_hv"))
      val ex = ea.join(eb, col("ea_hv") === col("eb_hv") && col("ea_t") < col("eb_t"))
        .groupBy(col("ea_t").as("e_ta"), col("eb_t").as("e_tb"))
        .agg(count(lit(1)).as("exact_inter"))
      pairs
        .join(uth, col("ta") === col("u_ta") && col("tb") === col("u_tb"))
        .join(pm, col("ta") === col("m_ta") && col("tb") === col("m_tb"), "left")
        .join(ex, col("ta") === col("e_ta") && col("tb") === col("e_tb"), "left")
        .select(col("ta"), col("tb"),
          coalesce(col("k_overlap"), lit(0L)).as("k_overlap"),
          (coalesce(col("k_overlap"), lit(0L)).cast("double")
            * lit(two60).cast("double") / col("theta").cast("double")).as("inter_est"),
          when(col("nu") >= K,
               lit(K - 1).cast("double") * lit(two60).cast("double")
                 / col("theta_u").cast("double"))
            .otherwise(col("nu").cast("double")).as("union_est"),
          coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
          (col("nda") + col("ndb") - coalesce(col("exact_inter"), lit(0L)))
            .as("exact_union"))
        .orderBy("ta", "tb")
    }
  )
}
