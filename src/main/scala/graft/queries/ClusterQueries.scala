package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-CLUSTER assignment — the pipeline stage between candidate
  * pairs and canonical dedup: near-dup pairs are edges, and every
  * document in a connected component gets the component's minimum doc_id
  * as its cluster id (the canonical representative). A training-data
  * pipeline needs this step because near-duplication is transitive in
  * effect but the pair list is not: A~B and B~C must dedup as ONE group
  * of three, not two independent pairs.
  *
  * Spark-first shape: iterative min-label propagation over the edge
  * list — the standard distributed connected-components loop (each round
  * is one equi-join + min-aggregate, both shuffle-lean; rounds needed =
  * component diameter, tiny for near-dup clusters). Each round is
  * materialized with an eager checkpoint — local by default, RELIABLE
  * when `spark.graft.checkpointDir` is set (see [[materialize]]) — the
  * canonical lineage truncation for iterative algorithms (without it,
  * round k re-executes rounds 1..k-1 and plan depth grows unboundedly).
  * Convergence is
  * detected by the label-sum fixpoint — labels only ever decrease, so an
  * unchanged sum means no label moved; the driver sees ONE long per
  * round, never row data.
  *
  * The oracle states the same semantics declaratively: a recursive CTE
  * enumerating (doc, reachable-id) closure, MIN per doc.
  */
object ClusterQueries {

  /** Hard cap on propagation rounds — a safety net only; the loop exits
    * on the fixpoint, and near-dup components converge in a handful of
    * rounds (diameter, and label propagation halves odd paths). */
  private val MaxRounds = 20

  /** Converged labels per corpus dir: the propagation runs EAGERLY at
    * DataFrame construction (checkpoints + fixpoint actions), and two
    * declared queries plus every plan sweep would otherwise re-run it
    * per construction. Fixture dirs are immutable; the checkpointed
    * frame is session-lifetime (same rationale as
    * SimilarityQueries2.centroidCache), evicted by
    * `ArtifactStore.invalidate(dir)`. */
  private val labelCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  graft.ArtifactStore.onInvalidate(labelCache.remove(_))

  private[queries] def dupClusters(docs: DataFrame, dir: String): DataFrame =
    labelCache.computeIfAbsent(dir, _ => propagate(docs, dir))

  /** Per-round materialization. Default is `localCheckpoint` — blocks on
    * executor local storage, the right local-mode trade. It is NOT
    * executor-loss-tolerant: on a real cluster a lost executor kills the
    * truncated lineage. Setting `spark.graft.checkpointDir` switches to
    * RELIABLE `checkpoint()` into that directory (shared storage on a
    * cluster), which survives executor death at the cost of a
    * write-to-FS per round. */
  private def materialize(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption("spark.graft.checkpointDir") match {
      case Some(ckDir) =>
        val sc = df.sparkSession.sparkContext
        if (!sc.getCheckpointDir.contains(ckDir)) sc.setCheckpointDir(ckDir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(true)
    }

  private def propagate(docs: DataFrame, dir: String): DataFrame = {
    val cand = DedupQueries.bandCandidatesCached(docs, dir)
    // symmetric edge list; nodes = docs in >=1 candidate pair
    val edges = materialize(
      cand.select(col("da").as("src"), col("db").as("dst"))
        .unionByName(cand.select(col("db").as("src"), col("da").as("dst"))))
    // init = min(own id, direct neighbors): the first propagation round
    // fused into one aggregation (and nodes fall out of the groupBy —
    // every node appears as src of the symmetric edge list)
    var labels = materialize(
      edges.groupBy("src").agg(min(col("dst")).as("nmin"))
        .select(col("src").as("doc"), least(col("src"), col("nmin")).as("lab")))
    var prevSum = labels.agg(sum(col("lab"))).head().getLong(0)
    var round   = 0
    var done    = false
    while (!done && round < MaxRounds) {
      val viaNeighbor = edges.join(labels, col("src") === col("doc"))
        .select(col("dst").as("doc"), col("lab"))
      labels = materialize(
        labels.unionByName(viaNeighbor)
          .groupBy("doc").agg(min(col("lab")).as("lab")))
      val curSum = labels.agg(sum(col("lab"))).head().getLong(0)
      done = curSum == prevSum
      prevSum = curSum
      round += 1
    }
    // never return silently-wrong clusters: a component with diameter
    // beyond the cap would leave non-minimal labels that disagree with
    // the closure oracle
    if (!done) throw new IllegalStateException(
      s"duplicate-cluster propagation did not converge in $MaxRounds rounds " +
        "(a candidate-graph component has extreme diameter); raise MaxRounds " +
        "or inspect the band buckets feeding it")
    labels
  }

  def defs: Map[String, Q] = Map(

    // Connected components over MinHash-band candidate edges: doc_id →
    // (cluster id = min doc_id in component, component size). Only
    // documents that appear in at least one candidate pair are emitted —
    // singletons are their own trivial cluster and stay out of the way.
    "dd_dup_clusters" -> Q(
      s"""WITH RECURSIVE ${DedupQueries.duckCandCte},
         |edges AS (
         |  SELECT da AS src, db AS dst FROM cand
         |  UNION
         |  SELECT db AS src, da AS dst FROM cand),
         |nodes AS (SELECT DISTINCT src AS doc FROM edges),
         |reach AS (
         |  SELECT doc, doc AS lab FROM nodes
         |  UNION
         |  SELECT e.dst AS doc, r.lab FROM reach r JOIN edges e ON e.src = r.doc),
         |lab AS (SELECT doc, MIN(lab) AS cluster_id FROM reach GROUP BY doc)
         |SELECT doc AS doc_id, cluster_id,
         |       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM lab ORDER BY doc_id""".stripMargin) { (s, d) =>
      val labels = dupClusters(Tables.documents(s, d), d)
      val w = Window.partitionBy(col("cluster_id"))
      labels
        .select(col("doc").as("doc_id"), col("lab").as("cluster_id"))
        .withColumn("cluster_size", count(lit(1)).over(w))
        .orderBy("doc_id")
    },

    // Convergence observability for the label-propagation loop — the
    // dd_dup_clusters twin of q50_rank_convergence: per-round changed-
    // label counts and the label-sum witness (the same scalar the
    // production loop's fixpoint test watches), over THREE unrolled
    // rounds. n_changed hitting 0 is convergence; a user reads this
    // table to size MaxRounds the way the bench reads the band-tune
    // S-curve. All-integer (labels are doc ids), so the oracle matches
    // to the bit; rounds are materialized because round r is consumed
    // by both round r+1 and its own delta row.
    "dd_cluster_convergence" -> Q(
      s"""WITH ${DedupQueries.duckCandCte},
         |edges AS (
         |  SELECT da AS src, db AS dst FROM cand
         |  UNION
         |  SELECT db AS src, da AS dst FROM cand),
         |l1 AS (
         |  SELECT src AS doc, LEAST(src, MIN(dst)) AS lab
         |  FROM edges GROUP BY src),
         |p1 AS (
         |  SELECT e.dst AS doc, l.lab FROM edges e JOIN l1 l ON e.src = l.doc
         |  UNION ALL SELECT doc, lab FROM l1),
         |l2 AS (SELECT doc, MIN(lab) AS lab FROM p1 GROUP BY doc),
         |p2 AS (
         |  SELECT e.dst AS doc, l.lab FROM edges e JOIN l2 l ON e.src = l.doc
         |  UNION ALL SELECT doc, lab FROM l2),
         |l3 AS (SELECT doc, MIN(lab) AS lab FROM p2 GROUP BY doc),
         |rounds AS (
         |  SELECT 1 AS round, COUNT(*) AS n_nodes,
         |         SUM(CASE WHEN lab <> doc THEN 1 ELSE 0 END) AS n_changed,
         |         SUM(lab) AS lab_sum
         |  FROM l1
         |  UNION ALL
         |  SELECT 2, COUNT(*),
         |         SUM(CASE WHEN b.lab <> a.lab THEN 1 ELSE 0 END), SUM(b.lab)
         |  FROM l2 b JOIN l1 a ON b.doc = a.doc
         |  UNION ALL
         |  SELECT 3, COUNT(*),
         |         SUM(CASE WHEN b.lab <> a.lab THEN 1 ELSE 0 END), SUM(b.lab)
         |  FROM l3 b JOIN l2 a ON b.doc = a.doc)
         |SELECT CAST(round AS INTEGER) AS round,
         |       CAST(n_nodes AS BIGINT) AS n_nodes,
         |       CAST(n_changed AS BIGINT) AS n_changed,
         |       CAST(lab_sum AS BIGINT) AS lab_sum
         |FROM rounds ORDER BY round""".stripMargin) { (s, d) =>
      val cand = DedupQueries.bandCandidatesCached(Tables.documents(s, d), d)
      val edges = materialize(
        cand.select(col("da").as("src"), col("db").as("dst"))
          .unionByName(cand.select(col("db").as("src"), col("da").as("dst"))))
      var labels = materialize(
        edges.groupBy("src").agg(min(col("dst")).as("nmin"))
          .select(col("src").as("doc"), least(col("src"), col("nmin")).as("lab")))
      val r1 = labels
        .agg(count(lit(1)).as("n_nodes"),
             sum(when(col("lab") =!= col("doc"), 1L).otherwise(0L)).as("n_changed"),
             sum(col("lab")).as("lab_sum"))
        .select(lit(1).as("round"), col("n_nodes"), col("n_changed"), col("lab_sum"))
      val stats = scala.collection.mutable.ArrayBuffer(r1)
      for (r <- 2 to 3) {
        val via = edges.join(labels, col("src") === col("doc"))
          .select(col("dst").as("doc"), col("lab"))
        val next = materialize(
          labels.unionByName(via).groupBy("doc").agg(min(col("lab")).as("lab")))
        stats += next.select(col("doc").as("n_doc"), col("lab").as("n_lab"))
          .join(labels.select(col("doc").as("p_doc"), col("lab").as("p_lab")),
                col("n_doc") === col("p_doc"))
          .agg(count(lit(1)).as("n_nodes"),
               sum(when(col("n_lab") =!= col("p_lab"), 1L).otherwise(0L)).as("n_changed"),
               sum(col("n_lab")).as("lab_sum"))
          .select(lit(r).as("round"), col("n_nodes"), col("n_changed"), col("lab_sum"))
        labels = next
      }
      stats.reduce(_ unionByName _).orderBy("round")
    },

    // Canonical-survivor selection: one row per duplicate cluster — the
    // representative (min doc_id), the dropped count, and the longest
    // member text's length (the usual "keep the longest variant" policy
    // signal). This is the REMOVAL side of dedup: total docs minus
    // sum(cluster_size - 1) is the post-dedup corpus size.
    "dd_dedup_survivors" -> Q(
      s"""WITH RECURSIVE ${DedupQueries.duckCandCte},
         |edges AS (
         |  SELECT da AS src, db AS dst FROM cand
         |  UNION
         |  SELECT db AS src, da AS dst FROM cand),
         |nodes AS (SELECT DISTINCT src AS doc FROM edges),
         |reach AS (
         |  SELECT doc, doc AS lab FROM nodes
         |  UNION
         |  SELECT e.dst AS doc, r.lab FROM reach r JOIN edges e ON e.src = r.doc),
         |lab AS (SELECT doc, MIN(lab) AS cluster_id FROM reach GROUP BY doc)
         |SELECT l.cluster_id,
         |       COUNT(*) AS n_members,
         |       COUNT(*) - 1 AS n_dropped,
         |       MAX(CAST(length(d.text) AS INTEGER)) AS max_text_len
         |FROM lab l JOIN documents d ON l.doc = d.doc_id
         |GROUP BY l.cluster_id ORDER BY cluster_id""".stripMargin) { (s, d) =>
      val docs   = Tables.documents(s, d)
      val labels = dupClusters(docs, d)
      labels
        .join(docs, labels("doc") === docs("doc_id"))
        .groupBy(col("lab").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
             (count(lit(1)) - 1).as("n_dropped"),
             max(length(col("text")).cast("int")).as("max_text_len"))
        .orderBy("cluster_id")
    },

    // Dedup's composition bias: removing cluster non-representatives
    // (survivor = min doc id, the cluster label itself) SHIFTS the
    // source mixture — the curation concern that dedup silently
    // over-prunes whichever source duplicates most. Per source:
    // before/after doc counts and shares in exact bp, and the shift.
    // Scale shape: the cluster labels are the SAME iterative-CC frame
    // as dd_dup_clusters (candidate-bounded, cached per corpus); the
    // corpus contributes one count-per-source aggregate; totals are
    // two broadcast scalars.
    "dd_dedup_shift" -> Q(
      s"""WITH RECURSIVE ${DedupQueries.duckCandCte},
         |edges AS (
         |  SELECT da AS src, db AS dst FROM cand
         |  UNION
         |  SELECT db AS src, da AS dst FROM cand),
         |nodes AS (SELECT DISTINCT src AS doc FROM edges),
         |reach AS (
         |  SELECT doc, doc AS lab FROM nodes
         |  UNION
         |  SELECT e.dst AS doc, r.lab FROM reach r JOIN edges e ON e.src = r.doc),
         |lab AS (SELECT doc, MIN(lab) AS cluster_id FROM reach GROUP BY doc),
         |dropped AS (
         |  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_dropped
         |  FROM lab l JOIN documents d ON d.doc_id = l.doc
         |  WHERE l.doc <> l.cluster_id GROUP BY 1),
         |src AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_before FROM documents GROUP BY 1),
         |m AS (
         |  SELECT s.source, s.n_before, COALESCE(dr.n_dropped, 0) AS n_dropped,
         |         s.n_before - COALESCE(dr.n_dropped, 0) AS n_after
         |  FROM src s LEFT JOIN dropped dr ON dr.source = s.source),
         |t AS (SELECT CAST(SUM(n_before) AS BIGINT) AS tb,
         |             CAST(SUM(n_after) AS BIGINT) AS ta FROM m)
         |SELECT m.source, m.n_before, CAST(m.n_dropped AS BIGINT) AS n_dropped,
         |       CAST(m.n_after AS BIGINT) AS n_after,
         |       CAST((m.n_before * 10000) // t.tb AS BIGINT) AS share_before_bp,
         |       CAST((m.n_after * 10000) // t.ta AS BIGINT) AS share_after_bp,
         |       CAST((m.n_after * 10000) // t.ta - (m.n_before * 10000) // t.tb AS BIGINT)
         |         AS shift_bp
         |FROM m CROSS JOIN t ORDER BY m.source""".stripMargin) { (s, d) =>
      val docs   = Tables.documents(s, d)
      val labels = dupClusters(docs, d)
      val dropped = labels.filter(col("doc") =!= col("lab"))
        .join(docs, col("doc") === col("doc_id"))
        .groupBy("source").agg(count(lit(1)).as("n_dropped"))
      val src = docs.groupBy("source").agg(count(lit(1)).as("n_before"))
      val m = src.join(broadcast(dropped), Seq("source"), "left")
        .select(col("source"), col("n_before"),
                coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
        .withColumn("n_after", col("n_before") - col("n_dropped"))
      val t = m.agg(sum(col("n_before")).as("tb"), sum(col("n_after")).as("ta"))
      m.crossJoin(broadcast(t))
        .select(col("source"), col("n_before"), col("n_dropped"), col("n_after"),
                expr("(n_before * 10000) div tb").as("share_before_bp"),
                expr("(n_after * 10000) div ta").as("share_after_bp"),
                expr("(n_after * 10000) div ta - (n_before * 10000) div tb").as("shift_bp"))
        .orderBy("source")
    }
  )
}
