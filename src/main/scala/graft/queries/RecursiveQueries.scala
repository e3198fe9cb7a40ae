package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recursive-CTE queries — the iteration-in-SQL surface Spark gained in
  * 4.x (`WITH RECURSIVE`, SPARK-24497). The reference has no recursion
  * anywhere (its only loop is the broker accept loop,
  * /root/reference/src/broker/main.rs:246-253), but a warehouse switching
  * to this library expects the two classic recursive workloads: a
  * hierarchy walk (BOM explosion / org chart) and a linear recurrence
  * (exponential smoothing) that plain window functions cannot express.
  *
  * Scale stance: each recursion LEVEL is one plan execution — measured at
  * ~150 ms of fixed scheduling/compile overhead per level on this box
  * regardless of row volume. The scaling discipline is therefore LEVEL
  * BUDGETING: depth must be bounded by log(n) or by a corpus-independent
  * axis (calendar blocks), never by row count. Both queries set
  * `spark.sql.cteRecursionLevelLimit` explicitly so the intent survives
  * a session-default change, and both EXECUTE inside the conf scope
  * (localCheckpoint) — a lazily returned frame would run at action time
  * with the confs already restored.
  *
  * AQE is a measured per-query call: on the smoother's LOCAL one-row
  * chain, AQE re-planning roughly doubles the level cost (pure overhead
  * → pinned off); on the BOM walk's distributed per-level join, AQE's
  * partition coalescing WINS (1.65 s vs 2.26 s warm at sf0.1 → left on).
  */
object RecursiveQueries {

  /** Dir-unique temp-view suffix: concurrent first builds for two corpora
    * must not overwrite each other's registered views between view
    * creation and SQL execution. */
  private def viewTag(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Run `body` with the given SQL confs, restoring previous values.
    * SERIALIZED across callers: two concurrent conf-scoped builds on the
    * shared session (e.g. the EWMA and Holt chains racing their first
    * build — ConcurrencySpec exercises exactly this) would otherwise
    * interleave save/restore and one could snapshot the other's
    * temporary value as its "old" conf, permanently leaking AQE=false
    * into the session. The lock ordering is always (cache-bin →
    * confLock), so no cycle is possible. */
  private val confLock = new Object

  private[queries] def withConfs[T](s: SparkSession, kvs: (String, String)*)(body: => T): T =
    confLock.synchronized {
      val old = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
      kvs.foreach { case (k, v) => s.conf.set(k, v) }
      try body
      finally old.foreach { case (k, ov) => ov.fold(s.conf.unset(k))(s.conf.set(k, _)) }
    }

  /** Confs for a LOCAL recursion (the smoother's one-row carries): AQE
    * re-optimizes every step, pure overhead on frames this tiny —
    * measured ~2x the level cost with it on. The BOM walk's distributed
    * levels keep AQE (see the object doc). */
  private def recConfs(levels: Int): Seq[(String, String)] = Seq(
    "spark.sql.cteRecursionLevelLimit" -> levels.toString,
    "spark.sql.adaptive.enabled" -> "false")

  /** Days folded into one recursion level by the blocked smoother. */
  private val EwmaBlock = 8

  /** Tree levels folded into one recursion iteration by the BOM walk:
    * a frontier at depth d (d ≡ 0 mod stride) emits descendants at
    * d+1..d+stride in one join against the pre-exploded multi-key
    * dimension; depth-mod-stride parity makes the match rules mutually
    * exclusive, so every key is emitted exactly once. */
  private val BomStride = 3

  /** One smoothing step: (x_p + l)/2, chained from the seed. Pure ANSI —
    * the same string parses in Spark and DuckDB. NULL x values occur only
    * at the tail of the LAST (partial) block; they poison that block's
    * carry, which no consumer reads (no next block, and the per-day
    * expansion dispatches on real positions only), so no NULL-skip is
    * needed and the generated text stays linear in block width. */
  private def chain(p: Int, seed: String): String =
    if (p == 0) seed
    else s"((CAST(b.x$p AS DOUBLE) + ${chain(p - 1, seed)}) / 2)"

  /** Per-day expansion inside a block: ewma at pos p from the block-entry
    * level, dispatched on d.pos. Same arithmetic order as the daily
    * recurrence, so results are bit-identical. */
  private def posCase(seed: String): String =
    (1 to EwmaBlock).map(p => s"WHEN ${p} THEN ${chain(p, seed)}")
      .mkString("CASE d.pos ", " ", " END")

  /** Dialect-shared SQL from the densified daily series `g_daily_dense`
    * (di starting at 1, day, n_events): pivot days 2.. into B-wide blocks,
    * recurse one level per BLOCK carrying the block-end level, then expand
    * per-day values with the in-block chain. */
  private def ewmaCoreSql(src: String = "g_daily_dense"): String = {
    val xs = (1 to EwmaBlock)
      .map(p => s"MAX(CASE WHEN pos = $p THEN n_events END) AS x$p")
      .mkString(", ")
    s"""WITH RECURSIVE blk AS (
       |  SELECT CAST(FLOOR((di - 2) / $EwmaBlock) AS INT) AS bi,
       |         CAST((di - 2) % $EwmaBlock AS INT) + 1 AS pos,
       |         day, n_events
       |  FROM $src WHERE di >= 2),
       |blocks AS (
       |  SELECT bi, $xs FROM blk GROUP BY bi),
       |rec AS (
       |  SELECT CAST(-1 AS INT) AS bi, CAST(n_events AS DOUBLE) AS lend
       |  FROM $src WHERE di = 1
       |  UNION ALL
       |  SELECT b.bi, ${chain(EwmaBlock, "r.lend")} AS lend
       |  FROM rec r JOIN blocks b ON b.bi = r.bi + 1),
       |perday AS (
       |  SELECT day, n_events, CAST(n_events AS DOUBLE) AS ewma
       |  FROM $src WHERE di = 1
       |  UNION ALL
       |  SELECT d.day, d.n_events, ${posCase("r.lend")} AS ewma
       |  FROM blk d
       |  JOIN blocks b ON b.bi = d.bi
       |  JOIN rec r ON r.bi = d.bi - 1)
       |SELECT day, n_events, ewma,
       |       CAST(n_events AS DOUBLE) - ewma AS resid
       |FROM perday ORDER BY day""".stripMargin
  }

  /** Holt (double-exponential) chain: VECTOR state (level, trend) per
    * step, α = β = 1/2 so every operation is a dyadic-exact add/halve:
    *   l_p = (x_p + l_{p−1} + b_{p−1}) / 2
    *   b_p = ((l_p − l_{p−1}) + b_{p−1}) / 2
    * Generated as NESTED SUBQUERIES (two wraps per position) instead of
    * one inlined expression: b_p references l_p AND the prior state, so
    * textual inlining would grow exponentially in block width, while
    * each wrap adds one named column and the text stays linear — the
    * trick that makes multi-variable recurrences blockable at all.
    * `src` must provide l0/b0 (the carry) and x1..xB. */
  private def holtChain(src: String): String =
    (1 to EwmaBlock).foldLeft(s"($src)") { (inner, p) =>
      val lp = s"SELECT *, (CAST(x$p AS DOUBLE) + l${p - 1} + b${p - 1}) / 2 AS l$p FROM $inner h$p"
      s"(SELECT *, ((l$p - l${p - 1}) + b${p - 1}) / 2 AS b$p FROM ($lp) g$p)"
    }

  /** Dialect-shared Holt SQL from the densified series view/CTE `src`:
    * the same blocked-recursion shape as [[ewmaCoreSql]], but the carry
    * is the (level, trend) PAIR and the per-day expansion emits the
    * one-step-ahead forecast l+b the previous day implied. */
  private def holtCoreSql(src: String = "g_daily_dense"): String = {
    val xs = (1 to EwmaBlock)
      .map(p => s"MAX(CASE WHEN pos = $p THEN n_events END) AS x$p")
      .mkString(", ")
    val carrySrc =
      s"SELECT r.lend AS l0, r.bend AS b0, b.bi AS bbi, " +
      (1 to EwmaBlock).map(p => s"b.x$p").mkString(", ") +
      s" FROM rec r JOIN blocks b ON b.bi = r.bi + 1"
    val perdaySrc =
      s"SELECT d.day, d.n_events, d.pos, r.lend AS l0, r.bend AS b0, " +
      (1 to EwmaBlock).map(p => s"b.x$p").mkString(", ") +
      s" FROM blk d JOIN blocks b ON b.bi = d.bi JOIN rec r ON r.bi = d.bi - 1"
    val lCase = (1 to EwmaBlock).map(p => s"WHEN $p THEN l$p")
      .mkString("CASE pos ", " ", " END")
    val bCase = (1 to EwmaBlock).map(p => s"WHEN $p THEN b$p")
      .mkString("CASE pos ", " ", " END")
    val fCase = (1 to EwmaBlock).map(p => s"WHEN $p THEN l${p - 1} + b${p - 1}")
      .mkString("CASE pos ", " ", " END")
    s"""WITH RECURSIVE blk AS (
       |  SELECT CAST(FLOOR((di - 2) / $EwmaBlock) AS INT) AS bi,
       |         CAST((di - 2) % $EwmaBlock AS INT) + 1 AS pos,
       |         day, n_events
       |  FROM $src WHERE di >= 2),
       |blocks AS (
       |  SELECT bi, $xs FROM blk GROUP BY bi),
       |rec AS (
       |  SELECT CAST(-1 AS INT) AS bi, CAST(n_events AS DOUBLE) AS lend,
       |         CAST(0 AS DOUBLE) AS bend
       |  FROM $src WHERE di = 1
       |  UNION ALL
       |  SELECT c.bbi, c.l$EwmaBlock, c.b$EwmaBlock
       |  FROM ${holtChain(carrySrc)} c),
       |perday AS (
       |  SELECT day, n_events, CAST(n_events AS DOUBLE) AS level,
       |         CAST(0 AS DOUBLE) AS trend, CAST(NULL AS DOUBLE) AS forecast
       |  FROM $src WHERE di = 1
       |  UNION ALL
       |  SELECT c.day, c.n_events, $lCase AS level, $bCase AS trend,
       |         $fCase AS forecast
       |  FROM ${holtChain(perdaySrc)} c)
       |SELECT day, n_events, level, trend, forecast,
       |       CAST(n_events AS DOUBLE) - forecast AS fc_err
       |FROM perday ORDER BY day""".stripMargin
  }

  /** Holt-WINTERS (triple) chain: the state vector grows to (level,
    * trend, s[0..6]) — weekly additive seasonality, α = β = γ = 1/2 so
    * every operation stays a dyadic-exact add/halve:
    *   sold_p = s[k_p]                       (slot k_p = (di−1) mod 7)
    *   l_p = ((x_p − sold_p) + l_{p−1} + b_{p−1}) / 2
    *   b_p = ((l_p − l_{p−1}) + b_{p−1}) / 2
    *   s[k_p] ← ((x_p − l_p) + sold_p) / 2, other slots carry unchanged
    * Same nested-subquery discipline as [[holtChain]] (each wrap adds
    * named columns, text stays linear where inlining is exponential);
    * the seasonal READ dispatches on the position's slot column k_p and
    * the WRITE is a 7-way CASE per slot. Seasonal state starts all-zero
    * (the first week's updates grow it in — deterministic in both
    * engines, no init heuristic to keep portable). A NULL x at the tail
    * of the last partial block leaves l/b NULL (consumed by nothing)
    * and carries seasonal slots UNCHANGED (NULL = k is false → ELSE),
    * so no NULL-skip is needed.
    * `src` must provide l0/b0/s0_0..s6_0 (the carry), x1..xB, k1..kB. */
  private def hwChain(src: String): String =
    (1 to EwmaBlock).foldLeft(s"($src)") { (inner, p) =>
      val sOld = (0 to 6).map(k => s"WHEN $k THEN s${k}_${p - 1}")
        .mkString(s"CASE k$p ", " ", " END")
      val read  = s"SELECT *, $sOld AS sold$p FROM $inner i$p"
      val lp    = s"SELECT *, ((CAST(x$p AS DOUBLE) - sold$p) + l${p - 1} + b${p - 1}) / 2 AS l$p FROM ($read) h$p"
      val bp    = s"SELECT *, ((l$p - l${p - 1}) + b${p - 1}) / 2 AS b$p FROM ($lp) g$p"
      val write = (0 to 6).map(k =>
        s"CASE WHEN k$p = $k THEN ((CAST(x$p AS DOUBLE) - l$p) + sold$p) / 2 ELSE s${k}_${p - 1} END AS s${k}_$p")
        .mkString(", ")
      s"(SELECT *, $write FROM ($bp) f$p)"
    }

  /** Dialect-shared Holt-Winters SQL from the densified series `src`:
    * the [[holtCoreSql]] blocked-recursion shape with the 9-value state
    * carried per block and the one-step-ahead forecast including the
    * seasonal term (l + b + s[slot]) — the number a weekly-load planner
    * actually wants. Slots anchor to the series day index ((di−1) mod
    * 7 — pure integer arithmetic, identical in both dialects). */
  private def hwCtes(src: String = "g_daily_dense"): String = {
    val xs = (1 to EwmaBlock)
      .map(p => s"MAX(CASE WHEN pos = $p THEN n_events END) AS x$p")
      .mkString(", ")
    val ks = (1 to EwmaBlock)
      .map(p => s"MAX(CASE WHEN pos = $p THEN k END) AS k$p")
      .mkString(", ")
    val sCarry0 = (0 to 6).map(k => s"r.se$k AS s${k}_0").mkString(", ")
    val carrySrc =
      s"SELECT r.lend AS l0, r.bend AS b0, $sCarry0, b.bi AS bbi, " +
      (1 to EwmaBlock).map(p => s"b.x$p").mkString(", ") + ", " +
      (1 to EwmaBlock).map(p => s"b.k$p").mkString(", ") +
      s" FROM rec r JOIN blocks b ON b.bi = r.bi + 1"
    val recProj = (0 to 6).map(k => s"c.s${k}_$EwmaBlock").mkString(", ")
    val perdaySrc =
      s"SELECT d.day, d.n_events, d.pos, r.lend AS l0, r.bend AS b0, $sCarry0, " +
      (1 to EwmaBlock).map(p => s"b.x$p").mkString(", ") + ", " +
      (1 to EwmaBlock).map(p => s"b.k$p").mkString(", ") +
      s" FROM blk d JOIN blocks b ON b.bi = d.bi JOIN rec r ON r.bi = d.bi - 1"
    val lCase = (1 to EwmaBlock).map(p => s"WHEN $p THEN l$p")
      .mkString("CASE pos ", " ", " END")
    val bCase = (1 to EwmaBlock).map(p => s"WHEN $p THEN b$p")
      .mkString("CASE pos ", " ", " END")
    // the updated slot's value at pos p — the SAME expression text as
    // hwChain's write branch, so the bits match
    val sCase = (1 to EwmaBlock).map(p =>
        s"WHEN $p THEN ((CAST(x$p AS DOUBLE) - l$p) + sold$p) / 2")
      .mkString("CASE pos ", " ", " END")
    val fCase = (1 to EwmaBlock).map(p => s"WHEN $p THEN l${p - 1} + b${p - 1} + sold$p")
      .mkString("CASE pos ", " ", " END")
    val zeros = (0 to 6).map(k => s"CAST(0 AS DOUBLE) AS se$k").mkString(", ")
    s"""blk AS (
       |  SELECT CAST(FLOOR((di - 2) / $EwmaBlock) AS INT) AS bi,
       |         CAST((di - 2) % $EwmaBlock AS INT) + 1 AS pos,
       |         CAST((di - 1) % 7 AS INT) AS k,
       |         day, n_events
       |  FROM $src WHERE di >= 2),
       |blocks AS (
       |  SELECT bi, $xs, $ks FROM blk GROUP BY bi),
       |rec AS (
       |  SELECT CAST(-1 AS INT) AS bi, CAST(n_events AS DOUBLE) AS lend,
       |         CAST(0 AS DOUBLE) AS bend, $zeros
       |  FROM $src WHERE di = 1
       |  UNION ALL
       |  SELECT c.bbi, c.l$EwmaBlock, c.b$EwmaBlock, $recProj
       |  FROM ${hwChain(carrySrc)} c),
       |perday AS (
       |  SELECT day, n_events, CAST(n_events AS DOUBLE) AS level,
       |         CAST(0 AS DOUBLE) AS trend, CAST(0 AS DOUBLE) AS seasonal,
       |         CAST(NULL AS DOUBLE) AS forecast
       |  FROM $src WHERE di = 1
       |  UNION ALL
       |  SELECT c.day, c.n_events, $lCase AS level, $bCase AS trend,
       |         $sCase AS seasonal, $fCase AS forecast
       |  FROM ${hwChain(perdaySrc)} c)""".stripMargin
  }

  /** [[hwCtes]] under the WITH header with the per-day projection —
    * el_hw_forecast's full statement; el_hw_eval composes [[hwCtes]]
    * with its own aggregate instead. */
  private def hwCoreSql(src: String = "g_daily_dense"): String =
    s"""WITH RECURSIVE ${hwCtes(src)}
       |SELECT day, n_events, level, trend, seasonal, forecast,
       |       CAST(n_events AS DOUBLE) - forecast AS fc_err
       |FROM perday ORDER BY day""".stripMargin

  /** The Holt-Winters frame, cached per corpus like [[holtFrame]]. */
  private val hwCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  graft.ArtifactStore.onInvalidate(hwCache.remove(_))

  private[queries] def hwFrame(s: SparkSession, d: String): DataFrame =
    hwCache.computeIfAbsent(d, _ => {
      val view = denseDailyView(s, d)
      // the 9-state chain is 4 named-column wraps per position (8 × 10
      // columns of them): Spark's analyzer needs more resolution
      // fixpoint iterations than the 100 default — an analysis BUDGET,
      // not a semantic knob (DuckDB resolves the same text unaided)
      withConfs(s, recConfs(4000) :+
          ("spark.sql.analyzer.maxIterations" -> "1000"): _*) {
        s.sql(hwCoreSql(view)).localCheckpoint(true)
      }
    })

  /** The smoothed daily frame (day, n_events, ewma, resid), shared by
    * el_ewma_forecast and el_forecast_eval — the chain is recomputed
    * once per corpus (calendar-scale rows, localCheckpointed; the
    * bandCandidatesCached pattern) instead of once per consumer. */
  private val ewmaCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  graft.ArtifactStore.onInvalidate(ewmaCache.remove(_))

  /** Register (dir-uniquely) and return the densified daily-series view:
    * the distributed aggregate + calendar zero-fill, collected to a
    * LocalRelation (corpus-independent row count) — the shared input of
    * every daily-recurrence query. Built ONCE per corpus (the events
    * scan is the expensive half of the recurrence pipeline, and both
    * the EWMA and Holt chains consume the identical series); the cache
    * also makes the view name single-writer, so concurrent chain builds
    * cannot re-register it mid-flight. */
  private val denseViewCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  graft.ArtifactStore.onInvalidate(denseViewCache.remove(_))

  private def denseDailyView(s: SparkSession, d: String): String = {
    // the cached NAME is session-bound (temp views live per session): a
    // hit whose view is missing in THIS session (new/cloned session,
    // same JVM) must rebuild, not return a dangling name
    val cached = denseViewCache.get(d)
    if (cached != null && !s.catalog.tableExists(cached))
      denseViewCache.remove(d, cached)
    denseViewCache.computeIfAbsent(d, _ => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
      val dense = daily
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(posexplode(expr("sequence(d0, d1)")).as(Seq("n", "day")))
        .select((col("n") + 1).as("di"), col("day"))
        .join(daily, Seq("day"), "left")
        .select(col("di"), col("day"), coalesce(col("c"), lit(0L)).as("n_events"))
      import s.implicits._
      val name = s"g_daily_dense_${viewTag(d)}"
      s.createDataset(
        dense.orderBy("di")
          .as[(Long, java.sql.Date, Long)]
          .collect().toSeq)
        .toDF("di", "day", "n_events")
        .createOrReplaceTempView(name)
      name
    })
  }

  private[queries] def ewmaFrame(s: SparkSession, d: String): DataFrame =
    ewmaCache.computeIfAbsent(d, _ => {
      val view = denseDailyView(s, d)
      withConfs(s, recConfs(4000): _*) { // a decade of daily blocks
        s.sql(ewmaCoreSql(view)).localCheckpoint(true)
      }
    })

  /** The Holt (level+trend) frame, cached per corpus like [[ewmaFrame]]. */
  private val holtCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  graft.ArtifactStore.onInvalidate(holtCache.remove(_))

  private[queries] def holtFrame(s: SparkSession, d: String): DataFrame =
    holtCache.computeIfAbsent(d, _ => {
      val view = denseDailyView(s, d)
      withConfs(s, recConfs(4000): _*) {
        s.sql(holtCoreSql(view)).localCheckpoint(true)
      }
    })

  def defs: Map[String, Q] = Map(

    // Bill-of-materials explosion: walk the part hierarchy from a root
    // and roll up per assembly level. The fixture has no explicit
    // parent column, so the hierarchy is the IMPLICIT BINARY TREE over
    // part keys (parent(k) = k div 2, root = 1) — deterministic, present
    // at every SF, and depth log₂(n): 11 levels at sf0.01, ~28 at
    // 100 TB, always far under the configured level limit. Each level
    // is one equi-join frontier⋈part on the parent key (Catalyst plans
    // it; the frontier is the previous level only, never the
    // accumulated closure, and the dimension side broadcasts). The
    // Spark execution STRIDES [[BomStride]] TREE LEVELS PER ITERATION:
    // part pre-explodes into a (join-key, level-delta) dimension
    // carrying its ancestor keys (k div 2 at Δ1, k div 4 at Δ2, …),
    // the recursion keeps only depths ≡ 0 mod stride as the frontier,
    // and each step emits the whole stride of descendants in one join
    // — depth-mod-stride parity makes the match rules mutually
    // exclusive, so every key is emitted exactly once. Iterations drop
    // from log₂ n to (log₂ n)/stride (measured 2.6 s → 1.5 s at sf0.1
    // against the ~0.2 s/level executor overhead); at 100 TB depth ~28
    // that is 10 joins, and the stride is the dial if level cost ever
    // dominates deeper hierarchies. DEPENDENCY the stride adds: on a
    // GAPPED key space the strided join can emit a node whose
    // intermediate parent is missing (reaching it via the div-4/div-8
    // ancestor), where the one-level walk would prune the whole
    // subtree. Part keys are dense 0..n-1 at every SF (RecursiveSpec
    // asserts it), so the derivations agree; a real BOM with holes
    // needs stride 1 or an existence-chain filter.
    // The rollup reports per-depth membership and the exact
    // cents-summed retail price (Portable.dsum — no accumulation-order
    // drift between engines). The oracle keeps the canonical one-level
    // recursion: same rows, independent derivation.
    "q58_bom_explode" -> Q(
      s"""WITH RECURSIVE bom AS (
         |  SELECT p_partkey, 0 AS depth, p_retailprice
         |  FROM part WHERE p_partkey = 1
         |  UNION ALL
         |  SELECT c.p_partkey, b.depth + 1, c.p_retailprice
         |  FROM bom b JOIN part c ON c.p_partkey // 2 = b.p_partkey
         |  WHERE c.p_partkey >= 2)
         |SELECT CAST(depth AS INTEGER) AS depth,
         |       CAST(COUNT(*) AS BIGINT) AS n_parts,
         |       MIN(p_partkey) AS min_key, MAX(p_partkey) AS max_key,
         |       ${graft.functions.Portable.duckDsum("p_retailprice")} AS level_price
         |FROM bom GROUP BY depth ORDER BY depth""".stripMargin) { (s, d) =>
      val S = BomStride
      // view names are DIR-UNIQUE: two corpora racing their first build
      // must not overwrite each other's views between registration and
      // execution (the hazard ConcurrencySpec races the cached frames for)
      val tag = viewTag(d)
      Tables.part(s, d).createOrReplaceTempView(s"g_part_$tag")
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_retailprice"),
                explode(array((1 to S).map(dl =>
                  struct(expr(s"p_partkey div ${1 << dl}").as("jk"),
                         lit(dl).as("lvl"))): _*)).as("j"))
        .select(col("p_partkey"), col("p_retailprice"),
                col("j.jk").as("jk"), col("j.lvl").as("lvl"))
        .filter(col("p_partkey") >= 2)
        // every recursion step re-reads this dimension; materialize the
        // scan+explode once (ExistingRDD, not a cached-relation leak)
        .localCheckpoint(true)
        .createOrReplaceTempView(s"g_desc2_$tag")
      // row limit: Spark's default 1M-row recursion backstop trips on
      // corpora with ≥1M parts (the sf10 audit caught it at 2M) even
      // though THIS recursion's row count is exactly |part| by
      // construction — the depth-mod-stride parity emits every key once,
      // and RecursiveSpec pins that invariant. The LEVEL limit (64)
      // stays as the runaway backstop; the row cap is raised in-scope to
      // the corpus-linear bound the query actually has.
      // auto-broadcast OFF in scope: the recursive frontier has no
      // reliable stats, and Spark elects to broadcast it — fine at small
      // SF, but the widest stride-frontier is ~|part| rows (price column
      // included), and at sf10 (2M parts) the broadcast build died with
      // "not enough memory" once the full write plan stopped pruning
      // p_retailprice (the count()-action bench had hidden this; the
      // round-10 noop action surfaced it). Both sides shuffle on the
      // parent key instead — per-level exchange cost is bounded by the
      // frontier, and a 1000-executor cluster wants exactly that plan:
      // broadcasting a corpus-sized frontier to every executor is the
      // non-scalable arm.
      withConfs(s, "spark.sql.cteRecursionLevelLimit" -> "64",
                   "spark.sql.cteRecursionRowLimit" -> Int.MaxValue.toString,
                   "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        // localCheckpoint EXECUTES the recursion inside the conf scope —
        // a lazily returned frame would run at action time, after the
        // finally block restored AQE and the level limit (ewmaFrame had
        // this right; the round-6 review caught it here)
        s.sql(s"""
          WITH RECURSIVE bom AS (
            SELECT p_partkey, 0 AS depth, p_retailprice, $S AS lvl
            FROM g_part_$tag WHERE p_partkey = 1
            UNION ALL
            SELECT c.p_partkey, b.depth + c.lvl, c.p_retailprice, c.lvl
            FROM bom b JOIN g_desc2_$tag c ON c.jk = b.p_partkey
            WHERE b.lvl = $S)
          SELECT CAST(depth AS INT) AS depth,
                 COUNT(*) AS n_parts,
                 MIN(p_partkey) AS min_key, MAX(p_partkey) AS max_key,
                 ${graft.functions.Portable.duckDsum("p_retailprice")} AS level_price
          FROM bom GROUP BY depth ORDER BY depth""").localCheckpoint(true)
          .orderBy("depth")
      }
    },

    // Exponential smoothing over the daily event series — the linear
    // recurrence l_t = α·x_t + (1−α)·l_{t−1} that NO window frame can
    // express (every output depends on every prior input with decaying
    // weight). α = 1/2 keeps every step IEEE-exact for this fixture:
    // counts are integers, (x + l)/2 is a power-of-two division, and
    // both engines evaluate the identical expression tree in the
    // identical order. The day axis is DENSIFIED first (generate the
    // full min..max calendar, left-join the counts, zero-fill) so a
    // silent empty day cannot break the recurrence chain.
    //
    // Execution splits at the right boundaries for 100 TB:
    //  1. the daily aggregation runs DISTRIBUTED (one map-side combined
    //     pass over events);
    //  2. the calendar-scale series (365 rows/year regardless of event
    //     volume) is collected to a LocalRelation;
    //  3. the recursion is BLOCKED — each level folds 8 days through the
    //     inlined step chain and carries only the block-end level, then
    //     one post-join expands per-day values with the same chain. The
    //     recursion's ~150 ms/level fixed cost is paid per BLOCK, not
    //     per day (30-day fixture: 4 levels, not 29; a decade: 457).
    //     Block width is the latency dial, and the expansion is
    //     arithmetic-order-identical to the daily recurrence (the spec
    //     pins bit-equality against a sequential recompute).
    "el_ewma_forecast" -> Q({
      s"""WITH RECURSIVE dy AS (
         |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dy),
         |cal AS (
         |  SELECT CAST(u.n AS INTEGER) + 1 AS di,
         |         d0 + CAST(u.n AS INTEGER) AS day
         |  FROM bounds, unnest(range(0, CAST(d1 - d0 AS INTEGER) + 1)) u(n)),
         |g_daily_dense AS (
         |  SELECT cal.di, cal.day, COALESCE(dy.c, 0) AS n_events
         |  FROM cal LEFT JOIN dy ON cal.day = dy.day),
         |${ewmaCoreSql().replaceFirst("WITH RECURSIVE ", "")}""".stripMargin
    }) { (s, d) =>
      ewmaFrame(s, d).orderBy("day")
    },

    // One-step-ahead BACKTEST of the smoother — the evaluation half a
    // forecast deployment cannot ship without: yesterday's level is
    // today's forecast, scored as mean absolute error against the
    // naive "today = yesterday" baseline, plus win/loss day counts.
    // The improvement is the go/no-go signal for replacing the naive
    // imputation in monitoring/alerting with the smoothed one. Reuses
    // the per-corpus smoothed frame (built once, shared with
    // el_ewma_forecast); the eval is one self-join on adjacent days
    // over the calendar-scale series — no events re-scan, no global
    // window. All sums are exact in binary (counts are integers, the
    // level carries ≤ depth fractional bits, and the series is far
    // below the 2^53 mantissa), so the doubles are bit-portable.
    "el_forecast_eval" -> Q(
      """WITH RECURSIVE dy AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dy),
        |cal AS (
        |  SELECT CAST(u.n AS INTEGER) + 1 AS di,
        |         d0 + CAST(u.n AS INTEGER) AS day
        |  FROM bounds, unnest(range(0, CAST(d1 - d0 AS INTEGER) + 1)) u(n)),
        |dense AS (
        |  SELECT cal.di, cal.day, COALESCE(dy.c, 0) AS n_events
        |  FROM cal LEFT JOIN dy ON cal.day = dy.day),
        |rec AS (
        |  SELECT di, day, n_events, CAST(n_events AS DOUBLE) AS ewma
        |  FROM dense WHERE di = 1
        |  UNION ALL
        |  SELECT d.di, d.day, d.n_events,
        |         (CAST(d.n_events AS DOUBLE) + r.ewma) / 2
        |  FROM rec r JOIN dense d ON d.di = r.di + 1),
        |ev AS (
        |  SELECT t.n_events AS x, p.ewma AS f, p.n_events AS nv
        |  FROM rec t JOIN rec p ON t.day = p.day + 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |       SUM(abs(CAST(x AS DOUBLE) - f)) / COUNT(*) AS mae_ewma,
        |       SUM(abs(CAST(x AS DOUBLE) - CAST(nv AS DOUBLE))) / COUNT(*)
        |         AS mae_naive,
        |       CAST(SUM(CASE WHEN abs(CAST(x AS DOUBLE) - f)
        |                       < abs(CAST(x AS DOUBLE) - CAST(nv AS DOUBLE))
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS ewma_win_days
        |FROM ev""".stripMargin) { (s, d) =>
      val f = ewmaFrame(s, d)
      val t = f.select(col("day"), col("n_events").as("x"))
      val p = f.select(col("day").as("pday"), col("ewma").as("f"),
                       col("n_events").as("nv"))
      t.join(p, col("day") === date_add(col("pday"), 1))
        .agg(count(lit(1)).as("n_days"),
             (sum(abs(col("x").cast("double") - col("f"))) / count(lit(1)))
               .as("mae_ewma"),
             (sum(abs(col("x").cast("double") - col("nv").cast("double")))
                / count(lit(1))).as("mae_naive"),
             sum(when(abs(col("x").cast("double") - col("f"))
                        < abs(col("x").cast("double") - col("nv").cast("double")),
                      1L).otherwise(0L)).as("ewma_win_days"))
    },

    // Holt double-exponential smoothing — the TREND-AWARE sibling of
    // el_ewma_forecast, and the proof that the blocked-recursion
    // pattern generalizes to VECTOR state: the carry is the (level,
    // trend) pair, and the in-block chain is generated as nested
    // subqueries (one named column per step) because the trend equation
    // references the same step's level — textual inlining would grow
    // exponentially where the nesting stays linear. α = β = 1/2 keeps
    // every step a dyadic-exact add/halve, so Spark and DuckDB agree to
    // the last bit. Emits per day the fitted level/trend and the
    // one-step-ahead forecast (l + b of the previous day) with its
    // signed error — the series a capacity planner actually charts.
    // Same execution split as the EWMA: one distributed daily
    // aggregate, calendar-densified, collected (corpus-independent),
    // then depth/8 local recursion levels.
    "el_holt_forecast" -> Q({
      s"""WITH RECURSIVE dy AS (
         |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dy),
         |cal AS (
         |  SELECT CAST(u.n AS INTEGER) + 1 AS di,
         |         d0 + CAST(u.n AS INTEGER) AS day
         |  FROM bounds, unnest(range(0, CAST(d1 - d0 AS INTEGER) + 1)) u(n)),
         |g_daily_dense AS (
         |  SELECT cal.di, cal.day, COALESCE(dy.c, 0) AS n_events
         |  FROM cal LEFT JOIN dy ON cal.day = dy.day),
         |${holtCoreSql().replaceFirst("WITH RECURSIVE ", "")}""".stripMargin
    }) { (s, d) =>
      holtFrame(s, d).orderBy("day")
    },

    // Holt-Winters daily forecast — the seasonality-aware capstone of
    // the smoothing family (EWMA → Holt → HW): one-step-ahead forecasts
    // now carry the weekly additive seasonal term, the series a
    // weekly-load planner charts. Execution split identical to the
    // siblings: one distributed daily aggregate, calendar densify,
    // depth/8 LOCAL recursion levels over the collected series — the
    // block count is calendar-bounded, never row-bounded.
    "el_hw_forecast" -> Q({
      s"""WITH RECURSIVE dy AS (
         |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dy),
         |cal AS (
         |  SELECT CAST(u.n AS INTEGER) + 1 AS di,
         |         d0 + CAST(u.n AS INTEGER) AS day
         |  FROM bounds, unnest(range(0, CAST(d1 - d0 AS INTEGER) + 1)) u(n)),
         |g_daily_dense AS (
         |  SELECT cal.di, cal.day, COALESCE(dy.c, 0) AS n_events
         |  FROM cal LEFT JOIN dy ON cal.day = dy.day),
         |${hwCoreSql().replaceFirst("WITH RECURSIVE ", "")}""".stripMargin
    }) { (s, d) =>
      hwFrame(s, d).orderBy("day")
    },

    // Holt-Winters backtest — the el_forecast_eval harness pointed at
    // the seasonal model: one-step-ahead HW forecasts against the naive
    // yesterday-equals-today baseline, MAE side by side plus win-day
    // counts. The seasonal term is the entire difference from the
    // sibling evals on a weekly-patterned log — this query MEASURES
    // whether the added state earns its keep instead of asserting it.
    "el_hw_eval" -> Q({
      s"""WITH RECURSIVE dy AS (
         |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM dy),
         |cal AS (
         |  SELECT CAST(u.n AS INTEGER) + 1 AS di,
         |         d0 + CAST(u.n AS INTEGER) AS day
         |  FROM bounds, unnest(range(0, CAST(d1 - d0 AS INTEGER) + 1)) u(n)),
         |g_daily_dense AS (
         |  SELECT cal.di, cal.day, COALESCE(dy.c, 0) AS n_events
         |  FROM cal LEFT JOIN dy ON cal.day = dy.day),
         |${hwCtes()},
         |ev AS (
         |  SELECT t.n_events AS x, t.forecast AS f, p.n_events AS nv
         |  FROM perday t JOIN perday p ON t.day = p.day + 1)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         |       SUM(abs(CAST(x AS DOUBLE) - f)) / COUNT(*) AS mae_hw,
         |       SUM(abs(CAST(x AS DOUBLE) - CAST(nv AS DOUBLE))) / COUNT(*)
         |         AS mae_naive,
         |       CAST(SUM(CASE WHEN abs(CAST(x AS DOUBLE) - f)
         |                       < abs(CAST(x AS DOUBLE) - CAST(nv AS DOUBLE))
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS hw_win_days
         |FROM ev""".stripMargin
    }) { (s, d) =>
      val f = hwFrame(s, d)
      val t = f.select(col("day"), col("n_events").as("x"), col("forecast").as("f"))
      val p = f.select(col("day").as("pday"), col("n_events").as("nv"))
      t.join(p, col("day") === date_add(col("pday"), 1))
        .agg(count(lit(1)).as("n_days"),
             (sum(abs(col("x").cast("double") - col("f"))) / count(lit(1)))
               .as("mae_hw"),
             (sum(abs(col("x").cast("double") - col("nv").cast("double")))
                / count(lit(1))).as("mae_naive"),
             sum(when(abs(col("x").cast("double") - col("f"))
                        < abs(col("x").cast("double") - col("nv").cast("double")),
                      1L).otherwise(0L)).as("hw_win_days"))
    }
  )
}
