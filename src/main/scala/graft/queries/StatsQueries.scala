package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable
import graft.functions.Portable.cents
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-summary operators over the event log and corpus: a
  * count-min sketch (the frequency twin of the HLL/KMV cardinality
  * sketches), z-score outlier detection, and data-mixture sampling
  * weights — the "how much of each source do we train on" step of a
  * pipeline.
  *
  * All three follow the portable-determinism rules (Portable.scala):
  * sketch cells from md5-derived hashes, aggregate sums over exact
  * integers (cents / quantized), per-row double math written as the
  * identical single expression in Spark and the DuckDB oracle.
  */
object StatsQueries {

  /** CMS geometry: D independent hash rows × W counters. W = 256 keeps
    * the sketch at 1 KB-scale while still showing real collision
    * overcounts on the 150-user fixture; at 100 TB both are dials (the
    * sketch stays a fixed-size aggregate either way). */
  private[graft] val D = 4
  private[graft] val W = 256

  /** Fan a keyed frame out to its D (d, cell) sketch coordinates — ONE
    * md5 per key sliced into D independent 32-bit row hashes. Shared by
    * the batch query and the streaming twin (EventStream.cmsCells) so
    * the hash family cannot drift between the two. */
  private[graft] def withCmsCells(df: org.apache.spark.sql.DataFrame,
                                  key: String,
                                  width: Int = W): org.apache.spark.sql.DataFrame =
    df.withColumn("d", explode(sequence(lit(0), lit(D - 1))))
      .withColumn("cell",
        pmod(expr(s"conv(substring(md5(CAST($key AS STRING)), 1 + 8*d, 8), 16, 10)")
               .cast("long"), lit(width)))

  /** Inner-product sketch width for q60_join_card_est. Point-query error
    * scales as N/W, but INNER-PRODUCT error scales as N_A·N_B/W — the
    * width must track the product of the stream sizes, not one stream.
    * 16384 holds the overcount near 10% at sf0.01; the query reports the
    * overcount in basis points precisely so an operator sees when the
    * dial has fallen behind the corpus. */
  private[graft] val JW = 16384

  def defs: Map[String, Q] = Map(

    // Count-min sketch: D×W integer counters, read back as min over a
    // key's D cells. est ≥ exact always (counters only overcount); the
    // emitted overcount column makes the collision error visible and
    // oracle-checked. Scale shape: the stream pre-aggregates per key
    // FIRST (map-side combined — hash work is ∝ distinct keys, not
    // stream length), then ONE md5 per key is sliced into the D
    // independent 32-bit row hashes (hex chars [1,8], [9,16], … — the
    // standard one-digest hash family), and the ≤ D·W-row sketch joins
    // back broadcast-sized at any corpus scale.
    "el_cms_counts" -> Q(
      s"""WITH exact AS (
         |  SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id),
         |keyed AS (
         |  SELECT user_id, exact_n, d,
         |         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1 + 8*d, 8)) AS BIGINT) % $W AS cell
         |  FROM exact, range(0, $D) t(d)),
         |cells AS (
         |  SELECT d, cell, CAST(SUM(exact_n) AS BIGINT) AS cnt
         |  FROM keyed GROUP BY d, cell)
         |SELECT k.user_id, MIN(c.cnt) AS cms_est, MIN(k.exact_n) AS exact_n,
         |       MIN(c.cnt) - MIN(k.exact_n) AS overcount
         |FROM keyed k JOIN cells c ON k.d = c.d AND k.cell = c.cell
         |GROUP BY k.user_id ORDER BY k.user_id""".stripMargin) { (s, d) =>
      val keyed = withCmsCells(
        Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("exact_n")),
        "user_id")
      val cells = keyed.groupBy(col("d").as("cd"), col("cell").as("ccell"))
        .agg(sum(col("exact_n")).as("cnt"))
      keyed.join(broadcast(cells), col("d") === col("cd") && col("cell") === col("ccell"))
        .groupBy("user_id")
        .agg(min(col("cnt")).as("cms_est"), min(col("exact_n")).as("exact_n"))
        .select(col("user_id"), col("cms_est"), col("exact_n"),
                (col("cms_est") - col("exact_n")).as("overcount"))
        .orderBy("user_id")
    },

    // Join-cardinality estimation by count-min INNER PRODUCT — the
    // optimizer-observability twin of el_cms_counts (AGMS/CM inner
    // product: |A ⋈ B| = Σ_k f_A(k)·f_B(k) ≤ min_d Σ_cell A_d·B_d, the
    // classic sketch a cost-based planner consults before choosing a
    // join strategy, and the exact workload here: events and orders
    // both key on the customer). The report carries the per-hash-row
    // estimates, the min (the CM estimate, always ≥ exact), the exact
    // size, and the overcount in basis points — the number that says
    // whether W is wide enough to trust the planner's choice. Scale
    // shape: both sides pre-aggregate to per-key counts (map-side
    // combined, ∝ distinct keys), sketches are fixed D×W grids joined
    // cell-to-cell, and the exact check is one key-dim equi-join —
    // nothing touches raw row pairs.
    "q60_join_card_est" -> Q(
      s"""WITH fa AS (
         |  SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
         |fb AS (
         |  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1),
         |ca AS (
         |  SELECT d, CAST(('0x' || substring(md5(CAST(k AS VARCHAR)), 1 + 8*d, 8)) AS BIGINT) % $JW AS cell,
         |         CAST(SUM(n) AS BIGINT) AS cnt
         |  FROM fa, range(0, $D) t(d) GROUP BY 1, 2),
         |cb AS (
         |  SELECT d, CAST(('0x' || substring(md5(CAST(k AS VARCHAR)), 1 + 8*d, 8)) AS BIGINT) % $JW AS cell,
         |         CAST(SUM(n) AS BIGINT) AS cnt
         |  FROM fb, range(0, $D) t(d) GROUP BY 1, 2),
         |rowest AS (
         |  SELECT ca.d, CAST(SUM(ca.cnt * cb.cnt) AS BIGINT) AS row_est
         |  FROM ca JOIN cb ON ca.d = cb.d AND ca.cell = cb.cell
         |  GROUP BY ca.d),
         |est AS (SELECT CAST(MIN(row_est) AS BIGINT) AS cms_est,
         |               CAST(MAX(row_est) AS BIGINT) AS worst_row_est FROM rowest),
         |ex AS (
         |  SELECT CAST(SUM(fa.n * fb.n) AS BIGINT) AS exact_rows
         |  FROM fa JOIN fb ON fa.k = fb.k)
         |SELECT ex.exact_rows, est.cms_est, est.worst_row_est,
         |       est.cms_est - ex.exact_rows AS overcount,
         |       CAST((est.cms_est - ex.exact_rows) * 10000 // ex.exact_rows AS BIGINT)
         |         AS overcount_bp
         |FROM ex CROSS JOIN est""".stripMargin) { (s, d) =>
      val fa = Tables.events(s, d).groupBy(col("user_id").as("k"))
        .agg(count(lit(1)).as("n"))
      val fb = Tables.orders(s, d).groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n"))
      def grid(f: org.apache.spark.sql.DataFrame) =
        withCmsCells(f, "k", JW).groupBy("d", "cell").agg(sum(col("n")).as("cnt"))
      val ca = grid(fa)
      val cb = grid(fb).select(col("d").as("bd"), col("cell").as("bcell"),
                               col("cnt").as("bcnt"))
      val rowest = ca.join(cb, col("d") === col("bd") && col("cell") === col("bcell"))
        .groupBy("d").agg(sum(col("cnt") * col("bcnt")).as("row_est"))
      val est = rowest.agg(min(col("row_est")).as("cms_est"),
                           max(col("row_est")).as("worst_row_est"))
      val ex = fa.join(fb.select(col("k"), col("n").as("bn")), "k")
        .agg(sum(col("n") * col("bn")).as("exact_rows"))
      ex.crossJoin(broadcast(est))
        .select(col("exact_rows"), col("cms_est"), col("worst_row_est"),
                (col("cms_est") - col("exact_rows")).as("overcount"),
                expr("cast((cms_est - exact_rows) * 10000 div exact_rows as bigint)")
                  .as("overcount_bp"))
    },

    // Markov transition matrix over per-user event sequences: the
    // next-event-prediction feature table. One partitioned lag window
    // (per user — never global), integer transition counts, and the row
    // probability is a single BIGINT→DOUBLE division. At corpus scale
    // the window is per-user-bounded and the count aggregate is
    // map-side combined; the |types|² output is a broadcastable dim.
    "el_markov_transitions" -> Q(
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         LAG(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY epoch_ns(ts)//1000, event_id) AS prev_type
        |  FROM events),
        |cnt AS (
        |  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        |  FROM seq WHERE prev_type IS NOT NULL
        |  GROUP BY prev_type, next_type),
        |tot AS (
        |  SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_total
        |  FROM cnt GROUP BY prev_type)
        |SELECT c.prev_type, c.next_type, c.n,
        |       CAST(c.n AS DOUBLE) / CAST(t.row_total AS BIGINT) AS prob
        |FROM cnt c JOIN tot t ON c.prev_type = t.prev_type
        |ORDER BY c.prev_type, c.next_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")), col("event_id"))
      val cnt = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
                lag(col("event_type"), 1).over(w).as("prev_type"))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy(col("prev_type").as("t_prev"))
        .agg(sum(col("n")).as("row_total"))
      cnt.join(broadcast(tot), col("prev_type") === col("t_prev"))
        .select(col("prev_type"), col("next_type"), col("n"),
                (col("n").cast("double") / col("row_total")).as("prob"))
        .orderBy("prev_type", "next_type")
    },

    // Bitmap-index audience overlap: distinct-user intersections between
    // event types WITHOUT ever shuffling raw user ids — each (type,
    // 32-user word) packs membership into one BIGINT via bit_or, and
    // intersections are bit_count(a & b) summed over words (the
    // roaring-bitmap pattern of Druid/ClickHouse, in its fixed-width
    // portable form). The shuffle is |types|·|users|/32 longs, and the
    // pair join is an equi-join on the word index. All-integer until the
    // final Jaccard division.
    "el_bitmap_overlap" -> Q(
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |bm AS (
        |  SELECT event_type, user_id // 32 AS word,
        |         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER)) AS bmask
        |  FROM tu GROUP BY event_type, word),
        |cnt AS (
        |  SELECT event_type, CAST(SUM(bit_count(bmask)) AS BIGINT) AS n_users
        |  FROM bm GROUP BY event_type),
        |ov AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb,
        |         CAST(SUM(bit_count(a.bmask & b.bmask)) AS BIGINT) AS overlap
        |  FROM bm a JOIN bm b ON a.word = b.word AND a.event_type < b.event_type
        |  GROUP BY ta, tb)
        |SELECT o.ta, o.tb, ca.n_users AS users_a, cb.n_users AS users_b, o.overlap,
        |       CAST(o.overlap AS DOUBLE)
        |         / CAST(ca.n_users + cb.n_users - o.overlap AS DOUBLE) AS jaccard
        |FROM ov o JOIN cnt ca ON o.ta = ca.event_type
        |          JOIN cnt cb ON o.tb = cb.event_type
        |ORDER BY ta, tb""".stripMargin) { (s, d) =>
      val bm = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
        .select(col("event_type"), expr("user_id div 32").as("word"),
                expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))").as("bmask"))
        .groupBy("event_type", "word").agg(bit_or(col("bmask")).as("bmask"))
      val cnt = bm.groupBy("event_type")
        .agg(sum(bit_count(col("bmask")).cast("long")).as("n_users"))
      val a = bm.select(col("event_type").as("ta"), col("word").as("wa"), col("bmask").as("ba"))
      val b = bm.select(col("event_type").as("tb"), col("word").as("wb"), col("bmask").as("bb"))
      val ov = a.join(b, col("wa") === col("wb") && col("ta") < col("tb"))
        .groupBy("ta", "tb")
        .agg(sum(bit_count(col("ba").bitwiseAND(col("bb"))).cast("long")).as("overlap"))
      ov.join(broadcast(cnt.select(col("event_type").as("ca_t"), col("n_users").as("users_a"))),
              col("ta") === col("ca_t"))
        .join(broadcast(cnt.select(col("event_type").as("cb_t"), col("n_users").as("users_b"))),
              col("tb") === col("cb_t"))
        .select(col("ta"), col("tb"), col("users_a"), col("users_b"), col("overlap"),
                (col("overlap").cast("double") /
                 (col("users_a") + col("users_b") - col("overlap")).cast("double")).as("jaccard"))
        .orderBy("ta", "tb")
    },

    // Z-ORDER layout audit: the data-layout half of scan performance at
    // 100 TB. Events get two candidate file-layout keys — the bit
    // interleave of (user, day) (Z-curve, 8 bits each) and the
    // day-major concatenation — and each layout's 256 "files" (key
    // div 256) are profiled for per-file span of BOTH dimensions. The
    // Z-curve bounds users AND days per file (≤16×16 cells), so a range
    // predicate on EITHER column prunes ~15/16 of files, where the
    // day-major layout prunes only on day and every file spans all
    // users. Pure integer bit math — engine-portable to the bit.
    "el_zorder_layout" -> Q {
      val zTerms = (0 until 8).map(i =>
        s"(((u >> $i) & 1) << ${2 * i + 1}) + (((dy >> $i) & 1) << ${2 * i})")
        .mkString(" + ")
      s"""WITH base AS (
         |  SELECT user_id % 256 AS u,
         |         (epoch_ns(ts)//86400000000000) % 256 AS dy
         |  FROM events),
         |keyed AS (
         |  SELECT u, dy, ($zTerms) AS zkey, dy * 256 + u AS ckey
         |  FROM base),
         |files AS (
         |  SELECT 'zorder' AS layout, zkey // 256 AS file_id,
         |         COUNT(*) AS n_rows,
         |         MAX(u) - MIN(u) AS user_span, MAX(dy) - MIN(dy) AS day_span
         |  FROM keyed GROUP BY file_id
         |  UNION ALL
         |  SELECT 'daymajor', ckey // 256,
         |         COUNT(*), MAX(u) - MIN(u), MAX(dy) - MIN(dy)
         |  FROM keyed GROUP BY 2)
         |SELECT layout, COUNT(*) AS n_files,
         |       CAST(SUM(n_rows) AS BIGINT) AS total_rows,
         |       MAX(user_span) AS max_user_span, MAX(day_span) AS max_day_span,
         |       CAST(CAST(SUM(user_span) AS BIGINT) AS DOUBLE)
         |         / CAST(COUNT(*) AS DOUBLE) AS avg_user_span,
         |       CAST(CAST(SUM(day_span) AS BIGINT) AS DOUBLE)
         |         / CAST(COUNT(*) AS DOUBLE) AS avg_day_span
         |FROM files GROUP BY layout ORDER BY layout""".stripMargin
    } { (s, d) =>
      val base = Tables.events(s, d).select(
        pmod(col("user_id"), lit(256)).as("u"),
        pmod(expr("unix_micros(ts) div 86400000000"), lit(256L)).as("dy"))
      val zkey = (0 until 8).map(i =>
        (shiftright(col("u"), i).bitwiseAND(lit(1)) * lit(1L << (2 * i + 1))) +
        (shiftright(col("dy"), i).bitwiseAND(lit(1)) * lit(1L << (2 * i)))
      ).reduce(_ + _)
      val keyed = base.select(col("u"), col("dy"), zkey.as("zkey"),
                              (col("dy") * 256 + col("u")).as("ckey"))
      def profile(layout: String, key: org.apache.spark.sql.Column) =
        keyed.groupBy((key / 256).cast("long").as("file_id"))
          .agg(count(lit(1)).as("n_rows"),
               (max(col("u")) - min(col("u"))).as("user_span"),
               (max(col("dy")) - min(col("dy"))).as("day_span"))
          .select(lit(layout).as("layout"), col("file_id"),
                  col("n_rows"), col("user_span"), col("day_span"))
      profile("zorder", col("zkey")).unionByName(profile("daymajor", col("ckey")))
        .groupBy("layout")
        .agg(count(lit(1)).as("n_files"),
             sum(col("n_rows")).as("total_rows"),
             max(col("user_span")).as("max_user_span"),
             max(col("day_span")).as("max_day_span"),
             (sum(col("user_span")).cast("double") / count(lit(1)).cast("double"))
               .as("avg_user_span"),
             (sum(col("day_span")).cast("double") / count(lit(1)).cast("double"))
               .as("avg_day_span"))
        .orderBy("layout")
    },

    // Z-score outliers: per-event-type mean/std from EXACT integer-cents
    // sums (sum and sum-of-squares are associative longs, so the partial
    // aggregation order cannot perturb them), then each event's z in one
    // IEEE-exact expression, top-5 |z| per type. The |z| ordering key is
    // computed in a prior step and only RANKED in the window (computed
    // doubles never originate inside a window frame — oracle-parity
    // rule). Stats dim is 5 rows → broadcast join back to the stream.
    "el_anomaly_zscore" -> Q(
      """WITH ev AS (
        |  SELECT event_id, event_type, value,
        |         CAST(round(value*100) AS BIGINT) AS c
        |  FROM events),
        |st AS (
        |  SELECT event_type,
        |         CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_c,
        |         sqrt(CAST(CAST(SUM(c*c) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |              - (CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
        |                * (CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))) AS std_c
        |  FROM ev GROUP BY event_type),
        |z AS (
        |  SELECT e.event_id, e.event_type, e.value,
        |         (CAST(e.c AS DOUBLE) - s.mean_c) / s.std_c AS zscore,
        |         abs((CAST(e.c AS DOUBLE) - s.mean_c) / s.std_c) AS zabs
        |  FROM ev e JOIN st s ON e.event_type = s.event_type),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |                               ORDER BY zabs DESC, event_id) AS rank
        |  FROM z)
        |SELECT event_id, event_type, value, zscore, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 5 ORDER BY event_type, rank""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(
        col("event_id"), col("event_type"), col("value"),
        cents(col("value")).as("c"))
      val meanC = sum(col("c")).cast("double") / count(lit(1)).cast("double")
      val st = ev.groupBy(col("event_type").as("st_type"))
        .agg(meanC.as("mean_c"),
             sqrt(sum(col("c") * col("c")).cast("double") / count(lit(1)).cast("double")
                  - meanC * meanC).as("std_c"))
      val zcol = (col("c").cast("double") - col("mean_c")) / col("std_c")
      val w = Window.partitionBy("event_type").orderBy(col("zabs").desc, col("event_id"))
      ev.join(broadcast(st), col("event_type") === col("st_type"))
        .select(col("event_id"), col("event_type"), col("value"),
                zcol.as("zscore"), abs(zcol).as("zabs"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("event_id"), col("event_type"), col("value"), col("zscore"),
                col("rank").cast("int").as("rank"))
        .orderBy("event_type", "rank")
    },

    // The SAMPLER that realizes the mixture weights: every doc draws a
    // deterministic uniform from md5 (stable across runs/engines — a
    // pipeline can re-run assignment and never flip a document), and
    // keeps it when the draw falls under its source's boosted rate
    // (base 0.5 × temperature boost, capped at 1). The per-source rate
    // dim is broadcast; the scan stays one pass. Realized rates land
    // within binomial noise of the targets and both are emitted, so the
    // oracle checks target arithmetic AND the draw itself.
    "ta_mixture_sample" -> Q(
      """WITH per_src AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |         CAST(SUM(length(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |q AS (
        |  SELECT source, n_docs, n_tokens,
        |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS qs
        |  FROM per_src),
        |tot AS (
        |  SELECT CAST(SUM(qs) AS BIGINT) AS tot_qs,
        |         CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens
        |  FROM q),
        |rates AS (
        |  SELECT source, n_docs,
        |         least(CAST(1000000 AS BIGINT),
        |               CAST(floor(CAST(qs AS DOUBLE) / CAST(tot_qs AS DOUBLE)
        |                    / (CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE))
        |                    * CAST(0.5 AS DOUBLE) * 1000000) AS BIGINT)) AS thresh
        |  FROM q, tot),
        |drawn AS (
        |  SELECT d.source, r.n_docs, r.thresh,
        |         CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || '|sample'), 1, 15)) AS BIGINT)
        |           % 1000000 AS draw,
        |         CAST(length(string_split(d.text, ' ')) AS BIGINT) AS ntok
        |  FROM documents d JOIN rates r ON d.source = r.source)
        |SELECT source,
        |       CAST(thresh AS DOUBLE) / CAST(1000000 AS DOUBLE) AS target_rate,
        |       COUNT(CASE WHEN draw < thresh THEN 1 END) AS sampled_docs,
        |       CAST(SUM(CASE WHEN draw < thresh THEN ntok ELSE 0 END) AS BIGINT) AS sampled_tokens,
        |       CAST(COUNT(CASE WHEN draw < thresh THEN 1 END) AS DOUBLE)
        |         / CAST(MIN(n_docs) AS DOUBLE) AS realized_rate
        |FROM drawn GROUP BY source, thresh ORDER BY source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val per = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(size(Portable.tokens(col("text"))).cast("long")).as("n_tokens"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
                floor(sqrt(col("n_tokens").cast("double")) * 1000000).cast("long").as("qs"))
      val tot = per.agg(sum(col("qs")).as("tot_qs"), sum(col("n_tokens")).as("tot_tokens"))
      val boost = col("qs").cast("double") / col("tot_qs").cast("double") /
        (col("n_tokens").cast("double") / col("tot_tokens").cast("double"))
      val rates = per.crossJoin(broadcast(tot))
        .select(col("source").as("r_source"), col("n_docs"),
                least(lit(1000000L),
                      floor(boost * lit(0.5) * lit(1000000)).cast("long")).as("thresh"))
      docs.join(broadcast(rates), col("source") === col("r_source"))
        .select(col("source"), col("n_docs"), col("thresh"),
                pmod(Portable.h60(concat(col("doc_id").cast("string"), lit("|sample"))),
                     lit(1000000L)).as("draw"),
                size(Portable.tokens(col("text"))).cast("long").as("ntok"))
        .groupBy("source", "thresh")
        .agg(count(when(col("draw") < col("thresh"), 1)).as("sampled_docs"),
             sum(when(col("draw") < col("thresh"), col("ntok")).otherwise(0L)).as("sampled_tokens"),
             (count(when(col("draw") < col("thresh"), 1)).cast("double") /
              min(col("n_docs")).cast("double")).as("realized_rate"))
        .select(col("source"),
                (col("thresh").cast("double") / lit(1000000.0)).as("target_rate"),
                col("sampled_docs"), col("sampled_tokens"), col("realized_rate"))
        .orderBy("source")
    },

    // Data-mixture sampling weights: the per-source "how much to train
    // on" table. Weight ∝ tokens^0.5 (temperature-0.5 mixture — sqrt is
    // the one IEEE-exact non-integer power), normalized over sources.
    // Normalization sums go through floor(·1e6) BIGINT quantization
    // (exact/associative — a raw double sum would be order-dependent),
    // and the sampling boost (weight ÷ natural share) is one fixed
    // left-to-right expression in both engines. The source dim is tiny,
    // but every sum below is map-side combined off the full corpus scan,
    // so the shape holds when sources number in the thousands.
    "ta_mixture_weights" -> Q(
      """WITH per_src AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |         CAST(SUM(length(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |q AS (
        |  SELECT source, n_docs, n_tokens,
        |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS qs
        |  FROM per_src),
        |tot AS (
        |  SELECT CAST(SUM(qs) AS BIGINT) AS tot_qs,
        |         CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens
        |  FROM q)
        |SELECT source, n_docs, n_tokens,
        |       CAST(qs AS DOUBLE) / CAST(tot_qs AS DOUBLE) AS weight,
        |       CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE) AS natural_share,
        |       CAST(qs AS DOUBLE) / CAST(tot_qs AS DOUBLE)
        |         / (CAST(n_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE)) AS boost
        |FROM q, tot ORDER BY source""".stripMargin) { (s, d) =>
      val per = Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(size(Portable.tokens(col("text"))).cast("long")).as("n_tokens"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
                floor(sqrt(col("n_tokens").cast("double")) * 1000000).cast("long").as("qs"))
      val tot = per.agg(sum(col("qs")).as("tot_qs"), sum(col("n_tokens")).as("tot_tokens"))
      val weight = col("qs").cast("double") / col("tot_qs").cast("double")
      val share  = col("n_tokens").cast("double") / col("tot_tokens").cast("double")
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
                weight.as("weight"), share.as("natural_share"),
                (weight / share).as("boost"))
        .orderBy("source")
    }
  )
}
