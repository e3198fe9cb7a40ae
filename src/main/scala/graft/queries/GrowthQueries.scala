package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable.{cents, duckCents, duckH, h60}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics growth surface over `events` — the four reports a
  * consumer-scale event log is actually interrogated with, each kept
  * all-integer (or fixed-op-order IEEE on exact BIGINT terms) so the
  * DuckDB twins are hash-exact:
  *
  *  - `el_lifecycle`: daily growth accounting (new / retained /
  *    resurrected / churning) — the "quick ratio" input table.
  *  - `el_seasonal_profile`: hour-of-day × event-type seasonality with
  *    integer deviation-from-uniform — the load-shaping profile.
  *  - `el_pareto_share`: activity-concentration ladder (CCDF over a
  *    threshold grid) — the whale-curve without a global sort.
  *  - `el_cuped`: variance-reduced A/B readout (CUPED, Deng et al.
  *    2013) using the pre-period metric as the control covariate.
  *
  * Reference note: the cascade broker stores the raw event stream
  * (/root/reference/src/broker/main.rs:53) and leaves all analytics to
  * consumers; these queries are that consumer surface, re-expressed as
  * one-pass Spark aggregates.
  */
object GrowthQueries {

  private val US_PER_DAY  = 86400000000L
  private val US_PER_HOUR = 3600000000L

  def defs: Map[String, Q] = Map(

    // Daily growth accounting. Scale shape: the event log collapses to
    // DISTINCT (user, day) FIRST (map-side combined — the only pass over
    // raw events), then every classification is a per-user lag/lead
    // window over that user-days table, which is |users|·|active days|
    // — dimension-scale, never event-scale. No global window, no self
    // join; churn is read off the same lead() that retention uses.
    "el_lifecycle" -> Q(
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts)//1000//86400000000 AS day_idx
        |  FROM events),
        |c AS (
        |  SELECT user_id, day_idx,
        |         MIN(day_idx) OVER (PARTITION BY user_id) AS first_day,
        |         LAG(day_idx)  OVER (PARTITION BY user_id ORDER BY day_idx) AS prev_day,
        |         LEAD(day_idx) OVER (PARTITION BY user_id ORDER BY day_idx) AS next_day
        |  FROM ud)
        |SELECT day_idx,
        |       CAST(COUNT(*) AS BIGINT) AS n_active,
        |       CAST(SUM(CASE WHEN day_idx = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |       CAST(SUM(CASE WHEN prev_day = day_idx - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |       CAST(SUM(CASE WHEN prev_day IS NOT NULL AND prev_day < day_idx - 1
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
        |       CAST(SUM(CASE WHEN next_day IS NULL OR next_day > day_idx + 1
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_churning
        |FROM c GROUP BY day_idx ORDER BY day_idx""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"),
                expr(s"unix_micros(ts) div $US_PER_DAY").as("day_idx"))
        .distinct()
      val wAll = Window.partitionBy(col("user_id"))
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("day_idx"))
      ud.select(col("user_id"), col("day_idx"),
                min(col("day_idx")).over(wAll).as("first_day"),
                lag(col("day_idx"), 1).over(wOrd).as("prev_day"),
                lead(col("day_idx"), 1).over(wOrd).as("next_day"))
        .groupBy("day_idx")
        .agg(count(lit(1)).as("n_active"),
             sum(when(col("day_idx") === col("first_day"), 1L).otherwise(0L)).as("n_new"),
             sum(when(col("prev_day") === col("day_idx") - 1, 1L).otherwise(0L)).as("n_retained"),
             sum(when(col("prev_day").isNotNull && col("prev_day") < col("day_idx") - 1,
                      1L).otherwise(0L)).as("n_resurrected"),
             sum(when(col("next_day").isNull || col("next_day") > col("day_idx") + 1,
                      1L).otherwise(0L)).as("n_churning"))
        .orderBy("day_idx")
    },

    // Hour-of-day seasonality per event type. One map-side-combined
    // aggregate to the 5×24 grid, then the per-type total rides a
    // window PARTITIONED BY event_type (≤24 rows per partition — the
    // grid, not the log). Hour extraction is pure integer arithmetic
    // on epoch micros, so no engine calendar code is on the hash path.
    // dev_bp = (share of the type's events in this hour − uniform
    // 1/24) in basis points, floor-divided — all-integer.
    "el_seasonal_profile" -> Q(
      """WITH g AS (
        |  SELECT event_type,
        |         (epoch_ns(ts)//1000//3600000000) % 24 AS hour_of_day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, hour_of_day, n,
        |       CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS type_total,
        |       (n * 10000) // CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
        |         AS share_bp,
        |       (n * 24 * 10000) // CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
        |         - 10000 AS dev_bp
        |FROM g ORDER BY event_type, hour_of_day""".stripMargin) { (s, d) =>
      val g = Tables.events(s, d)
        .select(col("event_type"),
                expr(s"(unix_micros(ts) div $US_PER_HOUR) % 24").as("hour_of_day"))
        .groupBy("event_type", "hour_of_day")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type"))
      g.select(col("event_type"), col("hour_of_day"), col("n"),
               sum(col("n")).over(w).as("type_total"))
        .select(col("event_type"), col("hour_of_day"), col("n"), col("type_total"),
                expr("(n * 10000) div type_total").as("share_bp"),
                expr("(n * 24 * 10000) div type_total - 10000").as("dev_bp"))
        .orderBy("event_type", "hour_of_day")
    },

    // Activity-concentration ladder (the whale curve as a CCDF). The
    // classic "top decile's share" needs a GLOBAL rank over users; this
    // reformulation reads the same concentration off a fixed threshold
    // grid instead: for each T, how many users produced ≥T events and
    // what share of all events they carry. One map-side-combined
    // per-user count, an 11-row broadcast threshold dim (the explode
    // multiplies the user table, not the log), totals as a broadcast
    // scalar — no global sort or window anywhere, the reformulation
    // that survives a billion-user log.
    "el_pareto_share" -> Q(
      """WITH uc AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY user_id),
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users, CAST(SUM(cnt) AS BIGINT) AS n_events
        |  FROM uc),
        |th AS (SELECT CAST(unnest([1,2,4,8,16,32,64,128,256,512,1024]) AS BIGINT) AS threshold),
        |l AS (
        |  SELECT th.threshold,
        |         CAST(SUM(CASE WHEN uc.cnt >= th.threshold THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_users_ge,
        |         CAST(SUM(CASE WHEN uc.cnt >= th.threshold THEN uc.cnt ELSE 0 END) AS BIGINT)
        |           AS n_events_ge
        |  FROM uc, th GROUP BY th.threshold)
        |SELECT l.threshold, l.n_users_ge, l.n_events_ge,
        |       (l.n_users_ge * 10000) // tot.n_users AS users_share_bp,
        |       (l.n_events_ge * 10000) // tot.n_events AS events_share_bp
        |FROM l, tot ORDER BY l.threshold""".stripMargin) { (s, d) =>
      val uc = Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("cnt"))
      val tot = uc.agg(count(lit(1)).as("n_users"), sum(col("cnt")).as("n_events"))
      val thresholds = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L, 512L, 1024L)
      val th = uc.sparkSession.range(1).select(
        explode(array(thresholds.map(lit): _*)).as("threshold"))
      uc.crossJoin(broadcast(th))
        .groupBy("threshold")
        .agg(sum(when(col("cnt") >= col("threshold"), 1L).otherwise(0L)).as("n_users_ge"),
             sum(when(col("cnt") >= col("threshold"), col("cnt")).otherwise(0L)).as("n_events_ge"))
        .crossJoin(broadcast(tot))
        .select(col("threshold"), col("n_users_ge"), col("n_events_ge"),
                expr("(n_users_ge * 10000) div n_users").as("users_share_bp"),
                expr("(n_events_ge * 10000) div n_events").as("events_share_bp"))
        .orderBy("threshold")
    },

    // CUPED variance-reduced A/B readout (Deng et al., WSDM 2013): the
    // pre-period purchase total is the control covariate; the adjusted
    // post-period mean per variant is mean_y − θ·(mean_x − mean_x_all)
    // with θ = cov(x,y)/var(x) pooled over both arms. Every sum is an
    // exact integer-cents BIGINT (order-independent, so partial aggs
    // are safe); θ and the adjusted means are then a FIXED tree of
    // correctly-rounded IEEE ops on those exact terms — both engines
    // state the identical tree, so the doubles match bitwise (the
    // q38_corr_manual discipline). Headroom: n·Σxy stays under 2^63 to
    // ~1e4 users × $10k/user; past that the accounting widens to
    // DECIMAL and gives up oracle bit-parity, not correctness (the
    // Portable.cents note). Scale shape: one pass over events into a
    // per-user (x, y) table, one scalar agg (θ terms, broadcast), one
    // 2-row variant agg — no window, no join on the log.
    "el_cuped" -> Q({
      val variant = s"${duckH("'exp1|' || CAST(user_id AS VARCHAR)", 15)} % 2"
      s"""WITH b AS (
         |  SELECT user_id, epoch_ns(ts)//1000//86400000000 AS day_idx, event_type,
         |         ${duckCents("value")} AS vc
         |  FROM events),
         |t0 AS (SELECT MIN(day_idx) AS day0 FROM b),
         |pu AS (
         |  SELECT user_id, $variant AS variant,
         |         CAST(SUM(CASE WHEN event_type = 'purchase' AND day_idx < t0.day0 + 15
         |                       THEN vc ELSE 0 END) AS BIGINT) AS x,
         |         CAST(SUM(CASE WHEN event_type = 'purchase' AND day_idx >= t0.day0 + 15
         |                       THEN vc ELSE 0 END) AS BIGINT) AS y
         |  FROM b, t0 GROUP BY 1, 2),
         |g AS (
         |  SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(x) AS HUGEINT) AS sx,
         |         CAST(SUM(y) AS HUGEINT) AS sy,
         |         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         |         SUM(CAST(x AS HUGEINT) * y) AS sxy
         |  FROM pu),
         |v AS (
         |  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
         |         CAST(SUM(x) AS BIGINT) AS pre_cents, CAST(SUM(y) AS BIGINT) AS post_cents
         |  FROM pu GROUP BY variant)
         |SELECT CASE WHEN v.variant = 0 THEN 'control' ELSE 'treatment' END AS variant,
         |       v.n_users, v.pre_cents, v.post_cents,
         |       CAST(v.post_cents AS DOUBLE) / CAST(v.n_users AS DOUBLE) AS mean_post,
         |       CAST(g.n*g.sxy - g.sx*g.sy AS DOUBLE)
         |         / CAST(g.n*g.sxx - g.sx*g.sx AS DOUBLE) AS theta,
         |       CAST(v.post_cents AS DOUBLE) / CAST(v.n_users AS DOUBLE)
         |         - (CAST(g.n*g.sxy - g.sx*g.sy AS DOUBLE)
         |              / CAST(g.n*g.sxx - g.sx*g.sx AS DOUBLE))
         |           * (CAST(v.pre_cents AS DOUBLE) / CAST(v.n_users AS DOUBLE)
         |                - CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE)) AS adj_mean_post
         |FROM v, g ORDER BY variant""".stripMargin
    }) { (s, d) =>
      val b = Tables.events(s, d)
        .select(col("user_id"),
                expr(s"unix_micros(ts) div $US_PER_DAY").as("day_idx"),
                col("event_type"), cents(col("value")).as("vc"))
      val t0 = b.agg(min(col("day_idx")).as("day0"))
      val pu = b.crossJoin(broadcast(t0))
        .withColumn("variant",
          pmod(h60(concat(lit("exp1|"), col("user_id").cast("string"))), lit(2L)))
        .groupBy("user_id", "variant")
        .agg(sum(when(col("event_type") === "purchase" && col("day_idx") < col("day0") + 15,
                      col("vc")).otherwise(0L)).as("x"),
             sum(when(col("event_type") === "purchase" && col("day_idx") >= col("day0") + 15,
                      col("vc")).otherwise(0L)).as("y"))
      // 128-bit moments (round 10): theta's cross-terms n*sxx and sx*sx
      // reach ~10^22 at sf10 (the count()-actioned bench never executed
      // this aggregate — outer-join elimination — so the overflow
      // surfaced only when the noop action ran the real plan). DECIMAL
      // (38,0) here ≡ HUGEINT in the oracle: both hold the exact
      // integer, and the final cast-to-double of identical integers is
      // correctly rounded in both engines.
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val g = pu.agg(count(lit(1)).cast(d38).as("n"),
                     sum(col("x")).cast(d38).as("sx"),
                     sum(col("y")).cast(d38).as("sy"),
                     sum(col("x").cast(d38) * col("x")).as("sxx"),
                     sum(col("x").cast(d38) * col("y")).as("sxy"))
      pu.groupBy("variant")
        .agg(count(lit(1)).as("n_users"), sum(col("x")).as("pre_cents"),
             sum(col("y")).as("post_cents"))
        .crossJoin(broadcast(g))
        .select(
          when(col("variant") === 0, "control").otherwise("treatment").as("variant"),
          col("n_users"), col("pre_cents"), col("post_cents"),
          (col("post_cents").cast("double") / col("n_users").cast("double")).as("mean_post"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
             / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")).as("theta"),
          (col("post_cents").cast("double") / col("n_users").cast("double")
             - ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
                  / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
               * (col("pre_cents").cast("double") / col("n_users").cast("double")
                    - col("sx").cast("double") / col("n").cast("double"))).as("adj_mean_post"))
        .orderBy("variant")
    },

    // Poisson-bootstrap confidence interval for mean purchase value —
    // the ONE bootstrap that works at log scale (Chamandy et al.,
    // Google 2012): instead of materializing B resamples, each row
    // draws an independent Poisson(1) replication weight per replicate,
    // so the whole interval costs one pass with a B-fold in-flight
    // explode that map-side-combines to B partial sums (never B data
    // copies). Determinism: the weight is the inverse Poisson(1) CDF
    // applied to a 32-bit md5 hash of (replicate, event_id) — the CDF
    // breakpoints are hardcoded integer thresholds on the hash range
    // (floor(cdf·2³²)), identical literals in both engines, so the
    // "randomness" is hash-portable. The interval is read as ORDER
    // STATISTICS of the 32 replicate means (2nd / 16-17th / 31st) via
    // one sorted ≤32-element array — no cross-row double sums, so no
    // float-order hazard; replicate means themselves are exact-BIGINT
    // sums with one final IEEE division each.
    "el_bootstrap_ci" -> Q({
      val h = duckH("'boot|' || CAST(r.b AS VARCHAR) || '|' || CAST(p.event_id AS VARCHAR)", 8)
      s"""WITH p AS (
         |  SELECT event_id, ${duckCents("value")} AS x
         |  FROM events WHERE event_type = 'purchase'),
         |reps AS (SELECT unnest(range(0, 32)) AS b),
         |hw AS (
         |  SELECT p.x, r.b, $h AS h FROM p, reps r),
         |w AS (
         |  SELECT x, b,
         |         CASE WHEN h < 1580030168 THEN 0 WHEN h < 3160060337 THEN 1
         |              WHEN h < 3950075421 THEN 2 WHEN h < 4213413783 THEN 3
         |              WHEN h < 4279248373 THEN 4 WHEN h < 4292415291 THEN 5
         |              WHEN h < 4294609777 THEN 6 ELSE 7 END AS w
         |  FROM hw),
         |m AS (
         |  SELECT b, CAST(SUM(w) AS BIGINT) AS sw, CAST(SUM(w * x) AS BIGINT) AS swx
         |  FROM w GROUP BY b),
         |mm AS (
         |  SELECT b, CASE WHEN sw = 0 THEN 0.0
         |                 ELSE CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) END AS mb
         |  FROM m),
         |arr AS (SELECT list_sort(list(mb)) AS a FROM mm),
         |pt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx FROM p)
         |SELECT pt.n AS n_purchases,
         |       CAST(pt.sx AS DOUBLE) / CAST(pt.n AS DOUBLE) AS point_mean_cents,
         |       a[2] AS boot_lo, (a[16] + a[17]) / 2 AS boot_median, a[31] AS boot_hi,
         |       CAST(32 AS BIGINT) AS n_replicates
         |FROM pt, arr""".stripMargin
    }) { (s, d) =>
      // round 11: ONE events pass. The 32 replicate weights come from a
      // codegen kernel (functions/BootWeights.scala — one thread-local
      // digest over the same "boot|b|id" bytes) instead of 32
      // interpreted md5(concat…)→hex→conv chains per event, and the
      // point estimate (n, Σx) rides the SAME per-replicate rollup as
      // per-replicate (count, Σx) read at b = 0 — the separate pt
      // branch re-scanned events. coalesce keeps n = 0 on an empty
      // purchase set, matching COUNT(*).
      graft.functions.BootWeights.register(s)
      val p = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), cents(col("value")).as("x"))
      val hw = p.select(col("x"),
        posexplode(expr("graft_boot_weights(event_id)")).as(Seq("b", "w")))
      val mmFull = hw.groupBy("b")
        .agg(sum(col("w")).as("sw"), sum(col("w") * col("x")).as("swx"),
             count(lit(1)).as("nb"), sum(col("x")).as("sxb"))
      mmFull
        .select(col("b"),
                when(col("sw") === 0, lit(0.0))
                  .otherwise(col("swx").cast("double") / col("sw").cast("double"))
                  .as("mb"),
                col("nb"), col("sxb"))
        .agg(sort_array(collect_list(col("mb"))).as("a"),
             coalesce(sum(when(col("b") === 0, col("nb"))), lit(0L)).as("n"),
             sum(when(col("b") === 0, col("sxb"))).as("sx"))
        .select(col("n").as("n_purchases"),
                (col("sx").cast("double") / col("n").cast("double")).as("point_mean_cents"),
                element_at(col("a"), 2).as("boot_lo"),
                ((element_at(col("a"), 16) + element_at(col("a"), 17)) / 2).as("boot_median"),
                element_at(col("a"), 31).as("boot_hi"),
                lit(32L).as("n_replicates"))
    },

    // User-lifetime survival ladder — the retention CCDF with explicit
    // right-censoring: lifetime = last active day − first active day;
    // users still active on the corpus's final day are censored (their
    // true lifetime exceeds what the log shows — the Kaplan-Meier
    // caveat, reported as a per-rung censored count instead of a
    // product-limit estimate so the table stays all-integer). Scale
    // shape: one map-side-combined per-user (first, last) aggregate,
    // a broadcast corpus-max-day scalar, a 10-row broadcast ladder dim.
    "el_survival" -> Q(
      """WITH ud AS (
        |  SELECT user_id,
        |         MIN(epoch_ns(ts)//1000//86400000000) AS fd,
        |         MAX(epoch_ns(ts)//1000//86400000000) AS ld
        |  FROM events GROUP BY user_id),
        |mx AS (SELECT MAX(ld) AS max_day, CAST(COUNT(*) AS BIGINT) AS n_users FROM ud),
        |u AS (
        |  SELECT user_id, ld - fd AS lifetime,
        |         CASE WHEN ld = mx.max_day THEN 1 ELSE 0 END AS censored
        |  FROM ud, mx),
        |th AS (SELECT CAST(unnest([0,1,2,3,5,7,10,14,21,28]) AS BIGINT) AS min_lifetime_days)
        |SELECT th.min_lifetime_days,
        |       CAST(SUM(CASE WHEN u.lifetime >= th.min_lifetime_days THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_surviving,
        |       CAST(SUM(CASE WHEN u.lifetime >= th.min_lifetime_days
        |                     THEN u.censored ELSE 0 END) AS BIGINT) AS n_censored,
        |       (CAST(SUM(CASE WHEN u.lifetime >= th.min_lifetime_days THEN 1 ELSE 0 END)
        |             AS BIGINT) * 10000) // mx.n_users AS surviving_bp
        |FROM u, th, mx
        |GROUP BY th.min_lifetime_days, mx.n_users
        |ORDER BY th.min_lifetime_days""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), expr(s"unix_micros(ts) div $US_PER_DAY").as("day_idx"))
        .groupBy("user_id")
        .agg(min(col("day_idx")).as("fd"), max(col("day_idx")).as("ld"))
      val mx = ud.agg(max(col("ld")).as("max_day"), count(lit(1)).as("n_users"))
      val u = ud.crossJoin(broadcast(mx))
        .select((col("ld") - col("fd")).as("lifetime"),
                when(col("ld") === col("max_day"), 1L).otherwise(0L).as("censored"))
      val th = u.sparkSession.range(1).select(
        explode(array(Seq(0L, 1L, 2L, 3L, 5L, 7L, 10L, 14L, 21L, 28L).map(lit): _*))
          .as("min_lifetime_days"))
      u.crossJoin(broadcast(th))
        .groupBy("min_lifetime_days")
        .agg(sum(when(col("lifetime") >= col("min_lifetime_days"), 1L).otherwise(0L))
               .as("n_surviving"),
             sum(when(col("lifetime") >= col("min_lifetime_days"), col("censored"))
               .otherwise(0L)).as("n_censored"))
        .crossJoin(broadcast(mx.select("n_users")))
        .select(col("min_lifetime_days"), col("n_surviving"), col("n_censored"),
                expr("(n_surviving * 10000) div n_users").as("surviving_bp"))
        .orderBy("min_lifetime_days")
    },

    // DAU / trailing-7-day WAU stickiness — the engagement ratio. The
    // trailing-distinct problem (distinct users over a sliding window)
    // is reformulated SCATTER-side: each (user, active day) contributes
    // itself to the 7 window END-days it falls inside, a 7-fold explode
    // of the user-days DIM (never the event log), deduped per (user,
    // window) by one distinct — no windowed COUNT DISTINCT, no
    // re-scan per window offset. Window ends past the corpus edge are
    // dropped by a broadcast max-day filter.
    "el_stickiness" -> Q(
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts)//1000//86400000000 AS day_idx
        |  FROM events),
        |mx AS (SELECT MAX(day_idx) AS max_day FROM ud),
        |dau AS (
        |  SELECT day_idx, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day_idx),
        |scat AS (
        |  SELECT DISTINCT ud.user_id, ud.day_idx + u.i AS wend
        |  FROM ud, unnest(range(0, 7)) u(i)),
        |wau AS (
        |  SELECT s.wend AS day_idx, CAST(COUNT(*) AS BIGINT) AS wau
        |  FROM scat s, mx WHERE s.wend <= mx.max_day GROUP BY s.wend)
        |SELECT d.day_idx, d.dau, w.wau,
        |       (d.dau * 10000) // w.wau AS stickiness_bp
        |FROM dau d JOIN wau w ON d.day_idx = w.day_idx
        |ORDER BY d.day_idx""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), expr(s"unix_micros(ts) div $US_PER_DAY").as("day_idx"))
        .distinct()
      val mx = ud.agg(max(col("day_idx")).as("max_day"))
      val dau = ud.groupBy("day_idx").agg(count(lit(1)).as("dau"))
      val scat = ud.select(col("user_id"),
                           explode(sequence(lit(0L), lit(6L))).as("i"),
                           col("day_idx"))
        .select(col("user_id"), (col("day_idx") + col("i")).as("wend"))
        .distinct()
      val wau = scat.crossJoin(broadcast(mx))
        .filter(col("wend") <= col("max_day"))
        .groupBy(col("wend").as("day_idx")).agg(count(lit(1)).as("wau"))
      dau.join(wau, "day_idx")
        .select(col("day_idx"), col("dau"), col("wau"),
                expr("(dau * 10000) div wau").as("stickiness_bp"))
        .orderBy("day_idx")
    }
  )
}
