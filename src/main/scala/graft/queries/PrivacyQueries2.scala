package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Second privacy batch — the PII surface a training-data pipeline must
  * clear before release (the reference streams raw integer payloads with
  * no scrubbing surface at all, /root/reference/src/producer/main.rs:68-82),
  * plus t-closeness, the third leg of the anonymity triple next to
  * [[PrivacyQueries]]'s k-anonymity and l-diversity.
  *
  * The synthetic corpus is PII-free word soup, so the PII queries run on a
  * DETERMINISTICALLY AUGMENTED text column: `doc_id % 7` plants one of
  * email / phone / IPv4 / 16-digit card number (or nothing) per document,
  * byte-identically in both engines — the fixture-augmentation contract
  * the multimodal queries established (MultimodalQueries.scala). The card
  * numbers carry a REAL Luhn check digit (ISO/IEC 7812), correct for
  * `doc_id % 14 = 3` and deliberately corrupted for `doc_id % 14 = 10`,
  * so the scan demonstrates validation beyond regex: a detector that
  * counts every 16-digit run over-reports; the Luhn pass is what separates
  * a card number from a tracking id.
  *
  * Scale shape: detection is one flat projection per document (four
  * `regexp_extract_all` + an unrolled 16-term Luhn polynomial — whole-stage
  * codegen, no joins, no explode) followed by a map-side-combined rollup to
  * source granularity. The Luhn lambda runs over the ≤1-element candidate
  * list per doc, not per character (the mm_phash 36× lesson). t-closeness
  * is QI-cardinality-bounded: the only non-dim frame is the one class ×
  * segment aggregate; the EMD grid is (classes × 5 segments) with the
  * 5-row segment margin broadcast.
  */
object PrivacyQueries2 {

  /** Luhn digit term: digit `i` places from the right (0-based) of the
    * `len`-char digit string named `v`, doubled (with digit-sum) when
    * `i % 2 == dblParity`. Pure ascii/substr/CASE — the same fragment
    * parses in Spark SQL and DuckDB. */
  private def luhnSum(v: String, len: Int, dblParity: Int): String =
    (0 until len).map { i =>
      val d = s"(ascii(substr($v,${len - i},1))-48)"
      if (i % 2 == dblParity) s"(2*$d - CASE WHEN $d > 4 THEN 9 ELSE 0 END)"
      else d
    }.mkString("(", " + ", ")")

  /** Check digit that makes `b` (15-digit payload) Luhn-valid: the digit
    * adjacent to the check position is doubled, i.e. parity 0 from the
    * right of the payload. */
  private def luhnCheckDigit(b: String): String =
    s"CAST((10 - (${luhnSum(b, 15, 0)} % 10)) % 10 AS BIGINT)"

  /** Validity test for a full 16-digit candidate `c`: with the check digit
    * in place, doubling shifts to parity 1 from the right. */
  private def luhnValid(c: String): String =
    s"(${luhnSum(c, 16, 1)} % 10 = 0)"

  // Detection patterns — RE2 (DuckDB) and java.util.regex (Spark) agree on
  // this subset: character classes, bounded repeats, \b anchors.
  private val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhonePat = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  private val Ipv4Pat  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private val CardPat  = "\\b[0-9]{16}\\b"

  /** DuckDB CTEs building the augmented text + per-doc detection counts.
    * (In a DuckDB '…' literal backslashes pass through unescaped, so the
    * shared pattern strings drop in verbatim.) */
  private val duckDetect =
    s"""base AS (
       |  SELECT doc_id, source, text,
       |         lpad(CAST((doc_id * 2654435761) % 1000000000000000 AS VARCHAR), 15, '0') AS b
       |  FROM documents),
       |ccd AS (
       |  SELECT *, ${luhnCheckDigit("b")} AS chk FROM base),
       |aug AS (
       |  SELECT doc_id, source,
       |         CASE CAST(doc_id % 7 AS INTEGER)
       |           WHEN 0 THEN text || ' contact user' || CAST(doc_id % 97 AS VARCHAR) || '@example.com today'
       |           WHEN 1 THEN text || ' call 555-' || lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0') || ' now'
       |           WHEN 2 THEN text || ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST((doc_id * 3) % 256 AS VARCHAR) || ' up'
       |           WHEN 3 THEN text || ' card ' || b || CAST(CASE WHEN doc_id % 14 = 3 THEN chk ELSE (chk + 5) % 10 END AS VARCHAR) || ' on file'
       |           ELSE text END AS aug
       |  FROM ccd),
       |det AS (
       |  SELECT doc_id, source, aug,
       |         len(regexp_extract_all(aug, '$EmailPat', 0)) AS emails,
       |         len(regexp_extract_all(aug, '$PhonePat', 0)) AS phones,
       |         len(regexp_extract_all(aug, '$Ipv4Pat', 0)) AS ips,
       |         regexp_extract_all(aug, '$CardPat', 0) AS ccs
       |  FROM aug),
       |ccv AS (
       |  SELECT doc_id, source, aug, emails, phones, ips,
       |         len(ccs) AS cc_cand,
       |         COALESCE(list_sum(list_transform(ccs,
       |           c -> CASE WHEN ${luhnValid("c")} THEN 1 ELSE 0 END)), 0) AS cc_valid
       |  FROM det)""".stripMargin

  /** Per-row PII signal columns over `textCol`: emails/phones/ips counts,
    * card candidates and Luhn-valid count. One flat codegen projection —
    * shared by the declared batch queries (over the augmented column) and
    * the streaming ingest gate ([[graft.streaming.PiiGateStream]], over
    * raw text), so stream and batch judge PII with literally the same
    * expressions. */
  private[graft] def piiSignals(df: org.apache.spark.sql.DataFrame,
                                textCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("emails",
        size(regexp_extract_all(col(textCol), lit(EmailPat), lit(0))).cast("long"))
      .withColumn("phones",
        size(regexp_extract_all(col(textCol), lit(PhonePat), lit(0))).cast("long"))
      .withColumn("ips",
        size(regexp_extract_all(col(textCol), lit(Ipv4Pat), lit(0))).cast("long"))
      .withColumn("ccs", regexp_extract_all(col(textCol), lit(CardPat), lit(0)))
      .withColumn("cc_cand", size(col("ccs")).cast("long"))
      .withColumn("cc_valid",
        coalesce(expr(s"size(filter(ccs, c -> ${luhnValid("c")}))"), lit(0)).cast("long"))

  /** Spark twin of [[duckDetect]]: augmented text + per-doc counts, one
    * codegen projection chain. */
  private def sparkDetect(s: org.apache.spark.sql.SparkSession, d: String) = {
    // spread: five regex detectors (and the audit's four regex_replace
    // passes) per document dominate the scan, and both consumers end in
    // source-keyed aggregates whose exchange is too late to help — the
    // single-file test layout otherwise runs the regexes on 1-8 cores
    val base = Tables.spread(Tables.documents(s, d), "doc_id").select(
      col("doc_id"), col("source"), col("text"),
      lpad(((col("doc_id") * 2654435761L) % 1000000000000000L).cast("string"),
           15, "0").as("b"))
    val ccd = base.withColumn("chk", expr(luhnCheckDigit("b")))
    val aug = ccd.select(col("doc_id"), col("source"),
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" contact user"),
               (col("doc_id") % 97).cast("string"), lit("@example.com today")))
      .when(col("doc_id") % 7 === 1,
        concat(col("text"), lit(" call 555-"),
               lpad(((col("doc_id") * 7) % 1000).cast("string"), 3, "0"), lit("-"),
               lpad(((col("doc_id") * 13) % 10000).cast("string"), 4, "0"), lit(" now")))
      .when(col("doc_id") % 7 === 2,
        concat(col("text"), lit(" host 10."),
               (col("doc_id") % 256).cast("string"), lit(".0."),
               ((col("doc_id") * 3) % 256).cast("string"), lit(" up")))
      .when(col("doc_id") % 7 === 3,
        concat(col("text"), lit(" card "), col("b"),
               when(col("doc_id") % 14 === 3, col("chk"))
                 .otherwise((col("chk") + 5) % 10).cast("string"), lit(" on file")))
      .otherwise(col("text")).as("aug"))
    piiSignals(aug, "aug")
      .select("doc_id", "source", "aug", "emails", "phones", "ips", "cc_cand", "cc_valid")
  }

  def defs: Map[String, Q] = Map(

    // PII scan: per source, how much of each PII kind is present and how
    // many documents a release gate would flag. The card column reports
    // candidates AND Luhn survivors separately — the gap is the false
    // positives a regex-only scanner would redact.
    "pr_pii_scan" -> Q(
      s"""WITH $duckDetect
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
         |       CAST(SUM(emails) AS BIGINT) AS emails,
         |       CAST(SUM(phones) AS BIGINT) AS phones,
         |       CAST(SUM(ips) AS BIGINT) AS ips,
         |       CAST(SUM(cc_cand) AS BIGINT) AS cc_candidates,
         |       CAST(SUM(cc_valid) AS BIGINT) AS cc_luhn_valid,
         |       CAST(SUM(CASE WHEN emails + phones + ips + cc_cand > 0
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged
         |FROM ccv GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      sparkDetect(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("docs"),
             sum(col("emails")).as("emails"),
             sum(col("phones")).as("phones"),
             sum(col("ips")).as("ips"),
             sum(col("cc_cand")).as("cc_candidates"),
             sum(col("cc_valid")).as("cc_luhn_valid"),
             sum(when(col("emails") + col("phones") + col("ips") + col("cc_cand") > 0, 1L)
               .otherwise(0L)).as("docs_flagged"))
        .orderBy("source")
    },

    // Redaction audit: scrub all four PII shapes (cards conservatively —
    // every 16-digit run goes, PCI style, Luhn-valid or not) and account
    // for what changed. chars_delta is signed: a replacement token can be
    // longer than a short match. The redacted text itself never leaves
    // the executors — only integer accounting comes back.
    "pr_redact_audit" -> Q(
      s"""WITH $duckDetect,
         |red AS (
         |  SELECT source, emails, phones, ips, cc_cand,
         |         length(aug) AS len_in,
         |         length(regexp_replace(regexp_replace(regexp_replace(regexp_replace(aug,
         |           '$EmailPat', '[EMAIL]', 'g'),
         |           '$CardPat', '[CARD]', 'g'),
         |           '$PhonePat', '[PHONE]', 'g'),
         |           '$Ipv4Pat', '[IP]', 'g')) AS len_out
         |  FROM ccv)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
         |       CAST(SUM(CASE WHEN emails + phones + ips + cc_cand > 0
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS docs_redacted,
         |       CAST(SUM(emails + phones + ips + cc_cand) AS BIGINT) AS n_redactions,
         |       CAST(SUM(len_in - len_out) AS BIGINT) AS chars_removed
         |FROM red GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val red = sparkDetect(s, d).select(
        col("source"), col("emails"), col("phones"), col("ips"), col("cc_cand"),
        length(col("aug")).cast("long").as("len_in"),
        length(
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(col("aug"),
            EmailPat, "[EMAIL]"),
            CardPat, "[CARD]"),
            PhonePat, "[PHONE]"),
            Ipv4Pat, "[IP]")).cast("long").as("len_out"))
      red.groupBy("source")
        .agg(count(lit(1)).as("docs"),
             sum(when(col("emails") + col("phones") + col("ips") + col("cc_cand") > 0, 1L)
               .otherwise(0L)).as("docs_redacted"),
             sum(col("emails") + col("phones") + col("ips") + col("cc_cand")).as("n_redactions"),
             sum(col("len_in") - col("len_out")).as("chars_removed"))
        .orderBy("source")
    },

    // t-closeness audit (Li et al. 2007): k-anonymity bounds class SIZE,
    // l-diversity bounds distinct sensitive values, but a class whose
    // segment mix diverges from the population still leaks ("this class
    // is 90% MACHINERY"). For a categorical sensitive attribute the EMD
    // is the total-variation distance; kept exact-rational over the
    // common denominator 2·n_c·N and floored to basis points only at the
    // end, so the twins hash-match. Output is the t-histogram a release
    // gate reads (500 bp bands), with the worst class's t per band.
    "pr_t_closeness" -> Q(
      """WITH cs AS (
        |  SELECT c_nationkey, CAST(FLOOR(c_acctbal / 2500) AS BIGINT) AS bal_band,
        |         c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2, 3),
        |cls AS (
        |  SELECT c_nationkey, bal_band, CAST(SUM(n) AS BIGINT) AS n_c
        |  FROM cs GROUP BY 1, 2),
        |seg AS (
        |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_s
        |  FROM customer GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n FROM seg),
        |grid AS (
        |  SELECT cls.c_nationkey, cls.bal_band, cls.n_c, tot.n,
        |         seg.n_s, COALESCE(cs.n, 0) AS n_cs
        |  FROM cls CROSS JOIN seg CROSS JOIN tot
        |  LEFT JOIN cs ON cs.c_nationkey = cls.c_nationkey
        |              AND cs.bal_band = cls.bal_band
        |              AND cs.c_mktsegment = seg.c_mktsegment),
        |tc AS (
        |  SELECT c_nationkey, bal_band, n_c,
        |         SUM(abs(n_cs * n - n_s * n_c)) * 10000 // (2 * n_c * MAX(n)) AS t_bp
        |  FROM grid GROUP BY 1, 2, 3)
        |SELECT CAST(t_bp // 500 AS BIGINT) AS t_band,
        |       CAST(COUNT(*) AS BIGINT) AS n_classes,
        |       CAST(SUM(n_c) AS BIGINT) AS n_rows,
        |       CAST(MIN(t_bp) AS BIGINT) AS min_t_bp,
        |       CAST(MAX(t_bp) AS BIGINT) AS max_t_bp
        |FROM tc GROUP BY 1 ORDER BY t_band""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      val cs = cust.groupBy(col("c_nationkey"),
                            floor(col("c_acctbal") / 2500).cast("long").as("bal_band"),
                            col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val cls = cs.groupBy("c_nationkey", "bal_band").agg(sum(col("n")).as("n_c"))
      val seg = cust.groupBy("c_mktsegment").agg(count(lit(1)).as("n_s"))
      val tot = seg.agg(sum(col("n_s")).as("n"))
      val grid = cls.crossJoin(broadcast(seg)).crossJoin(broadcast(tot))
        .join(cs.withColumnRenamed("n", "n_cs"),
              Seq("c_nationkey", "bal_band", "c_mktsegment"), "left")
        .select(col("c_nationkey"), col("bal_band"), col("n_c"), col("n"),
                col("n_s"), coalesce(col("n_cs"), lit(0L)).as("n_cs"))
      val tc = grid.groupBy("c_nationkey", "bal_band", "n_c")
        .agg(expr("sum(abs(n_cs * n - n_s * n_c)) * 10000 div (2 * n_c * max(n))").as("t_bp"))
      tc.groupBy(expr("t_bp div 500").cast("long").as("t_band"))
        .agg(count(lit(1)).as("n_classes"),
             sum(col("n_c")).as("n_rows"),
             min(col("t_bp")).cast("long").as("min_t_bp"),
             max(col("t_bp")).cast("long").as("max_t_bp"))
        .orderBy("t_band")
    },

    // Generalization ladder — the REMEDIATION next to pr_k_anonymity's
    // audit: coarsen the quasi-identifier (acctbal band width) up a
    // fixed ladder and report, per width, how far from k=10 the release
    // sits; `chosen` marks the finest width whose minimum class reaches
    // k (the standard generalization-lattice walk restricted to one
    // attribute, Sweeney's full-domain generalization). One pass over
    // customer with a 5-row broadcast width dim (a 5× explode of a
    // dimension-bounded aggregate input, not a 5× corpus scan at the
    // fact side — class grids are QI-cardinality-sized).
    "pr_generalize" -> Q(
      """WITH ws AS (SELECT unnest([625, 1250, 2500, 5000, 10000]) AS w),
        |cls AS (
        |  SELECT ws.w, c_nationkey,
        |         CAST(FLOOR(c_acctbal / ws.w) AS BIGINT) AS band,
        |         CAST(COUNT(*) AS BIGINT) AS sz
        |  FROM customer CROSS JOIN ws GROUP BY 1, 2, 3),
        |per AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_classes,
        |         CAST(MIN(sz) AS BIGINT) AS min_class,
        |         CAST(COALESCE(SUM(CASE WHEN sz < 10 THEN sz END), 0) AS BIGINT)
        |           AS rows_below_k
        |  FROM cls GROUP BY w),
        |ch AS (SELECT MIN(CASE WHEN min_class >= 10 THEN w END) AS wsel FROM per)
        |SELECT per.w, n_classes, min_class, rows_below_k,
        |       CAST(CASE WHEN min_class >= 10 THEN 1 ELSE 0 END AS BIGINT) AS meets_k,
        |       CAST(CASE WHEN per.w = ch.wsel THEN 1 ELSE 0 END AS BIGINT) AS chosen
        |FROM per, ch ORDER BY w""".stripMargin) { (s, d) =>
      val ws = s.range(0, 1).select(
        explode(array(lit(625), lit(1250), lit(2500), lit(5000), lit(10000))).as("w"))
      val cls = Tables.customer(s, d).crossJoin(broadcast(ws))
        .groupBy(col("w"), col("c_nationkey"),
                 floor(col("c_acctbal") / col("w")).cast("long").as("band"))
        .agg(count(lit(1)).as("sz"))
      val per = cls.groupBy("w")
        .agg(count(lit(1)).as("n_classes"),
             min(col("sz")).as("min_class"),
             coalesce(sum(when(col("sz") < 10, col("sz"))), lit(0L)).as("rows_below_k"))
      val ch = per.agg(min(when(col("min_class") >= 10, col("w"))).as("wsel"))
      per.crossJoin(broadcast(ch))
        .select(col("w"), col("n_classes"), col("min_class"), col("rows_below_k"),
                when(col("min_class") >= 10, 1L).otherwise(0L).as("meets_k"),
                when(col("w") === col("wsel"), 1L).otherwise(0L).as("chosen"))
        .orderBy("w")
    },

    // DETERMINISTIC SIMULATION of the binomial mechanism's error profile
    // (Dwork et al. EUROCRYPT 2006 — the discrete noise that predates
    // Laplace in the DP literature, and the one expressible WITHOUT
    // ln()): noise = Binomial(24, 1/2) − 12 drawn as bit_count of 24 md5
    // bits of the CELL KEY. Because the draw is a hash of event_type, it
    // is identical on every release of the same cell — this yields NO
    // actual privacy (an adversary re-derives the noise; ε is unbounded)
    // and exists so the DuckDB oracle can hash-check the mechanism's
    // exact error shape (σ² = 6, bounded support ±12). A real release
    // would draw fresh secret randomness per release; the query's point
    // is the error-measurement harness (true_n rides along the way
    // rr_counts and ta_bloom_contamination measure theirs), not a
    // privacy guarantee. One map-side count per type; the noise is a
    // per-CELL expression, no second pass.
    "pr_binomial_release" -> Q(
      s"""WITH c AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_n
         |  FROM events GROUP BY event_type)
         |SELECT event_type, true_n,
         |       CAST(bit_count(${graft.functions.Portable.duckH("'dpn|' || event_type", 15)}
         |                      & 16777215) - 12 AS BIGINT) AS noise,
         |       true_n + bit_count(${graft.functions.Portable.duckH("'dpn|' || event_type", 15)}
         |                          & 16777215) - 12 AS noisy_n
         |FROM c ORDER BY event_type""".stripMargin) { (s, d) =>
      import graft.functions.Portable.h60
      val noise = (expr("bit_count(h & 16777215)") - 12).cast("long")
      Tables.events(s, d)
        .groupBy("event_type").agg(count(lit(1)).as("true_n"))
        .withColumn("h", h60(concat(lit("dpn|"), col("event_type"))))
        .select(col("event_type"), col("true_n"),
                noise.as("noise"), (col("true_n") + noise).as("noisy_n"))
        .orderBy("event_type")
    },

    // REPORT-NOISY-MAX selection, same deterministic-simulation caveat
    // as pr_binomial_release (the noise is a hash of the cell key, so
    // this hash-checks the mechanism's SELECTION behavior — which
    // winner the noisy argmax picks and whether it flips vs the true
    // argmax — not a privacy guarantee; a real release draws fresh
    // secret noise). Noisy-max is the canonical DP SELECTION primitive
    // (pick the best category without releasing the counts); the
    // binomial(24,1/2)−12 noise reuses the ladder's log-free discrete
    // mechanism under a distinct hash tag. Plan shape: one map-side
    // count per type, both argmaxes via orderBy+LIMIT 1 (TakeOrdered —
    // no global window), broadcast back to the type rows.
    "pr_noisy_argmax" -> Q(
      s"""WITH c AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_n
         |  FROM events GROUP BY event_type),
         |n AS (
         |  SELECT event_type, true_n,
         |         CAST(bit_count(${graft.functions.Portable.duckH("'nmx|' || event_type", 15)}
         |                        & 16777215) - 12 AS BIGINT) AS noise,
         |         true_n + bit_count(${graft.functions.Portable.duckH("'nmx|' || event_type", 15)}
         |                            & 16777215) - 12 AS noisy_n
         |  FROM c),
         |mx AS (SELECT event_type AS me FROM n ORDER BY noisy_n DESC, event_type LIMIT 1),
         |tx AS (SELECT event_type AS te FROM n ORDER BY true_n DESC, event_type LIMIT 1)
         |SELECT n.event_type, n.true_n, n.noise, n.noisy_n,
         |       CAST(CASE WHEN n.event_type = mx.me THEN 1 ELSE 0 END AS BIGINT) AS chosen,
         |       CAST(CASE WHEN n.event_type = tx.te THEN 1 ELSE 0 END AS BIGINT) AS true_winner
         |FROM n, mx, tx ORDER BY event_type""".stripMargin) { (s, d) =>
      import graft.functions.Portable.h60
      val noise2 = (expr("bit_count(h & 16777215)") - 12).cast("long")
      val n = Tables.events(s, d)
        .groupBy("event_type").agg(count(lit(1)).as("true_n"))
        .withColumn("h", h60(concat(lit("nmx|"), col("event_type"))))
        .select(col("event_type"), col("true_n"),
                noise2.as("noise"), (col("true_n") + noise2).as("noisy_n"))
      val mx = n.orderBy(col("noisy_n").desc, col("event_type")).limit(1)
        .select(col("event_type").as("me"))
      val tx = n.orderBy(col("true_n").desc, col("event_type")).limit(1)
        .select(col("event_type").as("te"))
      n.crossJoin(broadcast(mx)).crossJoin(broadcast(tx))
        .select(col("event_type"), col("true_n"), col("noise"), col("noisy_n"),
                when(col("event_type") === col("me"), 1L).otherwise(0L).as("chosen"),
                when(col("event_type") === col("te"), 1L).otherwise(0L).as("true_winner"))
        .orderBy("event_type")
    }
  )
}
