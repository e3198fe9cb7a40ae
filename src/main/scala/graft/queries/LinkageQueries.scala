package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch: record-linkage & multiple-testing operators for the
  * LLM-data-pipeline surface —
  *
  *   - `ta_text_fold` — Unicode canonicalization (NFD → strip accents →
  *     casefold → NFC) via the codegen `graft_fold_text` expression, the
  *     standard pre-dedup text fold;
  *   - `dd_jaro_winkler` — fuzzy-match verification over a sorted-
  *     neighborhood candidate set with the codegen `graft_jaro_winkler`
  *     expression (DuckDB `jaro_winkler_similarity` parity, probed:
  *     prefix weight 0.1 / cap 4 / boost threshold 0.7 / transposition
  *     count truncated);
  *   - `el_fdr_bh` — Benjamini–Hochberg step-up FDR control across the
  *     per-event-type independence tests an experimentation pipeline
  *     runs in batch, using the EXACT chi²(df=2) tail p = exp(−s/2)
  *     (3×2 contingency ⇒ df 2 — the one chi-square family whose
  *     survival function needs no erf/Γ, which neither engine ships);
  *   - `dd_fs_weights` — the Fellegi–Sunter agreement table over multi-
  *     pass sorted-neighborhood candidates (the weight-estimation step
  *     between blocking and scoring).
  */
object LinkageQueries {

  private val accented = "éàü" // é à ü

  val defs: Map[String, Q] = Map(

    // Canonicalization fold over the documents corpus. The corpus is
    // ASCII, so the query CONSTRUCTS the accented input deterministically
    // in both engines (translate e→é a→à u→ü on the 80-char prefix) and
    // then folds it back: n_roundtrip counts docs where fold(accented) ==
    // lower(original) — the invariant the fold exists to provide (every
    // accent-decorated variant hashes with its base form). All outputs
    // are integers; the string compare is exact (both engines land on
    // identical ASCII bytes). Scale shape: one scan, one map-side-
    // combined groupBy on the bounded source domain; text leaves the
    // scan only as the 80-char prefix.
    "ta_text_fold" -> Q(
      s"""WITH f AS (
         |  SELECT source, substr(text,1,80) AS orig,
         |         translate(substr(text,1,80),'eau','$accented') AS acc,
         |         lower(strip_accents(translate(substr(text,1,80),'eau','$accented'))) AS folded
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN folded <> acc THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         |  CAST(SUM(CASE WHEN folded = lower(orig) THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip,
         |  CAST(SUM(length(folded)) AS BIGINT) AS sum_len,
         |  CAST(COUNT(DISTINCT folded) AS BIGINT) AS n_distinct
         |FROM f GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      graft.functions.FoldText.register(s)
      val f = Tables.documents(s, d)
        .select(col("source"),
                substring(col("text"), 1, 80).as("orig"),
                translate(substring(col("text"), 1, 80), "eau", accented).as("acc"))
        .withColumn("folded", call_function("graft_fold_text", col("acc")))
      f.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             sum(when(col("folded") =!= col("acc"), 1).otherwise(0)).cast("long").as("n_changed"),
             sum(when(col("folded") === lower(col("orig")), 1).otherwise(0)).cast("long").as("n_roundtrip"),
             sum(length(col("folded"))).cast("long").as("sum_len"),
             countDistinct(col("folded")).as("n_distinct"))
        .orderBy("source")
    },

    // Sorted-neighborhood blocking (window w=2 over the sorted DISTINCT
    // name domain) + Jaro–Winkler verification — the classic record-
    // linkage two-step, on the part-name domain (vocabulary-bounded:
    // |distinct p_name| ≤ |colors|·|nouns| at every SF, so the global
    // ORDER BY window is bounded input — allowlisted in
    // PlanAssertionsSpec with that rationale). Score doubles never leave
    // the query: the output is the PAIR SET at θ = 0.8412345, a
    // threshold unreachable by jw's small-denominator rationals, so a
    // last-ulp disagreement between engines cannot flip membership.
    "dd_jaro_winkler" -> Q(
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |o AS (SELECT p_name,
        |        lead(p_name,1) OVER (ORDER BY p_name) AS n1,
        |        lead(p_name,2) OVER (ORDER BY p_name) AS n2 FROM n),
        |p AS (SELECT p_name AS name_a, n1 AS name_b FROM o WHERE n1 IS NOT NULL
        |      UNION ALL SELECT p_name, n2 FROM o WHERE n2 IS NOT NULL)
        |SELECT name_a, name_b FROM p
        |WHERE jaro_winkler_similarity(name_a, name_b) > 0.8412345
        |ORDER BY name_a, name_b""".stripMargin) { (s, d) =>
      graft.functions.JaroWinklerSim.register(s)
      val w = Window.orderBy("p_name")
      val o = Tables.part(s, d).select("p_name").distinct()
        .withColumn("n1", lead(col("p_name"), 1).over(w))
        .withColumn("n2", lead(col("p_name"), 2).over(w))
      val pairs = o.filter(col("n1").isNotNull)
        .select(col("p_name").as("name_a"), col("n1").as("name_b"))
        .unionAll(o.filter(col("n2").isNotNull)
          .select(col("p_name").as("name_a"), col("n2").as("name_b")))
      pairs
        .filter(call_function("graft_jaro_winkler", col("name_a"), col("name_b"))
          > 0.8412345)
        .orderBy("name_a", "name_b")
    },

    // Benjamini–Hochberg step-up over per-type 3×2 independence tests
    // (variant = user_id parity vs a 3-way bucket of the JSON `k` prop),
    // plus one INJECTED-dependence canary (v=1 rows never reach bucket 2)
    // so the rejection branch is exercised on the null-only synthetic
    // corpus: BH must reject the canary at rank 1 and nothing else —
    // the A/A-with-injected-signal design el_ab_srm uses. df = 2 makes
    // the p-value closed-form (p = exp(−s/2)); output is ranks and
    // decisions only (integers/booleans). The p-value is QUANTIZED to a
    // fixed integer grid before ranking and thresholding — pq =
    // floor(p·10⁹), rank ties broken by event_type, and the BH boundary
    // evaluated as the exact integer cross-multiplication pq·m ≤ i·10⁸
    // (≡ pq/10⁹ ≤ i·0.10/m) — so every comparison that reaches the hash
    // is integer-on-integer. Residual cross-engine float risk is only
    // floor() itself: the engines' independently summed s must land p·10⁹
    // on opposite sides of a grid LINE (an ~ulp/10⁹-measure event), not
    // merely an ulp apart — the ta_calibration conf_q pattern, not a
    // hard rational-gap guarantee. Scale shape: counts aggregate
    // map-side to ≤ |types|·6 cells; everything after is on the bounded
    // type domain (the rank window is allowlisted bounded-input).
    "el_fdr_bh" -> Q(
      """WITH base AS (
        |  SELECT event_type, user_id % 2 AS v,
        |         CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k
        |  FROM events),
        |aug AS (
        |  SELECT event_type, v, k % 3 AS bkt FROM base
        |  UNION ALL
        |  SELECT 'zz_canary', v, CASE WHEN v = 0 THEN k % 3 ELSE k % 2 END FROM base),
        |cells AS (SELECT event_type, v, bkt, COUNT(*) AS o FROM aug GROUP BY 1,2,3),
        |tot AS (SELECT event_type, SUM(o) AS n FROM cells GROUP BY 1),
        |rt AS (SELECT event_type, v, SUM(o) AS r FROM cells GROUP BY 1,2),
        |ct AS (SELECT event_type, bkt, SUM(o) AS c FROM cells GROUP BY 1,2),
        |stat AS (
        |  SELECT cells.event_type,
        |         SUM((o - r*c/CAST(n AS DOUBLE))*(o - r*c/CAST(n AS DOUBLE))
        |             /(r*c/CAST(n AS DOUBLE))) AS s
        |  FROM cells JOIN tot USING (event_type) JOIN rt USING (event_type, v)
        |       JOIN ct USING (event_type, bkt)
        |  GROUP BY 1),
        |ranked AS (
        |  SELECT event_type, CAST(floor(exp(-s/2) * 1000000000) AS BIGINT) AS pq,
        |         row_number() OVER (
        |           ORDER BY CAST(floor(exp(-s/2) * 1000000000) AS BIGINT), event_type) AS i,
        |         COUNT(*) OVER () AS m FROM stat),
        |kstar AS (SELECT COALESCE(MAX(CASE WHEN pq * m <= i * 100000000 THEN i END),0) AS k
        |          FROM ranked)
        |SELECT event_type, CAST(i AS BIGINT) AS p_rank, (i <= k) AS rejected
        |FROM ranked, kstar ORDER BY p_rank""".stripMargin) { (s, d) =>
      val base = Tables.events(s, d).select(
        col("event_type"),
        (col("user_id") % 2).as("v"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int").as("k"))
      val aug = base.select(col("event_type"), col("v"), (col("k") % 3).as("bkt"))
        .unionAll(base.select(
          lit("zz_canary").as("event_type"), col("v"),
          when(col("v") === 0, col("k") % 3).otherwise(col("k") % 2).as("bkt")))
      val cells = aug.groupBy("event_type", "v", "bkt").agg(count(lit(1)).as("o"))
      // marginals as PARTITIONED windows over the ≤|types|·6-row cells
      // frame — one aggregation, no self-joins (the oracle's equivalent
      // CTE joins would re-scan events once per marginal on the Spark
      // side, since subplans don't share without caching)
      val e = col("r") * col("c") / col("n").cast("double")
      val stat = cells
        .withColumn("n", sum("o").over(Window.partitionBy("event_type")))
        .withColumn("r", sum("o").over(Window.partitionBy("event_type", "v")))
        .withColumn("c", sum("o").over(Window.partitionBy("event_type", "bkt")))
        .groupBy("event_type")
        .agg(sum((col("o") - e) * (col("o") - e) / e).as("s"))
      val m = stat.agg(count(lit(1)).as("m"))
      val ranked = stat
        .select(col("event_type"),
                floor(exp(-col("s") / 2) * lit(1000000000L)).as("pq"))
        .withColumn("i", row_number().over(
          Window.orderBy(col("pq"), col("event_type"))))
        .crossJoin(broadcast(m))
      val kstar = ranked.agg(coalesce(
        max(when(col("pq") * col("m") <= col("i") * lit(100000000L), col("i"))),
        lit(0)).as("k"))
      ranked.crossJoin(broadcast(kstar))
        .select(col("event_type"), col("i").cast("long").as("p_rank"),
                (col("i") <= col("k")).as("rejected"))
        .orderBy("p_rank")
    },

    // Fellegi–Sunter agreement table — the WEIGHT-ESTIMATION step that
    // turns blocked candidate pairs into match/unmatch field statistics
    // (m = P(field agrees | match), u = P(agrees | unmatch); weight =
    // log2(m/u) — one downstream division over these integers). Blocking
    // is the classic MULTI-PASS sorted neighborhood: pass A sorts by
    // name (color-blocked neighbors), pass B by REVERSED name (noun-
    // blocked neighbors — without it the truth stratum is empty, the
    // single-pass degeneracy this query's round-8 prototyping caught);
    // truth = same noun. Fields deliberately span the weight spectrum:
    // f_sfx3 (suffix agreement) is strong evidence FOR a match, f_len
    // weak, and f_color / f_jw carry NEGATIVE weights on this vocabulary
    // — prefix-heavy similarity agrees more on color-blocked UNMATCHES
    // than on noun matches, exactly the calibration an FS model exists
    // to learn. Scale: both windows run over the vocabulary-bounded
    // DISTINCT name domain (allowlisted); everything after is a ≤2·|V|
    // pair set.
    "dd_fs_weights" -> Q(
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |oa AS (SELECT p_name, lead(p_name,1) OVER (ORDER BY p_name) AS n1 FROM n),
        |ob AS (SELECT p_name, lead(p_name,1) OVER (ORDER BY reverse(p_name)) AS n1 FROM n),
        |p0 AS (SELECT p_name AS a, n1 AS b FROM oa WHERE n1 IS NOT NULL
        |       UNION SELECT LEAST(p_name,n1), GREATEST(p_name,n1) FROM ob WHERE n1 IS NOT NULL),
        |f AS (SELECT
        |        CASE WHEN string_split(a,' ')[2] = string_split(b,' ')[2] THEN 1 ELSE 0 END AS is_match,
        |        CASE WHEN string_split(a,' ')[1] = string_split(b,' ')[1] THEN 1 ELSE 0 END AS f_color,
        |        CASE WHEN jaro_winkler_similarity(a,b) > 0.8412345 THEN 1 ELSE 0 END AS f_jw,
        |        CASE WHEN length(a) = length(b) THEN 1 ELSE 0 END AS f_len,
        |        CASE WHEN right(a,3) = right(b,3) THEN 1 ELSE 0 END AS f_sfx3
        |      FROM p0),
        |u AS (
        |  SELECT 'f_color' AS field, is_match, SUM(f_color) AS agree, COUNT(*) AS n FROM f GROUP BY 1,2
        |  UNION ALL SELECT 'f_jw', is_match, SUM(f_jw), COUNT(*) FROM f GROUP BY 1,2
        |  UNION ALL SELECT 'f_len', is_match, SUM(f_len), COUNT(*) FROM f GROUP BY 1,2
        |  UNION ALL SELECT 'f_sfx3', is_match, SUM(f_sfx3), COUNT(*) FROM f GROUP BY 1,2)
        |SELECT field, CAST(is_match AS BIGINT) AS is_match,
        |       CAST(agree AS BIGINT) AS agree_n, CAST(n AS BIGINT) AS pairs_n
        |FROM u ORDER BY field, is_match""".stripMargin) { (s, d) =>
      graft.functions.JaroWinklerSim.register(s)
      val names = Tables.part(s, d).select("p_name").distinct()
      val wa = Window.orderBy("p_name")
      val wb = Window.orderBy(reverse(col("p_name")))
      val passA = names.withColumn("n1", lead(col("p_name"), 1).over(wa))
        .filter(col("n1").isNotNull)
        .select(col("p_name").as("a"), col("n1").as("b"))
      val passB = names.withColumn("n1", lead(col("p_name"), 1).over(wb))
        .filter(col("n1").isNotNull)
        .select(least(col("p_name"), col("n1")).as("a"),
                greatest(col("p_name"), col("n1")).as("b"))
      val pairs = passA.union(passB).distinct()
      val f = pairs.select(
        when(split(col("a"), " ")(1) === split(col("b"), " ")(1), 1).otherwise(0).as("f_noun"),
        when(split(col("a"), " ")(0) === split(col("b"), " ")(0), 1).otherwise(0).as("f_color"),
        when(call_function("graft_jaro_winkler", col("a"), col("b")) > 0.8412345, 1)
          .otherwise(0).as("f_jw"),
        when(length(col("a")) === length(col("b")), 1).otherwise(0).as("f_len"),
        when(substring(col("a"), -3, 3) === substring(col("b"), -3, 3), 1)
          .otherwise(0).as("f_sfx3"))
      val strata = Seq("f_color" -> col("f_color"), "f_jw" -> col("f_jw"),
                       "f_len" -> col("f_len"), "f_sfx3" -> col("f_sfx3"))
        .map { case (nm, c) =>
          f.groupBy(col("f_noun").as("is_match"))
            .agg(sum(c).cast("long").as("agree_n"), count(lit(1)).as("pairs_n"))
            .select(lit(nm).as("field"), col("is_match").cast("long").as("is_match"),
                    col("agree_n"), col("pairs_n"))
        }
      strata.reduce(_ unionAll _).orderBy("field", "is_match")
    }
  )
}
