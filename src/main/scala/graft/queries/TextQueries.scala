package graft.queries

import graft.{Q, Tables}
import graft.functions.Portable._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis surface over `documents`: language-ID heuristic, quality
  * scoring, token statistics, and rolling-hash fingerprinting — the
  * text-side of the LLM-pipeline mandate. Everything is per-row HOF math
  * plus one aggregation, so plans are a single scan + (at most) one
  * shuffle.
  */
object TextQueries {

  /** Stopword marker sets per language for the n-gram/stopword vote.
    * The corpus vocabulary is synthetic, so the markers are fixed
    * subsets of it — the OPERATOR (argmax of marker hits with a
    * deterministic preference order) is what's under test.
    */
  private[queries] val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "table", "column"),
    "de" -> Seq("stream", "batch", "window"),
    "fr" -> Seq("join", "merge", "sort"),
    "zh" -> Seq("spark", "query", "row"))

  private def duckMarkerScore(ws: Seq[String]): String =
    s"len(list_filter(string_split(text,' '), t -> t IN (${ws.map(w => s"'$w'").mkString(",")})))"

  /** Per-row langid + quality signals, STATELESS — the exact expressions
    * of ta_langid (marker vote, en>es>de>fr>zh tie order) and ta_quality
    * (ttr/stopword/length fold), factored so the streaming ingest gate
    * (graft.streaming.QualityGateStream) applies the same scoring per
    * row with no state store; QualityGateSpec pins gate == ta_quality
    * bit-for-bit. Input needs (doc_id, text); all input columns pass
    * through, plus (predicted, quality). */
  private[graft] def gateSignals(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val langs = markers.map(_._1)
    val scored = docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_types", size(array_distinct(col("toks"))))
      .withColumn("n_stop", size(filter(col("toks"), t => t.isin("the", "a"))))
    val withScores = markers.foldLeft(scored) { case (df, (l, ws)) =>
      df.withColumn(s"sc_$l",
        size(filter(col("toks"), t => t.isin(ws.map(x => x: Any): _*))))
    }
    val predicted = langs.init.foldRight(lit(langs.last): Column) { (l, els) =>
      val geAll = langs.filter(_ != l).map(o => col(s"sc_$l") >= col(s"sc_$o")).reduce(_ && _)
      when(geAll, lit(l)).otherwise(els)
    }
    val ttr   = col("n_types").cast("double") / col("n_tokens")
    val stopR = col("n_stop").cast("double") / col("n_tokens")
    withScores
      .withColumn("predicted", predicted)
      .withColumn("quality",
        lit(0.4) * ttr + lit(0.3) * (lit(1.0) - stopR) +
          lit(0.3) * least(lit(1.0), col("n_tokens").cast("double") / 100))
      .drop((Seq("toks", "n_tokens", "n_types", "n_stop") ++ langs.map(l => s"sc_$l")): _*)
  }

  def defs: Map[String, Q] = Map(

    // Language ID: marker-token vote with fixed preference order on ties
    // (en > es > de > fr > zh), reported as a lang × predicted confusion
    // summary.
    "ta_langid" -> Q({
      val scores = markers.map { case (l, ws) => s"${duckMarkerScore(ws)} AS sc_$l" }.mkString(", ")
      val langs  = markers.map(_._1)
      val argmax = langs.init.map { l =>
        val geAll = langs.filter(_ != l).map(o => s"sc_$l >= sc_$o").mkString(" AND ")
        s"WHEN $geAll THEN '$l'"
      }.mkString(" ")
      s"""WITH scored AS (SELECT doc_id, lang, $scores FROM documents),
         |pred AS (
         |  SELECT doc_id, lang,
         |         CASE $argmax ELSE '${langs.last}' END AS predicted
         |  FROM scored)
         |SELECT lang, predicted, COUNT(*) AS n_docs
         |FROM pred GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
    }) { (s, d) =>
      val langs  = markers.map(_._1)
      // tokenize ONCE into a column; five inline markerScore(split(...))
      // expressions would each re-split the text (no CSE inside lambdas)
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
        .select(Seq(col("doc_id"), col("lang")) ++
          markers.map { case (l, ws) =>
            size(filter(col("toks"), t => t.isin(ws.map(x => x: Any): _*))).as(s"sc_$l") }: _*)
      val predicted = langs.init.foldRight(lit(langs.last): Column) { (l, els) =>
        val geAll = langs.filter(_ != l).map(o => col(s"sc_$l") >= col(s"sc_$o")).reduce(_ && _)
        when(geAll, lit(l)).otherwise(els)
      }
      scored.withColumn("predicted", predicted)
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "predicted")
    },

    // Quality scoring: type/token ratio, mean token length, stopword
    // ratio, folded into one bounded score. Per-row double math only.
    "ta_quality" -> Q(
      """WITH f AS (
        |  SELECT doc_id, lang,
        |         len(string_split(text,' ')) AS n_tokens,
        |         len(list_distinct(string_split(text,' '))) AS n_types,
        |         length(text) AS n_chars_m,
        |         len(list_filter(string_split(text,' '), t -> t IN ('the','a'))) AS n_stop
        |  FROM documents)
        |SELECT doc_id, lang,
        |       CAST(n_tokens AS INTEGER) AS n_tokens,
        |       CAST(n_types AS INTEGER) AS n_types,
        |       CAST(n_types AS DOUBLE) / n_tokens AS ttr,
        |       CAST(n_chars_m - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
        |       CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
        |       0.4 * (CAST(n_types AS DOUBLE) / n_tokens)
        |         + 0.3 * (CAST(1 AS DOUBLE) - CAST(n_stop AS DOUBLE) / n_tokens)
        |         + 0.3 * least(CAST(1 AS DOUBLE), CAST(n_tokens AS DOUBLE) / 100) AS quality
        |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d).select(
        col("doc_id"), col("lang"), length(col("text")).as("n_chars_m"),
        tokens(col("text")).as("toks"))
      val withCounts = base.select(
        col("doc_id"), col("lang"), col("n_chars_m"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_types"),
        size(filter(col("toks"), t => t.isin("the", "a"))).as("n_stop"))
      val ttr   = col("n_types").cast("double") / col("n_tokens")
      val stopR = col("n_stop").cast("double") / col("n_tokens")
      withCounts.select(
        col("doc_id"), col("lang"), col("n_tokens"), col("n_types"),
        ttr.as("ttr"),
        ((col("n_chars_m") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
          .as("avg_token_len"),
        stopR.as("stop_ratio"),
        (lit(0.4) * ttr + lit(0.3) * (lit(1.0) - stopR) +
          lit(0.3) * least(lit(1.0), col("n_tokens").cast("double") / 100)).as("quality"))
        .orderBy("doc_id")
    },

    // Token statistics: corpus-wide frequency + document frequency per
    // token (explode → two-level agg; the BPE-ish regex filters
    // non-word tokens before counting).
    "ta_token_stats" -> Q(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
        |flt AS (SELECT * FROM tok WHERE regexp_matches(token, '^[a-z0-9]+$')),
        |stats AS (
        |  SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        |  FROM flt GROUP BY token)
        |SELECT token, tf, df,
        |       CAST(tf AS DOUBLE) / (SELECT COUNT(*) FROM flt) AS rel_freq
        |FROM stats ORDER BY tf DESC, token""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .filter(col("token").rlike("^[a-z0-9]+$"))
      val total = tok.agg(count(lit(1)).as("total"))
      tok.groupBy("token")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .crossJoin(broadcast(total))
        .select(col("token"), col("tf"), col("df"),
                (col("tf").cast("double") / col("total")).as("rel_freq"))
        .orderBy(col("tf").desc, col("token"))
    },

    // Document fingerprinting: polynomial rolling hash of the token-hash
    // stream (mod 1e9+7), plus distinct-bigram count — the shape of
    // content-defined chunk signatures, exactly portable.
    "ta_fingerprint" -> Q(
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST(('0x' || substring(md5(t),1,8)) AS BIGINT)
        |       for t in string_split(text,' ')]),
        |    (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint,
        |  CAST(len(list_distinct(
        |    [array_to_string((string_split(text,' '))[i:i+1], ' ')
        |     for i in range(1, len(string_split(text,' ')))])) AS INTEGER) AS n_distinct_bigrams
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      // one-pass kernels (round 10, functions/Shingles.scala): the
      // rolling hash folds h32 over each token's byte slice directly
      // (the aggregate() HOF ran interpreted with an md5 expression
      // per token), and the distinct-bigram count is the mode-3
      // shingle kernel (<2-token docs yield an empty set, matching
      // the oracle's empty range)
      graft.functions.Shingles.register(s)
      // sort first, fold after (the q61 move: the ORDER BY's range
      // sampler executes a map-only child twice)
      Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy("doc_id")
        .select(col("doc_id"),
                call_function("graft_rolling_fp", col("text")).as("fingerprint"),
                size(call_function("graft_shingles", col("text"), lit(2), lit(3)))
                  .as("n_distinct_bigrams"))
    }
  )
}
