package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second multimodal batch.
  *
  * `mm_dhash` — difference hash, the gradient twin of mm_phash's
  * average hash: each bit records whether a pooled pixel outshines its
  * right neighbor, so the hash captures horizontal gradients and is
  * robust to global brightness shifts (the property aHash lacks — a
  * brightened copy flips aHash bits but leaves every inequality, and so
  * the dHash, unchanged). Same fake-decode contract as mm_phash/
  * mm_resize: the payload reads as a 32-wide grid of byte "pixels",
  * 4×4-average-pooled to an 8-wide grid of integer means (exact floor
  * division, so the twins hash-match bit-for-bit).
  *
  * Scale shape is mm_resize's: posexplode → map-side-combined per-block
  * mean (blocks ≤ pixels/16 per doc), then a LEAD window PARTITIONED BY
  * (doc, pooled-row) — never wider than 8 rows — and one per-doc rollup
  * packing bits with exact integer shifts (never float pow: 2^62 is
  * past a double's 53-bit mantissa). Pooled rows beyond 8 are excluded
  * so the bit position br·7+bc stays ≤ 62, inside a BIGINT.
  */
object MultimodalQueries2 {

  def defs: Map[String, Q] = Map(

    "mm_dhash" -> Q(
      """WITH px AS (
        |  SELECT d.doc_id,
        |         ((u.i - 1) // 32) // 4 AS br, ((u.i - 1) % 32) // 4 AS bc,
        |         CAST(ord(substring(d.text, CAST(u.i AS INTEGER), 1)) AS BIGINT) AS p
        |  FROM documents d, unnest(range(1, length(d.text) + 1)) u(i)),
        |blk AS (
        |  SELECT doc_id, br, bc, CAST(SUM(p) AS BIGINT) // COUNT(*) AS mean_p
        |  FROM px GROUP BY doc_id, br, bc),
        |nb AS (
        |  SELECT doc_id, br, bc, mean_p,
        |         LEAD(mean_p) OVER (PARTITION BY doc_id, br ORDER BY bc) AS nxt
        |  FROM blk),
        |bits AS (
        |  SELECT doc_id, br, bc,
        |         CASE WHEN mean_p > nxt THEN 1 ELSE 0 END AS bit
        |  FROM nb WHERE nxt IS NOT NULL AND br <= 8)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(SUM(bit * (CAST(1 AS BIGINT) << (br * 7 + bc))) AS BIGINT) AS dhash,
        |       CAST(SUM(bit) AS BIGINT) AS bits_set
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      // ONE PASS, NO EXPLODE (round 10): the per-character posexplode +
      // substring(text, i, 1) pipeline paid Θ(n²) character scans per doc
      // (substring walks to the i-th codepoint) and pushed ~150M rows at
      // sf10 through the 72-column conditional aggregate — 112.5 s in the
      // honest sf10 bench, the suite's worst query after the q61 fix. The
      // whole computation is a per-doc fold with a fixed 9×8 cell grid,
      // so it is now a codegen kernel (functions/PixelKernels.scala)
      // walking the codepoints once: a pure map-side projection whose
      // only exchange is the output-linear ORDER BY. Parity with the
      // exploded form is pinned in PixelKernelsSpec.
      graft.functions.DhashStats.register(s)
      // sort first, fold after (the q61 move): the ORDER BY's range
      // sampler executes a map-only child twice, so the kernel ran on
      // both passes; the sort also spreads the fold over all cores
      Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy("doc_id")
        .select(col("doc_id"), expr("graft_dhash_stats(text)").as("st"))
        .filter(col("st.n_pairs") > 0)
        .select(col("doc_id"), col("st.n_pairs").as("n_pairs"),
                col("st.dhash").as("dhash"), col("st.bits_set").as("bits_set"))
    },

    // Audio fingerprint — the energy-delta bitstring (the Shazam-family
    // idea reduced to what a codec-free container can verify exactly):
    // over mm_audio_energy's 16-sample frames (first 256 "samples"),
    // each bit records whether a frame's energy rose against its
    // predecessor. Completes the audio trio (energy profile, silence
    // trim, fingerprint). Same shape discipline as mm_dhash: per-frame
    // map-side-combined energy aggregate (≤16 rows/doc), a LAG window
    // partitioned by doc, exact integer bit packing (≤15 bits).
    "mm_audio_fingerprint" -> Q(
      """WITH px AS (
        |  SELECT d.doc_id, (u.i - 1) // 16 AS frame,
        |         CAST(ord(substring(d.text, CAST(u.i AS INTEGER), 1)) AS BIGINT) AS p
        |  FROM documents d, unnest(range(1, 257)) u(i)
        |  WHERE length(d.text) > 0 AND u.i <= least(256, length(d.text))),
        |fr AS (
        |  SELECT doc_id, frame, CAST(SUM(p * p) AS BIGINT) AS ss
        |  FROM px GROUP BY doc_id, frame),
        |dl AS (
        |  SELECT doc_id, frame, ss,
        |         LAG(ss) OVER (PARTITION BY doc_id ORDER BY frame) AS prev
        |  FROM fr),
        |bits AS (
        |  SELECT doc_id, frame,
        |         CASE WHEN ss > prev THEN 1 ELSE 0 END AS bit
        |  FROM dl WHERE prev IS NOT NULL)
        |SELECT doc_id, CAST(COUNT(*) + 1 AS BIGINT) AS n_frames,
        |       CAST(SUM(bit * (CAST(1 AS BIGINT) << (frame - 1))) AS BIGINT)
        |         AS fingerprint,
        |       CAST(SUM(bit) AS BIGINT) AS bits_set
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      // ONE PASS, NO EXPLODE (round 10, the mm_dhash kernel move): the
      // 16-frame energy fold over the first 256 samples is a per-doc
      // codegen kernel (functions/PixelKernels.scala) — no posexplode,
      // no 32-column conditional aggregate, no shuffle but the ORDER BY.
      // Parity pinned in PixelKernelsSpec.
      graft.functions.AudioFpStats.register(s)
      // sort first, fold after (the q61 move): the ORDER BY's range
      // sampler executes a map-only child twice, so the kernel ran on
      // both passes; the sort also spreads the fold over all cores
      Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy("doc_id")
        .select(col("doc_id"), expr("graft_audio_fp(text)").as("st"))
        .filter(col("st.n_frames") > 1)
        .select(col("doc_id"), col("st.n_frames").as("n_frames"),
                col("st.fingerprint").as("fingerprint"),
                col("st.bits_set").as("bits_set"))
    },

    // Letterbox / border detection: count the leading and trailing runs
    // of LOW-INTENSITY pixel rows of the 32-wide grid (the black-bar
    // crop a video/thumbnail pipeline trims before hashing — a border
    // row shifts every dHash/pHash bit, so cropping precedes hashing).
    // A row is "dark" when its integer mean intensity < 105 (the soup's
    // mean sits ~100: both verdicts occur on real data). Leading run =
    // rows before the first bright row, exact via MIN over bright
    // indices — no window at all, one two-level aggregate.
    "mm_border_detect" -> Q(
      """WITH px AS (
        |  SELECT d.doc_id, (u.i - 1) // 32 AS r,
        |         CAST(ord(substring(d.text, CAST(u.i AS INTEGER), 1)) AS BIGINT) AS p
        |  FROM documents d, unnest(range(1, length(d.text) + 1)) u(i)),
        |rows_ AS (
        |  SELECT doc_id, r,
        |         CASE WHEN CAST(SUM(p) AS BIGINT) // COUNT(*) < 105 THEN 1 ELSE 0 END AS dark
        |  FROM px GROUP BY doc_id, r)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(dark) AS BIGINT) AS dark_rows,
        |       CAST(COALESCE(MIN(CASE WHEN dark = 0 THEN r END), COUNT(*)) AS BIGINT)
        |         AS top_border,
        |       CAST(COUNT(*) - 1 - COALESCE(MAX(CASE WHEN dark = 0 THEN r END), -1) AS BIGINT)
        |         AS bottom_border
        |FROM rows_ GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      // ONE PASS, NO EXPLODE (round 10, the mm_dhash kernel move): the
      // per-32-pixel-row dark/bright fold is a per-doc codegen kernel
      // (functions/PixelKernels.scala) — 41.8 s of sf10 explode+shuffle
      // becomes a map-side projection. Parity pinned in PixelKernelsSpec.
      graft.functions.BorderStats.register(s)
      // sort first, fold after (the q61 move): the ORDER BY's range
      // sampler executes a map-only child twice, so the kernel ran on
      // both passes; the sort also spreads the fold over all cores
      Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy("doc_id")
        .select(col("doc_id"), expr("graft_border_stats(text)").as("st"))
        .filter(col("st.n_rows") > 0)
        .select(col("doc_id"), col("st.n_rows").as("n_rows"),
                col("st.dark_rows").as("dark_rows"),
                col("st.top_border").as("top_border"),
                col("st.bottom_border").as("bottom_border"))
    },

    // Tile-level duplication — watermark / template detection: hash each
    // 16-byte tile of the pixel grid and measure, per doc, how many of
    // its tiles also occur in OTHER docs (a recurring logo/banner shows
    // up as a high shared-tile share across a source). DF-CAPPED like
    // dd_dup_spans' df∈[2,3] gram dim: the (hash → docs) dim keeps only
    // tiles with df ∈ [2, 64] — a tile shared by MORE than 64 docs is
    // boilerplate (blank rows, solid fills), carries no dedup signal,
    // and is exactly the row whose per-doc fan-out grows with the corpus
    // (it was the suite's worst decade ratio, 2.9× at 10× data, when the
    // dim was uncapped). Boilerplate mass is still reported per doc
    // (`boiler_tiles`) from the same constant-size dim, the way
    // dd_band_stats reports over-cap band mass out-of-band. Plan shape:
    // n_tiles is a map-side-combined groupBy with NO join; the df dim
    // shrinks to only-shared tiles (HAVING > 1), so the equi-join back
    // to the tile list moves a candidate set, not the corpus.
    "mm_tile_dedup" -> Q(
      """WITH tl AS (
        |  SELECT DISTINCT d.doc_id,
        |         md5(substring(d.text, CAST((u.i - 1) * 16 + 1 AS INTEGER), 16)) AS th
        |  FROM documents d, unnest(range(1, length(d.text) // 16 + 1)) u(i)),
        |df AS (SELECT th, CAST(COUNT(*) AS BIGINT) AS n_docs FROM tl
        |       GROUP BY th HAVING COUNT(*) > 1),
        |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tiles FROM tl GROUP BY doc_id),
        |sh AS (
        |  SELECT tl.doc_id,
        |         CAST(SUM(CASE WHEN df.n_docs <= 64 THEN 1 ELSE 0 END) AS BIGINT) AS shared_tiles,
        |         CAST(SUM(CASE WHEN df.n_docs > 64 THEN 1 ELSE 0 END) AS BIGINT) AS boiler_tiles
        |  FROM tl JOIN df ON tl.th = df.th GROUP BY tl.doc_id)
        |SELECT per.doc_id, per.n_tiles,
        |       CAST(COALESCE(sh.shared_tiles, 0) AS BIGINT) AS shared_tiles,
        |       CAST(COALESCE(sh.boiler_tiles, 0) AS BIGINT) AS boiler_tiles,
        |       CAST(COALESCE(sh.shared_tiles, 0) * 10000 // per.n_tiles AS BIGINT) AS shared_bp
        |FROM per LEFT JOIN sh ON per.doc_id = sh.doc_id
        |ORDER BY per.doc_id""".stripMargin) { (s, d) =>
      // one-pass tile-digest kernel (functions/Shingles.TileMd5): the
      // explode form re-walked the text from the front for every
      // substring(text, (i-1)*16+1, 16) probe — Θ(n²/16) per document —
      // and then paid a row-level .distinct() exchange on (doc_id, th);
      // the kernel digests each 16-codepoint byte slice in place and
      // dedups during the walk, so the tile lineage is map-side until
      // the th-keyed aggregate
      graft.functions.Shingles.register(s)
      val tl = Tables.spread(Tables.documents(s, d), "doc_id")
        .select(col("doc_id"),
                explode(call_function("graft_tile_md5", col("text"), lit(16))).as("th"))
      val df = tl.groupBy("th").agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > 1)
      // one LEFT join carries the df annotation back to every tile row
      // (null = unshared), so a single doc_id aggregate produces all
      // three counts — the tile list is computed twice (once under the
      // df rollup, once as the probe), never three times
      tl.join(df, Seq("th"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tiles"),
             sum(when(col("n_docs").isNotNull && col("n_docs") <= 64, 1L)
               .otherwise(0L)).as("shared_tiles"),
             sum(when(col("n_docs") > 64, 1L).otherwise(0L)).as("boiler_tiles"))
        .select(col("doc_id"), col("n_tiles"), col("shared_tiles"), col("boiler_tiles"),
                expr("cast(shared_tiles * 10000 div n_tiles as bigint)").as("shared_bp"))
        .orderBy("doc_id")
    },

    // Sharpness / blur detection — the variance-of-Laplacian focus
    // measure every image-quality pipeline runs before training on
    // crawled images, in its integer 1-D form on the 32-px-row grid:
    // lap(i) = p(i-1) − 2·p(i) + p(i+1) within each pixel row, and the
    // doc's sharpness is the Laplacian ENERGY Σ lap² (a blurred/flat
    // image has tiny second differences; a sharp one has large ones).
    // All-integer (no variance float math), one projection + one
    // map-side-combined aggregate per doc; row-boundary pixels are
    // excluded so no window/shuffle is needed to see neighbors.
    "mm_sharpness" -> Q(
      """WITH lp AS (
        |  SELECT d.doc_id,
        |         CAST(ord(substring(d.text, CAST(u.i - 1 AS INTEGER), 1)) AS BIGINT)
        |           - 2 * CAST(ord(substring(d.text, CAST(u.i AS INTEGER), 1)) AS BIGINT)
        |           + CAST(ord(substring(d.text, CAST(u.i + 1 AS INTEGER), 1)) AS BIGINT) AS lap
        |  FROM documents d, unnest(range(1, length(d.text) + 1)) u(i)
        |  WHERE ((u.i - 1) % 32) NOT IN (0, 31) AND u.i + 1 <= length(d.text))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |       CAST(SUM(lap * lap) AS BIGINT) AS lap_energy,
        |       CAST(MAX(abs(lap)) AS BIGINT) AS max_abs_lap,
        |       CAST(SUM(lap * lap) // COUNT(*) AS BIGINT) AS mean_energy
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      // ONE PASS, NO EXPLODE (round 10, the mm_dhash kernel move): three
      // substring probes PER CHARACTER made this the family's second-
      // worst sf10 query (106.3 s); the Laplacian fold is a per-doc
      // codegen kernel (functions/PixelKernels.scala). Parity pinned in
      // PixelKernelsSpec.
      graft.functions.LapStats.register(s)
      // sort first, fold after (the q61 move): the ORDER BY's range
      // sampler executes a map-only child twice, so the kernel ran on
      // both passes; the sort also spreads the fold over all cores
      Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy("doc_id")
        .select(col("doc_id"), expr("graft_lap_stats(text)").as("st"))
        .filter(col("st.n_terms") > 0)
        .select(col("doc_id"), col("st.n_terms").as("n_terms"),
                col("st.lap_energy").as("lap_energy"),
                col("st.max_abs_lap").as("max_abs_lap"),
                expr("cast(st.lap_energy div st.n_terms as bigint)").as("mean_energy"))
    }
  )
}
