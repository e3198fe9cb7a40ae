package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal plumbing: image/audio/video as opaque `binary` columns with
  * typed metadata. The container has no codec libraries, so the DECODE is
  * a deterministic stand-in (documented in operators/Multimodal.scala);
  * everything Spark-side — schema, batch shape, partitioning, the
  * explode-per-frame pattern — is real and oracle-checked where
  * expressible (the "payload" here is the utf-8 bytes of documents.text,
  * so DuckDB can recompute the same metadata).
  */
object MultimodalQueries {

  def defs: Map[String, Q] = Map(

    // Decode + metadata extraction over a binary payload column: byte
    // length, content hash, fake decoded dimensions. The binary column is
    // real (`encode(text)`); the width/height derivation stands in for a
    // codec header parse.
    "mm_decode_meta" -> Q(
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       md5(text) AS content_hash,
        |       CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS fake_width,
        |       CAST(octet_length(encode(text)) % 480 + 1 AS BIGINT) AS fake_height,
        |       CAST(octet_length(encode(text)) // 64 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val bytes   = encode(col("text"), "UTF-8")
      val byteLen = length(bytes).cast("long")
      Tables.documents(s, d).select(
        col("doc_id"),
        byteLen.as("byte_len"),
        md5(bytes).as("content_hash"),
        (byteLen % 640 + 1).as("fake_width"),
        (byteLen % 480 + 1).as("fake_height"),
        expr("CAST(octet_length(encode(text, 'UTF-8')) div 64 AS BIGINT)").as("n_frames"))
        .orderBy("doc_id")
    },

    // Frame sampling over a binary "video": every 4th 64-byte chunk
    // becomes a frame row (sequence + explode — the one-row-per-frame
    // shape a real video pipeline needs), hashed as the stand-in for
    // decode + feature extraction.
    "mm_frame_sample" -> Q(
      """SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
        |       md5(substring(text, CAST(f * 64 + 1 AS INTEGER), 64)) AS frame_hash
        |FROM documents,
        |     unnest(CASE WHEN length(text) // 64 > 0
        |                 THEN [x for x in range(0, length(text) // 64, 4)]
        |                 ELSE [] END) t(f)
        |ORDER BY doc_id, frame_no""".stripMargin) { (s, d) =>
      val nFrames = expr("CAST(length(text) div 64 AS BIGINT)")
      val frameIds = when(nFrames > 0,
        sequence(lit(0L), nFrames - 1, lit(4L))).otherwise(array().cast("array<bigint>"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), explode(frameIds).as("frame_no"))
        .select(col("doc_id"), col("frame_no"),
          md5(expr("substring(text, CAST(frame_no * 64 + 1 AS INT), 64)")).as("frame_hash"))
        .orderBy("doc_id", "frame_no")
    },

    // Image RESIZE (box downsample) over the binary "pixel grid" — the
    // resize leg of the decode/feature-extract/resize/frame-sample
    // quartet: the payload reads as a 32-wide grid of byte "pixels"
    // (same fake-decode contract as mm_phash), and a 4×4 average-pool
    // shrinks it 16× — exactly the batch shape of a thumbnailing /
    // model-input-resize stage. All-integer outputs: per-block mean is
    // integer floor division, the checksum sums the pooled means, so
    // the oracle hash-matches exactly. Scale shape: one posexplode to
    // (pixel, block) rows, a map-side-combined per-block aggregate
    // (blocks ≤ pixels/16 per doc), then a per-doc rollup — no HOF
    // lambdas in the hot path (the mm_phash 36× lesson), and output is
    // one row per doc.
    "mm_resize" -> Q(
      """WITH px AS (
        |  SELECT d.doc_id, length(d.text) AS len,
        |         ((u.i - 1) // 32) // 4 AS br, ((u.i - 1) % 32) // 4 AS bc,
        |         CAST(ord(substring(d.text, CAST(u.i AS INTEGER), 1)) AS BIGINT) AS p
        |  FROM documents d, unnest(range(1, length(d.text) + 1)) u(i)),
        |blk AS (
        |  SELECT doc_id, len, br, bc,
        |         CAST(SUM(p) AS BIGINT) // COUNT(*) AS mean_p
        |  FROM px GROUP BY doc_id, len, br, bc)
        |SELECT doc_id,
        |       CAST(32 AS BIGINT) AS in_w,
        |       CAST((len + 31) // 32 AS BIGINT) AS in_h,
        |       CAST(8 AS BIGINT) AS out_w,
        |       CAST(MAX(br) + 1 AS BIGINT) AS out_h,
        |       CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |       CAST(SUM(mean_p) AS BIGINT) AS pooled_checksum
        |FROM blk GROUP BY doc_id, len ORDER BY doc_id""".stripMargin) { (s, d) =>
      // ONE PASS, NO EXPLODE (round 10): the posexplode + per-character
      // substring pipeline paid Θ(n²) codepoint scans per doc and a
      // corpus-character-scale shuffle (43.9 s in the honest sf10
      // bench); the 4×4 box pool is a streaming per-doc fold with one
      // 8-cell block-row buffer, now a codegen kernel
      // (functions/PixelKernels.scala). Empty docs fold to n_blocks = 0
      // and are filtered, matching the explode form where they emit no
      // pixel rows. Parity pinned in PixelKernelsSpec.
      graft.functions.ResizeStats.register(s)
      // sort first, fold after (the q61 move): the ORDER BY's range
      // sampler executes a map-only child twice
      Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy("doc_id")
        .select(col("doc_id"), length(col("text")).cast("long").as("len"),
                expr("graft_resize_stats(text)").as("st"))
        .filter(col("st.n_blocks") > 0)
        .select(col("doc_id"), lit(32L).as("in_w"),
                expr("cast((len + 31) div 32 as bigint)").as("in_h"),
                lit(8L).as("out_w"), col("st.out_h").as("out_h"),
                col("st.n_blocks").as("n_blocks"),
                col("st.pooled_checksum").as("pooled_checksum"))
        .orderBy("doc_id")
    },

    // Audio energy profile over a binary "PCM stream": the first 256
    // bytes as unsigned samples, framed 16 samples per window — per-doc
    // frame count, total energy (Σ sample² in BIGINT), low-energy
    // ("silence") frame count via an integer mean-square threshold, and
    // the silence ratio a speech pipeline gates on (VAD's batch
    // analogue). Same fake-decode contract as mm_phash (ascii values
    // stand in for the codec), same scalable shape: posexplode → two
    // codegen'd hash aggregates, ≤256 sample rows per doc map-side
    // combined — not per-element HOF lambdas (the mm_phash 36× lesson).
    "mm_audio_energy" -> Q(
      """WITH px AS (
        |  SELECT d.doc_id, (u.i - 1) // 16 AS frame,
        |         CAST(ord(substring(d.text, CAST(u.i AS INTEGER), 1)) AS BIGINT) AS p
        |  FROM documents d, unnest(range(1, 257)) u(i)
        |  WHERE length(d.text) > 0 AND u.i <= least(256, length(d.text))),
        |fr AS (
        |  SELECT doc_id, frame, CAST(SUM(p * p) AS BIGINT) AS ss, COUNT(*) AS n
        |  FROM px GROUP BY doc_id, frame)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS INTEGER) AS n_frames,
        |       CAST(SUM(ss) AS BIGINT) AS energy_total,
        |       CAST(SUM(CASE WHEN ss < 10000 * n THEN 1 ELSE 0 END) AS INTEGER)
        |         AS silence_frames,
        |       CAST(SUM(CASE WHEN ss < 10000 * n THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) AS silence_ratio
        |FROM fr GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      // one-pass kernel (round 11, functions/PixelKernels.AudioEnergyStats):
      // the posexplode + two hash aggregates re-walked the text per char
      // and shuffled ≤256 sample rows/doc; the whole profile is a bounded
      // in-row fold (the mm_dhash recipe). Sort first, fold after (the
      // q61 move): the ORDER BY's range sampler executes a map-only child
      // twice. st.n_frames > 0 ≡ the old length(text) > 0 guard. Parity
      // pinned in PixelKernelsSpec.
      graft.functions.AudioEnergyStats.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy("doc_id")
        .select(col("doc_id"), expr("graft_audio_energy(text)").as("st"))
        .filter(col("st.n_frames") > 0)
        .select(col("doc_id"),
                col("st.n_frames").cast("int").as("n_frames"),
                col("st.energy_total").as("energy_total"),
                col("st.silence_frames").cast("int").as("silence_frames"),
                (col("st.silence_frames").cast("double")
                   / col("st.n_frames").cast("double")).as("silence_ratio"))
    },

    // Leading/trailing silence TRIM points — the clip-extraction step
    // that follows mm_audio_energy's VAD profile: per "audio" doc, the
    // first and last frame above the silence threshold (same 16-byte
    // frames, same integer Σp² < 10000·n test) and how many frames the
    // trim keeps vs drops. All-silence docs trim to zero frames with
    // NULL endpoints. Scale shape: identical to mm_audio_energy — one
    // map-side-combined frame aggregate then a per-doc rollup; trim
    // arithmetic is NULL-safe integer post-aggregation.
    "mm_silence_trim" -> Q(
      """WITH px AS (
        |  SELECT d.doc_id, (u.i - 1) // 16 AS frame,
        |         CAST(ord(substring(d.text, CAST(u.i AS INTEGER), 1)) AS BIGINT) AS p
        |  FROM documents d, unnest(range(1, 257)) u(i)
        |  WHERE length(d.text) > 0 AND u.i <= least(256, length(d.text))),
        |fr AS (
        |  SELECT doc_id, frame, CAST(SUM(p * p) AS BIGINT) AS ss, COUNT(*) AS n
        |  FROM px GROUP BY doc_id, frame),
        |ag AS (
        |  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_frames,
        |         CAST(MIN(CASE WHEN ss >= 10000 * n THEN frame END) AS BIGINT)
        |           AS first_sound,
        |         CAST(MAX(CASE WHEN ss >= 10000 * n THEN frame END) AS BIGINT)
        |           AS last_sound
        |  FROM fr GROUP BY doc_id)
        |SELECT doc_id, n_frames, first_sound, last_sound,
        |       CAST(COALESCE(last_sound - first_sound + 1, 0) AS BIGINT)
        |         AS kept_frames,
        |       CAST(n_frames - COALESCE(last_sound - first_sound + 1, 0) AS BIGINT)
        |         AS trimmed_frames
        |FROM ag ORDER BY doc_id""".stripMargin) { (s, d) =>
      // one-pass kernel (round 11, functions/PixelKernels.SilenceTrimStats)
      // — same move as mm_audio_energy above; all-silent docs fold to
      // NULL endpoints exactly like the conditional MIN/MAX.
      graft.functions.SilenceTrimStats.register(s)
      val kept = coalesce(col("st.last_sound") - col("st.first_sound") + 1, lit(0L))
      Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy("doc_id")
        .select(col("doc_id"), expr("graft_silence_trim(text)").as("st"))
        .filter(col("st.n_frames") > 0)
        .select(col("doc_id"),
                col("st.n_frames").cast("int").as("n_frames"),
                col("st.first_sound").as("first_sound"),
                col("st.last_sound").as("last_sound"),
                kept.as("kept_frames"),
                (col("st.n_frames") - kept).cast("long").as("trimmed_frames"))
    },

    // Perceptual average-hash (aHash) over the deterministic fake raster
    // (first 62 byte values as "pixels" — 62 bits keeps the BIGINT
    // positive in both engines): bit j set iff pixel j exceeds the
    // integer mean, plus the hash-bucket size (exact-duplicate rasters
    // group by equality — the content-addressed image-dedup key). The
    // REAL-codec twin is operators/Multimodal.averageHash: 8×8
    // average-pooled luminance over ImageIO-decoded rasters, invariant
    // under container re-encode (OperatorsSpec); this declared query
    // pins the bit rule and grouping shape the real path shares.
    "mm_phash" -> Q(
      """WITH t AS (
        |  SELECT doc_id,
        |         [ord(substring(text, i, 1))
        |          for i in range(1, least(62, length(text)) + 1)] AS px
        |  FROM documents WHERE length(text) > 0),
        |m AS (
        |  SELECT doc_id, px,
        |         CAST(list_sum(px) AS BIGINT) // len(px) AS mean FROM t),
        |h AS (
        |  SELECT doc_id,
        |         CAST(list_sum([CASE WHEN px[j] > mean
        |                             THEN CAST(1 AS BIGINT) << (j - 1)
        |                             ELSE CAST(0 AS BIGINT) END
        |                        for j in range(1, len(px) + 1)]) AS BIGINT) AS phash
        |  FROM m),
        |g AS (SELECT phash, COUNT(*) AS n_same FROM h GROUP BY phash)
        |SELECT h.doc_id, h.phash, g.n_same
        |FROM h JOIN g ON h.phash = g.phash ORDER BY h.doc_id""".stripMargin) { (s, d) =>
      // explode/aggregate shape, NOT per-element HOF lambdas: interpreted
      // higher-order functions over a per-char substring chain measured
      // ~30 s at sf0.1, where two codegen'd hash aggregates + one
      // doc_id equi-join run in well under a second. 62 pixel rows per
      // doc stay map-side combined throughout.
      // length(text)>0 guard in BOTH twins: Spark's split('', '') yields
      // [""] so an empty doc would survive with phash=0, while DuckDB's
      // empty px list gives NULL and drops the row at the h⋈g join
      // one-pass kernel (functions/PixelKernels.PhashVal): the exploded
      // form aggregated the 62 pixel rows twice (mean, then bits) and
      // joined them back by doc_id; the fold is bounded in-row state
      graft.functions.PhashVal.register(s)
      val h = Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), expr("graft_phash(text)").as("phash"))
      val g = h.groupBy(col("phash").as("g_phash")).agg(count(lit(1)).as("n_same"))
      h.join(g, col("phash") === col("g_phash"))
        .select(col("doc_id"), col("phash"), col("n_same"))
        .orderBy("doc_id")
    },

    // NEAR-duplicate images: Hamming-ball pairs over the aHash via
    // multi-index hashing (Norouzi, Punjani, Fleet 2012) — the 62-bit
    // hash splits into four 16-bit bands; by pigeonhole any pair within
    // Hamming distance 3 collides on at least one band EXACTLY (full
    // recall at r≤3), pairs out to the reported r≤8 are caught
    // best-effort. The step beyond mm_phash's exact-bucket grouping:
    // re-encoded/slightly-edited images hash close-but-not-equal.
    // Scale shape: band buckets meet in equi-joins (never all-pairs)
    // and buckets outside [2,256] rows are dropped in BOTH twins — the
    // dd_minhash BandCap rule, keeping the pair space bounded under any
    // skew; the hash frame is checkpointed once for the two join sides.
    "mm_phash_pairs" -> Q(
      """WITH t AS (
        |  SELECT doc_id,
        |         [ord(substring(text, i, 1))
        |          for i in range(1, least(62, length(text)) + 1)] AS px
        |  FROM documents WHERE length(text) > 0),
        |m AS (
        |  SELECT doc_id, px,
        |         CAST(list_sum(px) AS BIGINT) // len(px) AS mean FROM t),
        |h AS (
        |  SELECT doc_id,
        |         CAST(list_sum([CASE WHEN px[j] > mean
        |                             THEN CAST(1 AS BIGINT) << (j - 1)
        |                             ELSE CAST(0 AS BIGINT) END
        |                        for j in range(1, len(px) + 1)]) AS BIGINT) AS phash
        |  FROM m),
        |b AS (
        |  SELECT doc_id, phash, bid,
        |         CAST((phash >> (bid * 16)) & 65535 AS BIGINT) AS bkey
        |  FROM h, unnest([0, 1, 2, 3]) u(bid)),
        |ok AS (
        |  SELECT bid, bkey FROM b GROUP BY bid, bkey
        |  HAVING COUNT(*) BETWEEN 2 AND 256),
        |p AS (
        |  SELECT DISTINCT a.doc_id AS da, c.doc_id AS db,
        |                  a.phash AS ha, c.phash AS hb
        |  FROM b a
        |  JOIN ok o ON a.bid = o.bid AND a.bkey = o.bkey
        |  JOIN b c ON a.bid = c.bid AND a.bkey = c.bkey AND a.doc_id < c.doc_id)
        |SELECT da, db, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
        |FROM p WHERE bit_count(xor(ha, hb)) <= 8
        |ORDER BY da, db""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // one-pass kernel (see mm_phash); the round-9 checkpoint is gone —
      // recomputing a bounded in-row fold per join side is cheaper than
      // materializing the hash frame
      graft.functions.PhashVal.register(s)
      val h = Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), expr("graft_phash(text)").as("phash"))
      val b = h.select(col("doc_id"), col("phash"),
                       explode(expr("array(0, 1, 2, 3)")).as("bid"))
        .withColumn("bkey", expr("shiftright(phash, bid * 16) & 65535"))
      val fb = b.withColumn("bn", count(lit(1)).over(Window.partitionBy("bid", "bkey")))
        .filter(col("bn") >= 2 && col("bn") <= 256)
      val a = fb.select(col("bid"), col("bkey"),
                        col("doc_id").as("da"), col("phash").as("ha"))
      val c = fb.select(col("bid").as("bid2"), col("bkey").as("bkey2"),
                        col("doc_id").as("db"), col("phash").as("hb"))
      a.join(c, col("bid") === col("bid2") && col("bkey") === col("bkey2") &&
                col("da") < col("db"))
        .select("da", "db", "ha", "hb").distinct()
        .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
        .filter(col("hamming") <= 8)
        .select("da", "db", "hamming")
        .orderBy("da", "db")
    },

    // Scene-cut detection over the binary "video": mm_frame_sample's
    // strided frames reduced to an integer luminance stand-in (byte sum
    // of the 64-byte chunk — same fake-decode contract), consecutive
    // frames compared by a doc-partitioned lag window, a cut flagged
    // when |Δ| exceeds the data-tuned threshold. The shot-boundary
    // report a video curation pipeline computes before clip extraction.
    // Scale shape: frames×64 byte rows collapse in a map-side-combined
    // aggregate (the mm_audio_energy recipe, not per-element HOF
    // lambdas — the mm_phash 36× lesson), then one bounded per-doc
    // window; everything integer, oracle-exact.
    "mm_scene_cuts" -> Q(
      """WITH fr AS (
        |  SELECT d.doc_id, f AS frame_no,
        |         substring(d.text, CAST(f * 64 + 1 AS INTEGER), 64) AS chunk
        |  FROM documents d,
        |       unnest(CASE WHEN length(text) // 64 > 0
        |                   THEN [x for x in range(0, length(text) // 64, 4)]
        |                   ELSE [] END) t(f)),
        |px AS (
        |  SELECT doc_id, frame_no,
        |         CAST(SUM(ord(substring(chunk, CAST(j AS INTEGER), 1))) AS BIGINT) AS fsum
        |  FROM fr, unnest(range(1, 65)) u(j)
        |  GROUP BY doc_id, frame_no),
        |dl AS (
        |  SELECT doc_id, frame_no, fsum,
        |         fsum - LAG(fsum) OVER (PARTITION BY doc_id ORDER BY frame_no) AS delta
        |  FROM px)
        |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_frames,
        |       CAST(SUM(CASE WHEN abs(delta) > 300 THEN 1 ELSE 0 END) AS INTEGER) AS n_cuts,
        |       CAST(MAX(abs(delta)) AS BIGINT) AS max_abs_delta,
        |       CAST(MIN(CASE WHEN abs(delta) > 300 THEN frame_no END) AS BIGINT)
        |         AS first_cut_frame
        |FROM dl GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val nFrames  = expr("CAST(length(text) div 64 AS BIGINT)")
      val frameIds = when(nFrames > 0,
        sequence(lit(0L), nFrames - 1, lit(4L))).otherwise(array().cast("array<bigint>"))
      val px = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), explode(frameIds).as("frame_no"))
        .select(col("doc_id"), col("frame_no"),
                posexplode(split(expr("substring(text, CAST(frame_no * 64 + 1 AS INT), 64)"),
                                 "")).as(Seq("j", "ch")))
        .groupBy("doc_id", "frame_no")
        .agg(sum(ascii(col("ch"))).as("fsum"))
      val wd = Window.partitionBy("doc_id").orderBy("frame_no")
      px.withColumn("delta", col("fsum") - lag(col("fsum"), 1).over(wd))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_frames"),
             sum(when(abs(col("delta")) > 300, 1).otherwise(0)).cast("int").as("n_cuts"),
             max(abs(col("delta"))).as("max_abs_delta"),
             min(when(abs(col("delta")) > 300, col("frame_no"))).as("first_cut_frame"))
        .orderBy("doc_id")
    },

    // Pixel-intensity histogram profile — the exposure/contrast summary
    // an image-curation gate reads (flat histogram ⇒ noise, one-bucket
    // histogram ⇒ blank/overexposed): per "image" (first 256 byte
    // pixels, same fake-decode contract as mm_audio_energy), the
    // 32-wide intensity buckets used, the modal bucket (ties to the
    // LOWEST bucket via a max-count + min-bucket two-level aggregate —
    // no argmax nondeterminism), its population, and the dynamic range.
    // Scale shape: posexplode → (doc, bucket) counts map-side combined,
    // then two doc-keyed rollups — ≤8 bucket rows per doc, all-integer.
    "mm_pixel_hist" -> Q(
      """WITH px AS (
        |  SELECT d.doc_id,
        |         CAST(ord(substring(d.text, CAST(u.i AS INTEGER), 1)) AS BIGINT) AS p
        |  FROM documents d, unnest(range(1, 257)) u(i)
        |  WHERE length(d.text) > 0 AND u.i <= least(256, length(d.text))),
        |bc AS (
        |  SELECT doc_id, p // 32 AS bucket, CAST(COUNT(*) AS BIGINT) AS c,
        |         CAST(MIN(p) AS BIGINT) AS pmin, CAST(MAX(p) AS BIGINT) AS pmax
        |  FROM px GROUP BY doc_id, p // 32),
        |mx AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_px,
        |         CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |         CAST(MAX(c) AS BIGINT) AS mode_count,
        |         CAST(MIN(pmin) AS BIGINT) AS p_lo, CAST(MAX(pmax) AS BIGINT) AS p_hi
        |  FROM bc GROUP BY doc_id)
        |SELECT m.doc_id, m.n_px, m.n_buckets,
        |       CAST(MIN(b.bucket) AS BIGINT) AS mode_bucket, m.mode_count,
        |       m.p_hi - m.p_lo AS dynamic_range
        |FROM mx m JOIN bc b ON m.doc_id = b.doc_id AND b.c = m.mode_count
        |GROUP BY m.doc_id, m.n_px, m.n_buckets, m.mode_count, m.p_hi - m.p_lo
        |ORDER BY m.doc_id""".stripMargin) { (s, d) =>
      // one-pass kernel (round 11, functions/PixelKernels.PixelHistStats):
      // the exploded form paid a (doc, bucket) aggregate, a per-doc
      // rollup AND a mode-tiebreak self-join; the whole histogram is a
      // ≤256-entry in-row fold with the same min-bucket tie-break.
      graft.functions.PixelHistStats.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"), col("text")).orderBy("doc_id")
        .select(col("doc_id"), expr("graft_pixel_hist(text)").as("st"))
        .filter(col("st.n_px") > 0)
        .select(col("doc_id"), col("st.n_px").as("n_px"),
                col("st.n_buckets").as("n_buckets"),
                col("st.mode_bucket").as("mode_bucket"),
                col("st.mode_count").as("mode_count"),
                (col("st.p_hi") - col("st.p_lo")).as("dynamic_range"))
    }
  )
}
