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
    }
  )
}
