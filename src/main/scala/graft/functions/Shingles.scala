package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 shingle kernels — the token n-gram generators that feed the
  * dedup / contamination / boilerplate families, folded to one pass.
  *
  * The previous form was the interpreted HOF chain
  * `transform(sequence(0, size(toks) - n), i -> concat_ws(' ',
  * slice(toks, i + 1, n)))` over `split(text, ' ')`: higher-order
  * lambdas never enter whole-stage codegen, and each shingle allocates a
  * slice array plus a concat buffer. On the honest sf10 bench the
  * shingle families were 8 of the 15 slowest queries (ta_boilerplate
  * 43.5 s, ta_ngram_coverage 37.3 s, ta_bloom_contamination 37.1 s,
  * ta_contamination_folded 33.2 s, ta_repetition 30.4 s, …).
  *
  * A shingle of n single-space-separated tokens is a byte SLICE of the
  * original text (split on ' ' keeps empties; joining consecutive
  * tokens with ' ' reproduces the exact bytes between the outer token
  * boundaries — 0x20 never occurs inside a UTF-8 multibyte sequence, so
  * byte scanning is codepoint-safe). The kernels walk the bytes once,
  * record token boundaries, and emit either the shingle strings
  * ([[ShingleArray]], `graft_shingles(text, n, mode)`) or their h32
  * hashes ([[ShingleH32]], `graft_shingle_h32(text, n, mode)` — MD5 of
  * the slice, first 4 bytes as an unsigned 32-bit value, byte-identical
  * to Portable.h32's `conv(substring(md5(s), 1, 8), 16, 10)` and the
  * oracle's duckH). No per-shingle string building happens at all in
  * the hashed form: the digest consumes the byte slice in place.
  *
  * `mode` selects the declared fallback/dedup semantics of the call
  * sites (ShinglesSpec pins each against the HOF form it replaced):
  *   0 — positional, whole-doc fallback: < n tokens ⇒ [text]
  *       (QualityQueries.posShingles, ta_boilerplate, dd sigDf)
  *   1 — first-occurrence-distinct, whole-doc fallback
  *       (DedupQueries.shinglesFrom / array_distinct semantics)
  *   2 — positional, empty fallback: < n tokens ⇒ []
  *       (PipelineQueries.gramStream, ta_contamination,
  *        ta_ngram_coverage, DedupQueries2.grams)
  *   3 — first-occurrence-distinct, empty fallback
  *       (streaming DecontamStream's array_distinct grams)
  */
private[functions] abstract class ShingleKernel extends TernaryExpression {
  def text: Expression; def n: Expression; def mode: Expression
  override def first: Expression = text
  override def second: Expression = n
  override def third: Expression = mode
  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && n.dataType == IntegerType &&
        mode.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, INT, INT), got (${text.dataType.simpleString}, " +
        s"${n.dataType.simpleString}, ${mode.dataType.simpleString})")
}

case class ShingleArray(text: Expression, n: Expression, mode: Expression)
    extends ShingleKernel {
  override def prettyName: String = "graft_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(t: Any, nv: Any, mv: Any): Any =
    Shingles.strings(t.asInstanceOf[UTF8String],
      nv.asInstanceOf[Int], mv.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, nv, mv) =>
      s"graft.functions.Shingles.strings($t, $nv, $mv)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(text = f, n = s, mode = t)
}

case class ShingleH32(text: Expression, n: Expression, mode: Expression)
    extends ShingleKernel {
  override def prettyName: String = "graft_shingle_h32"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any, nv: Any, mv: Any): Any =
    Shingles.h32s(t.asInstanceOf[UTF8String],
      nv.asInstanceOf[Int], mv.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, nv, mv) =>
      s"graft.functions.Shingles.h32s($t, $nv, $mv)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(text = f, n = s, mode = t)
}

/** mm_tile_dedup's tile digests: MD5 hex of each w-CODEPOINT tile of
  * the document (full tiles only — the trailing < w codepoints drop,
  * matching `sequence(1, length(text) div w)`), first-occurrence-
  * distinct. One byte walk replaces the explode + per-tile
  * `substring(text, (i-1)*w+1, w)` — which re-walks from the front to
  * the i-th codepoint per call, Θ(n²/w) per document — and the
  * row-level `.distinct()` exchange. Dedup is on the DIGEST (the
  * declared query dedups th, not the tile bytes). */
case class TileMd5(text: Expression, w: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "graft_tile_md5"
  override def left: Expression = text
  override def right: Expression = w
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && w.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, INT), got (${text.dataType.simpleString}, " +
        s"${w.dataType.simpleString})")
  override def nullSafeEval(t: Any, wv: Any): Any =
    Shingles.tileMd5(t.asInstanceOf[UTF8String], wv.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, wv) => s"graft.functions.Shingles.tileMd5($t, $wv)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(text = l, w = r)
}

/** ta_repetition's whole fold: positional n-gram count / distinct count
  * / max recurrence per document, no explode, no shuffle. */
case class RepStats(text: Expression, n: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = text
  override def right: Expression = n
  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && n.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rep_stats expects (STRING, INT), got " +
        s"(${text.dataType.simpleString}, ${n.dataType.simpleString})")
  override def dataType: DataType = StructType(Seq(
    StructField("n_shingles", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_rep", LongType, nullable = false)))
  override def prettyName: String = "graft_rep_stats"
  override def nullSafeEval(t: Any, nv: Any): Any =
    Shingles.repStats(t.asInstanceOf[UTF8String], nv.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, nv) => s"graft.functions.Shingles.repStats($t, $nv)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, n = newRight)
}

/** ta_fingerprint's polynomial rolling hash: fold (acc·31 + h32(token))
  * mod 1e9+7 over the token stream, one pass, no token array and no
  * per-token interpreted lambda. */
case class RollingFp(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_fp expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_fp"
  override def nullSafeEval(input: Any): Any =
    Shingles.rollingFp(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.rollingFp($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** dd_simhash's whole fold: per-token 16-bit hashes (first 4 md5 hex
  * chars) vote per bit position; bit set iff the vote is positive.
  * One pass — the declarative form ran 16 interpreted aggregate()
  * lambdas over a materialized per-token hash array. */
case class SimhashStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("simhash", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))
  override def prettyName: String = "graft_simhash"
  override def nullSafeEval(input: Any): Any =
    Shingles.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** dd_cdc_chunks' chunker: content-defined cut points (h32(token) ≡ 0
  * mod 8) and per-chunk h60 over the chunk's byte slice, one pass —
  * the declarative form ran four chained HOF lambdas (filter cut
  * points, build boundary arrays, zip_with slice+concat_ws, filter
  * empties) with an interpreted md5 per token AND per chunk. Returns
  * array<struct<ch, n_tokens>>; chunk text never materializes. */
case class CdcChunks(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ch", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"
  override def nullSafeEval(input: Any): Any =
    Shingles.cdcChunks(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.cdcChunks($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document token→occurrence-count map, first-occurrence order, one
  * byte walk — the in-row twin of groupBy(doc_id, token).count over
  * explode(split(text, ' ')). `mode` 0 keeps empty tokens (string_split
  * semantics), 1 drops them (the WHERE length(token) > 0 call sites).
  * Consumers explode the array, so the (doc, token) pre-aggregation
  * exchange disappears (ta_keywords_per_doc, ta_inverted_index). */
case class TokenCounts(text: Expression, mode: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "graft_token_counts"
  override def left: Expression = text
  override def right: Expression = mode
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && mode.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, INT), got (${text.dataType.simpleString}, " +
        s"${mode.dataType.simpleString})")
  override def nullSafeEval(t: Any, mv: Any): Any =
    Shingles.tokenCounts(t.asInstanceOf[UTF8String], mv.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, mv) => s"graft.functions.Shingles.tokenCounts($t, $mv)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(text = l, mode = r)
}

/** ta_feature_hash's whole per-document fold: every token occurrence
  * (empties included) hashes to one of 64 buckets via h32 mod 64; the
  * emitted profile is nnz / Σn² / modal bucket (ties to the LOWEST
  * bucket) / its population — no explode, no (doc, bucket) shuffle, no
  * per-doc rank window. */
case class FeatureHashStats(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_feature_hash"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("nnz", LongType, nullable = false),
    StructField("l2sq", LongType, nullable = false),
    StructField("top_bucket", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    Shingles.featureHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.featureHash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {

  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Token START byte offsets of `b` split on 0x20 (keeping empties),
    * with a sentinel: starts(k) = offset of token k, starts(nTok) =
    * b.length + 1, so token k spans [starts(k), starts(k+1) − 1) and a
    * shingle of tokens [j, j+n) spans [starts(j), starts(j+n) − 1). */
  private def tokenStarts(b: Array[Byte]): Array[Int] = {
    var nTok = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok + 1)
    starts(0) = 0
    var k = 1; i = 0
    while (i < b.length) { if (b(i) == ' ') { starts(k) = i + 1; k += 1 }; i += 1 }
    starts(nTok) = b.length + 1
    starts
  }

  private def checkArgs(n: Int, mode: Int): Unit = {
    if (n < 1) throw new IllegalArgumentException(
      s"shingle width must be >= 1, got $n")
    if (mode < 0 || mode > 3) throw new IllegalArgumentException(
      s"shingle mode must be in 0..3, got $mode")
  }

  def strings(s: UTF8String, n: Int, mode: Int): GenericArrayData = {
    checkArgs(n, mode)
    val b = s.getBytes
    val starts = tokenStarts(b)
    val nTok = starts.length - 1
    if (nTok < n) {
      if (mode >= 2) new GenericArrayData(Array.empty[Any])
      else new GenericArrayData(Array[Any](UTF8String.fromBytes(b)))
    } else {
      val m = nTok - n + 1
      if (mode == 1 || mode == 3) {
        val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
        var j = 0
        while (j < m) {
          val from = starts(j)
          seen.add(UTF8String.fromBytes(b, from, starts(j + n) - 1 - from))
          j += 1
        }
        val out = new Array[Any](seen.size)
        val it = seen.iterator()
        var k = 0
        while (it.hasNext) { out(k) = it.next(); k += 1 }
        new GenericArrayData(out)
      } else {
        val out = new Array[Any](m)
        var j = 0
        while (j < m) {
          val from = starts(j)
          out(j) = UTF8String.fromBytes(b, from, starts(j + n) - 1 - from)
          j += 1
        }
        new GenericArrayData(out)
      }
    }
  }

  /** First 4 MD5 bytes of the slice as an unsigned 32-bit value —
    * byte-identical to Portable.h32 / duckH(…, 8). */
  private def h32Of(b: Array[Byte], from: Int, len: Int): Long = {
    val md = md5.get()
    md.reset()
    md.update(b, from, len)
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def h32s(s: UTF8String, n: Int, mode: Int): GenericArrayData = {
    checkArgs(n, mode)
    val b = s.getBytes
    val starts = tokenStarts(b)
    val nTok = starts.length - 1
    if (nTok < n) {
      if (mode >= 2) new GenericArrayData(Array.empty[Any])
      else new GenericArrayData(Array[Any](h32Of(b, 0, b.length)))
    } else {
      val m = nTok - n + 1
      if (mode == 1 || mode == 3) {
        // distinct by shingle BYTES (equal hashes from different grams
        // must both survive — dedup is on the gram, not the hash)
        val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
        val out = new java.util.ArrayList[Any](m)
        var j = 0
        while (j < m) {
          val from = starts(j)
          val len = starts(j + n) - 1 - from
          if (seen.add(UTF8String.fromBytes(b, from, len)))
            out.add(h32Of(b, from, len))
          j += 1
        }
        new GenericArrayData(out.toArray)
      } else {
        val out = new Array[Any](m)
        var j = 0
        while (j < m) {
          val from = starts(j)
          out(j) = h32Of(b, from, starts(j + n) - 1 - from)
          j += 1
        }
        new GenericArrayData(out)
      }
    }
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** MD5 hex (lowercase, 32 chars — Spark md5()'s rendering) of the
    * byte slice [from, from+len). */
  private def md5HexOf(b: Array[Byte], from: Int, len: Int): UTF8String = {
    val md = md5.get()
    md.reset()
    md.update(b, from, len)
    val d = md.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Bytes of the UTF-8 sequence starting with byte `b` — mirrors
    * UTF8String's table (continuation/invalid bytes advance 1). */
  private def cpWidth(b: Byte): Int = {
    val u = b & 0xff
    if (u < 0xc0) 1 else if (u < 0xe0) 2 else if (u < 0xf0) 3
    else if (u < 0xf8) 4 else 1
  }

  def tileMd5(s: UTF8String, w: Int): GenericArrayData = {
    if (w < 1) throw new IllegalArgumentException(
      s"graft_tile_md5: tile width must be >= 1, got $w")
    val b = s.getBytes
    val seen = new java.util.LinkedHashSet[UTF8String](16)
    var pos = 0        // byte cursor
    var tileFrom = 0   // byte offset of the current tile's first codepoint
    var inTile = 0     // codepoints consumed in the current tile
    while (pos < b.length) {
      val adv = cpWidth(b(pos))
      pos = math.min(pos + adv, b.length) // clamp a truncated trailing sequence
      inTile += 1
      if (inTile == w) {
        seen.add(md5HexOf(b, tileFrom, pos - tileFrom))
        tileFrom = pos
        inTile = 0
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def repStats(s: UTF8String, n: Int): GenericInternalRow = {
    if (n < 1) throw new IllegalArgumentException(
      s"graft_rep_stats: shingle width must be >= 1, got $n")
    val b = s.getBytes
    val starts = tokenStarts(b)
    val nTok = starts.length - 1
    if (nTok < n)
      return new GenericInternalRow(Array[Any](1L, 1L, 1L))
    val m = nTok - n + 1
    val counts = new java.util.HashMap[UTF8String, Long](m * 2)
    var maxRep = 0L
    var j = 0
    while (j < m) {
      val from = starts(j)
      val sh = UTF8String.fromBytes(b, from, starts(j + n) - 1 - from)
      val c = counts.merge(sh, 1L, (a, inc) => a + inc)
      if (c > maxRep) maxRep = c
      j += 1
    }
    new GenericInternalRow(Array[Any](m.toLong, counts.size.toLong, maxRep))
  }

  def rollingFp(s: UTF8String): Long = {
    val b = s.getBytes
    val starts = tokenStarts(b)
    var acc = 0L
    var k = 0
    while (k < starts.length - 1) {
      val from = starts(k)
      acc = (acc * 31 + h32Of(b, from, starts(k + 1) - 1 - from)) % 1000000007L
      k += 1
    }
    acc
  }

  def simhash(s: UTF8String): GenericInternalRow = {
    val b = s.getBytes
    val starts = tokenStarts(b)
    val nTok = starts.length - 1
    val votes = new Array[Int](16)
    val md = md5.get()
    var k = 0
    while (k < nTok) {
      val from = starts(k)
      md.reset()
      md.update(b, from, starts(k + 1) - 1 - from)
      val d = md.digest()
      val h16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      var bit = 0
      while (bit < 16) {
        if (((h16 >> bit) & 1) == 1) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      k += 1
    }
    var sh = 0
    var bit = 0
    while (bit < 16) { if (votes(bit) > 0) sh |= 1 << bit; bit += 1 }
    new GenericInternalRow(Array[Any](sh, nTok))
  }

  /** First 15 md5 hex chars = top 60 digest bits (Portable.h60). */
  private def h60Of(b: Array[Byte], from: Int, len: Int): Long = {
    val md = md5.get()
    md.reset()
    md.update(b, from, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def cdcChunks(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val starts = tokenStarts(b)
    val nTok = starts.length - 1
    val out = new java.util.ArrayList[Any](nTok / 8 + 1)
    var chunkStartTok = 0
    var k = 0
    while (k < nTok) {
      val from = starts(k)
      val isCut = h32Of(b, from, starts(k + 1) - 1 - from) % 8 == 0
      if (isCut || k == nTok - 1) {
        // chunk = tokens [chunkStartTok, k] — a byte slice of the text
        val cFrom = starts(chunkStartTok)
        val cLen  = starts(k + 1) - 1 - cFrom
        out.add(new GenericInternalRow(Array[Any](
          h60Of(b, cFrom, cLen), (k - chunkStartTok + 1).toLong)))
        chunkStartTok = k + 1
      }
      k += 1
    }
    new GenericArrayData(out.toArray)
  }

  def tokenCounts(s: UTF8String, mode: Int): GenericArrayData = {
    if (mode < 0 || mode > 1) throw new IllegalArgumentException(
      s"graft_token_counts: mode must be 0 or 1, got $mode")
    val b = s.getBytes
    val starts = tokenStarts(b)
    val nTok = starts.length - 1
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]](nTok * 2)
    var k = 0
    while (k < nTok) {
      val from = starts(k)
      val len = starts(k + 1) - 1 - from
      if (mode == 0 || len > 0) {
        val tok = UTF8String.fromBytes(b, from, len)
        val c = counts.get(tok)
        if (c == null) counts.put(tok, Array(1L)) else c(0) += 1
      }
      k += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      i += 1
    }
    new GenericArrayData(out)
  }

  def featureHash(s: UTF8String): GenericInternalRow = {
    val b = s.getBytes
    val starts = tokenStarts(b)
    val nTok = starts.length - 1
    val n = new Array[Long](64)
    var k = 0
    while (k < nTok) {
      val from = starts(k)
      n((h32Of(b, from, starts(k + 1) - 1 - from) % 64).toInt) += 1
      k += 1
    }
    var nnz = 0L; var l2sq = 0L; var topBucket = 0L; var topCount = 0L
    var bkt = 0
    while (bkt < 64) {
      val c = n(bkt)
      if (c > 0) {
        nnz += 1; l2sq += c * c
        if (c > topCount) { topCount = c; topBucket = bkt }
      }
      bkt += 1
    }
    new GenericInternalRow(Array[Any](nnz, l2sq, topBucket, topCount))
  }

  private def reg(spark: SparkSession, name: String, cls: Class[_],
                  build: Seq[Expression] => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(ident, new ExpressionInfo(cls.getName, name), build)
    }
  }

  def register(spark: SparkSession): Unit = {
    reg(spark, "graft_shingles", classOf[ShingleArray], children => {
      require(children.size == 3); ShingleArray(children(0), children(1), children(2))
    })
    reg(spark, "graft_shingle_h32", classOf[ShingleH32], children => {
      require(children.size == 3); ShingleH32(children(0), children(1), children(2))
    })
    reg(spark, "graft_rep_stats", classOf[RepStats], children => {
      require(children.size == 2); RepStats(children(0), children(1))
    })
    reg(spark, "graft_rolling_fp", classOf[RollingFp], children => {
      require(children.size == 1); RollingFp(children.head)
    })
    reg(spark, "graft_simhash", classOf[SimhashStats], children => {
      require(children.size == 1); SimhashStats(children.head)
    })
    reg(spark, "graft_cdc_chunks", classOf[CdcChunks], children => {
      require(children.size == 1); CdcChunks(children.head)
    })
    reg(spark, "graft_tile_md5", classOf[TileMd5], children => {
      require(children.size == 2); TileMd5(children(0), children(1))
    })
    reg(spark, "graft_token_counts", classOf[TokenCounts], children => {
      require(children.size == 2); TokenCounts(children(0), children(1))
    })
    reg(spark, "graft_feature_hash", classOf[FeatureHashStats], children => {
      require(children.size == 1); FeatureHashStats(children.head)
    })
  }
}
