package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 fake-raster codegen kernels — the whole mm_ pixel-explode
  * family folded to one pass per document.
  *
  * The previous forms posexploded `sequence(1, length(text))` into one
  * row PER CHARACTER and then re-read the character with
  * `substring(text, i, 1)`. Two costs made that the worst family of the
  * honest sf10 bench (mm_dhash 112.5 s, mm_sharpness 106.3 s, mm_resize
  * 43.9 s, mm_border_detect 41.8 s, mm_audio_fingerprint 15.9 s):
  * `substring` on a UTF8String walks from the front to find the i-th
  * codepoint, so per-doc cost is Θ(n²/2) character scans; and the
  * explode puts |corpus-characters| rows (~150M at sf10) through the
  * downstream aggregate. Every query in the family is a per-document
  * fold with bounded state — a pooled 9×8 cell grid, a 32-pixel row, a
  * 16-sample frame — so each becomes ONE codegen Expression walking the
  * text's codepoints once (same shape as SttrStats/IcStats/FoldText):
  * no explode, no per-character shuffle, a pure map-side projection with
  * the only remaining exchange the output-linear ORDER BY doc_id.
  *
  * Parity contract (PixelKernelsSpec pins all of it against the
  * exploded forms): positions are 1-based CODEPOINT indices, matching
  * DuckDB `substring(text, i, 1)` and Spark `substring`/`length` on
  * StringType; "pixel value" is the codepoint, matching `ord`/`ascii`
  * on the ASCII corpus; all means are floor divisions of non-negative
  * sums, identical to DuckDB `//` and Spark `div`; documents whose fold
  * produces no qualifying rows (empty text, single audio frame) return
  * zero-count structs the callers filter, matching the explode forms
  * where such docs simply emit no rows.
  */
private[functions] abstract class PixelKernel extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = PixelKernels.schemas(prettyName)
  protected def staticCall: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$staticCall($c)")
}

/** mm_sharpness: 1-D integer Laplacian energy over the 32-wide grid.
  * Term at position i (1-based) exists when (i−1) % 32 ∉ {0, 31} and
  * i+1 ≤ len: lap = p(i−1) − 2·p(i) + p(i+1). */
case class LapStats(child: Expression) extends PixelKernel {
  override def prettyName: String = "graft_lap_stats"
  override protected def staticCall: String = "graft.functions.LapStats.stats"
  override def nullSafeEval(input: Any): Any =
    LapStats.stats(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LapStats {
  def stats(s: UTF8String): GenericInternalRow = {
    val cps = PixelKernels.codepoints(s)
    val len = cps.length
    var n = 0L; var energy = 0L; var maxAbs = 0L
    var i = 2 // 1-based position of the center pixel
    while (i + 1 <= len) {
      val m = (i - 1) % 32
      if (m != 0 && m != 31) {
        val lap = cps(i - 2).toLong - 2L * cps(i - 1) + cps(i)
        n += 1; energy += lap * lap
        val a = math.abs(lap); if (a > maxAbs) maxAbs = a
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, energy, maxAbs))
  }
  def register(spark: SparkSession): Unit =
    PixelKernels.register(spark, "graft_lap_stats", classOf[LapStats],
      children => { require(children.size == 1); LapStats(children.head) })
}

/** mm_dhash: 4×4-pool the 32-wide grid to 8-wide integer cell means
  * (rows br ≤ 8 only, keeping bit positions ≤ 62), then bit (b,c) =
  * mean(b,c) > mean(b,c+1) wherever cell (b,c+1) is non-empty. */
case class DhashStats(child: Expression) extends PixelKernel {
  override def prettyName: String = "graft_dhash_stats"
  override protected def staticCall: String = "graft.functions.DhashStats.stats"
  override def nullSafeEval(input: Any): Any =
    DhashStats.stats(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DhashStats {
  def stats(s: UTF8String): GenericInternalRow = {
    val cps = PixelKernels.codepoints(s)
    // cells (br ≤ 8, bc ≤ 7) cover 1-based positions i ≤ 9·128 = 1152
    val len = math.min(cps.length, 1152)
    val sums = new Array[Long](72); val cnts = new Array[Long](72)
    var i = 0 // 0-based: br = i / 128, bc = (i % 32) / 4
    while (i < len) {
      val cell = (i / 128) * 8 + (i % 32) / 4
      sums(cell) += cps(i); cnts(cell) += 1
      i += 1
    }
    var nPairs = 0L; var dhash = 0L; var bitsSet = 0L
    var b = 0
    while (b <= 8) {
      var c = 0
      while (c <= 6) {
        val k = b * 8 + c
        if (cnts(k + 1) > 0) { // left cell is full whenever right is non-empty
          nPairs += 1
          if (sums(k) / cnts(k) > sums(k + 1) / cnts(k + 1)) {
            dhash += 1L << (b * 7 + c); bitsSet += 1
          }
        }
        c += 1
      }
      b += 1
    }
    new GenericInternalRow(Array[Any](nPairs, dhash, bitsSet))
  }
  def register(spark: SparkSession): Unit =
    PixelKernels.register(spark, "graft_dhash_stats", classOf[DhashStats],
      children => { require(children.size == 1); DhashStats(children.head) })
}

/** mm_resize: 4×4 box downsample of the full 32-wide grid (no row cap).
  * out_h = max block-row + 1, n_blocks = non-empty cells, checksum =
  * Σ floor cell means. Streaming: pixels arrive row-major, so one
  * 8-cell block-row buffer flushes each time br advances. */
case class ResizeStats(child: Expression) extends PixelKernel {
  override def prettyName: String = "graft_resize_stats"
  override protected def staticCall: String = "graft.functions.ResizeStats.stats"
  override def nullSafeEval(input: Any): Any =
    ResizeStats.stats(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ResizeStats {
  def stats(s: UTF8String): GenericInternalRow = {
    val cps = PixelKernels.codepoints(s)
    val len = cps.length
    val sums = new Array[Long](8); val cnts = new Array[Long](8)
    var curBr = -1L; var outH = 0L; var nBlocks = 0L; var checksum = 0L
    def flush(): Unit = {
      var c = 0
      while (c < 8) {
        if (cnts(c) > 0) { nBlocks += 1; checksum += sums(c) / cnts(c) }
        sums(c) = 0; cnts(c) = 0; c += 1
      }
    }
    var i = 0
    while (i < len) {
      val br = i / 128
      if (br != curBr) { if (curBr >= 0) flush(); curBr = br; outH = br + 1 }
      val c = (i % 32) / 4
      sums(c) += cps(i); cnts(c) += 1
      i += 1
    }
    if (curBr >= 0) flush()
    new GenericInternalRow(Array[Any](outH, nBlocks, checksum))
  }
  def register(spark: SparkSession): Unit =
    PixelKernels.register(spark, "graft_resize_stats", classOf[ResizeStats],
      children => { require(children.size == 1); ResizeStats(children.head) })
}

/** mm_border_detect: per 32-pixel row, dark = floor row mean < 105;
  * top border = rows before the first bright row (n_rows when none),
  * bottom border = rows after the last bright row (n_rows when none). */
case class BorderStats(child: Expression) extends PixelKernel {
  override def prettyName: String = "graft_border_stats"
  override protected def staticCall: String = "graft.functions.BorderStats.stats"
  override def nullSafeEval(input: Any): Any =
    BorderStats.stats(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BorderStats {
  def stats(s: UTF8String): GenericInternalRow = {
    val cps = PixelKernels.codepoints(s)
    val len = cps.length
    var nRows = 0L; var darkRows = 0L
    var firstBright = -1L; var lastBright = -1L
    var rowSum = 0L; var rowCnt = 0L
    def flushRow(r: Long): Unit = {
      nRows += 1
      if (rowSum / rowCnt < 105) darkRows += 1
      else { if (firstBright < 0) firstBright = r; lastBright = r }
      rowSum = 0; rowCnt = 0
    }
    var i = 0
    while (i < len) {
      rowSum += cps(i); rowCnt += 1
      if (i % 32 == 31) flushRow(i / 32)
      i += 1
    }
    if (rowCnt > 0) flushRow((len - 1) / 32)
    val top    = if (firstBright >= 0) firstBright else nRows
    val bottom = nRows - 1 - lastBright // lastBright = -1 when all dark
    new GenericInternalRow(Array[Any](nRows, darkRows, top, bottom))
  }
  def register(spark: SparkSession): Unit =
    PixelKernels.register(spark, "graft_border_stats", classOf[BorderStats],
      children => { require(children.size == 1); BorderStats(children.head) })
}

/** mm_audio_fingerprint: 16-sample frame energies over the first 256
  * samples; bit f−1 set when frame f's Σp² rises over frame f−1's.
  * n_frames counts non-empty frames (= ceil(min(len,256)/16)). */
case class AudioFpStats(child: Expression) extends PixelKernel {
  override def prettyName: String = "graft_audio_fp"
  override protected def staticCall: String = "graft.functions.AudioFpStats.stats"
  override def nullSafeEval(input: Any): Any =
    AudioFpStats.stats(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioFpStats {
  def stats(s: UTF8String): GenericInternalRow = {
    val cps = PixelKernels.codepoints(s)
    val len = math.min(cps.length, 256)
    var nFrames = 0L; var fp = 0L; var bitsSet = 0L
    var prevSs = -1L; var ss = 0L; var inFrame = 0
    var frame = 0
    var i = 0
    while (i < len) {
      val p = cps(i).toLong
      ss += p * p; inFrame += 1
      if (inFrame == 16 || i == len - 1) {
        nFrames += 1
        if (frame >= 1 && ss > prevSs) { fp += 1L << (frame - 1); bitsSet += 1 }
        prevSs = ss; ss = 0; inFrame = 0; frame += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nFrames, fp, bitsSet))
  }
  def register(spark: SparkSession): Unit =
    PixelKernels.register(spark, "graft_audio_fp", classOf[AudioFpStats],
      children => { require(children.size == 1); AudioFpStats(children.head) })
}

/** mm_audio_energy: 16-sample frame energies over the first 256 samples
  * (the AudioFpStats frames), rolled up per doc — frame count, Σ of the
  * per-frame Σp², and how many frames are "silent" (Σp² < 10000·n for a
  * frame of n samples; the last frame may be partial). */
case class AudioEnergyStats(child: Expression) extends PixelKernel {
  override def prettyName: String = "graft_audio_energy"
  override protected def staticCall: String = "graft.functions.AudioEnergyStats.stats"
  override def nullSafeEval(input: Any): Any =
    AudioEnergyStats.stats(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioEnergyStats {
  def stats(s: UTF8String): GenericInternalRow = {
    val cps = PixelKernels.codepoints(s)
    val len = math.min(cps.length, 256)
    var nFrames = 0L; var energy = 0L; var silence = 0L
    var ss = 0L; var inFrame = 0L
    var i = 0
    while (i < len) {
      val p = cps(i).toLong
      ss += p * p; inFrame += 1
      if (inFrame == 16 || i == len - 1) {
        nFrames += 1; energy += ss
        if (ss < 10000L * inFrame) silence += 1
        ss = 0; inFrame = 0
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nFrames, energy, silence))
  }
  def register(spark: SparkSession): Unit =
    PixelKernels.register(spark, "graft_audio_energy", classOf[AudioEnergyStats],
      children => { require(children.size == 1); AudioEnergyStats(children.head) })
}

/** mm_silence_trim: same frames as AudioEnergyStats; first/last frame
  * index whose Σp² ≥ 10000·n (NULL when every frame is silent). */
case class SilenceTrimStats(child: Expression) extends PixelKernel {
  override def prettyName: String = "graft_silence_trim"
  override protected def staticCall: String = "graft.functions.SilenceTrimStats.stats"
  override def nullSafeEval(input: Any): Any =
    SilenceTrimStats.stats(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SilenceTrimStats {
  def stats(s: UTF8String): GenericInternalRow = {
    val cps = PixelKernels.codepoints(s)
    val len = math.min(cps.length, 256)
    var nFrames = 0L
    var first = -1L; var last = -1L
    var ss = 0L; var inFrame = 0L; var frame = 0L
    var i = 0
    while (i < len) {
      val p = cps(i).toLong
      ss += p * p; inFrame += 1
      if (inFrame == 16 || i == len - 1) {
        nFrames += 1
        if (ss >= 10000L * inFrame) { if (first < 0) first = frame; last = frame }
        ss = 0; inFrame = 0; frame += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nFrames,
      if (first >= 0) first else null,
      if (last >= 0) last else null))
  }
  def register(spark: SparkSession): Unit =
    PixelKernels.register(spark, "graft_silence_trim", classOf[SilenceTrimStats],
      children => { require(children.size == 1); SilenceTrimStats(children.head) })
}

/** mm_pixel_hist: 32-wide intensity buckets over the first 256 pixels —
  * pixel count, buckets used, modal bucket (ties to the LOWEST bucket),
  * its population, and min/max pixel value. */
case class PixelHistStats(child: Expression) extends PixelKernel {
  override def prettyName: String = "graft_pixel_hist"
  override protected def staticCall: String = "graft.functions.PixelHistStats.stats"
  override def nullSafeEval(input: Any): Any =
    PixelHistStats.stats(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PixelHistStats {
  def stats(s: UTF8String): GenericInternalRow = {
    val cps = PixelKernels.codepoints(s)
    val len = math.min(cps.length, 256)
    // sorted bucket → count map: ≤ 256 entries; ascending iteration makes
    // the min-bucket tie-break the first maximum encountered
    val buckets = new java.util.TreeMap[Long, Long]()
    var pLo = Long.MaxValue; var pHi = Long.MinValue
    var i = 0
    while (i < len) {
      val p = cps(i).toLong
      buckets.merge(p / 32, 1L, (a, inc) => a + inc)
      if (p < pLo) pLo = p
      if (p > pHi) pHi = p
      i += 1
    }
    if (len == 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L, 0L, 0L))
    var modeBucket = 0L; var modeCount = 0L
    val it = buckets.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > modeCount) { modeCount = e.getValue; modeBucket = e.getKey }
    }
    new GenericInternalRow(Array[Any](
      len.toLong, buckets.size.toLong, modeBucket, modeCount, pLo, pHi))
  }
  def register(spark: SparkSession): Unit =
    PixelKernels.register(spark, "graft_pixel_hist", classOf[PixelHistStats],
      children => { require(children.size == 1); PixelHistStats(children.head) })
}

/** mm_phash / mm_phash_pairs: average-hash over the first ≤62 pixels —
  * mean (floor) of the codepoint values, bit j (0-based) set when
  * px(j) > mean. The exploded form aggregated the pixel rows twice
  * (mean pass + bit pass) and joined them back by doc_id; this is one
  * bounded in-row fold. Callers keep their length(text) > 0 guard
  * (empty text folds to 0, which the guard never sees). */
case class PhashVal(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_phash"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(input: Any): Any =
    PhashVal.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PhashVal.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PhashVal {
  def hash(s: UTF8String): Long = {
    val cps = PixelKernels.codepoints(s)
    val n = math.min(cps.length, 62)
    if (n == 0) return 0L
    var sum = 0L; var j = 0
    while (j < n) { sum += cps(j); j += 1 }
    val mean = sum / n
    var h = 0L; j = 0
    while (j < n) { if (cps(j) > mean) h |= 1L << j; j += 1 }
    h
  }
  def register(spark: SparkSession): Unit =
    PixelKernels.register(spark, "graft_phash", classOf[PhashVal],
      children => { require(children.size == 1); PhashVal(children.head) })
}

object PixelKernels {
  import org.apache.spark.sql.types.{LongType, StructField}

  private def longs(names: String*): StructType =
    StructType(names.map(n => StructField(n, LongType, nullable = false)))

  val schemas: Map[String, StructType] = Map(
    "graft_lap_stats"    -> longs("n_terms", "lap_energy", "max_abs_lap"),
    "graft_dhash_stats"  -> longs("n_pairs", "dhash", "bits_set"),
    "graft_resize_stats" -> longs("out_h", "n_blocks", "pooled_checksum"),
    "graft_border_stats" -> longs("n_rows", "dark_rows", "top_border", "bottom_border"),
    "graft_audio_fp"     -> longs("n_frames", "fingerprint", "bits_set"),
    "graft_audio_energy" -> longs("n_frames", "energy_total", "silence_frames"),
    // first/last_sound are NULL for all-silent docs
    "graft_silence_trim" -> StructType(Seq(
      StructField("n_frames", LongType, nullable = false),
      StructField("first_sound", LongType, nullable = true),
      StructField("last_sound", LongType, nullable = true))),
    "graft_pixel_hist"   -> longs("n_px", "n_buckets", "mode_bucket",
                                  "mode_count", "p_lo", "p_hi"))

  /** Codepoint array of the text — 1-based query positions map to index
    * i−1. Supplementary codepoints count once, matching DuckDB's
    * substring/ord and Spark's substring/length on StringType. */
  def codepoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var i = 0; var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(k) = cp; k += 1
      i += Character.charCount(cp)
    }
    out
  }

  private[functions] def register(
      spark: SparkSession, name: String, cls: Class[_],
      build: Seq[Expression] => Expression): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(ident, new ExpressionInfo(cls.getName, name), build)
    }
  }

  /** One-call registration for the whole family. */
  def registerAll(spark: SparkSession): Unit = {
    LapStats.register(spark); DhashStats.register(spark)
    ResizeStats.register(spark); BorderStats.register(spark)
    AudioFpStats.register(spark)
    AudioEnergyStats.register(spark); SilenceTrimStats.register(spark)
    PixelHistStats.register(spark)
  }
}
