package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType}

/** Misra–Gries heavy-hitters summary as a custom TypedImperativeAggregate
  * — the DETERMINISTIC frequent-items sketch next to the randomized ones
  * (CMS el_cms_counts, KMV q42, HLL q29): k counters, guaranteed to
  * contain EVERY item with frequency > n/(k+1), each surviving counter a
  * lower bound within n/(k+1) of the true count (Misra & Gries 1982;
  * merge rule per Agarwal et al., "Mergeability of Summaries", PODS'12).
  *
  * The 100 TB story: exact top-frequency needs a full groupBy shuffle of
  * every key; this summary shuffles ≤ k (key, count) pairs per partition
  * and merges associatively — the shape Spark's partial aggregation
  * wants. The OUTPUT (which of the sub-threshold counters survive, and
  * their exact lower bounds) depends on partitioning order, so there is
  * deliberately NO declared oracle query: the sketch's GUARANTEES are
  * partition-order-invariant and MisraGriesSpec pins those against the
  * exact counts under multiple repartitionings instead.
  *
  * Input: a BIGINT key column; output: MAP<BIGINT, BIGINT> of surviving
  * counters (lower-bound estimates).
  */
case class MisraGries(
    child: Expression,
    k: Int = 8,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]] {

  require(k >= 1, s"misra_gries needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a BIGINT key column, got ${child.dataType.simpleString}")

  override def dataType: DataType = MapType(LongType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  type Buf = java.util.HashMap[java.lang.Long, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf()

  /** Classic MG step: hit → +1; room → insert; full → decrement all,
    * dropping zeros (one decrement pass amortizes across k inserts). */
  private def add(buf: Buf, key: Long, inc: Long): Unit = {
    val cur = buf.get(key)
    if (cur != null) { buf.put(key, cur + inc); return }
    if (buf.size < k) { buf.put(key, inc); return }
    // decrement-all by the largest amount that empties at least one
    // counter or consumes the increment, whichever is smaller
    var minV = Long.MaxValue
    val it0 = buf.values().iterator()
    while (it0.hasNext) { val v = it0.next(); if (v < minV) minV = v }
    val dec = math.min(minV, inc)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - dec
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
    val rem = inc - dec
    if (rem > 0) add(buf, key, rem) // room freed unless inc was absorbed
  }

  override def update(buf: Buf, input: org.apache.spark.sql.catalyst.InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long], 1L)
    buf
  }

  /** Mergeable-summaries rule: pointwise sum, then if over k counters
    * subtract the (k+1)-th largest count from all and drop ≤ 0 — the
    * result keeps the n/(k+1) error bound of the union stream. */
  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (buf.size > k) {
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(buf.size - k - 1) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - cut
        if (nv <= 0) eit.remove() else e.setValue(nv)
      }
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    // deterministic key order in the produced map (stable display/tests)
    val keys = new Array[Long](buf.size)
    var i = 0
    val kit = buf.keySet().iterator()
    while (kit.hasNext) { keys(i) = kit.next(); i += 1 }
    java.util.Arrays.sort(keys)
    ArrayBasedMapData(keys, keys.map(k0 => buf.get(k0).longValue()))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Idempotently register `misra_gries(key[, k])` (k defaults to 8;
    * a literal second argument overrides it). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident    = FunctionIdentifier("misra_gries")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
        (children: Seq[Expression]) => children match {
          case Seq(key) => MisraGries(key)
          case Seq(key, kLit: org.apache.spark.sql.catalyst.expressions.Literal) =>
            MisraGries(key, kLit.value.toString.toInt)
          case other => throw new IllegalArgumentException(
            s"misra_gries requires (key[, k literal]), got ${other.size} args")
        })
    }
  }
}
