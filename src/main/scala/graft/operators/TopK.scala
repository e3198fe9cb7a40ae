package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: bounded top-k by (score desc, id asc) per group.
  *
  * The scale story: a window `row_number` top-k sorts every group's full
  * row set; this Aggregator keeps a k-bounded buffer with map-side partial
  * aggregation, so the shuffle carries at most k (score, id) pairs per
  * group — the right primitive when groups are huge and k is small
  * (top-k documents per source at 100 TB).
  *
  * Deterministic total order: score desc, then id asc — matches the
  * window-function formulation, so the result is oracle-checkable against
  * the same SQL.
  */
class TopK(k: Int) extends Aggregator[(Long, Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], row: (Long, Double, Long)): Seq[(Double, Long)] = {
    val v = (row._2, row._3)
    // common case at scale: buffer full and the row doesn't beat the
    // current k-th — one comparison, zero allocation (the whole point of
    // the k-bounded aggregate for huge groups)
    if (buf.size == k && !better(v, buf.last)) buf
    else merge(buf, Seq(v))
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val merged = (a ++ b).sortWith(better)
    if (merged.size > k) merged.take(k) else merged
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
