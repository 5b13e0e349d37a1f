package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k aggregator (SURVEY.md §2.B UDAF row, §4.3):
  * keeps a bounded buffer of the k largest (value, id) pairs — ties
  * broken by smaller id — so per-group top-k costs O(n·k) with a k-sized
  * buffer instead of a full per-group sort. This is the scale path for
  * "top N per key" (a window row_number() over huge groups must sort
  * every group; this aggregator's partial buffers combine map-side).
  */
class TopKAggregator[IN](k: Int, extract: IN => (Double, Long))
    extends Aggregator[IN, Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortWith(better).take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(buf: Seq[(Double, Long)], row: IN): Seq[(Double, Long)] = {
    val in = extract(row)
    if (buf.size < k || better(in, buf.last)) trim(buf :+ in) else buf
  }
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)
  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
