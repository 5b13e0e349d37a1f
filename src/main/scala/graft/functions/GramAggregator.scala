package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-partition Gram accumulator buffer: one exact-decimal sum per
  * upper-triangle cell (row-major, d(d+1)/2 cells) plus one observation
  * count per position. Mutable arrays — the aggregator owns the buffer
  * between reduce calls (the q35 TopKAggregator bounded-buffer recipe,
  * applied to a FIXED d(d+1)/2-sized buffer instead of a top-k heap). */
case class GramBuffer(counts: Array[Long], sums: Array[JBigDecimal])

/** Typed-Aggregator twin of [[graft.queries.Learn.embedCovariance]]'s
  * centered-product pass (the verdict-suggested A/B: the explode plan
  * generates d(d+1)/2 = 2,080 codegen rows per vector whose only job is
  * feeding a 2,080-key hash agg; this accumulates the same cells in a
  * d(d+1)/2 array per partition and merges order-free).
  *
  * Exactness contract (must stay bit-identical to the explode plan so
  * the two are interchangeable under the hash gate):
  *  - each centered product (x_i−μ_i)(x_j−μ_j) is computed in pure IEEE
  *    double on the same inputs, then quantized to DECIMAL scale 12 the
  *    way Spark's double→decimal cast does it — through
  *    `Double.toString` then `setScale(12, HALF_UP)` (Spark's
  *    `Decimal.set(BigDecimal(value))` goes through the same shortest-
  *    string representation);
  *  - per-cell sums are exact BigDecimal adds — associative and
  *    commutative, so partition order and merge order are free;
  *  - cell (i, j) divides by (n_i − 1), n_i = pos-i's own observation
  *    count (the ragged-aware divisor), with one double division at
  *    finish — exactly the explode plan's `sum(p) cast double / (n−1)`.
  *
  * Scale shape (100 TB): each partition reduces locally into ONE buffer
  * (2,080 BigDecimals + 64 longs ≈ a few KB); the shuffle moves one
  * buffer per partition to a single reducer. No generated rows at all —
  * the 2·10¹² explode rows at 10⁹ vectors become in-register arithmetic.
  * Prefix-ragged inputs are fine (a vector of length n covers cells
  * i ≤ j < n); cells whose j-position is never observed are not emitted,
  * matching the explode plan's group-by output exactly. */
class GramAggregator(mu: Array[Double])
    extends Aggregator[Seq[Double], GramBuffer, Seq[(Int, Int, Double)]] {

  private val d = mu.length
  private val nCells = d * (d + 1) / 2

  /** Row-major upper-triangle index of (i, j), i <= j < d. */
  @inline private def idx(i: Int, j: Int): Int =
    i * d - i * (i - 1) / 2 + (j - i)

  /** Spark's double→decimal(…,12) quantization: shortest-string
    * representation, then HALF_UP at scale 12. */
  @inline private def quant(p: Double): JBigDecimal =
    new JBigDecimal(java.lang.Double.toString(p))
      .setScale(12, RoundingMode.HALF_UP)

  override def zero: GramBuffer =
    GramBuffer(new Array[Long](d),
      Array.fill(nCells)(JBigDecimal.ZERO))

  override def reduce(buf: GramBuffer, emb: Seq[Double]): GramBuffer = {
    val x = emb.toArray
    val n = math.min(x.length, d)
    var i = 0
    while (i < n) {
      buf.counts(i) += 1L
      val ci = x(i) - mu(i)
      var j = i
      var k = idx(i, i)
      while (j < n) {
        buf.sums(k) = buf.sums(k).add(quant(ci * (x(j) - mu(j))))
        j += 1
        k += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: GramBuffer, b: GramBuffer): GramBuffer = {
    var i = 0
    while (i < d) { a.counts(i) += b.counts(i); i += 1 }
    var k = 0
    while (k < nCells) { a.sums(k) = a.sums(k).add(b.sums(k)); k += 1 }
    a
  }

  override def finish(buf: GramBuffer): Seq[(Int, Int, Double)] = {
    val out = Seq.newBuilder[(Int, Int, Double)]
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        // cell observed iff pos j (the deeper of the two) was ever seen
        if (buf.counts(j) > 0L)
          out += ((i, j,
            buf.sums(idx(i, j)).doubleValue / (buf.counts(i) - 1L)))
        j += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[GramBuffer] = Encoders.kryo[GramBuffer]

  override def outputEncoder: Encoder[Seq[(Int, Int, Double)]] =
    ExpressionEncoder()
}
