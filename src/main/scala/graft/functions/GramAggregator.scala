package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-partition Gram accumulator buffer: one scale-12 fixed-point long
  * sum per upper-triangle cell (row-major, d(d+1)/2 cells) plus one
  * observation count per position. `spill` holds the exact-decimal
  * overflow/slow-path remainder per cell (null until first needed —
  * on realistic embedding data it never is). Mutable arrays — the
  * aggregator owns the buffer between reduce calls (the q35
  * TopKAggregator bounded-buffer recipe, applied to a FIXED
  * d(d+1)/2-sized buffer instead of a top-k heap). */
case class GramBuffer(counts: Array[Long], sums: Array[Long],
                      var spill: Array[JBigDecimal])

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
  *    string representation). The quantization runs on a proven long
  *    fast path ([[quantFast]]) whenever the HALF_UP decision is
  *    provably unaffected by the ≤2·ulp gap between the computed
  *    `p·1e12` and the exact shortest-string value; near a rounding
  *    boundary (or past 2⁵¹) it falls back to the literal
  *    string-mediated reference ([[GramAggregator.quantRef]]) —
  *    GramQuantSpec pins fast ≡ reference on generated and adversarial
  *    doubles;
  *  - per-cell sums are exact: scale-12 unscaled longs added with
  *    overflow detection, overflow and slow-path excess landing in an
  *    exact BigDecimal spill — the total is the same rational number,
  *    and it is reassembled at finish with the same (unscaled, scale=12)
  *    representation the old all-BigDecimal chain produced, so
  *    `doubleValue` is bit-identical; addition is associative and
  *    commutative, so partition order and merge order are free;
  *  - cell (i, j) divides by (n_i − 1), n_i = pos-i's own observation
  *    count (the ragged-aware divisor), with one double division at
  *    finish — exactly the explode plan's `sum(p) cast double / (n−1)`.
  *
  * Scale shape (100 TB): each partition reduces locally into ONE buffer
  * (2,080 longs + 64 longs ≈ 17 KB); the shuffle moves one buffer per
  * partition to a single reducer. No generated rows at all — the
  * 2·10¹² explode rows at 10⁹ vectors become in-register arithmetic,
  * and (new this round) no per-product string/BigDecimal allocation
  * either. Prefix-ragged inputs are fine (a vector of length n covers
  * cells i ≤ j < n); cells whose j-position is never observed are not
  * emitted, matching the explode plan's group-by output exactly. */
class GramAggregator(mu: Array[Double])
    extends Aggregator[Seq[Double], GramBuffer, Seq[(Int, Int, Double)]] {

  import GramAggregator.{quantFast, quantRef, QUANT_SENTINEL}

  private val d = mu.length
  private val nCells = d * (d + 1) / 2

  /** Row-major upper-triangle index of (i, j), i <= j < d. */
  @inline private def idx(i: Int, j: Int): Int =
    i * d - i * (i - 1) / 2 + (j - i)

  override def zero: GramBuffer =
    GramBuffer(new Array[Long](d), new Array[Long](nCells), null)

  @inline private def addSpill(buf: GramBuffer, k: Int, v: JBigDecimal): Unit = {
    if (buf.spill == null) buf.spill = new Array[JBigDecimal](nCells)
    val cur = buf.spill(k)
    buf.spill(k) = if (cur == null) v else cur.add(v)
  }

  /** Overflow-checked `sums(k) += v`; overflow drains the old
    * accumulator into the exact spill and restarts at `v`. */
  @inline private def addLong(buf: GramBuffer, k: Int, v: Long): Unit = {
    val s = buf.sums(k)
    val r = s + v
    if (((s ^ r) & (v ^ r)) < 0L) { // two's-complement overflow
      addSpill(buf, k, JBigDecimal.valueOf(s, 12))
      buf.sums(k) = v
    } else buf.sums(k) = r
  }

  override def reduce(buf: GramBuffer, emb: Seq[Double]): GramBuffer = {
    val x = emb.toArray
    val n = math.min(x.length, d)
    // center once per row — (x_i−μ_i) is the same IEEE subtraction the
    // explode plan evaluates per cell, hoisted (deterministic, so the
    // product bits are unchanged)
    val c = new Array[Double](n)
    var i = 0
    while (i < n) { c(i) = x(i) - mu(i); i += 1 }
    i = 0
    while (i < n) {
      buf.counts(i) += 1L
      val ci = c(i)
      var j = i
      var k = idx(i, i)
      while (j < n) {
        val p = ci * c(j)
        val q = quantFast(p)
        if (q != QUANT_SENTINEL) addLong(buf, k, q)
        else addSpill(buf, k, quantRef(p))
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
    while (k < nCells) { addLong(a, k, b.sums(k)); k += 1 }
    if (b.spill != null) {
      k = 0
      while (k < nCells) {
        if (b.spill(k) != null) addSpill(a, k, b.spill(k))
        k += 1
      }
    }
    a
  }

  override def finish(buf: GramBuffer): Seq[(Int, Int, Double)] = {
    val out = Seq.newBuilder[(Int, Int, Double)]
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        // cell observed iff pos j (the deeper of the two) was ever seen
        if (buf.counts(j) > 0L) {
          val k = idx(i, j)
          var sum = JBigDecimal.valueOf(buf.sums(k), 12)
          if (buf.spill != null && buf.spill(k) != null)
            sum = sum.add(buf.spill(k))
          out += ((i, j, sum.doubleValue / (buf.counts(i) - 1L)))
        }
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

object GramAggregator {

  /** Sentinel for "take the exact reference path". Unreachable as a
    * genuine result: quantFast only answers for |p·1e12| < 2⁵¹. */
  final val QUANT_SENTINEL: Long = Long.MinValue

  /** The reference quantization — Spark's double→decimal(…,12) cast:
    * shortest-string representation, then HALF_UP at scale 12. */
  def quantRef(p: Double): JBigDecimal =
    new JBigDecimal(java.lang.Double.toString(p))
      .setScale(12, RoundingMode.HALF_UP)

  /** Long fast path for [[quantRef]]'s unscaled value, or
    * [[QUANT_SENTINEL]] when the HALF_UP decision cannot be proven from
    * double arithmetic alone.
    *
    * Soundness: let R = (shortest-string value of p)·10¹². The computed
    * y = p·1e12 satisfies |y − R| ≤ 0.5·ulp(y) (one correctly-rounded
    * multiply; 1e12 is exactly representable) + 1e12·0.5·ulp(p)
    * (shortest-string gap) ≤ 1.5·ulp(y). With |y| < 2⁵¹, floor(y) is
    * exact and frac = fl(y − floor(y)) carries ≤ 2⁻⁵³ absolute rounding
    * of its own (y − f is not always representable — e.g. tiny y, f=−1),
    * hence the absolute term in the guard. If |frac − 0.5| >
    * 2·ulp(y) + 2e−16, then R lies strictly on the same side of the
    * f+0.5 tie boundary as y and within (f−0.5, f+1.5), so HALF_UP(R) =
    * f or f+1 exactly as decided from frac; in particular R cannot be a
    * tie. Otherwise — near a boundary, NaN/Inf, or |y| ≥ 2⁵¹ — answer
    * the sentinel and let the caller take the string-mediated reference
    * path. GramQuantSpec pins the equivalence on generated and
    * adversarial doubles. */
  def quantFast(p: Double): Long = {
    val y = p * 1e12
    // NaN fails the comparison and falls through to the sentinel
    if (!(math.abs(y) < 2251799813685248.0)) return QUANT_SENTINEL // 2^51
    val f = math.floor(y)
    val frac = y - f
    val guard = 2.0 * math.ulp(y) + 2.0e-16
    if (math.abs(frac - 0.5) <= guard) return QUANT_SENTINEL
    if (frac > 0.5) f.toLong + 1L else f.toLong
  }
}
