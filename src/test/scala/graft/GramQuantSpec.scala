package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GramAggregator, GramBuffer}

/** Bit-parity laws for the r17 GramAggregator fast path: the long
  * fixed-point quantization must agree with the literal Spark
  * double→decimal(…,12) cast semantics (shortest string, HALF_UP at
  * scale 12) everywhere it answers, and the full aggregator must stay
  * bit-identical to the all-BigDecimal r16 reference — including
  * long-accumulator overflow (spill) and reference-path (sentinel)
  * regimes. */
object GramQuantProperties extends Properties("graft.gramquant") {

  private def ref(p: Double): JBigDecimal = GramAggregator.quantRef(p)

  /** fast-path answer (when given) must equal the reference unscaled
    * value at scale 12 */
  private def fastAgrees(p: Double): Boolean = {
    val q = GramAggregator.quantFast(p)
    q == GramAggregator.QUANT_SENTINEL ||
      JBigDecimal.valueOf(q, 12).compareTo(ref(p)) == 0
  }

  property("fast path == Spark cast semantics on uniform doubles") =
    forAll(Gen.choose(-1e4, 1e4))(fastAgrees)

  property("fast path == Spark cast semantics on centered products") =
    forAll(Gen.choose(-50.0, 50.0), Gen.choose(-50.0, 50.0)) { (a, b) =>
      fastAgrees(a * b)
    }

  property("fast path == Spark cast semantics across magnitudes") =
    forAll(Gen.choose(-300, 300), Gen.choose(-1.0, 1.0)) { (e, m) =>
      fastAgrees(m * math.pow(10.0, e))
    }

  property("fast path == Spark cast near scale-12 tie boundaries") =
    forAll(Gen.choose(0L, 1000000L), Gen.choose(-60, 60)) { (k, nudge) =>
      // values engineered to land within a few ulps of (k + 0.5)·1e-12
      var v = (k.toDouble + 0.5) * 1e-12
      var s = nudge
      while (s > 0) { v = math.nextUp(v); s -= 1 }
      while (s < 0) { v = math.nextDown(v); s += 1 }
      fastAgrees(v) && fastAgrees(-v)
    }

  property("fast path == Spark cast on raw bit patterns") =
    forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { bits =>
      val v = java.lang.Double.longBitsToDouble(bits)
      java.lang.Double.isNaN(v) || fastAgrees(v)
    }
}

class GramQuantSpec extends AnyFunSuite {

  /** the r16 all-BigDecimal aggregation, kept verbatim as the parity
    * reference */
  private def refAggregate(mu: Array[Double],
                           rows: Seq[Seq[Double]]): Map[(Int, Int), Double] = {
    val d = mu.length
    def idx(i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)
    val counts = new Array[Long](d)
    val sums = Array.fill(d * (d + 1) / 2)(JBigDecimal.ZERO)
    rows.foreach { emb =>
      val x = emb.toArray
      val n = math.min(x.length, d)
      var i = 0
      while (i < n) {
        counts(i) += 1L
        val ci = x(i) - mu(i)
        var j = i
        var k = idx(i, i)
        while (j < n) {
          val p = ci * (x(j) - mu(j))
          sums(k) = sums(k).add(
            new JBigDecimal(java.lang.Double.toString(p))
              .setScale(12, RoundingMode.HALF_UP))
          j += 1
          k += 1
        }
        i += 1
      }
    }
    (for {
      i <- 0 until d
      j <- i until d
      if counts(j) > 0L
    } yield (i, j) -> (sums(idx(i, j)).doubleValue / (counts(i) - 1L))).toMap
  }

  private def newAggregate(mu: Array[Double], rows: Seq[Seq[Double]],
                           splitAt: Int): Map[(Int, Int), Double] = {
    val agg = new GramAggregator(mu)
    // exercise reduce AND merge: two partitions split at `splitAt`
    val (ra, rb) = rows.splitAt(splitAt)
    def part(rs: Seq[Seq[Double]]): GramBuffer =
      rs.foldLeft(agg.zero)(agg.reduce)
    agg.finish(agg.merge(part(ra), part(rb)))
      .map { case (i, j, v) => (i, j) -> v }.toMap
  }

  private def assertBitIdentical(mu: Array[Double],
                                 rows: Seq[Seq[Double]]): Unit = {
    val want = refAggregate(mu, rows)
    val got = newAggregate(mu, rows, rows.size / 2)
    assert(got.keySet == want.keySet)
    for (k <- want.keySet)
      assert(java.lang.Double.doubleToRawLongBits(got(k)) ==
        java.lang.Double.doubleToRawLongBits(want(k)),
        s"cell $k: got ${got(k)}, want ${want(k)}")
  }

  test("aggregator bit-identical to the BigDecimal reference (typical)") {
    val rnd = new scala.util.Random(421734)
    val d = 8
    val mu = Array.fill(d)(rnd.nextDouble() * 2 - 1)
    val rows = Seq.fill(200)(Seq.fill(d)(rnd.nextDouble() * 2 - 1))
    assertBitIdentical(mu, rows)
  }

  test("aggregator bit-identical on ragged rows") {
    val rnd = new scala.util.Random(91)
    val d = 6
    val mu = Array.fill(d)(rnd.nextDouble())
    val rows = Seq.fill(100)(Seq.fill(1 + rnd.nextInt(d))(rnd.nextGaussian()))
    assertBitIdentical(mu, rows)
  }

  test("aggregator bit-identical under long-accumulator overflow (spill)") {
    // |product| ~ 9e6 → unscaled ~ 9e18 ~ Long.MaxValue: the second add
    // overflows the long accumulator and must drain into the spill
    val mu = Array(0.0, 0.0)
    val rows = Seq.fill(5)(Seq(3.0e3, -3.0e3))
    val agg = new GramAggregator(mu)
    val buf = rows.foldLeft(agg.zero)(agg.reduce)
    assert(buf.spill != null, "expected the overflow spill to engage")
    assertBitIdentical(mu, rows)
  }

  test("aggregator bit-identical in the sentinel (reference-path) regime") {
    // |y| = |p|·1e12 ≥ 2^51 → quantFast declines; values also exercise
    // merge of spill-carrying buffers
    val mu = Array(1.5, -2.5)
    val rows = Seq(Seq(5.0e3, 1.0e4), Seq(-7.5e3, 2.0e3), Seq(1.0e-13, 5.0e-13))
    assertBitIdentical(mu, rows)
  }

  test("quantFast handles signed zero and exact dyadic scale-12 ties") {
    assert(GramAggregator.quantFast(0.0) == 0L)
    assert(GramAggregator.quantFast(-0.0) == 0L)
    // 1/2^13 = 0.0001220703125: exactly representable, exactly a
    // scale-12 HALF_UP tie — must take the reference path or agree
    val tie = 1.0 / 8192.0
    val q = GramAggregator.quantFast(tie)
    val want = GramAggregator.quantRef(tie)
    assert(q == GramAggregator.QUANT_SENTINEL ||
      JBigDecimal.valueOf(q, 12).compareTo(want) == 0)
    assert(want.unscaledValue().longValueExact() == 122070313L,
      "HALF_UP must round the ...5 tie away from zero")
  }
}
