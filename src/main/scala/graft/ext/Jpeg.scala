package graft.ext

/** Baseline JPEG decode — pure Scala, no codec library: marker walk,
  * canonical Huffman tables, MSB-first entropy reader with FF00
  * byte-unstuffing, dequantize + de-zigzag, separable double-precision
  * IDCT, and the integer JFIF YCbCr→RGB. Profile (rejected otherwise,
  * so the caller's stub fallback keeps hostile payloads from killing a
  * stage): SOF0 (baseline), 8-bit precision, single interleaved scan,
  * 1 (grayscale) or 3 (YCbCr) components at 1x1 sampling (4:4:4), no
  * progressive/arithmetic/restart-interval features — the profile the
  * suite's own encoder emits and the common ground of "decodable
  * without a codec". Transform accuracy: IEEE double mul/add with fixed
  * cosine constants is bit-deterministic on the JVM, which is all the
  * feature contract needs.
  *
  * Reference semantics: ITU-T T.81 §F.2 (decoder flow), Annex C
  * (canonical Huffman), A.3.3 (IDCT definition).
  */
private[ext] object Jpeg {

  final case class Decoded(width: Int, height: Int, channels: Int,
      rgb: Array[Byte]) // interleaved RGB (or single-channel gray)

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table: maps (code length, code) → symbol via
    * the T.81 Annex C construction. */
  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    // mincode/maxcode per length 1..16
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + (code - minCode(len))) & 0xff
  }

  /** MSB-first bit reader over the entropy segment with FF00
    * unstuffing; any marker (FF xx, xx != 0) mid-scan ends the data. */
  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    private var hitMarker = false
    def bit(): Int = {
      if (nBits == 0) {
        if (hitMarker || pos >= p.length) return -1
        var b = p(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= p.length) { hitMarker = true; return -1 }
          val nxt = p(pos) & 0xff
          if (nxt == 0x00) pos += 1 // stuffed FF
          else { hitMarker = true; return -1 }
          b = 0xff
        }
        acc = b
        nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
    def decode(h: Huff): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val b = bit()
        if (b < 0) return -1
        code = (code << 1) | b
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.value(l, code)
        l += 1
      }
      -1
    }
  }

  /** T.81 F.2.2.1 EXTEND: map a magnitude-category code to its value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0
    else if (v < (1 << (t - 1))) v - (1 << t) + 1
    else v

  // DCT-III constants, hoisted: rebuilt per block they'd cost ~64
  // math.cos calls x every 8x8 block x component in the q34 hot path
  private val idctC =
    Array.tabulate(8)(k => if (k == 0) 1.0 / math.sqrt(2) else 1.0)
  private val idctCos = Array.tabulate(8, 8)((x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16))

  private def idct8x8(coef: Array[Double]): Array[Double] = {
    // separable 2x 1-D DCT-III with the T.81 A.3.3 normalization
    val c = idctC
    val cosT = idctCos
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += c(u) * coef(y * 8 + u) * cosT(x)(u); u += 1 }
        tmp(y * 8 + x) = s / 2
        x += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) { // columns
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += c(v) * tmp(v * 8 + x) * cosT(yy)(v); v += 1 }
        out(yy * 8 + x) = s / 2
        yy += 1
      }
      x += 1
    }
    out
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Decode a baseline 4:4:4 (or grayscale) JPEG; None when the payload
    * is outside the profile or structurally broken. */
  def decode(p: Array[Byte]): Option[Decoded] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    val qt = Array.ofDim[Int](4, 64)
    val qtSeen = new Array[Boolean](4)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var w = 0; var h = 0
    var nComp = 0
    val compQ = new Array[Int](3)
    val compDc = new Array[Int](3)
    val compAc = new Array[Int](3)
    var sofSeen = false

    def u16(off: Int) = ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)

    while (pos + 4 <= p.length) {
      if ((p(pos) & 0xff) != 0xff) return None
      val marker = p(pos + 1) & 0xff
      pos += 2
      if (marker == 0xd9) return None // EOI before any scan
      val len = u16(pos)
      if (len < 2 || pos + len > p.length) return None
      val seg = pos + 2
      marker match {
        case 0xdb => // DQT: one or more tables
          var o = seg
          while (o < pos + len) {
            val pq = (p(o) & 0xff) >> 4
            val tq = p(o) & 0x0f
            if (pq != 0 || tq > 3 || o + 1 + 64 > pos + len) return None
            var k = 0
            while (k < 64) { qt(tq)(Zigzag(k)) = p(o + 1 + k) & 0xff; k += 1 }
            qtSeen(tq) = true
            o += 65
          }
        case 0xc0 => // SOF0 baseline
          // every read below stays inside the DECLARED segment — a
          // truncated header must return None, not AIOOBE past pos+len
          if (pos + len - seg < 6) return None
          if ((p(seg) & 0xff) != 8) return None
          h = u16(seg + 1); w = u16(seg + 3)
          nComp = p(seg + 5) & 0xff
          if (w <= 0 || h <= 0 || !(nComp == 1 || nComp == 3)) return None
          if (pos + len - seg < 6 + 3 * nComp) return None
          if (w.toLong * h > (1L << 24)) return None // 16M px cap
          var ci = 0
          while (ci < nComp) {
            val o = seg + 6 + 3 * ci
            if ((p(o + 1) & 0xff) != 0x11) return None // 1x1 sampling only
            compQ(ci) = p(o + 2) & 0x0f
            ci += 1
          }
          sofSeen = true
        case 0xc4 => // DHT: one or more tables
          var o = seg
          while (o < pos + len) {
            val tc = (p(o) & 0xff) >> 4
            val th = p(o) & 0x0f
            if (tc > 1 || th > 3) return None
            if (o + 17 > pos + len) return None // bits counts inside the segment
            val bits = Array.tabulate(16)(i => p(o + 1 + i) & 0xff)
            val total = bits.sum
            if (total > 256 || o + 17 + total > pos + len) return None
            val vals = new Array[Byte](total)
            System.arraycopy(p, o + 17, vals, 0, total)
            val t = new Huff(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
            o += 17 + total
          }
        case 0xda => // SOS: single interleaved scan
          if (!sofSeen) return None
          if (pos + len - seg < 1) return None
          val ns = p(seg) & 0xff
          if (ns != nComp || pos + len - seg < 1 + 2 * ns) return None
          var ci = 0
          while (ci < ns) {
            val o = seg + 1 + 2 * ci
            compDc(ci) = (p(o + 1) & 0xff) >> 4
            compAc(ci) = p(o + 1) & 0x0f
            ci += 1
          }
          // entropy-coded data starts after the 3 fixed SOS tail bytes
          return decodeScan(p, pos + len, w, h, nComp, qt, qtSeen,
            dcT, acT, compQ, compDc, compAc)
        case m if m >= 0xd0 && m <= 0xd7 => return None // RST outside scan
        case 0xc2 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
            0xcb | 0xcd | 0xce | 0xcf =>
          return None // progressive/extended/arithmetic: out of profile
        case _ => () // APPn/COM/DRI(unused): skip
      }
      pos += len
    }
    None
  }

  private def decodeScan(p: Array[Byte], start: Int, w: Int, h: Int,
      nComp: Int, qt: Array[Array[Int]], qtSeen: Array[Boolean],
      dcT: Array[Huff], acT: Array[Huff], compQ: Array[Int],
      compDc: Array[Int], compAc: Array[Int]): Option[Decoded] = {
    var ci = 0
    while (ci < nComp) {
      if (!qtSeen(compQ(ci)) || dcT(compDc(ci)) == null ||
        acT(compAc(ci)) == null) return None
      ci += 1
    }
    val bxs = (w + 7) / 8
    val bys = (h + 7) / 8
    val planes = Array.ofDim[Byte](nComp, bxs * 8 * bys * 8)
    val r = new BitReader(p, start)
    val dcPred = new Array[Int](nComp)
    val coef = new Array[Double](64)
    var by = 0
    while (by < bys) {
      var bx = 0
      while (bx < bxs) {
        var c = 0
        while (c < nComp) {
          java.util.Arrays.fill(coef, 0.0)
          val q = qt(compQ(c))
          // DC
          val t = r.decode(dcT(compDc(c)))
          if (t < 0 || t > 11) return None
          val diffBits = if (t == 0) 0 else r.bits(t)
          if (diffBits < 0) return None
          dcPred(c) += extend(diffBits, t)
          coef(0) = dcPred(c).toDouble * q(0)
          // AC
          var k = 1
          while (k < 64) {
            val rs = r.decode(acT(compAc(c)))
            if (rs < 0) return None
            val run = rs >> 4
            val size = rs & 0x0f
            if (size == 0) {
              if (run == 15) k += 16 // ZRL
              else k = 64 // EOB
            } else {
              k += run
              if (k > 63) return None
              val vb = r.bits(size)
              if (vb < 0) return None
              coef(Zigzag(k)) = extend(vb, size).toDouble * q(Zigzag(k))
              k += 1
            }
          }
          val px = idct8x8(coef)
          val plane = planes(c)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              val v = clamp(math.round(px(yy * 8 + xx)).toInt + 128)
              plane((by * 8 + yy) * (bxs * 8) + bx * 8 + xx) = v.toByte
              xx += 1
            }
            yy += 1
          }
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    // color-convert to interleaved RGB (integer JFIF, ×256 fixed point)
    val stride = bxs * 8
    if (nComp == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * stride, out, y * w, w)
        y += 1
      }
      Some(Decoded(w, h, 1, out))
    } else {
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = planes(0)(y * stride + x) & 0xff
          val cb = (planes(1)(y * stride + x) & 0xff) - 128
          val cr = (planes(2)(y * stride + x) & 0xff) - 128
          val o = (y * w + x) * 3
          out(o) = clamp(yv + ((359 * cr) >> 8)).toByte
          out(o + 1) = clamp(yv - ((88 * cb + 183 * cr) >> 8)).toByte
          out(o + 2) = clamp(yv + ((454 * cb) >> 8)).toByte
          x += 1
        }
        y += 1
      }
      Some(Decoded(w, h, 3, out))
    }
  }
}
