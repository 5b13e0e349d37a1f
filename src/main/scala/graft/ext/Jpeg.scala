package graft.ext

/** Baseline + progressive JPEG decode — pure Scala, no codec library:
  * marker walk, canonical Huffman tables, MSB-first entropy reader with
  * FF00 byte-unstuffing, dequantize + de-zigzag, separable
  * double-precision IDCT, and the integer JFIF YCbCr→RGB. Profile
  * (rejected otherwise, so the caller's stub fallback keeps hostile
  * payloads from killing a stage): SOF0 (baseline, one interleaved
  * scan) or SOF2 (progressive — spectral selection + successive
  * approximation, DC and AC first/refinement scans with EOB runs per
  * T.81 §G.1.2), 8-bit precision, 1 (grayscale) or 3 (YCbCr) components
  * at 1x1 sampling (4:4:4), no arithmetic coding, no restart intervals.
  * Transform accuracy: IEEE double mul/add with fixed cosine constants
  * is bit-deterministic on the JVM, which is all the feature contract
  * needs.
  *
  * Scale note: baseline decodes block-streaming (no whole-image
  * coefficient state; 16M-pixel cap); progressive INHERENTLY buffers
  * every coefficient until the last scan lands, so its pixel cap is
  * tighter (4M px ≈ 48 MB of Int coefficients for 3 components) — a
  * per-row bound a mapPartitions batch can hold without pressuring the
  * executor.
  *
  * Reference semantics: ITU-T T.81 §F.2 (decoder flow), §G.1.2
  * (progressive decode: EOBRUN, DC/AC successive approximation),
  * Annex C (canonical Huffman), A.3.3 (IDCT definition).
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

  /** Decode a baseline (SOF0) or progressive (SOF2) 4:4:4 / grayscale
    * JPEG; None when the payload is outside the profile or structurally
    * broken. */
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
    val compId = new Array[Int](3)
    val compQ = new Array[Int](3)
    var sofSeen = false
    var progressive = false
    // progressive coefficient store: per component, bxs·bys blocks × 64
    // coefficients in natural (de-zigzagged) order, accumulated across
    // scans and only dequantized+IDCT'd at EOI
    var coef: Array[Array[Int]] = null
    var bxs = 0; var bys = 0
    // which components a first (Ah=0) DC scan has covered — the scan
    // may arrive interleaved (Ns=nComp) or as per-component scans
    val dcSeen = new Array[Boolean](3)

    def u16(off: Int) = ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)

    while (pos + 2 <= p.length) {
      if ((p(pos) & 0xff) != 0xff) return None
      val marker = p(pos + 1) & 0xff
      pos += 2
      if (marker == 0xd9) {
        // EOI: a progressive stream finalizes here — bands never sent
        // decode as zero coefficients (the partial-render semantics
        // every progressive viewer has), but a stream missing its DC
        // first scan carries no image at all and stays rejected.
        // Baseline returns from inside its single SOS, so reaching EOI
        // in baseline mode means no scan arrived: broken.
        return if (progressive && sofSeen &&
          (0 until nComp).forall(dcSeen))
          assemble(w, h, nComp, bxs, bys, coef, qt, qtSeen, compQ)
        else None
      }
      if (pos + 2 > p.length) return None
      val len = u16(pos)
      if (len < 2 || pos + len > p.length) return None
      val seg = pos + 2
      var nextPos = pos + len
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
        case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
          // every read below stays inside the DECLARED segment — a
          // truncated header must return None, not AIOOBE past pos+len
          if (sofSeen) return None
          progressive = marker == 0xc2
          if (pos + len - seg < 6) return None
          if ((p(seg) & 0xff) != 8) return None
          h = u16(seg + 1); w = u16(seg + 3)
          nComp = p(seg + 5) & 0xff
          if (w <= 0 || h <= 0 || !(nComp == 1 || nComp == 3)) return None
          if (pos + len - seg < 6 + 3 * nComp) return None
          // progressive buffers EVERY coefficient until EOI → tighter cap
          if (w.toLong * h > (if (progressive) 1L << 22 else 1L << 24))
            return None
          var ci = 0
          while (ci < nComp) {
            val o = seg + 6 + 3 * ci
            if ((p(o + 1) & 0xff) != 0x11) return None // 1x1 sampling only
            compId(ci) = p(o) & 0xff
            compQ(ci) = p(o + 2) & 0x0f
            ci += 1
          }
          if (progressive) {
            bxs = (w + 7) / 8; bys = (h + 7) / 8
            coef = Array.ofDim[Int](nComp, bxs * bys * 64)
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
        case 0xdd => // DRI: a nonzero restart interval is out of profile
          if (pos + len - seg < 2 || u16(seg) != 0) return None
        case 0xda => // SOS
          if (!sofSeen) return None
          if (pos + len - seg < 1) return None
          val ns = p(seg) & 0xff
          if (ns < 1 || ns > nComp ||
            pos + len - seg < 1 + 2 * ns + 3) return None
          val scanComp = new Array[Int](ns) // component INDEX per slot
          val scanDc = new Array[Int](ns)
          val scanAc = new Array[Int](ns)
          var ci = 0
          while (ci < ns) {
            val o = seg + 1 + 2 * ci
            val id = p(o) & 0xff
            var idx = -1
            var j = 0
            while (j < nComp) { if (compId(j) == id) idx = j; j += 1 }
            if (idx < 0) return None
            scanComp(ci) = idx
            scanDc(ci) = (p(o + 1) & 0xff) >> 4
            scanAc(ci) = p(o + 1) & 0x0f
            ci += 1
          }
          val tail = seg + 1 + 2 * ns
          val ss = p(tail) & 0xff
          val se = p(tail + 1) & 0xff
          val ah = (p(tail + 2) & 0xff) >> 4
          val al = p(tail + 2) & 0x0f
          if (!progressive) {
            // baseline: ONE full-band interleaved scan ends the decode
            if (ns != nComp) return None
            return decodeScan(p, pos + len, w, h, nComp, qt, qtSeen,
              dcT, acT, compQ, scanDc, scanAc)
          }
          if (ah > 13 || al > 13) return None
          val next = decodeProgScan(p, pos + len, ss, se, ah, al,
            scanComp, scanDc, scanAc, dcT, acT, coef, bxs, bys)
          if (next < 0) return None
          if (ss == 0 && ah == 0) scanComp.foreach(dcSeen(_) = true)
          nextPos = next // entropy data consumed up to the next marker
        case m if m >= 0xd0 && m <= 0xd7 => return None // RST outside scan
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
            0xcb | 0xcd | 0xce | 0xcf =>
          return None // extended/arithmetic/hierarchical: out of profile
        case _ => () // APPn/COM: skip
      }
      pos = nextPos
    }
    None
  }

  /** One progressive scan (T.81 §G.1.2) decoded into the coefficient
    * store; returns the byte offset of the next marker's 0xFF, or -1
    * when the scan is malformed. DC scans (Ss=0, Se=0) walk the MCU
    * grid interleaved; AC scans are single-component over the band
    * [Ss, Se] with EOB-run skipping. Ah=0 scans establish coefficients
    * at precision Al; Ah>0 scans refine one bit (DC: raw bit per block;
    * AC: correction bits on history-nonzero coefficients plus ±1<<Al
    * newly-nonzero insertions). */
  private def decodeProgScan(p: Array[Byte], start: Int, ss: Int, se: Int,
      ah: Int, al: Int, scanComp: Array[Int], scanDc: Array[Int],
      scanAc: Array[Int], dcT: Array[Huff], acT: Array[Huff],
      coef: Array[Array[Int]], bxs: Int, bys: Int): Int = {
    val r = new BitReader(p, start)
    val ns = scanComp.length
    if (ss == 0) { // DC scan
      if (se != 0) return -1
      if (ah == 0) {
        var ci = 0
        while (ci < ns) { if (dcT(scanDc(ci)) == null) return -1; ci += 1 }
      }
      val dcPred = new Array[Int](ns) // prediction resets per scan
      var by = 0
      while (by < bys) {
        var bx = 0
        while (bx < bxs) {
          var ci = 0
          while (ci < ns) {
            val cc = coef(scanComp(ci))
            val off = (by * bxs + bx) * 64
            if (ah == 0) {
              val t = r.decode(dcT(scanDc(ci)))
              if (t < 0 || t > 11) return -1
              val diffBits = if (t == 0) 0 else r.bits(t)
              if (diffBits < 0) return -1
              dcPred(ci) += extend(diffBits, t)
              cc(off) = dcPred(ci) << al
            } else {
              val b = r.bit()
              if (b < 0) return -1
              if (b == 1) cc(off) |= (1 << al)
            }
            ci += 1
          }
          bx += 1
        }
        by += 1
      }
    } else { // AC scan: exactly one component, band inside (0, 63]
      if (ns != 1 || se > 63 || ss > se) return -1
      val huff = acT(scanAc(0))
      if (huff == null) return -1
      val cc = coef(scanComp(0))
      val nBlocks = bxs * bys
      var eobrun = 0
      var blk = 0
      if (ah == 0) { // first scan for this band (G.1.2.2)
        while (blk < nBlocks) {
          if (eobrun > 0) eobrun -= 1
          else {
            val off = blk * 64
            var k = ss
            var done = false
            while (!done && k <= se) {
              val rs = r.decode(huff)
              if (rs < 0) return -1
              val run = rs >> 4
              val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 // ZRL: sixteen zero coefficients
                else { // EOBn: (1<<n)+ext consecutive end-of-bands
                  eobrun = (1 << run) - 1
                  if (run > 0) {
                    val ext = r.bits(run)
                    if (ext < 0) return -1
                    eobrun += ext
                  }
                  done = true
                }
              } else {
                k += run
                if (k > se) return -1
                val vb = r.bits(size)
                if (vb < 0) return -1
                cc(off + Zigzag(k)) = extend(vb, size) << al
                k += 1
              }
            }
          }
          blk += 1
        }
      } else { // refinement scan (G.1.2.3)
        val p1 = 1 << al
        val m1 = -1 << al
        // one correction bit for a history-nonzero coefficient; -1 on
        // bit starvation
        def correct(i: Int): Int = {
          val b = r.bit()
          if (b < 0) return -1
          if (b == 1 && (cc(i) & p1) == 0)
            cc(i) += (if (cc(i) >= 0) p1 else m1)
          0
        }
        while (blk < nBlocks) {
          val off = blk * 64
          var k = ss
          if (eobrun == 0) {
            var done = false
            while (!done && k <= se) {
              val rs = r.decode(huff)
              if (rs < 0) return -1
              var run = rs >> 4
              val size = rs & 0x0f
              var newVal = 0
              if (size == 0) {
                if (run < 15) { // EOBn; note +0 (not -1): the CURRENT
                  // block's tail is refined below, then eobrun -= 1
                  eobrun = 1 << run
                  if (run > 0) {
                    val ext = r.bits(run)
                    if (ext < 0) return -1
                    eobrun += ext
                  }
                  done = true
                }
                // run == 15 (ZRL): pass over 16 zero-HISTORY positions,
                // refining nonzero-history ones along the way
              } else {
                if (size != 1) return -1 // refinement inserts only ±1
                val b = r.bit()
                if (b < 0) return -1
                newVal = if (b == 1) p1 else m1
              }
              if (!done) {
                var placed = false
                while (!placed && k <= se) {
                  val i = off + Zigzag(k)
                  if (cc(i) != 0) {
                    if (correct(i) < 0) return -1
                  } else if (run == 0) {
                    if (newVal != 0) cc(i) = newVal
                    placed = true
                  } else run -= 1
                  k += 1
                }
                if (!placed && newVal != 0) return -1 // band overrun
              }
            }
          }
          if (eobrun > 0) {
            // end-of-band still refines the REST of this block's
            // nonzero-history coefficients before skipping on
            while (k <= se) {
              val i = off + Zigzag(k)
              if (cc(i) != 0 && correct(i) < 0) return -1
              k += 1
            }
            eobrun -= 1
          }
          blk += 1
        }
      }
      if (eobrun != 0) return -1 // EOB run past the last block
    }
    // entropy data ends at the next marker (no restart intervals in
    // profile): scan forward for FF xx, xx != 0 (xx == 0 is stuffing)
    var q = r.pos
    while (q + 1 < p.length &&
      !((p(q) & 0xff) == 0xff && (p(q + 1) & 0xff) != 0)) q += 1
    if (q + 1 >= p.length) return -1
    q
  }

  /** Dequantize + IDCT the progressive coefficient store and assemble
    * interleaved pixels (the same tail the baseline scan runs inline). */
  private def assemble(w: Int, h: Int, nComp: Int, bxs: Int, bys: Int,
      coef: Array[Array[Int]], qt: Array[Array[Int]],
      qtSeen: Array[Boolean], compQ: Array[Int]): Option[Decoded] = {
    var ci = 0
    while (ci < nComp) { if (!qtSeen(compQ(ci))) return None; ci += 1 }
    val planes = Array.ofDim[Byte](nComp, bxs * 8 * bys * 8)
    val dq = new Array[Double](64)
    var by = 0
    while (by < bys) {
      var bx = 0
      while (bx < bxs) {
        var c = 0
        while (c < nComp) {
          val q = qt(compQ(c))
          val cc = coef(c)
          val off = (by * bxs + bx) * 64
          var i = 0
          while (i < 64) { dq(i) = cc(off + i).toDouble * q(i); i += 1 }
          val px = idct8x8(dq)
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
    toRgb(w, h, nComp, planes, bxs * 8)
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
    toRgb(w, h, nComp, planes, bxs * 8)
  }

  /** Color-convert component planes to interleaved RGB (integer JFIF,
    * ×256 fixed point) or copy out the single grayscale plane. */
  private def toRgb(w: Int, h: Int, nComp: Int,
      planes: Array[Array[Byte]], stride: Int): Option[Decoded] = {
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
