package graft.multimodal

/** Pure-JVM JPEG pixel decoder — ITU-T T.81 Huffman DCT, sequential
  * (SOF0/SOF1) AND progressive (SOF2), the format of the multimodal
  * seam that was still header-only. Same policy as the other codecs:
  * parse the actual encoded bytes and return None for anything
  * unparseable or outside these profiles (arithmetic coding, lossless,
  * hierarchical, 12-bit) — corruption becomes null, never fabricated
  * pixels.
  *
  * Coverage: 8-bit precision, 1 or 3 components, arbitrary sampling
  * factors up to 4 (4:4:4 / 4:2:2 / 4:2:0 all land here), restart
  * intervals, byte stuffing, multiple DQT/DHT segments between scans.
  * Progressive files accumulate coefficients across scans (spectral
  * selection × successive approximation, interleaved DC and
  * non-interleaved AC walks, EOB runs with per-coefficient correction
  * bits per T.81 G.2) and dequantize + IDCT once at EOI. Chroma
  * upsampling is nearest-neighbor (the T.81-sanctioned replication);
  * IDCT is an exact double-precision separable transform, so DC-only
  * blocks reconstruct bit-exactly — which is what lets
  * [[buildJpegDcOnly]] fixtures carry a formula-replayable oracle.
  * Both entropy decoders are mutation-fuzzed alongside the other byte
  * parsers (MultimodalFuzzSpec); grayscale output is cross-checked
  * pixel-for-pixel (±1 IDCT tolerance) against javax ImageIO's
  * independent codec for both sequential and progressive streams.
  */
object JpegCodec {

  /** Interleaved pixels: 1 byte/px grayscale or 3 bytes/px RGB. */
  final case class Decoded(width: Int, height: Int, nComp: Int,
                           pixels: Array[Byte])

  /** Natural-order index for zigzag position i (T.81 figure A.6). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Image dimension cap: fixtures and tests are tiny; a hostile SOF
    * claiming gigapixels must not drive allocation. */
  private val MaxDim = 1 << 14

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Canonical Huffman table: BITS (16 counts) + HUFFVAL, decoded with
    * the T.81 F.2.2.3 sequential-code algorithm. */
  private final class Huff(counts: Array[Int], vals: Array[Byte]) {
    // mincode/maxcode per length (1-based), valptr per length
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
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
    def value(l: Int, code: Int): Int =
      vals(valPtr(l) + code - minCode(l)) & 0xff
  }

  /** Entropy-segment bit reader honoring 0xFF00 stuffing; stops (and
    * reports) at any real marker. Throws Corrupt on overrun — caught at
    * the decode boundary. */
  private object Corrupt extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var atMarker = false
    var markerByte = 0

    def align(): Unit = { acc = 0; nbits = 0 }

    private def fill(): Unit = {
      if (atMarker) throw Corrupt
      if (pos >= b.length) throw Corrupt
      val v = b(pos) & 0xff
      if (v == 0xff) {
        if (pos + 1 >= b.length) throw Corrupt
        val n = b(pos + 1) & 0xff
        if (n == 0x00) { pos += 2 } // stuffed
        else { atMarker = true; markerByte = n; throw Corrupt }
      } else pos += 1
      acc = (acc << 8) | v
      nbits += 8
    }

    def bit(): Int = {
      if (nbits == 0) fill()
      nbits -= 1
      (acc >> nbits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def huffDecode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.value(l, code)
        code = (code << 1) | bit()
        l += 1
      }
      throw Corrupt
    }

    /** Peek for a restart marker at the current byte position. */
    def consumeRestart(expected: Int): Boolean = {
      align()
      if (pos + 2 > b.length) return false
      if ((b(pos) & 0xff) == 0xff &&
          (b(pos + 1) & 0xff) == 0xd0 + expected) {
        pos += 2
        atMarker = false
        true
      } else false
    }
  }

  /** EXTEND (T.81 F.2.2.1): map an s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0
    else if (v < (1 << (s - 1))) v - (1 << s) + 1
    else v

  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }

  /** Exact separable 2-D IDCT (doubles), then level shift + clamp. */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: 1-D IDCT over u for each v row
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) 0.70710678118654752 else 1.0
          s += cu * coef(y * 8 + u) * CosTable(x * 8 + u)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // columns
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) 0.70710678118654752 else 1.0
          s += cv * tmp(v * 8 + x) * CosTable(yy * 8 + v)
          v += 1
        }
        val p = math.round(s / 2.0 + 128.0).toInt
        out(yy * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        yy += 1
      }
      x += 1
    }
  }

  def decodeJpegPixels(b: Array[Byte]): Option[Decoded] = {
    if (b == null || b.length < 4) return None
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    try decodeInner(b)
    catch {
      case Corrupt => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
  }

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int)

  /** Per-component mutable decode state: the coefficient store every
    * scan accumulates into — progressive files touch each block in
    * several scans (spectral bands × successive-approximation passes),
    * so dequantization and the IDCT run once at EOI, not per scan.
    * Block geometry is MCU-padded; non-interleaved scans walk only the
    * component's own `niBlocks` grid inside it, per T.81 A.2.2. */
  private final class CompState(val comp: Comp, mcusX: Int, mcusY: Int,
                                hmax: Int, vmax: Int,
                                imgW: Int, imgH: Int) {
    val blocksW: Int = mcusX * comp.h
    val blocksH: Int = mcusY * comp.v
    private val compW = (imgW * comp.h + hmax - 1) / hmax
    private val compH = (imgH * comp.v + vmax - 1) / vmax
    val niBlocksW: Int = (compW + 7) / 8
    val niBlocksH: Int = (compH + 7) / 8
    val coefs: Array[Array[Int]] =
      Array.fill(blocksW * blocksH)(new Array[Int](64))
    var pred = 0
    // Quant table snapshot latched at this component's FIRST scan:
    // T.81 binds a DQT slot to the scans that follow it, so a stream
    // redefining a slot between scans must dequantize earlier scans
    // with the table in force when they were decoded (libjpeg latches
    // the same way), not whatever the slot holds at EOI.
    var qtab: Array[Int] = null
  }

  private def decodeInner(b: Array[Byte]): Option[Decoded] = {
    val qt = Array.ofDim[Int](4, 64) // zigzag order
    val qtSeen = new Array[Boolean](4)
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var width = 0
    var height = 0
    var comps: Array[Comp] = null
    var states: Array[CompState] = null
    var progressive = false
    var hmax = 0
    var vmax = 0
    var mcusX = 0
    var mcusY = 0
    var restartInterval = 0
    var sawScan = false
    var i = 2
    while (i + 2 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9) { // EOI: dequant + IDCT + assemble
        return if (!sawScan) None
        else finish(width, height, comps, states, qt, qtSeen,
          hmax, vmax)
      }
      if (marker == 0xff) { i += 1 } // fill byte before a marker
      else if (marker >= 0xd0 && marker <= 0xd7) { i += 2 } // stray RST
      else {
        if (i + 4 > b.length) return None
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val seg = i + 4
        val segEnd = i + 2 + len
        var nextPos = segEnd
        marker match {
          case 0xdb => // DQT
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) & 0xff) >> 4
              val tq = b(p) & 0x0f
              if (tq > 3 || pq > 1) return None
              val n = if (pq == 0) 64 else 128
              if (p + 1 + n > segEnd) return None
              var k = 0
              while (k < 64) {
                qt(tq)(k) =
                  if (pq == 0) b(p + 1 + k) & 0xff
                  else be16(b, p + 1 + 2 * k)
                k += 1
              }
              qtSeen(tq) = true
              p += 1 + n
            }
          case 0xc4 => // DHT
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) & 0xff) >> 4
              val th = b(p) & 0x0f
              if (tc > 1 || th > 3) return None
              if (p + 17 > segEnd) return None
              val counts = Array.tabulate(16)(k => b(p + 1 + k) & 0xff)
              val total = counts.sum
              if (total > 256 || p + 17 + total > segEnd) return None
              val vals = java.util.Arrays.copyOfRange(b, p + 17,
                p + 17 + total)
              val h = new Huff(counts, vals)
              if (tc == 0) dcTab(th) = h else acTab(th) = h
              p += 17 + total
            }
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 baseline, SOF2 progressive
            if (comps != null) return None // one frame per file
            progressive = marker == 0xc2
            if (seg + 6 > segEnd) return None
            val precision = b(seg) & 0xff
            if (precision != 8) return None
            height = be16(b, seg + 1)
            width = be16(b, seg + 3)
            val nc = b(seg + 5) & 0xff
            if (width < 1 || height < 1 || width > MaxDim ||
                height > MaxDim) return None
            // total-pixels cap bounds the coefficient-store allocation
            if (width.toLong * height > (1L << 24)) return None
            if (nc != 1 && nc != 3) return None
            if (seg + 6 + 3 * nc > segEnd) return None
            comps = Array.tabulate(nc) { k =>
              val o = seg + 6 + 3 * k
              Comp(b(o) & 0xff, (b(o + 1) & 0xff) >> 4,
                b(o + 1) & 0x0f, b(o + 2) & 0xff)
            }
            if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 ||
                c.v > 4 || c.tq > 3)) return None
            hmax = comps.map(_.h).max
            vmax = comps.map(_.v).max
            mcusX = (width + 8 * hmax - 1) / (8 * hmax)
            mcusY = (height + 8 * vmax - 1) / (8 * vmax)
            states = comps.map(c =>
              new CompState(c, mcusX, mcusY, hmax, vmax, width, height))
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd |
              0xce | 0xcf =>
            return None // lossless / arithmetic / hierarchical
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = be16(b, seg)
          case 0xda => // SOS
            if (comps == null) return None
            if (seg + 1 > segEnd) return None
            val ns = b(seg) & 0xff
            if (ns < 1 || ns > comps.length ||
                seg + 1 + 2 * ns + 3 > segEnd) return None
            val ss = b(seg + 1 + 2 * ns) & 0xff
            val se = b(seg + 2 + 2 * ns) & 0xff
            val ahal = b(seg + 3 + 2 * ns) & 0xff
            val ah = ahal >> 4
            val al = ahal & 15
            if (!progressive &&
                !(ss == 0 && se == 63 && ah == 0 && al == 0)) return None
            if (progressive) {
              if (ss == 0 && se != 0) return None
              if (ss > 0 && (ns != 1 || se < ss || se > 63)) return None
              if (al > 13) return None
            }
            val scan = new Array[(CompState, Huff, Huff)](ns)
            var k = 0
            while (k < ns) {
              val cs = b(seg + 1 + 2 * k) & 0xff
              val td = (b(seg + 2 + 2 * k) & 0xff) >> 4
              val ta = b(seg + 2 + 2 * k) & 0x0f
              if (td > 3 || ta > 3) return None
              val st = states.find(_.comp.id == cs).orNull
              if (st == null) return None
              val dc = dcTab(td)
              val ac = acTab(ta)
              // DC refinement reads raw bits (no table); AC scans and
              // baseline need the AC table; DC-first needs the DC table
              if (ss == 0 && ah == 0 && dc == null) return None
              if ((!progressive || ss > 0) && ac == null) return None
              scan(k) = (st, dc, ac)
              // latch the component's quant table at its first scan
              if (st.qtab == null) {
                if (!qtSeen(st.comp.tq)) return None
                st.qtab = qt(st.comp.tq).clone()
              }
              k += 1
            }
            val p = decodeScan(b, segEnd, scan, ss, se, ah, al,
              progressive, mcusX, mcusY, restartInterval)
            if (p < 0) return None
            sawScan = true
            nextPos = p
          case m if m >= 0xe0 && m <= 0xef => () // APPn
          case 0xfe => () // COM
          case _ => return None
        }
        i = nextPos
      }
    }
    None // ran out of bytes without EOI
  }

  /** Decode one scan's entropy data into the coefficient stores.
    * Returns the byte position of the next marker, or -1 on corrupt
    * data. Handles all four progressive block shapes (DC/AC ×
    * first/refine) plus the baseline combined shape, interleaved
    * (ns > 1, MCU walk) and non-interleaved (ns == 1, the component's
    * own block grid), with restart-marker resync in both. */
  private def decodeScan(b: Array[Byte], dataStart: Int,
                         scan: Array[(CompState, Huff, Huff)],
                         ss: Int, se: Int, ah: Int, al: Int,
                         progressive: Boolean, mcusX: Int, mcusY: Int,
                         restartInterval: Int): Int = {
    val rd = new BitReader(b, dataStart)
    scan.foreach(_._1.pred = 0)
    var eobrun = 0
    var restartCount = 0
    var unitsSince = 0

    def maybeRestart(): Unit =
      if (restartInterval > 0 && unitsSince == restartInterval) {
        if (!rd.consumeRestart(restartCount & 7)) throw Corrupt
        restartCount += 1
        unitsSince = 0
        eobrun = 0
        scan.foreach(_._1.pred = 0)
      }

    def baselineBlock(st: CompState, dcH: Huff, acH: Huff,
                      coef: Array[Int]): Unit = {
      val t = rd.huffDecode(dcH)
      if (t > 11) throw Corrupt
      st.pred += extend(rd.bits(t), t)
      coef(0) = st.pred
      var k = 1
      var eob = false
      while (k <= 63 && !eob) {
        val rs = rd.huffDecode(acH)
        val r = rs >> 4
        val s = rs & 15
        if (s == 0) { if (r == 15) k += 16 else eob = true }
        else {
          k += r
          if (k > 63) throw Corrupt
          coef(Zigzag(k)) = extend(rd.bits(s), s)
          k += 1
        }
      }
    }

    def dcFirst(st: CompState, dcH: Huff, coef: Array[Int]): Unit = {
      val t = rd.huffDecode(dcH)
      if (t > 11) throw Corrupt
      st.pred += extend(rd.bits(t), t)
      coef(0) = st.pred << al
    }

    def dcRefine(coef: Array[Int]): Unit =
      if (rd.bit() == 1) coef(0) |= (1 << al)

    def acFirst(acH: Huff, coef: Array[Int]): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      var done = false
      while (!done && k <= se) {
        val rs = rd.huffDecode(acH)
        val r = rs >> 4
        val s = rs & 15
        if (s == 0) {
          if (r < 15) {
            eobrun = (1 << r) - 1 // this block counts as consumed
            if (r > 0) eobrun += rd.bits(r)
            done = true
          } else k += 16 // ZRL
        } else {
          k += r
          if (k > se) throw Corrupt
          coef(Zigzag(k)) = extend(rd.bits(s), s) << al
          k += 1
        }
      }
    }

    // T.81 G.2 / the libjpeg decode_mcu_AC_refine structure: run-lengths
    // count ZERO-HISTORY coefficients only; every already-nonzero
    // coefficient passed on the way carries one correction bit.
    def acRefine(acH: Huff, coef: Array[Int]): Unit = {
      val p1 = 1 << al
      val m1 = -1 << al
      def correct(z: Int): Unit =
        if (rd.bit() == 1 && (coef(z) & p1) == 0)
          coef(z) += (if (coef(z) > 0) p1 else m1)
      var k = ss
      if (eobrun == 0) {
        var done = false
        while (!done && k <= se) {
          val rs = rd.huffDecode(acH)
          var r = rs >> 4
          val s = rs & 15
          var newval = 0
          if (s == 0) {
            if (r < 15) {
              eobrun = 1 << r
              if (r > 0) eobrun += rd.bits(r)
              done = true // rest of the band handled by the EOB branch
            }
            // r == 15: advance over 16 zero-history coefficients
          } else {
            if (s != 1) throw Corrupt
            newval = if (rd.bit() == 1) p1 else m1
          }
          if (!done) {
            var advancing = true
            while (advancing && k <= se) {
              val z = Zigzag(k)
              if (coef(z) != 0) correct(z)
              else {
                if (r == 0) advancing = false else r -= 1
              }
              if (advancing) k += 1
            }
            if (newval != 0) {
              if (k > se) throw Corrupt
              coef(Zigzag(k)) = newval
            }
            k += 1
          }
        }
      }
      if (eobrun > 0) {
        // inside an EOB run only coefficients that ALREADY carry history
        // receive correction bits — zeros consume nothing (T.81 G.2.2)
        while (k <= se) {
          val z = Zigzag(k)
          if (coef(z) != 0) correct(z)
          k += 1
        }
        eobrun -= 1
      }
    }

    def decodeBlock(st: CompState, dcH: Huff, acH: Huff,
                    coef: Array[Int]): Unit =
      if (!progressive) baselineBlock(st, dcH, acH, coef)
      else if (ss == 0) {
        if (ah == 0) dcFirst(st, dcH, coef) else dcRefine(coef)
      } else {
        if (ah == 0) acFirst(acH, coef) else acRefine(acH, coef)
      }

    try {
      if (scan.length > 1) { // interleaved MCU walk (DC or baseline)
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            maybeRestart()
            var k = 0
            while (k < scan.length) {
              val (st, dcH, acH) = scan(k)
              val c = st.comp
              var bv = 0
              while (bv < c.v) {
                var bh = 0
                while (bh < c.h) {
                  decodeBlock(st, dcH, acH, st.coefs(
                    (my * c.v + bv) * st.blocksW + mx * c.h + bh))
                  bh += 1
                }
                bv += 1
              }
              k += 1
            }
            unitsSince += 1
            mx += 1
          }
          my += 1
        }
      } else { // non-interleaved: the component's own block grid
        val (st, dcH, acH) = scan(0)
        var by = 0
        while (by < st.niBlocksH) {
          var bx = 0
          while (bx < st.niBlocksW) {
            maybeRestart()
            decodeBlock(st, dcH, acH, st.coefs(by * st.blocksW + bx))
            unitsSince += 1
            bx += 1
          }
          by += 1
        }
      }
    } catch { case Corrupt => return -1 }
    // advance to the next true marker: skip stuffed zeros, trailing
    // entropy padding, and any stray restart markers
    var p = rd.pos
    while (p < b.length) {
      if ((b(p) & 0xff) == 0xff && p + 1 < b.length) {
        val n = b(p + 1) & 0xff
        if (n == 0x00 || (n >= 0xd0 && n <= 0xd7)) p += 2
        else return p
      } else p += 1
    }
    -1
  }

  /** Dequantize + IDCT every block and assemble the pixel surface —
    * shared by baseline (one scan) and progressive (many). */
  private def finish(width: Int, height: Int,
                     comps: Array[Comp], states: Array[CompState],
                     qt: Array[Array[Int]], qtSeen: Array[Boolean],
                     hmax: Int, vmax: Int): Option[Decoded] = {
    if (comps == null || states == null) return None
    if (comps.exists(c => !qtSeen(c.tq))) return None
    val planes = states.map(st =>
      new Array[Int](st.blocksW * 8 * st.blocksH * 8))
    val tmp = new Array[Int](64)
    val px = new Array[Int](64)
    var k = 0
    while (k < states.length) {
      val st = states(k)
      // qtab is null only for a component no scan ever touched — its
      // coefficients are all zero, so any table dequantizes it to the
      // same flat plane; fall back to the slot's EOI state.
      val q = if (st.qtab != null) st.qtab else qt(st.comp.tq)
      val pw = st.blocksW * 8
      var bi = 0
      while (bi < st.coefs.length) {
        val coef = st.coefs(bi)
        var zz = 0
        while (zz < 64) {
          tmp(Zigzag(zz)) = coef(Zigzag(zz)) * q(zz)
          zz += 1
        }
        idctBlock(tmp, px)
        val ox = (bi % st.blocksW) * 8
        val oy = (bi / st.blocksW) * 8
        var yy = 0
        while (yy < 8) {
          var xx = 0
          while (xx < 8) {
            planes(k)((oy + yy) * pw + ox + xx) = px(yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
        bi += 1
      }
      k += 1
    }
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      val pw = states(0).blocksW * 8
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = planes(0)(y * pw + x).toByte
          x += 1
        }
        y += 1
      }
      Some(Decoded(width, height, 1, out))
    } else {
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val sx = x * c.h / hmax
            val sy = y * c.v / vmax
            planes(ci)(sy * states(ci).blocksW * 8 + sx)
          }
          val yv = sample(0)
          val cb = sample(1) - 128
          val cr = sample(2) - 128
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val o = (y * width + x) * 3
          out(o) = clamp(yv + 1.402 * cr)
          out(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yv + 1.772 * cb)
          x += 1
        }
        y += 1
      }
      Some(Decoded(width, height, 3, out))
    }
  }


  // ------------------------------------------------------------------
  // Fixture builder: DC-only grayscale baseline JPEG. Every 8x8 block
  // is flat at clamp(dc + 128) (quant table all 8s makes the IDCT of
  // the DC coefficient EXACT), so decoded pixels are pure formulas a
  // SQL oracle can replay while the decoder still runs the full marker
  // walk, canonical Huffman entropy decode, dequant and IDCT.
  // ------------------------------------------------------------------

  /** T.81 Annex K.3.1 typical luminance DC table. */
  private val StdDcCounts =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcVals =
    Array[Byte](0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Annex K.3.2 typical luminance AC table (only EOB = 0x00 is emitted
    * by the builder, but the full table ships so the decoder exercises
    * real table construction). */
  private val StdAcCounts =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val StdAcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = {
      if (nbits > 0) { put(0x7f, 8 - nbits) } // 1-pad to byte edge
    }
  }

  /** Codes for a canonical table: value → (code, length). */
  private def huffCodes(counts: Array[Int],
                        vals: Array[Byte]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var c = 0
      while (c < counts(l - 1)) {
        m(vals(k) & 0xff) = (code, l)
        code += 1; k += 1; c += 1
      }
      code <<= 1
      l += 1
    }
    m.toMap
  }

  /** Grayscale baseline JPEG whose block (i, j) decodes to the flat
    * value `clamp(blockVals(j * (w/8) + i) - 128 + 128)` — i.e. the
    * given value verbatim for values in [0, 255]. `w` and `h` must be
    * multiples of 8. `restartInterval > 0` emits a DRI segment and
    * RST0-7 markers every that many MCUs (with the spec-mandated DC
    * predictor reset and byte alignment), exercising the decoder's
    * resync path with a real stream. */
  def buildJpegDcOnly(w: Int, h: Int, blockVals: Array[Int],
                      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"dimensions must be 8-multiples, got ${w}x$h")
    val bx = w / 8
    val by = h / 8
    require(blockVals.length == bx * by,
      s"need ${bx * by} block values, got ${blockVals.length}")
    require(blockVals.forall(v => v >= 0 && v <= 255),
      "block values must be bytes")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64) // DQT, all 8s
    out.write(0x00)
    (0 until 64).foreach(_ => out.write(8))
    marker(0xc0); u16(2 + 6 + 3) // SOF0, 1 component 1x1
    out.write(8); u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xc4) // DHT: DC table 0 + AC table 0 in one segment
    u16(2 + (1 + 16 + StdDcVals.length) + (1 + 16 + StdAcVals.length))
    out.write(0x00); StdDcCounts.foreach(out.write)
    StdDcVals.foreach(v => out.write(v & 0xff))
    out.write(0x10); StdAcCounts.foreach(out.write)
    StdAcVals.foreach(v => out.write(v & 0xff))
    marker(0xda); u16(2 + 1 + 2 + 3) // SOS
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    val dcCodes = huffCodes(StdDcCounts, StdDcVals)
    val acCodes = huffCodes(StdAcCounts, StdAcVals)
    var bw = new BitWriter(out)
    var pred = 0
    var mcu = 0
    var rst = 0
    var j = 0
    while (j < by) {
      var i = 0
      while (i < bx) {
        if (restartInterval > 0 && mcu == restartInterval) {
          bw.flush()
          marker(0xd0 + (rst & 7))
          rst += 1
          mcu = 0
          pred = 0
          bw = new BitWriter(out)
        }
        val dc = blockVals(j * bx + i) - 128
        val diff = dc - pred
        pred = dc
        val mag = math.abs(diff)
        val s = 32 - Integer.numberOfLeadingZeros(mag) // bit length
        val (code, len) = dcCodes(s)
        bw.put(code, len)
        if (s > 0)
          bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        val (ecode, elen) = acCodes(0x00) // EOB: no AC coefficients
        bw.put(ecode, elen)
        mcu += 1
        i += 1
      }
      j += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** PROGRESSIVE (SOF2) twin of [[buildJpegDcOnly]]: the same flat
    * 8x8 blocks delivered as a real three-scan progressive script —
    * DC first at Al=1 (successive-approximation high bits), a DC
    * refinement scan carrying each block's low bit, and an AC first
    * scan that is one EOB run spanning every block (all ACs zero).
    * Reconstruction is exact: `((dc >> 1) << 1) | (dc & 1) = dc` in
    * two's complement, so the decoder must walk spectral selection,
    * successive approximation AND the EOB-run machinery to land on the
    * identical formula pixels the sequential fixture yields. */
  def buildJpegDcOnlyProgressive(w: Int, h: Int,
                                 blockVals: Array[Int]): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"dimensions must be 8-multiples, got ${w}x$h")
    val bx = w / 8
    val by = h / 8
    require(blockVals.length == bx * by,
      s"need ${bx * by} block values, got ${blockVals.length}")
    require(blockVals.forall(v => v >= 0 && v <= 255),
      "block values must be bytes")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64) // DQT, all 8s
    out.write(0x00)
    (0 until 64).foreach(_ => out.write(8))
    marker(0xc2); u16(2 + 6 + 3) // SOF2, 1 component 1x1
    out.write(8); u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    // AC table with EOB0..EOB4 run symbols — progressive-only codes the
    // Annex K baseline table deliberately lacks
    val acCountsP = Array(1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acValsP = Array[Byte](0x00, 0x10, 0x20, 0x30, 0x40)
    marker(0xc4) // DHT: DC table 0 + progressive AC table 0
    u16(2 + (1 + 16 + StdDcVals.length) + (1 + 16 + acValsP.length))
    out.write(0x00); StdDcCounts.foreach(out.write)
    StdDcVals.foreach(v => out.write(v & 0xff))
    out.write(0x10); acCountsP.foreach(out.write)
    acValsP.foreach(v => out.write(v & 0xff))
    val dcCodes = huffCodes(StdDcCounts, StdDcVals)
    val acCodes = huffCodes(acCountsP, acValsP)
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); u16(2 + 1 + 2 + 3)
      out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    // scan 1: DC first, Al = 1 — diffs of the point-transformed values
    sos(0, 0, 0, 1)
    var bw = new BitWriter(out)
    var pred = 0
    blockVals.foreach { v =>
      val hi = (v - 128) >> 1
      val diff = hi - pred
      pred = hi
      val mag = math.abs(diff)
      val s = 32 - Integer.numberOfLeadingZeros(mag)
      val (code, len) = dcCodes(s)
      bw.put(code, len)
      if (s > 0)
        bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    }
    bw.flush()
    // scan 2: DC refinement, Ah = 1, Al = 0 — one low bit per block
    sos(0, 0, 1, 0)
    bw = new BitWriter(out)
    blockVals.foreach(v => bw.put((v - 128) & 1, 1))
    bw.flush()
    // scan 3: AC first 1..63 — a single EOB run spanning every block
    sos(1, 63, 0, 0)
    bw = new BitWriter(out)
    val n = blockVals.length
    val r = 31 - Integer.numberOfLeadingZeros(n) // floor(log2(n))
    require(r <= 14, s"EOB run too long for one symbol: $n blocks")
    val (ecode, elen) = acCodes(r << 4)
    bw.put(ecode, elen)
    if (r > 0) bw.put(n - (1 << r), r)
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Arbitrary-coefficient fixtures: the same zigzag-ordered quantized
  // coefficient blocks delivered as a SEQUENTIAL (SOF0) stream and as
  // an AC-REFINED PROGRESSIVE (SOF2) stream, so the two decodes must
  // converge bit-for-bit. The progressive script is the T.81 G.2
  // successive-approximation shape the flat fixtures cannot reach:
  // AC first at Al=1, then an AC refinement scan (Ah=1 → Al=0) with
  // correction bits on history coefficients, newly-significant ±1
  // placement, ZRL inside refinement, cross-block EOB runs carrying
  // buffered correction bits, and a DHT redefinition between scans.
  // ------------------------------------------------------------------

  private def writeGrayHeader(out: java.io.ByteArrayOutputStream,
                              sof: Int, w: Int, h: Int): Unit = {
    def u16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xdb); u16(2 + 1 + 64) // DQT all 8s
    out.write(0x00)
    (0 until 64).foreach(_ => out.write(8))
    out.write(0xff); out.write(sof); u16(2 + 6 + 3) // 1 component 1x1
    out.write(8); u16(h); u16(w); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
  }

  private def writeDht(out: java.io.ByteArrayOutputStream,
                       entries: Seq[(Int, Array[Int], Array[Byte])]): Unit = {
    def u16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    out.write(0xff); out.write(0xc4)
    u16(2 + entries.map { case (_, _, v) => 1 + 16 + v.length }.sum)
    entries.foreach { case (cls, counts, vals) =>
      out.write(cls); counts.foreach(out.write)
      vals.foreach(v => out.write(v & 0xff))
    }
  }

  private def dcSize(mag: Int): Int = 32 - Integer.numberOfLeadingZeros(mag)

  /** Grayscale SEQUENTIAL JPEG from full zigzag coefficient blocks
    * (DC at index 0, signed, quant all 8s). Annex K tables. */
  def buildJpegGrayFromCoefs(w: Int, h: Int,
                             blocks: Array[Array[Int]]): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"dimensions must be 8-multiples, got ${w}x$h")
    require(blocks.length == (w / 8) * (h / 8) &&
      blocks.forall(_.length == 64), "need one 64-coef array per block")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    writeGrayHeader(out, 0xc0, w, h)
    writeDht(out, Seq((0x00, StdDcCounts, StdDcVals),
      (0x10, StdAcCounts, StdAcVals)))
    out.write(0xff); out.write(0xda); u16(2 + 1 + 2 + 3) // SOS
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    val dcCodes = huffCodes(StdDcCounts, StdDcVals)
    val acCodes = huffCodes(StdAcCounts, StdAcVals)
    val bw = new BitWriter(out)
    var pred = 0
    blocks.foreach { c =>
      val diff = c(0) - pred
      pred = c(0)
      val s = dcSize(math.abs(diff))
      val (code, len) = dcCodes(s)
      bw.put(code, len)
      if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      var r = 0
      var k = 1
      while (k <= 63) {
        val t = c(k)
        if (t == 0) r += 1
        else {
          while (r > 15) {
            val (zc, zl) = acCodes(0xf0); bw.put(zc, zl); r -= 16
          }
          val sz = dcSize(math.abs(t))
          val (ac, al) = acCodes((r << 4) | sz)
          bw.put(ac, al)
          bw.put(if (t >= 0) t else t + (1 << sz) - 1, sz)
          r = 0
        }
        k += 1
      }
      if (r > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) }
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Grayscale AC-REFINED PROGRESSIVE (SOF2) twin of
    * [[buildJpegGrayFromCoefs]] — three scans: full-precision DC first;
    * AC 1..63 first at Al=1 (values arithmetically halved, so every odd
    * coefficient is incomplete and every ±1 is invisible); AC 1..63
    * refinement at Ah=1, Al=0 delivering the missing low bits as
    * correction bits and the ±1s as newly-significant placements. The
    * refinement entropy coder follows T.81 G.2 (the libjpeg
    * encode_mcu_AC_refine structure): zero runs count zero-HISTORY
    * positions only, history coefficients buffer one correction bit
    * each and flush after the next emitted symbol (ZRL included),
    * end-of-band tails fold into cross-block EOB runs whose buffered
    * correction bits follow the EOBn length bits. The refinement scan
    * redefines AC table 0 mid-stream (EOBn symbols the first-scan table
    * lacks), exercising the decoder's table latch per scan. */
  def buildJpegAcRefineProgressive(w: Int, h: Int,
                                   blocks: Array[Array[Int]]): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"dimensions must be 8-multiples, got ${w}x$h")
    require(blocks.length == (w / 8) * (h / 8) &&
      blocks.forall(_.length == 64), "need one 64-coef array per block")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      out.write(0xff); out.write(0xda); u16(2 + 1 + 2 + 3)
      out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    writeGrayHeader(out, 0xc2, w, h)
    writeDht(out, Seq((0x00, StdDcCounts, StdDcVals),
      (0x10, StdAcCounts, StdAcVals)))
    // scan 1: DC first, full precision (Al = 0)
    sos(0, 0, 0, 0)
    val dcCodes = huffCodes(StdDcCounts, StdDcVals)
    var bw = new BitWriter(out)
    var pred = 0
    blocks.foreach { c =>
      val diff = c(0) - pred
      pred = c(0)
      val s = dcSize(math.abs(diff))
      val (code, len) = dcCodes(s)
      bw.put(code, len)
      if (s > 0) bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    }
    bw.flush()
    // scan 2: AC first at Al = 1 — standard run/size coding of v >> 1
    // (signed point transform), per-block EOB0, Annex K table
    sos(1, 63, 0, 1)
    val acCodes = huffCodes(StdAcCounts, StdAcVals)
    bw = new BitWriter(out)
    blocks.foreach { c =>
      var r = 0
      var k = 1
      while (k <= 63) {
        val t = { val v = c(k); if (v < 0) -(-v >> 1) else v >> 1 }
        if (t == 0) r += 1
        else {
          while (r > 15) {
            val (zc, zl) = acCodes(0xf0); bw.put(zc, zl); r -= 16
          }
          val sz = dcSize(math.abs(t))
          val (ac, al2) = acCodes((r << 4) | sz)
          bw.put(ac, al2)
          bw.put(if (t >= 0) t else t + (1 << sz) - 1, sz)
          r = 0
        }
        k += 1
      }
      if (r > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) }
    }
    bw.flush()
    // scan 3: AC refinement, Ah = 1 → Al = 0, with a refinement-shaped
    // AC table (EOB0..EOB4, ZRL, (r<<4)|1 for r = 0..15) redefined
    // mid-stream — 22 symbols, all at code length 5 (≤ 31, so the
    // all-ones code stays reserved). r = 15 is legal and reachable: a
    // block with exactly 15 zero-history coefficients before a
    // newly-significant ±1 encodes 0xF1, not ZRL + 0x01.
    val refVals: Array[Byte] =
      (Seq(0x00, 0x10, 0x20, 0x30, 0x40, 0xf0) ++
        (0 to 15).map(r => (r << 4) | 1)).map(_.toByte).toArray
    val refCounts = Array(0, 0, 0, 0, refVals.length,
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    writeDht(out, Seq((0x10, refCounts, refVals)))
    val refCodes = huffCodes(refCounts, refVals)
    sos(1, 63, 1, 0)
    bw = new BitWriter(out)
    val bwF = bw
    def putSym(sym: Int): Unit = {
      val (c2, l2) = refCodes(sym); bwF.put(c2, l2)
    }
    var eobRun = 0
    val runPend = scala.collection.mutable.ArrayBuffer.empty[Int]
    def flushEob(): Unit = if (eobRun > 0) {
      val r = 31 - Integer.numberOfLeadingZeros(eobRun)
      require(r <= 4, s"EOB run too long for the table: $eobRun")
      putSym(r << 4)
      if (r > 0) bwF.put(eobRun - (1 << r), r)
      runPend.foreach(bwF.put(_, 1))
      runPend.clear()
      eobRun = 0
    }
    blocks.foreach { c =>
      // last newly-significant position bounds ZRL emission (trailing
      // zeros past it fold into the EOB run instead — T.81 G.2)
      var lastNew = 0
      var k = 1
      while (k <= 63) { if (math.abs(c(k)) == 1) lastNew = k; k += 1 }
      if (lastNew > 0) flushEob() // this block emits symbols of its own
      var r = 0
      val pend = scala.collection.mutable.ArrayBuffer.empty[Int]
      k = 1
      while (k <= 63) {
        val v = c(k)
        val a = math.abs(v)
        if (a == 0) r += 1
        else {
          while (r > 15 && k <= lastNew) {
            putSym(0xf0); r -= 16
            pend.foreach(bwF.put(_, 1)); pend.clear()
          }
          if (a > 1) pend += (a & 1)
          else {
            putSym((r << 4) | 1); r = 0
            bwF.put(if (v > 0) 1 else 0, 1)
            pend.foreach(bwF.put(_, 1)); pend.clear()
          }
        }
        k += 1
      }
      if (r > 0 || pend.nonEmpty || lastNew == 0) {
        eobRun += 1 // band tail (or whole band) joins the EOB run
        runPend ++= pend
        if (eobRun == 31) flushEob() // table caps EOBn at r = 4
      }
    }
    flushEob()
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }
}
