package graft.multimodal

/** Baseline JPEG pixel decode with PINNED integer arithmetic.
  *
  * Closes the largest FakeCodec gap: real-corpus images are
  * overwhelmingly JPEG, and "JPEG is approximate" only holds across
  * decoders that choose different IDCT/upsampling arithmetic. This
  * decoder pins ONE published integer pipeline end-to-end, so the
  * decode is bit-deterministic — the same fixed-point discipline as the
  * oracled gradient-descent training in
  * [[graft.operators.QualityClassifier]]:
  *
  *  - entropy decode: baseline sequential Huffman per ISO/IEC 10918-1
  *    Annex F (canonical DECODE/RECEIVE/EXTEND), byte stuffing, DNL-free
  *    scans, restart markers — AND progressive Huffman per Annex G
  *    (spectral selection + successive approximation: DC first/refine,
  *    AC first/refine with EOB runs, whole-image coefficient buffering
  *    until EOI, exactly libjpeg's jdphuff.c discipline);
  *  - dequantize + inverse DCT: the public IJG "islow" integer IDCT
  *    (jidctint.c shape — Loeffler/Ligtenberg/Moshytz factorization at
  *    CONST_BITS=13, PASS1_BITS=2, DESCALE round-half-up, int32
  *    wraparound semantics), including both all-zero-AC shortcuts;
  *  - chroma upsampling: IJG "fancy" (triangular) h2v1/h2v2 filters —
  *    the libjpeg decode default — with replication for other ratios;
  *  - color: the IJG fixed-point YCbCr→RGB tables
  *    (SCALEBITS=16: 91881/116130/-46802/-22554 with the ONE_HALF bias).
  *
  * Supported: SOF0/SOF1/SOF2 (baseline, extended sequential, and
  * progressive Huffman), 8-bit precision, 1 or 3 components, sampling
  * factors 1-2, 8/16-bit DQT, DRI/RSTn. Unsupported (→ null, the
  * never-throw corpus policy): arithmetic coding (SOF9+), lossless/
  * hierarchical, 12-bit precision, 4-component CMYK/Adobe-transform
  * streams. Progressive frames buffer whole-image coefficients until
  * EOI (as libjpeg must), so their bomb guard is 4x tighter than the
  * baseline pixel cap. Range limiting is a plain
  * clamp of (idct + 128) to [0,255] — identical to the IJG mask-table
  * on every value a conforming stream can produce (|val| ≤ 512); only
  * deliberately-corrupt coefficient overflow can differ, and such
  * payloads have no exactness contract anyway.
  *
  * Reference analogue: the decode stage of table-API multimodal
  * preprocessing (the reference ships no image codecs — provenance is
  * the public ISO 10918-1 spec and the IJG algorithm descriptions).
  * Scale shape: pure per-row map-side compute, zero shuffle; the
  * [[ImageDecodeExpr.MaxPixels]] bomb guard applies before any
  * allocation. */
object JpegDecode {

  final class Decoded(val width: Int, val height: Int, val pixels: Array[Int])

  // zigzag index -> natural (row-major) index, ISO 10918-1 Figure A.6
  private val NaturalOrder: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ---- IJG islow IDCT constants (CONST_BITS=13 fixed point) ----
  private final val ConstBits = 13
  private final val Pass1Bits = 2
  private final val F_0_298631336 = 2446
  private final val F_0_390180644 = 3196
  private final val F_0_541196100 = 4433
  private final val F_0_765366865 = 6270
  private final val F_0_899976223 = 7373
  private final val F_1_175875602 = 9633
  private final val F_1_501321110 = 12299
  private final val F_1_847759065 = 15137
  private final val F_1_961570560 = 16069
  private final val F_2_053119869 = 16819
  private final val F_2_562915447 = 20995
  private final val F_3_072711026 = 25172

  // round-half-up arithmetic shift (IJG DESCALE); int32 wraparound on
  // purpose — matches the C arithmetic bit for bit
  @inline private def descale(x: Int, n: Int): Int = (x + (1 << (n - 1))) >> n

  @inline private def clamp(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  // ---- IJG fixed-point YCbCr->RGB (jdcolor.c build_ycc_rgb_table) ----
  // FIX(1.40200)=91881 FIX(1.77200)=116130 FIX(0.71414)=46802
  // FIX(0.34414)=22554, ONE_HALF = 1<<15, SCALEBITS = 16
  private val CrR = Array.tabulate(256)(i => (91881 * (i - 128) + 32768) >> 16)
  private val CbB = Array.tabulate(256)(i => (116130 * (i - 128) + 32768) >> 16)
  private val CrG = Array.tabulate(256)(i => -46802 * (i - 128))
  private val CbG = Array.tabulate(256)(i => -22554 * (i - 128) + 32768)

  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    val values: Array[Int] = vals
    val counts: Array[Int] = bits
    // 8-bit lookahead table (the jdhuff.c HUFF_LOOKAHEAD discipline):
    // lut(v) = (codeLength << 8) | symbol for every 8-bit prefix whose
    // top bits are a code of length <= 8; 0 = fall back to the
    // length-by-length walk. Purely a fast path — decode is identical.
    val lut = new Array[Int](256)
    locally { // canonical code assignment (Annex F.2.2.3 / jdhuff.c)
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        var j = 0
        while (j < bits(l)) {
          if (l <= 8) {
            val base = (code + j) << (8 - l)
            var fill = 0
            while (fill < (1 << (8 - l))) {
              lut(base | fill) = (l << 8) | vals(k + j)
              fill += 1
            }
          }
          j += 1
        }
        code += bits(l); k += bits(l)
        maxcode(l) = code - 1
        code <<= 1
        l += 1
      }
    }
  }

  private final class Comp(val id: Int, val h: Int, val v: Int, val tq: Int) {
    var dcTbl = 0
    var acTbl = 0
    var pred = 0
    var plane: Array[Byte] = _ // paddedW x paddedH samples
    var paddedW = 0
    var paddedH = 0
    // progressive only: whole-image coefficient buffer (JCOEF = short,
    // libjpeg's wraparound semantics) over the PADDED block grid
    var coef: Array[Short] = _
    var dw = 0 // downsampled logical width/height (A.1.1 ceil division)
    var dh = 0
    var bwPad = 0 // padded grid dims in blocks
    var bhPad = 0
  }

  /** One SOS header: indices into the frame's component array plus the
    * scan's table selectors and spectral/approximation parameters. */
  private final class Scan(val comps: Array[Comp], val ss: Int, val se: Int,
    val ah: Int, val al: Int)

  private final class ProgState { var eobrun = 0 }

  /** Decode, or null for anything malformed/unsupported. `maxPixels`
    * is checked against declared width*height BEFORE any allocation. */
  def decode(b: Array[Byte], maxPixels: Long): Decoded = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return null
    val qt = Array.ofDim[Int](4, 64) // natural order
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0
    var restartInterval = 0
    var progressive = false
    var scannedAny = false
    var i = 2
    var baselineScanAt = -1
    var sawEoi = false

    def u16(p: Int): Int = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

    // ---- marker walk; progressive scans decode IN the walk ----
    while (baselineScanAt < 0 && !sawEoi) {
      // a marker must follow (fill bytes: any number of FFs tolerated)
      if (i >= b.length || (b(i) & 0xff) != 0xff) return null
      while (i < b.length && (b(i) & 0xff) == 0xff) i += 1
      if (i >= b.length) return null
      val marker = b(i) & 0xff; i += 1
      marker match {
        case 0xd9 => // EOI: completes a progressive frame, else malformed
          if (progressive && scannedAny) sawEoi = true else return null
        case m if m >= 0xd0 && m <= 0xd7 => () // stray RST: skip
        case 0x01 => () // TEM: no payload
        case _ =>
          if (i + 2 > b.length) return null
          val len = u16(i)
          if (len < 2 || i + len > b.length) return null
          val seg = i + 2
          val segEnd = i + len
          var nextI = segEnd
          marker match {
            case 0xdb => // DQT: one or more tables
              var p = seg
              while (p < segEnd) {
                val pq = (b(p) & 0xff) >> 4
                val tq = b(p) & 0x0f
                if (tq > 3 || pq > 1) return null
                p += 1
                val need = if (pq == 0) 64 else 128
                if (p + need > segEnd) return null
                var k = 0
                while (k < 64) {
                  val v = if (pq == 0) b(p + k) & 0xff
                    else u16(p + k * 2)
                  qt(tq)(NaturalOrder(k)) = v
                  k += 1
                }
                p += need
              }
            case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 baseline, SOF2 progressive
              if (comps != null) return null
              progressive = marker == 0xc2
              if (seg + 6 > segEnd) return null
              if ((b(seg) & 0xff) != 8) return null // precision
              h = u16(seg + 1); w = u16(seg + 3)
              val nf = b(seg + 5) & 0xff
              if (w <= 0 || h <= 0 || (nf != 1 && nf != 3)) return null
              // bomb guard — tighter for progressive, which must buffer
              // whole-image coefficients until EOI (libjpeg does the
              // same): ~6 bytes/pixel of JCOEFs on a 3-component frame
              if (w.toLong * h > (if (progressive) maxPixels / 4
                else maxPixels)) return null
              if (seg + 6 + nf * 3 > segEnd) return null
              comps = Array.tabulate(nf) { c =>
                val p = seg + 6 + c * 3
                val hv = b(p + 1) & 0xff
                // A single-component scan is NON-interleaved (ISO
                // 10918-1 A.2.2): one data unit per MCU at the
                // component's full resolution, declared sampling
                // factors irrelevant (the JDK encoder writes 2x2 for
                // grayscale) — normalize to 1x1.
                val (ch, cv) = if (nf == 1) (1, 1) else (hv >> 4, hv & 0x0f)
                new Comp(b(p) & 0xff, ch, cv, b(p + 2) & 0x0f)
              }
              if (comps.exists(c => c.h < 1 || c.h > 2 || c.v < 1 ||
                  c.v > 2 || c.tq > 3)) return null
              hMax = comps.map(_.h).max
              vMax = comps.map(_.v).max
              mcusX = (w + 8 * hMax - 1) / (8 * hMax)
              mcusY = (h + 8 * vMax - 1) / (8 * vMax)
              comps.foreach { c =>
                c.paddedW = mcusX * 8 * c.h
                c.paddedH = mcusY * 8 * c.v
                c.dw = (w * c.h + hMax - 1) / hMax
                c.dh = (h * c.v + vMax - 1) / vMax
                c.bwPad = mcusX * c.h
                c.bhPad = mcusY * c.v
                if (progressive)
                  c.coef = new Array[Short](c.bwPad * c.bhPad * 64)
              }
            case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
                 0xcd | 0xce | 0xcf =>
              return null // lossless / hierarchical / arithmetic
            case 0xc4 => // DHT: one or more tables
              var p = seg
              while (p < segEnd) {
                if (p + 17 > segEnd) return null
                val tc = (b(p) & 0xff) >> 4
                val th = b(p) & 0x0f
                if (tc > 1 || th > 3) return null
                val bits = new Array[Int](17)
                var total = 0
                var l = 1
                while (l <= 16) {
                  bits(l) = b(p + l) & 0xff; total += bits(l); l += 1
                }
                if (total > 256 || p + 17 + total > segEnd) return null
                val vals = new Array[Int](total)
                var k = 0
                while (k < total) { vals(k) = b(p + 17 + k) & 0xff; k += 1 }
                val t = new Huff(bits, vals)
                if (tc == 0) dcTabs(th) = t else acTabs(th) = t
                p += 17 + total
              }
            case 0xdd => // DRI
              if (len != 4) return null
              restartInterval = u16(seg)
            case 0xda => // SOS
              if (comps == null) return null
              val ns = b(seg) & 0xff
              if (ns < 1 || ns > comps.length ||
                  seg + 1 + ns * 2 + 3 > segEnd) return null
              val scanComps = new Array[Comp](ns)
              var c = 0
              while (c < ns) {
                val cid = b(seg + 1 + c * 2) & 0xff
                val tt = b(seg + 2 + c * 2) & 0xff
                val comp = comps.find(_.id == cid).orNull
                if (comp == null) return null
                comp.dcTbl = tt >> 4
                comp.acTbl = tt & 0x0f
                scanComps(c) = comp
                c += 1
              }
              val p = seg + 1 + ns * 2
              val scan = new Scan(scanComps, b(p) & 0xff, b(p + 1) & 0xff,
                (b(p + 2) & 0xff) >> 4, b(p + 2) & 0x0f)
              if (!progressive) {
                // baseline: one full-band interleaved scan
                if (ns != comps.length || scan.ss != 0 || scan.se != 63 ||
                    scan.ah != 0 || scan.al != 0) return null
                baselineScanAt = segEnd
              } else {
                val reader = new BitReader(b, segEnd)
                if (!progressiveScan(reader, scan, dcTabs, acTabs,
                    restartInterval, mcusX, mcusY)) return null
                scannedAny = true
                nextI = skipEntropy(b, reader.pos)
              }
            case _ => () // APPn / COM / others: skip
          }
          i = nextI
      }
    }
    if (comps == null) return null

    comps.foreach { c =>
      // padded planes are bounded by ~4x the bomb guard (hMax,vMax<=2)
      c.plane = new Array[Byte](c.paddedW * c.paddedH)
    }

    if (progressive) {
      // ---- final pass: dequantize the buffered coefficients + IDCT ----
      val deq = new Array[Int](64)
      val ws = new Array[Int](64)
      comps.foreach { c =>
        val q = qt(c.tq)
        var by = 0
        while (by < c.bhPad) {
          var bx = 0
          while (bx < c.bwPad) {
            val off = (by * c.bwPad + bx) * 64
            var j = 0
            while (j < 64) { deq(j) = c.coef(off + j) * q(j); j += 1 }
            idctBlock(deq, ws, c.plane, c.paddedW, bx * 8, by * 8)
            bx += 1
          }
          by += 1
        }
      }
    } else {
      // ---- baseline: entropy decode + IDCT per MCU, single scan ----
      comps.foreach { c =>
        if (dcTabs(c.dcTbl) == null || acTabs(c.acTbl) == null) return null
      }
      val reader = new BitReader(b, baselineScanAt)
      val coef = new Array[Int](64)
      val ws = new Array[Int](64)
      var mcu = 0
      val totalMcus = mcusX * mcusY
      var nextRst = 0
      while (mcu < totalMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!reader.restart(nextRst)) return null
          nextRst = (nextRst + 1) & 7
          comps.foreach(_.pred = 0)
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = qt(c.tq)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              if (!decodeBlock(reader, c, dcTabs(c.dcTbl), acTabs(c.acTbl),
                  q, coef)) return null
              idctBlock(coef, ws, c.plane, c.paddedW,
                (mx * c.h + bx) * 8, (my * c.v + by) * 8)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
    }

    // ---- upsample + color ----
    val px = new Array[Int](w * h)
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = c.plane(y * c.paddedW + x) & 0xff
          px(y * w + x) = 0xff000000 | (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
    } else {
      val yP = full(comps(0), w, h, hMax, vMax)
      val cbP = full(comps(1), w, h, hMax, vMax)
      val crP = full(comps(2), w, h, hMax, vMax)
      var p = 0
      val n = w * h
      while (p < n) {
        val yy = yP(p) & 0xff
        val cb = cbP(p) & 0xff
        val cr = crP(p) & 0xff
        val r = clamp(yy + CrR(cr))
        val g = clamp(yy + ((CbG(cb) + CrG(cr)) >> 16))
        val bl = clamp(yy + CbB(cb))
        px(p) = 0xff000000 | (r << 16) | (g << 8) | bl
        p += 1
      }
    }
    new Decoded(w, h, px)
  }

  /** Upsample a component plane to full (w x h) resolution. Factor-2
    * axes use the IJG fancy (triangular) filter over the component's
    * DOWNSAMPLED extent (edge samples replicate); identity axes copy. */
  private def full(c: Comp, w: Int, h: Int, hMax: Int, vMax: Int)
      : Array[Byte] = {
    val sx = hMax / c.h // 1 or 2 (h in 1..2 enforced at SOF)
    val sy = vMax / c.v
    if (sx == 1 && sy == 1) {
      if (c.paddedW == w && c.paddedH == h) return c.plane
      val outp = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(c.plane, y * c.paddedW, outp, y * w, w)
        y += 1
      }
      return outp
    }
    // downsampled logical extent (ceil division per A.1.1)
    val dw = (w * c.h + hMax - 1) / hMax
    val dh = (h * c.v + vMax - 1) / vMax
    val src = c.plane
    val sw = c.paddedW
    if (sx == 2 && sy == 2) {
      // h2v2_fancy_upsample: vertical 3:1 column sums against the
      // nearer adjacent row, then horizontal 3:1 with the jdsample.c
      // bias split (+8 toward the near sample, +7 toward the far one)
      val outp = new Array[Byte](w * h)
      var oy = 0
      while (oy < h) {
        val iy = oy >> 1
        val ny = math.min(math.max(if ((oy & 1) == 0) iy - 1 else iy + 1,
          0), dh - 1)
        @inline def colsum(x: Int): Int =
          (src(iy * sw + x) & 0xff) * 3 + (src(ny * sw + x) & 0xff)
        var ox = 0
        while (ox < w) {
          val ix = ox >> 1
          val v =
            if ((ox & 1) == 0) {
              if (ix == 0) (colsum(0) * 4 + 8) >> 4
              else (colsum(ix) * 3 + colsum(ix - 1) + 8) >> 4
            } else {
              if (ix == dw - 1) (colsum(ix) * 4 + 7) >> 4
              else (colsum(ix) * 3 + colsum(ix + 1) + 7) >> 4
            }
          outp(oy * w + ox) = v.toByte
          ox += 1
        }
        oy += 1
      }
      outp
    } else if (sx == 2 && sy == 1) {
      // h2v1_fancy_upsample
      val outp = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val row = math.min(y, dh - 1) * sw
        var ox = 0
        while (ox < w) {
          val ix = ox >> 1
          val cur = src(row + ix) & 0xff
          val v =
            if ((ox & 1) == 0) {
              if (ix == 0) cur
              else (cur * 3 + (src(row + ix - 1) & 0xff) + 1) >> 2
            } else {
              if (ix == dw - 1) cur
              else (cur * 3 + (src(row + ix + 1) & 0xff) + 2) >> 2
            }
          outp(y * w + ox) = v.toByte
          ox += 1
        }
        y += 1
      }
      outp
    } else {
      // v-only (4:4:0) and any remaining ratio: plain replication — the
      // jdsample.c int_upsample fallback (libjpeg has no fancy filter
      // for these either)
      val outp = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val iy = math.min(y / sy, dh - 1)
        var x = 0
        while (x < w) {
          outp(y * w + x) = src(iy * sw + math.min(x / sx, dw - 1))
          x += 1
        }
        y += 1
      }
      outp
    }
  }

  /** One block: DC diff + AC run-lengths into dequantized natural-order
    * `coef`. Returns false on any bitstream error. */
  private def decodeBlock(r: BitReader, c: Comp, dc: Huff, ac: Huff,
      q: Array[Int], coef: Array[Int]): Boolean = {
    java.util.Arrays.fill(coef, 0)
    val s = decodeHuff(r, dc)
    if (s < 0 || s > 15) return false
    var diff = 0
    if (s > 0) {
      val v = r.receive(s)
      if (v < 0) return false
      diff = extend(v, s)
    }
    c.pred += diff
    coef(0) = c.pred * q(0)
    var k = 1
    var done = false
    while (!done && k < 64) {
      val rs = decodeHuff(r, ac)
      if (rs < 0) return false
      val run = rs >> 4
      val size = rs & 15
      if (size == 0) {
        if (run == 15) k += 16 // ZRL
        else done = true // EOB
      } else {
        k += run
        if (k > 63) return false
        val v = r.receive(size)
        if (v < 0) return false
        val nat = NaturalOrder(k)
        coef(nat) = extend(v, size) * q(nat)
        k += 1
      }
    }
    true
  }

  @inline private def extend(v: Int, s: Int): Int =
    if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Position of the next true marker after entropy data starting at
    * `from`: stuffed FF00s and RSTn markers are part of the data. */
  private def skipEntropy(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) == 0xff) {
        val m = b(i + 1) & 0xff
        if (m == 0x00 || (m >= 0xd0 && m <= 0xd7)) i += 2
        else return i
      } else i += 1
    }
    b.length
  }

  /** One progressive scan (ISO 10918-1 Annex G / the public jdphuff.c
    * algorithm): DC-first, DC-refinement, AC-first and AC-refinement
    * passes accumulate into the per-component coefficient buffers.
    * Interleaved (Ns>1, DC only) scans walk the frame MCU grid; single-
    * component scans walk the component's own non-padded block grid. */
  private def progressiveScan(r: BitReader, scan: Scan,
      dcTabs: Array[Huff], acTabs: Array[Huff], restartInterval: Int,
      mcusX: Int, mcusY: Int): Boolean = {
    val ss = scan.ss; val se = scan.se; val ah = scan.ah; val al = scan.al
    if (ss < 0 || se > 63 || ss > se || al > 13) return false
    val dcScan = ss == 0
    if (dcScan && se != 0) return false // progressive DC band is {0}
    if (!dcScan && scan.comps.length != 1) return false // G.1.1.1.1
    val st = new ProgState
    scan.comps.foreach(_.pred = 0)
    var nextRst = 0

    def block(c: Comp, off: Int): Boolean =
      if (dcScan) {
        if (ah == 0) dcFirst(r, dcTabs(c.dcTbl), c, al, c.coef, off)
        else dcRefine(r, al, c.coef, off)
      } else {
        if (ah == 0) acFirst(r, acTabs(c.acTbl), ss, se, al, c.coef, off, st)
        else acRefine(r, acTabs(c.acTbl), ss, se, al, c.coef, off, st)
      }
    // table presence per scan kind (refinement DC scans read raw bits)
    if (dcScan && ah == 0 && scan.comps.exists(c => dcTabs(c.dcTbl) == null))
      return false
    if (!dcScan && acTabs(scan.comps(0).acTbl) == null) return false

    if (scan.comps.length == 1) {
      // non-interleaved: the component's ceil(dw/8) x ceil(dh/8) grid
      val c = scan.comps(0)
      val bw = (c.dw + 7) / 8
      val bh = (c.dh + 7) / 8
      var idx = 0
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          if (restartInterval > 0 && idx > 0 && idx % restartInterval == 0) {
            if (!r.restart(nextRst)) return false
            nextRst = (nextRst + 1) & 7
            c.pred = 0; st.eobrun = 0
          }
          if (!block(c, (by * c.bwPad + bx) * 64)) return false
          idx += 1
          bx += 1
        }
        by += 1
      }
    } else {
      // interleaved DC scan over the frame MCU grid
      var mcu = 0
      val total = mcusX * mcusY
      while (mcu < total) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!r.restart(nextRst)) return false
          nextRst = (nextRst + 1) & 7
          scan.comps.foreach(_.pred = 0); st.eobrun = 0
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < scan.comps.length) {
          val c = scan.comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              val gx = mx * c.h + bx
              val gy = my * c.v + by
              if (!block(c, (gy * c.bwPad + gx) * 64)) return false
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
    }
    true
  }

  /** Progressive DC first pass: differential DC, value scaled by Al. */
  private def dcFirst(r: BitReader, dc: Huff, c: Comp, al: Int,
      coef: Array[Short], off: Int): Boolean = {
    val s = decodeHuff(r, dc)
    if (s < 0 || s > 15) return false
    var diff = 0
    if (s > 0) {
      val v = r.receive(s)
      if (v < 0) return false
      diff = extend(v, s)
    }
    c.pred += diff
    coef(off) = (c.pred << al).toShort
    true
  }

  /** Progressive DC refinement: one raw bit per block ORs in bit Al. */
  private def dcRefine(r: BitReader, al: Int, coef: Array[Short],
      off: Int): Boolean = {
    val bit = r.nextBit()
    if (bit < 0) return false
    if (bit != 0) coef(off) = (coef(off) | (1 << al)).toShort
    true
  }

  /** Progressive AC first pass with EOB runs (jdphuff
    * decode_mcu_AC_first shape). */
  private def acFirst(r: BitReader, ac: Huff, ss: Int, se: Int, al: Int,
      coef: Array[Short], off: Int, st: ProgState): Boolean = {
    if (st.eobrun > 0) { st.eobrun -= 1; return true }
    var k = ss
    while (k <= se) {
      val rs = decodeHuff(r, ac)
      if (rs < 0) return false
      val run = rs >> 4
      val s = rs & 15
      if (s != 0) {
        k += run
        if (k > se) return false
        val v = r.receive(s)
        if (v < 0) return false
        coef(off + NaturalOrder(k)) = (extend(v, s) << al).toShort
        k += 1
      } else {
        if (run != 15) { // EOBn: run of end-of-bands (this block included)
          st.eobrun = (1 << run) - 1
          if (run > 0) {
            val v = r.receive(run)
            if (v < 0) return false
            st.eobrun += v
          }
          return true
        }
        k += 16 // ZRL
      }
    }
    true
  }

  /** Progressive AC refinement (jdphuff decode_mcu_AC_refine shape):
    * correction bits for already-nonzero coefficients, new +-1<<Al
    * coefficients placed after `run` ZERO-HISTORY positions, EOB runs
    * that still carry correction bits for the band's tail. */
  private def acRefine(r: BitReader, ac: Huff, ss: Int, se: Int, al: Int,
      coef: Array[Short], off: Int, st: ProgState): Boolean = {
    val p1 = 1 << al
    val m1 = -1 << al
    @inline def correct(pos: Int): Boolean = {
      val bit = r.nextBit()
      if (bit < 0) return false
      if (bit != 0 && (coef(pos) & p1) == 0)
        coef(pos) =
          (coef(pos) + (if (coef(pos) >= 0) p1 else m1)).toShort
      true
    }
    var k = ss
    if (st.eobrun == 0) {
      var atEob = false
      while (k <= se && !atEob) {
        val rs = decodeHuff(r, ac)
        if (rs < 0) return false
        var run = rs >> 4
        val s = rs & 15
        var newval = 0
        if (s == 0) {
          if (run != 15) { // EOBn starts here; tail handled below
            st.eobrun = 1 << run
            if (run > 0) {
              val v = r.receive(run)
              if (v < 0) return false
              st.eobrun += v
            }
            atEob = true
          }
          // run == 15 (ZRL): skip 16 zero-history positions below
        } else {
          if (s != 1) return false // refinement magnitudes are +-1
          val bit = r.nextBit()
          if (bit < 0) return false
          newval = if (bit != 0) p1 else m1
        }
        if (!atEob) {
          var placed = false
          while (k <= se && !placed) {
            val pos = off + NaturalOrder(k)
            if (coef(pos) != 0) {
              if (!correct(pos)) return false
            } else {
              if (run == 0) {
                if (s != 0) coef(pos) = newval.toShort
                placed = true
              } else run -= 1
            }
            k += 1
          }
          if (!placed && s != 0) return false // ran off the band
        }
      }
    }
    if (st.eobrun > 0) {
      while (k <= se) { // correction bits for the rest of this block
        val pos = off + NaturalOrder(k)
        if (coef(pos) != 0 && !correct(pos)) return false
        k += 1
      }
      st.eobrun -= 1
    }
    true
  }

  private def decodeHuff(r: BitReader, t: Huff): Int = {
    // fast path: 8-bit lookahead (identical decode, one table probe)
    val e = t.lut(r.peek8())
    if (e != 0 && (e >> 8) <= r.avail) {
      r.consume(e >> 8)
      return e & 0xff
    }
    // slow path: codes longer than 8 bits (or stream tail)
    var code = r.nextBit()
    if (code < 0) return -1
    var l = 1
    while (l <= 16) {
      if (t.counts(l) > 0 && code >= t.mincode(l) && code <= t.maxcode(l))
        return t.values(t.valptr(l) + code - t.mincode(l))
      val bit = r.nextBit()
      if (bit < 0) return -1
      code = (code << 1) | bit
      l += 1
    }
    -1
  }

  /** IJG islow IDCT (jidctint.c algorithm): pass 1 down columns into
    * ws (scaled by PASS1_BITS), pass 2 across rows, final descale by
    * CONST_BITS+PASS1_BITS+3, +128 level shift, clamp. Both all-AC-zero
    * shortcuts included (they change ROUNDING-free paths only — the
    * shortcut value equals the full computation exactly). Input `coef`
    * is already dequantized, natural order. */
  private def idctBlock(coef: Array[Int], ws: Array[Int],
      plane: Array[Byte], stride: Int, ox: Int, oy: Int): Unit = {
    // pass 1: columns
    var ctr = 0
    while (ctr < 8) {
      if (coef(ctr + 8) == 0 && coef(ctr + 16) == 0 && coef(ctr + 24) == 0 &&
          coef(ctr + 32) == 0 && coef(ctr + 40) == 0 && coef(ctr + 48) == 0 &&
          coef(ctr + 56) == 0) {
        val dcval = coef(ctr) << Pass1Bits
        var k = 0
        while (k < 8) { ws(ctr + 8 * k) = dcval; k += 1 }
      } else {
        var z2 = coef(ctr + 16)
        var z3 = coef(ctr + 48)
        var z1 = (z2 + z3) * F_0_541196100
        val t2 = z1 - z3 * F_1_847759065
        val t3 = z1 + z2 * F_0_765366865
        z2 = coef(ctr)
        z3 = coef(ctr + 32)
        val t0 = (z2 + z3) << ConstBits
        val t1 = (z2 - z3) << ConstBits
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = coef(ctr + 56)
        var o1 = coef(ctr + 40)
        var o2 = coef(ctr + 24)
        var o3 = coef(ctr + 8)
        z1 = o0 + o3
        z2 = o1 + o2
        z3 = o0 + o2
        var z4 = o1 + o3
        val z5 = (z3 + z4) * F_1_175875602
        o0 *= F_0_298631336
        o1 *= F_2_053119869
        o2 *= F_3_072711026
        o3 *= F_1_501321110
        z1 *= -F_0_899976223
        z2 *= -F_2_562915447
        z3 = z3 * -F_1_961570560 + z5
        z4 = z4 * -F_0_390180644 + z5
        o0 += z1 + z3
        o1 += z2 + z4
        o2 += z2 + z3
        o3 += z1 + z4
        val sh = ConstBits - Pass1Bits
        ws(ctr) = descale(t10 + o3, sh)
        ws(ctr + 56) = descale(t10 - o3, sh)
        ws(ctr + 8) = descale(t11 + o2, sh)
        ws(ctr + 48) = descale(t11 - o2, sh)
        ws(ctr + 16) = descale(t12 + o1, sh)
        ws(ctr + 40) = descale(t12 - o1, sh)
        ws(ctr + 24) = descale(t13 + o0, sh)
        ws(ctr + 32) = descale(t13 - o0, sh)
      }
      ctr += 1
    }
    // pass 2: rows
    var row = 0
    while (row < 8) {
      val base = row * 8
      val outBase = (oy + row) * stride + ox
      if (ws(base + 1) == 0 && ws(base + 2) == 0 && ws(base + 3) == 0 &&
          ws(base + 4) == 0 && ws(base + 5) == 0 && ws(base + 6) == 0 &&
          ws(base + 7) == 0) {
        val dcval = clamp(descale(ws(base), Pass1Bits + 3) + 128).toByte
        var k = 0
        while (k < 8) { plane(outBase + k) = dcval; k += 1 }
      } else {
        var z2 = ws(base + 2)
        var z3 = ws(base + 6)
        var z1 = (z2 + z3) * F_0_541196100
        val t2 = z1 - z3 * F_1_847759065
        val t3 = z1 + z2 * F_0_765366865
        val t0 = (ws(base) + ws(base + 4)) << ConstBits
        val t1 = (ws(base) - ws(base + 4)) << ConstBits
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = ws(base + 7)
        var o1 = ws(base + 5)
        var o2 = ws(base + 3)
        var o3 = ws(base + 1)
        z1 = o0 + o3
        z2 = o1 + o2
        z3 = o0 + o2
        var z4 = o1 + o3
        val z5 = (z3 + z4) * F_1_175875602
        o0 *= F_0_298631336
        o1 *= F_2_053119869
        o2 *= F_3_072711026
        o3 *= F_1_501321110
        z1 *= -F_0_899976223
        z2 *= -F_2_562915447
        z3 = z3 * -F_1_961570560 + z5
        z4 = z4 * -F_0_390180644 + z5
        o0 += z1 + z3
        o1 += z2 + z4
        o2 += z2 + z3
        o3 += z1 + z4
        val sh = ConstBits + Pass1Bits + 3
        plane(outBase) = clamp(descale(t10 + o3, sh) + 128).toByte
        plane(outBase + 7) = clamp(descale(t10 - o3, sh) + 128).toByte
        plane(outBase + 1) = clamp(descale(t11 + o2, sh) + 128).toByte
        plane(outBase + 6) = clamp(descale(t11 - o2, sh) + 128).toByte
        plane(outBase + 2) = clamp(descale(t12 + o1, sh) + 128).toByte
        plane(outBase + 5) = clamp(descale(t12 - o1, sh) + 128).toByte
        plane(outBase + 3) = clamp(descale(t13 + o0, sh) + 128).toByte
        plane(outBase + 4) = clamp(descale(t13 - o0, sh) + 128).toByte
      }
      row += 1
    }
  }

  /** MSB-first BUFFERED bit reader over entropy-coded data: FF00
    * unstuffing; any other marker ends the readable stream (a read
    * past it fails, which fails the decode — truncation policy). The
    * buffer holds the valid bits in its LOW `bitCnt` positions (oldest
    * at bitCnt-1); fill never consumes past a marker, so byte-aligned
    * restarts see `pos` sitting exactly on the RSTn. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bitBuf = 0L
    private var bitCnt = 0
    private var hitMarker = false

    private def fill(): Unit = {
      while (bitCnt <= 24 && !hitMarker) {
        if (pos >= b.length) hitMarker = true
        else {
          val v = b(pos) & 0xff
          if (v == 0xff) {
            if (pos + 1 >= b.length) hitMarker = true
            else if ((b(pos + 1) & 0xff) == 0) { // stuffed FF
              pos += 2
              bitBuf = (bitBuf << 8) | v
              bitCnt += 8
            } else hitMarker = true // a real marker: stop at it
          } else {
            pos += 1
            bitBuf = (bitBuf << 8) | v
            bitCnt += 8
          }
        }
      }
    }

    def nextBit(): Int = {
      if (bitCnt == 0) {
        fill()
        if (bitCnt == 0) return -1
      }
      bitCnt -= 1
      ((bitBuf >>> bitCnt) & 1L).toInt
    }

    /** Next 8 bits without consuming, zero-padded past the stream end
      * (padding can only produce a LUT hit longer than what is
      * available — the caller checks `avail` before consuming). */
    def peek8(): Int = {
      if (bitCnt < 8) fill()
      if (bitCnt >= 8) ((bitBuf >>> (bitCnt - 8)) & 0xffL).toInt
      else ((bitBuf << (8 - bitCnt)) & 0xffL).toInt
    }

    def avail: Int = bitCnt

    def consume(n: Int): Unit = bitCnt -= n

    /** RECEIVE: n bits MSB-first (n <= 16); negative on underrun. */
    def receive(n: Int): Int = {
      if (bitCnt < n) {
        fill()
        if (bitCnt < n) return -1
      }
      bitCnt -= n
      ((bitBuf >>> bitCnt) & ((1L << n) - 1)).toInt
    }

    /** Byte-align and consume the expected RSTn marker. */
    def restart(n: Int): Boolean = {
      bitCnt = 0 // discard padding bits buffered before the marker
      hitMarker = false
      if (pos + 2 > b.length) return false
      if ((b(pos) & 0xff) != 0xff || (b(pos + 1) & 0xff) != (0xd0 | n))
        return false
      pos += 2
      true
    }
  }
}
