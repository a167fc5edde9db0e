package graft.multimodal

/** VP8 (RFC 6386) keyframe decoder — the lossy half of WebP, which is
  * ~90% of real-corpus WebP (VP8L closed the lossless half in round
  * 12, WebpDecode.scala). Output is the decoder's native YUV 4:2:0
  * planes, bit-exact against libwebp (the RFC's reference
  * implementation): every stage below is integer-specified by the
  * spec, so there is exactly one right answer per stream.
  *
  * Pieces, all from the public RFC: the §7 boolean entropy decoder;
  * §9 keyframe headers (segmentation, loop-filter deltas, token
  * partitions, quantizer indices + per-segment overrides); §11
  * intra-mode decoding (the keyframe mode trees and the
  * context-conditioned 4x4 sub-mode table); §13 DCT token decoding
  * (the 12-token coefficient tree, band mapping, category extra
  * bits, the no-EOB-after-zero rule, and the left/above nonzero
  * contexts incl. the Y2 quirk for 4x4 macroblocks); §14 dequant
  * lookups with the y2 x2 / x155/100 and chroma-DC clamp rules; the
  * §14.3 inverse WHT for the secondary luma-DC transform and the
  * §14.4 4x4 IDCT (20091/35468 fixed-point); §12 intra prediction
  * (16x16 + 4x4 luma with the spec's 127/129 borders and the
  * stale top-right rule for right-column subblocks, 8x8 chroma);
  * §15 loop filtering (simple + normal, per-MB levels from segment +
  * delta adjustments, keyframe HEV thresholds, MB and subblock
  * edges in the spec's raster order).
  *
  * The spec's constant tables (default/update coefficient
  * probabilities, keyframe b-mode probabilities, dequant lookups —
  * published in RFC 6386's reference-source appendices) ship as a
  * resource extracted from the system libwebp by content signature
  * (tools/make_vp8_fixtures.py), the same provenance as the brotli
  * dictionary; Vp8DecodeSpec pins the whole decoder against
  * libwebp's own YUV output over a 48-fixture quality/size matrix.
  *
  * Corpus policy: malformed input or frames beyond maxPixels return
  * null, never throw. Interframes (temporal prediction) remain out
  * of scope — WebP stills are always keyframes. */
object Vp8Decode {

  final case class Yuv(width: Int, height: Int,
      y: Array[Byte], u: Array[Byte], v: Array[Byte])

  private def bail(): Nothing = throw new RuntimeException("vp8") {
    override def fillInStackTrace(): Throwable = this
  }

  // ---- RFC 6386 constant tables (resource, see header) ----------------

  private lazy val tables: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/vp8_tables.bin")
    require(in != null, "missing vp8_tables.bin")
    val d = try in.readAllBytes() finally in.close()
    require(d.length == 3396)
    d
  }
  /** default coeff probs [type][band][ctx][11], flat */
  private[graft] lazy val CoeffProbs0: Array[Byte] = tables.slice(0, 1056)
  /** coeff prob update probs [type][band][ctx][11], flat */
  private[graft] lazy val CoeffUpdate: Array[Byte] = tables.slice(1056, 2112)
  /** kf 4x4 sub-mode probs [above][left][9], flat */
  private lazy val BModeProbs: Array[Byte] = tables.slice(2112, 3012)
  private lazy val DcQ: Array[Int] = tables.slice(3012, 3140).map(_ & 0xff)
  private lazy val AcQ: Array[Int] = {
    val d = tables.slice(3140, 3396)
    Array.tabulate(128)(i => (d(2 * i) & 0xff) | ((d(2 * i + 1) & 0xff) << 8))
  }

  // §13.2 zigzag and coefficient-band mapping
  private val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11,
    14, 15)
  private[graft] val Bands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  // §13.1 coefficient token tree. Leaf tokens: 0..4 literal values,
  // 5..10 categories 1-6, 11 EOB. probs index a node as (i >> 1).
  private[graft] val CoeffTree = Array(
    -11, 2,
    0, 4, // -0: the ZERO token leaf
    -1, 6,
    8, 12,
    -2, 10,
    -3, -4,
    14, 16,
    -5, -6,
    18, 20,
    -7, -8,
    -9, -10)
  private val CatBase = Array(5, 7, 11, 19, 35, 67)
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))

  // §11.2 keyframe mode trees. Y modes: 0 DC, 1 V, 2 H, 3 TM, 4 B_PRED.
  // B modes: 0 B_DC, 1 B_TM, 2 B_VE, 3 B_HE, 4 B_LD, 5 B_RD, 6 B_VR,
  // 7 B_VL, 8 B_HD, 9 B_HU (the RFC's order — kf_bmode_prob indexes it).
  private[graft] val KfYModeTree = Array(-4, 2, 4, 6, 0, -1, -2, -3) // 0 = -DC
  private[graft] val KfYModeProb = Array(145, 156, 163, 128)
  private[graft] val UvModeTree = Array(0, 2, -1, 4, -2, -3) // 0 = -DC
  private[graft] val KfUvModeProb = Array(142, 114, 183)
  private val BModeTree = Array(
    0, 2, // -B_DC
    -1, 4, // B_TM
    -2, 6, // B_VE
    8, 12,
    -3, 10, // B_HE
    -5, -6, // B_RD, B_VR
    -4, 14, // B_LD
    -7, 16, // B_VL
    -8, -9) // B_HD, B_HU
  /** implied sub-mode of 16x16 modes for the b-mode context (§11.3):
    * DC->B_DC, V->B_VE, H->B_HE, TM->B_TM. */
  private val ImpliedBMode = Array(0, 2, 3, 1)

  // ---- §7 boolean decoder ----------------------------------------------

  private final class Bool(b: Array[Byte], start: Int, end: Int) {
    private var range = 255
    private var value = 0
    private var shift = 0
    private var pos = start
    locally { value = (next() << 8) | next() }
    private def next(): Int =
      if (pos < end) { val v = b(pos) & 0xff; pos += 1; v }
      else { pos += 1; 0 } // spec: reads past the end yield zeros
    def bit(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        shift += 1
        if (shift == 8) { shift = 0; value |= next() }
      }
      ret
    }
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(128); i += 1 }
      v
    }
    /** flag ? +-magnitude : 0 — the header delta shape. */
    def signedFlagged(n: Int): Int =
      if (bit(128) == 0) 0
      else { val m = literal(n); if (bit(128) == 1) -m else m }
    def tree(t: Array[Int], probs: Array[Int]): Int = {
      var i = t(bit(probs(0)))
      while (i > 0) i = t(i + bit(probs(i >> 1)))
      -i
    }
    /** tree walk over byte-table probs at `off`, from node `startAt`. */
    def treeB(t: Array[Int], probs: Array[Byte], off: Int,
        startAt: Int): Int = {
      var i = t(startAt + bit(probs(off + (startAt >> 1)) & 0xff))
      while (i > 0) i = t(i + bit(probs(off + (i >> 1)) & 0xff))
      -i
    }
  }

  // ---- public decode -----------------------------------------------------

  /** Decode a VP8 keyframe at b[off, off+len). None for interframes,
    * malformed streams, or frames beyond maxPixels. */
  def decode(b: Array[Byte], off: Int, len: Int,
      maxPixels: Long): Option[Yuv] =
    try Some(new Frame(b, off, len, maxPixels).run())
    catch { case _: Exception => None }

  /** YUV 4:2:0 -> packed 0xFFRRGGBB, the reference implementation's
    * point-sampling (no-fancy-upsampling) path: each chroma sample
    * covers its whole 2x2 block and the conversion is the fixed-point
    * formula from the reference dsp (coefficients x19077/26149/6419/
    * 13320/33050 with a >>8 product shift, then >>6 with range-test
    * clipping). Pinned byte-exact against the system libwebp's
    * MODE_RGB no-fancy output over the full fixture matrix
    * (tools/make_vp8_fixtures.py) and in Vp8DecodeSpec. */
  def toArgb(yuv: Yuv): Array[Int] = {
    val w = yuv.width
    val h = yuv.height
    val cw = (w + 1) >> 1
    val out = new Array[Int](w * h)
    @inline def clip8(v: Int): Int =
      if ((v & ~0x3fff) == 0) v >> 6 else if (v < 0) 0 else 255
    var yy = 0
    while (yy < h) {
      val crow = (yy >> 1) * cw
      var xx = 0
      while (xx < w) {
        val t = ((yuv.y(yy * w + xx) & 0xff) * 19077) >> 8
        val u = yuv.u(crow + (xx >> 1)) & 0xff
        val v = yuv.v(crow + (xx >> 1)) & 0xff
        val r = clip8(t + ((v * 26149) >> 8) - 14234)
        val g = clip8(t - ((u * 6419) >> 8) - ((v * 13320) >> 8) + 8708)
        val bl = clip8(t + ((u * 33050) >> 8) - 17685)
        out(yy * w + xx) = 0xff000000 | (r << 16) | (g << 8) | bl
        xx += 1
      }
      yy += 1
    }
    out
  }

  private final class Frame(b: Array[Byte], off: Int, len: Int,
      maxPixels: Long) {
    if (len < 10 || off < 0 || off + len > b.length) bail()
    private val tag = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16)
    if ((tag & 1) != 0) bail() // interframe: out of scope
    private val part0Len = tag >>> 5
    if ((b(off + 3) & 0xff) != 0x9d || (b(off + 4) & 0xff) != 0x01 ||
      (b(off + 5) & 0xff) != 0x2a) bail()
    private val width =
      ((b(off + 6) & 0xff) | ((b(off + 7) & 0xff) << 8)) & 0x3fff
    private val height =
      ((b(off + 8) & 0xff) | ((b(off + 9) & 0xff) << 8)) & 0x3fff
    if (width == 0 || height == 0 || width.toLong * height > maxPixels)
      bail()
    if (part0Len <= 0 || 10 + part0Len > len) bail()

    private val mbW = (width + 15) >> 4
    private val mbH = (height + 15) >> 4
    private val yStride = mbW * 16
    private val uvStride = mbW * 8
    private val yPlane = new Array[Byte](yStride * mbH * 16)
    private val uPlane = new Array[Byte](uvStride * mbH * 8)
    private val vPlane = new Array[Byte](uvStride * mbH * 8)

    private val br = new Bool(b, off + 10, off + 10 + part0Len)

    // --- header state ---
    private var segEnabled = false
    private var segUpdateMap = false
    private var segAbsValues = false
    private val segQuant = new Array[Int](4)
    private val segLf = new Array[Int](4)
    private val segTreeProbs = Array(255, 255, 255)
    private var simpleFilter = false
    private var filterLevel = 0
    private var sharpness = 0
    private var lfDeltaEnabled = false
    private val refLfDelta = new Array[Int](4)
    private val modeLfDelta = new Array[Int](4)
    private var useSkipProb = false
    private var skipProb = 0
    /** per segment: y1dc, y1ac, y2dc, y2ac, uvdc, uvac */
    private val quants = Array.ofDim[Int](4, 6)
    /** coeff probs [type][band][ctx] -> 11 bytes, flat like the table */
    private val probs = new Array[Byte](1056)

    private def parseHeader(): Int = {
      br.literal(1) // color space
      br.literal(1) // clamping
      segEnabled = br.bit(128) == 1
      if (segEnabled) {
        segUpdateMap = br.bit(128) == 1
        val updateData = br.bit(128) == 1
        if (updateData) {
          segAbsValues = br.bit(128) == 1
          var i = 0
          while (i < 4) { segQuant(i) = br.signedFlagged(7); i += 1 }
          i = 0
          while (i < 4) { segLf(i) = br.signedFlagged(6); i += 1 }
        }
        if (segUpdateMap) {
          var i = 0
          while (i < 3) {
            segTreeProbs(i) = if (br.bit(128) == 1) br.literal(8) else 255
            i += 1
          }
        }
      }
      simpleFilter = br.literal(1) == 1
      filterLevel = br.literal(6)
      sharpness = br.literal(3)
      lfDeltaEnabled = br.bit(128) == 1
      if (lfDeltaEnabled && br.bit(128) == 1) { // update flag
        var i = 0
        while (i < 4) {
          if (br.bit(128) == 1) {
            val m = br.literal(6)
            refLfDelta(i) = if (br.bit(128) == 1) -m else m
          }
          i += 1
        }
        i = 0
        while (i < 4) {
          if (br.bit(128) == 1) {
            val m = br.literal(6)
            modeLfDelta(i) = if (br.bit(128) == 1) -m else m
          }
          i += 1
        }
      }
      val nParts = 1 << br.literal(2)
      // quantizers (§9.6)
      val yacQi = br.literal(7)
      val ydcD = br.signedFlagged(4)
      val y2dcD = br.signedFlagged(4)
      val y2acD = br.signedFlagged(4)
      val uvdcD = br.signedFlagged(4)
      val uvacD = br.signedFlagged(4)
      def clip(v: Int, m: Int) = if (v < 0) 0 else if (v > m) m else v
      var s = 0
      while (s < 4) {
        val q = if (!segEnabled) yacQi
          else if (segAbsValues) segQuant(s)
          else yacQi + segQuant(s)
        val qc = clip(q, 127)
        quants(s)(0) = DcQ(clip(qc + ydcD, 127))
        quants(s)(1) = AcQ(qc)
        quants(s)(2) = DcQ(clip(qc + y2dcD, 127)) * 2
        quants(s)(3) = {
          val v = AcQ(clip(qc + y2acD, 127)) * 155 / 100
          if (v < 8) 8 else v
        }
        quants(s)(4) = DcQ(clip(qc + uvdcD, 117)) // chroma-DC clamp
        quants(s)(5) = AcQ(clip(qc + uvacD, 127))
        s += 1
      }
      br.literal(1) // refresh_entropy_probs (keyframe)
      var k = 0
      while (k < 1056) {
        if (br.bit(CoeffUpdate(k) & 0xff) == 1) probs(k) = br.literal(8).toByte
        else probs(k) = CoeffProbs0(k)
        k += 1
      }
      useSkipProb = br.bit(128) == 1
      if (useSkipProb) skipProb = br.literal(8)
      nParts
    }

    // --- per-MB rolling state ---
    private val aboveBModes = new Array[Int](4 * mbW) // B_DC border = 0
    private val leftBModes = new Array[Int](4)
    /** nonzero contexts: 0-3 y, 4-5 u, 6-7 v, 8 y2 */
    private val aboveNz = Array.ofDim[Int](mbW, 9)
    private val leftNz = new Array[Int](9)
    private val coeffs = new Array[Short](25 * 16)
    private val subModes = new Array[Int](16)
    private val nzY = new Array[Int](16) // per-MB luma nnz grid
    private val nzC = new Array[Int](8) // per-MB chroma nnz (u then v, 2x2)
    private val mbFilterLevel = new Array[Int](mbW * mbH)
    private val mbFilterInner = new Array[Boolean](mbW * mbH)

    def run(): Yuv = {
      val nParts = parseHeader()
      var p = off + 10 + part0Len
      val parts = new Array[Bool](nParts)
      if (nParts > 1) {
        if (p + 3 * (nParts - 1) > off + len) bail()
        var q = p + 3 * (nParts - 1)
        var i = 0
        while (i < nParts - 1) {
          val sz = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
            ((b(p + 2) & 0xff) << 16)
          if (sz < 0 || q + sz > off + len) bail()
          parts(i) = new Bool(b, q, q + sz)
          q += sz
          p += 3
          i += 1
        }
        parts(nParts - 1) = new Bool(b, q, off + len)
      } else {
        if (p > off + len) bail()
        parts(0) = new Bool(b, p, off + len)
      }

      var mbY = 0
      while (mbY < mbH) {
        val token = parts(mbY & (nParts - 1))
        java.util.Arrays.fill(leftNz, 0)
        java.util.Arrays.fill(leftBModes, 0)
        var mbX = 0
        while (mbX < mbW) {
          decodeMb(mbX, mbY, token)
          mbX += 1
        }
        mbY += 1
      }
      loopFilter()
      crop()
    }

    // ------------------------------------------------ per-MB decode

    private def decodeMb(mbX: Int, mbY: Int, token: Bool): Unit = {
      val seg = if (segEnabled && segUpdateMap) {
        if (br.bit(segTreeProbs(0)) == 0) br.bit(segTreeProbs(1))
        else 2 + br.bit(segTreeProbs(2))
      } else 0
      val skipFlag = useSkipProb && br.bit(skipProb) == 1
      val yMode = br.tree(KfYModeTree, KfYModeProb)
      val i4x4 = yMode == 4
      if (i4x4) {
        var i = 0
        while (i < 16) {
          val above = if (i < 4) aboveBModes(4 * mbX + i) else subModes(i - 4)
          val left = if ((i & 3) == 0) leftBModes(i >> 2) else subModes(i - 1)
          subModes(i) =
            br.treeB(BModeTree, BModeProbs, (above * 10 + left) * 9, 0)
          i += 1
        }
      } else {
        val m = ImpliedBMode(yMode)
        var i = 0
        while (i < 16) { subModes(i) = m; i += 1 }
      }
      val uvMode = br.tree(UvModeTree, KfUvModeProb)
      var i = 0
      while (i < 4) {
        aboveBModes(4 * mbX + i) = subModes(12 + i)
        leftBModes(i) = subModes(4 * i + 3)
        i += 1
      }

      java.util.Arrays.fill(coeffs, 0.toShort)
      var nonZeroY = 0
      var nonZeroUv = 0
      var y2Nz = false
      val a = aboveNz(mbX)
      if (!skipFlag) {
        val q = quants(seg)
        var first = 0
        if (!i4x4) { // Y2 block (24), plane type 1
          val ctx = leftNz(8) + a(8)
          val nz = decodeCoeffs(token, 24, 1, q(2), q(3), ctx, 0)
          leftNz(8) = if (nz) 1 else 0
          a(8) = leftNz(8)
          y2Nz = nz
          first = 1
          iwht(coeffs, 24 * 16)
          var k = 0
          while (k < 16) { // distribute the 16 luma DCs
            coeffs(k * 16) = coeffs(24 * 16 + k)
            k += 1
          }
        }
        val yType = if (i4x4) 3 else 0
        var sb = 0
        while (sb < 16) {
          val lx = sb & 3
          val ly = sb >> 2
          val ctx = (if (lx == 0) leftNz(ly) else nzY(sb - 1)) +
            (if (ly == 0) a(lx) else nzY(sb - 4))
          val nz = decodeCoeffs(token, sb, yType, q(0), q(1), ctx, first)
          nzY(sb) = if (nz) 1 else 0
          if (nz) nonZeroY |= 1 << sb
          sb += 1
        }
        var k = 0
        while (k < 4) {
          leftNz(k) = nzY(4 * k + 3)
          a(k) = nzY(12 + k)
          k += 1
        }
        var pl = 0
        while (pl < 2) {
          var cb = 0
          while (cb < 4) {
            val lx = cb & 1
            val ly = cb >> 1
            val ctx =
              (if (lx == 0) leftNz(4 + 2 * pl + ly) else nzC(4 * pl + 2 * ly)) +
              (if (ly == 0) a(4 + 2 * pl + lx) else nzC(4 * pl + lx))
            val nz = decodeCoeffs(token, 16 + 4 * pl + cb, 2, q(4), q(5),
              ctx, 0)
            nzC(4 * pl + 2 * ly + lx) = if (nz) 1 else 0
            if (nz) nonZeroUv |= 1 << (4 * pl + cb)
            cb += 1
          }
          leftNz(4 + 2 * pl) = nzC(4 * pl + 1)
          leftNz(4 + 2 * pl + 1) = nzC(4 * pl + 3)
          a(4 + 2 * pl) = nzC(4 * pl + 2)
          a(4 + 2 * pl + 1) = nzC(4 * pl + 3)
          pl += 1
        }
      } else {
        java.util.Arrays.fill(leftNz, 0, 8, 0)
        java.util.Arrays.fill(a, 0, 8, 0)
        if (!i4x4) { leftNz(8) = 0; a(8) = 0 } // Y2 quirk: i4x4 keeps it
      }

      reconstruct(mbX, mbY, yMode, uvMode, i4x4, nonZeroY, nonZeroUv,
        skipFlag)

      var level = if (segEnabled) {
        if (segAbsValues) segLf(seg) else filterLevel + segLf(seg)
      } else filterLevel
      if (lfDeltaEnabled) {
        level += refLfDelta(0) // keyframe: INTRA ref
        if (i4x4) level += modeLfDelta(0)
      }
      mbFilterLevel(mbY * mbW + mbX) =
        if (level < 0) 0 else if (level > 63) 63 else level
      // §15.1: interior edges are skipped when the MB decoded NO
      // nonzero coefficients — whether via the coded skip flag or an
      // all-EOB token read — unless prediction itself is blocky (4x4)
      mbFilterInner(mbY * mbW + mbX) =
        i4x4 || y2Nz || (nonZeroY | nonZeroUv) != 0
    }

    /** §13 token decode for one 4x4 block, writing DEQUANTIZED values
      * in scan order. Returns whether any coefficient is nonzero. */
    private def decodeCoeffs(token: Bool, block: Int, ptype: Int,
        dcQ: Int, acQ: Int, ctx0: Int, first: Int): Boolean = {
      val base = block * 16
      var n = first
      var ctx = ctx0
      var nonzero = false
      var startAt = 0 // 2 after a ZERO token: no EOB directly after 0
      while (n < 16) {
        val pOff = (ptype * 8 + Bands(n)) * 33 + ctx * 11
        val t = token.treeB(CoeffTree, probs, pOff, startAt)
        if (t == 11) return nonzero // EOB
        if (t == 0) {
          ctx = 0
          startAt = 2
          n += 1
        } else {
          var value =
            if (t <= 4) t
            else {
              val cp = CatProbs(t - 5)
              var extra = 0
              var k = 0
              while (k < cp.length) {
                extra = (extra << 1) | token.bit(cp(k))
                k += 1
              }
              CatBase(t - 5) + extra
            }
          ctx = if (value == 1) 1 else 2
          if (token.bit(128) == 1) value = -value
          coeffs(base + Zigzag(n)) =
            (value * (if (n == 0) dcQ else acQ)).toShort
          nonzero = true
          startAt = 0
          n += 1
        }
      }
      nonzero
    }

    // ---- §14.3 inverse WHT (Y2 -> 16 luma DCs) ----
    private def iwht(c: Array[Short], at: Int): Unit = {
      val tmp = new Array[Int](16)
      var i = 0
      while (i < 4) {
        val a1 = c(at + i) + c(at + 12 + i)
        val b1 = c(at + 4 + i) + c(at + 8 + i)
        val c1 = c(at + 4 + i) - c(at + 8 + i)
        val d1 = c(at + i) - c(at + 12 + i)
        tmp(i) = a1 + b1
        tmp(4 + i) = c1 + d1
        tmp(8 + i) = a1 - b1
        tmp(12 + i) = d1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val a1 = tmp(4 * i) + tmp(4 * i + 3)
        val b1 = tmp(4 * i + 1) + tmp(4 * i + 2)
        val c1 = tmp(4 * i + 1) - tmp(4 * i + 2)
        val d1 = tmp(4 * i) - tmp(4 * i + 3)
        c(at + 4 * i) = ((a1 + b1 + 3) >> 3).toShort
        c(at + 4 * i + 1) = ((c1 + d1 + 3) >> 3).toShort
        c(at + 4 * i + 2) = ((a1 - b1 + 3) >> 3).toShort
        c(at + 4 * i + 3) = ((d1 - c1 + 3) >> 3).toShort
        i += 1
      }
    }

    // ---- §14.4 4x4 IDCT (20091/35468 fixed point), added with clamp ----
    private def idctAdd(dst: Array[Byte], stride: Int, at: Int,
        cAt: Int): Unit = {
      val tmp = new Array[Int](16)
      var i = 0
      while (i < 4) {
        val a1 = coeffs(cAt + i) + coeffs(cAt + 8 + i)
        val b1 = coeffs(cAt + i) - coeffs(cAt + 8 + i)
        val c1 = ((coeffs(cAt + 4 + i) * 35468) >> 16) -
          (coeffs(cAt + 12 + i) + ((coeffs(cAt + 12 + i) * 20091) >> 16))
        val d1 = (coeffs(cAt + 4 + i) + ((coeffs(cAt + 4 + i) * 20091) >> 16)) +
          ((coeffs(cAt + 12 + i) * 35468) >> 16)
        tmp(i) = a1 + d1
        tmp(12 + i) = a1 - d1
        tmp(4 + i) = b1 + c1
        tmp(8 + i) = b1 - c1
        i += 1
      }
      i = 0
      while (i < 4) {
        val a1 = tmp(4 * i) + tmp(4 * i + 2)
        val b1 = tmp(4 * i) - tmp(4 * i + 2)
        val c1 = ((tmp(4 * i + 1) * 35468) >> 16) -
          (tmp(4 * i + 3) + ((tmp(4 * i + 3) * 20091) >> 16))
        val d1 = (tmp(4 * i + 1) + ((tmp(4 * i + 1) * 20091) >> 16)) +
          ((tmp(4 * i + 3) * 35468) >> 16)
        val row = at + i * stride
        add(dst, row, (a1 + d1 + 4) >> 3)
        add(dst, row + 1, (b1 + c1 + 4) >> 3)
        add(dst, row + 2, (b1 - c1 + 4) >> 3)
        add(dst, row + 3, (a1 - d1 + 4) >> 3)
        i += 1
      }
    }
    private def add(dst: Array[Byte], at: Int, v: Int): Unit = {
      val s = (dst(at) & 0xff) + v
      dst(at) = (if (s < 0) 0 else if (s > 255) 255 else s).toByte
    }
    private def dcOnlyAdd(dst: Array[Byte], stride: Int, at: Int,
        dc: Int): Unit = {
      val v = (dc + 4) >> 3
      var j = 0
      while (j < 4) {
        var i = 0
        while (i < 4) { add(dst, at + j * stride + i, v); i += 1 }
        j += 1
      }
    }
    /** IDCT-add with the DC-only shortcut (same arithmetic). */
    private def idctMaybe(dst: Array[Byte], stride: Int, at: Int,
        block: Int): Unit = {
      val base = block * 16
      var anyAc = false
      var k = 1
      while (!anyAc && k < 16) { anyAc = coeffs(base + k) != 0; k += 1 }
      if (!anyAc) {
        if (coeffs(base) != 0) dcOnlyAdd(dst, stride, at, coeffs(base))
      } else idctAdd(dst, stride, at, base)
    }

    // ---- §12 intra prediction + reconstruction -------------------------

    // scratch: rows -1..15, cols -1..19 for luma (stride 32); rows
    // -1..7, cols -1..7 for chroma (stride 16)
    private val yBuf = new Array[Byte](17 * 32)
    private val uBuf = new Array[Byte](9 * 16)
    private val vBuf = new Array[Byte](9 * 16)
    @inline private def yAt(x: Int, y: Int) = (y + 1) * 32 + (x + 1)
    @inline private def cAt(x: Int, y: Int) = (y + 1) * 16 + (x + 1)
    private var hasAbove = false
    private var hasLeft = false

    private def fillY(plane: Array[Byte], px: Int, py: Int): Unit = {
      if (!hasAbove) {
        var i = -1
        while (i < 20) { yBuf(yAt(i, -1)) = 127.toByte; i += 1 }
      } else {
        var i = 0
        while (i < 16) {
          yBuf(yAt(i, -1)) = plane((py - 1) * yStride + px + i)
          i += 1
        }
        yBuf(yAt(-1, -1)) =
          if (hasLeft) plane((py - 1) * yStride + px - 1) else 129.toByte
        // top-right 4 samples: next MB's top row, replicated at the
        // frame's right edge (the spec's stale-pixel source)
        if (px + 16 >= yStride) {
          val v = plane((py - 1) * yStride + px + 15)
          i = 0
          while (i < 4) { yBuf(yAt(16 + i, -1)) = v; i += 1 }
        } else {
          i = 0
          while (i < 4) {
            yBuf(yAt(16 + i, -1)) = plane((py - 1) * yStride + px + 16 + i)
            i += 1
          }
        }
      }
      if (!hasLeft) {
        var j = 0
        while (j < 16) { yBuf(yAt(-1, j)) = 129.toByte; j += 1 }
      } else {
        var j = 0
        while (j < 16) {
          yBuf(yAt(-1, j)) = plane((py + j) * yStride + px - 1)
          j += 1
        }
      }
    }

    private def fillC(buf: Array[Byte], plane: Array[Byte], px: Int,
        py: Int): Unit = {
      if (!hasAbove) {
        var i = -1
        while (i < 8) { buf(cAt(i, -1)) = 127.toByte; i += 1 }
      } else {
        var i = 0
        while (i < 8) {
          buf(cAt(i, -1)) = plane((py - 1) * uvStride + px + i)
          i += 1
        }
        buf(cAt(-1, -1)) =
          if (hasLeft) plane((py - 1) * uvStride + px - 1) else 129.toByte
      }
      if (!hasLeft) {
        var j = 0
        while (j < 8) { buf(cAt(-1, j)) = 129.toByte; j += 1 }
      } else {
        var j = 0
        while (j < 8) {
          buf(cAt(-1, j)) = plane((py + j) * uvStride + px - 1)
          j += 1
        }
      }
    }

    private def reconstruct(mbX: Int, mbY: Int, yMode: Int, uvMode: Int,
        i4x4: Boolean, nonZeroY: Int, nonZeroUv: Int,
        skipFlag: Boolean): Unit = {
      hasAbove = mbY > 0
      hasLeft = mbX > 0
      val px = mbX * 16
      val py = mbY * 16
      fillY(yPlane, px, py)
      if (!i4x4) {
        pred16(yMode)
        if (!skipFlag) {
          var sb = 0
          while (sb < 16) {
            idctMaybe(yBuf, 32, yAt((sb & 3) * 4, (sb >> 2) * 4), sb)
            sb += 1
          }
        }
      } else {
        var sb = 0
        while (sb < 16) {
          val bx = (sb & 3) * 4
          val by = (sb >> 2) * 4
          pred4(subModes(sb), bx, by)
          if ((nonZeroY & (1 << sb)) != 0)
            idctMaybe(yBuf, 32, yAt(bx, by), sb)
          sb += 1
        }
      }
      var j = 0
      while (j < 16) {
        System.arraycopy(yBuf, yAt(0, j), yPlane, (py + j) * yStride + px, 16)
        j += 1
      }
      val cx = mbX * 8
      val cy = mbY * 8
      fillC(uBuf, uPlane, cx, cy)
      fillC(vBuf, vPlane, cx, cy)
      predC(uBuf, uvMode)
      predC(vBuf, uvMode)
      if (!skipFlag) {
        var cb = 0
        while (cb < 8) {
          val buf = if (cb < 4) uBuf else vBuf
          val k = cb & 3
          idctMaybe(buf, 16, cAt((k & 1) * 4, (k >> 1) * 4), 16 + cb)
          cb += 1
        }
      }
      j = 0
      while (j < 8) {
        System.arraycopy(uBuf, cAt(0, j), uPlane, (cy + j) * uvStride + cx, 8)
        System.arraycopy(vBuf, cAt(0, j), vPlane, (cy + j) * uvStride + cx, 8)
        j += 1
      }
    }

    private def clamp255(v: Int): Byte =
      (if (v < 0) 0 else if (v > 255) 255 else v).toByte

    /** 16x16 luma prediction: 0 DC, 1 V, 2 H, 3 TM (§12.2). */
    private def pred16(mode: Int): Unit = mode match {
      case 0 =>
        var sum = 0
        var cnt = 0
        if (hasAbove) {
          var i = 0
          while (i < 16) { sum += yBuf(yAt(i, -1)) & 0xff; i += 1 }
          cnt += 16
        }
        if (hasLeft) {
          var j = 0
          while (j < 16) { sum += yBuf(yAt(-1, j)) & 0xff; j += 1 }
          cnt += 16
        }
        val dc = if (cnt == 0) 128 else (sum + (cnt >> 1)) / cnt
        var j = 0
        while (j < 16) {
          var i = 0
          while (i < 16) { yBuf(yAt(i, j)) = dc.toByte; i += 1 }
          j += 1
        }
      case 1 =>
        var j = 0
        while (j < 16) {
          System.arraycopy(yBuf, yAt(0, -1), yBuf, yAt(0, j), 16)
          j += 1
        }
      case 2 =>
        var j = 0
        while (j < 16) {
          val v = yBuf(yAt(-1, j))
          var i = 0
          while (i < 16) { yBuf(yAt(i, j)) = v; i += 1 }
          j += 1
        }
      case _ =>
        val tl = yBuf(yAt(-1, -1)) & 0xff
        var j = 0
        while (j < 16) {
          val l = (yBuf(yAt(-1, j)) & 0xff) - tl
          var i = 0
          while (i < 16) {
            yBuf(yAt(i, j)) = clamp255(l + (yBuf(yAt(i, -1)) & 0xff))
            i += 1
          }
          j += 1
        }
    }

    /** 8x8 chroma prediction, same four modes (§12.2). */
    private def predC(buf: Array[Byte], mode: Int): Unit = mode match {
      case 0 =>
        var sum = 0
        var cnt = 0
        if (hasAbove) {
          var i = 0
          while (i < 8) { sum += buf(cAt(i, -1)) & 0xff; i += 1 }
          cnt += 8
        }
        if (hasLeft) {
          var j = 0
          while (j < 8) { sum += buf(cAt(-1, j)) & 0xff; j += 1 }
          cnt += 8
        }
        val dc = if (cnt == 0) 128 else (sum + (cnt >> 1)) / cnt
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) { buf(cAt(i, j)) = dc.toByte; i += 1 }
          j += 1
        }
      case 1 =>
        var j = 0
        while (j < 8) {
          System.arraycopy(buf, cAt(0, -1), buf, cAt(0, j), 8)
          j += 1
        }
      case 2 =>
        var j = 0
        while (j < 8) {
          val v = buf(cAt(-1, j))
          var i = 0
          while (i < 8) { buf(cAt(i, j)) = v; i += 1 }
          j += 1
        }
      case _ =>
        val tl = buf(cAt(-1, -1)) & 0xff
        var j = 0
        while (j < 8) {
          val l = (buf(cAt(-1, j)) & 0xff) - tl
          var i = 0
          while (i < 8) {
            buf(cAt(i, j)) = clamp255(l + (buf(cAt(i, -1)) & 0xff))
            i += 1
          }
          j += 1
        }
    }

    /** 4x4 luma prediction (§12.3), reading reconstructed neighbors
      * from the scratch buffer. Right-column subblocks read the MB's
      * top-right samples for their above-right (the stale-pixel rule). */
    private def pred4(mode: Int, bx: Int, by: Int): Unit = {
      val A = new Array[Int](8)
      var i = 0
      while (i < 4) { A(i) = yBuf(yAt(bx + i, by - 1)) & 0xff; i += 1 }
      if (bx == 12) {
        i = 0
        while (i < 4) { A(4 + i) = yBuf(yAt(16 + i, -1)) & 0xff; i += 1 }
      } else {
        i = 0
        while (i < 4) {
          A(4 + i) = yBuf(yAt(bx + 4 + i, by - 1)) & 0xff
          i += 1
        }
      }
      val L = new Array[Int](4)
      i = 0
      while (i < 4) { L(i) = yBuf(yAt(bx - 1, by + i)) & 0xff; i += 1 }
      val X = yBuf(yAt(bx - 1, by - 1)) & 0xff
      @inline def set(x: Int, y: Int, v: Int): Unit =
        yBuf(yAt(bx + x, by + y)) = v.toByte
      @inline def avg3(a: Int, b: Int, c: Int) = (a + 2 * b + c + 2) >> 2
      @inline def avg2(a: Int, b: Int) = (a + b + 1) >> 1
      mode match {
        case 0 => // B_DC
          var sum = 4
          i = 0
          while (i < 4) { sum += A(i) + L(i); i += 1 }
          val dc = sum >> 3
          var j = 0
          while (j < 4) {
            i = 0
            while (i < 4) { set(i, j, dc); i += 1 }
            j += 1
          }
        case 1 => // B_TM
          var j = 0
          while (j < 4) {
            i = 0
            while (i < 4) {
              val v = L(j) + A(i) - X
              set(i, j, if (v < 0) 0 else if (v > 255) 255 else v)
              i += 1
            }
            j += 1
          }
        case 2 => // B_VE
          val v0 = avg3(X, A(0), A(1))
          val v1 = avg3(A(0), A(1), A(2))
          val v2 = avg3(A(1), A(2), A(3))
          val v3 = avg3(A(2), A(3), A(4))
          var j = 0
          while (j < 4) {
            set(0, j, v0); set(1, j, v1); set(2, j, v2); set(3, j, v3)
            j += 1
          }
        case 3 => // B_HE
          val h0 = avg3(X, L(0), L(1))
          val h1 = avg3(L(0), L(1), L(2))
          val h2 = avg3(L(1), L(2), L(3))
          val h3 = avg3(L(2), L(3), L(3))
          i = 0
          while (i < 4) {
            set(i, 0, h0); set(i, 1, h1); set(i, 2, h2); set(i, 3, h3)
            i += 1
          }
        case 4 => // B_LD (down-left)
          set(0, 0, avg3(A(0), A(1), A(2)))
          val v1 = avg3(A(1), A(2), A(3)); set(1, 0, v1); set(0, 1, v1)
          val v2 = avg3(A(2), A(3), A(4))
          set(2, 0, v2); set(1, 1, v2); set(0, 2, v2)
          val v3 = avg3(A(3), A(4), A(5))
          set(3, 0, v3); set(2, 1, v3); set(1, 2, v3); set(0, 3, v3)
          val v4 = avg3(A(4), A(5), A(6))
          set(3, 1, v4); set(2, 2, v4); set(1, 3, v4)
          val v5 = avg3(A(5), A(6), A(7)); set(3, 2, v5); set(2, 3, v5)
          set(3, 3, avg3(A(6), A(7), A(7)))
        case 5 => // B_RD (down-right)
          set(0, 3, avg3(L(1), L(2), L(3)))
          val v1 = avg3(L(0), L(1), L(2)); set(0, 2, v1); set(1, 3, v1)
          val v2 = avg3(X, L(0), L(1))
          set(0, 1, v2); set(1, 2, v2); set(2, 3, v2)
          val v3 = avg3(A(0), X, L(0))
          set(0, 0, v3); set(1, 1, v3); set(2, 2, v3); set(3, 3, v3)
          val v4 = avg3(A(1), A(0), X)
          set(1, 0, v4); set(2, 1, v4); set(3, 2, v4)
          val v5 = avg3(A(2), A(1), A(0)); set(2, 0, v5); set(3, 1, v5)
          set(3, 0, avg3(A(3), A(2), A(1)))
        case 6 => // B_VR (vertical-right)
          val v0 = avg2(X, A(0)); set(0, 0, v0); set(1, 2, v0)
          val v1 = avg2(A(0), A(1)); set(1, 0, v1); set(2, 2, v1)
          val v2 = avg2(A(1), A(2)); set(2, 0, v2); set(3, 2, v2)
          set(3, 0, avg2(A(2), A(3)))
          set(0, 3, avg3(L(2), L(1), L(0)))
          set(0, 2, avg3(L(1), L(0), X))
          val v3 = avg3(L(0), X, A(0)); set(0, 1, v3); set(1, 3, v3)
          val v4 = avg3(X, A(0), A(1)); set(1, 1, v4); set(2, 3, v4)
          val v5 = avg3(A(0), A(1), A(2)); set(2, 1, v5); set(3, 3, v5)
          set(3, 1, avg3(A(1), A(2), A(3)))
        case 7 => // B_VL (vertical-left)
          set(0, 0, avg2(A(0), A(1)))
          val v1 = avg2(A(1), A(2)); set(1, 0, v1); set(0, 2, v1)
          val v2 = avg2(A(2), A(3)); set(2, 0, v2); set(1, 2, v2)
          val v3 = avg2(A(3), A(4)); set(3, 0, v3); set(2, 2, v3)
          set(0, 1, avg3(A(0), A(1), A(2)))
          val v4 = avg3(A(1), A(2), A(3)); set(1, 1, v4); set(0, 3, v4)
          val v5 = avg3(A(2), A(3), A(4)); set(2, 1, v5); set(1, 3, v5)
          val v6 = avg3(A(3), A(4), A(5)); set(3, 1, v6); set(2, 3, v6)
          set(3, 2, avg3(A(4), A(5), A(6)))
          set(3, 3, avg3(A(5), A(6), A(7)))
        case 8 => // B_HD (horizontal-down)
          val v0 = avg2(L(0), X); set(0, 0, v0); set(2, 1, v0)
          val v1 = avg2(L(1), L(0)); set(0, 1, v1); set(2, 2, v1)
          val v2 = avg2(L(2), L(1)); set(0, 2, v2); set(2, 3, v2)
          set(0, 3, avg2(L(3), L(2)))
          set(3, 0, avg3(A(0), A(1), A(2)))
          set(2, 0, avg3(X, A(0), A(1)))
          val v3 = avg3(L(0), X, A(0)); set(1, 0, v3); set(3, 1, v3)
          val v4 = avg3(X, L(0), L(1)); set(1, 1, v4); set(3, 2, v4)
          val v5 = avg3(L(0), L(1), L(2)); set(1, 2, v5); set(3, 3, v5)
          set(1, 3, avg3(L(1), L(2), L(3)))
        case _ => // B_HU (horizontal-up)
          set(0, 0, avg2(L(0), L(1)))
          val v1 = avg2(L(1), L(2)); set(2, 0, v1); set(0, 1, v1)
          val v2 = avg2(L(2), L(3)); set(2, 1, v2); set(0, 2, v2)
          set(1, 0, avg3(L(0), L(1), L(2)))
          val v3 = avg3(L(1), L(2), L(3)); set(3, 0, v3); set(1, 1, v3)
          val v4 = avg3(L(2), L(3), L(3)); set(3, 1, v4); set(1, 2, v4)
          val l3 = L(3)
          set(2, 2, l3); set(3, 2, l3)
          set(0, 3, l3); set(1, 3, l3); set(2, 3, l3); set(3, 3, l3)
      }
    }

    // ---- §15 loop filter --------------------------------------------------

    private def loopFilter(): Unit = {
      var mbY = 0
      while (mbY < mbH) {
        var mbX = 0
        while (mbX < mbW) {
          val level = mbFilterLevel(mbY * mbW + mbX)
          if (level > 0) filterMb(mbX, mbY, level,
            mbFilterInner(mbY * mbW + mbX))
          mbX += 1
        }
        mbY += 1
      }
    }

    private def filterMb(mbX: Int, mbY: Int, level: Int,
        inner: Boolean): Unit = {
      var ilim = level
      if (sharpness > 0) {
        ilim >>= (if (sharpness > 4) 2 else 1)
        if (ilim > 9 - sharpness) ilim = 9 - sharpness
      }
      if (ilim < 1) ilim = 1
      val lim = 2 * level + ilim
      val hev = if (level >= 40) 2 else if (level >= 15) 1 else 0
      val px = mbX * 16
      val py = mbY * 16
      val cx = mbX * 8
      val cy = mbY * 8
      if (simpleFilter) {
        if (mbX > 0) simpleEdgeV(yPlane, yStride, px, py, 16, lim + 4)
        if (inner) {
          simpleEdgeV(yPlane, yStride, px + 4, py, 16, lim)
          simpleEdgeV(yPlane, yStride, px + 8, py, 16, lim)
          simpleEdgeV(yPlane, yStride, px + 12, py, 16, lim)
        }
        if (mbY > 0) simpleEdgeH(yPlane, yStride, px, py, 16, lim + 4)
        if (inner) {
          simpleEdgeH(yPlane, yStride, px, py + 4, 16, lim)
          simpleEdgeH(yPlane, yStride, px, py + 8, 16, lim)
          simpleEdgeH(yPlane, yStride, px, py + 12, 16, lim)
        }
      } else {
        def doLeft(): Unit = if (mbX > 0) {
          mbEdgeV(yPlane, yStride, px, py, 16, lim + 4, ilim, hev)
          mbEdgeV(uPlane, uvStride, cx, cy, 8, lim + 4, ilim, hev)
          mbEdgeV(vPlane, uvStride, cx, cy, 8, lim + 4, ilim, hev)
        }
        def doInnerV(): Unit = if (inner) {
          subEdgeV(yPlane, yStride, px + 4, py, 16, lim, ilim, hev)
          subEdgeV(yPlane, yStride, px + 8, py, 16, lim, ilim, hev)
          subEdgeV(yPlane, yStride, px + 12, py, 16, lim, ilim, hev)
          subEdgeV(uPlane, uvStride, cx + 4, cy, 8, lim, ilim, hev)
          subEdgeV(vPlane, uvStride, cx + 4, cy, 8, lim, ilim, hev)
        }
        def doTop(): Unit = if (mbY > 0) {
          mbEdgeH(yPlane, yStride, px, py, 16, lim + 4, ilim, hev)
          mbEdgeH(uPlane, uvStride, cx, cy, 8, lim + 4, ilim, hev)
          mbEdgeH(vPlane, uvStride, cx, cy, 8, lim + 4, ilim, hev)
        }
        def doInnerH(): Unit = if (inner) {
          subEdgeH(yPlane, yStride, px, py + 4, 16, lim, ilim, hev)
          subEdgeH(yPlane, yStride, px, py + 8, 16, lim, ilim, hev)
          subEdgeH(yPlane, yStride, px, py + 12, 16, lim, ilim, hev)
          subEdgeH(uPlane, uvStride, cx, cy + 4, 8, lim, ilim, hev)
          subEdgeH(vPlane, uvStride, cx, cy + 4, 8, lim, ilim, hev)
        }
        // reference order: left MB edge, inner vertical, top MB
        // edge, inner horizontal — the edges share pixels, so order
        // is observable and pinned by the fixtures
        doLeft(); doInnerV(); doTop(); doInnerH()
      }
    }

    @inline private def sclip(v: Int): Int =
      if (v < -128) -128 else if (v > 127) 127 else v
    @inline private def u2s(p: Array[Byte], at: Int): Int = (p(at) & 0xff) - 128
    @inline private def s2u(p: Array[Byte], at: Int, v: Int): Unit =
      p(at) = (sclip(v) + 128).toByte

    /** §15.2 filter_mask over p3..q3 at pitch `s`. */
    private def mask(p: Array[Byte], at: Int, s: Int, E: Int,
        I: Int): Boolean = {
      def ab(x: Int) = if (x < 0) -x else x
      val p3 = p(at - 4 * s) & 0xff; val p2 = p(at - 3 * s) & 0xff
      val p1 = p(at - 2 * s) & 0xff; val p0 = p(at - s) & 0xff
      val q0 = p(at) & 0xff; val q1 = p(at + s) & 0xff
      val q2 = p(at + 2 * s) & 0xff; val q3 = p(at + 3 * s) & 0xff
      ab(p0 - q0) * 2 + ab(p1 - q1) / 2 <= E &&
        ab(p3 - p2) <= I && ab(p2 - p1) <= I && ab(p1 - p0) <= I &&
        ab(q3 - q2) <= I && ab(q2 - q1) <= I && ab(q1 - q0) <= I
    }
    private def hevp(p: Array[Byte], at: Int, s: Int, t: Int): Boolean = {
      def ab(x: Int) = if (x < 0) -x else x
      ab((p(at - 2 * s) & 0xff) - (p(at - s) & 0xff)) > t ||
        ab((p(at + s) & 0xff) - (p(at) & 0xff)) > t
    }
    /** §15.3 common_adjust; returns the F applied to q0. */
    private def adjust(p: Array[Byte], at: Int, s: Int,
        outer: Boolean): Int = {
      val p1 = u2s(p, at - 2 * s); val p0 = u2s(p, at - s)
      val q0 = u2s(p, at); val q1 = u2s(p, at + s)
      val a = sclip((if (outer) sclip(p1 - q1) else 0) + 3 * (q0 - p0))
      val f1 = sclip(a + 4) >> 3
      val f2 = sclip(a + 3) >> 3
      s2u(p, at, q0 - f1)
      s2u(p, at - s, p0 + f2)
      f1
    }
    private def simpleSeg(p: Array[Byte], at: Int, s: Int, E: Int): Unit = {
      def ab(x: Int) = if (x < 0) -x else x
      val p1 = p(at - 2 * s) & 0xff; val p0 = p(at - s) & 0xff
      val q0 = p(at) & 0xff; val q1 = p(at + s) & 0xff
      if (ab(p0 - q0) * 2 + ab(p1 - q1) / 2 <= E) adjust(p, at, s, outer = true)
    }
    private def subSeg(p: Array[Byte], at: Int, s: Int, E: Int, I: Int,
        H: Int): Unit = {
      if (mask(p, at, s, E, I)) {
        val hv = hevp(p, at, s, H)
        val f = adjust(p, at, s, outer = hv)
        if (!hv) {
          val a = (f + 1) >> 1
          s2u(p, at + s, u2s(p, at + s) - a)
          s2u(p, at - 2 * s, u2s(p, at - 2 * s) + a)
        }
      }
    }
    private def mbSeg(p: Array[Byte], at: Int, s: Int, E: Int, I: Int,
        H: Int): Unit = {
      if (mask(p, at, s, E, I)) {
        if (!hevp(p, at, s, H)) {
          val p2 = u2s(p, at - 3 * s); val p1 = u2s(p, at - 2 * s)
          val p0 = u2s(p, at - s); val q0 = u2s(p, at)
          val q1 = u2s(p, at + s); val q2 = u2s(p, at + 2 * s)
          val w = sclip(sclip(p1 - q1) + 3 * (q0 - p0))
          var a = (27 * w + 63) >> 7
          a = sclip(a)
          s2u(p, at, q0 - a)
          s2u(p, at - s, p0 + a)
          a = sclip((18 * w + 63) >> 7)
          s2u(p, at + s, q1 - a)
          s2u(p, at - 2 * s, p1 + a)
          a = sclip((9 * w + 63) >> 7)
          s2u(p, at + 2 * s, q2 - a)
          s2u(p, at - 3 * s, p2 + a)
        } else adjust(p, at, s, outer = true)
      }
    }

    // edge walkers: V = vertical edge at column x (pitch 1), H =
    // horizontal edge at row y (pitch = stride)
    private def simpleEdgeV(p: Array[Byte], stride: Int, x: Int, y: Int,
        n: Int, E: Int): Unit = {
      var j = 0
      while (j < n) { simpleSeg(p, (y + j) * stride + x, 1, E); j += 1 }
    }
    private def simpleEdgeH(p: Array[Byte], stride: Int, x: Int, y: Int,
        n: Int, E: Int): Unit = {
      var i = 0
      while (i < n) { simpleSeg(p, y * stride + x + i, stride, E); i += 1 }
    }
    private def subEdgeV(p: Array[Byte], stride: Int, x: Int, y: Int,
        n: Int, E: Int, I: Int, H: Int): Unit = {
      var j = 0
      while (j < n) { subSeg(p, (y + j) * stride + x, 1, E, I, H); j += 1 }
    }
    private def subEdgeH(p: Array[Byte], stride: Int, x: Int, y: Int,
        n: Int, E: Int, I: Int, H: Int): Unit = {
      var i = 0
      while (i < n) { subSeg(p, y * stride + x + i, stride, E, I, H); i += 1 }
    }
    private def mbEdgeV(p: Array[Byte], stride: Int, x: Int, y: Int,
        n: Int, E: Int, I: Int, H: Int): Unit = {
      var j = 0
      while (j < n) { mbSeg(p, (y + j) * stride + x, 1, E, I, H); j += 1 }
    }
    private def mbEdgeH(p: Array[Byte], stride: Int, x: Int, y: Int,
        n: Int, E: Int, I: Int, H: Int): Unit = {
      var i = 0
      while (i < n) { mbSeg(p, y * stride + x + i, stride, E, I, H); i += 1 }
    }

    // ---- crop to the visible frame ----
    private def crop(): Yuv = {
      val cw = (width + 1) >> 1
      val ch = (height + 1) >> 1
      val y = new Array[Byte](width * height)
      val u = new Array[Byte](cw * ch)
      val v = new Array[Byte](cw * ch)
      var j = 0
      while (j < height) {
        System.arraycopy(yPlane, j * yStride, y, j * width, width)
        j += 1
      }
      j = 0
      while (j < ch) {
        System.arraycopy(uPlane, j * uvStride, u, j * cw, cw)
        System.arraycopy(vPlane, j * uvStride, v, j * cw, cw)
        j += 1
      }
      Yuv(width, height, y, u, v)
    }
  }
}
