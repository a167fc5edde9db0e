package graft.multimodal

/** WebP lossless (VP8L) still-image decoder — pure integer Scala
  * implementing the PUBLIC WebP Lossless Bitstream Specification
  * (RFC 9649), the same pinned-arithmetic discipline as
  * [[JpegDecode]]. VP8L is exact by construction (prefix coding +
  * integer transforms, no floats anywhere), so a conforming decoder
  * is bit-deterministic; WebpDecodeSpec proves this one
  * independent-encoder-exact against rasters encoded by the system
  * libwebp (the format's reference implementation).
  *
  * Surface: the RIFF container ("WEBP" form), both the simple layout
  * (a bare "VP8L" or "VP8 " chunk) and the extended layout ("VP8X"
  * followed by the stream chunk). Lossy VP8 keyframes route to
  * [[Vp8Decode]] (RFC 6386, integer-exact) with the reference
  * point-sampling YUV->RGB conversion.
  *
  * Stream features implemented in full: LSB-first bit reading;
  * simple (1/2-symbol) and DEFLATE-style canonical prefix codes with
  * the code-length code (symbols 16/17/18, the optional max-symbol
  * limit field); meta-prefix (entropy-image) code selection; color
  * cache; LZ77 backward references with the 40-symbol prefix coding
  * and the 120-entry short-distance plane-code mapping; and all four
  * transforms — predictor (14 modes), cross-color, subtract-green,
  * and color-indexing with sub-byte pixel bundling — inverted in
  * reverse stream order. Reference behavior anchors (beyond the RFC
  * text) follow the reference implementation's documented semantics:
  * truncating /2 in ClampAddSubtractHalf, arithmetic >>5 in the
  * cross-color delta, canonical (symbol-sorted) code assignment for
  * 2-symbol simple codes, and cache insertion on literals AND copied
  * pixels.
  *
  * Corpus safety: any structural violation (over/under-subscribed
  * prefix code, out-of-range cache index, reference before start,
  * oversized repeat, truncated stream) aborts to None — callers map
  * it to the `unknown` row; a declared pixel count above `maxPixels`
  * returns None before allocating (decompression-bomb guard).
  */
object WebpDecode {

  final case class Result(width: Int, height: Int, pixels: Array[Int])

  /** Stateless sentinel — malformed stream, caught at the API edge. */
  private object Bail extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(): Nothing = throw Bail

  // ------------------------------------------------------------ container

  /** RIFF walk: a "VP8L" chunk decodes losslessly here; a lossy
    * "VP8 " chunk routes to [[Vp8Decode]] (RFC 6386 keyframe) with
    * the YUV planes converted by [[Vp8Decode.toArgb]]'s
    * reference-exact point-sampling path ("VP8X" metadata is
    * skipped). */
  def decode(b: Array[Byte], maxPixels: Long): Option[Result] = {
    try {
      if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
          b(3) != 'F' || b(8) != 'W' || b(9) != 'E' || b(10) != 'B' ||
          b(11) != 'P') return None
      decodeChunks(b, 12, b.length, maxPixels)
    } catch { case _: Exception => None }
  }

  /** Walk RIFF sub-chunks in [from, to): visit(tagOff, payloadOff,
    * len) per chunk until it returns false (early stop — reported as
    * true). Returns false only on malformed framing (negative or
    * overflowing length). The word-alignment padding rule lives here,
    * once, for every WebP chunk walker. */
  private[multimodal] def riffWalk(b: Array[Byte], from: Int, to: Int)(
      visit: (Int, Int, Int) => Boolean): Boolean = {
    var i = from
    while (i + 8 <= to) {
      val len = (b(i + 4) & 0xff) | ((b(i + 5) & 0xff) << 8) |
        ((b(i + 6) & 0xff) << 16) | ((b(i + 7) & 0xff) << 24)
      if (len < 0 || i + 8 + len > to) return false
      if (!visit(i, i + 8, len)) return true
      i += 8 + len + (len & 1)
    }
    true
  }

  private[multimodal] def tagIs(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** Decode a chunk list — the container body after "WEBP", or an
    * ANMF animation frame's sub-chunk data (same grammar: optional
    * ALPH preceding a VP8/VP8L bitstream chunk). */
  private[multimodal] def decodeChunks(b: Array[Byte], from: Int, to: Int,
      maxPixels: Long): Option[Result] = {
    try {
      var alphOff = -1
      var alphLen = -1
      var result: Option[Result] = None
      riffWalk(b, from, to) { (tag, off, len) =>
        if (tagIs(b, tag, "VP8L")) {
          result = decodeVp8l(b, off, len, maxPixels)
          false
        } else if (tagIs(b, tag, "ALPH")) {
          alphOff = off; alphLen = len; true
        } else if (tagIs(b, tag, "ANMF") && len >= 16) {
          // animation: the image decode of an animated WebP is its
          // first frame (the GIF symmetry); all frames via video_frame
          result = decodeChunks(b, off + 16, off + len, maxPixels)
          false
        } else if (tagIs(b, tag, "VP8 ")) {
          result = Vp8Decode.decode(b, off, len, maxPixels).flatMap { yuv =>
            val px = Vp8Decode.toArgb(yuv)
            if (alphOff < 0) Some(Result(yuv.width, yuv.height, px))
            else decodeAlpha(b, alphOff, alphLen, yuv.width, yuv.height,
              maxPixels).map { a =>
              var k = 0
              while (k < px.length) {
                px(k) = (px(k) & 0xffffff) | ((a(k) & 0xff) << 24)
                k += 1
              }
              Result(yuv.width, yuv.height, px)
            }
          }
          false
        } else true
      }
      result
    } catch { case _: Exception => None }
  }

  /** ALPH chunk (the extended-container alpha plane for lossy VP8):
    * 1 header byte — compression method in bits 0-1 (0 raw, 1 a
    * HEADERLESS VP8L stream with alpha in the green channel),
    * filtering method in bits 2-3 (none/horizontal/vertical/gradient,
    * inverted row-wise after decompression with the reference's
    * column-0 fallbacks), pre-processing in bits 4-5. Pre-processed
    * (level-reduced) planes are produced only by alpha_quality < 100
    * encodes and require the reference's smoothing reconstruction —
    * mapped to None rather than decoded approximately. */
  private def decodeAlpha(b: Array[Byte], off: Int, len: Int, w: Int,
      h: Int, maxPixels: Long): Option[Array[Byte]] = {
    if (len < 1) return None
    val hdr = b(off) & 0xff
    if ((hdr & 0xc0) != 0) return None // reserved bits
    if (((hdr >> 4) & 3) != 0) return None // pre-processed: see header
    val method = hdr & 3
    val filter = (hdr >> 2) & 3
    val a: Array[Byte] = method match {
      case 0 =>
        if (len - 1 < w * h) return None
        java.util.Arrays.copyOfRange(b, off + 1, off + 1 + w * h)
      case 1 =>
        val px =
          try decodeImageStream(w, h, isLevel0 = true,
            new BitReader(b, off + 1, off + len), maxPixels)
          catch { case _: Exception => return None }
        if (px.length != w * h) return None
        val out = new Array[Byte](w * h)
        var k = 0
        while (k < out.length) { out(k) = (px(k) >> 8).toByte; k += 1 }
        out
      case _ => return None
    }
    if (filter > 0) unfilterAlpha(a, w, h, filter)
    Some(a)
  }

  /** Invert the ALPH row filters in place. Column-0 semantics follow
    * the reference: horizontal predicts from ABOVE on rows > 0;
    * vertical and gradient treat row 0 as horizontal. */
  private def unfilterAlpha(a: Array[Byte], w: Int, h: Int,
      f: Int): Unit = {
    @inline def grad(l: Int, t: Int, tl: Int): Int = {
      val v = l + t - tl
      if (v < 0) 0 else if (v > 255) 255 else v
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (y == 0) { if (x == 0) 0 else a((y * w + x - 1)) & 0xff }
          else if (f == 1) {
            if (x == 0) a((y - 1) * w) & 0xff else a(y * w + x - 1) & 0xff
          } else if (f == 2) a((y - 1) * w + x) & 0xff
          else { // gradient
            val l = if (x == 0) 0 else a(y * w + x - 1) & 0xff
            val tl = if (x == 0) 0 else a((y - 1) * w + x - 1) & 0xff
            grad(l, a((y - 1) * w + x) & 0xff, tl)
          }
        a(y * w + x) = ((a(y * w + x) & 0xff) + pred).toByte
        x += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------------ bit reader

  /** LSB-first bit reader over [start, end) — bit k of the stream is
    * bit (k % 8) of byte (k / 8), exactly the VP8L convention.
    * Buffered: `peek` exposes the next (up to 24) bits from a 32-bit
    * little-endian window without consuming — the table-decode hot
    * path — zero-filled past the end of the stream; `skip`/`bits`
    * bail once consumption passes the end. */
  private final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var bitPos = 0L
    private val totalBits = (end - start).toLong * 8

    def peek(n: Int): Int = {
      val byteIdx = start + (bitPos >> 3).toInt
      val sh = (bitPos & 7).toInt
      var word = 0L
      var k = 0
      while (k < 4) {
        val idx = byteIdx + k
        if (idx < end) word |= (b(idx) & 0xffL) << (8 * k)
        k += 1
      }
      ((word >>> sh) & ((1L << n) - 1)).toInt
    }

    def skip(n: Int): Unit = {
      bitPos += n
      if (bitPos > totalBits) bail()
    }

    def bits(n: Int): Int = {
      val v = peek(n)
      skip(n)
      v
    }
  }

  // ------------------------------------------------------------ prefix code

  /** Canonical prefix code (DEFLATE-style assignment: shorter codes
    * first, ties broken by symbol order). `single >= 0` marks the
    * 0-bit one-symbol degenerate code. Decode is a two-level lookup
    * table over bit-REVERSED codes (the zlib/libwebp construction:
    * stream bits arrive LSB-first, codes read MSB-first, so the table
    * indexes on reversed codes filled at every suffix): an 8-bit root
    * resolves codes up to 8 bits in one probe; longer codes (≤ 15)
    * resolve through a per-prefix sub-table sized to the group's
    * deepest code. Entries pack (length << 16) | symbol; root entries
    * for long-code prefixes are negative (base << 4 | subBits). */
  private final class Prefix(lengths: Array[Int], singleSym: Int = -1) {
    var single: Int = singleSym
    private val RootBits = 8
    private var root: Array[Int] = null
    private var sub: Array[Int] = null

    locally { if (singleSym < 0) {
      val count = new Array[Int](16)
      var n = 0
      var onlySym = -1
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l < 0 || l > 15) bail()
        if (l > 0) { count(l) += 1; n += 1; onlySym = i }
        i += 1
      }
      if (n == 0) bail()
      if (n == 1) single = onlySym
      else {
        // Kraft: the code must be exactly complete (reference
        // implementation rejects over- and under-subscribed codes)
        var left = 1L
        var l = 1
        while (l <= 15) { left = (left << 1) - count(l); if (left < 0) bail(); l += 1 }
        if (left != 0) bail()
        // canonical first-code per length
        val first = new Array[Int](16)
        var code = 0
        l = 1
        while (l <= 15) { first(l) = code; code = (code + count(l)) << 1; l += 1 }
        val next = first.clone()
        root = new Array[Int](1 << RootBits)
        // pass 1: size the sub-tables (deepest code per root prefix)
        val subBits = new Array[Int](1 << RootBits)
        i = 0
        while (i < lengths.length) {
          val len = lengths(i)
          if (len > RootBits) {
            val c = next(len); next(len) += 1
            val r = Integer.reverse(c) >>> (32 - len)
            val idx = r & ((1 << RootBits) - 1)
            if (len - RootBits > subBits(idx)) subBits(idx) = len - RootBits
          } else if (len > 0) next(len) += 1
          i += 1
        }
        var subTotal = 0
        i = 0
        while (i < root.length) {
          if (subBits(i) > 0) {
            root(i) = -((subTotal << 4) | subBits(i))
            subTotal += 1 << subBits(i)
          }
          i += 1
        }
        sub = if (subTotal > 0) new Array[Int](subTotal) else null
        // pass 2: fill every suffix of every reversed code
        System.arraycopy(first, 0, next, 0, 16)
        i = 0
        while (i < lengths.length) {
          val len = lengths(i)
          if (len > 0) {
            val c = next(len); next(len) += 1
            val r = Integer.reverse(c) >>> (32 - len)
            val entry = (len << 16) | i
            if (len <= RootBits) {
              var m = r
              while (m < root.length) { root(m) = entry; m += 1 << len }
            } else {
              val idx = r & ((1 << RootBits) - 1)
              val e = -root(idx)
              val base = e >>> 4
              val gBits = e & 0xf
              var m = r >>> RootBits
              while (m < (1 << gBits)) { sub(base + m) = entry; m += 1 << (len - RootBits) }
            }
          }
          i += 1
        }
      }
    } }

    def read(br: BitReader): Int = {
      if (single >= 0) return single
      val v = br.peek(15)
      var e = root(v & ((1 << RootBits) - 1))
      if (e < 0) {
        val gBits = (-e) & 0xf
        val base = (-e) >>> 4
        e = sub(base + ((v >>> RootBits) & ((1 << gBits) - 1)))
      }
      if (e <= 0) bail()
      br.skip(e >>> 16)
      e & 0xffff
    }
  }

  private def singlePrefix(sym: Int): Prefix =
    new Prefix(null, singleSym = sym) // 0-bit code: no tables built

  /** RFC 9649: the order code-length-code lengths are transmitted in. */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code: the "simple" (1-2 explicit symbols) form or the
    * code-length-coded form with optional max-symbol limit. */
  private def readPrefixCode(alphabet: Int, br: BitReader): Prefix = {
    if (br.bits(1) == 1) { // simple
      val nSym = br.bits(1) + 1
      val s0 = if (br.bits(1) == 1) br.bits(8) else br.bits(1)
      if (s0 >= alphabet) bail()
      if (nSym == 1) return singlePrefix(s0)
      val s1 = br.bits(8)
      if (s1 >= alphabet || s0 == s1) bail()
      val lens = new Array[Int](alphabet)
      lens(s0) = 1; lens(s1) = 1
      new Prefix(lens)
    } else {
      val numCl = 4 + br.bits(4)
      if (numCl > 19) bail()
      val clLens = new Array[Int](19)
      var k = 0
      while (k < numCl) { clLens(ClOrder(k)) = br.bits(3); k += 1 }
      val clTree = new Prefix(clLens)
      var budget = alphabet // how many length reads are allowed
      if (br.bits(1) == 1) {
        val lenNBits = 2 + 2 * br.bits(3)
        budget = 2 + br.bits(lenNBits)
        if (budget > alphabet) bail()
      }
      val lens = new Array[Int](alphabet)
      var prev = 8 // reference default before any nonzero length
      var sym = 0
      var done = false
      while (sym < alphabet && !done) {
        if (budget == 0) done = true
        else {
          budget -= 1
          val cl = clTree.read(br)
          if (cl < 16) {
            lens(sym) = cl; sym += 1
            if (cl != 0) prev = cl
          } else {
            var repeat = 0
            var v = 0
            if (cl == 16) { repeat = 3 + br.bits(2); v = prev }
            else if (cl == 17) repeat = 3 + br.bits(3)
            else repeat = 11 + br.bits(7)
            if (sym + repeat > alphabet) bail()
            var j = 0
            while (j < repeat) { lens(sym) = v; sym += 1; j += 1 }
          }
        }
      }
      new Prefix(lens)
    }
  }

  // ------------------------------------------------------------ LZ77 tables

  /** The 120 short-distance plane codes, packed (dy << 4) | (8 - dx)
    * per RFC 9649 §5.2.2 — dx > 0 points LEFT of the current pixel;
    * dist = dy * xsize + dx, floored at 1. */
  private val CodeToPlane: Array[Byte] = Array[Int](
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
    0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e, 0x00, 0x74, 0x7c, 0x41,
    0x4f, 0x10, 0x20, 0x62, 0x6e, 0x30, 0x73, 0x7d, 0x51, 0x5f,
    0x40, 0x72, 0x7e, 0x61, 0x6f, 0x50, 0x71, 0x7f, 0x60, 0x70
  ).map(_.toByte)

  private def planeCodeToDistance(xsize: Int, code: Int): Int = {
    if (code > 120) code - 120
    else {
      val packed = CodeToPlane(code - 1) & 0xff
      val dy = packed >>> 4
      val dx = 8 - (packed & 0xf)
      val d = dy * xsize + dx
      if (d >= 1) d else 1
    }
  }

  /** Length/distance prefix value: 24 length codes, 40 distance codes
    * share the shape — small codes literal, larger split into
    * (offset << extra) + extra bits. */
  private def prefixValue(code: Int, br: BitReader): Int = {
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }
  }

  // ------------------------------------------------------------ transforms

  private final class Xform(val kind: Int, val bits: Int,
      val xsize: Int, val data: Array[Int])

  private def subSampleSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  // ------------------------------------------------------------ main decode

  private def decodeVp8l(b: Array[Byte], off: Int, len: Int,
      maxPixels: Long): Option[Result] = {
    if (len < 5 || (b(off) & 0xff) != 0x2f) return None
    val br = new BitReader(b, off + 1, off + len)
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    br.bits(1) // alpha hint
    if (br.bits(3) != 0) return None // version must be 0
    if (w.toLong * h > maxPixels) return None
    try {
      val pixels = decodeImageStream(w, h, isLevel0 = true, br, maxPixels)
      if (pixels.length != w * h) return None
      Some(Result(w, h, pixels))
    } catch { case _: Exception => None }
  }

  /** One entropy-coded image stream: optional transforms (main image
    * only), optional color cache, optional meta-prefix selection,
    * LZ77+prefix pixel data — and, for the main image, the inverse
    * transforms applied in reverse stream order. */
  private def decodeImageStream(xsize0: Int, ysize: Int, isLevel0: Boolean,
      br: BitReader, maxPixels: Long): Array[Int] = {
    var xsize = xsize0
    var transforms: List[Xform] = Nil
    var seen = 0
    if (isLevel0) {
      while (br.bits(1) == 1) {
        val kind = br.bits(2)
        if ((seen & (1 << kind)) != 0) bail() // each type at most once
        seen |= 1 << kind
        kind match {
          case 0 | 1 => // predictor / cross-color: per-block sub-image
            val bits = br.bits(3) + 2
            val data = decodeImageStream(subSampleSize(xsize, bits),
              subSampleSize(ysize, bits), isLevel0 = false, br, maxPixels)
            transforms ::= new Xform(kind, bits, xsize, data)
          case 2 => // subtract-green
            transforms ::= new Xform(2, 0, xsize, null)
          case 3 => // color indexing: delta-coded palette, maybe packed
            val nColors = br.bits(8) + 1
            val raw = decodeImageStream(nColors, 1, isLevel0 = false, br,
              maxPixels)
            var i = 1
            while (i < nColors) { raw(i) = addPixels(raw(i), raw(i - 1)); i += 1 }
            val packBits =
              if (nColors <= 2) 3 else if (nColors <= 4) 2
              else if (nColors <= 16) 1 else 0
            // zero-filled to the full index range so out-of-palette
            // indices decode deterministically (transparent black)
            val map = new Array[Int](1 << (8 >> packBits))
            System.arraycopy(raw, 0, map, 0, nColors)
            transforms ::= new Xform(3, packBits, xsize, map)
            xsize = subSampleSize(xsize, packBits)
          case _ => bail()
        }
      }
    }

    // color cache
    var cacheBits = 0
    if (br.bits(1) == 1) {
      cacheBits = br.bits(4)
      if (cacheBits < 1 || cacheBits > 11) bail()
    }
    val cache = if (cacheBits > 0) new Array[Int](1 << cacheBits) else null

    // meta-prefix selection (main image only)
    var metaImage: Array[Int] = null
    var metaBits = 0
    var metaXsize = 0
    var nGroups = 1
    if (isLevel0 && br.bits(1) == 1) {
      metaBits = br.bits(3) + 2
      metaXsize = subSampleSize(xsize, metaBits)
      metaImage = decodeImageStream(metaXsize,
        subSampleSize(ysize, metaBits), isLevel0 = false, br, maxPixels)
      var i = 0
      while (i < metaImage.length) {
        val code = (metaImage(i) >> 8) & 0xffff // (red << 8) | green
        metaImage(i) = code
        if (code + 1 > nGroups) nGroups = code + 1
        i += 1
      }
      // allocation bomb guard: a legitimate encoder references at most
      // one distinct group per entropy-image cell, while the raw
      // 16-bit meta code could demand 65536 eagerly-built 5-code
      // groups from a tiny stream — reject codes beyond the cell count
      if (nGroups > metaImage.length) bail()
    }

    // prefix-code groups: 5 codes each
    val greenAlpha = 256 + 24 + (if (cache != null) cache.length else 0)
    val groups = new Array[Array[Prefix]](nGroups)
    var g = 0
    while (g < nGroups) {
      groups(g) = Array(
        readPrefixCode(greenAlpha, br), readPrefixCode(256, br),
        readPrefixCode(256, br), readPrefixCode(256, br),
        readPrefixCode(40, br))
      g += 1
    }

    // pixel data
    val n = xsize * ysize
    val out = new Array[Int](n)
    var pos = 0
    var group = groups(0)
    var lastMetaIdx = -1
    while (pos < n) {
      if (metaImage != null) {
        val x = pos % xsize
        val y = pos / xsize
        val mi = (y >> metaBits) * metaXsize + (x >> metaBits)
        if (mi != lastMetaIdx) { group = groups(metaImage(mi)); lastMetaIdx = mi }
      }
      val s = group(0).read(br)
      if (s < 256) { // literal: G then R, B, A from their own codes
        val red = group(1).read(br)
        val blue = group(2).read(br)
        val alpha = group(3).read(br)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = px
        if (cache != null)
          cache((0x1e35a7bd * px) >>> (32 - cacheBits)) = px
        pos += 1
      } else if (s < 256 + 24) { // LZ77 backward reference
        val length = prefixValue(s - 256, br)
        val distCode = prefixValue(group(4).read(br), br)
        val dist = planeCodeToDistance(xsize, distCode)
        if (dist > pos || pos + length > n) bail()
        var j = 0
        while (j < length) {
          val px = out(pos - dist)
          out(pos) = px
          if (cache != null)
            cache((0x1e35a7bd * px) >>> (32 - cacheBits)) = px
          pos += 1
          j += 1
        }
        lastMetaIdx = -1 // x moved: force group re-lookup
      } else { // color-cache reference
        val idx = s - 256 - 24
        if (cache == null || idx >= cache.length) bail()
        out(pos) = cache(idx)
        pos += 1
      }
    }

    // inverse transforms, reverse stream order (list is already
    // reversed by prepending)
    var img = out
    var wNow = xsize
    var ts = transforms
    while (ts.nonEmpty) {
      val t = ts.head
      ts = ts.tail
      t.kind match {
        case 0 => predictorInverse(img, t.xsize, ysize, t.bits, t.data)
        case 1 => colorInverse(img, t.xsize, ysize, t.bits, t.data)
        case 2 => subtractGreenInverse(img)
        case 3 =>
          img = colorIndexInverse(img, wNow, ysize, t.xsize, t.bits, t.data)
      }
      wNow = t.xsize
    }
    img
  }

  // ------------------------------------------------------------ pixel math

  /** Per-channel modular add (the transform residual composition). */
  private def addPixels(a: Int, b: Int): Int = {
    // SWAR: mask alternate channels so per-channel carries can't cross
    val ag = (a & 0xff00ff00) >>> 8
    val bg = (b & 0xff00ff00) >>> 8
    val rb = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
    (((ag + bg) & 0x00ff00ff) << 8) | rb
  }

  private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, s: Int) = (p >>> s) & 0xff
    var pL = 0
    var pT = 0
    var s = 0
    while (s < 32) {
      val pred = ch(l, s) + ch(t, s) - ch(tl, s)
      pL += math.abs(pred - ch(l, s))
      pT += math.abs(pred - ch(t, s))
      s += 8
    }
    if (pL < pT) l else t
  }

  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, s: Int) = (p >>> s) & 0xff
    var out = 0
    var s = 0
    while (s < 32) {
      out |= clamp255(ch(l, s) + ch(t, s) - ch(tl, s)) << s
      s += 8
    }
    out
  }

  private def clampAddSubHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    def ch(p: Int, s: Int) = (p >>> s) & 0xff
    var out = 0
    var s = 0
    while (s < 32) {
      val a = ch(ave, s)
      // truncating /2, not >>1: negative (a - tl) rounds toward zero
      out |= clamp255(a + (a - ch(tl, s)) / 2) << s
      s += 8
    }
    out
  }

  /** Inverse predictor transform (14 modes; top row uses L, left
    * column uses T, origin is opaque black; TR of the rightmost
    * column wraps to the current row's first pixel — exactly the flat
    * (y-1)*w + x + 1 index). */
  private def predictorInverse(img: Array[Int], w: Int, h: Int,
      bits: Int, modes: Array[Int]): Unit = {
    val modesW = subSampleSize(w, bits)
    var y = 0
    var idx = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred: Int =
          if (y == 0) { if (x == 0) 0xff000000 else img(idx - 1) }
          else if (x == 0) img(idx - w)
          else {
            val mode = (modes((y >> bits) * modesW + (x >> bits)) >> 8) & 0xff
            val l = img(idx - 1)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => img(idx - w)
              case 3 => img(idx - w + 1)
              case 4 => img(idx - w - 1)
              case 5 => avg2(avg2(l, img(idx - w + 1)), img(idx - w))
              case 6 => avg2(l, img(idx - w - 1))
              case 7 => avg2(l, img(idx - w))
              case 8 => avg2(img(idx - w - 1), img(idx - w))
              case 9 => avg2(img(idx - w), img(idx - w + 1))
              case 10 => avg2(avg2(l, img(idx - w - 1)),
                avg2(img(idx - w), img(idx - w + 1)))
              case 11 => select(l, img(idx - w), img(idx - w - 1))
              case 12 => clampAddSubFull(l, img(idx - w), img(idx - w - 1))
              case 13 => clampAddSubHalf(l, img(idx - w), img(idx - w - 1))
              case _ => bail()
            }
          }
        img(idx) = addPixels(img(idx), pred)
        idx += 1
        x += 1
      }
      y += 1
    }
  }

  /** Inverse cross-color transform: per-block multipliers stored as
    * (red_to_blue, green_to_blue, green_to_red) in the data image's
    * R/G/B channels; delta = (int8 multiplier * int8 channel) >> 5
    * (arithmetic shift), red updated before it feeds blue. */
  private def colorInverse(img: Array[Int], w: Int, h: Int,
      bits: Int, cte: Array[Int]): Unit = {
    val cteW = subSampleSize(w, bits)
    var y = 0
    var idx = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = cte((y >> bits) * cteW + (x >> bits))
        val g2r = (m & 0xff).toByte
        val g2b = ((m >> 8) & 0xff).toByte
        val r2b = ((m >> 16) & 0xff).toByte
        val px = img(idx)
        val green = (px >> 8).toByte
        var red = (px >>> 16) & 0xff
        var blue = px & 0xff
        red = (red + ((g2r * green) >> 5)) & 0xff
        blue = (blue + ((g2b * green) >> 5)) & 0xff
        blue = (blue + ((r2b * red.toByte) >> 5)) & 0xff
        img(idx) = (px & 0xff00ff00) | (red << 16) | blue
        idx += 1
        x += 1
      }
      y += 1
    }
  }

  /** Inverse subtract-green: red and blue get green added back. */
  private def subtractGreenInverse(img: Array[Int]): Unit = {
    var i = 0
    while (i < img.length) {
      val px = img(i)
      val green = (px >>> 8) & 0xff
      val red = (((px >>> 16) & 0xff) + green) & 0xff
      val blue = ((px & 0xff) + green) & 0xff
      img(i) = (px & 0xff00ff00) | (red << 16) | blue
      i += 1
    }
  }

  /** Inverse color-indexing: indices live in the green channel,
    * bundled sub-byte when the palette is small. */
  private def colorIndexInverse(img: Array[Int], packedW: Int, h: Int,
      origW: Int, packBits: Int, map: Array[Int]): Array[Int] = {
    if (packBits == 0) {
      var i = 0
      while (i < img.length) { img(i) = map((img(i) >>> 8) & 0xff); i += 1 }
      img
    } else {
      val out = new Array[Int](origW * h)
      val bpp = 8 >> packBits
      val mask = (1 << bpp) - 1
      val perByte = 1 << packBits
      var y = 0
      while (y < h) {
        var x = 0
        while (x < origW) {
          val packed = (img(y * packedW + (x >> packBits)) >>> 8) & 0xff
          out(y * origW + x) = map((packed >> (bpp * (x & (perByte - 1)))) & mask)
          x += 1
        }
        y += 1
      }
      out
    }
  }
}
