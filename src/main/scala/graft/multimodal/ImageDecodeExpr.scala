package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** image_decode(payload): REAL pixel decode — PNG (all five
  * scanline filters, gray / RGB / palette / gray-alpha / RGBA at every
  * legal bit depth — 1/2/4 sub-byte gray+palette scaled to full range,
  * 8, and 16 folded to the MSB — plus Adam7 interlace, zlib inflate
  * via the JDK's java.util.zip.Inflater), BMP
  * (BITMAPINFOHEADER, 24/32 bpp uncompressed, bottom-up and top-down),
  * GIF (full variable-width LZW, 87a/89a, local/global color
  * tables, interlace, GCE transparency — first frame composed onto the
  * logical screen), and baseline JPEG (sequential Huffman with the
  * PINNED integer pipeline in [[JpegDecode]]: IJG islow IDCT, fancy
  * chroma upsampling, fixed-point color convert — bit-deterministic,
  * so the exact-oracle contract holds for JPEG too). This closes the
  * stub the metadata pass ([[ImageMetaExpr]]) left open: resize / crop
  * / feature pipelines downstream of this expression operate on real
  * pixels with plain Spark higher-order functions (see
  * [[Multimodal.resizeDecoded]]).
  *
  * Output: struct<format string, width int, height int,
  * pixels array<int>> — pixels are packed ARGB ints (alpha in the top
  * byte) in row-major top-to-bottom order, the layout every raster API
  * uses, so downstream expressions index pixel (x, y) at y*width+x.
  *
  * Scale discipline (a corpus-wide decode must never kill the job):
  *  - any malformed / truncated / unsupported payload yields
  *    ("unknown", -1, -1, NULL) instead of throwing — filter on format;
  *  - decompression-bomb guard: declared width*height is capped at
  *    2^26 pixels (256 MiB of ARGB) BEFORE any allocation, so a 100-
  *    byte zip bomb claiming a 10-gigapixel canvas cannot OOM an
  *    executor;
  *  - entirely per-row map-side work — no shuffle, no driver state.
  *
  * Deliberately unsupported (→ unknown): arithmetic-coded / 12-bit /
  * lossless JPEG (see [[JpegDecode]]), GIF frames past the first.
  * PNG chunk CRCs are
  * not verified and a missing/garbled zlib Adler trailer is tolerated:
  * the decode is over when the expected scanline bytes are produced —
  * corpus reality is truncated files, and the strict-checksum policy
  * belongs to ingest validation, not the decode hot path.
  *
  * Reference: the decode/feature-extract stage this implements is the
  * reference's table-API multimodal preprocessing shape; byte layouts
  * follow the public PNG (RFC 2083) and BMP specifications. */
case class ImageDecodeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import ImageDecodeExpr.MaxPixels

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = true)))
  override def prettyName: String = "image_decode"

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private val unknown =
    InternalRow(UTF8String.fromString("unknown"), -1, -1, null)

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try decode(b) catch { case _: Exception => unknown }
  }

  private[multimodal] def decode(b: Array[Byte]): InternalRow = {
    if (b.length >= 8 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
        (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a) png(b)
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') bmp(b)
    else if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') gif(b)
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      jpeg(b)
    else if (b.length >= 8 &&
        ((b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 42 && b(3) == 0) ||
         (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 42)))
      tiff(b)
    else if (b.length >= 2 && b(0) == 'P' && b(1) >= '4' && b(1) <= '6')
      pnm(b)
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
        b(11) == 'P') webp(b)
    else if (ImageDecodeExpr.icoEntries(b) != null) ico(b)
    else if (isTgaV2(b)) tga(b)
    else unknown
  }

  /** ICO favicon container (public ICONDIR layout — web corpora are
    * saturated with these): picks the best entry (largest area,
    * deepest bitCount on ties) and routes its payload to the existing
    * decoders — a complete PNG stream, or a BMP *sans* file header
    * whose DIB declares DOUBLED height (XOR pixel plane + 1bpp AND
    * mask). For sub-32bpp BMP entries the AND mask drives
    * transparency (set bit → fully transparent pixel); 32bpp entries
    * carry their own alpha and the mask is ignored (the Vista+
    * convention). Cursor files (type 2) are not icons and stay
    * unknown. */
  private def ico(b: Array[Byte]): InternalRow = {
    val entries = ImageDecodeExpr.icoEntries(b)
    if (entries == null) return unknown
    var best: Array[Int] = null
    for (e <- entries) {
      val better = best == null ||
        e(0).toLong * e(1) > best(0).toLong * best(1) ||
        (e(0).toLong * e(1) == best(0).toLong * best(1) && e(2) > best(2))
      if (better) best = e
    }
    val d = java.util.Arrays.copyOfRange(b, best(4), best(4) + best(3))
    val r =
      if (d.length >= 8 && (d(0) & 0xff) == 0x89 && d(1) == 'P' &&
          d(2) == 'N' && d(3) == 'G') png(d)
      else icoBmp(d)
    if (r.getUTF8String(0).toString == "unknown") unknown
    else InternalRow(UTF8String.fromString("ico"),
      r.getInt(1), r.getInt(2), r.getArray(3))
  }

  /** A headerless ICO BMP entry: synthesize the 14-byte
    * BITMAPFILEHEADER in front (pixel-data offset = header + DIB +
    * palette), un-double the DIB height, decode through [[bmp]], then
    * apply the AND mask (1bpp, bottom-up, 32-bit-padded rows, stored
    * right after the XOR plane). */
  private def icoBmp(d: Array[Byte]): InternalRow = {
    if (d.length < 40) return unknown
    val dibSize = le32(d, 0)
    if (dibSize < 40 || dibSize > d.length) return unknown
    val w = le32(d, 4)
    val h2 = le32(d, 8)
    if (w <= 0 || h2 <= 0 || (h2 & 1) == 1) return unknown
    val h = h2 / 2
    if (w.toLong * h > MaxPixels) return unknown
    val bpp = le16(d, 14)
    val colorsUsed = le32(d, 32)
    val palEntries =
      if (bpp == 1 || bpp == 4 || bpp == 8) {
        if (colorsUsed > 0) colorsUsed else 1 << bpp
      } else 0
    if (palEntries < 0 || palEntries > 256) return unknown
    val dataOff = 14 + dibSize + palEntries * 4
    val synth = new Array[Byte](14 + d.length)
    synth(0) = 'B'; synth(1) = 'M'
    // only the pixel-data offset (at 10) is read by bmp()
    synth(10) = dataOff.toByte; synth(11) = (dataOff >> 8).toByte
    synth(12) = (dataOff >> 16).toByte; synth(13) = (dataOff >> 24).toByte
    System.arraycopy(d, 0, synth, 14, d.length)
    synth(22) = h.toByte; synth(23) = (h >> 8).toByte
    synth(24) = (h >> 16).toByte; synth(25) = (h >> 24).toByte
    val r = bmp(synth)
    if (r.getUTF8String(0).toString == "unknown") return unknown
    if (bpp >= 32) return r
    val xorStride = ((w * bpp + 31) / 32) * 4
    val andStride = ((w + 31) / 32) * 4
    val andOff = dibSize + palEntries * 4 + xorStride * h
    if (andOff.toLong + andStride.toLong * h > d.length) return unknown
    val px = r.getArray(3).toIntArray
    var y = 0
    while (y < h) {
      val rowOff = andOff + (h - 1 - y) * andStride
      var x = 0
      while (x < w) {
        if (((d(rowOff + (x >> 3)) >> (7 - (x & 7))) & 1) == 1)
          px(y * w + x) = 0
        x += 1
      }
      y += 1
    }
    InternalRow(UTF8String.fromString("bmp"), w, h,
      new GenericArrayData(px))
  }

  /** WebP: VP8L (lossless, [[WebpDecode]], RFC 9649) and lossy VP8
    * keyframes ([[Vp8Decode]], RFC 6386, reference-exact YUV +
    * point-sampled RGB conversion) both decode fully. */
  private def webp(b: Array[Byte]): InternalRow =
    WebpDecode.decode(b, MaxPixels) match {
      case Some(r) => InternalRow(UTF8String.fromString("webp"),
        r.width, r.height, new GenericArrayData(r.pixels))
      case None => unknown
    }

  // ---------------------------------------------------------------- TGA
  private def isTgaV2(b: Array[Byte]): Boolean = ImageDecodeExpr.isTgaV2(b)

  /** Truevision TGA (the public TGA 2.0 spec): types 1/9 (8-bit
    * palette via a 24/32-bit color map), 2/10 (truecolor 16/24/32 —
    * 16-bit is 5-5-5 with the canonical (v<<3)|(v>>2) channel
    * replication) and 3/11 (8-bit gray), each in both uncompressed and
    * RLE form (run/raw packets may cross row boundaries); bottom-up by
    * default, top-down via descriptor bit 5; right-to-left layouts are
    * rejected. */
  private def tga(b: Array[Byte]): InternalRow = {
    val idLen = b(0) & 0xff
    val cmType = b(1) & 0xff
    val imgType = b(2) & 0xff
    val cmFirst = le16(b, 3) // first palette index the map covers
    val cmLen = le16(b, 5)
    val cmBits = b(7) & 0xff
    val w = le16(b, 12)
    val h = le16(b, 14)
    val depth = b(16) & 0xff
    val desc = b(17) & 0xff
    // the full structural gate set is shared with image_meta
    // ([[ImageDecodeExpr.tgaHeaderOk]]) so the surfaces cannot drift;
    // only the allocation bomb guard is decode-specific
    if (!ImageDecodeExpr.tgaHeaderOk(b)) return unknown
    if (w.toLong * h > MaxPixels) return unknown
    val topDown = (desc & 0x20) != 0
    val rle = imgType >= 9 && imgType <= 11
    val base = if (rle) imgType - 8 else imgType
    val paletted = base == 1
    val cmBytes = if (cmType == 1) cmLen * ((cmBits + 7) / 8) else 0
    var i = 18 + idLen
    val palette: Array[Int] =
      if (!paletted) null
      else {
        if (i + cmBytes > b.length) return unknown
        val per = (cmBits + 7) / 8
        Array.tabulate(cmLen) { k =>
          val o = i + k * per
          val a = if (cmBits == 32) (b(o + 3) & 0xff) << 24 else 0xff000000
          a | ((b(o + 2) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) |
            (b(o) & 0xff)
        }
      }
    i += cmBytes
    val bytesPer = (depth + 7) / 8
    // 32bpp alpha comes from the descriptor's attribute-bit count: a
    // writer declaring 0 attribute bits left the 4th byte as padding
    // (the BMP-reserved-byte hazard), so it must read opaque
    val alphaBits = desc & 0x0f
    def pixelAt(o: Int): Int = {
      if (paletted) {
        val idx = (b(o) & 0xff) - cmFirst // map covers [cmFirst, +cmLen)
        if (idx < 0 || idx >= palette.length) throw PixErr
        palette(idx)
      } else if (base == 3) {
        val g = b(o) & 0xff
        0xff000000 | (g << 16) | (g << 8) | g
      } else depth match {
        case 16 => // ARRRRRGG GGGBBBBB little-endian
          val v = le16(b, o)
          def c5(x: Int) = (x << 3) | (x >> 2)
          0xff000000 | (c5((v >> 10) & 0x1f) << 16) |
            (c5((v >> 5) & 0x1f) << 8) | c5(v & 0x1f)
        case 24 => 0xff000000 | ((b(o + 2) & 0xff) << 16) |
          ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
        case _ =>
          val a = if (alphaBits == 8) (b(o + 3) & 0xff) << 24
            else 0xff000000
          a | ((b(o + 2) & 0xff) << 16) |
            ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
      }
    }
    val raster = new Array[Int](w * h) // in STORED row order
    val end = b.length - 26 // footer block
    if (!rle) {
      if (i.toLong + w.toLong * h * bytesPer > end) return unknown
      var p = 0
      try while (p < w * h) { raster(p) = pixelAt(i + p * bytesPer); p += 1 }
      catch { case PixErr => return unknown }
    } else {
      var p = 0
      try while (p < w * h) {
        if (i >= end) return unknown
        val ctrl = b(i) & 0xff; i += 1
        val n = (ctrl & 0x7f) + 1
        if (p + n > w * h) return unknown
        if ((ctrl & 0x80) != 0) { // run packet: one pixel repeated
          if (i + bytesPer > end) return unknown
          val v = pixelAt(i); i += bytesPer
          var k = 0
          while (k < n) { raster(p) = v; p += 1; k += 1 }
        } else { // raw packet
          if (i + n * bytesPer > end) return unknown
          var k = 0
          while (k < n) { raster(p) = pixelAt(i + k * bytesPer); p += 1; k += 1 }
          i += n * bytesPer
        }
      } catch { case PixErr => return unknown }
    }
    val px =
      if (topDown) raster
      else { // default origin is bottom-left: flip rows
        val f = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          System.arraycopy(raster, (h - 1 - y) * w, f, y * w, w)
          y += 1
        }
        f
      }
    out("tga", w, h, px)
  }

  private object PixErr extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ---------------------------------------------------------------- PNM
  /** Binary netpbm rasters (the public PNM formats — the CV-dataset
    * interchange family): P4 bitmap (MSB-first packed rows, 1 = black
    * per the spec), P5 gray and P6 RGB at maxval <= 255 or two-byte
    * big-endian 16-bit (folded to the MSB, the PNG-16 discipline).
    * Headers allow arbitrary whitespace and # comments. The ASCII
    * variants P1-P3 stay unknown (rare as corpus payloads). */
  private def pnm(b: Array[Byte]): InternalRow = {
    val kind = b(1) - '0'
    var i = 2
    // token reader: skips whitespace and # comments
    def nextInt(): Int = {
      var v = -1
      var done = false
      while (!done) {
        if (i >= b.length) return -1
        val c = b(i)
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else if (c >= '0' && c <= '9') {
          v = 0
          while (i < b.length && b(i) >= '0' && b(i) <= '9') {
            v = v * 10 + (b(i) - '0')
            if (v > (1 << 28)) return -1
            i += 1
          }
          done = true
        } else return -1
      }
      v
    }
    val w = nextInt()
    val h = nextInt()
    val maxval = if (kind == 4) 1 else nextInt()
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return unknown
    // only the two canonical depths: other maxvals require a scaling
    // convention (255/maxval rounding) no two tools agree on — decoding
    // them unscaled would be confidently wrong, so they map to unknown
    if (kind != 4 && maxval != 255 && maxval != 65535) return unknown
    // exactly ONE whitespace byte separates the header from the raster
    if (i >= b.length || !(b(i) == ' ' || b(i) == '\t' || b(i) == '\r' ||
        b(i) == '\n')) return unknown
    i += 1
    val two = maxval > 255
    val spp = if (kind == 6) 3 else 1
    val px = new Array[Int](w * h)
    if (kind == 4) { // packed bitmap, rows byte-aligned; 1 = black
      val rowBytes = (w + 7) / 8
      if (i.toLong + rowBytes.toLong * h > b.length) return unknown
      var p = 0
      while (p < w * h) {
        val x = p % w
        val bit = (b(i + (p / w) * rowBytes + (x >> 3)) >>> (7 - (x & 7))) & 1
        val g = if (bit == 1) 0 else 255
        px(p) = 0xff000000 | (g << 16) | (g << 8) | g
        p += 1
      }
    } else {
      // two-byte samples fold to the MSB via the step-2 offsets below
      // (the PNG-16 rule; maxval is exactly 65535 here)
      val bytesPer = (if (two) 2 else 1) * spp
      if (i.toLong + w.toLong * h * bytesPer > b.length) return unknown
      def sample(o: Int): Int = b(o) & 0xff
      var p = 0
      while (p < w * h) {
        val o = i + p * bytesPer
        val step = if (two) 2 else 1
        px(p) =
          if (kind == 5) {
            val g = sample(o)
            0xff000000 | (g << 16) | (g << 8) | g
          } else 0xff000000 | (sample(o) << 16) |
            (sample(o + step) << 8) | sample(o + 2 * step)
        p += 1
      }
    }
    out("pnm", w, h, px)
  }

  // --------------------------------------------------------------- TIFF
  /** Baseline TIFF 6.0 raster decode — the scanned-document corpus
    * format: 8-bit gray (photometric 0/1) / RGB / RGBA, contiguous
    * planar, strip-organized, compression none (1), LZW (5, TIFF 6.0
    * §13 MSB-first with the spec's early width change), Deflate
    * (8 / 32946, via the shared zlib inflater) or PackBits (32773),
    * with the horizontal-differencing predictor (tag 317 = 2) applied
    * per row — both byte orders. Tiled, CCITT, planar=2 and sub-byte
    * TIFFs stay unknown. */
  private def tiff(b: Array[Byte]): InternalRow = {
    val little = b(0) == 'I'
    def u16(i: Int): Int =
      if (little) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (little) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return unknown
    val base = ifd.toInt
    val n = u16(base)
    if (base + 2 + n * 12 > b.length) return unknown
    // entry lookup: tag -> entry offset
    var w = -1; var h = -1; var compression = 1; var photometric = -1
    var spp = 1; var rps = -1
    var bpsEntry = -1; var offsetsEntry = -1; var countsEntry = -1
    var planar = 1; var predictor = 1
    var e = 0
    while (e < n) {
      val entry = base + 2 + e * 12
      val tag = u16(entry)
      val typ = u16(entry + 2)
      def scalar(): Int = typ match {
        case 3 => u16(entry + 8)
        case 4 => u32(entry + 8).toInt
        case _ => -1
      }
      tag match {
        case 256 => w = scalar()
        case 257 => h = scalar()
        case 258 => bpsEntry = entry
        case 259 => compression = scalar()
        case 262 => photometric = scalar()
        case 273 => offsetsEntry = entry
        case 277 => spp = scalar()
        case 278 => rps = scalar()
        case 279 => countsEntry = entry
        case 284 => planar = scalar()
        case 317 => predictor = scalar()
        case _ => ()
      }
      e += 1
    }
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return unknown
    if ((compression != 1 && compression != 5 && compression != 8 &&
        compression != 32773 && compression != 32946) || planar != 1)
      return unknown
    if (predictor != 1 && predictor != 2) return unknown
    if (predictor == 2 && compression != 5 && compression != 8 &&
        compression != 32946) return unknown // §14: predictor rides LZW/deflate
    if (photometric < 0 || photometric > 2) return unknown
    if (spp != 1 && spp != 3 && spp != 4) return unknown
    if (photometric == 2 && spp < 3) return unknown
    if (offsetsEntry < 0) return unknown
    // array-valued entries: count*size <= 4 inline, else at the offset
    def values(entry: Int): Array[Long] = {
      if (entry < 0) return null
      val typ = u16(entry + 2)
      val cnt = u32(entry + 4).toInt
      val size = typ match { case 3 => 2; case 4 => 4; case _ => return null }
      if (cnt <= 0 || cnt > (1 << 20)) return null
      val at =
        if (cnt * size <= 4) entry + 8
        else {
          val off = u32(entry + 8)
          if (off + cnt.toLong * size > b.length) return null
          off.toInt
        }
      Array.tabulate(cnt)(k =>
        if (size == 2) u16(at + k * 2).toLong else u32(at + k * 4))
    }
    // all sample depths must be 8
    if (bpsEntry >= 0) {
      val bps = values(bpsEntry)
      if (bps == null || bps.exists(_ != 8L)) return unknown
    }
    val offs = values(offsetsEntry)
    val cnts = values(countsEntry)
    if (offs == null) return unknown
    val rowsPer = if (rps <= 0) h else rps
    val strips = (h + rowsPer - 1) / rowsPer
    if (offs.length < strips) return unknown
    val rowBytes = w * spp
    val raster = new Array[Byte](rowBytes * h)
    var s = 0
    while (s < strips) {
      val rows = math.min(rowsPer, h - s * rowsPer)
      val need = rows * rowBytes
      val dst = s * rowsPer * rowBytes
      val off = offs(s)
      if (off < 0 || off > b.length) return unknown
      val srcEnd =
        if (cnts != null && cnts.length > s)
          math.min(b.length.toLong, off + cnts(s)).toInt
        else b.length
      if (compression == 1) {
        if (off + need > b.length) return unknown
        System.arraycopy(b, off.toInt, raster, dst, need)
      } else if (compression == 5) { // LZW, TIFF 6.0 §13
        if (!tiffLzw(b, off.toInt, srcEnd, raster, dst, need))
          return unknown
      } else if (compression == 8 || compression == 32946) { // Deflate
        if (!inflateInto(b, off.toInt, srcEnd - off.toInt,
            raster, dst, need)) return unknown
      } else { // PackBits (public TIFF 6.0 §9)
        var src = off.toInt
        var got = 0
        while (got < need) {
          if (src >= srcEnd) return unknown
          val c = b(src); src += 1
          if (c >= 0) {
            val len = c + 1
            if (src + len > srcEnd || got + len > need) return unknown
            System.arraycopy(b, src, raster, dst + got, len)
            src += len; got += len
          } else if (c != -128) {
            val len = 1 - c
            if (src >= srcEnd || got + len > need) return unknown
            java.util.Arrays.fill(raster, dst + got, dst + got + len, b(src))
            src += 1; got += len
          } // -128: noop
        }
      }
      s += 1
    }
    if (predictor == 2) { // §14 horizontal differencing, per row/sample
      var y = 0
      while (y < h) {
        var i = y * rowBytes + spp
        val rowEnd = (y + 1) * rowBytes
        while (i < rowEnd) {
          raster(i) = (raster(i) + raster(i - spp)).toByte
          i += 1
        }
        y += 1
      }
    }
    val px = new Array[Int](w * h)
    var p = 0
    while (p < w * h) {
      val o = p * spp
      px(p) =
        if (spp == 1) {
          val g0 = raster(o) & 0xff
          val g = if (photometric == 0) 255 - g0 else g0 // WhiteIsZero
          0xff000000 | (g << 16) | (g << 8) | g
        } else {
          val a = if (spp == 4) (raster(o + 3) & 0xff) << 24 else 0xff000000
          a | ((raster(o) & 0xff) << 16) | ((raster(o + 1) & 0xff) << 8) |
            (raster(o + 2) & 0xff)
        }
      p += 1
    }
    out("tiff", w, h, px)
  }

  // --------------------------------------------------------------- JPEG
  /** Baseline/extended-sequential Huffman JPEG via [[JpegDecode]] — the
    * pinned-integer pipeline (IJG islow IDCT, fancy upsampling,
    * fixed-point YCbCr->RGB), bit-deterministic by construction.
    * Progressive/arithmetic/12-bit streams stay unknown. */
  private def jpeg(b: Array[Byte]): InternalRow = {
    val d = JpegDecode.decode(b, MaxPixels)
    if (d == null) unknown else out("jpeg", d.width, d.height, d.pixels)
  }

  private def out(fmt: String, w: Int, h: Int, px: Array[Int]): InternalRow =
    InternalRow(UTF8String.fromString(fmt), w, h, new GenericArrayData(px))

  // ---------------------------------------------------------------- PNG
  private def png(b: Array[Byte]): InternalRow = {
    // walk chunks: len(be32) type(4) data crc(4) — CRCs not verified
    var i = 8
    var w = -1; var h = -1; var depth = -1; var colorType = -1
    var interlace = 0
    var palette: Array[Int] = null // packed ARGB palette (tRNS applied)
    var trns: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && i + 8 <= b.length) {
      val len = be32(b, i)
      if (len < 0 || i + 8 + len > b.length) return unknown
      val t = new String(b, i + 4, 4, "US-ASCII")
      t match {
        case "IHDR" =>
          if (len < 13) return unknown
          w = be32(b, i + 8); h = be32(b, i + 12)
          depth = b(i + 16) & 0xff; colorType = b(i + 17) & 0xff
          interlace = b(i + 20) & 0xff
        case "PLTE" =>
          palette = new Array[Int](len / 3)
          var p = 0
          while (p < palette.length) {
            palette(p) = 0xff000000 |
              ((b(i + 8 + p * 3) & 0xff) << 16) |
              ((b(i + 8 + p * 3 + 1) & 0xff) << 8) |
              (b(i + 8 + p * 3 + 2) & 0xff)
            p += 1
          }
        case "tRNS" =>
          trns = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
        case "IDAT" => idat.write(b, i + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks (text, gamma, ...) skipped
      }
      i += 12 + len
    }
    if (w <= 0 || h <= 0 || (interlace != 0 && interlace != 1))
      return unknown
    if (w.toLong * h > MaxPixels) return unknown // decompression bomb
    val channels = colorType match {
      case 0 => 1 // gray
      case 2 => 3 // rgb
      case 3 => 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // rgba
      case _ => return unknown
    }
    // legal depth/color-type combinations (PNG §11.2.2): sub-byte
    // depths only for gray and palette; 16-bit never for palette
    val depthOk = colorType match {
      case 0 => Set(1, 2, 4, 8, 16)(depth)
      case 3 => Set(1, 2, 4, 8)(depth)
      case _ => depth == 8 || depth == 16
    }
    if (!depthOk) return unknown
    if (colorType == 3 && palette == null) return unknown
    if (colorType == 3 && trns != null) {
      var p = 0
      while (p < trns.length && p < palette.length) {
        palette(p) = (palette(p) & 0x00ffffff) | ((trns(p) & 0xff) << 24)
        p += 1
      }
    }
    val bitsPerPx = channels * depth
    val bppFilter = math.max(1, bitsPerPx / 8) // filter step (§6.2)
    def rowBytes(pxw: Int): Int = (pxw.toLong * bitsPerPx / 8 +
      (if (pxw.toLong * bitsPerPx % 8 != 0) 1 else 0)).toInt
    // Adam7 passes as (xStart, yStart, xStep, yStep); non-interlaced is
    // the single full pass
    val passes: Seq[(Int, Int, Int, Int)] =
      if (interlace == 0) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = (
      if (w > p._1) (w - p._1 + p._3 - 1) / p._3 else 0,
      if (h > p._2) (h - p._2 + p._4 - 1) / p._4 else 0)
    val rawLen = passes.map { p =>
      val (pw, ph) = passDims(p)
      if (pw == 0 || ph == 0) 0L else ph.toLong * (1 + rowBytes(pw))
    }.sum
    if (rawLen > Int.MaxValue) return unknown
    val raw = inflate(idat.toByteArray, rawLen.toInt)
    if (raw == null) return unknown

    val px = new Array[Int](w * h)
    // 16-bit samples fold to their MSB (the pinned 8-bit reduction);
    // sub-byte gray scales to full range (x255/85/17)
    val grayScale = depth match {
      case 1 => 255
      case 2 => 85
      case 4 => 17
      case _ => 1
    }
    var rawOff = 0
    var failed = false
    passes.foreach { case pass @ (x0, y0, xs, ys) =>
      val (pw, ph) = passDims(pass)
      if (!failed && pw > 0 && ph > 0) {
        val stride = rowBytes(pw)
        val prev = new Array[Byte](stride)
        val cur = new Array[Byte](stride)
        java.util.Arrays.fill(prev, 0.toByte)
        var y = 0
        while (y < ph && !failed) {
          val off = rawOff + y * (stride + 1)
          val filter = raw(off) & 0xff
          System.arraycopy(raw, off + 1, cur, 0, stride)
          // undo per-scanline filters in place (RFC 2083 §6); filters
          // operate on BYTES with step bppFilter regardless of depth
          filter match {
            case 0 => ()
            case 1 => // Sub
              var x = bppFilter
              while (x < stride) {
                cur(x) = (cur(x) + cur(x - bppFilter)).toByte; x += 1
              }
            case 2 => // Up
              var x = 0
              while (x < stride) {
                cur(x) = (cur(x) + prev(x)).toByte; x += 1
              }
            case 3 => // Average
              var x = 0
              while (x < stride) {
                val left = if (x >= bppFilter) cur(x - bppFilter) & 0xff else 0
                cur(x) = (cur(x) + ((left + (prev(x) & 0xff)) >> 1)).toByte
                x += 1
              }
            case 4 => // Paeth
              var x = 0
              while (x < stride) {
                val a = if (x >= bppFilter) cur(x - bppFilter) & 0xff else 0
                val bb = prev(x) & 0xff
                val c = if (x >= bppFilter) prev(x - bppFilter) & 0xff else 0
                val p = a + bb - c
                val pa = math.abs(p - a); val pb = math.abs(p - bb)
                val pc = math.abs(p - c)
                val pred =
                  if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
                cur(x) = (cur(x) + pred).toByte
                x += 1
              }
            case _ => failed = true
          }
          // sample channel `c` of pass-pixel `x`
          def sample(x: Int, c: Int): Int =
            if (depth == 16) cur((x * channels + c) * 2) & 0xff // MSB
            else if (depth == 8) cur(x * channels + c) & 0xff
            else { // sub-byte: gray or palette index, MSB-first packing
              val bit = x * depth
              (cur(bit >> 3) >> (8 - depth - (bit & 7))) & ((1 << depth) - 1)
            }
          var x = 0
          while (x < pw && !failed) {
            val argb = colorType match {
              case 0 =>
                val g = sample(x, 0) * grayScale
                0xff000000 | (g << 16) | (g << 8) | g
              case 2 =>
                0xff000000 | (sample(x, 0) << 16) |
                  (sample(x, 1) << 8) | sample(x, 2)
              case 3 =>
                val idx = sample(x, 0)
                if (idx >= palette.length) { failed = true; 0 }
                else palette(idx)
              case 4 =>
                val g = sample(x, 0)
                (sample(x, 1) << 24) | (g << 16) | (g << 8) | g
              case _ => // 6
                (sample(x, 3) << 24) | (sample(x, 0) << 16) |
                  (sample(x, 1) << 8) | sample(x, 2)
            }
            if (!failed) px((y0 + y * ys) * w + (x0 + x * xs)) = argb
            x += 1
          }
          System.arraycopy(cur, 0, prev, 0, stride)
          y += 1
        }
        rawOff += ph * (stride + 1)
      }
    }
    if (failed) unknown else out("png", w, h, px)
  }

  /** Inflate exactly `expected` bytes; tolerant of a missing/garbled
    * Adler32 trailer (decode is complete once the scanlines are out).
    * Returns null on a short or corrupt stream. */
  /** TIFF 6.0 §13 LZW: MSB-first bit packing, fixed ClearCode = 256 /
    * EOI = 257, first dynamic entry 258, 9→12-bit codes with the
    * spec's EARLY width change (bump when the next code to assign
    * reaches 2^width - 1 — one earlier than GIF's LZW). Writes exactly
    * `need` bytes into `raster` at `dst` reading from b[off, end);
    * false on any malformation. */
  private def tiffLzw(b: Array[Byte], off: Int, end: Int,
      raster: Array[Byte], dst: Int, need: Int): Boolean = {
    val Clear = 256; val Eoi = 257
    val prefix = new Array[Int](4096)
    val last = new Array[Byte](4096)
    val first = new Array[Byte](4096) // O(1) first byte per entry
    var next = 258; var width = 9
    var got = 0
    val stack = new Array[Byte](4096)
    val stop = math.min(end, b.length)
    var pos = off
    // buffered MSB-first reader: bytes refill a 64-bit accumulator, each
    // code is one shift+mask (the jdhuff-style discipline the JPEG path
    // uses) instead of a per-bit loop
    var acc = 0L; var nAcc = 0
    var prev = -1
    def read(): Int = {
      while (nAcc < width) {
        if (pos >= stop) return -1
        acc = (acc << 8) | (b(pos) & 0xff); pos += 1; nAcc += 8
      }
      nAcc -= width
      ((acc >>> nAcc) & ((1 << width) - 1)).toInt
    }
    def firstByte(code: Int): Byte =
      if (code < 256) code.toByte else first(code)
    def emit(code: Int): Boolean = {
      var sp = 0; var c = code
      while (c >= 258) { // unwind the suffix chain
        if (c >= next || sp >= stack.length) return false
        stack(sp) = last(c); sp += 1; c = prefix(c)
      }
      if (c >= 256) return false // control code inside a chain
      if (got + sp + 1 > need) return false
      raster(dst + got) = c.toByte; got += 1
      while (sp > 0) { sp -= 1; raster(dst + got) = stack(sp); got += 1 }
      true
    }
    while (got < need) {
      val code = read()
      if (code < 0 || code == Eoi) return got == need
      if (code == Clear) { next = 258; width = 9; prev = -1 }
      else if (prev < 0) {
        if (code >= 256) return false // first code must be a literal
        if (!emit(code)) return false
        prev = code
      } else {
        val valid = code < next
        if (!valid && code != next) return false
        if (valid) { if (!emit(code)) return false }
        else { // KwKwK: prev's expansion + its own first byte
          if (!emit(prev)) return false
          if (got >= need) return false
          raster(dst + got) = firstByte(prev); got += 1
        }
        if (next < 4096) {
          prefix(next) = prev
          last(next) = if (valid) firstByte(code) else firstByte(prev)
          first(next) = firstByte(prev) // entry = prev-string + 1 byte
          next += 1
          if (width < 12 && next == (1 << width) - 1) width += 1
        }
        prev = code
      }
    }
    true
  }

  private def inflate(z: Array[Byte], expected: Int): Array[Byte] = {
    val outB = new Array[Byte](expected)
    if (inflateInto(z, 0, z.length, outB, 0, expected)) outB else null
  }

  /** Zero-copy inflate: decompresses `need` bytes from b[off, off+len)
    * straight into dest at destOff (no input slice copy, no output
    * staging array — the corpus hot path runs one allocation-free
    * inflate per strip). */
  private def inflateInto(b: Array[Byte], off: Int, len: Int,
      dest: Array[Byte], destOff: Int, need: Int): Boolean = {
    if (off < 0 || len < 0 || off + len > b.length) return false
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b, off, len)
      var got = 0
      var stalled = false
      while (got < need && !stalled) {
        val n = inf.inflate(dest, destOff + got, need - got)
        if (n == 0 && (inf.finished() || inf.needsInput() ||
            inf.needsDictionary())) stalled = true
        got += n
      }
      got == need
    } catch {
      case _: java.util.zip.DataFormatException => false
    } finally inf.end()
  }

  // ---------------------------------------------------------------- GIF
  /** First frame of a GIF87a/89a, composed onto the logical screen
    * (background-filled when the frame is smaller/offset), GCE
    * transparency applied, interlace supported. LZW here is the full
    * variable-width decoder (clear/end codes, 4096-entry dictionary) —
    * GIF's entropy coding is lossless, unlike JPEG's, so an exact
    * decode is implementable and testable byte-for-byte. */
  private def gif(b: Array[Byte]): InternalRow = {
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return unknown
    val packed = b(10) & 0xff
    var i = 13
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      gct = GifCodec.readColorTable(b, i, n); i += n * 3
    }
    val bgIndex = b(11) & 0xff
    var transparent = -1
    val px = new Array[Int](w * h)
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          val label = b(i + 1) & 0xff
          if (label == 0xf9 && i + 6 < b.length) {
            // graphic control: packed(1) delay(2) transIdx(1)
            val gcePacked = b(i + 3) & 0xff
            transparent =
              if ((gcePacked & 1) != 0) b(i + 6) & 0xff else -1
          }
          i += 2
          while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
          i += 1 // block terminator
        case 0x2c => // image descriptor: the first frame
          val left = le16(b, i + 1); val top = le16(b, i + 3)
          val fw = le16(b, i + 5); val fh = le16(b, i + 7)
          val ipacked = b(i + 9) & 0xff
          i += 10
          var ct = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            ct = GifCodec.readColorTable(b, i, n); i += n * 3
          }
          if (ct == null || fw <= 0 || fh <= 0 ||
              left + fw > w || top + fh > h) return unknown
          val interlaced = (ipacked & 0x40) != 0
          val minCode = b(i) & 0xff; i += 1
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (i < b.length && (b(i) & 0xff) != 0) {
            val n = b(i) & 0xff
            if (i + 1 + n > b.length) return unknown
            data.write(b, i + 1, n); i += 1 + n
          }
          val indices = GifCodec.lzw(data.toByteArray, minCode, fw * fh)
          if (indices == null) return unknown
          // canvas fill outside/under the frame: transparent when the
          // GCE declares transparency (what standalone decoders
          // report), else the logical-screen background color
          val fill =
            if (transparent >= 0) 0
            else if (gct != null && bgIndex < gct.length) gct(bgIndex)
            else 0
          java.util.Arrays.fill(px, fill)
          // interlace pass row order: 0,8,16.. 4,12.. 2,6.. 1,3,5..
          val rowOrder: Array[Int] =
            if (!interlaced) Array.tabulate(fh)(identity)
            else ((0 until fh by 8) ++ (4 until fh by 8) ++
              (2 until fh by 4) ++ (1 until fh by 2)).toArray
          var r = 0
          while (r < fh) {
            val y = rowOrder(r)
            var x = 0
            while (x < fw) {
              val idx = indices(r * fw + x) & 0xff
              if (idx != transparent) {
                if (idx >= ct.length) return unknown
                px((top + y) * w + (left + x)) = ct(idx)
              }
              x += 1
            }
            r += 1
          }
          return out("gif", w, h, px)
        case 0x3b => return unknown // trailer before any image data
        case _ => return unknown
      }
    }
    unknown
  }

  // ---------------------------------------------------------------- BMP
  /** BMP: 24/32bpp BI_RGB plus the legacy palette formats — 1/4/8-bit
    * indexed through the BGRA color table, and RLE8/RLE4 compression
    * (BI_RLE8/BI_RLE4 escapes: 0 = end-of-line, 1 = end-of-bitmap,
    * 2 = delta, n = word-aligned absolute run). 16bpp/BI_BITFIELDS
    * stay unknown (mask layouts vary by writer). */
  private def bmp(b: Array[Byte]): InternalRow = {
    if (b.length < 54) return unknown
    val dataOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40) return unknown // BITMAPCOREHEADER etc. unsupported
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    val colorsUsed = le32(b, 46)
    if (w <= 0 || h <= 0) return unknown
    if (w.toLong * h > MaxPixels) return unknown
    if (dataOff < 0 || dataOff > b.length) return unknown
    val paletted = bpp == 1 || bpp == 4 || bpp == 8
    if (!paletted && bpp != 24 && bpp != 32) return unknown
    if (compression != 0 && !(compression == 1 && bpp == 8) &&
        !(compression == 2 && bpp == 4)) return unknown
    if (compression != 0 && topDown) return unknown // RLE is bottom-up
    // palette: BGRA quads right after the DIB header
    val palette: Array[Int] =
      if (!paletted) null
      else {
        val at = 14 + dibSize
        // colorsUsed = 0 means "full palette", but writers (the JDK
        // included) store only the entries they use — the table is
        // additionally bounded by the pixel-data offset
        val room = math.max(0, (math.min(dataOff, b.length) - at) / 4)
        val declared = math.min(
          if (colorsUsed > 0) colorsUsed else 1 << bpp, room)
        if (declared <= 0 || declared > (1 << bpp)) return unknown
        Array.tabulate(declared)(k => 0xff000000 |
          ((b(at + k * 4 + 2) & 0xff) << 16) |
          ((b(at + k * 4 + 1) & 0xff) << 8) | (b(at + k * 4) & 0xff))
      }
    val px = new Array[Int](w * h)
    if (compression != 0) { // RLE8 / RLE4, bottom-up
      var src = dataOff
      var x = 0; var row = h - 1 // destination in image coordinates
      def put(idx: Int): Boolean = {
        if (x >= w || row < 0 || idx >= palette.length) return false
        px(row * w + x) = palette(idx); x += 1; true
      }
      var doneAll = false
      while (!doneAll) {
        if (src + 2 > b.length) return unknown
        val n = b(src) & 0xff; val v = b(src + 1) & 0xff; src += 2
        if (n > 0) { // encoded run: n pixels of v (RLE4: two nibbles)
          var k = 0
          while (k < n) {
            val idx = if (compression == 1) v
              else if ((k & 1) == 0) v >>> 4 else v & 0xf
            if (!put(idx)) return unknown
            k += 1
          }
        } else v match {
          case 0 => x = 0; row -= 1 // end of line
          case 1 => doneAll = true // end of bitmap
          case 2 => // delta: move right/up
            if (src + 2 > b.length) return unknown
            x += b(src) & 0xff; row -= b(src + 1) & 0xff; src += 2
            if (x > w || row < -1) return unknown
          case cnt => // absolute run, word-aligned
            val bytes =
              if (compression == 1) cnt else (cnt + 1) / 2
            val padded = bytes + (bytes & 1)
            if (src + padded > b.length) return unknown
            var k = 0
            while (k < cnt) {
              val by = b(src + (if (compression == 1) k else k >> 1)) & 0xff
              val idx = if (compression == 1) by
                else if ((k & 1) == 0) by >>> 4 else by & 0xf
              if (!put(idx)) return unknown
              k += 1
            }
            src += padded
        }
      }
      // pixels never written stay 0 (transparent) — RLE deltas may
      // legally skip regions; real viewers show background there
      return out("bmp", w, h, px)
    }
    val stride = ((w * bpp + 31) / 32) * 4 // rows pad to 4 bytes
    if (dataOff.toLong + stride.toLong * h > b.length) return unknown
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val off = dataOff + srcRow * stride
      var x = 0
      while (x < w) {
        px(y * w + x) =
          if (paletted) {
            val bit = x * bpp
            val by = b(off + (bit >> 3)) & 0xff
            val idx = bpp match {
              case 8 => by
              case 4 => if ((x & 1) == 0) by >>> 4 else by & 0xf
              case _ => (by >>> (7 - (bit & 7))) & 1
            }
            if (idx >= palette.length) return unknown
            palette(idx)
          } else {
            val o = off + x * (bpp / 8)
            // stored order B,G,R[,A]; the 24bpp alpha is opaque, the
            // 32bpp 4th byte is taken as alpha (writers that leave the
            // reserved byte zero should use the 24bpp path)
            val a = if (bpp == 32) (b(o + 3) & 0xff) << 24 else 0xff000000
            a | ((b(o + 2) & 0xff) << 16) |
              ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
          }
        x += 1
      }
      y += 1
    }
    out("bmp", w, h, px)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ImageDecodeExpr {
  /** Decompression-bomb cap: declared pixel count above this (256 MiB
    * of ARGB) decodes as unknown rather than allocating. */
  val MaxPixels: Long = 1L << 26

  /** Standalone decode entry for sibling expressions that re-assemble
    * containers around the shared pipelines (the APNG frame walk in
    * [[VideoFrameExpr]]); the instance never evaluates its child. */
  private[multimodal] lazy val standalone: ImageDecodeExpr =
    ImageDecodeExpr(null)

  /** ICO directory parse (the public ICONDIR/ICONDIRENTRY layout):
    * (width, height, bitCount, size, offset) per entry — the 0-means-
    * 256 dimension convention already normalized — or null when the
    * payload is not a plausible .ico. The magic is weak (just
    * 00 00 01 00 + a count), so EVERY directory entry must be
    * in-bounds past the directory before the route is taken — the
    * same discipline as the TGA footer gate. Shared by image_decode
    * and image_meta so detection cannot drift. */
  private[multimodal] def icoEntries(b: Array[Byte]): Array[Array[Int]] = {
    if (b.length < 22 || b(0) != 0 || b(1) != 0 || b(2) != 1 || b(3) != 0)
      return null
    val count = (b(4) & 0xff) | ((b(5) & 0xff) << 8)
    if (count < 1 || b.length < 6 + 16 * count) return null
    val dirEnd = 6 + 16 * count
    def le32(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    val out = new Array[Array[Int]](count)
    var k = 0
    while (k < count) {
      val e = 6 + 16 * k
      val w = { val v = b(e) & 0xff; if (v == 0) 256 else v }
      val h = { val v = b(e + 1) & 0xff; if (v == 0) 256 else v }
      val bpp = (b(e + 6) & 0xff) | ((b(e + 7) & 0xff) << 8)
      val size = le32(e + 8)
      val off = le32(e + 12)
      if (size <= 0 || off < dirEnd || off.toLong + size > b.length)
        return null
      out(k) = Array(w, h, bpp, size, off)
      k += 1
    }
    out
  }

  /** TGA has NO leading magic, so blind detection would misread other
    * binaries; only TGA v2 files are accepted, identified by the
    * mandatory v2 footer signature ("TRUEVISION-XFILE.\0" in the last
    * 18 bytes) — the same discipline real corpus routers use. Shared
    * by image_decode and image_meta so detection cannot drift. */
  private[multimodal] def isTgaV2(b: Array[Byte]): Boolean = {
    val sig = "TRUEVISION-XFILE"
    if (b.length < 18 + 26) return false
    val at = b.length - 18
    var k = 0
    while (k < 16) { if (b(at + k) != sig.charAt(k)) return false; k += 1 }
    b(at + 16) == '.' && b(at + 17) == 0
  }

  /** Structural validity of the 18-byte TGA header — the SINGLE gate
    * set both image_decode and image_meta apply, so a file one
    * surface rejects never yields dimensions from the other:
    * positive dims; left-to-right layout; image type 1/2/3 (+RLE
    * 9/10/11); color-map type 0/1 only, and a present map must carry
    * a spec entry width (15/16/24/32) — any other stride would make
    * the map-skip offset garbage; paletted images need an 8-bit
    * index into a 24/32-bit map; truecolor needs depth 16/24/32;
    * gray needs depth 8. (The MaxPixels bomb guard stays decode-only:
    * it is a resource cap, not file invalidity, and reporting the
    * dimensions of an oversized image is exactly image_meta's job.) */
  private[multimodal] def tgaHeaderOk(b: Array[Byte]): Boolean = {
    val cmType = b(1) & 0xff
    val imgType = b(2) & 0xff
    val cmBits = b(7) & 0xff
    val w = (b(12) & 0xff) | ((b(13) & 0xff) << 8)
    val h = (b(14) & 0xff) | ((b(15) & 0xff) << 8)
    val depth = b(16) & 0xff
    val desc = b(17) & 0xff
    val base = if (imgType >= 9 && imgType <= 11) imgType - 8 else imgType
    w > 0 && h > 0 &&
      (desc & 0x10) == 0 && // right-to-left: rejected
      (base == 1 || base == 2 || base == 3) &&
      cmType <= 1 &&
      (cmType == 0 || cmBits == 15 || cmBits == 16 || cmBits == 24 ||
        cmBits == 32) &&
      (base != 1 || (cmType == 1 && depth == 8 &&
        (cmBits == 24 || cmBits == 32))) &&
      (base != 2 || depth == 16 || depth == 24 || depth == 32) &&
      (base != 3 || depth == 8)
  }
}
