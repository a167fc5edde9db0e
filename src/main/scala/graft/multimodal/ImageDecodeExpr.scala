package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** image_decode(payload): REAL pixel decode for the stored-image
  * formats whose codecs are pure byte/bit manipulation — PNG (all five
  * scanline filters, gray / RGB / palette / gray-alpha / RGBA at bit
  * depth 8, zlib inflate via the JDK's java.util.zip.Inflater) and BMP
  * (BITMAPINFOHEADER, 24/32 bpp uncompressed, bottom-up and top-down).
  * This closes the one stub the metadata pass ([[ImageMetaExpr]]) left
  * open: resize / crop / feature pipelines downstream of this
  * expression operate on real pixels with plain Spark higher-order
  * functions (see [[Multimodal.resizeDecoded]]).
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
  * Deliberately unsupported (→ unknown): JPEG/GIF pixels (DCT and LZW
  * entropy coders — use the metadata pass + an external transcoder),
  * PNG interlace (Adam7), bit depths other than 8. PNG chunk CRCs are
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

  private def decode(b: Array[Byte]): InternalRow = {
    if (b.length >= 8 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
        (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a) png(b)
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') bmp(b)
    else unknown
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
    if (w <= 0 || h <= 0 || depth != 8 || interlace != 0) return unknown
    if (w.toLong * h > MaxPixels) return unknown // decompression bomb
    val channels = colorType match {
      case 0 => 1 // gray
      case 2 => 3 // rgb
      case 3 => 1 // palette index
      case 4 => 2 // gray + alpha
      case 6 => 4 // rgba
      case _ => return unknown
    }
    if (colorType == 3 && palette == null) return unknown
    if (colorType == 3 && trns != null) {
      var p = 0
      while (p < trns.length && p < palette.length) {
        palette(p) = (palette(p) & 0x00ffffff) | ((trns(p) & 0xff) << 24)
        p += 1
      }
    }
    val stride = w * channels
    val rawLen = (stride + 1) * h // +1 filter byte per scanline
    val raw = inflate(idat.toByteArray, rawLen)
    if (raw == null) return unknown
    // undo per-scanline filters in place (RFC 2083 §6)
    val px = new Array[Int](w * h)
    val prev = new Array[Byte](stride)
    val cur = new Array[Byte](stride)
    var y = 0
    while (y < h) {
      val off = y * (stride + 1)
      val filter = raw(off) & 0xff
      System.arraycopy(raw, off + 1, cur, 0, stride)
      filter match {
        case 0 => ()
        case 1 => // Sub: + left (bpp back)
          var x = channels
          while (x < stride) {
            cur(x) = (cur(x) + cur(x - channels)).toByte; x += 1
          }
        case 2 => // Up
          var x = 0
          while (x < stride) { cur(x) = (cur(x) + prev(x)).toByte; x += 1 }
        case 3 => // Average
          var x = 0
          while (x < stride) {
            val left = if (x >= channels) cur(x - channels) & 0xff else 0
            cur(x) = (cur(x) + ((left + (prev(x) & 0xff)) >> 1)).toByte
            x += 1
          }
        case 4 => // Paeth
          var x = 0
          while (x < stride) {
            val a = if (x >= channels) cur(x - channels) & 0xff else 0
            val bb = prev(x) & 0xff
            val c = if (x >= channels) prev(x - channels) & 0xff else 0
            val p = a + bb - c
            val pa = math.abs(p - a); val pb = math.abs(p - bb)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
            cur(x) = (cur(x) + pred).toByte
            x += 1
          }
        case _ => return unknown
      }
      var x = 0
      while (x < w) {
        val o = x * channels
        px(y * w + x) = colorType match {
          case 0 =>
            val g = cur(o) & 0xff
            0xff000000 | (g << 16) | (g << 8) | g
          case 2 =>
            0xff000000 | ((cur(o) & 0xff) << 16) |
              ((cur(o + 1) & 0xff) << 8) | (cur(o + 2) & 0xff)
          case 3 =>
            val idx = cur(o) & 0xff
            if (idx >= palette.length) return unknown
            palette(idx)
          case 4 =>
            val g = cur(o) & 0xff
            ((cur(o + 1) & 0xff) << 24) | (g << 16) | (g << 8) | g
          case _ => // 6
            ((cur(o + 3) & 0xff) << 24) | ((cur(o) & 0xff) << 16) |
              ((cur(o + 1) & 0xff) << 8) | (cur(o + 2) & 0xff)
        }
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    out("png", w, h, px)
  }

  /** Inflate exactly `expected` bytes; tolerant of a missing/garbled
    * Adler32 trailer (decode is complete once the scanlines are out).
    * Returns null on a short or corrupt stream. */
  private def inflate(z: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(z)
      val outB = new Array[Byte](expected)
      var got = 0
      var stalled = false
      while (got < expected && !stalled) {
        val n = inf.inflate(outB, got, expected - got)
        if (n == 0 && (inf.finished() || inf.needsInput() ||
            inf.needsDictionary())) stalled = true
        got += n
      }
      if (got == expected) outB else null
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  // ---------------------------------------------------------------- BMP
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
    if (w <= 0 || h <= 0 || compression != 0 ||
        (bpp != 24 && bpp != 32)) return unknown
    if (w.toLong * h > MaxPixels) return unknown
    val bytesPerPx = bpp / 8
    val stride = ((w * bytesPerPx + 3) / 4) * 4 // rows pad to 4 bytes
    if (dataOff < 0 || dataOff.toLong + stride.toLong * h > b.length)
      return unknown
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val off = dataOff + srcRow * stride
      var x = 0
      while (x < w) {
        val o = off + x * bytesPerPx
        // stored order B,G,R[,A]; the 24bpp alpha is opaque, the 32bpp
        // 4th byte is taken as alpha (writers that leave the reserved
        // byte zero should be routed through the 24bpp path)
        val a = if (bpp == 32) (b(o + 3) & 0xff) << 24 else 0xff000000
        px(y * w + x) = a | ((b(o + 2) & 0xff) << 16) |
          ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
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
}
