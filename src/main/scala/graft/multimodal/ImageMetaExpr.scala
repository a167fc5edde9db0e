package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** image_meta(payload): REAL image metadata extraction from raw bytes —
  * container-format sniffing (magic numbers) plus the header walk that
  * yields pixel dimensions, with NO codec dependency: these fields live
  * in fixed positions of the container headers, so a corpus-wide media
  * inventory (format histogram, resolution distribution, aspect-ratio
  * filters, decode-cost estimation) runs as a pure map-side projection
  * over the binary column — the standard first pass of a multimodal
  * training-data pipeline, long before any pixel decode.
  *
  * Formats: PNG (IHDR big-endian dims), GIF87a/89a (little-endian
  * logical screen), BMP (BITMAPINFOHEADER little-endian, top-down
  * negative heights normalized), JPEG (marker walk to the first SOF0/
  * 1/2 frame header — skips APPn/EXIF/quant tables like any real
  * parser). Unknown or truncated payloads yield ("unknown", -1, -1)
  * rather than failing the scan: at corpus scale a malformed file must
  * never kill the job (it gets filtered by the format column instead).
  *
  * Output: struct<format: string, width: int, height: int>. The pixel
  * decode for the byte-level formats (PNG/BMP) is [[ImageDecodeExpr]];
  * this metadata pass covers JPEG/GIF too, whose entropy-coded pixels
  * stay out of scope. */
case class ImageMetaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def prettyName: String = "image_meta"

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private val unknown = InternalRow(UTF8String.fromString("unknown"), -1, -1)

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    def out(fmt: String, w: Int, h: Int): InternalRow =
      InternalRow(UTF8String.fromString(fmt), w, h)
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
        (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a) {
      // chunk 1 must be IHDR: length(4) type(4)=IHDR width(4) height(4)
      if (b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
        out("png", be32(b, 16), be32(b, 20))
      else unknown
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      out("gif", le16(b, 6), le16(b, 8))
    } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      // BITMAPINFOHEADER: i32 width at 18, i32 height at 22 (negative =
      // top-down row order; dimension is the magnitude)
      out("bmp", le32(b, 18), math.abs(le32(b, 22)))
    } else if (b.length >= 4 &&
        (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: walk marker segments to the first start-of-frame
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return unknown
        val marker = b(i + 1) & 0xff
        if (marker == 0xd9) return unknown // EOI before any SOF
        if (marker == 0xd8 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) {
          i += 2 // standalone markers (RSTn/TEM) carry no length
        } else if (marker == 0xda) {
          // SOS before any SOF: entropy-coded data follows and stray
          // FF Cx byte pairs inside it would parse as bogus dimensions
          // — stop rather than walk past it.
          return unknown
        } else if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // Any SOFn (baseline/progressive/lossless/arithmetic; C4=DHT,
          // C8=JPG, CC=DAC are not frames): len(2) precision(1)
          // height(2) width(2) — the frame header layout is shared by
          // all SOFn variants.
          if (i + 8 < b.length)
            return out("jpeg", be16(b, i + 7), be16(b, i + 5))
          else return unknown
        } else {
          if (i + 3 >= b.length) return unknown
          val len = be16(b, i + 2)
          if (len < 2) return unknown
          i += 2 + len
        }
      }
      unknown
    } else unknown
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
