package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}

/** exif_orientation(payload): the EXIF orientation tag (1-8) from a
  * JPEG's APP1 segment or a WebP extended container's EXIF chunk, or
  * 0 when absent/unreadable — the pre-decode metadata a real
  * image-curation pass needs before any resize (web JPEGs from phones
  * are routinely stored rotated with orientation 3/6/8; training on
  * them un-rotated silently skews every visual model downstream).
  *
  * Pure byte walk (public JPEG + TIFF 6.0 + EXIF 2.3 layouts): marker
  * scan to APP1 with the "Exif\0\0" header (WebP: RIFF walk to the
  * EXIF chunk, whose raw TIFF blob may or may not keep that prefix),
  * TIFF endianness from the
  * II/MM byte-order mark, IFD0 entry scan for tag 0x0112 (SHORT).
  * Both endians supported; never throws (corpus policy) — malformed /
  * non-JPEG / EXIF-less payloads yield 0. Single-scan map-side
  * projection, zero shuffle, like the other byte-level metadata
  * expressions ([[ImageMetaExpr]], [[VideoMetaExpr]]).
  *
  * Reference analogue: the metadata-extraction stage of table-API
  * multimodal preprocessing. */
case class ExifOrientationExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "exif_orientation"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try walk(b) catch { case _: Exception => 0 }
  }

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def walk(b: Array[Byte]): Int = {
    // WebP extended container: the EXIF chunk holds the same raw TIFF
    // blob as a JPEG APP1 (minus the "Exif\0\0" prefix, though some
    // writers include it) — route it to the shared TIFF walk
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
        b(11) == 'P') {
      var result = 0
      WebpDecode.riffWalk(b, 12, b.length) { (tag, off, len) =>
        if (WebpDecode.tagIs(b, tag, "EXIF") && len >= 8) {
          val skip = if (len >= 14 && b(off) == 'E' && b(off + 1) == 'x' &&
            b(off + 2) == 'i' && b(off + 3) == 'f' && b(off + 4) == 0 &&
            b(off + 5) == 0) 6 else 0
          result = tiffOrientation(b, off + skip, off + len)
          false
        } else true
      }
      return result
    }
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return 0
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return 0
      while (i < b.length && (b(i) & 0xff) == 0xff) i += 1
      if (i >= b.length) return 0
      val marker = b(i) & 0xff; i += 1
      if (marker == 0xd9 || marker == 0xda) return 0 // EOI / scan data
      if (marker >= 0xd0 && marker <= 0xd7) () // RST: no payload
      else {
        if (i + 2 > b.length) return 0
        val len = u16be(b, i)
        if (len < 2 || i + len > b.length) return 0
        if (marker == 0xe1 && len >= 2 + 6 + 8 &&
            b(i + 2) == 'E' && b(i + 3) == 'x' && b(i + 4) == 'i' &&
            b(i + 5) == 'f' && b(i + 6) == 0 && b(i + 7) == 0)
          return tiffOrientation(b, i + 8, i + len)
        i += len
      }
    }
    0
  }

  /** TIFF 6.0 IFD0 scan for tag 0x0112 within [tiff, end). */
  private def tiffOrientation(b: Array[Byte], tiff: Int, end: Int): Int = {
    if (tiff + 8 > end) return 0
    val little =
      if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
      else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
      else return 0
    def u16(i: Int): Int =
      if (little) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (little) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    if (u16(tiff + 2) != 42) return 0
    val ifd0 = u32(tiff + 4)
    if (ifd0 < 8 || tiff + ifd0 + 2 > end) return 0
    val ifd = tiff + ifd0.toInt
    val n = u16(ifd)
    var e = 0
    while (e < n) {
      val entry = ifd + 2 + e * 12
      if (entry + 12 > end) return 0
      if (u16(entry) == 0x0112) {
        // SHORT count 1: the value sits in the entry's value field,
        // in the TIFF byte order, left-justified
        if (u16(entry + 2) != 3 || u32(entry + 4) != 1L) return 0
        val v = u16(entry + 8)
        return if (v >= 1 && v <= 8) v else 0
      }
      e += 1
    }
    0
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
