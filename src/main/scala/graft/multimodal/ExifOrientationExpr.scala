package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}

/** exif_orientation(payload): the EXIF orientation tag (1-8) from a
  * JPEG's APP1 segment, a WebP extended container's EXIF chunk, an
  * AVIF/HEIC META item (iinf/iloc walk — see [[bmffExif]]), or a bare
  * TIFF payload, or 0 when absent/unreadable — the pre-decode metadata a real
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
    // AVIF/HEIC: EXIF is a META item — iinf/iloc walk (ISO 23008-12)
    if (b.length >= 16 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' &&
        b(7) == 'p') return bmffExif(b)
    // bare TIFF payload (the scanned-document corpus format): the
    // shared walk applies directly
    if (b.length >= 8 && ((b(0) == 'I' && b(1) == 'I') ||
        (b(0) == 'M' && b(1) == 'M'))) return tiffOrientation(b, 0, b.length)
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

  /** HEIF/AVIF (ISO 23008-12): EXIF rides as a META item — `iinf`
    * names the item whose item_type is 'Exif' (infe versions 2/3),
    * `iloc` locates its bytes (construction_method 0 = absolute file
    * offsets, all three iloc versions, first extent), and the
    * ExifDataBlock (A.2.1) leads with a u32 exif_tiff_header_offset
    * before the TIFF blob — some writers also keep the JPEG-style
    * "Exif\0\0" prefix, tolerated exactly like the WebP chunk. */
  private def bmffExif(b: Array[Byte]): Int = {
    var metaS = -1; var metaE = -1
    if (!Bmff.boxes(b, 0, b.length) { (t, s, e) =>
      if (t == "meta" && metaS < 0 && e - s >= 4) { metaS = s + 4; metaE = e }
    }) return 0
    if (metaS < 0) return 0
    var iinfS = -1; var iinfE = -1; var ilocS = -1; var ilocE = -1
    Bmff.boxes(b, metaS, metaE) { (t, s, e) =>
      if (t == "iinf") { iinfS = s; iinfE = e }
      else if (t == "iloc") { ilocS = s; ilocE = e }
    }
    if (iinfS < 0 || ilocS < 0 || ilocE - ilocS < 8) return 0
    // iinf fullbox: u16 (v0) / u32 entry count, then infe children
    val infeStart = iinfS + 4 + (if ((b(iinfS) & 0xff) == 0) 2 else 4)
    var exifId = -1L
    Bmff.boxes(b, infeStart, iinfE) { (t, s, e) =>
      if (t == "infe" && exifId < 0) {
        val v = b(s) & 0xff
        // v2: fullbox + id(2) + protection(2) + type(4) = 12-byte min;
        // v3 widens the id to 4 bytes
        if (v == 2 && e - s >= 12) {
          if (new String(b, s + 8, 4, "ISO-8859-1") == "Exif")
            exifId = Bmff.be16(b, s + 4).toLong
        } else if (v == 3 && e - s >= 14) {
          if (new String(b, s + 10, 4, "ISO-8859-1") == "Exif")
            exifId = Bmff.be32(b, s + 4)
        }
      }
    }
    if (exifId < 0) return 0
    val lv = b(ilocS) & 0xff
    val offSize = (b(ilocS + 4) >> 4) & 0xf
    val lenSize = b(ilocS + 4) & 0xf
    val baseSize = (b(ilocS + 5) >> 4) & 0xf
    val idxSize = if (lv == 1 || lv == 2) b(ilocS + 5) & 0xf else 0
    def readN(pos: Int, n: Int): Long = {
      var v = 0L; var k = 0
      while (k < n) { v = (v << 8) | (b(pos + k) & 0xff); k += 1 }
      v
    }
    var p = ilocS + 6
    val itemCount =
      if (lv < 2) { val c = Bmff.be16(b, p); p += 2; c }
      else { val c = Bmff.be32(b, p).toInt; p += 4; c }
    var found = -1L; var foundLen = -1L
    var it = 0
    while (it < itemCount && found < 0 && p < ilocE) {
      val id = if (lv < 2) { val v = Bmff.be16(b, p); p += 2; v.toLong }
        else { val v = Bmff.be32(b, p); p += 4; v }
      var method = 0
      if (lv == 1 || lv == 2) { method = Bmff.be16(b, p) & 0xf; p += 2 }
      p += 2 // data_reference_index (0 = this file)
      val base = readN(p, baseSize); p += baseSize
      val extents = Bmff.be16(b, p); p += 2
      var ex = 0
      while (ex < extents) {
        p += idxSize
        val eo = readN(p, offSize); p += offSize
        val el = readN(p, lenSize); p += lenSize
        if (ex == 0 && id == exifId && method == 0) {
          found = base + eo; foundLen = el
        }
        ex += 1
      }
      it += 1
    }
    if (found < 4 || foundLen < 12 || found + foundLen > b.length) return 0
    val itemS = found.toInt
    val end = (found + foundLen).toInt
    val tiffOff = ((b(itemS) & 0xffL) << 24) | ((b(itemS + 1) & 0xffL) << 16) |
      ((b(itemS + 2) & 0xffL) << 8) | (b(itemS + 3) & 0xffL)
    if (tiffOff < 0 || itemS + 4 + tiffOff > end - 8) return 0
    var pos = itemS + 4 + tiffOff.toInt
    if (pos + 6 <= end && b(pos) == 'E' && b(pos + 1) == 'x' &&
        b(pos + 2) == 'i' && b(pos + 3) == 'f' && b(pos + 4) == 0 &&
        b(pos + 5) == 0) pos += 6
    tiffOrientation(b, pos, end)
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
