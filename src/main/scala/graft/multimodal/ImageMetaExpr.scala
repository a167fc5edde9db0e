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
  * parser), WebP, TIFF, netpbm, TGA, and the ISO-BMFF still images
  * AVIF/HEIC/HEIF (ftyp brand sniff + meta/iprp/ipco `ispe` walk —
  * see [[bmffImage]]). Unknown or truncated payloads yield
  * ("unknown", -1, -1)
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
    } else if (b.length >= 30 && b(0) == 'R' && b(1) == 'I' &&
        b(2) == 'F' && b(3) == 'F' && b(8) == 'W' && b(9) == 'E' &&
        b(10) == 'B' && b(11) == 'P') {
      // WebP (public RIFF container spec): the first chunk decides
      val tag = new String(b, 12, 4, "ISO-8859-1")
      tag match {
        case "VP8 " => // lossy: 3B frame tag, 9D012A sync, 14-bit dims
          if ((b(23) & 0xff) != 0x9d || (b(24) & 0xff) != 0x01 ||
              (b(25) & 0xff) != 0x2a) unknown
          else out("webp", le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff)
        case "VP8L" => // lossless: 0x2F sig, 14-bit w-1/h-1 LSB-packed
          if ((b(20) & 0xff) != 0x2f) unknown
          else {
            val w = ((b(21) & 0xff) | ((b(22) & 0x3f) << 8)) + 1
            val h = (((b(22) & 0xff) >> 6) | ((b(23) & 0xff) << 2) |
              ((b(24) & 0x0f) << 10)) + 1
            out("webp", w, h)
          }
        case "VP8X" => // extended: canvas w-1/h-1 as 24-bit LE
          val w = ((b(24) & 0xff) | ((b(25) & 0xff) << 8) |
            ((b(26) & 0xff) << 16)) + 1
          val h = ((b(27) & 0xff) | ((b(28) & 0xff) << 8) |
            ((b(29) & 0xff) << 16)) + 1
          out("webp", w, h)
        case _ => unknown
      }
    } else if (b.length >= 8 &&
        ((b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 42 && b(3) == 0) ||
         (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 42))) {
      // TIFF 6.0: IFD0 tags 256 (ImageWidth) / 257 (ImageLength),
      // SHORT or LONG, either byte order — the scanned-doc corpus
      // format (and the container EXIF rides in)
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
      var w = -1; var h = -1
      var e = 0
      while (e < n && (w < 0 || h < 0)) {
        val entry = base + 2 + e * 12
        if (entry + 12 > b.length) return unknown
        val tagId = u16(entry)
        if (tagId == 256 || tagId == 257) {
          val typ = u16(entry + 2)
          val v = typ match {
            case 3 => u16(entry + 8) // SHORT, left-justified
            case 4 => u32(entry + 8).toInt // LONG
            case _ => -1
          }
          if (tagId == 256) w = v else h = v
        }
        e += 1
      }
      if (w > 0 && h > 0) out("tiff", w, h) else unknown
    } else if (b.length >= 10 && b(0) == 'P' && b(1) >= '4' &&
        b(1) <= '6') {
      // binary netpbm: two whitespace/comment-separated header ints
      var i = 2
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
      val w = nextInt(); val h = nextInt()
      if (w > 0 && h > 0) out("pnm", w, h) else unknown
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0x0a) {
      // bare JPEG XL codestream: the SizeHeader follows the signature
      try jxlSize(b, 2, b.length) catch { case _: Exception => unknown }
    } else if (b.length >= 16 && b(4) == 'f' && b(5) == 't' &&
        b(6) == 'y' && b(7) == 'p') {
      try bmffImage(b) catch { case _: Exception => unknown }
    } else if (ImageDecodeExpr.icoEntries(b) != null) {
      // ICO favicon: the directory's largest entry (area, then
      // bitCount — the entry image_decode picks), 0-means-256 already
      // normalized by the shared parser
      val entries = ImageDecodeExpr.icoEntries(b)
      var bw = 0; var bh = 0; var bbpp = -1
      for (e <- entries) {
        val better = e(0).toLong * e(1) > bw.toLong * bh ||
          (e(0).toLong * e(1) == bw.toLong * bh && e(2) > bbpp)
        if (better) { bw = e(0); bh = e(1); bbpp = e(2) }
      }
      out("ico", bw, bh)
    } else if (ImageDecodeExpr.isTgaV2(b)) {
      // TGA v2 (footer-signed; no leading magic exists). Decode
      // parity: the shared structural gates (image type, depth,
      // color-map consistency) run here too, so a file image_decode
      // rejects — e.g. footer-signed with imgType 0 — never reports
      // dimensions from the meta surface.
      if (ImageDecodeExpr.tgaHeaderOk(b))
        out("tga", le16(b, 12), le16(b, 14))
      else unknown
    } else unknown
  }

  /** AVIF/HEIC metadata (ISO-BMFF still images, public ISO/IEC
    * 23008-12 HEIF layout — the modern web's fastest-growing image
    * formats): the `ftyp` brands sniff the family (avif/avis →
    * "avif"; heic/heix/heim/heis/hevc/hevx → "heic"; a bare
    * mif1/msf1 with no codec brand reports generic "heif"), and
    * dimensions come from the `meta`→`iprp`→`ipco` `ispe` property
    * (ImageSpatialExtents: u32 width/height after the fullbox word)
    * selected for the `pitm` primary item through the `ipma`
    * association table; when the association chain is absent or
    * doesn't resolve, the MAX over ispe boxes is reported (the
    * [[VideoMetaExpr]] max-over-tracks convention — thumbnails and
    * alpha planes are never larger than the primary image). Pixel
    * DECODE stays out of scope by design: the payload is AV1/HEVC
    * inter-prediction territory, the documented boundary class. */
  /** JPEG XL SizeHeader (public ISO/IEC 18181-1 layout) at `off`:
    * LSB-first bits — small(1); ysize = small ? (u(5)+1)*8 :
    * u(U32 9/13/18/30)+1; ratio(3) selects xsize from the table or 0
    * = explicit xsize in the same form. */
  private def jxlSize(b: Array[Byte], off: Int, end: Int): InternalRow = {
    var bitPos = 0
    def u(n: Int): Int = {
      var v = 0
      var k = 0
      var bad = false
      while (k < n && !bad) {
        val byteIdx = off + ((bitPos + k) >> 3)
        if (byteIdx >= end) bad = true
        else {
          v |= (((b(byteIdx) >> ((bitPos + k) & 7)) & 1) << k)
          k += 1
        }
      }
      if (bad) -1 else { bitPos += n; v }
    }
    def sizeVal(small: Boolean): Int =
      if (small) { val v = u(5); if (v < 0) -1 else (v + 1) * 8 }
      else {
        val sel = u(2)
        if (sel < 0) -1
        else {
          val bits = sel match {
            case 0 => 9; case 1 => 13; case 2 => 18; case _ => 30
          }
          val v = u(bits)
          if (v < 0) -1 else v + 1
        }
      }
    val small = u(1) == 1
    val h = sizeVal(small)
    if (h <= 0) return unknown
    val ratio = u(3)
    if (ratio < 0) return unknown
    val w =
      if (ratio == 0) sizeVal(small)
      else {
        val (num, den) = ratio match {
          case 1 => (1, 1)
          case 2 => (12, 10)
          case 3 => (4, 3)
          case 4 => (3, 2)
          case 5 => (16, 9)
          case 6 => (5, 4)
          case _ => (2, 1)
        }
        (h.toLong * num / den).toInt
      }
    if (w <= 0 || w > (1 << 28) || h > (1 << 28)) unknown
    else InternalRow(UTF8String.fromString("jxl"), w, h)
  }

  private def bmffImage(b: Array[Byte]): InternalRow = {
    var fmt: String = null
    var genericHeif = false
    var metaS = -1
    var metaE = -1
    var jxlcS = -1
    var jxlcE = -1
    val ok = Bmff.boxes(b, 0, b.length) { (typ, s, e) =>
      typ match {
        case "ftyp" =>
          // word 0 = major brand, word 1 = minor version (skipped),
          // words 2.. = compatible brands; a specific codec brand
          // anywhere in the list beats the generic heif brands
          var j = s
          var k = 0
          while (j + 4 <= e && fmt == null) {
            if (k != 1) {
              val brand = new String(b, j, 4, "ISO-8859-1")
              if (brand == "avif" || brand == "avis") fmt = "avif"
              else if (brand.startsWith("hei") || brand.startsWith("hev"))
                fmt = "heic"
              else if (brand == "jxl ") fmt = "jxl"
              else if (brand == "mif1" || brand == "msf1")
                genericHeif = true
            }
            j += 4; k += 1
          }
        case "meta" if metaS < 0 && e - s >= 4 =>
          metaS = s + 4 // meta is a fullbox: skip version/flags
          metaE = e
        case "jxlc" if jxlcS < 0 => jxlcS = s; jxlcE = e
        case "jxlp" if jxlcS < 0 && e - s > 4 =>
          // partial codestream: first box (index 0) holds the head
          jxlcS = s + 4; jxlcE = e
        case _ => ()
      }
    }
    if (fmt == "jxl") {
      // the container's codestream box carries the FF0A signature +
      // SizeHeader; dimensions come from there (no ispe required)
      if (ok && jxlcS >= 0 && jxlcE - jxlcS >= 4 &&
          (b(jxlcS) & 0xff) == 0xff && (b(jxlcS + 1) & 0xff) == 0x0a)
        return jxlSize(b, jxlcS + 2, jxlcE)
      return unknown
    }
    if (!ok || (fmt == null && !genericHeif) || metaS < 0) return unknown
    val format = if (fmt == null) "heif" else fmt
    var pitm = -1L
    var ipcoS = -1; var ipcoE = -1
    var ipmaS = -1; var ipmaE = -1
    var nestedOk = true
    nestedOk &&= Bmff.boxes(b, metaS, metaE) { (t2, s2, e2) =>
      t2 match {
        case "pitm" if e2 - s2 >= 6 =>
          val v = b(s2) & 0xff
          pitm = if (v == 0) Bmff.be16(b, s2 + 4).toLong
          else if (e2 - s2 >= 8) Bmff.be32(b, s2 + 4)
          else -1L
        case "iprp" =>
          nestedOk &&= Bmff.boxes(b, s2, e2) { (t3, s3, e3) =>
            if (t3 == "ipco") { ipcoS = s3; ipcoE = e3 }
            else if (t3 == "ipma") { ipmaS = s3; ipmaE = e3 }
          }
        case _ => ()
      }
    }
    if (!nestedOk || ipcoS < 0) return unknown
    // ipco children in order = properties, 1-indexed by ipma
    val props = scala.collection.mutable.ArrayBuffer[Option[(Int, Int)]]()
    if (!Bmff.boxes(b, ipcoS, ipcoE) { (t3, s3, e3) =>
      props += (if (t3 == "ispe" && e3 - s3 >= 12)
        Some((Bmff.be32(b, s3 + 4).toInt, Bmff.be32(b, s3 + 8).toInt))
      else None)
    }) return unknown
    var w = -1; var h = -1
    if (pitm >= 0 && ipmaS >= 0 && ipmaE - ipmaS >= 8) {
      val v = b(ipmaS) & 0xff
      val flags = ((b(ipmaS + 1) & 0xff) << 16) |
        ((b(ipmaS + 2) & 0xff) << 8) | (b(ipmaS + 3) & 0xff)
      val entryCount = Bmff.be32(b, ipmaS + 4)
      val idWidth = if (v < 1) 2 else 4
      val assocWidth = if ((flags & 1) == 1) 2 else 1
      var p = ipmaS + 8
      var entry = 0L
      while (entry < entryCount && p + idWidth + 1 <= ipmaE) {
        val itemId = if (v < 1) Bmff.be16(b, p).toLong else Bmff.be32(b, p)
        p += idWidth
        val assocCount = b(p) & 0xff
        p += 1
        var a = 0
        while (a < assocCount && p + assocWidth <= ipmaE) {
          val idx = if (assocWidth == 2) Bmff.be16(b, p) & 0x7fff
            else b(p) & 0x7f
          p += assocWidth
          if (w < 0 && itemId == pitm && idx >= 1 && idx <= props.length)
            props(idx - 1).foreach { case (pw, ph) => w = pw; h = ph }
          a += 1
        }
        entry += 1
      }
    }
    if (w < 0) // association chain absent/unresolved: MAX over ispe
      props.flatten.foreach { case (pw, ph) =>
        if (w < 0 || pw.toLong * ph > w.toLong * h) { w = pw; h = ph }
      }
    if (w <= 0 || h <= 0) unknown
    else InternalRow(UTF8String.fromString(format), w, h)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
