package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** video_meta(payload): REAL video-container metadata from raw bytes —
  * the video analogue of [[ImageMetaExpr]]: an ISO BMFF (MP4/MOV) box
  * walk to the movie header and track headers, no codec. Corpus
  * inventory over a video column (duration histograms, resolution
  * filters, track counts, decode-cost estimation) runs as a map-side
  * projection long before any frame decode.
  *
  * Parsed boxes (public ISO/IEC 14496-12 layout):
  *  - `ftyp` → major brand ("isom", "mp42", "qt  ", …) reported as the
  *    format string (trimmed);
  *  - `moov`/`mvhd` (version 0 and 1) → timescale + duration →
  *    duration_ms;
  *  - every `moov`/`trak`/`tkhd` (version 0 and 1) → width/height as
  *    16.16 fixed point; the reported dimensions are the MAX over
  *    tracks (audio tracks carry 0×0), `tracks` counts the trak boxes.
  *
  * 64-bit largesize boxes are followed; size-0 (to-EOF) boxes are
  * bounded by the payload. Malformed / truncated / non-BMFF payloads
  * yield ("unknown", -1, -1, -1, -1) — the never-throw corpus policy
  * shared with the other byte-level parsers. Frame DECODE is out of
  * scope by design (H.264/HEVC entropy coding — external transcoder
  * territory, like JPEG's DCT). */
case class VideoMetaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("tracks", IntegerType, nullable = false)))
  override def prettyName: String = "video_meta"

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private val unknown =
    InternalRow(UTF8String.fromString("unknown"), -1L, -1, -1, -1)

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      if (b.length >= 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
          (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3) mkvMeta(b)
      else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' &&
          b(2) == 'F' && b(3) == 'F' && b(8) == 'W' && b(9) == 'E' &&
          b(10) == 'B' && b(11) == 'P') webpAnimMeta(b)
      else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
          b(2) == 'N' && b(3) == 'G') apngMeta(b)
      else walk(b)
    } catch { case _: Exception => unknown }
  }

  /** Animated WebP: format "webp"; width/height = the VP8X canvas
    * (24-bit minus-one fields); duration_ms = the sum of ANMF frame
    * durations; tracks = 1 (one video stream — the frame count is
    * video_frame's `frames` output). A WebP without ANMF chunks is a
    * still image (image_meta's domain) → unknown. */
  private def webpAnimMeta(b: Array[Byte]): InternalRow = {
    def le24(i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
    val riffEnd = math.min(b.length.toLong,
      8L + (le24(4) | ((b(7) & 0xff).toLong << 24))).toInt
    var w = -1
    var h = -1
    var frames = 0
    var durationMs = 0L
    val ok = WebpDecode.riffWalk(b, 12, riffEnd) { (tag, off, len) =>
      if (WebpDecode.tagIs(b, tag, "VP8X") && len >= 10) {
        w = le24(off + 4) + 1
        h = le24(off + 7) + 1
      } else if (WebpDecode.tagIs(b, tag, "ANMF") && len >= 16) {
        frames += 1
        durationMs += le24(off + 12)
      }
      true
    }
    // ANMF frames with no (spec-mandatory) VP8X canvas header is a
    // malformed container — the unknown row, not -1×-1 dimensions
    if (!ok || frames == 0 || w < 0) unknown
    else InternalRow(UTF8String.fromString("webp"), durationMs, w, h, 1)
  }

  /** APNG (PNG acTL/fcTL/fdAT animation chunks): format "apng";
    * width/height = the IHDR canvas; duration_ms = the sum of fcTL
    * delays (delay_num/delay_den seconds, a zero denominator meaning
    * 1/100 s per the spec); tracks = 1 — the frame count is
    * video_frame's `frames` output, the ANMF symmetry. A still PNG
    * (no acTL, or acTL with no fcTL) is an image → unknown. */
  private def apngMeta(b: Array[Byte]): InternalRow = {
    def be32i(i: Int): Int = ((b(i) & 0xff) << 24) |
      ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) |
      (b(i + 3) & 0xff)
    var i = 8
    var w = -1; var h = -1
    var hasActl = false
    var frames = 0
    var durationMs = 0L
    var end = false
    while (!end && i + 8 <= b.length) {
      val len = be32i(i)
      if (len < 0 || i + 12L + len > b.length) return unknown
      val ds = i + 8
      new String(b, i + 4, 4, "ISO-8859-1") match {
        case "IHDR" => if (len >= 13 && w < 0) { w = be32i(ds); h = be32i(ds + 4) }
        case "acTL" => hasActl = true
        case "fcTL" =>
          if (len < 26) return unknown
          frames += 1
          val num = be16(b, ds + 20)
          val den = { val d = be16(b, ds + 22); if (d == 0) 100 else d }
          durationMs += num * 1000L / den
        case "IEND" => end = true
        case _ => ()
      }
      i = ds + len + 4
    }
    if (!hasActl || frames == 0 || w <= 0 || h <= 0) unknown
    else InternalRow(UTF8String.fromString("apng"), durationMs, w, h, 1)
  }

  /** Matroska/WebM metadata ([[Ebml]] primitives, RFC 8794 + the
    * public Matroska element registry): format = the EBML header's
    * DocType ("webm"/"matroska"); duration_ms = Info/Duration (an
    * EBML FLOAT counted in TimestampScale units, default 1 ms) —
    * absent duration reports -1 (live/streamed captures); dimensions
    * = MAX over TrackEntry/Video PixelWidth/PixelHeight; `tracks`
    * counts TrackEntry elements. A payload without a parseable Info
    * element is unknown (the same one-error policy as the BMFF walk —
    * mvhd there, Info here). */
  private def mkvMeta(b: Array[Byte]): InternalRow = {
    var docType = "matroska" // the registry default when DocType absent
    var durationMs = -1L
    var w = 0
    var h = 0
    var tracks = 0
    var sawInfo = false
    Ebml.walk(b, 0, b.length) { (id, s, e) =>
      if (id == 0x1a45dfa3L) { // EBML header
        Ebml.walk(b, s, e) { (id2, s2, e2) =>
          if (id2 == 0x4282L) // DocType
            docType = new String(b, s2, e2 - s2, "ISO-8859-1")
              .takeWhile(_ != 0.toChar)
        }
      } else if (id == 0x18538067L) { // Segment
        Ebml.walk(b, s, e) { (id2, s2, e2) =>
          if (id2 == 0x1549a966L) { // Info
            var tsScale = 1000000L // default: 1 ms per unit
            var dur = -1.0
            Ebml.walk(b, s2, e2) { (id3, s3, e3) =>
              if (id3 == 0x2ad7b1L) tsScale = Ebml.uint(b, s3, e3)
              else if (id3 == 0x4489L) dur = Ebml.float(b, s3, e3)
            }
            sawInfo = true
            if (dur >= 0 && tsScale > 0)
              durationMs = (dur * tsScale / 1e6).toLong
          } else if (id2 == 0x1654ae6bL) { // Tracks
            Ebml.walk(b, s2, e2) { (id3, s3, e3) =>
              if (id3 == 0xaeL) { // TrackEntry
                tracks += 1
                Ebml.walk(b, s3, e3) { (id4, s4, e4) =>
                  if (id4 == 0xe0L) // Video settings
                    Ebml.walk(b, s4, e4) { (id5, s5, e5) =>
                      if (id5 == 0xb0L)
                        w = math.max(w, Ebml.uint(b, s5, e5).toInt)
                      else if (id5 == 0xbaL)
                        h = math.max(h, Ebml.uint(b, s5, e5).toInt)
                    }
                }
              }
            }
          }
        }
      }
    }
    if (!sawInfo) unknown
    else InternalRow(UTF8String.fromString(docType), durationMs, w, h,
      tracks)
  }

  /** (payload offset, header length, body end) of each box in
    * [from, to), streamed to `f`; returns false on malformed sizes. */
  private def boxes(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Boolean = {
    var i = from
    while (i + 8 <= to) {
      val size32 = be32(b, i)
      val typ = new String(b, i + 4, 4, "ISO-8859-1")
      val (bodyStart, end) =
        if (size32 == 1L) {
          if (i + 16 > to) return false
          val sz = be64(b, i + 8)
          if (sz < 16 || i + sz > to) return false
          (i + 16, i + sz.toInt)
        } else if (size32 == 0L) (i + 8, to) // to end of enclosing box
        else {
          if (size32 < 8 || i + size32 > to) return false
          (i + 8, i + size32.toInt)
        }
      f(typ, bodyStart, end)
      i = end
    }
    true
  }

  private def walk(b: Array[Byte]): InternalRow = {
    if (b.length < 12) return unknown
    // the first box must be ftyp (BMFF requirement for files)
    if (be32(b, 0) < 16 || new String(b, 4, 4, "ISO-8859-1") != "ftyp")
      return unknown
    var brand: String = null
    var durationMs = -1L
    var w = 0; var h = 0; var tracks = 0
    var sawMvhd = false
    // Interior corruption (a malformed size inside moov/trak) must map
    // to the same unknown row as top-level corruption — one error
    // policy per payload, so nested boxes() results accumulate here.
    var nestedOk = true
    val ok = boxes(b, 0, b.length) { (typ, s, e) =>
      typ match {
        case "ftyp" =>
          if (brand == null && e - s >= 4)
            brand = new String(b, s, 4, "ISO-8859-1").trim
        case "moov" =>
          nestedOk &&= boxes(b, s, e) { (t2, s2, e2) =>
            t2 match {
              case "mvhd" if e2 - s2 >= 24 =>
                val v = b(s2) & 0xff
                val (timescale, duration) =
                  if (v == 1 && e2 - s2 >= 32)
                    (be32(b, s2 + 20), be64(b, s2 + 24))
                  else (be32(b, s2 + 12), be32(b, s2 + 16))
                if (timescale > 0) {
                  // all-ones duration = "unknown" per ISO 14496-12 §8.2.2
                  val unknownDur =
                    if (v == 1) duration == -1L else duration == 0xffffffffL
                  durationMs =
                    if (unknownDur) -1L else duration * 1000L / timescale
                  sawMvhd = true
                }
              case "trak" =>
                tracks += 1
                nestedOk &&= boxes(b, s2, e2) { (t3, s3, e3) =>
                  if (t3 == "tkhd" && e3 - s3 >= 84) {
                    val v = b(s3) & 0xff
                    val off = if (v == 1) 88 else 76
                    if (e3 - s3 >= off + 8) {
                      // 16.16 fixed point; integer part only
                      w = math.max(w, be16(b, s3 + off))
                      h = math.max(h, be16(b, s3 + off + 4))
                    }
                  }
                }
              case _ => ()
            }
          }
        case _ => () // mdat / free / skipped boxes
      }
    }
    if (!ok || !nestedOk || brand == null || !sawMvhd) unknown
    else InternalRow(UTF8String.fromString(brand), durationMs, w, h, tracks)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
