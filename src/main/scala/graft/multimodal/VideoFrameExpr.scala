package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** video_frame(payload, n): the n-th (0-based) video frame of a
  * Motion-JPEG or VP8/WebM video, decoded to real pixels, plus the
  * total frame count — the REAL video frame-sampling path. MJPEG
  * stores every frame as a standalone JPEG, so the pinned-integer
  * [[JpegDecode]] pipeline applies per frame; VP8 keyframes route to
  * the libwebp-pinned [[Vp8Decode]], covering WebM stills and the
  * keyframe slots of real WebM videos. Only INTER-coded frames
  * (H.264/HEVC/VP8-interframe motion compensation) remain behind the
  * temporal-prediction boundary — a sampled interframe yields the
  * unknown row.
  *
  * Three container walks, all public layouts:
  *  - AVI (RIFF): nested LISTs to 'movi', frames in '..dc'/'..db'
  *    chunks (word-aligned), 'rec ' grouping LISTs descended in order.
  *  - MP4/MOV (ISO/IEC 14496-12 BMFF): the sample-table route —
  *    moov/trak/mdia/minf/stbl with an stsd whose first entry is a
  *    'jpeg' visual sample entry selects the track; stsc chunk runs ×
  *    stco/co64 absolute chunk offsets × stsz sizes enumerate the
  *    samples in media order; frame n is sample n.
  *  - MKV/WebM (Matroska EBML): Tracks/TrackEntry with CodecID
  *    "V_MJPEG" or "V_VP8" selects the track number; Cluster
  *    SimpleBlocks (and Blocks in BlockGroups) of that track, in
  *    cluster order, are the frames. Laced blocks map to unknown.
  *  - Animated WebP (RIFF): ANMF chunks in container order are the
  *    frames, each decoded standalone from its ALPH?+VP8/VP8L
  *    sub-chunks (no canvas compositing).
  *  - APNG (PNG acTL/fcTL/fdAT): fcTL chunks are the frames, each
  *    re-assembled as a standalone PNG and decoded through the
  *    shared PNG pipeline (no canvas compositing — see [[apngWalk]]).
  *
  * In every container the chosen frame is verified by its bitstream
  * magic (JPEG SOI / VP8 keyframe tag + sync code) rather than
  * trusting the declared codec — corpus files lie. Unrecognized
  * payloads in the chosen slot, out-of-range n, or malformed
  * containers yield the unknown row (never-throw corpus policy). The
  * [[ImageDecodeExpr.MaxPixels]] bomb guard applies to the decoded
  * frame.
  *
  * Output: struct<format, width, height, frames, pixels> with format
  * "mjpeg"/"vp8" (the codec — container-independent). Scale shape:
  * single-scan map-side projection — a stride frame-sample stage is
  * `video_frame(payload, k * stride)` per row, zero shuffle.
  *
  * Reference analogue: the frame-sample stage of table-API multimodal
  * preprocessing. */
case class VideoFrameExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  import ImageDecodeExpr.MaxPixels

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = true)))
  override def prettyName: String = "video_frame"

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "ISO-8859-1")

  private val unknown =
    InternalRow(UTF8String.fromString("unknown"), -1, -1, -1, null)

  override protected def nullSafeEval(payload: Any, idx: Any): Any = {
    val b = payload.asInstanceOf[Array[Byte]]
    val n = idx.asInstanceOf[Int]
    try {
      if (n >= 0 && b.length >= 12 &&
          fourcc(b, 4) == "ftyp") mp4Walk(b, n)
      else if (n >= 0 && b.length >= 4 && (b(0) & 0xff) == 0x1a &&
          (b(1) & 0xff) == 0x45 && (b(2) & 0xff) == 0xdf &&
          (b(3) & 0xff) == 0xa3) mkvWalk(b, n)
      else if (n >= 0 && b.length >= 12 && fourcc(b, 0) == "RIFF" &&
          fourcc(b, 8) == "WEBP") webpAnimWalk(b, n)
      else if (n >= 0 && b.length >= 8 && (b(0) & 0xff) == 0x89 &&
          b(1) == 'P' && b(2) == 'N' && b(3) == 'G') apngWalk(b, n)
      else walk(b, n)
    } catch { case _: Exception => unknown }
  }

  /** Animated WebP: each ANMF chunk carries one frame as a 16-byte
    * position/size/duration/flags header followed by the frame's own
    * ALPH?+VP8/VP8L sub-chunks — frame n decodes STANDALONE through
    * [[WebpDecode.decodeChunks]] (canvas compositing of partial
    * frames with blending/disposal is out of scope; the dominant
    * corpus shape is full-canvas frames). Non-animated WebP (no ANMF)
    * is an image, not a video — unknown here, image_decode's job. */
  private def webpAnimWalk(b: Array[Byte], want: Int): InternalRow = {
    val riffEnd = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
    var frames = 0
    var foundOff = -1
    var foundEnd = -1
    var bad = false
    val ok = WebpDecode.riffWalk(b, 12, riffEnd) { (tag, off, len) =>
      if (WebpDecode.tagIs(b, tag, "ANMF")) {
        if (len < 16) { bad = true; false }
        else {
          if (frames == want) { foundOff = off + 16; foundEnd = off + len }
          frames += 1
          true
        }
      } else true
    }
    if (!ok || bad || foundOff < 0) return unknown
    WebpDecode.decodeChunks(b, foundOff, foundEnd, MaxPixels) match {
      case Some(r) => InternalRow(UTF8String.fromString("webp"),
        r.width, r.height, frames, new GenericArrayData(r.pixels))
      case None => unknown
    }
  }

  /** APNG (the public acTL/fcTL/fdAT animation chunks, part of the
    * W3C PNG-3 spec): fcTL chunks in container order are the frames —
    * the IDAT image belongs to the animation only when an fcTL
    * precedes it (otherwise it is the non-animated default image and
    * fdAT frames start at index 0 regardless). Frame n decodes
    * STANDALONE by re-assembling a minimal PNG — IHDR patched to the
    * fcTL dimensions, PLTE/tRNS carried over, the frame's IDAT/fdAT
    * payloads concatenated as one IDAT — through the shared
    * [[ImageDecodeExpr]] PNG pipeline (inflate + unfilter + bomb
    * guard). Canvas compositing with x/y offsets, dispose and blend
    * ops is out of scope — the ANMF convention; the dominant corpus
    * shape is full-canvas frames. A still PNG (no acTL) is an image,
    * not a video — unknown here, image_decode's job. */
  private def apngWalk(b: Array[Byte], want: Int): InternalRow = {
    def be32i(i: Int): Int = ((b(i) & 0xff) << 24) |
      ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    var i = 8
    var ihdrS = -1
    var hasActl = false
    var plteS = -1; var plteE = -1
    var trnsS = -1; var trnsE = -1
    var frames = 0
    var curIsWant = false
    var wantW = -1; var wantH = -1
    val parts = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var end = false
    while (!end && i + 8 <= b.length) {
      val len = be32i(i)
      if (len < 0 || i + 12L + len > b.length) return unknown
      val typ = fourcc(b, i + 4)
      val ds = i + 8; val de = ds + len
      typ match {
        case "IHDR" => if (len >= 13 && ihdrS < 0) ihdrS = ds
        case "acTL" => hasActl = true
        case "PLTE" => if (plteS < 0) { plteS = ds; plteE = de }
        case "tRNS" => if (trnsS < 0) { trnsS = ds; trnsE = de }
        case "fcTL" =>
          if (len < 26) return unknown
          curIsWant = frames == want
          if (curIsWant) { wantW = be32i(ds + 4); wantH = be32i(ds + 8) }
          frames += 1
        case "IDAT" => // a frame only when an fcTL already opened one
          if (frames > 0 && curIsWant) parts += ((ds, de))
        case "fdAT" => // 4-byte sequence number, then raw IDAT data
          if (len < 4) return unknown
          if (curIsWant) parts += ((ds + 4, de))
        case "IEND" => end = true
        case _ => ()
      }
      i = de + 4 // skip CRC
    }
    if (!hasActl || frames == 0 || want >= frames || ihdrS < 0 ||
        parts.isEmpty || wantW <= 0 || wantH <= 0) return unknown
    // minimal PNG re-assembly; the shared decoder tolerates zero CRCs
    val dataLen = parts.map(p => p._2 - p._1).sum
    val palLen = if (plteS < 0) 0 else 12 + (plteE - plteS)
    val trnLen = if (trnsS < 0) 0 else 12 + (trnsE - trnsS)
    val synth = new Array[Byte](8 + 25 + palLen + trnLen +
      12 + dataLen + 12)
    var o = 0
    def put(bytes: Array[Byte]): Unit = {
      System.arraycopy(bytes, 0, synth, o, bytes.length)
      o += bytes.length
    }
    def chunkHead(len: Int, typ: String): Unit = {
      synth(o) = (len >> 24).toByte; synth(o + 1) = (len >> 16).toByte
      synth(o + 2) = (len >> 8).toByte; synth(o + 3) = len.toByte
      o += 4
      var k = 0
      while (k < 4) { synth(o + k) = typ.charAt(k).toByte; k += 1 }
      o += 4
    }
    def copyRange(s: Int, e: Int): Unit = {
      System.arraycopy(b, s, synth, o, e - s); o += e - s
    }
    put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    chunkHead(13, "IHDR")
    copyRange(ihdrS, ihdrS + 13)
    // patch the frame's own dimensions over the canvas dimensions
    synth(o - 13) = (wantW >> 24).toByte; synth(o - 12) = (wantW >> 16).toByte
    synth(o - 11) = (wantW >> 8).toByte; synth(o - 10) = wantW.toByte
    synth(o - 9) = (wantH >> 24).toByte; synth(o - 8) = (wantH >> 16).toByte
    synth(o - 7) = (wantH >> 8).toByte; synth(o - 6) = wantH.toByte
    o += 4 // zero CRC
    if (plteS >= 0) { chunkHead(plteE - plteS, "PLTE")
      copyRange(plteS, plteE); o += 4 }
    if (trnsS >= 0) { chunkHead(trnsE - trnsS, "tRNS")
      copyRange(trnsS, trnsE); o += 4 }
    chunkHead(dataLen, "IDAT")
    parts.foreach { case (s, e) => copyRange(s, e) }
    o += 4
    chunkHead(0, "IEND")
    val r = ImageDecodeExpr.standalone.decode(synth)
    if (r.getUTF8String(0).toString != "png") unknown
    else InternalRow(UTF8String.fromString("apng"),
      r.getInt(1), r.getInt(2), frames, r.getArray(3))
  }

  /** Decode + emit once the frame slot is located (shared tail of all
    * three container walks): SOI check, full JPEG pipeline. */
  private def emit(b: Array[Byte], off: Int, len: Int,
      frames: Int): InternalRow = {
    if (len < 4 || off < 0 || off.toLong + len > b.length) return unknown
    if ((b(off) & 0xff) == 0xff && (b(off + 1) & 0xff) == 0xd8) {
      val frame = java.util.Arrays.copyOfRange(b, off, off + len)
      val r = JpegDecode.decode(frame, MaxPixels)
      if (r == null) unknown
      else InternalRow(UTF8String.fromString("mjpeg"), r.width,
        r.height, frames, new GenericArrayData(r.pixels))
    } else if (len >= 10 && (b(off) & 1) == 0 &&
        (b(off + 3) & 0xff) == 0x9d && (b(off + 4) & 0xff) == 0x01 &&
        (b(off + 5) & 0xff) == 0x2a) {
      // VP8 keyframe (RFC 6386 frame tag + sync code) — the WebM
      // still/keyframe route; interframes fail the tag's keyframe
      // bit above and stay unknown (temporal prediction boundary)
      Vp8Decode.decode(b, off, len, MaxPixels) match {
        case Some(yuv) => InternalRow(UTF8String.fromString("vp8"),
          yuv.width, yuv.height, frames,
          new GenericArrayData(Vp8Decode.toArgb(yuv)))
        case None => unknown
      }
    } else unknown
  }

  private def walk(b: Array[Byte], want: Int): InternalRow = {
    if (want < 0 || b.length < 24 || fourcc(b, 0) != "RIFF" ||
        fourcc(b, 8) != "AVI ") return unknown
    val riffEnd = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
    // locate the movi LIST (top-level chunk scan)
    var i = 12
    var movi = -1; var moviEnd = -1
    while (movi < 0 && i + 8 <= riffEnd) {
      val id = fourcc(b, i)
      val len = le32(b, i + 4)
      if (len < 0 || i + 8 + len > riffEnd) return unknown
      if (id == "LIST" && len >= 4 && fourcc(b, i + 8) == "movi") {
        movi = i + 12; moviEnd = i + 8 + len
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (movi < 0) return unknown
    // iterate stream video chunks ('..dc' compressed / '..db' raw),
    // descending into 'rec ' grouping LISTs via an explicit worklist —
    // chunk order within movi IS frame order, and a rec LIST's chunks
    // sit between its neighbors', so ranges are processed depth-first
    var frames = 0
    var result: JpegDecode.Decoded = null
    var ranges = List((movi, moviEnd))
    while (ranges.nonEmpty) {
      var (j, e) = ranges.head
      ranges = ranges.tail
      var descended = false
      while (!descended && j + 8 <= e) {
        val id = fourcc(b, j)
        val len = le32(b, j + 4)
        if (len < 0 || j + 8 + len > e) return unknown
        val next = j + 8 + len + (len & 1)
        if (id == "LIST" && len >= 4 && fourcc(b, j + 8) == "rec ") {
          // continue after the LIST once its payload is drained
          ranges = (j + 12, j + 8 + len) :: (next, e) :: ranges
          descended = true
        } else {
          if (id.endsWith("dc") || id.endsWith("db")) {
            if (frames == want) {
              // the frame must be a standalone JPEG (MJPEG contract)
              if (len < 4 || (b(j + 8) & 0xff) != 0xff ||
                  (b(j + 9) & 0xff) != 0xd8) return unknown
              val frame = java.util.Arrays.copyOfRange(b, j + 8, j + 8 + len)
              result = JpegDecode.decode(frame, MaxPixels)
              if (result == null) return unknown
            }
            frames += 1
          } // audio '..wb' / 'idx1' / others skipped
          j = next
        }
      }
    }
    if (result == null) unknown
    else InternalRow(UTF8String.fromString("mjpeg"), result.width,
      result.height, frames, new GenericArrayData(result.pixels))
  }

  // ---------------------------------------------------------------- MP4
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  /** BMFF box iteration over [from, to): f(type, payloadStart,
    * payloadEnd); malformed sizes throw (outer catch → unknown).
    * Size-1 largesize and size-0 to-end boxes follow ISO 14496-12. */
  private def boxes(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    def bad(): Nothing = throw new IllegalStateException("malformed box")
    var i = from
    while (i + 8 <= to) {
      val size32 = be32(b, i)
      val typ = fourcc(b, i + 4)
      val (start, end) =
        if (size32 == 1L) {
          if (i + 16 > to) bad()
          val sz = be64(b, i + 8)
          if (sz < 16 || i + sz > to) bad()
          (i + 16, (i + sz).toInt)
        } else if (size32 == 0L) (i + 8, to)
        else {
          if (size32 < 8 || i + size32 > to) bad()
          (i + 8, (i + size32).toInt)
        }
      f(typ, start, end)
      i = end
    }
  }

  /** MP4/MOV: select the trak whose stsd leads with a 'jpeg' visual
    * sample entry, then enumerate samples via stsc runs × stco/co64
    * chunk offsets × stsz sizes — sample n is frame n. */
  private def mp4Walk(b: Array[Byte], want: Int): InternalRow = {
    // committed sample-table payload spans of the selected jpeg track
    var SZs = -1; var SZe = -1; var SCs = -1; var SCe = -1
    var COs = -1; var COe = -1; var co64 = false
    boxes(b, 0, b.length) { (t, s, e) =>
      if (t == "moov") boxes(b, s, e) { (t2, s2, e2) =>
        if (t2 == "trak" && SZs < 0) {
          var jpeg = false
          var szS = -1; var szE = -1; var scS = -1; var scE = -1
          var coS = -1; var coE = -1; var is64 = false
          boxes(b, s2, e2) { (t3, s3, e3) => if (t3 == "mdia")
            boxes(b, s3, e3) { (t4, s4, e4) => if (t4 == "minf")
              boxes(b, s4, e4) { (t5, s5, e5) => if (t5 == "stbl")
                boxes(b, s5, e5) { (t6, s6, e6) => t6 match {
                  // stsd fullbox: ver/flags + entry_count, then the
                  // first entry's size32 + format fourcc
                  case "stsd" =>
                    if (e6 - s6 >= 16 && be32(b, s6 + 4) >= 1 &&
                        fourcc(b, s6 + 12) == "jpeg") jpeg = true
                  case "stsz" => szS = s6; szE = e6
                  case "stsc" => scS = s6; scE = e6
                  case "stco" => coS = s6; coE = e6
                  case "co64" => coS = s6; coE = e6; is64 = true
                  case _ => ()
                } } } } }
          if (jpeg && szS >= 0 && scS >= 0 && coS >= 0) {
            SZs = szS; SZe = szE; SCs = scS; SCe = scE
            COs = coS; COe = coE; co64 = is64
          }
        }
      }
    }
    if (SZs < 0) return unknown
    // stsz: ver/flags, uniform sample_size (0 = per-sample table),
    // sample_count
    if (SZe - SZs < 12) return unknown
    val uniform = be32(b, SZs + 4)
    val count = be32(b, SZs + 8)
    if (count <= 0 || count > 1000000 || want >= count) return unknown
    if (uniform == 0 && SZe - SZs < 12 + 4L * count) return unknown
    def sampleSize(i: Int): Long =
      if (uniform != 0) uniform else be32(b, SZs + 12 + 4 * i)
    if (COe - COs < 8) return unknown
    val nChunks = be32(b, COs + 4)
    val coW = if (co64) 8 else 4
    if (nChunks <= 0 || nChunks > 1000000 ||
        COe - COs < 8 + coW.toLong * nChunks) return unknown
    def chunkOff(c: Int): Long = // 0-based chunk index
      if (co64) be64(b, COs + 8 + 8 * c) else be32(b, COs + 8 + 4 * c)
    if (SCe - SCs < 8) return unknown
    val nRuns = be32(b, SCs + 4).toInt
    if (nRuns <= 0 || nRuns > 1000000 ||
        SCe - SCs < 8 + 12L * nRuns) return unknown
    var sample = 0
    var run = 0
    while (run < nRuns) {
      val firstChunk = be32(b, SCs + 8 + 12 * run).toInt // 1-based
      val perChunk = be32(b, SCs + 8 + 12 * run + 4).toInt
      val lastExcl =
        if (run + 1 < nRuns) be32(b, SCs + 8 + 12 * (run + 1)).toInt
        else nChunks.toInt + 1
      if (firstChunk < 1 || perChunk <= 0 || perChunk > 1000000 ||
          lastExcl <= firstChunk || lastExcl > nChunks + 1) return unknown
      var c = firstChunk
      while (c < lastExcl) {
        if (want < sample + perChunk) { // want >= sample always holds
          var off = chunkOff(c - 1)
          var k = sample
          while (k < want) { off += sampleSize(k); k += 1 }
          val len = sampleSize(want)
          if (len <= 0 || len > Int.MaxValue || off < 0 ||
              off > Int.MaxValue) return unknown
          return emit(b, off.toInt, len.toInt, count.toInt)
        }
        sample += perChunk
        c += 1
      }
      run += 1
    }
    unknown
  }

  // ---------------------------------------------------------------- MKV
  /** Matroska ([[Ebml]] primitives): Tracks/TrackEntry with CodecID
    * "V_MJPEG" or "V_VP8" picks the track number (a dedicated pass — SeekHead
    * layouts may order Tracks after Clusters); then Cluster
    * SimpleBlocks and BlockGroup/Blocks of that track, in order, are
    * the frames. A laced block of the selected track aborts to
    * unknown. */
  private def mkvWalk(b: Array[Byte], want: Int): InternalRow = {
    def bad(): Nothing = throw new IllegalStateException("malformed mkv")
    def walkRange(from: Int, to: Int)(h: (Long, Int, Int) => Unit): Unit =
      Ebml.walk(b, from, to)(h)
    def uintAt(s: Int, e: Int): Long = Ebml.uint(b, s, e)
    var track = -1L
    var frames = 0
    var foundOff = -1
    var foundLen = -1
    walkRange(0, b.length) { (id, s, e) =>
      if (id == 0x18538067L) { // Segment
        walkRange(s, e) { (id2, s2, e2) => // pass 1: Tracks
          if (id2 == 0x1654AE6BL) walkRange(s2, e2) { (id3, s3, e3) =>
            if (id3 == 0xAEL) { // TrackEntry
              var num = -1L
              var mjpeg = false
              walkRange(s3, e3) { (id4, s4, e4) =>
                if (id4 == 0xD7L) num = uintAt(s4, e4) // TrackNumber
                else if (id4 == 0x86L) { // CodecID
                  val codec = new String(b, s4, e4 - s4, "ISO-8859-1")
                    .takeWhile(_ != '\u0000')
                  mjpeg = codec == "V_MJPEG" || codec == "V_VP8"
                }
              }
              if (mjpeg && num > 0 && track < 0) track = num
            }
          }
        }
        if (track > 0) walkRange(s, e) { (id2, s2, e2) => // pass 2
          if (id2 == 0x1F43B675L) { // Cluster
            def block(bs: Int, be: Int): Unit = {
              val (tn, tl) = Ebml.vint(b, bs, strip = true)
              if (tl < 0 || bs + tl + 3 > be) bad()
              if (tn == track) {
                if ((b(bs + tl + 2) & 0x06) != 0) bad() // laced
                if (frames == want) {
                  foundOff = bs + tl + 3 // past int16 timecode + flags
                  foundLen = be - foundOff
                }
                frames += 1
              }
            }
            walkRange(s2, e2) { (id3, s3, e3) =>
              if (id3 == 0xA3L) block(s3, e3) // SimpleBlock
              else if (id3 == 0xA0L) walkRange(s3, e3) { (id4, s4, e4) =>
                if (id4 == 0xA1L) block(s4, e4) // BlockGroup/Block
              }
            }
          }
        }
      }
    }
    if (foundOff < 0) unknown else emit(b, foundOff, foundLen, frames)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
