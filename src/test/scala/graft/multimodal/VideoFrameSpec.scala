package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import scala.collection.mutable.ArrayBuffer

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[VideoFrameExpr]] over hand-built MJPEG AVI containers whose frames
  * are JDK-encoded JPEGs: the container walk is exercised here, the
  * per-frame pixel correctness rides the already-JDK-proven
  * [[JpegDecode]] pipeline (each extracted frame must decode identically
  * to decodeImage over the same raw JPEG bytes). */
class VideoFrameSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("java.awt.headless", "true")

  private def frame(bytes: Array[Byte], n: Int)
      : (String, Int, Int, Int, Seq[Int]) = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.videoFrame(col("p"), lit(n)).as("f"))
      .select("f.format", "f.width", "f.height", "f.frames", "f.pixels")
      .head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
      if (r.isNullAt(4)) null else r.getSeq[Int](4))
  }

  private def jpegOf(seed: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, 0xff000000 |
        (((x * 3 + y * 2 + seed) % 256) << 16) |
        (((255 - x * 2 + y + seed) % 256) << 8) |
        ((x + y * 4 + seed * 7) % 256))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val b = ArrayBuffer[Byte]()
    b ++= id.getBytes("ISO-8859-1")
    val len = payload.length
    b += (len & 0xff).toByte; b += ((len >> 8) & 0xff).toByte
    b += ((len >> 16) & 0xff).toByte; b += ((len >> 24) & 0xff).toByte
    b ++= payload
    if ((len & 1) == 1) b += 0 // word alignment pad
    b.toArray
  }
  private def list(kind: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", kind.getBytes("ISO-8859-1") ++ payload)

  /** Minimal-but-realistic AVI: hdrl with an avih stub, then movi. */
  private def avi(moviPayload: Array[Byte]): Array[Byte] = {
    val avih = chunk("avih", new Array[Byte](56))
    val hdrl = list("hdrl", avih)
    val movi = list("movi", moviPayload)
    chunk("RIFF", "AVI ".getBytes ++ hdrl ++ movi)
  }

  test("MJPEG AVI: frame n decodes exactly like the raw JPEG; count right") {
    val jpegs = (0 until 3).map(s => jpegOf(s, 19, 13))
    val movi = jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _)
    val payload = avi(movi)
    for (n <- 0 until 3) {
      val (f, w, h, cnt, px) = frame(payload, n)
      assert((f, w, h, cnt) == ("mjpeg", 19, 13, 3))
      val direct = Seq(Tuple1(jpegs(n))).toDF("p")
        .select(Multimodal.decodeImage(col("p")).as("d"))
        .select("d.pixels").head().getSeq[Int](0)
      assert(px == direct, s"frame $n must equal the raw JPEG decode")
    }
  }

  test("interleaved audio chunks and idx1 are skipped; rec grouping descends") {
    val j0 = jpegOf(9, 8, 8); val j1 = jpegOf(11, 8, 8)
    // movi: audio, rec[frame0, audio], frame1, idx1 after movi
    val movi = chunk("01wb", Array.fill[Byte](33)(7)) ++
      list("rec ", chunk("00dc", j0) ++ chunk("01wb", Array.fill[Byte](5)(1))) ++
      chunk("00db", j1)
    val idx = chunk("idx1", new Array[Byte](16))
    val payload = chunk("RIFF", "AVI ".getBytes ++
      list("hdrl", chunk("avih", new Array[Byte](56))) ++
      list("movi", movi) ++ idx)
    val (f0, _, _, cnt, px0) = frame(payload, 0)
    assert((f0, cnt) == ("mjpeg", 2))
    val direct0 = Seq(Tuple1(j0)).toDF("p")
      .select(Multimodal.decodeImage(col("p")).as("d"))
      .select("d.pixels").head().getSeq[Int](0)
    assert(px0 == direct0)
    assert(frame(payload, 1)._1 == "mjpeg")
  }

  // ---------------------------------------------------------------- MP4
  private def be32b(v: Int) = Array[Byte]((v >>> 24).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def mbox(typ: String, payload: Array[Byte]): Array[Byte] =
    be32b(payload.length + 8) ++ typ.getBytes("ISO-8859-1") ++ payload

  /** MP4: ftyp + mdat(frames) + moov with a full sample table. Chunk
    * split: first chunk gets `split` samples, second the rest. An
    * optional decoy trak (audio stsd) precedes the jpeg trak. */
  private def mp4(frames: Seq[Array[Byte]], split: Int,
      decoy: Boolean = false, codec: String = "jpeg"): Array[Byte] = {
    val ftyp = mbox("ftyp", "isom".getBytes ++ be32b(0) ++ "isom".getBytes)
    val mdatPayload = frames.reduce(_ ++ _)
    val frameOffsets = frames.scanLeft(ftyp.length + 8)(_ + _.length)
    def stbl(fmt: String, off: Seq[Int], sizes: Seq[Int],
        chunkRuns: Seq[(Int, Int)]): Array[Byte] = {
      val entry = be32b(86) ++ fmt.getBytes ++ new Array[Byte](78)
      val stsd = mbox("stsd", be32b(0) ++ be32b(1) ++ entry)
      val stsz = mbox("stsz", be32b(0) ++ be32b(0) ++ be32b(sizes.length) ++
        sizes.flatMap(be32b).toArray)
      val stsc = mbox("stsc", be32b(0) ++ be32b(chunkRuns.length) ++
        chunkRuns.flatMap { case (fc, spc) =>
          be32b(fc) ++ be32b(spc) ++ be32b(1) }.toArray)
      val stco = mbox("stco", be32b(0) ++ be32b(off.length) ++
        off.flatMap(be32b).toArray)
      mbox("stbl", stsd ++ stsz ++ stsc ++ stco)
    }
    def trak(s: Array[Byte]) = mbox("trak", mbox("mdia", mbox("minf", s)))
    val chunkOffs = Seq(frameOffsets(0), frameOffsets(split))
    val runs =
      if (split >= frames.length) Seq((1, frames.length))
      else Seq((1, split), (2, frames.length - split))
    val jpegTrak = trak(stbl(codec, chunkOffs.take(
      if (split >= frames.length) 1 else 2),
      frames.map(_.length), runs))
    val decoyTrak = if (decoy)
      trak(stbl("mp4a", Seq(ftyp.length + 8), Seq(4), Seq((1, 1))))
    else Array.empty[Byte]
    ftyp ++ mbox("mdat", mdatPayload) ++
      mbox("moov", decoyTrak ++ jpegTrak)
  }

  test("MJPEG MP4: sample table route — chunk runs, sizes, offsets; decoy trak skipped") {
    val jpegs = (0 until 3).map(s => jpegOf(s + 20, 11, 9))
    val payload = mp4(jpegs, split = 2, decoy = true)
    for (n <- 0 until 3) {
      val (f, w, h, cnt, px) = frame(payload, n)
      assert((f, w, h, cnt) == ("mjpeg", 11, 9, 3), s"frame $n")
      val direct = Seq(Tuple1(jpegs(n))).toDF("p")
        .select(Multimodal.decodeImage(col("p")).as("d"))
        .select("d.pixels").head().getSeq[Int](0)
      assert(px == direct, s"mp4 frame $n must equal the raw JPEG decode")
    }
    assert(frame(payload, 3)._1 == "unknown") // out of range
  }

  test("MP4 corpus-safety: non-jpeg stsd, truncation, h264-looking sample") {
    val jpegs = Seq(jpegOf(31, 8, 8))
    // declared codec avc1 -> no jpeg trak selected
    assert(frame(mp4(jpegs, 1, codec = "avc1"), 0)._1 == "unknown")
    // declared jpeg but the sample bytes are not a JPEG (corpus lies)
    val lying = mp4(Seq(Array[Byte](0, 0, 0, 1, 0x67, 42, 42, 1)), 1)
    assert(frame(lying, 0)._1 == "unknown")
    val good = mp4(jpegs, 1)
    assert(frame(good, 0)._1 == "mjpeg")
    for (cut <- Seq(10, good.length / 2, good.length - 5))
      assert(frame(good.take(cut), 0)._1 == "unknown")
  }

  // ---------------------------------------------------------------- MKV
  private def ebmlSize(n: Long): Array[Byte] =
    if (n < 0x7f) Array((0x80 | n).toByte)
    else if (n < 0x3fff) Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)
    else Array((0x20 | (n >> 16)).toByte, ((n >> 8) & 0xff).toByte,
      (n & 0xff).toByte)
  private def ebmlIdBytes(id: Long): Array[Byte] = {
    val n = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    (1 to n).map(k => ((id >> (8 * (n - k))) & 0xff).toByte).toArray
  }
  private def elem(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlIdBytes(id) ++ ebmlSize(payload.length) ++ payload

  private def mkvTrackEntry(num: Int, codecId: String): Array[Byte] =
    elem(0xAE, elem(0xD7, Array(num.toByte)) ++
      elem(0x83, Array[Byte](1)) ++ // TrackType video
      elem(0x86, codecId.getBytes("ISO-8859-1")))

  private def simpleBlock(track: Int, f: Array[Byte],
      flags: Int = 0x80): Array[Byte] =
    elem(0xA3, Array[Byte]((0x80 | track).toByte, 0, 0, flags.toByte) ++ f)

  private def mkv(segmentPayload: Array[Byte],
      unknownSize: Boolean = false): Array[Byte] = {
    val header = elem(0x1A45DFA3, Array.empty[Byte])
    val seg =
      if (unknownSize) ebmlIdBytes(0x18538067) ++ Array(0xff.toByte) ++
        segmentPayload
      else elem(0x18538067, segmentPayload)
    header ++ seg
  }

  test("MJPEG MKV: SimpleBlocks + BlockGroup/Block across clusters; other track skipped") {
    val jpegs = (0 until 3).map(s => jpegOf(s + 40, 10, 6))
    val tracks = elem(0x1654AE6B,
      mkvTrackEntry(1, "V_MJPEG") ++ mkvTrackEntry(2, "A_PCM/INT/LIT"))
    val cluster1 = elem(0x1F43B675,
      elem(0xE7, Array[Byte](0)) ++ // cluster timestamp
        simpleBlock(1, jpegs(0)) ++
        simpleBlock(2, Array.fill[Byte](17)(3)) ++ // audio: skipped
        elem(0xA0, elem(0xA1, // BlockGroup/Block form
          Array[Byte](0x81.toByte, 0, 0, 0) ++ jpegs(1))))
    val cluster2 = elem(0x1F43B675, simpleBlock(1, jpegs(2)))
    // segment with UNKNOWN size (the streaming-writer shape)
    val payload = mkv(tracks ++ cluster1 ++ cluster2, unknownSize = true)
    for (n <- 0 until 3) {
      val (f, w, h, cnt, px) = frame(payload, n)
      assert((f, w, h, cnt) == ("mjpeg", 10, 6, 3), s"frame $n")
      val direct = Seq(Tuple1(jpegs(n))).toDF("p")
        .select(Multimodal.decodeImage(col("p")).as("d"))
        .select("d.pixels").head().getSeq[Int](0)
      assert(px == direct, s"mkv frame $n must equal the raw JPEG decode")
    }
    assert(frame(payload, 3)._1 == "unknown")
  }

  test("MKV unknown-size CLUSTERS (streaming muxers) end at the next cluster") {
    // two back-to-back unknown-size clusters: the RFC 8794 rule — the
    // first ends where the second's ID begins, so frames in BOTH are
    // visible (parent-end semantics would swallow cluster 2)
    val j0 = jpegOf(60, 8, 8); val j1 = jpegOf(61, 8, 8)
    val tracks = elem(0x1654AE6B, mkvTrackEntry(1, "V_MJPEG"))
    def openCluster(payload: Array[Byte]) =
      ebmlIdBytes(0x1F43B675) ++ Array(0xff.toByte) ++ payload
    val payload = mkv(tracks ++
      openCluster(simpleBlock(1, j0)) ++
      openCluster(simpleBlock(1, j1)), unknownSize = true)
    val (f0, _, _, cnt, _) = frame(payload, 0)
    assert((f0, cnt) == ("mjpeg", 2))
    assert(frame(payload, 1)._1 == "mjpeg")
  }

  test("WebM V_VP8: keyframes decode via Vp8Decode, interframes unknown") {
    // the libwebp-encoded lossy fixture supplies a REAL VP8 keyframe;
    // muxed into a Matroska V_VP8 track it must decode to exactly the
    // container-path RGB of the same stream
    def resource(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/vp8/$name")
      assert(in != null, s"missing fixture $name")
      try in.readAllBytes() finally in.close()
    }
    val webp = resource("gradient_16x16_q50.webp")
    var i = 12; var off = -1; var len = -1
    while (off < 0 && i + 8 <= webp.length) {
      val l = (webp(i + 4) & 0xff) | ((webp(i + 5) & 0xff) << 8) |
        ((webp(i + 6) & 0xff) << 16) | ((webp(i + 7) & 0xff) << 24)
      if (webp(i) == 'V' && webp(i + 1) == 'P' && webp(i + 2) == '8' &&
        webp(i + 3) == ' ') { off = i + 8; len = l }
      i += 8 + l + (l & 1)
    }
    val vp8 = webp.slice(off, off + len)
    val tracks = elem(0x1654AE6B, mkvTrackEntry(1, "V_VP8"))
    // frame 0: the keyframe; frame 1: a fake interframe (tag bit0=1)
    val inter = vp8.clone(); inter(0) = (inter(0) | 1).toByte
    val payload = mkv(tracks ++
      elem(0x1F43B675, simpleBlock(1, vp8) ++ simpleBlock(1, inter)))
    val (f, w, h, cnt, px) = frame(payload, 0)
    assert((f, w, h, cnt) == ("vp8", 16, 16, 2))
    val want = WebpDecode.decode(webp, 1L << 26).get.pixels.toSeq
    assert(px == want, "muxed keyframe must equal the container decode")
    assert(frame(payload, 1)._1 == "unknown") // interframe boundary
  }

  test("animated WebP: ANMF frames decode standalone, VP8 and VP8L alike") {
    def res(path: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(path)
      assert(in != null, s"missing fixture $path")
      try in.readAllBytes() finally in.close()
    }
    // frame 0: the lossy VP8 fixture's chunks; frame 1: a lossless
    // VP8L fixture's — an animation mixing both codecs
    def body(webp: Array[Byte]): Array[Byte] = {
      val riffEnd = math.min(webp.length.toLong,
        8L + ((webp(4) & 0xff) | ((webp(5) & 0xff) << 8) |
          ((webp(6) & 0xff) << 16) | ((webp(7) & 0xff) << 24))).toInt
      webp.slice(12, riffEnd)
    }
    def le24(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte)
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val pad = if ((data.length & 1) == 1) Array[Byte](0) else Array[Byte]()
      tag.getBytes ++ Array[Byte](data.length.toByte,
        (data.length >> 8).toByte, (data.length >> 16).toByte,
        (data.length >> 24).toByte) ++ data ++ pad
    }
    def anmf(w: Int, h: Int, sub: Array[Byte]): Array[Byte] =
      chunk("ANMF", le24(0) ++ le24(0) ++ le24(w - 1) ++ le24(h - 1) ++
        le24(40) ++ Array[Byte](0) ++ sub)
    val lossy = res("/vp8/gradient_16x16_q50.webp")
    val lossless = res("/webp/noise_small.webp")
    val f0sub = body(lossy)
    val losslessDec = WebpDecode.decode(lossless, 1L << 26).get
    val f1sub = body(lossless)
    val vp8x = chunk("VP8X", Array[Byte](0x12, 0, 0, 0) ++
      le24(15) ++ le24(15))
    val anim = chunk("ANIM", Array[Byte](0, 0, 0, 0, 0, 0))
    val payload0 = vp8x ++ anim ++ anmf(16, 16, f0sub) ++
      anmf(losslessDec.width, losslessDec.height, f1sub)
    val full = "RIFF".getBytes ++ Array[Byte](payload0.length.toByte,
      ((payload0.length + 4) >> 8).toByte, 0, 0) ++ "WEBP".getBytes ++
      payload0
    // fix the RIFF size properly (4 for "WEBP" + payload)
    val sz = payload0.length + 4
    full(4) = sz.toByte; full(5) = (sz >> 8).toByte
    full(6) = (sz >> 16).toByte; full(7) = (sz >> 24).toByte
    val (f0, w0, h0, cnt0, px0) = frame(full, 0)
    assert((f0, w0, h0, cnt0) == ("webp", 16, 16, 2))
    assert(px0 == WebpDecode.decode(lossy, 1L << 26).get.pixels.toSeq)
    val (f1, w1, h1, cnt1, px1) = frame(full, 1)
    assert((f1, w1, h1, cnt1) ==
      ("webp", losslessDec.width, losslessDec.height, 2))
    assert(px1 == losslessDec.pixels.toSeq)
    assert(frame(full, 2)._1 == "unknown") // out of range
    // a still (no ANMF) is an image, not a video
    assert(frame(lossy, 0)._1 == "unknown")
    // and symmetrically, image_decode of the ANIMATION is frame 0
    // (the GIF convention)
    val asImage = WebpDecode.decode(full, 1L << 26)
    assert(asImage.nonEmpty && asImage.get.pixels.toSeq == px0)
  }

  test("APNG: fcTL frames re-assemble through the PNG pipeline; default image excluded") {
    def pngOf(seed: Int): (Array[Byte], Seq[Int]) = {
      val img = new BufferedImage(4, 4, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 4; x <- 0 until 4)
        img.setRGB(x, y, 0xff000000 | (((x * 41 + y * 13 + seed) % 256) << 16) |
          (((x * 7 + y * 59 + seed * 3) % 256) << 8) |
          ((x * 23 + y * 5 + seed * 11) % 256))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      (bos.toByteArray,
        for (y <- 0 until 4; x <- 0 until 4) yield img.getRGB(x, y))
    }
    def chunksOf(png: Array[Byte]): Seq[(String, Array[Byte])] = {
      val out = ArrayBuffer[(String, Array[Byte])]()
      var i = 8
      while (i + 8 <= png.length) {
        val len = ((png(i) & 0xff) << 24) | ((png(i + 1) & 0xff) << 16) |
          ((png(i + 2) & 0xff) << 8) | (png(i + 3) & 0xff)
        out += ((new String(png, i + 4, 4, "ISO-8859-1"),
          png.slice(i + 8, i + 8 + len)))
        i += 12 + len
      }
      out.toSeq
    }
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]) = // zero CRC: tolerated
      be32(data.length) ++ typ.getBytes("ISO-8859-1") ++ data ++ be32(0)
    val (png0, px0) = pngOf(1)
    val (png1, px1) = pngOf(77)
    val ihdr = chunksOf(png0).find(_._1 == "IHDR").get._2
    def idat(png: Array[Byte]) =
      chunksOf(png).filter(_._1 == "IDAT").flatMap(_._2).toArray
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    def fctl(seq: Int, num: Int, den: Int) = chunk("fcTL",
      be32(seq) ++ be32(4) ++ be32(4) ++ be32(0) ++ be32(0) ++
        be16(num) ++ be16(den) ++ Array[Byte](0, 0))
    // 2-frame animation: frame 0 carried by IDAT (fcTL precedes it),
    // frame 1 by an fdAT chunk
    val anim = sig ++ chunk("IHDR", ihdr) ++
      chunk("acTL", be32(2) ++ be32(0)) ++
      fctl(0, 3, 100) ++ chunk("IDAT", idat(png0)) ++
      fctl(1, 7, 0) ++ chunk("fdAT", be32(2) ++ idat(png1)) ++
      chunk("IEND", Array.empty[Byte])
    assert(frame(anim, 0) == ("apng", 4, 4, 2, px0))
    assert(frame(anim, 1) == ("apng", 4, 4, 2, px1))
    assert(frame(anim, 2)._1 == "unknown") // out of range
    // the metadata twin: duration 3/100 s + 7/(0 -> 100) s = 100 ms
    val m = Seq(Tuple1(anim)).toDF("p")
      .select(Multimodal.videoMeta(col("p")).as("m"))
      .select("m.format", "m.duration_ms", "m.width", "m.height",
        "m.tracks").head()
    assert((m.getString(0), m.getLong(1), m.getInt(2), m.getInt(3),
      m.getInt(4)) == ("apng", 100L, 4, 4, 1))
    // an IDAT with NO preceding fcTL is the non-animated default
    // image: excluded from the animation, fdAT frames start at 0
    val deflt = sig ++ chunk("IHDR", ihdr) ++
      chunk("acTL", be32(1) ++ be32(0)) ++
      chunk("IDAT", idat(png0)) ++
      fctl(0, 5, 100) ++ chunk("fdAT", be32(1) ++ idat(png1)) ++
      chunk("IEND", Array.empty[Byte])
    assert(frame(deflt, 0) == ("apng", 4, 4, 1, px1))
    // a still PNG (no acTL) is an image, not a video
    assert(frame(png0, 0)._1 == "unknown")
    val sm = Seq(Tuple1(png0)).toDF("p")
      .select(Multimodal.videoMeta(col("p")).as("m")).select("m.format")
      .head()
    assert(sm.getString(0) == "unknown")
    // truncation sweep never throws
    for (cut <- 1 until anim.length by 7) {
      val r = frame(anim.take(cut), 0)
      assert(r._1 == "unknown" || r._2 > 0)
    }
  }

  test("MKV corpus-safety: lacing, wrong codec, truncation") {
    val j = jpegOf(50, 8, 8)
    val tracks = elem(0x1654AE6B, mkvTrackEntry(1, "V_MJPEG"))
    // a laced block of the selected track aborts the payload
    val laced = mkv(tracks ++ elem(0x1F43B675,
      simpleBlock(1, j, flags = 0x82)))
    assert(frame(laced, 0)._1 == "unknown")
    // no V_MJPEG track -> nothing to sample
    val h264 = mkv(elem(0x1654AE6B, mkvTrackEntry(1, "V_MPEG4/ISO/AVC")) ++
      elem(0x1F43B675, simpleBlock(1, j)))
    assert(frame(h264, 0)._1 == "unknown")
    val good = mkv(tracks ++ elem(0x1F43B675, simpleBlock(1, j)))
    assert(frame(good, 0)._1 == "mjpeg")
    for (cut <- Seq(3, good.length / 2, good.length - 4))
      assert(frame(good.take(cut), 0)._1 == "unknown")
  }

  test("corpus-safety: out of range, truncated, non-JPEG frames, non-AVI") {
    val payload = avi(chunk("00dc", jpegOf(1, 8, 8)))
    assert(frame(payload, 1)._1 == "unknown") // only frame 0 exists
    assert(frame(payload, -1)._1 == "unknown")
    assert(frame(payload.dropRight(10), 0)._1 == "unknown") // truncated
    // a frame that is not a JPEG (inter-coded video would look like this)
    val h264ish = avi(chunk("00dc", Array[Byte](0, 0, 0, 1, 0x67, 42, 42)))
    assert(frame(h264ish, 0)._1 == "unknown")
    assert(frame("RIFFxxxxWAVE".getBytes, 0)._1 == "unknown") // not AVI
    assert(frame(Array.empty[Byte], 0)._1 == "unknown")
  }
}
