package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden-byte tests for [[VideoMetaExpr]]: ISO BMFF box layouts
  * (version 0/1 headers, largesize boxes, multiple tracks) and the
  * must-not-fail policy on malformed payloads. */
class VideoMetaSpec extends SparkSpec {
  import spark.implicits._

  private def meta(bytes: Array[Byte]): (String, Long, Int, Int, Int) = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.videoMeta(col("p")).as("m"))
      .select("m.format", "m.duration_ms", "m.width", "m.height",
        "m.tracks").head()
    (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4))
  }

  private def be32(v: Long) = Array[Byte](((v >> 24) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(typ: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8) ++ typ.getBytes("ISO-8859-1") ++ body
  private def largeBox(typ: String, body: Array[Byte]): Array[Byte] =
    be32(1) ++ typ.getBytes("ISO-8859-1") ++
      Array.fill[Byte](4)(0) ++ be32(body.length + 16) ++ body

  private def ftyp(brand: String) =
    box("ftyp", brand.getBytes("ISO-8859-1") ++ be32(0) ++
      brand.getBytes("ISO-8859-1"))
  /** mvhd v0: version/flags, creation, modification, timescale,
    * duration, then rate/volume/etc (padded). */
  private def mvhd0(timescale: Long, duration: Long) =
    box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
      be32(duration) ++ Array.fill[Byte](80)(0))
  private def mvhd1(timescale: Long, duration: Long) =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++
      Array.fill[Byte](16)(0) ++ be32(timescale) ++
      be32(duration >> 32) ++ be32(duration & 0xffffffffL) ++
      Array.fill[Byte](80)(0))
  /** tkhd v0: version/flags + 20 bytes (times/id/duration) + 8 reserved
    * + 2+2+2+2 + 36 matrix + width(16.16) + height(16.16). */
  private def tkhd0(w: Int, h: Int) =
    box("tkhd", be32(0) ++ Array.fill[Byte](72)(0) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))
  private def tkhd1(w: Int, h: Int) =
    box("tkhd", Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](84)(0) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))
  private def trak(tkhd: Array[Byte]) = box("trak", tkhd)

  test("mp4 v0 headers: brand, duration_ms, max track dims, track count") {
    // audio track 0x0 + video 1280x720, 90s at timescale 600
    val mp4 = ftyp("isom") ++ box("moov",
      mvhd0(600, 54000) ++ trak(tkhd0(0, 0)) ++ trak(tkhd0(1280, 720)))
    assert(meta(mp4) == ("isom", 90000L, 1280, 720, 2))
  }

  test("version-1 (64-bit) mvhd/tkhd layouts parse") {
    val mp4 = ftyp("mp42") ++ box("moov",
      mvhd1(1000, 123456L) ++ trak(tkhd1(640, 480)))
    assert(meta(mp4) == ("mp42", 123456L, 640, 480, 1))
  }

  test("largesize boxes and trailing mdat are handled") {
    val mp4 = ftyp("qt  ") ++
      largeBox("moov", mvhd0(1000, 5000) ++ trak(tkhd0(320, 240))) ++
      box("mdat", Array.fill[Byte](32)(7))
    assert(meta(mp4) == ("qt", 5000L, 320, 240, 1))
  }

  // ---------------------------------------------------------------- MKV
  private def ebmlSize(n: Long): Array[Byte] =
    if (n < 0x7f) Array((0x80 | n).toByte)
    else Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)
  private def ebmlId(id: Long): Array[Byte] = {
    val n = if (id <= 0xff) 1 else if (id <= 0xffff) 2
      else if (id <= 0xffffff) 3 else 4
    (1 to n).map(k => ((id >> (8 * (n - k))) & 0xff).toByte).toArray
  }
  private def elem(id: Long, body: Array[Byte]): Array[Byte] =
    ebmlId(id) ++ ebmlSize(body.length) ++ body

  test("mkv/webm metadata: DocType, float Duration x TimestampScale, dims, tracks") {
    def track(w: Int, h: Int) = elem(0xAE,
      elem(0xD7, Array[Byte](1)) ++
        elem(0xE0, elem(0xB0, Array[Byte]((w >> 8).toByte, w.toByte)) ++
          elem(0xBA, Array[Byte]((h >> 8).toByte, h.toByte))))
    def audioTrack = elem(0xAE, elem(0xD7, Array[Byte](2)))
    // 4-byte float 2500.0 at the default 1 ms scale -> 2500 ms
    val dur4 = java.lang.Float.floatToIntBits(2500.0f)
    val info = elem(0x1549A966, elem(0x4489, Array[Byte](
      (dur4 >> 24).toByte, (dur4 >> 16).toByte, (dur4 >> 8).toByte,
      dur4.toByte)))
    val header = elem(0x1A45DFA3, elem(0x4282, "webm".getBytes))
    val seg = elem(0x18538067,
      info ++ elem(0x1654AE6B, track(1280, 720) ++ audioTrack))
    assert(meta(header ++ seg) == ("webm", 2500L, 1280, 720, 2))
    // 8-byte float duration + explicit TimestampScale (1,000,000 ns)
    val dur8 = java.lang.Double.doubleToLongBits(1234.0)
    val info8 = elem(0x1549A966,
      elem(0x2AD7B1, Array[Byte](0x0F, 0x42, 0x40)) ++ // 1e6
        elem(0x4489, (0 until 8).map(k =>
          ((dur8 >> (8 * (7 - k))) & 0xff).toByte).toArray))
    val plain = elem(0x1A45DFA3, Array.empty[Byte]) ++
      elem(0x18538067, info8 ++ elem(0x1654AE6B, track(640, 480)))
    assert(meta(plain) == ("matroska", 1234L, 640, 480, 1))
    // no Info -> unknown; absent Duration -> -1
    val noInfo = header ++ elem(0x18538067,
      elem(0x1654AE6B, track(2, 2)))
    assert(meta(noInfo)._1 == "unknown")
    val noDur = header ++ elem(0x18538067,
      elem(0x1549A966, Array.empty[Byte]) ++
        elem(0x1654AE6B, track(2, 2)))
    assert(meta(noDur)._2 == -1L && meta(noDur)._3 == 2)
    // truncation sweep never throws
    val whole = header ++ seg
    for (cut <- 1 until whole.length)
      assert(meta(whole.take(cut))._1 == "unknown" ||
        meta(whole.take(cut))._1 == "webm")
  }

  test("animated WebP metadata: canvas, summed durations; stills unknown") {
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val pad = if ((data.length & 1) == 1) Array[Byte](0) else Array[Byte]()
      tag.getBytes ++ Array[Byte](data.length.toByte,
        (data.length >> 8).toByte, (data.length >> 16).toByte,
        (data.length >> 24).toByte) ++ data ++ pad
    }
    def le24(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte)
    def anmf(dur: Int) = chunk("ANMF",
      le24(0) ++ le24(0) ++ le24(7) ++ le24(5) ++ le24(dur) ++
        Array[Byte](0) ++ Array.fill[Byte](6)(0x42))
    val payload = chunk("VP8X", Array[Byte](0x02, 0, 0, 0) ++
      le24(63) ++ le24(47)) ++ chunk("ANIM", new Array[Byte](6)) ++
      anmf(100) ++ anmf(250) ++ anmf(16777215)
    val full = "RIFF".getBytes ++ Array[Byte](
      (payload.length + 4).toByte, ((payload.length + 4) >> 8).toByte,
      0, 0) ++ "WEBP".getBytes ++ payload
    assert(meta(full) == (("webp", 100L + 250 + 16777215, 64, 48, 1)))
    // a still WebP (no ANMF) is image territory -> unknown
    val still = "RIFF".getBytes ++ Array[Byte](12, 0, 0, 0) ++
      "WEBP".getBytes ++ chunk("VP8X", Array[Byte](0x10, 0, 0, 0) ++
        le24(1) ++ le24(1))
    assert(meta(still)._1 == "unknown")
    // ANMF frames with the (spec-mandatory) VP8X missing is a
    // malformed container -> unknown, not -1×-1 dimensions
    val noVp8x = anmf(100) ++ anmf(50)
    val headless = "RIFF".getBytes ++ Array[Byte](
      (noVp8x.length + 4).toByte, ((noVp8x.length + 4) >> 8).toByte,
      0, 0) ++ "WEBP".getBytes ++ noVp8x
    assert(meta(headless)._1 == "unknown")
  }

  test("malformed payloads are unknown, never an error") {
    val good = ftyp("isom") ++ box("moov",
      mvhd0(600, 600) ++ trak(tkhd0(10, 10)))
    assert(meta(good.take(20))._1 == "unknown") // truncated mid-box
    assert(meta(Array.fill[Byte](32)(9))._1 == "unknown") // not BMFF
    assert(meta(ftyp("isom"))._1 == "unknown") // no moov/mvhd
    // box claiming a size past the payload
    val lying = ftyp("isom") ++ be32(1 << 20) ++ "moov".getBytes
    assert(meta(lying)._1 == "unknown")
    assert(meta(Array.empty[Byte])._1 == "unknown")
  }
}
