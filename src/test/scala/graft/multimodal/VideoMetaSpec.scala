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
