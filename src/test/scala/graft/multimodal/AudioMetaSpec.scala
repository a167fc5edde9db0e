package graft.multimodal

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[AudioMetaExpr]] over hand-built MPEG audio streams (the layouts
  * are the public MPEG-1/2 audio and ID3 specs; javax.sound cannot
  * parse MP3, so the cross-check is arithmetic) plus the WAV path. */
class AudioMetaSpec extends SparkSpec {
  import spark.implicits._

  private def meta(bytes: Array[Byte])
      : (String, Int, Int, Long, Int, Int) = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.audioMeta(col("p")).as("m"))
      .select("m.format", "m.channels", "m.sample_rate", "m.duration_ms",
        "m.bitrate_kbps", "m.frames").head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4),
      r.getInt(5))
  }

  /** One Layer-III frame: 4-byte header + zero payload of the exact
    * spec length (samples/8 * bitrate / rate + padding). */
  private def mp3Frame(v1: Boolean, brIdx: Int, srIdx: Int, padding: Int,
      mono: Boolean): Array[Byte] = {
    val brV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)
    val brV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
      144, 160)
    val rate = Array(44100, 48000, 32000)(srIdx) / (if (v1) 1 else 2)
    val bitrate = (if (v1) brV1 else brV2)(brIdx) * 1000
    val spf = if (v1) 1152 else 576
    val len = spf / 8 * bitrate / rate + padding
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte
    b(1) = (0xe0 | (if (v1) 3 else 2) << 3 | 1 << 1 | 1).toByte
    b(2) = ((brIdx << 4) | (srIdx << 2) | (padding << 1)).toByte
    b(3) = (if (mono) 0xc0 else 0x00).toByte
    b
  }

  test("CBR MP3: frame count and exact duration from the header walk") {
    // 5 frames of 128 kbps 44.1 kHz stereo (frame length 417)
    val p = (0 until 5).map(_ => mp3Frame(v1 = true, 9, 0, 0, mono = false))
      .reduce(_ ++ _)
    val (f, ch, sr, dur, br, n) = meta(p)
    assert((f, ch, sr, br, n) == ("mp3", 2, 44100, 128, 5))
    assert(dur == 5L * 1152 * 1000 / 44100, s"duration $dur")
  }

  test("VBR MP3: per-frame lengths honored; first-frame bitrate reported") {
    // bitrate varies frame to frame (the VBR norm); padding bit set on
    // one frame changes its length by exactly one byte
    val p = mp3Frame(true, 9, 0, 0, false) ++ mp3Frame(true, 14, 0, 1, false) ++
      mp3Frame(true, 1, 0, 0, false)
    val (f, _, sr, dur, br, n) = meta(p)
    assert((f, sr, br, n) == ("mp3", 44100, 128, 3))
    assert(dur == 3L * 1152 * 1000 / 44100)
  }

  test("MPEG-2 (22.05 kHz, 576 samples) and mono detection") {
    val p = (0 until 4).map(_ => mp3Frame(v1 = false, 9, 0, 0, mono = true))
      .reduce(_ ++ _)
    val (f, ch, sr, dur, br, n) = meta(p)
    assert((f, ch, sr, n) == ("mp3", 1, 22050, 4))
    assert(br == 80) // V2 table index 9
    assert(dur == 4L * 576 * 1000 / 22050)
  }

  test("ID3v2 prefix is skipped (syncsafe size); ID3v1 trailer tolerated") {
    val id3v2 = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 1, 5) ++
      new Array[Byte](133) // syncsafe 0,0,1,5 = 133
    val frames = (0 until 2).map(_ => mp3Frame(true, 9, 0, 0, false))
      .reduce(_ ++ _)
    val id3v1 = "TAG".getBytes ++ new Array[Byte](125)
    val (f, _, _, _, _, n) = meta(id3v2 ++ frames ++ id3v1)
    assert((f, n) == ("mp3", 2))
  }

  test("WAV metadata: duration from data length / byte rate") {
    // 16-bit stereo 8 kHz, 320 bytes of data -> 10 ms, 256 kbps
    val data = new Array[Byte](320)
    val hdr = ArrayBuffer[Byte]()
    def le16(v: Int): Unit = { hdr += (v & 0xff).toByte; hdr += ((v >> 8) & 0xff).toByte }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    hdr ++= "RIFF".getBytes; le32(36 + data.length); hdr ++= "WAVE".getBytes
    hdr ++= "fmt ".getBytes; le32(16); le16(1); le16(2); le32(8000)
    le32(32000); le16(4); le16(16)
    hdr ++= "data".getBytes; le32(data.length)
    val (f, ch, sr, dur, br, n) = meta(hdr.toArray ++ data)
    assert((f, ch, sr, dur, br, n) == ("wav", 2, 8000, 10L, 256, -1))
  }

  test("FLAC metadata: STREAMINFO rate/channels/exact duration") {
    // the q_audio_flac variant-0 stream: 8000 Hz, mono, 8 samples
    val flac = ("664c6143800000220010ffff00000000000001f400f0000000080000" +
      "0000000000000000000000000000fff87000000007bf12ff3800f2d55a883997")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val (f, ch, rate, dur, _, _) = meta(flac)
    assert((f, ch, rate, dur) == ("flac", 1, 8000, 8L * 1000 / 8000))
  }

  test("AU and AIFF metadata via the JDK writers") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def enc(t: AudioFileFormat.Type, rate: Float): Array[Byte] = {
      val raw = new Array[Byte](2 * 100) // 100 frames of 16-bit mono
      val fmt = new AudioFormat(rate, 16, 1, true, true)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, 100)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, t, bos)
      bos.toByteArray
    }
    val (fa, cha, ra, da, _, _) = meta(enc(AudioFileFormat.Type.AU, 8000f))
    assert((fa, cha, ra, da) == ("au", 1, 8000, 100L * 1000 / 8000))
    val (fi, chi, ri, di, _, fr) =
      meta(enc(AudioFileFormat.Type.AIFF, 44100f))
    assert((fi, chi, ri, fr) == ("aiff", 1, 44100, 100))
    assert(di == 100L * 1000 / 44100)
  }

  test("AU: ragged trailing frame is unknown (decode parity)") {
    // 16-bit stereo with a 6-byte payload = 3 samples = 1.5 frames;
    // audio_decode rejects the ragged frame, so meta must too
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def au(dataLen: Int, channels: Int) =
      ".snd".getBytes ++ be32(24) ++ be32(dataLen) ++ be32(3) ++
        be32(8000) ++ be32(channels) ++ new Array[Byte](dataLen)
    assert(meta(au(6, 2))._1 == "unknown")
    assert(meta(au(8, 2))._1 == "au") // whole frames: fine
  }

  private def le16o(v: Int) = Array[Byte]((v & 0xff).toByte, (v >> 8).toByte)
  private def le32o(v: Int) = Array[Byte]((v & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 24) & 0xff).toByte)
  private def le64o(v: Long) = Array.tabulate[Byte](8)(k =>
    ((v >> (8 * k)) & 0xff).toByte)

  private def oggPage(serial: Int, granule: Long, flags: Int, seq: Int,
      payload: Array[Byte]): Array[Byte] = {
    val segs = scala.collection.mutable.ArrayBuffer[Byte]()
    var rem = payload.length
    while (rem >= 255) { segs += 255.toByte; rem -= 255 }
    segs += rem.toByte
    "OggS".getBytes ++ Array[Byte](0, flags.toByte) ++ le64o(granule) ++
      le32o(serial) ++ le32o(seq) ++ le32o(0) ++ // CRC not verified
      Array(segs.length.toByte) ++ segs ++ payload
  }

  private def vorbisId(ch: Int, rate: Int): Array[Byte] =
    Array[Byte](1) ++ "vorbis".getBytes ++ le32o(0) ++
      Array(ch.toByte) ++ le32o(rate) ++ le32o(0) ++ le32o(0) ++
      le32o(0) ++ Array[Byte](0x66.toByte, 1)

  private def opusHead(ch: Int, preSkip: Int): Array[Byte] =
    "OpusHead".getBytes ++ Array[Byte](1, ch.toByte) ++ le16o(preSkip) ++
      le32o(48000) ++ le16o(0) ++ Array[Byte](0)

  test("Ogg Vorbis: id header + EOS granule give exact duration") {
    val stream = oggPage(7, -1L, 0x02, 0, vorbisId(2, 44100)) ++
      oggPage(7, 22050L, 0x00, 1, Array[Byte](1, 2, 3)) ++
      oggPage(7, 88200L, 0x04, 2, Array[Byte](4, 5))
    val (f, ch, rate, dur, _, _) = meta(stream)
    assert((f, ch, rate, dur) == ("ogg-vorbis", 2, 44100, 2000L))
  }

  test("Ogg Opus: 48 kHz granule clock minus pre-skip (RFC 7845)") {
    val stream = oggPage(9, -1L, 0x02, 0, opusHead(1, 312)) ++
      oggPage(9, 48000L + 312, 0x04, 1, Array[Byte](1))
    val (f, ch, rate, dur, _, _) = meta(stream)
    assert((f, ch, rate, dur) == ("ogg-opus", 1, 48000, 1000L))
  }

  test("Ogg corpus-safety: multiplexed serials, missing EOS, other codecs -> unknown") {
    val v = oggPage(7, -1L, 0x02, 0, vorbisId(2, 44100))
    // second page with a different serial = multiplexed
    assert(meta(v ++ oggPage(8, 100L, 0x04, 1, Array[Byte](1)))._1
      == "unknown")
    // truncated: no EOS page
    assert(meta(v)._1 == "unknown")
    // unknown codec id packet
    assert(meta(oggPage(7, -1L, 0x02, 0,
      "theora-stuff-goes-here-padding".getBytes))._1 == "unknown")
  }

  test("corpus-safety: truncated frame, free-format, garbage -> unknown") {
    val good = mp3Frame(true, 9, 0, 0, false)
    assert(meta(good.dropRight(10))._1 == "unknown") // truncated
    val free = good.clone(); free(2) = (0 << 4 | 0 << 2).toByte
    assert(meta(free)._1 == "unknown") // bitrate index 0 (free-format)
    assert(meta("not audio at all".getBytes)._1 == "unknown")
    assert(meta(Array.empty[Byte])._1 == "unknown")
  }
}
