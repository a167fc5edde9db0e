package graft.multimodal

import java.io.ByteArrayOutputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[AudioDecodeExpr]] against the JDK's independent WAV writer
  * (javax.sound.sampled), hand-built chunk layouts (extra skipped
  * chunks, word-aligned odd-length chunks), both bit depths, and the
  * corpus-safety policy. */
class AudioDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def decode(bytes: Array[Byte])
      : (String, Int, Int, Int, Int, Seq[Int]) = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.decodeAudio(col("p")).as("a"))
      .select("a.format", "a.channels", "a.sample_rate", "a.bits",
        "a.n_samples", "a.samples").head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
      if (r.isNullAt(5)) null else r.getSeq[Int](5))
  }

  private def jdkWav(samples: Array[Short], channels: Int,
      rate: Float): Array[Byte] = {
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      raw(i * 2) = (s & 0xff).toByte
      raw(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate, 16, channels, true, false) // signed LE
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt,
      samples.length / channels)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("16-bit stereo PCM round-trips sample-exact against the JDK writer") {
    val samples = Array.tabulate[Short](64)(i => ((i * 523 - 7000) % 32768).toShort)
    val (f, ch, rate, bits, n, got) = decode(jdkWav(samples, 2, 16000f))
    assert((f, ch, rate, bits, n) == ("wav", 2, 16000, 16, 32))
    assert(got == samples.map(_.toInt).toSeq)
  }

  test("16-bit mono at 44100 round-trips") {
    val samples = Array.tabulate[Short](31)(i => (i * -997).toShort)
    val (f, ch, rate, bits, n, got) = decode(jdkWav(samples, 1, 44100f))
    assert((f, ch, rate, bits, n) == ("wav", 1, 44100, 16, 31))
    assert(got == samples.map(_.toInt).toSeq)
  }

  // hand-built WAV: header helpers
  private def le16b(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32b(v: Int) = Array[Byte]((v & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def wav(fmtCode: Int, channels: Int, rate: Int, bits: Int,
      data: Array[Byte], preChunks: Array[Byte] = Array.empty): Array[Byte] = {
    val fmt = "fmt ".getBytes ++ le32b(16) ++ le16b(fmtCode) ++
      le16b(channels) ++ le32b(rate) ++
      le32b(rate * channels * bits / 8) ++ le16b(channels * bits / 8) ++
      le16b(bits)
    val dataCh = "data".getBytes ++ le32b(data.length) ++ data
    val body = "WAVE".getBytes ++ preChunks ++ fmt ++ dataCh
    "RIFF".getBytes ++ le32b(body.length) ++ body
  }

  test("24-bit PCM round-trips sample-exact against the JDK writer") {
    // javax.sound writes a real 24-bit WAV container around raw LE
    // 3-byte frames; values cover both signs and the extremes
    val vals = Array(0, 1, -1, 8388607, -8388608, 123456, -654321, 42)
    val raw = new Array[Byte](vals.length * 3)
    vals.zipWithIndex.foreach { case (v, i) =>
      raw(i * 3) = (v & 0xff).toByte
      raw(i * 3 + 1) = ((v >> 8) & 0xff).toByte
      raw(i * 3 + 2) = ((v >> 16) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 24, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, vals.length)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val (f, ch, rate, bits, n, got) = decode(bos.toByteArray)
    assert((f, ch, rate, bits, n) == ("wav", 1, 8000, 24, vals.length))
    assert(got == vals.toSeq)
  }

  test("32-bit PCM decodes full-width two's complement") {
    val vals = Array(0, Int.MaxValue, Int.MinValue, -19088744, 305419896)
    val data = vals.flatMap(le32b)
    val (f, ch, rate, bits, n, got) = decode(wav(1, 1, 48000, 32, data))
    assert((f, ch, rate, bits, n) == ("wav", 1, 48000, 32, vals.length))
    assert(got == vals.toSeq)
  }

  test("8-bit PCM normalizes the 128 bias; unknown chunks (odd length) are skipped") {
    // a 5-byte LIST chunk before fmt exercises word-aligned skipping
    val junk = "LIST".getBytes ++ le32b(5) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val data = Array[Byte](0, 128.toByte, 255.toByte, 200.toByte)
    val (f, ch, rate, bits, n, got) =
      decode(wav(1, 2, 8000, 8, data, preChunks = junk))
    assert((f, ch, rate, bits, n) == ("wav", 2, 8000, 8, 2))
    assert(got == Seq(-128, 0, 127, 72))
  }

  private def g711ToPcmJdk(codes: Array[Byte],
      enc: AudioFormat.Encoding): Seq[Int] = {
    val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(codes), src, codes.length)
    val dst = new AudioFormat(8000f, 16, 1, true, false) // signed LE
    val pcm = AudioSystem.getAudioInputStream(dst, ais)
    val out = pcm.readAllBytes()
    Seq.tabulate(out.length / 2)(i =>
      ((out(2 * i) & 0xff) | (out(2 * i + 1) << 8)).toShort.toInt)
  }

  test("G.711 mu-law: all 256 codes expand exactly like the JDK codec") {
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val jdk = g711ToPcmJdk(codes, AudioFormat.Encoding.ULAW)
    val (f, ch, rate, bits, n, got) = decode(wav(7, 1, 8000, 8, codes))
    assert((f, ch, rate, bits, n) == ("wav-ulaw", 1, 8000, 8, 256))
    assert(got == jdk)
  }

  test("G.711 A-law: all 256 codes expand exactly like the JDK codec") {
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val jdk = g711ToPcmJdk(codes, AudioFormat.Encoding.ALAW)
    val (f, ch, rate, bits, n, got) = decode(wav(6, 1, 8000, 8, codes))
    assert((f, ch, rate, bits, n) == ("wav-alaw", 1, 8000, 8, 256))
    assert(got == jdk)
  }

  test("G.711 at a non-8 stored width is unknown (spec requires 8-bit codes)") {
    assert(decode(wav(7, 1, 8000, 16, new Array[Byte](8)))._1 == "unknown")
    assert(decode(wav(6, 1, 8000, 16, new Array[Byte](8)))._1 == "unknown")
  }

  test("corpus-safety: float PCM, truncated data, ragged frames, bombs are unknown") {
    // IEEE float (format 3) is not integer PCM
    assert(decode(wav(3, 1, 8000, 16, new Array[Byte](8)))._1 == "unknown")
    // data chunk claiming more bytes than the payload carries
    val good = wav(1, 1, 8000, 16, new Array[Byte](8))
    assert(decode(good.dropRight(4))._1 == "unknown")
    // ragged: 6 bytes of 16-bit stereo = 1.5 frames
    assert(decode(wav(1, 2, 8000, 16, new Array[Byte](6)))._1 == "unknown")
    // declared giant data chunk (bomb) on a tiny payload
    val bomb = "RIFF".getBytes ++ le32b(100) ++ "WAVE".getBytes ++
      "data".getBytes ++ le32b(Int.MaxValue)
    assert(decode(bomb)._1 == "unknown")
    assert(decode(Array[Byte](1, 2, 3))._1 == "unknown")
    assert(decode("RIFFxxxxAVI ".getBytes)._1 == "unknown")
  }
}
