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

  test("malformed TRAILING chunk after fmt+data is tolerated; before them it is not") {
    // real-world WAVs commonly carry junk after the data chunk: a
    // trailing chunk whose declared length overruns EOF ends the walk
    // instead of failing the file once the required chunks are in hand
    val data = Array[Byte](10, 0, 246.toByte, 0xff.toByte) // 10, -10
    val good = wav(1, 1, 8000, 16, data)
    val junkTail = "LIST".getBytes ++ le32b(1000) ++ Array[Byte](1, 2)
    val (f, ch, rate, bits, n, got) = decode(good ++ junkTail)
    assert((f, ch, rate, bits, n) == ("wav", 1, 8000, 16, 2))
    assert(got == Seq(10, -10))
    // bare trailing garbage that is not even a chunk header (< 8
    // bytes) is ignored by the walk loop condition
    assert(decode(good ++ Array[Byte](7))._1 == "wav")
    // the same malformed chunk BEFORE fmt/data still fails the file:
    // skipping it blind could jump past real chunks
    val bad = wav(1, 1, 8000, 16, data, preChunks = junkTail)
    assert(decode(bad)._1 == "unknown")
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

  // IMA ADPCM reference ENCODER (the standard IMA 1992 forward path:
  // pick the nibble by successive step comparisons, then advance the
  // state with the same integer recursion the decoder runs). The
  // roundtrip invariant is exact: the decoder must reproduce the
  // encoder's reconstructed predictor sequence bit-for-bit — this is
  // the independent check (the encoder is forward/quantizing, the
  // decoder inverse), and it exercises the MS IMA block layout.
  private def imaEncode(samples: Array[Int], channels: Int,
      blockAlign: Int): (Array[Byte], Array[Int]) = {
    val spb = 1 + (blockAlign - 4 * channels) / channels * 2
    val frames = samples.length / channels
    require(frames % spb == 0, "test data must fill whole blocks")
    val nBlocks = frames / spb
    val bytes = new Array[Byte](nBlocks * blockAlign)
    val recon = new Array[Int](samples.length)
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    for (blk <- 0 until nBlocks) {
      val bo = blk * blockAlign
      for (c <- 0 until channels) {
        // header: current predictor snapped to the block's first sample
        pred(c) = samples((blk * spb) * channels + c)
        bytes(bo + 4 * c) = (pred(c) & 0xff).toByte
        bytes(bo + 4 * c + 1) = ((pred(c) >> 8) & 0xff).toByte
        bytes(bo + 4 * c + 2) = idx(c).toByte
        recon((blk * spb) * channels + c) = pred(c)
      }
      val words = (blockAlign - 4 * channels) / 4
      for (w <- 0 until words) {
        val ch = w % channels
        val g = w / channels
        for (k <- 0 until 8) {
          val f = 1 + g * 8 + k
          val target = samples((blk * spb + f) * channels + ch)
          val step = AudioDecodeExpr.ImaStep(idx(ch))
          var delta = target - pred(ch)
          var n = 0
          if (delta < 0) { n = 8; delta = -delta }
          var d = step
          if (delta >= d) { n |= 4; delta -= d }
          d >>= 1
          if (delta >= d) { n |= 2; delta -= d }
          d >>= 1
          if (delta >= d) { n |= 1 }
          // decoder-identical state advance
          var diff = step >> 3
          if ((n & 1) != 0) diff += step >> 2
          if ((n & 2) != 0) diff += step >> 1
          if ((n & 4) != 0) diff += step
          var p = if ((n & 8) != 0) pred(ch) - diff else pred(ch) + diff
          if (p > 32767) p = 32767 else if (p < -32768) p = -32768
          pred(ch) = p
          var ni = idx(ch) + AudioDecodeExpr.ImaIndex(n)
          if (ni < 0) ni = 0 else if (ni > 88) ni = 88
          idx(ch) = ni
          recon((blk * spb + f) * channels + ch) = p
          val bi = bo + 4 * channels + 4 * w + (k >> 1)
          if ((k & 1) == 0) bytes(bi) = (n & 0xf).toByte
          else bytes(bi) = (bytes(bi) | (n << 4)).toByte
        }
      }
    }
    (bytes, recon)
  }

  private def imaWav(data: Array[Byte], channels: Int, rate: Int,
      blockAlign: Int, factFrames: Int = -1): Array[Byte] = {
    val spb = 1 + (blockAlign - 4 * channels) / channels * 2
    val fmt = "fmt ".getBytes ++ le32b(20) ++ le16b(17) ++
      le16b(channels) ++ le32b(rate) ++
      le32b(rate * blockAlign / spb) ++ le16b(blockAlign) ++
      le16b(4) ++ le16b(2) ++ le16b(spb)
    val fact =
      if (factFrames < 0) Array.empty[Byte]
      else "fact".getBytes ++ le32b(4) ++ le32b(factFrames)
    val dataCh = "data".getBytes ++ le32b(data.length) ++ data
    val body = "WAVE".getBytes ++ fmt ++ fact ++ dataCh
    "RIFF".getBytes ++ le32b(body.length) ++ body
  }

  test("IMA ADPCM: hand-derived mono block decodes exactly") {
    // p0=0, i0=0, nibbles 7,3,1,15,0,8,12,9 — derived by hand with the
    // IMA recursion:
    //   n=7:  step=7,  diff=0+1+3+7=11  -> p=11,  i=8
    //   n=3:  step=16, diff=2+4+8=14    -> p=25,  i=7
    //   n=1:  step=14, diff=1+3=4       -> p=29,  i=6
    //   n=15: step=13, diff=1+3+6+13=23 -> p=6,   i=14
    //   n=0:  step=28, diff=3           -> p=9,   i=13
    //   n=8:  step=25, diff=3           -> p=6,   i=12
    //   n=12: step=23, diff=2+23=25     -> p=-19, i=14
    //   n=9:  step=28, diff=3+7=10      -> p=-29, i=13
    val data = Array[Byte](0, 0, 0, 0, // header: pred 0, index 0
      0x37, 0xF1.toByte, 0x80.toByte, 0x9C.toByte) // low nibble first
    val (f, ch, rate, bits, n, got) = decode(imaWav(data, 1, 8000, 8))
    assert((f, ch, rate, bits, n) == ("wav-ima", 1, 8000, 4, 9))
    assert(got == Seq(0, 11, 25, 29, 6, 9, 6, -19, -29))
  }

  test("IMA ADPCM: hand-derived block exercising both int16 clamps and the index ceiling") {
    // p0=32000, i0=88 (step 32767), nibbles 7,15,8,8,0,0,0,0 — derived
    // by hand, INDEPENDENT of the encoder-roundtrip test (which shares
    // the recursion code with the decoder):
    //   n=7:  diff=4095+8191+16383=28669 -> 60669 CLAMPS to 32767, i=96->88
    //   n=15: diff=28669+32767=61436     -> -28669,               i=88
    //   n=8:  diff=4095                  -> -32764,               i=87
    //   n=8:  step=29794, diff=3724      -> -36488 CLAMPS -32768, i=86
    //   n=0:  step=27086, diff=3385      -> -29383,               i=85
    //   n=0:  step=24623, diff=3077      -> -26306,               i=84
    //   n=0:  step=22385, diff=2798      -> -23508,               i=83
    //   n=0:  step=20350, diff=2543      -> -20965,               i=82
    val data = Array[Byte](0x00, 0x7D, 88.toByte, 0, // pred 32000, idx 88
      0xF7.toByte, 0x88.toByte, 0x00, 0x00)
    val (f, ch, rate, bits, n, got) = decode(imaWav(data, 1, 8000, 8))
    assert((f, ch, rate, bits, n) == ("wav-ima", 1, 8000, 4, 9))
    assert(got == Seq(32000, 32767, -28669, -32764, -32768,
      -29383, -26306, -23508, -20965))
  }

  test("IMA ADPCM: a fact chunk placed AFTER data still truncates (RIFF order-free)") {
    val samples = Array.tabulate(18)(i => i * 1000 - 9000)
    val (data, recon) = imaEncode(samples, 1, 8)
    // hand-assemble with chunk order [fmt, data, fact]
    val spb = 9
    val fmt = "fmt ".getBytes ++ le32b(20) ++ le16b(17) ++ le16b(1) ++
      le32b(8000) ++ le32b(8000 * 8 / spb) ++ le16b(8) ++
      le16b(4) ++ le16b(2) ++ le16b(spb)
    val dataCh = "data".getBytes ++ le32b(data.length) ++ data
    val fact = "fact".getBytes ++ le32b(4) ++ le32b(13)
    val body = "WAVE".getBytes ++ fmt ++ dataCh ++ fact
    val wavBytes = "RIFF".getBytes ++ le32b(body.length) ++ body
    val (f, _, _, _, n, got) = decode(wavBytes)
    assert(f == "wav-ima" && n == 13)
    assert(got == recon.take(13).toSeq)
  }

  test("IMA ADPCM: a fact chunk truncates the padded final block") {
    val samples = Array.tabulate(18)(i => i * 1000 - 9000)
    val (data, recon) = imaEncode(samples, 1, 8) // 2 blocks x 9 frames
    // true count 13: the last block carries 4 real + 5 pad frames
    val (f, _, _, _, n, got) = decode(imaWav(data, 1, 8000, 8,
      factFrames = 13))
    assert(f == "wav-ima" && n == 13)
    assert(got == recon.take(13).toSeq)
    // a fact count that drops a whole block is malformed
    assert(decode(imaWav(data, 1, 8000, 8, factFrames = 9))._1
      == "unknown")
    assert(decode(imaWav(data, 1, 8000, 8, factFrames = 99))._1
      == "unknown")
  }

  test("IMA ADPCM: decoder tracks the reference encoder bit-exactly (mono + stereo, multi-block)") {
    val rnd = new scala.util.Random(20260816)
    for ((channels, blockAlign, blocks) <- Seq((1, 12, 3), (2, 16, 2),
        (2, 24, 3), (1, 256, 2))) {
      val spb = 1 + (blockAlign - 4 * channels) / channels * 2
      val samples = Array.fill(blocks * spb * channels)(
        rnd.nextInt(65536) - 32768)
      val (data, recon) = imaEncode(samples, channels, blockAlign)
      val (f, ch, rate, bits, n, got) =
        decode(imaWav(data, channels, 16000, blockAlign))
      assert((f, ch, rate, bits, n) ==
        ("wav-ima", channels, 16000, 4, blocks * spb))
      assert(got == recon.toSeq, s"ch=$channels align=$blockAlign")
    }
  }

  private def msWav(data: Array[Byte], channels: Int, rate: Int,
      blockAlign: Int, factFrames: Int = -1): Array[Byte] = {
    val fmt = "fmt ".getBytes ++ le32b(16) ++ le16b(2) ++
      le16b(channels) ++ le32b(rate) ++ le32b(rate) ++
      le16b(blockAlign) ++ le16b(4)
    val fact =
      if (factFrames < 0) Array.empty[Byte]
      else "fact".getBytes ++ le32b(4) ++ le32b(factFrames)
    val dataCh = "data".getBytes ++ le32b(data.length) ++ data
    val body = "WAVE".getBytes ++ fmt ++ fact ++ dataCh
    "RIFF".getBytes ++ le32b(body.length) ++ body
  }

  // MS ADPCM reference encoder: standard nibble selection (ideal
  // delta-scaled error, truncated and clamped to [-8, 7]) + the same
  // state recursion the decoder runs — the roundtrip invariant is
  // exact on the reconstruction.
  private def msEncode(samples: Array[Int], channels: Int,
      blockAlign: Int): (Array[Byte], Array[Int]) = {
    import AudioDecodeExpr.{MsCoef1, MsCoef2, MsAdapt}
    val nibbles = (blockAlign - 7 * channels) * 2
    val spb = 2 + nibbles / channels
    val frames = samples.length / channels
    require(frames % spb == 0, "test data must fill whole blocks")
    val nBlocks = frames / spb
    val bytes = new Array[Byte](nBlocks * blockAlign)
    val recon = new Array[Int](samples.length)
    for (blk <- 0 until nBlocks) {
      val bo = blk * blockAlign
      val predIdx = blk % 7 // exercise every coefficient pair
      val delta = new Array[Int](channels)
      val s1 = new Array[Int](channels); val s2 = new Array[Int](channels)
      for (c <- 0 until channels) {
        bytes(bo + c) = predIdx.toByte
        delta(c) = 16 + 8 * c + blk
        s2(c) = samples((blk * spb) * channels + c)
        s1(c) = samples((blk * spb + 1) * channels + c)
        def le16w(off: Int, v: Int): Unit = {
          bytes(off) = (v & 0xff).toByte; bytes(off + 1) = (v >> 8).toByte
        }
        le16w(bo + channels + 2 * c, delta(c))
        le16w(bo + 3 * channels + 2 * c, s1(c))
        le16w(bo + 5 * channels + 2 * c, s2(c))
        recon((blk * spb) * channels + c) = s2(c)
        recon((blk * spb + 1) * channels + c) = s1(c)
      }
      for (k <- 0 until nibbles) {
        val ch = k % channels
        val f = 2 + k / channels
        val target = samples((blk * spb + f) * channels + ch)
        // MS-spec truncating division (NOT >>8): negative coefficient
        // sums round toward zero, matching ffmpeg and the decoder
        val base = (s1(ch) * MsCoef1(predIdx) +
          s2(ch) * MsCoef2(predIdx)) / 256
        var sn = (target - base) / delta(ch)
        if (sn > 7) sn = 7 else if (sn < -8) sn = -8
        val n = sn & 0xf
        // decoder-identical advance
        var p = base + sn * delta(ch)
        if (p > 32767) p = 32767 else if (p < -32768) p = -32768
        s2(ch) = s1(ch); s1(ch) = p
        var d = (MsAdapt(n) * delta(ch)) >> 8
        if (d < 16) d = 16
        delta(ch) = d
        recon((blk * spb + f) * channels + ch) = p
        val bi = bo + 7 * channels + (k >> 1)
        if ((k & 1) == 0) bytes(bi) = (n << 4).toByte // HIGH first
        else bytes(bi) = (bytes(bi) | n).toByte
      }
    }
    (bytes, recon)
  }

  test("MS ADPCM: hand-derived mono block decodes exactly") {
    // predIdx=1 (512,-256), delta=16, s1=100, s2=50, nibbles 3,12,0,9:
    //   n=3:  base=(100*512+50*-256)>>8=150, p=150+48=198, d=max(16,(230*16)>>8)=16
    //   n=12: base=(198*512+100*-256)>>8=296, sn=-4, p=296-64=232, d=(307*16)>>8=19
    //   n=0:  base=(232*512+198*-256)>>8=266, p=266, d=max(16,(230*19)>>8)=17
    //   n=9:  base=(266*512+232*-256)>>8=300, sn=-7, p=300-119=181
    val data = Array[Byte](1, 16, 0, 100, 0, 50, 0, // header
      0x3C.toByte, 0x09.toByte) // nibbles HIGH first: (3,12) (0,9)
    val (f, ch, rate, bits, n, got) = decode(msWav(data, 1, 8000, 9))
    assert((f, ch, rate, bits, n) == ("wav-ms", 1, 8000, 4, 6))
    assert(got == Seq(50, 100, 198, 232, 266, 181))
  }

  test("MS ADPCM: negative predictor sums truncate toward zero (MS spec), not floor-shift") {
    // predIdx=4 (240,0), delta=16, s1=-101, s2=7 — every base is a
    // negative sum NOT divisible by 256, so /256 and >>8 differ by 1
    // and the error compounds through the s1/s2 feedback:
    //   n=1:  base=(-101*240)/256=-94 (>>8 gives -95), p=-94+16=-78
    //   n=15: base=(-78*240)/256=-73,  p=-73-16=-89
    //   n=2:  base=(-89*240)/256=-83,  p=-83+32=-51
    //   n=8:  base=(-51*240)/256=-47,  p=-47-128=-175
    val data = Array[Byte](4, 16, 0, 0x9B.toByte, 0xFF.toByte, 7, 0,
      0x1F.toByte, 0x28.toByte) // nibbles HIGH first: (1,15) (2,8)
    val (f, ch, rate, bits, n, got) = decode(msWav(data, 1, 8000, 9))
    assert((f, ch, rate, bits, n) == ("wav-ms", 1, 8000, 4, 6))
    assert(got == Seq(7, -101, -78, -89, -51, -175))
  }

  test("MS ADPCM: decoder tracks the reference encoder bit-exactly (mono + stereo, multi-block)") {
    val rnd = new scala.util.Random(20260817)
    for ((channels, blockAlign, blocks) <- Seq((1, 11, 7), (2, 18, 3),
        (2, 30, 2), (1, 128, 2))) {
      val nibbles = (blockAlign - 7 * channels) * 2
      val spb = 2 + nibbles / channels
      val samples = Array.fill(blocks * spb * channels)(
        rnd.nextInt(65536) - 32768)
      val (data, recon) = msEncode(samples, channels, blockAlign)
      val (f, ch, rate, bits, n, got) =
        decode(msWav(data, channels, 22050, blockAlign))
      assert((f, ch, rate, bits, n) ==
        ("wav-ms", channels, 22050, 4, blocks * spb))
      assert(got == recon.toSeq, s"ch=$channels align=$blockAlign")
    }
  }

  test("MS ADPCM: fact truncation and corpus safety") {
    val samples = Array.tabulate(12)(i => i * 500 - 3000)
    val (data, recon) = msEncode(samples, 1, 9) // 2 blocks x 6 frames
    val (f, _, _, _, n, got) = decode(msWav(data, 1, 8000, 9,
      factFrames = 8))
    assert(f == "wav-ms" && n == 8)
    assert(got == recon.take(8).toSeq)
    // whole-block drop or over-claim -> unknown
    assert(decode(msWav(data, 1, 8000, 9, factFrames = 6))._1 == "unknown")
    assert(decode(msWav(data, 1, 8000, 9, factFrames = 13))._1 == "unknown")
    // nonstandard predictor index -> unknown
    val bad = data.clone(); bad(0) = 7
    assert(decode(msWav(bad, 1, 8000, 9))._1 == "unknown")
    // trailing partial block -> unknown
    assert(decode(msWav(data ++ Array[Byte](1, 2), 1, 8000, 9))._1
      == "unknown")
  }

  private def jdkContainer(samples: Array[Short], channels: Int,
      rate: Float, fileType: AudioFileFormat.Type): Array[Byte] = {
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) => // big-endian payload
      raw(i * 2) = ((s >> 8) & 0xff).toByte
      raw(i * 2 + 1) = (s & 0xff).toByte
    }
    val fmt = new AudioFormat(rate, 16, channels, true, true) // signed BE
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt,
      samples.length / channels)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, fileType, bos)
    bos.toByteArray
  }

  test("au: 16-bit stereo round-trips sample-exact against the JDK writer") {
    val samples = Array.tabulate[Short](64)(i => ((i * 523 - 7000) % 32768).toShort)
    val (f, ch, rate, bits, n, got) =
      decode(jdkContainer(samples, 2, 8000f, AudioFileFormat.Type.AU))
    assert((f, ch, rate, bits, n) == ("au", 2, 8000, 16, 32))
    assert(got == samples.map(_.toInt).toSeq)
  }

  test("au: mu-law payload decodes exactly like the JDK codec") {
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val src = new AudioFormat(AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(codes), src, codes.length)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AU, bos)
    val (f, ch, rate, bits, n, got) = decode(bos.toByteArray)
    assert((f, ch, rate, bits, n) == ("au-ulaw", 1, 8000, 8, 256))
    assert(got == g711ToPcmJdk(codes, AudioFormat.Encoding.ULAW))
  }

  test("aiff: 16-bit mono round-trips sample-exact against the JDK writer (80-bit rate)") {
    for (rate <- Seq(8000f, 44100f, 48000f)) {
      val samples = Array.tabulate[Short](31)(i => (i * -997).toShort)
      val (f, ch, r, bits, n, got) =
        decode(jdkContainer(samples, 1, rate, AudioFileFormat.Type.AIFF))
      assert((f, ch, r, bits, n) == ("aiff", 1, rate.toInt, 16, 31))
      assert(got == samples.map(_.toInt).toSeq)
    }
  }

  test("aiff: 8-bit signed PCM via the JDK writer") {
    val vals = Array[Byte](0, 1, -1, 127, -128, 42, -42)
    val fmt = new AudioFormat(8000f, 8, 1, true, true)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(vals), fmt, vals.length)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
    val (f, ch, r, bits, n, got) = decode(bos.toByteArray)
    assert((f, ch, r, bits, n) == ("aiff", 1, 8000, 8, vals.length))
    assert(got == vals.map(_.toInt).toSeq)
  }

  test("au/aiff corpus-safety: truncation and malformed rates are unknown") {
    val au = jdkContainer(Array.tabulate[Short](8)(_.toShort), 1, 8000f,
      AudioFileFormat.Type.AU)
    assert(decode(au.dropRight(3))._1 == "unknown")
    val aiff = jdkContainer(Array.tabulate[Short](8)(_.toShort), 1, 8000f,
      AudioFileFormat.Type.AIFF)
    assert(decode(aiff.dropRight(3))._1 == "unknown")
    // AIFF with a non-integer 80-bit rate (8000.5 Hz) -> unknown:
    // patch the COMM rate field of a valid file
    val idx = {
      var i = 12; var at = -1
      while (at < 0 && i + 8 <= aiff.length) {
        if (new String(aiff, i, 4, "US-ASCII") == "COMM") at = i
        else i += 8 + ((aiff(i + 4) & 0xff) << 24 |
          (aiff(i + 5) & 0xff) << 16 | (aiff(i + 6) & 0xff) << 8 |
          (aiff(i + 7) & 0xff)) + 1 & ~1
      }
      at
    }
    assert(idx > 0)
    val bad = aiff.clone()
    // 8000.5 = 0x1F41 / 2 -> exp 16394, mantissa 0xFA10... <<; simplest:
    // keep exp for 8000 (16395) and set a low mantissa bit that the
    // shift (16446-16395=51) would lose
    bad(idx + 18 + 7) = 1
    assert(decode(bad)._1 == "unknown")
  }

  test("IMA ADPCM corpus-safety: ragged block, bad index, misaligned words are unknown") {
    // trailing partial block (data length not a multiple of block align)
    val (data, _) = imaEncode(new Array[Int](9), 1, 8)
    assert(decode(imaWav(data ++ Array[Byte](1, 2), 1, 8000, 8))._1
      == "unknown")
    // step index beyond 88 in the block header
    val bad = data.clone(); bad(2) = 90.toByte
    assert(decode(imaWav(bad, 1, 8000, 8))._1 == "unknown")
    // block align that does not fill whole 4-byte words per channel
    assert(decode(imaWav(new Array[Byte](10), 1, 8000, 10))._1 == "unknown")
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
