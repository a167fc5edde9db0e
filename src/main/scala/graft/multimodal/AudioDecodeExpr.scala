package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** audio_decode(payload): REAL audio decode for RIFF/WAVE PCM — the
  * audio analogue of [[ImageDecodeExpr]]: WAV's PCM payload is exact
  * byte manipulation (no psychoacoustic codec), so corpus-scale sample
  * extraction (silence/clipping detection, loudness stats, resampling
  * prep) runs as a pure map-side projection with oracle-exact results.
  *
  * Supported: RIFF/WAVE with an fmt chunk of audio format 1 (integer
  * PCM) at 8, 16, 24 or 32 bits per sample, any channel count /
  * sample rate (float WAVs — format 3 — stay unsupported: their
  * int mapping has no canonical rounding, unlike integer PCM), plus
  * the two G.711 companded telephony codecs: format 6 (A-law) and
  * format 7 (mu-law), both 8 bits stored. G.711 expansion is a pure
  * integer table map (ITU-T G.711 / the public-domain g711.c
  * reference: sign + 3-bit segment + 4-bit quantization), so the
  * decode is bit-deterministic like integer PCM — samples expand to
  * the canonical 16-bit linear values. Formats 17 (IMA/DVI ADPCM) and
  * 2 (MS ADPCM), the two common compressed WAV codecs, are decoded via
  * their public integer recursions — again float-free, so corpus
  * decode stays oracle-exact. Beyond RIFF, the Sun/NeXT .au container
  * (G.711 + big-endian PCM encodings) and AIFF (COMM/SSND walk, the
  * 80-bit extended sample rate decoded with exact integer arithmetic)
  * are handled with the same sample decoders.
  * Output: struct<format, channels, sample_rate, bits, n_samples,
  * samples array<int>> — samples are interleaved frames in channel
  * order (the canonical layout); 8-bit WAV (unsigned, biased 128)
  * normalizes to signed [-128, 127]; 16/24/32-bit are signed
  * little-endian two's complement at full width; formats "wav-ulaw" /
  * "wav-alaw" report bits = 8 and "wav-ima" bits = 4 (the stored
  * widths) with 16-bit linear sample values. `n_samples` counts
  * frames per channel.
  *
  * Scale discipline (same policy as the image decode):
  *  - malformed / truncated / unsupported codecs (float, MS-ADPCM,
  *    extensible) → ("unknown", -1, -1, -1, -1, NULL), never thrown;
  *  - declared sample count capped at 2^26 ints before allocation;
  *  - chunk walk skips unknown chunks (LIST/INFO/fact/cue) like any
  *    real parser; a data chunk longer than the payload is truncated
  *    decode → unknown.
  *
  * Reference: the multimodal preprocessing stage of the table API; the
  * byte layout follows the public RIFF/WAVE specification. */
case class AudioDecodeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import ImageDecodeExpr.MaxPixels // shared 2^26 allocation cap

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("samples", ArrayType(IntegerType, containsNull = false),
      nullable = true)))
  override def prettyName: String = "audio_decode"

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private val unknown = InternalRow(
    UTF8String.fromString("unknown"), -1, -1, -1, -1, null)

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try decode(b) catch { case _: Exception => unknown }
  }

  private def decode(b: Array[Byte]): InternalRow = {
    if (b.length >= 4 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
        b(3) == 'C')
      return FlacDecode.decode(b, MaxPixels) match {
        case Some(r) => InternalRow(UTF8String.fromString("flac"),
          r.channels, r.sampleRate, r.bits, r.frames,
          new GenericArrayData(r.samples))
        case None => unknown
      }
    if (b.length >= 24 && b(0) == '.' && b(1) == 's' && b(2) == 'n' &&
        b(3) == 'd') return au(b)
    if (b.length >= 12 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' &&
        b(3) == 'M' && b(8) == 'A' && b(9) == 'I' && b(10) == 'F' &&
        b(11) == 'F') return aiff(b)
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
        b(11) != 'E') return unknown
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var fmtCode = -1
    var blockAlign = -1; var factFrames = -1
    var dataOff = -1; var dataLen = -1
    // walk EVERY chunk: RIFF does not mandate chunk order, and the
    // ADPCM fact-chunk truncation must see a fact placed after data.
    // Real-world WAVs commonly carry junk after the data chunk, so a
    // malformed TRAILING chunk (bad id/length once fmt+data are in
    // hand) ends the walk instead of failing the file; a bad chunk
    // before the required pair still maps to unknown.
    var walking = true
    while (walking && i + 8 <= b.length) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = le32(b, i + 4)
      if (len < 0 || i + 8 + len > b.length) {
        if (fmtCode >= 0 && dataOff >= 0) { walking = false }
        else return unknown
      } else {
      id match {
        case "fmt " =>
          if (len < 16) return unknown
          fmtCode = le16(b, i + 8)
          channels = le16(b, i + 10)
          rate = le32(b, i + 12)
          blockAlign = le16(b, i + 20)
          bits = le16(b, i + 22)
        case "data" => dataOff = i + 8; dataLen = len
        case "fact" if len >= 4 => // true frame count (compressed fmts)
          factFrames = le32(b, i + 8)
        case _ => () // LIST / cue / bext ... skipped
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
      }
    }
    if (fmtCode == 17) // IMA/DVI ADPCM: block-structured 4-bit codes
      return decodeImaAdpcm(b, dataOff, dataLen, channels, rate,
        bits, blockAlign, factFrames)
    if (fmtCode == 2) // MS ADPCM: coefficient-pair predictor blocks
      return decodeMsAdpcm(b, dataOff, dataLen, channels, rate,
        bits, blockAlign, factFrames)
    val g711 = fmtCode == 6 || fmtCode == 7
    if ((fmtCode != 1 && !g711) || channels <= 0 || rate <= 0 ||
        (g711 && bits != 8) ||
        (!g711 && bits != 8 && bits != 16 && bits != 24 && bits != 32) ||
        dataOff < 0) return unknown
    val bytesPer = bits / 8
    val total = dataLen / bytesPer // interleaved sample count
    if (total.toLong > MaxPixels) return unknown // allocation bomb
    if (total % channels != 0) return unknown // ragged final frame
    val out = new Array[Int](total)
    var s = 0
    while (s < total) {
      val o = dataOff + s * bytesPer
      out(s) =
        if (fmtCode == 7) AudioDecodeExpr.ulaw2linear(b(o) & 0xff)
        else if (fmtCode == 6) AudioDecodeExpr.alaw2linear(b(o) & 0xff)
        else bits match {
          case 8 => (b(o) & 0xff) - 128 // unsigned + bias
          case 16 => le16(b, o).toShort.toInt // signed LE
          case 24 => // signed LE 3 bytes: shift-extend the sign
            (((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
              ((b(o + 2) & 0xff) << 16)) << 8) >> 8
          case _ => le32(b, o) // signed LE int32
        }
      s += 1
    }
    val fmt = fmtCode match {
      case 7 => "wav-ulaw"
      case 6 => "wav-alaw"
      case _ => "wav"
    }
    InternalRow(UTF8String.fromString(fmt), channels, rate, bits,
      total / channels, new GenericArrayData(out))
  }

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** Big-endian signed PCM block → interleaved int samples (the AU and
    * AIFF payload layout; 8-bit is SIGNED in both, unlike WAV). */
  private def bePcm(b: Array[Byte], off: Int, total: Int,
      bytesPer: Int): Array[Int] = {
    val out = new Array[Int](total)
    var s = 0
    while (s < total) {
      val o = off + s * bytesPer
      out(s) = bytesPer match {
        case 1 => b(o).toInt // signed
        case 2 => be16(b, o).toShort.toInt
        case 3 => (((b(o) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) |
          (b(o + 2) & 0xff)) << 8 >> 8
        case _ => be32(b, o)
      }
      s += 1
    }
    out
  }

  /** Sun/NeXT .au (the public AU header; parsed by the shared
    * [[AudioHeaders.parseAu]]): encodings 1/27 are G.711 mu-law/A-law
    * (expanded to 16-bit linear like the WAV path), 2-5 are signed
    * big-endian linear PCM at 8/16/24/32 bits. */
  private def au(b: Array[Byte]): InternalRow =
    AudioHeaders.parseAu(b) match {
      case None => unknown
      case Some(h) =>
        val total = h.dataLen / h.bytesPer
        if (total.toLong > MaxPixels) return unknown
        if (total % h.channels != 0) return unknown
        val out =
          if (h.enc == 1 || h.enc == 27) {
            val o = new Array[Int](total)
            var s = 0
            while (s < total) {
              o(s) =
                if (h.enc == 1)
                  AudioDecodeExpr.ulaw2linear(b(h.dataOff + s) & 0xff)
                else AudioDecodeExpr.alaw2linear(b(h.dataOff + s) & 0xff)
              s += 1
            }
            o
          } else bePcm(b, h.dataOff, total, h.bytesPer)
        val fmt = h.enc match {
          case 1 => "au-ulaw"
          case 27 => "au-alaw"
          case _ => "au"
        }
        InternalRow(UTF8String.fromString(fmt), h.channels, h.rate, h.bits,
          total / h.channels, new GenericArrayData(out))
    }

  /** AIFF (EA IFF 85 / Apple AIFF 1.3; COMM/SSND walk + exact 80-bit
    * rate via the shared [[AudioHeaders.parseAiff]]): SSND carries
    * big-endian signed PCM after its offset field. */
  private def aiff(b: Array[Byte]): InternalRow =
    AudioHeaders.parseAiff(b) match {
      case None => unknown
      case Some(h) =>
        if (h.dataOff < 0) return unknown // metadata-only file
        val bytesPer = h.bits match {
          case 8 => 1
          case 16 => 2
          case 24 => 3
          case 32 => 4
          case _ => return unknown // sub-byte / float AIFC unsupported
        }
        val total = h.frames.toLong * h.channels
        if (total > MaxPixels) return unknown
        if (total * bytesPer > h.dataAvail) return unknown // truncated
        val out = bePcm(b, h.dataOff, total.toInt, bytesPer)
        InternalRow(UTF8String.fromString("aiff"), h.channels, h.rate,
          h.bits, h.frames, new GenericArrayData(out))
    }

  /** MS ADPCM (RIFF fmt code 2): per block, per channel, a predictor
    * index into the 7 STANDARD coefficient pairs, an int16 initial
    * delta and the first two int16 samples (emitted as frames 0 and
    * 1), then 4-bit codes interleaved per sample across channels, HIGH
    * nibble first. The recursion is the public Microsoft algorithm —
    * pred = (s1*c1 + s2*c2) / 256 + signed(n)*delta, int16 clamp,
    * delta = (Adapt[n]*delta) >> 8 floored at 16 — all integer
    * arithmetic. The predictor base uses TRUNCATING division toward
    * zero, matching the MS spec pseudocode and ffmpeg: an arithmetic
    * floor shift (>> 8) differs by 1 on every negative coefficient
    * sum not divisible by 256, and the error compounds through the
    * s1/s2 feedback. (The delta update stays >> 8: delta is always
    * positive, so floor and truncation agree.) Files using
    * nonstandard coefficient tables (predictor
    * index > 6) map to unknown; the fact chunk truncates the padded
    * final block like the IMA path. */
  private def decodeMsAdpcm(b: Array[Byte], dataOff: Int, dataLen: Int,
      channels: Int, rate: Int, bits: Int, blockAlign: Int,
      factFrames: Int): InternalRow = {
    import AudioDecodeExpr.{MsCoef1, MsCoef2, MsAdapt}
    if (channels <= 0 || rate <= 0 || bits != 4 || dataOff < 0 ||
        blockAlign < 7 * channels ||
        ((blockAlign - 7 * channels) * 2) % channels != 0 ||
        dataLen % blockAlign != 0) return unknown
    val nBlocks = dataLen / blockAlign
    val nibbles = (blockAlign - 7 * channels) * 2
    val spb = 2 + nibbles / channels
    val total = nBlocks.toLong * spb * channels
    if (total > MaxPixels) return unknown // allocation bomb
    val out = new Array[Int](total.toInt)
    val c1 = new Array[Int](channels); val c2 = new Array[Int](channels)
    val delta = new Array[Int](channels)
    val s1 = new Array[Int](channels); val s2 = new Array[Int](channels)
    var blk = 0
    while (blk < nBlocks) {
      val bo = dataOff + blk * blockAlign
      var c = 0
      while (c < channels) {
        val idx = b(bo + c) & 0xff
        if (idx > 6) return unknown // nonstandard coefficient table
        c1(c) = MsCoef1(idx); c2(c) = MsCoef2(idx)
        delta(c) = le16(b, bo + channels + 2 * c).toShort.toInt
        s1(c) = le16(b, bo + 3 * channels + 2 * c).toShort.toInt
        s2(c) = le16(b, bo + 5 * channels + 2 * c).toShort.toInt
        // the two header samples are the first two frames, older first
        out(blk * spb * channels + c) = s2(c)
        out((blk * spb + 1) * channels + c) = s1(c)
        c += 1
      }
      val base = bo + 7 * channels
      var k = 0
      while (k < nibbles) {
        val by = b(base + (k >> 1)) & 0xff
        val n = if ((k & 1) == 0) by >>> 4 else by & 0xf // HIGH first
        val ch = k % channels
        val sn = if (n >= 8) n - 16 else n
        // truncating /256, NOT >>8: negative sums round toward zero
        var p = (s1(ch) * c1(ch) + s2(ch) * c2(ch)) / 256 + sn * delta(ch)
        if (p > 32767) p = 32767 else if (p < -32768) p = -32768
        s2(ch) = s1(ch); s1(ch) = p
        var d = (MsAdapt(n) * delta(ch)) >> 8
        if (d < 16) d = 16
        delta(ch) = d
        out((blk * spb + 2 + k / channels) * channels + ch) = p
        k += 1
      }
      blk += 1
    }
    val frames =
      if (factFrames < 0) nBlocks * spb
      else if (factFrames <= nBlocks * spb &&
          factFrames > (nBlocks - 1) * spb) factFrames
      else return unknown
    val trimmed =
      if (frames == nBlocks * spb) out
      else java.util.Arrays.copyOf(out, frames * channels)
    InternalRow(UTF8String.fromString("wav-ms"), channels, rate, bits,
      frames, new GenericArrayData(trimmed))
  }

  /** IMA/DVI ADPCM (RIFF fmt code 17): per block a 4-byte header per
    * channel (int16 LE initial predictor = sample 0, uint8 step index,
    * reserved), then 4-byte code words alternating across channels
    * (8 nibbles each, low nibble first). The nibble update is the IMA
    * 1992 integer recursion (step>>3 cascade, clamp to int16, index
    * table) — bit-deterministic, no floats anywhere. A fact chunk's
    * frame count truncates the final block (standard encoders pad the
    * last block to a full blockAlign and record the true count there —
    * emitting the pad frames would diverge from every reference
    * decoder). Strict corpus policy: a trailing partial block, a block
    * align not filling whole words per channel, an out-of-range step
    * index, or a fact count that is not within the final block →
    * unknown. */
  private def decodeImaAdpcm(b: Array[Byte], dataOff: Int, dataLen: Int,
      channels: Int, rate: Int, bits: Int, blockAlign: Int,
      factFrames: Int): InternalRow = {
    import AudioDecodeExpr.{ImaStep, ImaIndex}
    if (channels <= 0 || rate <= 0 || bits != 4 || dataOff < 0 ||
        blockAlign < 4 * channels ||
        (blockAlign - 4 * channels) % (4 * channels) != 0 ||
        dataLen % blockAlign != 0) return unknown
    val nBlocks = dataLen / blockAlign
    // frames per block: header sample + 2 per code byte per channel
    val spb = 1 + (blockAlign - 4 * channels) / channels * 2
    val total = nBlocks.toLong * spb * channels
    if (total > MaxPixels) return unknown // allocation bomb
    val out = new Array[Int](total.toInt)
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    var blk = 0
    while (blk < nBlocks) {
      val bo = dataOff + blk * blockAlign
      var c = 0
      while (c < channels) {
        pred(c) = le16(b, bo + 4 * c).toShort.toInt
        idx(c) = b(bo + 4 * c + 2) & 0xff
        if (idx(c) > 88) return unknown
        out(blk * spb * channels + c) = pred(c)
        c += 1
      }
      val words = (blockAlign - 4 * channels) / 4
      var w = 0
      while (w < words) {
        val ch = w % channels
        val g = w / channels
        val base = bo + 4 * channels + 4 * w
        var k = 0
        while (k < 8) {
          val by = b(base + (k >> 1)) & 0xff
          val n = if ((k & 1) == 0) by & 0xf else by >>> 4
          val step = ImaStep(idx(ch))
          var diff = step >> 3
          if ((n & 1) != 0) diff += step >> 2
          if ((n & 2) != 0) diff += step >> 1
          if ((n & 4) != 0) diff += step
          var p = if ((n & 8) != 0) pred(ch) - diff else pred(ch) + diff
          if (p > 32767) p = 32767 else if (p < -32768) p = -32768
          pred(ch) = p
          var ni = idx(ch) + ImaIndex(n)
          if (ni < 0) ni = 0 else if (ni > 88) ni = 88
          idx(ch) = ni
          out((blk * spb + 1 + g * 8 + k) * channels + ch) = p
          k += 1
        }
        w += 1
      }
      blk += 1
    }
    // fact-chunk truncation: the true count must land in the final
    // block (anything shorter means dropped whole blocks — malformed)
    val frames =
      if (factFrames < 0) nBlocks * spb
      else if (factFrames <= nBlocks * spb &&
          factFrames > (nBlocks - 1) * spb) factFrames
      else return unknown
    val trimmed =
      if (frames == nBlocks * spb) out
      else java.util.Arrays.copyOf(out, frames * channels)
    InternalRow(UTF8String.fromString("wav-ima"), channels, rate, bits,
      frames, new GenericArrayData(trimmed))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object AudioDecodeExpr {
  /** ITU-T G.711 mu-law expansion (the public-domain g711.c reference:
    * complement, rebuild mantissa+bias, shift by the 3-bit segment,
    * un-bias with the sign). Pure integer — identical on any engine. */
  def ulaw2linear(code: Int): Int = {
    val u = ~code & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >>> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** IMA ADPCM step-size table (IMA Digital Audio Pocket Compendium,
    * 1992 — 89 entries, the canonical integer table). */
  val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** IMA ADPCM index-adjust table (per 4-bit code). */
  val ImaIndex: Array[Int] = Array(
    -1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** MS ADPCM standard coefficient pairs (the 7 the format defines). */
  val MsCoef1: Array[Int] = Array(256, 512, 0, 192, 240, 460, 392)
  val MsCoef2: Array[Int] = Array(0, -256, 0, 64, 0, -208, -232)

  /** MS ADPCM delta adaptation table (per 4-bit code). */
  val MsAdapt: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)

  /** ITU-T G.711 A-law expansion (g711.c: XOR 0x55, then the segment
    * piecewise linear map; sign bit SET means positive). */
  def alaw2linear(code: Int): Int = {
    val a = code ^ 0x55
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >>> 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else { t += 0x108; t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }
}
