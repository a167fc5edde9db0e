package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** audio_meta(payload): REAL audio metadata from raw bytes without any
  * sample decode — the audio analogue of [[ImageMetaExpr]] /
  * [[VideoMetaExpr]]: corpus inventory (duration histograms, bitrate /
  * channel filters, decode-cost estimation) runs as a map-side
  * projection long before any PCM or psychoacoustic decode.
  *
  * Formats (public layouts):
  *  - RIFF/WAVE: fmt chunk (any codec id) + data length →
  *    channels/rate/duration; format "wav";
  *  - MPEG-1/2/2.5 Layer III (MP3): optional ID3v2 skip (syncsafe
  *    length), then EVERY frame header is walked — version/bitrate/
  *    samplerate per frame, frame length 144*bitrate/samplerate(+pad)
  *    (72* for the halved-rate MPEG-2/2.5 side) — so VBR duration is
  *    EXACT (sum of per-frame samples/rate), not a first-frame
  *    estimate; reported bitrate_kbps is the first frame's;
  *  - FLAC: STREAMINFO (rate/channels/total samples → exact duration);
  *  - Sun/NeXT .au and AIFF COMM: header fields, integer-exact 80-bit
  *    extended rate (AIFF), PCM duration from the data/frame counts;
  *  - Ogg (Vorbis + Opus): identification header on the first page
  *    (channels/rate/Opus pre-skip), exact duration from the final
  *    EOS page's granule position (Vorbis: PCM frames at the stream
  *    rate; Opus: 48 kHz ticks minus pre-skip per RFC 7845).
  *
  * Output: struct<format, channels, sample_rate, duration_ms,
  * bitrate_kbps, frames>. Malformed / truncated / other formats yield
  * ("unknown", -1, -1, -1, -1, -1) — the never-throw corpus policy.
  * Single-scan, zero shuffle. */
case class AudioMetaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("bitrate_kbps", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false)))
  override def prettyName: String = "audio_meta"

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private val unknown = InternalRow(
    UTF8String.fromString("unknown"), -1, -1, -1L, -1, -1)

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
          b(11) == 'E') wav(b)
      else if (b.length >= 42 && b(0) == 'f' && b(1) == 'L' &&
          b(2) == 'a' && b(3) == 'C') flacMeta(b)
      else if (b.length >= 24 && b(0) == '.' && b(1) == 's' &&
          b(2) == 'n' && b(3) == 'd') auMeta(b)
      else if (b.length >= 12 && b(0) == 'F' && b(1) == 'O' &&
          b(2) == 'R' && b(3) == 'M' && b(8) == 'A' && b(9) == 'I' &&
          b(10) == 'F' && b(11) == 'F') aiffMeta(b)
      else if (b.length >= 28 && b(0) == 'O' && b(1) == 'g' &&
          b(2) == 'g' && b(3) == 'S') oggMeta(b)
      else mp3(b)
    } catch { case _: Exception => unknown }
  }

  private def wav(b: Array[Byte]): InternalRow = {
    var i = 12
    var channels = -1; var rate = -1; var bits = -1
    var byteRate = -1; var dataLen = -1
    while (i + 8 <= b.length && (dataLen < 0 || channels < 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = le32(b, i + 4)
      if (len < 0 || i + 8 + len > b.length) return unknown
      id match {
        case "fmt " =>
          if (len < 16) return unknown
          channels = le16(b, i + 10)
          rate = le32(b, i + 12)
          byteRate = le32(b, i + 16)
          bits = le16(b, i + 22)
        case "data" => dataLen = len
        case _ => ()
      }
      i += 8 + len + (len & 1)
    }
    if (channels <= 0 || rate <= 0 || byteRate <= 0 || dataLen < 0)
      return unknown
    val durationMs = dataLen.toLong * 1000L / byteRate
    InternalRow(UTF8String.fromString("wav"), channels, rate, durationMs,
      byteRate * 8 / 1000, -1)
  }

  // MPEG Layer III bitrate tables (kbps), index 1-14
  private val BrV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
    192, 224, 256, 320)
  private val BrV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 144, 160)
  private val SrV1 = Array(44100, 48000, 32000)

  /** FLAC STREAMINFO (shared field unpack [[AudioHeaders.flacStreamInfo]]):
    * rate/channels/total-samples → exact duration. bitrate/frames are
    * not header facts for FLAC → -1. */
  private def flacMeta(b: Array[Byte]): InternalRow = {
    val hdr = b(4) & 0x7f
    if (hdr != 0) return unknown // STREAMINFO must be first
    val len = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    if (len < 34 || 8 + len > b.length) return unknown
    val si = AudioHeaders.flacStreamInfo(b, 8)
    if (si.rate <= 0) return unknown
    val durMs = if (si.total == 0) -1L else si.total * 1000L / si.rate
    InternalRow(UTF8String.fromString("flac"), si.channels, si.rate,
      durMs, -1, -1)
  }

  /** Sun/NeXT .au header (shared [[AudioHeaders.parseAu]]): duration
    * from the data size for the fixed-width encodings. */
  private def auMeta(b: Array[Byte]): InternalRow =
    AudioHeaders.parseAu(b) match {
      case None => unknown
      case Some(h) =>
        // decode parity: audio_decode rejects a ragged trailing frame
        // (sample count not divisible by channels) — so does meta
        if ((h.dataLen / h.bytesPer) % h.channels != 0) return unknown
        val frames = h.dataLen / h.bytesPer / h.channels
        val kbps = h.rate.toLong * h.channels * h.bytesPer * 8 / 1000
        if (kbps > Int.MaxValue) return unknown
        InternalRow(UTF8String.fromString("au"), h.channels, h.rate,
          frames.toLong * 1000L / h.rate, kbps.toInt, -1)
    }

  /** AIFF COMM (shared [[AudioHeaders.parseAiff]]): channels/frames/
    * rate — no SSND required for metadata. */
  private def aiffMeta(b: Array[Byte]): InternalRow =
    AudioHeaders.parseAiff(b) match {
      case None => unknown
      case Some(h) =>
        val kbps = h.rate.toLong * h.channels * h.bits / 1000L
        if (kbps > Int.MaxValue) return unknown
        InternalRow(UTF8String.fromString("aiff"), h.channels, h.rate,
          h.frames.toLong * 1000L / h.rate, kbps.toInt, h.frames)
    }

  private def le64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xffL); k -= 1 }
    v
  }

  /** Ogg page walk (the public Ogg framing spec): the first page's
    * payload carries the codec identification header — Vorbis
    * ("vorbis": channels u8, rate u32 LE) or Opus ("OpusHead":
    * channels u8, pre-skip u16 LE; output clock fixed at 48 kHz per
    * RFC 7845) — and the final EOS page's granule position gives the
    * exact stream duration. Multiplexed (multi-serial) streams and
    * other codecs map to unknown. */
  private def oggMeta(b: Array[Byte]): InternalRow = {
    var i = 0
    var serial = 0
    var ch = -1; var rate = -1; var preSkip = 0; var codec: String = null
    var lastGranule = -1L
    var sawEos = false
    var first = true
    while (i + 27 <= b.length) {
      if (!(b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' &&
          b(i + 3) == 'S') || b(i + 4) != 0) return unknown
      val flags = b(i + 5) & 0xff
      val granule = le64(b, i + 6)
      val pageSerial = le32(b, i + 14)
      val nSegs = b(i + 26) & 0xff
      if (i + 27 + nSegs > b.length) return unknown
      var payloadLen = 0
      var k = 0
      while (k < nSegs) { payloadLen += b(i + 27 + k) & 0xff; k += 1 }
      val payloadOff = i + 27 + nSegs
      if (payloadOff + payloadLen > b.length) return unknown
      if (first) {
        serial = pageSerial
        if ((flags & 0x02) == 0) return unknown // first page must be BOS
        // identification header at the payload start
        if (payloadLen >= 30 && b(payloadOff) == 1 &&
            new String(b, payloadOff + 1, 6, "US-ASCII") == "vorbis") {
          codec = "ogg-vorbis"
          ch = b(payloadOff + 11) & 0xff
          rate = le32(b, payloadOff + 12)
        } else if (payloadLen >= 19 &&
            new String(b, payloadOff, 8, "US-ASCII") == "OpusHead") {
          codec = "ogg-opus"
          ch = b(payloadOff + 9) & 0xff
          preSkip = le16(b, payloadOff + 10)
          rate = 48000 // RFC 7845: granule clock is always 48 kHz
        } else return unknown
        first = false
      } else if (pageSerial != serial) {
        return unknown // multiplexed streams unsupported
      }
      if (granule != -1L) lastGranule = granule
      if ((flags & 0x04) != 0) { sawEos = true }
      i = payloadOff + payloadLen
      if (sawEos) {
        if (ch <= 0 || rate <= 0 || lastGranule < 0) return unknown
        val samples = codec match {
          case "ogg-opus" => math.max(0L, lastGranule - preSkip)
          case _ => lastGranule
        }
        // untrusted 64-bit granule: cap so samples * 1000 cannot wrap
        // (the au/aiff paths guard their overflows the same way)
        if (samples > Long.MaxValue / 1000) return unknown
        return InternalRow(UTF8String.fromString(codec), ch, rate,
          samples * 1000L / rate, -1, -1)
      }
    }
    unknown // no EOS page: truncated stream
  }

  private def mp3(b: Array[Byte]): InternalRow = {
    var i = 0
    // ID3v2: "ID3" ver(2) flags(1) syncsafe size(4)
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      i = 10 + size
    }
    var frames = 0
    var channels = -1; var rate0 = -1; var firstBr = -1
    var totalSamples = 0L
    // exact duration: Σ samples / rate — the stream must hold ONE
    // sample rate (VBR bitrate switches are normal; a rate switch is
    // pathological and degrades to unknown rather than a wrong number)
    def done(): InternalRow =
      InternalRow(UTF8String.fromString("mp3"), channels, rate0,
        totalSamples * 1000L / rate0, firstBr, frames)
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) {
        // past the last frame: end of payload or an ID3v1 "TAG" trailer
        val tag = i + 3 <= b.length && b(i) == 'T' && b(i + 1) == 'A' &&
          b(i + 2) == 'G'
        return if (frames > 0 && tag) done() else unknown
      }
      val version = (b(i + 1) >> 3) & 3 // 0=2.5, 2=V2, 3=V1
      val layer = (b(i + 1) >> 1) & 3 // 1 = Layer III
      if (version == 1 || layer != 1) return unknown
      val brIdx = (b(i + 2) >> 4) & 15
      val srIdx = (b(i + 2) >> 2) & 3
      val padding = (b(i + 2) >> 1) & 1
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return unknown
      val v1 = version == 3
      val bitrate = (if (v1) BrV1 else BrV2)(brIdx) * 1000
      val rate = SrV1(srIdx) / (version match {
        case 3 => 1
        case 2 => 2
        case _ => 4
      })
      val mode = (b(i + 3) >> 6) & 3
      if (frames == 0) {
        channels = if (mode == 3) 1 else 2
        rate0 = rate
        firstBr = bitrate / 1000
      } else if (rate != rate0) return unknown
      val samplesPerFrame = if (v1) 1152 else 576
      val frameLen = samplesPerFrame / 8 * bitrate / rate + padding
      if (frameLen <= 4) return unknown
      totalSamples += samplesPerFrame
      frames += 1
      i += frameLen
    }
    if (frames == 0 || i != b.length) unknown else done()
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
