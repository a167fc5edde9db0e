package graft.multimodal

/** Shared audio container-header parsing — ONE implementation each for
  * the Sun/NeXT .au header, the AIFF COMM/SSND walk (incl. the 80-bit
  * extended sample rate decoded with exact integer arithmetic) and the
  * FLAC STREAMINFO packed fields, used by both the decode expressions
  * and the metadata expression so the two surfaces cannot drift in
  * validation (they briefly did — see the round-11 review notes). All
  * parsers return None on malformation, never throw. */
private[multimodal] object AudioHeaders {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** .au header: validated offsets/bounds; bytesPer covers the
    * fixed-width encodings (G.711 = 1 byte, PCM 2-5). */
  final case class AuHeader(dataOff: Int, dataLen: Int, enc: Int,
      rate: Int, channels: Int, bytesPer: Int, bits: Int)

  def parseAu(b: Array[Byte]): Option[AuHeader] = {
    if (b.length < 24) return None
    val dataOff = be32(b, 4)
    val declared = be32(b, 8)
    val enc = be32(b, 12)
    val rate = be32(b, 16)
    val channels = be32(b, 20)
    if (dataOff < 24 || dataOff > b.length || rate <= 0 || channels <= 0)
      return None
    val (bytesPer, bits) = enc match {
      case 1 | 27 => (1, 8)
      case 2 => (1, 8)
      case 3 => (2, 16)
      case 4 => (3, 24)
      case 5 => (4, 32)
      case _ => return None // floats / G.72x stay unsupported
    }
    val dataLen =
      if (declared == -1) b.length - dataOff // ~0: stream of unknown size
      else declared
    if (dataLen < 0 || dataOff + dataLen.toLong > b.length) return None
    Some(AuHeader(dataOff, dataLen, enc, rate, channels, bytesPer, bits))
  }

  /** AIFF COMM fields + SSND location (dataOff/dataAvail are -1 when
    * no SSND chunk exists — metadata callers don't need one). */
  final case class AiffInfo(channels: Int, frames: Int, bits: Int,
      rate: Int, dataOff: Int, dataAvail: Int)

  def parseAiff(b: Array[Byte]): Option[AiffInfo] = {
    var i = 12
    var channels = -1; var frames = -1; var bits = -1; var rate = -1
    var dataOff = -1; var dataAvail = -1
    var sawComm = false
    while (i + 8 <= b.length && !(sawComm && dataOff >= 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = be32(b, i + 4)
      if (len < 0 || i + 8 + len > b.length) return None
      id match {
        case "COMM" =>
          if (len < 18) return None
          sawComm = true
          channels = be16(b, i + 8)
          frames = be32(b, i + 10)
          bits = be16(b, i + 14)
          // 80-bit extended float at i+16: 1 sign + 15 exp + 64 mantissa
          val se = be16(b, i + 16)
          if ((se & 0x8000) != 0) return None // negative rate
          var mant = 0L
          var k = 0
          while (k < 8) { mant = (mant << 8) | (b(i + 18 + k) & 0xffL); k += 1 }
          val shift = 16383 + 63 - se
          if (se == 0 && mant == 0L) return None // rate 0
          if (shift < 0 || shift > 63 ||
              (shift > 0 && (mant & ((1L << shift) - 1)) != 0L))
            return None // non-integer or out-of-range rate
          val r = mant >>> shift
          if (r <= 0 || r > Int.MaxValue) return None
          rate = r.toInt
        case "SSND" =>
          if (len < 8) return None
          val off = be32(b, i + 8) // alignment offset into the chunk
          if (off < 0 || off > len - 8) return None
          dataOff = i + 16 + off
          dataAvail = len - 8 - off
        case _ => () // MARK / INST / annotations ... skipped
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    // frames is a u32 field: a sign-flipped read is malformed
    if (!sawComm || channels <= 0 || frames < 0 || rate <= 0) return None
    Some(AiffInfo(channels, frames, bits, rate, dataOff, dataAvail))
  }

  /** FLAC STREAMINFO packed fields (rate 20 / channels 3 / bits 5 /
    * total 36) starting at payload offset `o` (the 34-byte block). */
  final case class StreamInfo(rate: Int, channels: Int, bits: Int,
      total: Long)

  def flacStreamInfo(b: Array[Byte], o: Int): StreamInfo = {
    val packed =
      (0 until 8).foldLeft(0L)((a, k) => (a << 8) | (b(o + 10 + k) & 0xffL))
    StreamInfo((packed >>> 44).toInt, ((packed >>> 41) & 0x7).toInt + 1,
      ((packed >>> 36) & 0x1f).toInt + 1, packed & 0xfffffffffL)
  }
}
