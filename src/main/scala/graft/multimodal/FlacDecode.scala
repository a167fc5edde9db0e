package graft.multimodal

/** Native FLAC decoder (the public FLAC format, RFC 9639) — the
  * dominant LOSSLESS audio format in real corpora, and like the rest
  * of this package's codecs it is bit-deterministic: rice-coded
  * residuals plus all-integer fixed/LPC predictors, no floats
  * anywhere, so decoded samples are oracle-exact on any engine.
  *
  * Supported: the full subframe surface (CONSTANT / VERBATIM / FIXED
  * orders 0-4 / LPC any order with quantized-coefficient shift),
  * rice and rice2 residual methods with partitioning and escape
  * (raw-bits) partitions, wasted-bits shifts, all four channel
  * assignments (independent, left/side, right/side, mid/side with the
  * side channel's +1 bit), 8/12/16/20/24/32-bit sample sizes, and
  * multi-frame streams. Integrity: the frame-header CRC-8 (poly 0x07)
  * and whole-frame CRC-16 (poly 0x8005) are VERIFIED — a corrupted
  * frame maps to None (the unknown row), never a throw. Reserved or
  * invalid codes (blocksize 0000, rate 1111, sample-size 011,
  * subframe types 2-7/13-31) map to None per the spec's "must be
  * treated as invalid" language.
  *
  * Reference analogue: the multimodal decode stage of table-API
  * preprocessing; the bit layout follows the public specification.
  * Validation: hand-derived vectors (rice arithmetic and fixed
  * predictors computed by hand from the spec), an independent
  * test-side encoder round-trip across subframe types and channel
  * modes, and the q_audio_flac DuckDB oracle.
  */
object FlacDecode {

  final case class Result(channels: Int, sampleRate: Int, bits: Int,
      frames: Int, samples: Array[Int])

  /** MSB-first bit reader over the payload. */
  private final class Bits(b: Array[Byte]) {
    var pos = 0L // bit position
    val end: Long = b.length.toLong * 8
    def bytePos: Int = (pos >> 3).toInt
    def aligned: Boolean = (pos & 7) == 0
    def remaining: Long = end - pos
    /** n <= 32 bits unsigned (as Long to hold 32). */
    def u(n: Int): Long = {
      if (pos + n > end) throw Eof
      var v = 0L
      var k = n
      while (k > 0) {
        val p = pos
        val avail = 8 - (p & 7).toInt
        val take = math.min(avail, k)
        val byte = b((p >> 3).toInt) & 0xff
        val bits = (byte >> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | bits
        pos += take
        k -= take
      }
      v
    }
    def s(n: Int): Int = { // signed two's complement
      val v = u(n)
      (v << (64 - n) >> (64 - n)).toInt
    }
    def sLong(n: Int): Long = { val v = u(n); v << (64 - n) >> (64 - n) }
    /** unary: count 0 bits until the terminating 1. */
    def unary(): Int = {
      var c = 0
      while (u(1) == 0L) {
        c += 1
        if (c > (1 << 24)) throw Eof // runaway guard
      }
      c
    }
  }
  private object Eof extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= b(i) & 0xff
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) (c << 1) ^ 0x07 else c << 1; k += 1 }
      c &= 0xff
      i += 1
    }
    c
  }

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        c = if ((c & 0x8000) != 0) (c << 1) ^ 0x8005 else c << 1
        k += 1
      }
      c &= 0xffff
      i += 1
    }
    c
  }

  /** Decode a complete FLAC stream; None on any malformation. */
  def decode(b: Array[Byte], maxSamples: Long): Option[Result] = {
    try decodeImpl(b, maxSamples)
    catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => None }
  }

  private def decodeImpl(b: Array[Byte], maxSamples: Long): Option[Result] = {
    if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
        b(3) != 'C') return None
    // ---- metadata blocks; STREAMINFO is mandatory and first
    var i = 4
    var last = false
    var siRate = -1; var siCh = -1; var siBits = -1; var siTotal = -1L
    var sawStreamInfo = false
    while (!last) {
      if (i + 4 > b.length) return None
      val hdr = b(i) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) |
        (b(i + 3) & 0xff)
      if (i + 4 + len > b.length) return None
      if (typ == 0) { // STREAMINFO (shared field unpack: AudioHeaders)
        if (len < 34 || sawStreamInfo) return None
        sawStreamInfo = true
        val si = AudioHeaders.flacStreamInfo(b, i + 4)
        siRate = si.rate; siCh = si.channels
        siBits = si.bits; siTotal = si.total
      } else if (typ == 127) return None // invalid block type
      i += 4 + len
    }
    if (!sawStreamInfo || siRate <= 0 || siCh <= 0) return None
    val expected =
      if (siTotal > 0) siTotal * siCh
      else -1L
    if (expected > maxSamples) return None
    // ---- frames
    val bits = new Bits(b)
    bits.pos = i.toLong * 8
    var outBuf = new Array[Int](
      if (expected > 0) expected.toInt else math.min(maxSamples, 1 << 16).toInt)
    var got = 0 // interleaved samples written
    while (bits.remaining >= 16) {
      val frameStart = bits.bytePos
      if (!bits.aligned) return None
      if (bits.u(14) != 0x3ffe) return None // sync
      if (bits.u(1) != 0) return None // reserved
      bits.u(1) // blocking strategy (either is fine)
      val bsCode = bits.u(4).toInt
      val srCode = bits.u(4).toInt
      val chAsgn = bits.u(4).toInt
      val ssCode = bits.u(3).toInt
      if (bits.u(1) != 0) return None // reserved
      // UTF-8-coded frame/sample number (1-7 bytes) — skip, validate shape
      val first = bits.u(8).toInt
      if (first >= 0x80) {
        var n = 0
        var m = first
        while ((m & 0x40) != 0) { n += 1; m <<= 1 }
        if (n < 1 || n > 6) return None
        var k = 0
        while (k < n) { if ((bits.u(8) & 0xc0) != 0x80) return None; k += 1 }
      }
      val blockSize = bsCode match {
        case 0 => return None // reserved
        case 1 => 192
        case 6 => bits.u(8).toInt + 1
        case 7 => bits.u(16).toInt + 1
        case n if n >= 2 && n <= 5 => 576 << (n - 2)
        case n => 256 << (n - 8)
      }
      val rate = srCode match {
        case 0 => siRate
        case 1 => 88200
        case 2 => 176400
        case 3 => 192000
        case 4 => 8000
        case 5 => 16000
        case 6 => 22050
        case 7 => 24000
        case 8 => 32000
        case 9 => 44100
        case 10 => 48000
        case 11 => 96000
        case 12 => bits.u(8).toInt * 1000
        case 13 => bits.u(16).toInt
        case 14 => bits.u(16).toInt * 10
        case _ => return None // invalid
      }
      val channels = if (chAsgn < 8) chAsgn + 1
        else if (chAsgn <= 10) 2
        else return None
      val bps = ssCode match {
        case 0 => siBits
        case 1 => 8
        case 2 => 12
        case 3 => return None // reserved
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
      }
      if (channels != siCh || rate != siRate || bps != siBits) return None
      val crcHdrEnd = bits.bytePos
      if (!bits.aligned) return None
      val hdrCrc = bits.u(8).toInt
      if (crc8(b, frameStart, crcHdrEnd) != hdrCrc) return None
      // ---- subframes
      val chans = new Array[Array[Long]](channels)
      var c = 0
      while (c < channels) {
        // side channel carries one extra bit
        val extra = chAsgn match {
          case 8 => if (c == 1) 1 else 0 // left/side
          case 9 => if (c == 0) 1 else 0 // side/right
          case 10 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        }
        chans(c) = subframe(bits, blockSize, bps + extra) match {
          case null => return None
          case s => s
        }
        c += 1
      }
      // byte-align, then frame CRC-16
      if (!bits.aligned) bits.u(8 - (bits.pos & 7).toInt)
      val crcEnd = bits.bytePos
      val frameCrc = bits.u(16).toInt
      if (crc16(b, frameStart, crcEnd) != frameCrc) return None
      // ---- stereo decorrelation
      chAsgn match {
        case 8 => // left/side: right = left - side
          var k = 0
          while (k < blockSize) { chans(1)(k) = chans(0)(k) - chans(1)(k); k += 1 }
        case 9 => // side/right: left = side + right
          var k = 0
          while (k < blockSize) { chans(0)(k) = chans(0)(k) + chans(1)(k); k += 1 }
        case 10 => // mid/side
          var k = 0
          while (k < blockSize) {
            val side = chans(1)(k)
            var mid = chans(0)(k) << 1
            mid |= side & 1L
            chans(0)(k) = (mid + side) >> 1
            chans(1)(k) = (mid - side) >> 1
            k += 1
          }
        case _ => ()
      }
      // ---- interleave
      val need = got.toLong + blockSize.toLong * channels
      if (need > maxSamples) return None
      if (need > outBuf.length) {
        val grow = math.max(need, outBuf.length.toLong * 2)
        if (grow > maxSamples) {
          outBuf = java.util.Arrays.copyOf(outBuf, maxSamples.toInt)
        } else outBuf = java.util.Arrays.copyOf(outBuf, grow.toInt)
      }
      var k = 0
      while (k < blockSize) {
        c = 0
        while (c < channels) {
          outBuf(got) = chans(c)(k).toInt // final samples are <= 32-bit
          got += 1; c += 1
        }
        k += 1
      }
      if (expected >= 0 && got >= expected) {
        // trailing bytes after the declared total are tolerated (padding)
        return Some(Result(siCh, siRate, siBits, (expected / siCh).toInt,
          java.util.Arrays.copyOf(outBuf, expected.toInt)))
      }
    }
    if (expected >= 0 && got != expected) return None
    Some(Result(siCh, siRate, siBits, (got / siCh).toInt,
      java.util.Arrays.copyOf(outBuf, got)))
  }

  /** One subframe → blockSize samples, or null. */
  private def subframe(bits: Bits, blockSize: Int, bps: Int): Array[Long] = {
    if (bits.u(1) != 0) return null // pad bit
    val typ = bits.u(6).toInt
    val wasted =
      if (bits.u(1) == 1L) bits.unary() + 1
      else 0
    val eff = bps - wasted
    if (eff <= 0 || eff > 33) return null
    val out = new Array[Long](blockSize)
    if (typ == 0) { // CONSTANT
      val v = bits.sLong(eff)
      java.util.Arrays.fill(out, v)
    } else if (typ == 1) { // VERBATIM
      var k = 0
      while (k < blockSize) { out(k) = bits.sLong(eff); k += 1 }
    } else if (typ >= 8 && typ <= 12) { // FIXED order 0-4
      val order = typ - 8
      if (order > blockSize) return null
      var k = 0
      while (k < order) { out(k) = bits.sLong(eff); k += 1 }
      if (!residual(bits, blockSize, order, out)) return null
      val coefs = FixedCoefs(order)
      k = order
      while (k < blockSize) {
        var acc = out(k) // residual
        var j = 0
        while (j < order) { acc += coefs(j).toLong * out(k - 1 - j); j += 1 }
        out(k) = acc
        k += 1
      }
    } else if (typ >= 32) { // LPC order typ-31
      val order = typ - 31
      if (order > blockSize) return null
      var k = 0
      while (k < order) { out(k) = bits.sLong(eff); k += 1 }
      val precision = bits.u(4).toInt + 1
      if (precision == 16) return null // 1111 invalid
      val shift = bits.s(5)
      if (shift < 0) return null // negative shifts are spec-forbidden
      val coefs = new Array[Int](order)
      k = 0
      while (k < order) { coefs(k) = bits.s(precision); k += 1 }
      if (!residual(bits, blockSize, order, out)) return null
      k = order
      while (k < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * out(k - 1 - j); j += 1 }
        out(k) = out(k) + (acc >> shift)
        k += 1
      }
    } else return null // reserved types
    if (wasted > 0) {
      var k = 0
      while (k < blockSize) { out(k) = out(k) << wasted; k += 1 }
    }
    out
  }

  /** Rice-coded residual into out(order until blockSize); zigzag. */
  private def residual(bits: Bits, blockSize: Int, order: Int,
      out: Array[Long]): Boolean = {
    val method = bits.u(2).toInt
    if (method > 1) return false
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val partOrder = bits.u(4).toInt
    val parts = 1 << partOrder
    if (blockSize % parts != 0) return false
    val perPart = blockSize >> partOrder
    if (perPart <= order) return false // RFC: bs >> order must exceed pred
    var p = 0
    var k = order
    while (p < parts) {
      val count = if (p == 0) perPart - order else perPart
      if (count < 0) return false
      val param = bits.u(pBits).toInt
      if (param == escape) {
        val raw = bits.u(5).toInt
        var n = 0
        while (n < count) {
          out(k) = if (raw == 0) 0L else bits.sLong(raw)
          k += 1; n += 1
        }
      } else {
        var n = 0
        while (n < count) {
          val q = bits.unary()
          val low = if (param == 0) 0L else bits.u(param)
          val v = (q.toLong << param) | low
          out(k) = (v >>> 1) ^ -(v & 1L) // zigzag
          k += 1; n += 1
        }
      }
      p += 1
    }
    true
  }
}
