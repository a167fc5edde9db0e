package graft.multimodal

/** Shared EBML primitives (the Matroska/WebM container encoding,
  * public RFC 8794) used by [[VideoFrameExpr]]'s MKV frame walk and
  * [[VideoMetaExpr]]'s MKV metadata path — one parser, no drift. */
private[multimodal] object Ebml {

  /** Variable-length integer at `i`: (value, byteLength). Element IDs
    * keep the length marker (the conventional ID value), sizes strip
    * it. (-1, -1) when malformed/truncated. */
  def vint(b: Array[Byte], i: Int, strip: Boolean): (Long, Int) = {
    if (i >= b.length) return (-1L, -1)
    val first = b(i) & 0xff
    if (first == 0) return (-1L, -1)
    val n = Integer.numberOfLeadingZeros(first) - 23 // 1..8
    if (i + n > b.length) return (-1L, -1)
    var v: Long = if (strip) (first & (0xff >>> n)).toLong else first.toLong
    var k = 1
    while (k < n) { v = (v << 8) | (b(i + k) & 0xff); k += 1 }
    (v, n)
  }

  /** Walk the elements of [from, to): handler(id, payloadStart,
    * payloadEnd). An all-ones (unknown) size runs to the parent end.
    * Malformed structure throws IllegalStateException — callers map
    * it to their unknown row. */
  def walk(b: Array[Byte], from: Int, to: Int)(
      h: (Long, Int, Int) => Unit): Unit = {
    var i = from
    while (i + 2 <= to) {
      val (id, idLen) = vint(b, i, strip = false)
      if (idLen < 0) throw new IllegalStateException("malformed ebml id")
      val (sz, szLen) = vint(b, i + idLen, strip = true)
      if (szLen < 0) throw new IllegalStateException("malformed ebml size")
      val start = i + idLen + szLen
      val end: Long =
        if (sz == (1L << (7 * szLen)) - 1) to.toLong else start.toLong + sz
      if (end > to || end < start)
        throw new IllegalStateException("ebml element overruns parent")
      h(id, start, end.toInt)
      i = end.toInt
    }
  }

  /** Big-endian unsigned integer element payload (1-8 bytes). */
  def uint(b: Array[Byte], s: Int, e: Int): Long = {
    if (e - s > 8 || e <= s)
      throw new IllegalStateException("ebml uint size")
    var v = 0L
    var k = s
    while (k < e) { v = (v << 8) | (b(k) & 0xff); k += 1 }
    v
  }

  /** EBML FLOAT element payload: 4 or 8 bytes, IEEE big-endian. */
  def float(b: Array[Byte], s: Int, e: Int): Double = {
    def be32(i: Int): Long = ((b(i) & 0xffL) << 24) |
      ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) |
      (b(i + 3) & 0xffL)
    (e - s) match {
      case 4 => java.lang.Float.intBitsToFloat(be32(s).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(
        (be32(s) << 32) | be32(s + 4))
      case _ => throw new IllegalStateException("ebml float size")
    }
  }
}
