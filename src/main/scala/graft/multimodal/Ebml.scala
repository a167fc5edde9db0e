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

  /** Matroska Level-1 (Segment-child) element IDs — the resync set an
    * unknown-size Cluster terminates on. */
  private val Level1Ids = Array(0x1f43b675L /*Cluster*/ ,
    0x114d9b74L /*SeekHead*/ , 0x1549a966L /*Info*/ ,
    0x1654ae6bL /*Tracks*/ , 0x1c53bb6bL /*Cues*/ ,
    0x1941a469L /*Attachments*/ , 0x1043a770L /*Chapters*/ ,
    0x1254c367L /*Tags*/ )

  /** Walk the elements of [from, to): handler(id, payloadStart,
    * payloadEnd). An all-ones (unknown) size on the Segment runs to
    * the parent end; on a Cluster it runs to the NEXT Level-1 element
    * (RFC 8794 §6.2 / the Matroska rule — streaming muxers emit
    * unknown-size Clusters back to back, so parent-end would swallow
    * every following sibling); on anything else it runs to the parent
    * end (vanishingly rare in real files). Malformed structure throws
    * IllegalStateException — callers map it to their unknown row. */
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
        if (sz == (1L << (7 * szLen)) - 1) {
          if (id == 0x1f43b675L) nextLevel1(b, start, to).toLong
          else to.toLong
        } else start.toLong + sz
      if (end > to || end < start)
        throw new IllegalStateException("ebml element overruns parent")
      h(id, start, end.toInt)
      i = end.toInt
    }
  }

  /** First offset in [from, to) where a Level-1 ID begins (the
    * demuxer resync scan), or `to` when none follows. */
  private def nextLevel1(b: Array[Byte], from: Int, to: Int): Int = {
    var i = from
    while (i + 4 <= to) {
      val v = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      var k = 0
      while (k < Level1Ids.length) {
        if (v == Level1Ids(k)) return i
        k += 1
      }
      i += 1
    }
    to
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
