package graft.multimodal

/** ISO/IEC 14496-12 box-walk primitives for the BMFF-backed byte
  * parsers ([[ImageMetaExpr]]'s AVIF/HEIC route; the MP4 walks in
  * [[VideoMetaExpr]] / [[VideoFrameExpr]] carry their own equivalent
  * walkers from earlier rounds). Big-endian reads plus the standard
  * box framing: 32-bit size, 64-bit largesize when size == 1, and
  * size == 0 meaning to-the-end-of-the-enclosing-box. */
private[multimodal] object Bmff {

  def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  /** Stream (type, bodyStart, end) of each box in [from, to) to `f`;
    * returns false on a malformed size (body extending past `to`,
    * size below the header length). */
  def boxes(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Boolean = {
    var i = from
    while (i + 8 <= to) {
      val size32 = be32(b, i)
      val typ = new String(b, i + 4, 4, "ISO-8859-1")
      val (bodyStart, end) =
        if (size32 == 1L) {
          if (i + 16 > to) return false
          val sz = be64(b, i + 8)
          if (sz < 16 || i + sz > to) return false
          (i + 16, i + sz.toInt)
        } else if (size32 == 0L) (i + 8, to)
        else {
          if (size32 < 8 || i + size32 > to) return false
          (i + 8, i + size32.toInt)
        }
      f(typ, bodyStart, end)
      i = end
    }
    true
  }
}
