package graft.multimodal

/** Shared GIF byte-level codec pieces — the variable-width LZW decoder
  * and color-table reader used by [[ImageDecodeExpr]] (first frame) and
  * [[GifFramesExpr]] (animation frames). */
private[multimodal] object GifCodec {

  private[multimodal] def readColorTable(b: Array[Byte], off: Int, n: Int): Array[Int] = {
    val t = new Array[Int](n)
    var i = 0
    while (i < n) {
      t(i) = 0xff000000 | ((b(off + i * 3) & 0xff) << 16) |
        ((b(off + i * 3 + 1) & 0xff) << 8) | (b(off + i * 3 + 2) & 0xff)
      i += 1
    }
    t
  }

  /** GIF LZW: little-endian bit packing, variable code width starting
    * at minCode+1, clear = 2^minCode, end = clear+1, dictionary capped
    * at 4096. Returns exactly `expected` indices or null. */
  private[multimodal] def lzw(data: Array[Byte], minCode: Int, expected: Int)
      : Array[Byte] = {
    if (minCode < 2 || minCode > 11) return null
    val clear = 1 << minCode
    val end = clear + 1
    // dictionary as (prefix link, last byte): entry k < clear is the
    // literal k; suffix chains unwind into `stack`
    val prefix = new Array[Int](4096)
    val last = new Array[Byte](4096)
    var dictSize = end + 1
    var width = minCode + 1
    val outB = new Array[Byte](expected)
    var got = 0
    val stack = new Array[Byte](4096)
    var bitPos = 0L
    val nBits = data.length.toLong * 8
    var prev = -1
    def read(): Int = {
      if (bitPos + width > nBits) return -1
      var v = 0; var k = 0
      while (k < width) {
        val p = bitPos + k
        if ((data((p >> 3).toInt) >> (p & 7).toInt & 1) != 0) v |= 1 << k
        k += 1
      }
      bitPos += width
      v
    }
    def emit(code: Int): Boolean = {
      var sp = 0
      var c = code
      while (c >= clear) { // unwind the suffix chain
        if (sp >= stack.length || c >= dictSize) return false
        stack(sp) = last(c); sp += 1; c = prefix(c)
      }
      if (got + sp + 1 > expected) return false
      outB(got) = c.toByte; got += 1
      while (sp > 0) { sp -= 1; outB(got) = stack(sp); got += 1 }
      true
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    while (got < expected) {
      val code = read()
      if (code < 0 || code == end) return if (got == expected) outB else null
      if (code == clear) {
        dictSize = end + 1; width = minCode + 1; prev = -1
      } else if (prev < 0) {
        if (code >= clear) return null // first code must be a literal
        if (!emit(code)) return null
        prev = code
      } else {
        val valid = code < dictSize
        if (!valid && code != dictSize) return null
        val emitCode = if (valid) code else prev
        if (!emit(emitCode)) return null
        if (!valid) { // KwKwK case: emit first byte of prev again
          if (got >= expected) return null
          outB(got) = firstByte(prev); got += 1
        }
        if (dictSize < 4096) {
          prefix(dictSize) = prev
          // the new entry's last byte is the first byte of THIS code's
          // expansion (for the KwKwK case, that of prev)
          last(dictSize) = if (valid) firstByte(code) else firstByte(prev)
          dictSize += 1
          if (dictSize < 4096 && (dictSize & (dictSize - 1)) == 0 &&
              dictSize > clear) width += 1
        }
        prev = if (valid) code else dictSize - 1
      }
    }
    outB
  }

}
