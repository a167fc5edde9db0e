package graft.multimodal

/** Brotli (RFC 7932) decoder — the `Content-Encoding: br` route of the
  * crawl-ingestion chain. Brotli is widespread on the modern web, so
  * without this route every br-encoded fetch in a WARC dump is
  * unreachable end-to-end; neither the JDK nor the Spark-shipped codec
  * jars carry a decoder, hence this original implementation of the
  * public RFC.
  *
  * Pieces, all from the spec: LSB-first bit stream; WBITS header
  * (§9.1); meta-block structure with metadata-skip and uncompressed
  * blocks (§9.2); simple and complex prefix codes incl. the fixed
  * code-length code and the 16/17 repeat accumulation (§3.4-3.5);
  * block switching over three category ring buffers (§6); context
  * modeling for literals (§7.1, via the 2,048-byte lookup table the
  * spec defines, shipped as a resource dumped from the system
  * libbrotlicommon by tools/make_brotli_fixtures.py) and distances
  * (§7.3); context maps with RLE + inverse-MTF (§7.3); the 704-symbol
  * insert&copy code (§5); the distance ring buffer and postfix/direct
  * distance code (§4); and the 122,784-byte static dictionary
  * (Appendix A, same provenance) with the 121 word transforms
  * (Appendix B) including the spec's multibyte-aware uppercasing.
  *
  * Corpus policy matches [[DecompressExpr]]: malformed input or output
  * beyond the caller's cap returns null, never throws. Decoded output
  * is bounded INCREMENTALLY — the bomb guard trips while writing, not
  * from any declared size. Like raw deflate, brotli has no magic
  * bytes, so it is reachable only via the explicit codec argument.
  *
  * Reference analogue: the compress-decode table option of the
  * filesystem connector formats (see DecompressExpr's header).
  * Throughput shape: single pass over the input, output-linear; the
  * canonical prefix decode is the count/first-code walk (≤15 steps
  * per symbol).
  */
object BrotliDecode {

  /** Decode a complete brotli stream; null on malformed input or when
    * the decoded size would exceed maxBytes. Trailing bytes after the
    * final meta-block are tolerated (corpus members carry padding). */
  def decode(input: Array[Byte], maxBytes: Long): Array[Byte] =
    try new State(input, maxBytes).run()
    catch { case _: Exception => null }

  private final val Malformed = new Exception("malformed") {
    override def fillInStackTrace(): Throwable = this // cheap control flow
  }

  // ---- RFC 7932 constant tables -------------------------------------

  /** §5: insert-length code base/extra (24 symbols). */
  private val InsBase = Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34,
    50, 66, 98, 130, 194, 322, 578, 1090, 2114, 6210, 22594)
  private val InsExtra = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
    5, 5, 6, 7, 8, 9, 10, 12, 14, 24)

  /** §5: copy-length code base/extra (24 symbols). */
  private val CopyBase = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22,
    30, 38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val CopyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 24)

  /** §6: block-count code base/extra (26 symbols). */
  private val BlkBase = Array(1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97,
    113, 145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289, 4337, 8433,
    16625)
  private val BlkExtra = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5,
    5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  /** §5: (insert range, copy range) row starts for cmd >> 6. */
  private val InsRangeLut = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CopyRangeLut = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)

  /** §3.5: order in which code-length-code lengths are transmitted. */
  private val ClCodeOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9,
    10, 11, 12, 13, 14, 15)

  /** Appendix A: word counts are 2^bits per length (index = length). */
  private val DictSizeBits = Array(0, 0, 0, 0, 10, 10, 11, 11, 10, 10,
    10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5)
  private val DictOffsets = Array(0, 0, 0, 0, 0, 4096, 9216, 21504,
    35840, 44032, 53248, 63488, 74752, 87040, 93696, 100864, 104704,
    106752, 108928, 113536, 115968, 118528, 119872, 121280, 122016)

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing resource $name")
    try in.readAllBytes() finally in.close()
  }

  /** Appendix A static dictionary (122,784 bytes). */
  private lazy val Dict: Array[Byte] = {
    val d = resource("/graft/brotli_dict.bin")
    require(d.length == 122784)
    d
  }

  /** §7.1 context lookup: 4 modes x (lut0|lut1) x 256. */
  private lazy val CtxLut: Array[Byte] = {
    val d = resource("/graft/brotli_context.bin")
    require(d.length == 2048)
    d
  }

  /** Appendix B: the 121 transforms as (prefix, op, suffix). Ops:
    * 0 identity, 1-9 omit-last-n, 10 uppercase-first, 11 uppercase-all,
    * 12-20 omit-first-n. */
  private[multimodal] val Transforms: Array[(Array[Byte], Int, Array[Byte])] = {
    def b(s: String) = s.getBytes("ISO-8859-1")
    val UF = 10; val UA = 11
    def OL(n: Int) = n
    def OF(n: Int) = 11 + n
    Array(
      (b(""), 0, b("")), (b(""), 0, b(" ")), (b(" "), 0, b(" ")),
      (b(""), OF(1), b("")), (b(""), UF, b(" ")), (b(""), 0, b(" the ")),
      (b(" "), 0, b("")), (b("s "), 0, b(" ")), (b(""), 0, b(" of ")),
      (b(""), UF, b("")), (b(""), 0, b(" and ")), (b(""), OF(2), b("")),
      (b(""), OL(1), b("")), (b(", "), 0, b(" ")), (b(""), 0, b(", ")),
      (b(" "), UF, b(" ")), (b(""), 0, b(" in ")), (b(""), 0, b(" to ")),
      (b("e "), 0, b(" ")), (b(""), 0, b("\"")), (b(""), 0, b(".")),
      (b(""), 0, b("\">")), (b(""), 0, b("\n")), (b(""), OL(3), b("")),
      (b(""), 0, b("]")), (b(""), 0, b(" for ")), (b(""), OF(3), b("")),
      (b(""), OL(2), b("")), (b(""), 0, b(" a ")), (b(""), 0, b(" that ")),
      (b(" "), UF, b("")), (b(""), 0, b(". ")), (b("."), 0, b("")),
      (b(" "), 0, b(", ")), (b(""), OF(4), b("")), (b(""), 0, b(" with ")),
      (b(""), 0, b("'")), (b(""), 0, b(" from ")), (b(""), 0, b(" by ")),
      (b(""), OF(5), b("")), (b(""), OF(6), b("")), (b(" the "), 0, b("")),
      (b(""), OL(4), b("")), (b(""), 0, b(". The ")), (b(""), UA, b("")),
      (b(""), 0, b(" on ")), (b(""), 0, b(" as ")), (b(""), 0, b(" is ")),
      (b(""), OL(7), b("")), (b(""), OL(1), b("ing ")), (b(""), 0, b("\n\t")),
      (b(""), 0, b(":")), (b(" "), 0, b(". ")), (b(""), 0, b("ed ")),
      (b(""), OF(9), b("")), (b(""), OF(7), b("")), (b(""), OL(6), b("")),
      (b(""), 0, b("(")), (b(""), UF, b(", ")), (b(""), OL(8), b("")),
      (b(""), 0, b(" at ")), (b(""), 0, b("ly ")), (b(" the "), 0, b(" of ")),
      (b(""), OL(5), b("")), (b(""), OL(9), b("")), (b(" "), UF, b(", ")),
      (b(""), UF, b("\"")), (b("."), 0, b("(")), (b(""), UA, b(" ")),
      (b(""), UF, b("\">")), (b(""), 0, b("=\"")), (b(" "), 0, b(".")),
      (b(".com/"), 0, b("")), (b(" the "), 0, b(" of the ")),
      (b(""), UF, b("'")), (b(""), 0, b(". This ")), (b(""), 0, b(",")),
      (b("."), 0, b(" ")), (b(""), UF, b("(")), (b(""), UF, b(".")),
      (b(""), 0, b(" not ")), (b(" "), 0, b("=\"")), (b(""), 0, b("er ")),
      (b(" "), UA, b(" ")), (b(""), 0, b("al ")), (b(" "), UA, b("")),
      (b(""), 0, b("='")), (b(""), UA, b("\"")), (b(""), UF, b(". ")),
      (b(" "), 0, b("(")), (b(""), 0, b("ful ")), (b(" "), UF, b(". ")),
      (b(""), 0, b("ive ")), (b(""), 0, b("less ")), (b(""), UA, b("'")),
      (b(""), 0, b("est ")), (b(" "), UF, b(".")), (b(""), UA, b("\">")),
      (b(" "), 0, b("='")), (b(""), UF, b(",")), (b(""), 0, b("ize ")),
      (b(""), UA, b(".")),
      (Array(0xc2.toByte, 0xa0.toByte), 0, b("")), // NBSP prefix (#102)
      (b(" "), 0, b(",")), (b(""), UF, b("=\"")), (b(""), UA, b("=\"")),
      (b(""), 0, b("ous ")), (b(""), UA, b(", ")), (b(""), UF, b("='")),
      (b(" "), UF, b(",")), (b(" "), UA, b("=\"")), (b(" "), UA, b(", ")),
      (b(""), UA, b(",")), (b(""), UA, b("(")), (b(""), UA, b(". ")),
      (b(" "), UA, b(".")), (b(""), UA, b("='")), (b(" "), UA, b(". ")),
      (b(" "), UF, b("=\"")), (b(" "), UA, b("='")), (b(" "), UF, b("='")))
  }

  /** Appendix B word transform: prefix + op(word) + suffix into dst.
    * Returns the transformed length. The uppercasing is the spec's
    * byte-level rule: ASCII a-z flip bit 5; lead 0xC0-0xDF flips bit 5
    * of the SECOND byte; lead >= 0xE0 XORs 5 into the THIRD byte. */
  private[multimodal] def transformWord(word: Array[Byte], off: Int,
      len: Int, idx: Int, dst: Array[Byte]): Int = {
    val (pre, op, suf) = Transforms(idx)
    var n = 0
    var i = 0
    while (i < pre.length) { dst(n) = pre(i); n += 1; i += 1 }
    var s = off
    var e = off + len
    if (op >= 12) s += math.min(op - 11, len) // omit first n
    else if (op >= 1 && op <= 9) e -= math.min(op, len) // omit last n
    val start = n
    i = s
    while (i < e) { dst(n) = word(i); n += 1; i += 1 }
    if (op == 10 || op == 11) { // uppercase first / all
      var k = start
      while (k < n) {
        val c = dst(k) & 0xff
        if (c < 0xc0) {
          if (c >= 'a' && c <= 'z') dst(k) = (c ^ 32).toByte
          k += 1
        } else if (c < 0xe0) { if (k + 1 < n) dst(k + 1) = (dst(k + 1) ^ 32).toByte; k += 2 }
        else { if (k + 2 < n) dst(k + 2) = (dst(k + 2) ^ 5).toByte; k += 3 }
        if (op == 10) k = n // first only
      }
    }
    i = 0
    while (i < suf.length) { dst(n) = suf(i); n += 1; i += 1 }
    n
  }

  // ---- bit reader -----------------------------------------------------

  private final class Reader(val b: Array[Byte]) {
    private var bitPos: Long = 0L
    def readBit(): Int = {
      val byteAt = (bitPos >> 3).toInt
      if (byteAt >= b.length) throw Malformed
      val v = (b(byteAt) >> (bitPos & 7).toInt) & 1
      bitPos += 1
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
    /** Jump to the next byte boundary; the reference decoder rejects
      * nonzero padding bits ("corrupted padding bits"), so we do too. */
    def alignByte(): Unit =
      while ((bitPos & 7) != 0) { if (readBit() != 0) throw Malformed }
    def bytePos: Int = (bitPos >> 3).toInt
    def skipBytes(n: Int): Unit = {
      bitPos += n.toLong << 3
      if ((bitPos >> 3) > b.length) throw Malformed
    }
    def readByteAligned(): Int = {
      val p = bytePos
      if (p >= b.length) throw Malformed
      bitPos += 8
      b(p) & 0xff
    }
  }

  // ---- canonical prefix code -------------------------------------------

  /** Canonical prefix decoder over code lengths 1..15 (§3.2): codes
    * assigned in (length, symbol) order, read MSB-of-code-first. A
    * single-symbol code is degenerate and consumes no bits. */
  private final class Huff(lengths: Array[Int], alphabet: Int) {
    private val count = new Array[Int](16)
    private var nonzero = 0
    private var only = -1
    locally {
      var s = 0
      while (s < alphabet) {
        val l = lengths(s)
        if (l > 0) { count(l) += 1; nonzero += 1; only = s }
        s += 1
      }
    }
    def isDegenerate: Boolean = nonzero == 1
    // firstCode(l): canonical first code of length l; offset(l): index
    // into `sorted` of that code's first symbol
    private val firstCode = new Array[Int](16)
    private val offset = new Array[Int](16)
    private val sorted = new Array[Int](math.max(nonzero, 1))
    locally {
      var code = 0
      var l = 1
      var off = 0
      while (l <= 15) {
        firstCode(l) = code
        offset(l) = off
        code = (code + count(l)) << 1
        off += count(l)
        l += 1
      }
      val idx = new Array[Int](16)
      System.arraycopy(offset, 0, idx, 0, 16)
      var s = 0
      while (s < alphabet) {
        val ln = lengths(s)
        if (ln > 0) { sorted(idx(ln)) = s; idx(ln) += 1 }
        s += 1
      }
    }
    def read(r: Reader): Int = {
      if (nonzero == 1) return only
      var code = 0
      var l = 0
      while (l < 15) {
        code = (code << 1) | r.readBit()
        l += 1
        val c = count(l)
        if (c > 0 && code - firstCode(l) < c)
          return sorted(offset(l) + code - firstCode(l))
      }
      throw Malformed
    }
  }

  private object Huff {
    /** Over-subscribed / under-subscribed length sets are invalid
      * (§3.5), except the degenerate single-symbol code. */
    def checked(lengths: Array[Int], alphabet: Int): Huff = {
      var space = 0
      var nz = 0
      var s = 0
      while (s < alphabet) {
        if (lengths(s) > 0) { space += 32768 >> lengths(s); nz += 1 }
        s += 1
      }
      if (nz == 0 || (nz > 1 && space != 32768)) throw Malformed
      new Huff(lengths, alphabet)
    }
  }

  // ---- decoder state ----------------------------------------------------

  private final class State(in: Array[Byte], maxBytes: Long) {
    private val r = new Reader(in)
    private val cap = math.min(maxBytes, Int.MaxValue - 16L).toInt
    private var out = new Array[Byte](math.min(1 << 16, cap + 1))
    private var pos = 0

    private def ensure(n: Int): Unit = {
      if (pos + n > cap) throw Malformed // bomb guard, incremental
      if (pos + n > out.length) {
        var sz = out.length
        while (sz < pos + n) sz = math.min(sz.toLong * 2, cap + 1L).toInt
        out = java.util.Arrays.copyOf(out, sz)
      }
    }
    private def put(v: Int): Unit = { ensure(1); out(pos) = v.toByte; pos += 1 }

    def run(): Array[Byte] = {
      val wbits = decodeWindowBits()
      val window = (1 << wbits) - 16
      var isLast = false
      while (!isLast) {
        isLast = r.readBit() == 1
        if (isLast && r.readBit() == 1) { // ISLASTEMPTY
          return java.util.Arrays.copyOf(out, pos)
        }
        val nibbles = r.readBits(2)
        if (nibbles == 3) { // metadata block: skip (may be ISLAST —
          // the reference accepts a final metadata block)
          if (r.readBit() != 0) throw Malformed // reserved
          val skipBytes = r.readBits(2)
          var skipLen = 0
          var k = 0
          var lastByte = 0
          while (k < skipBytes) {
            lastByte = r.readBits(8)
            skipLen |= lastByte << (8 * k)
            k += 1
          }
          if (skipBytes > 0 && lastByte == 0) throw Malformed
          if (skipBytes > 0) skipLen += 1
          r.alignByte()
          r.skipBytes(skipLen)
        } else {
          var mlen = 0
          var k = 0
          var lastNib = 0
          while (k < nibbles + 4) {
            lastNib = r.readBits(4)
            mlen |= lastNib << (4 * k)
            k += 1
          }
          if (nibbles > 0 && lastNib == 0) throw Malformed
          mlen += 1
          val uncompressed = !isLast && r.readBit() == 1
          if (uncompressed) {
            r.alignByte()
            ensure(mlen)
            var i = 0
            while (i < mlen) { out(pos) = r.readByteAligned().toByte; pos += 1; i += 1 }
          } else decodeCompressedMetaBlock(mlen, window)
        }
      }
      java.util.Arrays.copyOf(out, pos)
    }

    /** §9.1 WBITS decode (10-24; 16 is the 1-bit fast path). */
    private def decodeWindowBits(): Int = {
      if (r.readBit() == 0) return 16
      val n = r.readBits(3)
      if (n != 0) return 17 + n
      val m = r.readBits(3)
      if (m == 0) return 17
      if (m == 1) throw Malformed // reserved (large-window brotli)
      8 + m
    }

    /** §9.2 NBLTYPES / NTREES style variable-length uint (1..256). */
    private def varLenUint8(): Int = {
      if (r.readBit() == 0) return 0
      val n = r.readBits(3)
      if (n == 0) 1 else r.readBits(n) + (1 << n)
    }

    // ---- prefix-code reading (§3.4 / §3.5) ----

    private def alphabetBits(alphabet: Int): Int =
      32 - Integer.numberOfLeadingZeros(alphabet - 1)

    private def readPrefixCode(alphabet: Int): Huff = {
      val lengths = new Array[Int](alphabet)
      val hskip = r.readBits(2)
      if (hskip == 1) { // simple code
        val nsym = r.readBits(2) + 1
        val bits = alphabetBits(alphabet)
        val syms = new Array[Int](nsym)
        var i = 0
        while (i < nsym) {
          val s = r.readBits(bits)
          if (s >= alphabet) throw Malformed
          var j = 0
          while (j < i) { if (syms(j) == s) throw Malformed; j += 1 }
          syms(i) = s
          i += 1
        }
        // lengths by READ position; canonical tie-break by symbol value
        // happens in the builder (matches the spec's tree shapes)
        nsym match {
          case 1 => lengths(syms(0)) = 1 // degenerate, 0 bits on read
          case 2 => lengths(syms(0)) = 1; lengths(syms(1)) = 1
          case 3 =>
            lengths(syms(0)) = 1; lengths(syms(1)) = 2; lengths(syms(2)) = 2
          case 4 =>
            if (r.readBit() == 0) syms.foreach(s => lengths(s) = 2)
            else {
              lengths(syms(0)) = 1; lengths(syms(1)) = 2
              lengths(syms(2)) = 3; lengths(syms(3)) = 3
            }
        }
        new Huff(lengths, alphabet)
      } else { // complex code
        // code lengths of the code-length code, fixed prefix code
        val clLen = new Array[Int](18)
        var space = 32
        var numCodes = 0
        var i = hskip
        while (i < 18 && space > 0) {
          val len = readClClSymbol()
          clLen(ClCodeOrder(i)) = len
          if (len != 0) { space -= 32 >> len; numCodes += 1 }
          i += 1
        }
        if (space < 0 || (numCodes != 1 && space != 0)) throw Malformed
        val clCode = new Huff(clLen, 18)
        // actual code lengths with 16/17 repeats and the spec's
        // same-length repeat accumulation
        var symbol = 0
        var mainSpace = 32768
        var prevLen = 8
        var repeat = 0
        var repeatLen = 0
        while (symbol < alphabet && mainSpace > 0) {
          val cl = clCode.read(r)
          if (cl < 16) {
            lengths(symbol) = cl
            symbol += 1
            repeat = 0 // any literal length breaks repeat accumulation
            if (cl != 0) {
              prevLen = cl
              mainSpace -= 32768 >> cl
            }
          } else {
            val extraBits = if (cl == 16) 2 else 3
            val newLen = if (cl == 16) prevLen else 0
            if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
            val old = repeat
            if (repeat > 0) repeat = (repeat - 2) << extraBits
            repeat += r.readBits(extraBits) + 3
            var delta = repeat - old
            if (symbol + delta > alphabet) throw Malformed
            while (delta > 0) {
              lengths(symbol) = newLen
              symbol += 1
              delta -= 1
            }
            if (newLen != 0) mainSpace -= (repeat - old) * (32768 >> newLen)
          }
        }
        if (mainSpace < 0) throw Malformed
        Huff.checked(lengths, alphabet)
      }
    }

    /** §3.5 fixed code for the code-length-code lengths (values 0-5). */
    private def readClClSymbol(): Int = {
      val b0 = r.readBit(); val b1 = r.readBit()
      (b0, b1) match {
        case (0, 0) => 0
        case (1, 0) => 4
        case (0, 1) => 3
        case _ =>
          if (r.readBit() == 0) 2
          else if (r.readBit() == 0) 1
          else 5
      }
    }

    // ---- context map (§7.3) ----

    private def readContextMap(contexts: Int, ntrees: Int): Array[Int] = {
      val map = new Array[Int](contexts)
      if (ntrees == 1) return map
      val rleMax = if (r.readBit() == 1) r.readBits(4) + 1 else 0
      val code = readPrefixCode(ntrees + rleMax)
      var i = 0
      while (i < contexts) {
        val s = code.read(r)
        if (s == 0) { map(i) = 0; i += 1 }
        else if (s <= rleMax) {
          var reps = (1 << s) + r.readBits(s)
          if (i + reps > contexts) throw Malformed
          while (reps > 0) { map(i) = 0; i += 1; reps -= 1 }
        } else {
          if (s - rleMax >= ntrees) throw Malformed
          map(i) = s - rleMax
          i += 1
        }
      }
      if (r.readBit() == 1) { // inverse move-to-front
        val mtf = Array.tabulate(256)(identity)
        var k = 0
        while (k < contexts) {
          val idx = map(k)
          val v = mtf(idx)
          map(k) = v
          var j = idx
          while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
          mtf(0) = v
          k += 1
        }
      }
      map
    }

    // ---- block switching (§6) ----

    private final class BlockCategory(val nbltypes: Int) {
      var typeCode: Huff = _
      var countCode: Huff = _
      var btype = 0
      var btypePrev = 1
      var remaining = Int.MaxValue
      def init(): Unit = if (nbltypes >= 2) {
        typeCode = readPrefixCode(nbltypes + 2)
        countCode = readPrefixCode(26)
        remaining = readBlockCount()
      }
      private def readBlockCount(): Int = {
        val s = countCode.read(r)
        BlkBase(s) + r.readBits(BlkExtra(s))
      }
      def switchBlock(): Unit = {
        val s = typeCode.read(r)
        val next = s match {
          case 0 => btypePrev
          case 1 => (btype + 1) % nbltypes
          case _ => s - 2
        }
        btypePrev = btype
        btype = next
        remaining = readBlockCount()
      }
      def tick(): Int = {
        if (remaining == 0) switchBlock()
        remaining -= 1
        btype
      }
    }

    // ---- compressed meta-block (§9.3) ----

    private def decodeCompressedMetaBlock(mlenIn: Int, window: Int): Unit = {
      var mlen = mlenIn
      val catL = new BlockCategory(varLenUint8() + 1)
      catL.init()
      val catI = new BlockCategory(varLenUint8() + 1)
      catI.init()
      val catD = new BlockCategory(varLenUint8() + 1)
      catD.init()

      val npostfix = r.readBits(2)
      val ndirect = r.readBits(4) << npostfix
      val nbltL = catL.nbltypes
      val ctxModes = new Array[Int](nbltL)
      var i = 0
      while (i < nbltL) { ctxModes(i) = r.readBits(2); i += 1 }
      val ntreesL = varLenUint8() + 1
      val litMap = readContextMap(64 * nbltL, ntreesL)
      val ntreesD = varLenUint8() + 1
      val distMap = readContextMap(4 * catD.nbltypes, ntreesD)
      val litCodes = Array.fill(ntreesL)(readPrefixCode(256))
      val cmdCodes = Array.fill(catI.nbltypes)(readPrefixCode(704))
      val distAlphabet = 16 + ndirect + (48 << npostfix)
      val distCodes = Array.fill(ntreesD)(readPrefixCode(distAlphabet))

      // distance ring buffer: initialized 16,15,11,4; last = idx-1
      val distRb = Array(16, 15, 11, 4)
      var distIdx = 0
      def rb(k: Int): Int = distRb((distIdx - k) & 3) // k=1 → last

      val wordBuf = new Array[Byte](64) // max transformed word size

      while (mlen > 0) {
        val bi = catI.tick()
        val cmd = cmdCodes(bi).read(r)
        val rangeIdx0 = cmd >> 6
        val implicitDist = rangeIdx0 < 2
        val rangeIdx = if (implicitDist) rangeIdx0 else rangeIdx0 - 2
        if (rangeIdx >= 9) throw Malformed
        val insCode = InsRangeLut(rangeIdx) + ((cmd >> 3) & 7)
        val copyCode = CopyRangeLut(rangeIdx) + (cmd & 7)
        var insertLen = InsBase(insCode) + r.readBits(InsExtra(insCode))
        val copyLen = CopyBase(copyCode) + r.readBits(CopyExtra(copyCode))
        // literals
        while (insertLen > 0 && mlen > 0) {
          val bl = catL.tick()
          val mode = ctxModes(bl)
          val p1 = if (pos > 0) out(pos - 1) & 0xff else 0
          val p2 = if (pos > 1) out(pos - 2) & 0xff else 0
          val ctx = (CtxLut((mode << 9) + p1) & 0xff) |
            (CtxLut((mode << 9) + 256 + p2) & 0xff)
          val lit = litCodes(litMap((bl << 6) + ctx)).read(r)
          put(lit)
          mlen -= 1
          insertLen -= 1
        }
        if (insertLen > 0) throw Malformed // MLEN ran out mid-insert
        if (mlen == 0) return // command without a copy part ends block
        // distance
        var dcode = 0
        if (!implicitDist) {
          val bd = catD.tick()
          val distCtx = math.min(copyLen, 5) - 2
          dcode = distCodes(distMap((bd << 2) + distCtx)).read(r)
        }
        val distance: Int =
          if (dcode < 16) {
            val d = dcode match {
              case 0 => rb(1)
              case 1 => rb(2)
              case 2 => rb(3)
              case 3 => rb(4)
              case _ =>
                val base = if (dcode < 10) rb(1) else rb(2)
                val k = (dcode - (if (dcode < 10) 4 else 10)) >> 1
                val delta = k + 1
                if ((dcode & 1) == 0) base - delta else base + delta
            }
            if (d <= 0) throw Malformed
            d
          } else if (dcode < 16 + ndirect) {
            dcode - 16 + 1
          } else {
            val d = dcode - ndirect - 16
            val hcode = d >>> npostfix
            val lcode = d & ((1 << npostfix) - 1)
            val nbits = 1 + (hcode >> 1)
            if (nbits > 24) throw Malformed
            val offset = ((2 + (hcode & 1)) << nbits) - 4
            (((offset + r.readBits(nbits)).toLong << npostfix) +
              lcode + ndirect + 1).toInt
          }
        val maxDist = math.min(pos, window)
        if (distance <= maxDist) {
          if (copyLen > mlen) throw Malformed
          ensure(copyLen)
          var k = 0
          val from = pos - distance
          while (k < copyLen) { // overlapping copy is byte-serial
            out(pos) = out(from + k)
            pos += 1
            k += 1
          }
          mlen -= copyLen
          if (dcode != 0) { distRb(distIdx & 3) = distance; distIdx += 1 }
        } else { // static dictionary reference (§8)
          if (copyLen < 4 || copyLen > 24) throw Malformed
          val shift = DictSizeBits(copyLen)
          if (shift == 0) throw Malformed
          val wordIdx = distance - maxDist - 1
          val wordId = wordIdx & ((1 << shift) - 1)
          val tIdx = wordIdx >>> shift
          if (tIdx >= 121) throw Malformed
          val n = transformWord(Dict, DictOffsets(copyLen) + wordId * copyLen,
            copyLen, tIdx, wordBuf)
          if (n > mlen) throw Malformed
          ensure(n)
          System.arraycopy(wordBuf, 0, out, pos, n)
          pos += n
          mlen -= n
          // dictionary references never enter the distance ring buffer
        }
      }
    }
  }
}
