package graft.multimodal

import scala.collection.mutable

/** PDF (ISO 32000-1) document machinery shared by [[PdfTextExpr]] and
  * [[PdfMetaExpr]] — the crawl-ingestion route for the web's dominant
  * non-HTML document format (a real multilingual crawl is saturated
  * with PDFs, and their body text is exactly what an LLM curation
  * pipeline wants).
  *
  * Scope is the deterministic skeleton every conformant file shares:
  *
  *  - the object syntax of §7.3 (booleans, numbers, literal and hex
  *    strings with all escape forms, names with #xx, arrays, dicts,
  *    indirect references, streams, null);
  *  - both cross-reference flavors: classic `xref` tables (§7.5.4,
  *    subsections + 20-byte entries) and cross-reference streams
  *    (§7.5.8, /W field widths + /Index pairs + type 0/1/2 rows),
  *    walking /Prev chains and the /XRefStm bridge of hybrid-reference
  *    files, first-seen-wins across the chain (the update semantics);
  *  - object streams (§7.5.7): /Type /ObjStm pair table + /First;
  *  - stream filters (§7.4): FlateDecode (zlib, raw-deflate fallback)
  *    and LZWDecode (MSB-first 9..12-bit codes, EarlyChange) each with
  *    the /Predictor family (PNG Sub/Up/Average/Paeth rows and TIFF
  *    horizontal differencing), ASCIIHexDecode, ASCII85Decode,
  *    RunLengthDecode; image-only filters (DCT/JPX/CCITT/JBIG2) are
  *    left encoded for the caller to route to the image decoders;
  *  - the page tree (§7.7.3): recursive /Kids walk with cycle and
  *    depth guards and /Resources inheritance.
  *
  * Broken files are the norm in a crawl, so loading is two-tier: the
  * xref chain first, and on any structural failure (garbage offsets,
  * truncated tables, lying /Length) a full-file reconstruction scan
  * for `N G obj` headers (last occurrence wins — the append-only
  * update order), expanding any object streams found. Nothing here
  * throws outward; expressions catch and yield NULL.
  *
  * Bomb guards: 64 MiB per decoded stream, 50k pages, 1M xref
  * entries, parse depth 64. Reference analogue: the format readers of
  * the filesystem connector (this format is additive — the reference
  * ships no PDF reader; flink-formats carries the same
  * bytes-to-records contract this fulfils).
  */
object Pdf {

  val MaxStream = 64 << 20
  val MaxPages = 50000
  val MaxObjects = 1 << 20
  val MaxDepth = 64

  sealed trait Obj
  case object PNull extends Obj
  final case class PBool(v: Boolean) extends Obj
  final case class PNum(v: Double) extends Obj {
    def i: Int = v.toInt
    def l: Long = v.toLong
  }
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PName(v: String) extends Obj
  final case class PArr(items: Vector[Obj]) extends Obj
  final case class PDict(m: Map[String, Obj]) extends Obj {
    def get(k: String): Option[Obj] = m.get(k)
  }
  final case class PRef(num: Int, gen: Int) extends Obj
  final case class PStream(dict: PDict, raw: Array[Byte],
      num: Int = -1, gen: Int = 0) extends Obj

  final class PdfError(msg: String) extends Exception(msg)
  private def fail(msg: String): Nothing = throw new PdfError(msg)

  // ---------------------------------------------------------------- lexer

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'
  private def isRegular(c: Int): Boolean = !isWs(c) && !isDelim(c)

  /** A cursor over the raw bytes; shared by the document parser and
    * the content-stream tokenizer. */
  final class Lexer(val b: Array[Byte], var pos: Int, val end: Int) {
    def this(b: Array[Byte]) = this(b, 0, b.length)

    def atEnd: Boolean = pos >= end
    def peek: Int = if (pos < end) b(pos) & 0xff else -1

    def skipWs(): Unit = {
      var run = true
      while (run) {
        while (pos < end && isWs(b(pos) & 0xff)) pos += 1
        if (pos < end && b(pos) == '%') {
          while (pos < end && b(pos) != '\n' && b(pos) != '\r') pos += 1
        } else run = false
      }
    }

    /** The next regular-character token (operator / keyword), or null. */
    def keyword(): String = {
      skipWs()
      val s = pos
      while (pos < end && isRegular(b(pos) & 0xff)) pos += 1
      if (pos == s) null else new String(b, s, pos - s, "ISO-8859-1")
    }

    def expect(kw: String): Unit =
      if (keyword() != kw) fail(s"expected $kw")

    private def name(): PName = {
      pos += 1 // '/'
      val sb = new java.lang.StringBuilder(16)
      while (pos < end && isRegular(b(pos) & 0xff)) {
        val c = b(pos) & 0xff
        if (c == '#' && pos + 2 < end) {
          val h = hexVal(b(pos + 1)); val l = hexVal(b(pos + 2))
          if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); pos += 3 }
          else { sb.append(c.toChar); pos += 1 }
        } else { sb.append(c.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def hexVal(c: Byte): Int = {
      val v = c & 0xff
      if (v >= '0' && v <= '9') v - '0'
      else if (v >= 'a' && v <= 'f') v - 'a' + 10
      else if (v >= 'A' && v <= 'F') v - 'A' + 10
      else -1
    }

    private def literalString(): PStr = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream(32)
      var depth = 1
      while (pos < end && depth > 0) {
        val c = b(pos) & 0xff
        pos += 1
        c match {
          case '(' => depth += 1; out.write(c)
          case ')' => depth -= 1; if (depth > 0) out.write(c)
          case '\\' if pos < end =>
            val e = b(pos) & 0xff
            pos += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' | ')' | '\\' => out.write(e)
              case '\r' => if (pos < end && b(pos) == '\n') pos += 1
              case '\n' => // line continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'; var k = 0
                while (k < 2 && pos < end && b(pos) >= '0' && b(pos) <= '7') {
                  v = (v << 3) | (b(pos) - '0'); pos += 1; k += 1
                }
                out.write(v & 0xff)
              case other => out.write(other) // spec: backslash dropped
            }
          case _ => out.write(c)
        }
      }
      PStr(out.toByteArray)
    }

    private def hexString(): PStr = {
      pos += 1 // '<'
      val out = new java.io.ByteArrayOutputStream(16)
      var hi = -1
      var run = true
      while (run && pos < end) {
        val c = b(pos)
        if (c == '>') { pos += 1; run = false }
        else {
          val v = hexVal(c)
          pos += 1
          if (v >= 0) {
            if (hi < 0) hi = v
            else { out.write((hi << 4) | v); hi = -1 }
          }
        }
      }
      if (hi >= 0) out.write(hi << 4) // odd digit count: trailing 0
      PStr(out.toByteArray)
    }

    private def number(): Obj = {
      val s = pos
      if (pos < end && (b(pos) == '+' || b(pos) == '-')) pos += 1
      var dot = false
      while (pos < end && ((b(pos) >= '0' && b(pos) <= '9') || b(pos) == '.')) {
        if (b(pos) == '.') dot = true
        pos += 1
      }
      if (pos == s) fail("bad number")
      val txt = new String(b, s, pos - s, "ISO-8859-1")
      val _ = dot
      PNum(try txt.toDouble catch { case _: NumberFormatException => fail("bad number") })
    }

    /** Parse one object. Indirect references `N G R` are recognized by
      * bounded lookahead from an integer. */
    def obj(depth: Int): Obj = {
      if (depth > MaxDepth) fail("depth")
      skipWs()
      if (atEnd) fail("eof")
      val c = peek
      c match {
        case '/' => name()
        case '(' => literalString()
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[Obj]
          var run = true
          var n = 0
          while (run) {
            skipWs()
            if (atEnd) fail("eof in array")
            if (peek == ']') { pos += 1; run = false }
            else {
              items += obj(depth + 1)
              n += 1
              if (n > MaxObjects) fail("array bomb")
            }
          }
          PArr(items.result())
        case '<' =>
          if (pos + 1 < end && b(pos + 1) == '<') {
            pos += 2
            val m = Map.newBuilder[String, Obj]
            var run = true
            var n = 0
            while (run) {
              skipWs()
              if (atEnd) fail("eof in dict")
              if (peek == '>') {
                pos += 1
                if (peek == '>') pos += 1
                run = false
              } else if (peek == '/') {
                val k = name().v
                m += k -> obj(depth + 1)
                n += 1
                if (n > MaxObjects) fail("dict bomb")
              } else fail("bad dict key")
            }
            PDict(m.result())
          } else hexString()
        case d if (d >= '0' && d <= '9') || d == '+' || d == '-' || d == '.' =>
          val save = pos
          val n1 = number()
          // lookahead: "<int> <int> R"
          n1 match {
            case PNum(v) if v >= 0 && v == v.toLong && v <= Int.MaxValue =>
              val afterFirst = pos
              skipWs()
              val s2 = pos
              if (pos < end && b(pos) >= '0' && b(pos) <= '9') {
                while (pos < end && b(pos) >= '0' && b(pos) <= '9') pos += 1
                val genTxt = new String(b, s2, pos - s2, "ISO-8859-1")
                skipWs()
                if (pos < end && b(pos) == 'R' &&
                    (pos + 1 >= end || !isRegular(b(pos + 1) & 0xff))) {
                  pos += 1
                  return PRef(v.toInt, genTxt.toInt)
                }
              }
              pos = afterFirst
              val _ = save
              n1
            case _ => n1
          }
        case 't' | 'f' | 'n' =>
          keyword() match {
            case "true" => PBool(true)
            case "false" => PBool(false)
            case "null" => PNull
            case other => fail(s"bad keyword $other")
          }
        case _ => fail(s"unexpected byte $c")
      }
    }
  }

  // ------------------------------------------------------------- filters

  private def inflate(data: Array[Byte]): Array[Byte] = {
    def run(nowrap: Boolean): Array[Byte] = {
      val inf = new java.util.zip.Inflater(nowrap)
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4 + 64, 1 << 16))
      val buf = new Array[Byte](8192)
      try {
        while (!inf.finished() && !inf.needsInput() && out.size <= MaxStream) {
          val n = inf.inflate(buf)
          if (n == 0 && !inf.finished()) return out.toByteArray // truncated: keep prefix
          out.write(buf, 0, n)
        }
      } finally inf.end()
      if (out.size > MaxStream) fail("stream bomb")
      out.toByteArray
    }
    try run(false)
    catch {
      case _: Exception =>
        run(true) // raw deflate written by sloppy producers
    }
  }

  /** PDF LZWDecode (§7.4.4.2 — the TIFF flavor): MSB-first variable
    * 9..12-bit codes, 256 = clear, 257 = EOD; EarlyChange (default 1)
    * bumps the code width one entry early. */
  private def lzw(data: Array[Byte], earlyChange: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 16)
    val dictBytes = new Array[Array[Byte]](4096)
    var dictSize = 258
    var width = 9
    var bitBuf = 0L
    var bits = 0
    var prev: Array[Byte] = null
    var i = 0
    var done = false
    while (!done && (i < data.length || bits >= width)) {
      while (bits < width && i < data.length) {
        bitBuf = (bitBuf << 8) | (data(i) & 0xff); bits += 8; i += 1
      }
      if (bits < width) done = true
      else {
        val code = ((bitBuf >>> (bits - width)) & ((1 << width) - 1)).toInt
        bits -= width
        if (code == 256) {
          dictSize = 258; width = 9; prev = null
        } else if (code == 257) done = true
        else {
          val entry: Array[Byte] =
            if (code < 256) Array(code.toByte)
            else if (code < dictSize && dictBytes(code) != null) dictBytes(code)
            else if (prev != null) prev :+ prev(0) // KwKwK case
            else fail("lzw code")
          out.write(entry, 0, entry.length)
          if (out.size > MaxStream) fail("stream bomb")
          if (prev != null && dictSize < 4096) {
            dictBytes(dictSize) = prev :+ entry(0)
            dictSize += 1
          }
          if (dictSize + earlyChange >= (1 << width) && width < 12) width += 1
          prev = entry
        }
      }
    }
    out.toByteArray
  }

  private def ascii85(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 8)
    var tuple = 0L
    var n = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      i += 1
      if (c == '~') done = true
      else if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        n += 1
        if (n == 5) {
          out.write(((tuple >>> 24) & 0xff).toInt); out.write(((tuple >>> 16) & 0xff).toInt)
          out.write(((tuple >>> 8) & 0xff).toInt); out.write((tuple & 0xff).toInt)
          tuple = 0; n = 0
        }
      } // whitespace and stray bytes: skipped
      if (out.size > MaxStream) fail("stream bomb")
    }
    if (n > 1) {
      var k = n
      while (k < 5) { tuple = tuple * 85 + 84; k += 1 }
      val full = Array(((tuple >>> 24) & 0xff).toByte, ((tuple >>> 16) & 0xff).toByte,
        ((tuple >>> 8) & 0xff).toByte, (tuple & 0xff).toByte)
      out.write(full, 0, n - 1)
    }
    out.toByteArray
  }

  private def asciiHex(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 4)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i) & 0xff
      i += 1
      if (c == '>') done = true
      else {
        val v =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (v >= 0) {
          if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
        }
      }
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  private def runLength(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2 + 8)
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val len = data(i) & 0xff
      i += 1
      if (len == 128) done = true
      else if (len < 128) {
        val n = math.min(len + 1, data.length - i)
        out.write(data, i, n); i += n
      } else if (i < data.length) {
        val b = data(i); i += 1
        var k = 0
        while (k < 257 - len) { out.write(b); k += 1 }
      }
      if (out.size > MaxStream) fail("stream bomb")
    }
    out.toByteArray
  }

  /** /Predictor post-processing (§7.4.4.4): 2 = TIFF horizontal
    * differencing, >= 10 = the PNG row filters (tag byte per row). */
  private def predict(data: Array[Byte], pred: Int, colors: Int,
      bpc: Int, columns: Int): Array[Byte] = {
    if (pred <= 1) return data
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = math.max(1, (colors * bpc * columns + 7) / 8)
    if (pred == 2) {
      if (bpc != 8) return data // sub-byte TIFF prediction: leave as-is
      val out = data.clone()
      var r = 0
      while (r * rowLen < out.length) {
        val base = r * rowLen
        var i = bpp
        while (i < rowLen && base + i < out.length) {
          out(base + i) = (out(base + i) + out(base + i - bpp)).toByte
          i += 1
        }
        r += 1
      }
      return out
    }
    // PNG: rows of (1 tag + rowLen) bytes
    val rows = data.length / (rowLen + 1)
    val out = new Array[Byte](rows * rowLen)
    val prior = new Array[Byte](rowLen)
    var r = 0
    while (r < rows) {
      val src = r * (rowLen + 1)
      val tag = data(src) & 0xff
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + 1 + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = prior(i) & 0xff
        val ul = if (i >= bpp) prior(i - bpp) & 0xff else 0
        val v = tag match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) / 2)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => raw
        }
        out(dst + i) = v.toByte
        i += 1
      }
      System.arraycopy(out, dst, prior, 0, rowLen)
      r += 1
    }
    out
  }

  /** The image-only filters we deliberately leave encoded. */
  private val ImageFilters = Set("DCTDecode", "DCT", "JPXDecode",
    "CCITTFaxDecode", "CCF", "JBIG2Decode")

  // ------------------------------------------------------------- document

  final class Doc(val bytes: Array[Byte]) {
    /** num -> either an absolute offset (Left) or (objstm num, index). */
    private val xref = mutable.LongMap.empty[Long] // num -> encoded loc
    private def encOffset(off: Long): Long = off
    private def encInStream(stm: Int, idx: Int): Long =
      -1L - ((stm.toLong << 20) | idx.toLong)

    var trailer: PDict = PDict(Map.empty)
    private val cache = mutable.LongMap.empty[Obj]
    private val objStmCache = mutable.LongMap.empty[Array[Obj]]
    private val objStmIds = mutable.LongMap.empty[Array[Int]]
    private var resolving = 0

    def encrypted: Boolean = trailer.get("Encrypt").isDefined

    // ---- loading

    load()

    /** The /Encrypt dict's own object number — exempt from
      * decryption (its /O and /U are stored in the clear). */
    private val encObjNum: Int = trailer.get("Encrypt") match {
      case Some(PRef(n, _)) => n
      case _ => -1
    }

    /** Empty-user-password Standard-handler decryptor, built after
      * structural load; None = unencrypted OR truly locked. */
    private val crypt: Option[PdfCrypt.Decryptor] =
      trailer.get("Encrypt") match {
        case Some(e) =>
          try {
            val d = dict(e)
            val id0 = resolve(trailer.get("ID").getOrElse(PNull)) match {
              case PArr(items) if items.nonEmpty => resolve(items.head) match {
                case PStr(b) => b
                case _ => Array.empty[Byte]
              }
              case _ => Array.empty[Byte]
            }
            val built = PdfCrypt.build(d, id0, resolve)
            if (built.isDefined) {
              // anything resolved during load was read undecrypted
              cache.clear(); objStmCache.clear(); objStmIds.clear()
            }
            built
          } catch { case _: Exception => None }
        case None => None
      }

    /** Encrypted AND the empty user password opens it. */
    def unlocked: Boolean = crypt != null && crypt.isDefined

    private def cryptActive: Boolean = crypt != null && crypt.isDefined

    private def decryptStrings(o: Obj, num: Int, gen: Int): Obj = o match {
      case PStr(b) => PStr(crypt.get.string(b, num, gen))
      case PArr(items) => PArr(items.map(decryptStrings(_, num, gen)))
      case PDict(m) =>
        PDict(m.map { case (k, v) => k -> decryptStrings(v, num, gen) })
      case s: PStream =>
        PStream(decryptStrings(s.dict, num, gen).asInstanceOf[PDict],
          s.raw, s.num, s.gen)
      case x => x
    }

    private def load(): Unit = {
      try loadViaXref()
      catch { case _: Exception => reconstruct() }
      val rootOk =
        try resolve(trailer.get("Root").getOrElse(PNull)) != PNull
        catch { case _: Exception => false }
      if (xref.isEmpty || !rootOk) {
        // no usable catalog through the declared chain: rebuild
        xref.clear(); cache.clear(); objStmCache.clear(); objStmIds.clear()
        reconstruct()
      }
    }

    private def loadViaXref(): Unit = {
      // find the last startxref in the tail
      val tailStart = math.max(0, bytes.length - 2048)
      val tail = new String(bytes, tailStart, bytes.length - tailStart, "ISO-8859-1")
      val k = tail.lastIndexOf("startxref")
      if (k < 0) fail("no startxref")
      val lx = new Lexer(bytes, tailStart + k + "startxref".length, bytes.length)
      lx.skipWs()
      val first = lx.obj(0) match {
        case PNum(v) => v.toLong
        case _ => fail("bad startxref")
      }
      val seen = mutable.Set.empty[Long]
      var offs = List(first)
      var guard = 0
      while (offs.nonEmpty && guard < 1024) {
        val off = offs.head
        offs = offs.tail
        if (!seen.contains(off) && off >= 0 && off < bytes.length) {
          seen += off
          offs = readXrefSection(off) ::: offs
        }
        guard += 1
      }
      if (trailer.get("Root").isEmpty) fail("no Root")
    }

    /** Read one xref section (classic table or stream) at `off`;
      * returns follow-up offsets (/Prev, /XRefStm). */
    private def readXrefSection(off: Long): List[Long] = {
      val lx = new Lexer(bytes, off.toInt, bytes.length)
      lx.skipWs()
      if (lx.peek == 'x') {
        lx.expect("xref")
        var run = true
        while (run) {
          lx.skipWs()
          if (lx.peek == 't') { run = false }
          else {
            val start = lx.obj(0) match { case PNum(v) => v.toLong; case _ => fail("xref") }
            val count = lx.obj(0) match { case PNum(v) => v.toLong; case _ => fail("xref") }
            if (count < 0 || count > MaxObjects) fail("xref bomb")
            lx.skipWs()
            var i = 0L
            while (i < count) {
              // 20-byte entries, but be lenient: parse three tokens
              val o = lx.obj(0) match { case PNum(v) => v.toLong; case _ => fail("xref entry") }
              val g = lx.obj(0) match { case PNum(v) => v.toLong; case _ => fail("xref entry") }
              val t = lx.keyword()
              val num = start + i
              val _ = g
              if (t == "n" && !xref.contains(num)) xref(num) = encOffset(o)
              else if (t == "f" && !xref.contains(num)) xref(num) = Long.MinValue // free
              i += 1
            }
          }
        }
        lx.expect("trailer")
        val t = lx.obj(0) match { case d: PDict => d; case _ => fail("trailer") }
        mergeTrailer(t)
        val prev = t.get("Prev").collect { case PNum(v) => v.toLong }
        val hybrid = t.get("XRefStm").collect { case PNum(v) => v.toLong }
        hybrid.toList ::: prev.toList
      } else {
        // cross-reference stream: "N G obj << ... >> stream"
        val (_, obj) = parseIndirectAt(off.toInt)
        val stm = obj match { case s: PStream => s; case _ => fail("xref stream") }
        val d = stm.dict
        val data = decodeStream(stm)
        val w = d.get("W") match {
          case Some(PArr(items)) => items.map { case PNum(v) => v.toInt; case _ => fail("W") }
          case _ => fail("no W")
        }
        if (w.length < 3 || w.exists(x => x < 0 || x > 8)) fail("bad W")
        val size = d.get("Size") match { case Some(PNum(v)) => v.toLong; case _ => fail("no Size") }
        val index: Seq[(Long, Long)] = d.get("Index") match {
          case Some(PArr(items)) =>
            items.grouped(2).collect {
              case Seq(PNum(a), PNum(b)) => (a.toLong, b.toLong)
            }.toSeq
          case _ => Seq((0L, size))
        }
        val rowLen = w.sum
        var p = 0
        for ((start, count) <- index) {
          if (count > MaxObjects) fail("xref bomb")
          var i = 0L
          while (i < count && p + rowLen <= data.length) {
            def field(fi: Int): Long = {
              var v = 0L
              var k = 0
              var base = p
              var fj = 0
              while (fj < fi) { base += w(fj); fj += 1 }
              while (k < w(fi)) { v = (v << 8) | (data(base + k) & 0xff); k += 1 }
              v
            }
            val tpe = if (w(0) == 0) 1L else field(0)
            val f2 = field(1)
            val f3 = field(2)
            val num = start + i
            if (!xref.contains(num)) {
              tpe match {
                case 1 => xref(num) = encOffset(f2)
                case 2 => xref(num) = encInStream(f2.toInt, f3.toInt)
                case _ => xref(num) = Long.MinValue
              }
            }
            p += rowLen
            i += 1
          }
        }
        mergeTrailer(d)
        d.get("Prev").collect { case PNum(v) => v.toLong }.toList
      }
    }

    private def mergeTrailer(t: PDict): Unit = {
      // first-seen (newest) keys win across the /Prev chain
      trailer = PDict(t.m ++ trailer.m)
    }

    /** Reconstruction: scan for `N G obj` headers; later offsets win
      * (appended updates overwrite). Also picks up a trailer dict and
      * expands object streams. */
    private def reconstruct(): Unit = {
      val b = bytes
      var i = 0
      val n = b.length
      var bestTrailerOff = -1
      while (i + 3 < n) {
        if (b(i) == 'o' && b(i + 1) == 'b' && b(i + 2) == 'j' &&
            (i + 3 >= n || !isRegular(b(i + 3) & 0xff)) &&
            i > 0 && isWs(b(i - 1) & 0xff)) {
          // walk backwards over "G<ws>" then "N<ws>"
          var j = i - 1
          def skipBackWs(): Unit = while (j >= 0 && isWs(b(j) & 0xff)) j -= 1
          def readBackInt(): Long = {
            var e2 = j
            while (j >= 0 && b(j) >= '0' && b(j) <= '9') j -= 1
            if (e2 == j) -1L
            else new String(b, j + 1, e2 - j, "ISO-8859-1").toLong
          }
          skipBackWs()
          val gen = readBackInt()
          if (gen >= 0) {
            skipBackWs()
            val start = j + 1
            val num = readBackInt()
            if (num >= 0 && num <= MaxObjects &&
                (j < 0 || !isRegular(b(j) & 0xff))) {
              val _ = start
              xref(num) = encOffset(j + 1L)
            }
          }
        } else if (b(i) == 't' && i + 7 <= n &&
            new String(b, i, 7, "ISO-8859-1") == "trailer") {
          bestTrailerOff = i + 7
        }
        i += 1
      }
      if (bestTrailerOff >= 0) {
        try {
          val lx = new Lexer(b, bestTrailerOff, n)
          lx.obj(0) match { case d: PDict => mergeTrailer(d); case _ => }
        } catch { case _: Exception => }
      }
      // no classic trailer (xref-stream file): find the catalog + info
      if (trailer.get("Root").isEmpty) {
        val nums = xref.keys.toArray.sorted
        var found = false
        var k = nums.length - 1
        while (k >= 0 && !found) {
          try {
            resolveNum(nums(k).toInt) match {
              case d: PDict if d.get("Type").contains(PName("Catalog")) =>
                trailer = PDict(trailer.m + ("Root" -> PRef(nums(k).toInt, 0)))
                found = true
              case s: PStream if s.dict.get("Type").contains(PName("XRef")) =>
                mergeTrailer(s.dict)
                if (trailer.get("Root").isDefined) found = true
              case _ =>
            }
          } catch { case _: Exception => }
          k -= 1
        }
      }
      // expand any object streams so their members resolve
      val nums = xref.keys.toArray
      for (num <- nums) {
        try {
          resolveNum(num.toInt) match {
            case s: PStream if s.dict.get("Type").contains(PName("ObjStm")) =>
              val ids = objStmMembers(num.toInt)
              var idx = 0
              while (idx < ids.length) {
                if (!xref.contains(ids(idx).toLong) ||
                    xref(ids(idx).toLong) == Long.MinValue)
                  xref(ids(idx).toLong) = encInStream(num.toInt, idx)
                idx += 1
              }
            case _ =>
          }
        } catch { case _: Exception => }
      }
    }

    // ---- object access

    /** Parse the indirect object at an absolute offset; returns
      * (num, body). */
    private def parseIndirectAt(off: Int): (Int, Obj) = {
      val lx = new Lexer(bytes, off, bytes.length)
      val num = lx.obj(0) match { case PNum(v) => v.toInt; case _ => fail("obj header") }
      val gen = lx.obj(0) match { case PNum(v) => v.toInt; case _ => fail("obj header") }
      lx.expect("obj")
      val body = lx.obj(0)
      lx.skipWs()
      // stream?
      body match {
        case d: PDict if lx.pos + 6 <= lx.end &&
            new String(bytes, lx.pos, 6, "ISO-8859-1") == "stream" =>
          lx.pos += 6
          if (lx.pos < lx.end && bytes(lx.pos) == '\r') lx.pos += 1
          if (lx.pos < lx.end && bytes(lx.pos) == '\n') lx.pos += 1
          val dataStart = lx.pos
          val len = resolve(d.get("Length").getOrElse(PNull)) match {
            case PNum(v) if v >= 0 && dataStart + v.toLong <= bytes.length =>
              // trust /Length only when `endstream` actually follows
              val e = dataStart + v.toInt
              val probe = new Lexer(bytes, e, bytes.length)
              probe.skipWs()
              if (probe.pos + 9 <= bytes.length &&
                  new String(bytes, probe.pos, 9, "ISO-8859-1") == "endstream") v.toInt
              else scanStreamEnd(dataStart)
            case _ => scanStreamEnd(dataStart)
          }
          val raw = java.util.Arrays.copyOfRange(bytes, dataStart,
            math.min(dataStart + len, bytes.length))
          (num, PStream(d, raw, num, gen))
        case _ => (num, body)
      }
    }

    /** Lying /Length: find the next `endstream` keyword. */
    private def scanStreamEnd(start: Int): Int = {
      val b = bytes
      var i = start
      val n = b.length - 9
      while (i <= n) {
        if (b(i) == 'e' && b(i + 1) == 'n' && b(i + 2) == 'd' && b(i + 3) == 's' &&
            b(i + 4) == 't' && b(i + 5) == 'r' && b(i + 6) == 'e' && b(i + 7) == 'a' &&
            b(i + 8) == 'm') {
          var e = i
          // strip the EOL that precedes endstream
          if (e > start && b(e - 1) == '\n') e -= 1
          if (e > start && b(e - 1) == '\r') e -= 1
          return e - start
        }
        i += 1
      }
      math.max(0, b.length - start)
    }

    private def objStmMembers(num: Int): Array[Int] = {
      objStmIds.getOrElse(num.toLong, {
        loadObjStm(num)
        objStmIds.getOrElse(num.toLong, Array.empty[Int])
      })
    }

    private def loadObjStm(num: Int): Unit = {
      if (objStmCache.contains(num.toLong)) return
      resolveNum(num) match {
        case s: PStream =>
          val d = s.dict
          val n = resolve(d.get("N").getOrElse(PNull)) match {
            case PNum(v) if v >= 0 && v <= MaxObjects => v.toInt
            case _ => fail("ObjStm N")
          }
          val first = resolve(d.get("First").getOrElse(PNull)) match {
            case PNum(v) if v >= 0 => v.toInt
            case _ => fail("ObjStm First")
          }
          val data = decodeStream(s)
          val hdr = new Lexer(data, 0, math.min(first, data.length))
          val ids = new Array[Int](n)
          val offs = new Array[Int](n)
          var i = 0
          while (i < n) {
            ids(i) = hdr.obj(0) match { case PNum(v) => v.toInt; case _ => fail("ObjStm pair") }
            offs(i) = hdr.obj(0) match { case PNum(v) => v.toInt; case _ => fail("ObjStm pair") }
            i += 1
          }
          val objs = new Array[Obj](n)
          i = 0
          while (i < n) {
            objs(i) =
              try {
                if (first + offs(i) < data.length)
                  new Lexer(data, first + offs(i), data.length).obj(0)
                else PNull
              } catch { case _: PdfError => PNull }
            i += 1
          }
          objStmCache(num.toLong) = objs
          objStmIds(num.toLong) = ids
        case _ => fail("not ObjStm")
      }
    }

    private def resolveNum(num: Int): Obj = {
      cache.getOrElse(num.toLong, {
        val loc = xref.getOrElse(num.toLong, Long.MinValue)
        val v = try {
          if (loc == Long.MinValue) PNull
          else if (loc >= 0) {
            if (loc >= bytes.length) PNull
            else {
              val (gotNum, body) = parseIndirectAt(loc.toInt)
              if (gotNum != num) PNull
              // §7.6.3: strings in top-level objects are encrypted
              // (ObjStm members are not — the stream itself was);
              // the /Encrypt dict's own strings stay clear
              else if (cryptActive && num != encObjNum)
                decryptStrings(body, num, body match {
                  case s: PStream => s.gen
                  case _ => 0
                })
              else body
            }
          } else {
            val enc = -1L - loc
            val stm = (enc >>> 20).toInt
            val idx = (enc & 0xfffff).toInt
            loadObjStm(stm)
            val arr = objStmCache.getOrElse(stm.toLong, Array.empty[Obj])
            if (idx < arr.length) arr(idx) else PNull
          }
        } catch { case _: Exception => PNull } // a broken object, not a broken doc
        cache(num.toLong) = v
        v
      })
    }

    def resolve(o: Obj): Obj = o match {
      case PRef(num, _) =>
        if (resolving > MaxDepth) fail("ref cycle")
        resolving += 1
        try resolve(resolveNum(num)) finally resolving -= 1
      case x => x
    }

    def dict(o: Obj): PDict = resolve(o) match {
      case d: PDict => d
      case s: PStream => s.dict
      case _ => PDict(Map.empty)
    }

    // ---- stream decoding

    def decodeStream(s: PStream): Array[Byte] = {
      val filters: Seq[String] = resolve(s.dict.get("Filter").getOrElse(PNull)) match {
        case PName(v) => Seq(v)
        case PArr(items) => items.map(resolve).collect { case PName(v) => v }
        case _ => Seq.empty
      }
      val parms: Seq[PDict] = resolve(s.dict.get("DecodeParms")
          .orElse(s.dict.get("DP")).getOrElse(PNull)) match {
        case d: PDict => Seq(d)
        case PArr(items) => items.map(resolve).map {
          case d: PDict => d
          case _ => PDict(Map.empty)
        }
        case _ => Seq.empty
      }
      var data = s.raw
      // decrypt before filters; XRef streams are never encrypted
      if (cryptActive && s.num >= 0 && s.num != encObjNum &&
          !s.dict.get("Type").contains(PName("XRef")))
        data = crypt.get.stream(data, s.num, s.gen)
      var fi = 0
      while (fi < filters.length) {
        val f = filters(fi)
        val p = if (fi < parms.length) parms(fi) else PDict(Map.empty)
        def pInt(k: String, dflt: Int): Int = resolve(p.get(k).getOrElse(PNull)) match {
          case PNum(v) => v.toInt
          case _ => dflt
        }
        if (ImageFilters.contains(f)) return data // leave image codecs encoded
        data = f match {
          case "FlateDecode" | "Fl" =>
            predict(inflate(data), pInt("Predictor", 1), pInt("Colors", 1),
              pInt("BitsPerComponent", 8), pInt("Columns", 1))
          case "LZWDecode" | "LZW" =>
            predict(lzw(data, pInt("EarlyChange", 1)), pInt("Predictor", 1),
              pInt("Colors", 1), pInt("BitsPerComponent", 8), pInt("Columns", 1))
          case "ASCIIHexDecode" | "AHx" => asciiHex(data)
          case "ASCII85Decode" | "A85" => ascii85(data)
          case "RunLengthDecode" | "RL" => runLength(data)
          case "Crypt" => data // /Identity pass-through; real crypt gated earlier
          case _ => fail(s"unknown filter $f")
        }
        if (data.length > MaxStream) fail("stream bomb")
        fi += 1
      }
      data
    }

    // ---- page tree

    /** Leaf pages in document order: (page dict, inherited-resolved
      * /Resources dict). */
    def pages(): Vector[(PDict, PDict)] = {
      val root = dict(trailer.get("Root").getOrElse(PNull))
      val top = resolve(root.get("Pages").getOrElse(PNull))
      val out = Vector.newBuilder[(PDict, PDict)]
      var count = 0
      val visited = mutable.Set.empty[Obj]
      def walk(node: Obj, inheritedRes: PDict, depth: Int): Unit = {
        if (depth > 64 || count >= MaxPages) return
        val key = node
        if (visited.contains(key)) return
        visited += key
        val d = dict(node)
        val res = resolve(d.get("Resources").getOrElse(PNull)) match {
          case r: PDict => r
          case _ => inheritedRes
        }
        d.get("Type") match {
          case Some(PName("Page")) =>
            out += ((d, res)); count += 1
          case _ =>
            resolve(d.get("Kids").getOrElse(PNull)) match {
              case PArr(kids) => kids.foreach(k => walk(k, res, depth + 1))
              case _ =>
                // a dict with /Contents but no declared type: treat as page
                if (d.get("Contents").isDefined) { out += ((d, res)); count += 1 }
            }
        }
      }
      walk(top, PDict(Map.empty), 0)
      out.result()
    }

    /** A page's concatenated decoded content bytes. */
    def pageContent(page: PDict): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(1024)
      def add(o: Obj): Unit = resolve(o) match {
        case s: PStream =>
          val d = try decodeStream(s) catch { case _: Exception => Array.empty[Byte] }
          out.write(d, 0, d.length)
          out.write('\n') // §7.8.2: contents array parts joined with ws
        case PArr(items) => items.foreach(add)
        case _ =>
      }
      add(page.get("Contents").getOrElse(PNull))
      out.toByteArray
    }
  }

  /** Entry: parse bytes into a Doc, or null for non-PDF payloads.
    * The header may sit up to 1024 bytes in (§7.5.2 note — real
    * crawlers see prefixed junk). */
  def open(b: Array[Byte]): Doc = {
    if (b == null || b.length < 8) return null
    val lim = math.min(b.length - 5, 1024)
    var i = 0
    var hdr = -1
    while (i < lim && hdr < 0) {
      if (b(i) == '%' && b(i + 1) == 'P' && b(i + 2) == 'D' && b(i + 3) == 'F' &&
          b(i + 4) == '-') hdr = i
      i += 1
    }
    if (hdr < 0) return null
    val body = if (hdr == 0) b else java.util.Arrays.copyOfRange(b, hdr, b.length)
    try new Doc(body) catch { case _: Exception => null }
  }
}
