package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** http_response(payload): split the HTTP/1.x response message a WARC
  * `response` record carries (Content-Type: application/http;
  * msgtype=response) into struct<status: int, content_type: string,
  * charset: string, body: binary, text: string> — the step between
  * [[WarcRecordsExpr]] and clean text in a crawl pipeline:
  * `http_response(r.content).text` after
  * `explode(warc_records(decompress(p).data))`.
  *
  * Parse rules (RFC 9112 message framing): status line
  * "HTTP/<v> <code> [reason]", header lines to the first blank line
  * (names case-insensitive, bare-LF tolerated), body = the rest of
  * the record verbatim — WARC blocks are captured wire bytes, so
  * Content-Length inside the message is NOT re-applied (truncated
  * fetches keep what was captured; the record's own length already
  * framed the block). A `Transfer-Encoding: chunked` body is
  * de-chunked (hex sizes + CRLF framing, trailers dropped); a gzip/
  * deflate/br Content-Encoding body is surfaced as raw `body` bytes
  * with NULL `text` — route through [[DecompressExpr]] explicitly.
  *
  * `charset` resolves in the WHATWG precedence order: the
  * Content-Type parameter when present, else a BOM, else an HTML
  * `<meta charset>` / `<meta http-equiv>` prescan over the first
  * 1024 body bytes (html-typed bodies, or — when the header is
  * silent — bodies whose head sniffs as HTML markup), else NULL. `text`
  * decodes the body for the charsets a web corpus actually carries —
  * utf-8 (with a strict validity scan: invalid sequences fall back to
  * latin-1 rather than emitting replacement garbage),
  * latin-1/iso-8859-1, us-ascii, windows-1252, utf-16 via BOM, and
  * the CJK/legacy multibyte families a multilingual crawl is full of
  * (gbk/gb2312/gb18030, big5, shift_jis/windows-31j, euc-jp, euc-kr,
  * iso-2022-jp — all JDK-shipped decoders, run STRICT: a body that
  * is not valid in its declared charset falls back to latin-1,
  * byte-preserving, the same mislabel policy as utf-8) plus the
  * single-byte non-Latin families under their WHATWG labels
  * (windows-1250..1258, KOI8-R/U, ISO-8859-2..8/13/15/16, thai
  * windows-874, IBM866, mac-roman/cyrillic — see
  * [[HttpResponseExpr.SingleByteCharsets]]) — and is NULL
  * for binary or unsupported-charset payloads. Non-HTTP payloads
  * yield the unknown row; never throws.
  *
  * Scale shape: per-row map-side parse, single scan, zero shuffle
  * (PlanSpec-pinned via q_http_response). */
case class HttpResponseExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = true),
    StructField("charset", StringType, nullable = true),
    StructField("body", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true)))
  override def prettyName: String = "http_response"

  private val unknown = InternalRow(-1, null, null, null, null)

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try parse(b) catch { case _: Exception => unknown }
  }

  private def line(b: Array[Byte], i: Int): (String, Int) =
    TextFraming.line(b, i)

  private def parse(b: Array[Byte]): InternalRow = {
    val sl = line(b, 0)
    if (sl == null) return unknown
    val parts = sl._1.split(" ", 3)
    if (parts.length < 2 || !parts(0).startsWith("HTTP/")) return unknown
    val status = try parts(1).toInt catch {
      case _: NumberFormatException => return unknown
    }
    if (status < 100 || status > 599) return unknown
    var i = sl._2
    var contentType: String = null
    var contentEncoding: String = null
    var chunked = false
    var blank = false
    while (!blank) {
      val hl = line(b, i)
      if (hl == null) return unknown // truncated inside headers
      else if (hl._1.isEmpty) { blank = true; i = hl._2 }
      else {
        i = hl._2
        val colon = hl._1.indexOf(':')
        if (colon > 0) {
          val name = hl._1.substring(0, colon).trim.toLowerCase
          val value = hl._1.substring(colon + 1).trim
          name match {
            case "content-type" => contentType = value
            case "content-encoding" => contentEncoding = value.toLowerCase
            case "transfer-encoding" =>
              chunked = value.toLowerCase.contains("chunked")
            case _ => ()
          }
        }
      }
    }
    val rawBody = java.util.Arrays.copyOfRange(b, i, b.length)
    val body = if (chunked) dechunk(rawBody) else rawBody
    if (body == null) return unknown
    val encoded = contentEncoding != null && contentEncoding != "identity"
    // an encoded body is compressed bytes: prescanning it for a meta
    // tag would read noise, so the prescan only runs on identity bodies
    val charset = charsetOf(contentType, body, allowMeta = !encoded)
    val text = if (encoded) null else decodeText(body, charset, contentType)
    InternalRow(status,
      if (contentType == null) null else UTF8String.fromString(contentType),
      if (charset == null) null else UTF8String.fromString(charset),
      body,
      if (text == null) null else UTF8String.fromString(text))
  }

  /** RFC 9112 chunked framing: hex size [;ext] CRLF data CRLF ...,
    * 0-size terminator; trailers dropped. A truncated final chunk
    * keeps the complete prefix (the WARC capture policy). */
  private def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    var done = false
    while (!done) {
      val hl = line(b, i)
      if (hl == null) done = true // truncated at a chunk boundary
      else {
        val sizeStr = hl._1.takeWhile(c => c != ';').trim
        val size = try java.lang.Long.parseLong(sizeStr, 16) catch {
          case _: NumberFormatException => return null // corrupt framing
        }
        if (size == 0) done = true
        else if (hl._2 + size > b.length) { // truncated chunk: keep prefix
          out.write(b, hl._2, b.length - hl._2)
          done = true
        } else {
          out.write(b, hl._2, size.toInt)
          i = hl._2 + size.toInt
          // consume the CRLF after the chunk data
          if (i < b.length && b(i) == '\r') i += 1
          if (i < b.length && b(i) == '\n') i += 1
        }
      }
    }
    out.toByteArray
  }

  private def charsetOf(contentType: String, body: Array[Byte],
      allowMeta: Boolean): String = {
    if (contentType != null) {
      val lower = contentType.toLowerCase
      val at = lower.indexOf("charset=")
      if (at >= 0) {
        var v = lower.substring(at + 8).trim
        val semi = v.indexOf(';')
        if (semi >= 0) v = v.substring(0, semi)
        return v.stripPrefix("\"").stripSuffix("\"").trim
      }
    }
    if (body.length >= 3 && (body(0) & 0xff) == 0xef &&
      (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf) "utf-8"
    else if (body.length >= 2 && (body(0) & 0xff) == 0xff &&
      (body(1) & 0xff) == 0xfe) "utf-16le"
    else if (body.length >= 2 && (body(0) & 0xff) == 0xfe &&
      (body(1) & 0xff) == 0xff) "utf-16be"
    else if (allowMeta) metaCharset(body, contentType)
    else null
  }

  /** WHATWG-style prescan: when neither the header nor a BOM names a
    * charset, html-typed bodies get their first 1024 bytes scanned
    * (latin-1 view — the prescan only reads ASCII syntax). Each
    * `<meta>` tag's ATTRIBUTES are tokenized and, per the WHATWG
    * algorithm, only a `charset` attribute or the `charset=` parameter
    * INSIDE an `http-equiv=content-type` tag's `content` value counts —
    * a "charset=" substring in some other attribute's value (a
    * description mentioning encodings) must not hijack the charset. */
  private def metaCharset(body: Array[Byte], contentType: String): String = {
    if (body.length == 0) return null
    val head = new String(body, 0, math.min(body.length, 1024),
      "ISO-8859-1").toLowerCase
    // WHATWG scopes the prescan to HTML documents: an html content
    // type qualifies, and a silent header only qualifies when the
    // body itself sniffs as HTML markup — a plain-text/binary body
    // that merely CONTAINS the literal "<meta charset=...>" (a blog
    // post about encodings) must not have that charset applied.
    val html =
      if (contentType != null) contentType.toLowerCase.contains("html")
      else head.contains("<!doctype") || head.contains("<html") ||
        head.contains("<head") || head.contains("<body")
    if (!html) return null
    var i = head.indexOf("<meta")
    while (i >= 0) {
      val end = tagEnd(head, i)
      val attrs = parseAttrs(head.substring(i + 5, end))
      val direct = attrs.get("charset").map(_.trim).filter(_.nonEmpty)
      if (direct.isDefined) return charsetToken(direct.get)
      if (attrs.get("http-equiv").exists(_.trim == "content-type")) {
        for (content <- attrs.get("content")) {
          val at = content.indexOf("charset=")
          if (at >= 0) {
            val t = charsetToken(content.substring(at + 8))
            if (t != null) return t
          }
        }
      }
      i = head.indexOf("<meta", end)
    }
    null
  }

  /** Find the end of the tag opened at `start` ('<'): the first '>'
    * OUTSIDE quoted attribute values — a '>' inside content="a > b"
    * must not truncate the tag and hide a later charset attribute
    * (the WHATWG prescan's quote-skipping tag-end rule). */
  private def tagEnd(head: String, start: Int): Int = {
    var i = start
    while (i < head.length) {
      head(i) match {
        case '>' => return i
        case q @ ('"' | '\'') =>
          i += 1
          while (i < head.length && head(i) != q) i += 1
          if (i < head.length) i += 1 // closing quote
        case _ => i += 1
      }
    }
    head.length
  }

  /** Leading charset token ([a-z0-9._:-]+, optional quotes). */
  private def charsetToken(s0: String): String = {
    var s = s0.trim
    if (s.nonEmpty && (s.head == '"' || s.head == '\'')) s = s.tail
    var e = 0
    while (e < s.length && (s(e).isLetterOrDigit || s(e) == '.' ||
      s(e) == '_' || s(e) == ':' || s(e) == '-')) e += 1
    if (e == 0) null else s.substring(0, e)
  }

  /** Tokenize `key=value` attributes inside one tag: bare keys,
    * optional whitespace around `=`, single/double-quoted or unquoted
    * values. First occurrence of a key wins (the WHATWG rule). */
  private def parseAttrs(tag: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    var i = 0
    val n = tag.length
    def skipWs(): Unit = while (i < n && tag(i).isWhitespace) i += 1
    while (i < n) {
      skipWs()
      val k0 = i
      while (i < n && !tag(i).isWhitespace && tag(i) != '=' &&
        tag(i) != '/') i += 1
      val key = tag.substring(k0, i)
      skipWs()
      if (i < n && tag(i) == '=') {
        i += 1
        skipWs()
        val value =
          if (i < n && (tag(i) == '"' || tag(i) == '\'')) {
            val q = tag(i); i += 1
            val v0 = i
            while (i < n && tag(i) != q) i += 1
            val v = tag.substring(v0, i)
            if (i < n) i += 1
            v
          } else {
            val v0 = i
            while (i < n && !tag(i).isWhitespace) i += 1
            tag.substring(v0, i)
          }
        if (key.nonEmpty && !out.contains(key)) out(key) = value
      } else if (key.nonEmpty && !out.contains(key)) out(key) = ""
      else if (i < n && (tag(i) == '/' || key.isEmpty)) i += 1
    }
    out.toMap
  }

  /** Body → text for textual content types; NULL for binary. The
    * utf-8 path validates first: a declared-utf-8 body that is not
    * valid utf-8 (mislabeled, the web's favorite lie) decodes as
    * latin-1 — byte-preserving — instead of emitting U+FFFD noise. */
  private def decodeText(body: Array[Byte], charset: String,
      contentType: String): String = {
    val textual = contentType == null ||
      contentType.toLowerCase.startsWith("text/") ||
      contentType.toLowerCase.contains("json") ||
      contentType.toLowerCase.contains("xml") ||
      contentType.toLowerCase.contains("javascript") ||
      contentType.toLowerCase.contains("x-www-form")
    if (!textual) return null
    val cs = if (charset == null) "utf-8" else charset
    cs match {
      case "utf-8" | "utf8" =>
        if (validUtf8(body)) {
          val skip = if (body.length >= 3 && (body(0) & 0xff) == 0xef &&
            (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf) 3 else 0
          new String(body, skip, body.length - skip, "UTF-8")
        } else new String(body, "ISO-8859-1")
      case "iso-8859-1" | "latin-1" | "latin1" | "us-ascii" | "ascii" =>
        new String(body, "ISO-8859-1")
      case "windows-1252" | "cp1252" =>
        new String(body, java.nio.charset.Charset.forName("windows-1252"))
      // CJK / legacy multibyte: JDK-shipped decoders, run strict with
      // the latin-1 mislabel fallback. Label→charset follows the
      // WHATWG encoding registry where the JDK carries the exact
      // repertoire (gb2312 label → GBK, the web's de-facto meaning);
      // shift_jis stays JIS X 0208 and windows-31j/cp932 labels get
      // the NEC/IBM superset — the two differ at 0x5C/wave-dash, so
      // collapsing them would silently remap real characters.
      case "gbk" | "gb2312" | "csgb2312" | "x-gbk" | "gb_2312-80" =>
        strictJdk(body, "GBK")
      case "gb18030" => strictJdk(body, "GB18030")
      case "big5" => strictJdk(body, "Big5")
      case "big5-hkscs" => strictJdk(body, "Big5-HKSCS")
      case "shift_jis" | "shift-jis" | "sjis" | "x-sjis" | "ms_kanji" =>
        strictJdk(body, "Shift_JIS")
      case "windows-31j" | "cp932" => strictJdk(body, "windows-31j")
      case "euc-jp" | "x-euc-jp" => strictJdk(body, "EUC-JP")
      case "euc-kr" | "ks_c_5601-1987" | "ksc_5601" | "korean" =>
        strictJdk(body, "EUC-KR")
      case "iso-2022-jp" | "csiso2022jp" => strictJdk(body, "ISO-2022-JP")
      // Single-byte non-Latin families (Cyrillic, Central European,
      // Greek, Turkish, Hebrew, Arabic, Thai, Baltic, Vietnamese,
      // Romanian, legacy Mac/DOS): WHATWG-registry labels routed to
      // the JDK charset carrying the registry's repertoire — see
      // [[HttpResponseExpr.SingleByteCharsets]]. Same strict decode +
      // latin-1 mislabel fallback as the multibyte families.
      case sb if HttpResponseExpr.SingleByteCharsets.contains(sb) =>
        strictJdk(body, HttpResponseExpr.SingleByteCharsets(sb))
      case "x-user-defined" =>
        // WHATWG: ASCII passes, 0x80-0xFF map to the U+F780-U+F7FF
        // private-use ramp (legacy custom-font pages); pure
        // arithmetic — no JDK table exists for this one
        val sb = new java.lang.StringBuilder(body.length)
        var k = 0
        while (k < body.length) {
          val c = body(k) & 0xff
          sb.append(if (c < 0x80) c.toChar else (0xf780 + (c - 0x80)).toChar)
          k += 1
        }
        sb.toString
      case "utf-16le" | "utf-16be" | "utf-16" =>
        // strip the BOM only when actually present — the charset may
        // come from the header with a BOM-less body (and a 0/1-byte
        // body must not make a parsed response collapse to unknown);
        // bare "utf-16" resolves its byte order from the BOM, else LE
        val beBom = body.length >= 2 && (body(0) & 0xff) == 0xfe &&
          (body(1) & 0xff) == 0xff
        val leBom = body.length >= 2 && (body(0) & 0xff) == 0xff &&
          (body(1) & 0xff) == 0xfe
        val be = cs == "utf-16be" || (cs == "utf-16" && beBom)
        val skip = if (beBom || leBom) 2 else 0
        new String(body, skip, body.length - skip,
          if (be) java.nio.charset.StandardCharsets.UTF_16BE
          else java.nio.charset.StandardCharsets.UTF_16LE)
      case _ => null // unsupported declared charset: no silent garbage
    }
  }

  /** Decode with the named JDK charset REPORTING malformed input and
    * unmappable sequences; a body that is not valid in its declared
    * charset (the mislabeled-page case) decodes as latin-1 instead —
    * byte-preserving, the same fallback the utf-8 path applies. */
  private def strictJdk(body: Array[Byte], jdkName: String): String =
    try {
      val dec = java.nio.charset.Charset.forName(jdkName).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(body)).toString
    } catch {
      case _: java.nio.charset.CharacterCodingException =>
        new String(body, "ISO-8859-1")
    }

  /** Strict UTF-8 validity scan (RFC 3629: no overlongs, no
    * surrogates, max U+10FFFF). */
  private def validUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation / overlong lead
      else {
        val n = if (c < 0xe0) 1 else if (c < 0xf0) 2
          else if (c < 0xf5) 3 else return false
        if (i + n > b.length - 1) return false // truncated sequence
        var k = 1
        var cp = c & (0x3f >> n)
        while (k <= n) {
          val cc = b(i + k) & 0xff
          if ((cc & 0xc0) != 0x80) return false
          cp = (cp << 6) | (cc & 0x3f)
          k += 1
        }
        // overlongs / surrogates / range
        if (n == 1 && cp < 0x80) return false
        if (n == 2 && (cp < 0x800 || (cp >= 0xd800 && cp <= 0xdfff)))
          return false
        if (n == 3 && (cp < 0x10000 || cp > 0x10ffff)) return false
        i += n + 1
      }
    }
    true
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HttpResponseExpr {

  /** WHATWG Encoding registry label → JDK charset for the single-byte
    * non-Latin families a multilingual crawl carries (the multibyte
    * CJK families live in the match above). The registry's folds are
    * honored where the web's de-facto repertoire is the windows
    * superset — `iso-8859-9`/`latin5` → windows-1254 and
    * `tis-620`/`iso-8859-11` → windows-874: real pages under those
    * labels use the C1 range for smart quotes/ellipses, which the ISO
    * tables map to control characters — while families the registry
    * keeps distinct stay distinct (iso-8859-2 vs windows-1250 differ
    * on letter positions, koi8-r vs -u on box-drawing rows). Every
    * value is a JDK-shipped decoder, run strict with the
    * byte-preserving latin-1 mislabel fallback. */
  private[multimodal] val SingleByteCharsets: Map[String, String] = {
    val m = Map.newBuilder[String, String]
    def add(jdk: String, labels: String*): Unit =
      labels.foreach(l => m += (l -> jdk))
    add("windows-1250", "windows-1250", "cp1250", "x-cp1250")
    add("windows-1251", "windows-1251", "cp1251", "x-cp1251")
    add("windows-1253", "windows-1253", "cp1253", "x-cp1253")
    add("windows-1254", "windows-1254", "cp1254", "x-cp1254",
      "iso-8859-9", "iso8859-9", "iso88599", "iso_8859-9",
      "iso_8859-9:1989", "iso-ir-148", "csisolatin5", "l5", "latin5")
    add("windows-1255", "windows-1255", "cp1255", "x-cp1255")
    add("windows-1256", "windows-1256", "cp1256", "x-cp1256")
    add("windows-1257", "windows-1257", "cp1257", "x-cp1257")
    add("windows-1258", "windows-1258", "cp1258", "x-cp1258")
    add("KOI8-R", "koi8-r", "koi", "koi8", "koi8_r", "cskoi8r")
    add("KOI8-U", "koi8-u", "koi8-ru")
    add("ISO-8859-2", "iso-8859-2", "iso8859-2", "iso88592",
      "iso_8859-2", "iso_8859-2:1987", "iso-ir-101", "csisolatin2",
      "l2", "latin2")
    add("ISO-8859-3", "iso-8859-3", "iso8859-3", "iso88593",
      "iso_8859-3", "iso_8859-3:1988", "iso-ir-109", "csisolatin3",
      "l3", "latin3")
    add("ISO-8859-4", "iso-8859-4", "iso8859-4", "iso88594",
      "iso_8859-4", "iso_8859-4:1988", "iso-ir-110", "csisolatin4",
      "l4", "latin4")
    add("ISO-8859-5", "iso-8859-5", "iso8859-5", "iso88595",
      "iso_8859-5", "iso_8859-5:1988", "iso-ir-144", "cyrillic",
      "csisolatincyrillic")
    add("ISO-8859-6", "iso-8859-6", "iso8859-6", "iso88596",
      "iso_8859-6", "iso_8859-6:1987", "iso-8859-6-e", "iso-8859-6-i",
      "iso-ir-127", "arabic", "asmo-708", "ecma-114", "csisolatinarabic")
    add("ISO-8859-7", "iso-8859-7", "iso8859-7", "iso88597",
      "iso_8859-7", "iso_8859-7:1987", "iso-ir-126", "greek", "greek8",
      "elot_928", "ecma-118", "sun_eu_greek", "csisolatingreek")
    add("ISO-8859-8", "iso-8859-8", "iso8859-8", "iso88598",
      "iso_8859-8", "iso_8859-8:1988", "iso-8859-8-e", "iso-8859-8-i",
      "iso-ir-138", "hebrew", "visual", "csisolatinhebrew")
    add("ISO-8859-13", "iso-8859-13", "iso8859-13", "iso885913")
    add("ISO-8859-15", "iso-8859-15", "iso8859-15", "iso885915",
      "iso_8859-15", "latin9", "l9", "csisolatin9")
    add("ISO-8859-16", "iso-8859-16")
    add("x-windows-874", "windows-874", "dos-874", "tis-620", "tis620",
      "iso-8859-11", "iso8859-11", "iso885911")
    add("IBM866", "ibm866", "866", "cp866", "csibm866")
    add("x-MacCyrillic", "x-mac-cyrillic", "x-mac-ukrainian")
    add("x-MacRoman", "macintosh", "csmacintosh", "mac", "x-mac-roman")
    m.result()
  }
}
