package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** email_message(payload): RFC 5322/2045 message parsing — the mail
  * half of a text corpus (list archives, dumps, the mbox web).
  * Returns struct<from, to, subject, date, message_id, content_type,
  * text, html, attachments: array<struct<filename, content_type,
  * size, data>>>, NULL when the payload is not a message.
  *
  *  - headers: CRLF/LF tolerant, folded continuations unfolded,
  *    RFC 2047 encoded-words (=?charset?B/Q?…?=) decoded through the
  *    JDK charsets (adjacent words joined per spec, the
  *    underscore-space Q rule);
  *  - bodies: Content-Transfer-Encoding 7bit/8bit/binary/
  *    quoted-printable (incl. soft breaks) / base64, then the
  *    declared charset (latin-1 fallback);
  *  - multipart recursion (boundary from the Content-Type
  *    parameter, quoted or bare): `text` prefers the first
  *    text/plain leaf anywhere (multipart/alternative semantics),
  *    `html` the first text/html; parts with a filename or an
  *    attachment Content-Disposition land in `attachments` with
  *    their DECODED bytes; message/rfc822 parts recurse;
  *  - the gate: a plausible header block (a known header name
  *    before the first blank line) — arbitrary text is NULL.
  *
  * Depth 8, 256 parts, 64 MiB decoded (bomb guards). Scale shape:
  * per-row map-side parse, single scan, zero shuffle. Pair with
  * [[MboxMessagesExpr]] to explode archive files into messages. */
case class EmailMessageExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = Email.schema
  override def nullable: Boolean = true
  override def prettyName: String = "email_message"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try Email.parse(b) catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(newChild: Expression): EmailMessageExpr =
    copy(child = newChild)
}

/** mbox_messages(payload): split a unix mbox into its member
  * messages (array<binary>) on the classic `From ` separator lines
  * ("From " at line start after a blank line or file start); the
  * separator line itself is dropped, `>From ` unquoting applied to
  * body lines. NULL when no separator opens the payload. */
case class MboxMessagesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mbox_messages"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      val ms = Email.mboxSplit(b)
      if (ms == null) null else new GenericArrayData(ms.toArray[Any])
    } catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(newChild: Expression): MboxMessagesExpr =
    copy(child = newChild)
}

private[multimodal] object Email {

  val MaxDecoded = 64 << 20
  val MaxParts = 256
  val MaxDepth = 8

  val attachmentType: StructType = StructType(Seq(
    StructField("filename", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("size", LongType, nullable = false),
    StructField("data", BinaryType, nullable = true)))

  val schema: StructType = StructType(Seq(
    StructField("from", StringType, nullable = true),
    StructField("to", StringType, nullable = true),
    StructField("subject", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("message_id", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("html", StringType, nullable = true),
    StructField("attachments", ArrayType(attachmentType, containsNull = false),
      nullable = false)))

  private val KnownHeaders = Set("from", "to", "subject", "date", "received",
    "return-path", "message-id", "mime-version", "content-type", "cc",
    "delivered-to", "reply-to", "sender", "x-mailer", "list-id")

  // ------------------------------------------------------------- headers

  /** (headers in order, bodyOffset); header names lowercased. */
  private def splitHeaders(b: Array[Byte], off: Int,
      end: Int): (Vector[(String, String)], Int) = {
    val out = Vector.newBuilder[(String, String)]
    var i = off
    var curName: String = null
    val curVal = new java.lang.StringBuilder(64)
    var bodyOff = end
    var done = false
    while (!done && i < end) {
      // find line end
      var e = i
      while (e < end && b(e) != '\n') e += 1
      val lineEnd = if (e > i && b(e - 1) == '\r') e - 1 else e
      if (lineEnd == i) { // blank line: body follows
        bodyOff = math.min(e + 1, end)
        done = true
      } else if ((b(i) == ' ' || b(i) == '\t') && curName != null) {
        curVal.append(' ')
        curVal.append(new String(b, i, lineEnd - i, "ISO-8859-1").trim)
      } else {
        if (curName != null) out += curName -> curVal.toString
        curName = null; curVal.setLength(0)
        var c = i
        while (c < lineEnd && b(c) != ':') c += 1
        if (c < lineEnd) {
          curName = new String(b, i, c - i, "ISO-8859-1").trim
            .toLowerCase(java.util.Locale.ROOT)
          curVal.append(new String(b, c + 1, lineEnd - c - 1, "ISO-8859-1").trim)
        }
      }
      i = e + 1
      if (i >= end && !done) bodyOff = end
    }
    if (curName != null) out += curName -> curVal.toString
    (out.result(), bodyOff)
  }

  /** RFC 2047 encoded-words; adjacent words joined without the
    * intervening whitespace, Q's '_' = space. */
  def decodeHeader(v: String): String = {
    if (!v.contains("=?")) return v
    val re = "=\\?([^?]+)\\?([bBqQ])\\?([^?]*)\\?=".r
    val sb = new StringBuilder
    var last = 0
    var lastWasWord = false
    for (m <- re.findAllMatchIn(v)) {
      val between = v.substring(last, m.start)
      if (!(lastWasWord && between.trim.isEmpty)) sb.append(between)
      val cs = try java.nio.charset.Charset.forName(m.group(1))
        catch { case _: Exception => java.nio.charset.StandardCharsets.ISO_8859_1 }
      val payload = m.group(3)
      val decoded = try {
        val bytes =
          if (m.group(2).equalsIgnoreCase("b"))
            java.util.Base64.getMimeDecoder.decode(payload)
          else qpDecode(payload.replace('_', ' ').getBytes("ISO-8859-1"),
            header = true)
        new String(bytes, cs)
      } catch { case _: Exception => m.matched }
      sb.append(decoded)
      last = m.end
      lastWasWord = true
    }
    sb.append(v.substring(last))
    sb.toString
  }

  // ------------------------------------------------------------ decoding

  private def qpDecode(b: Array[Byte], header: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c == '=' && i + 2 < b.length + 1) {
        if (i + 1 < b.length && (b(i + 1) == '\r' || b(i + 1) == '\n')) {
          // soft break: swallow the line end
          i += (if (i + 2 < b.length && b(i + 1) == '\r' && b(i + 2) == '\n') 3 else 2)
        } else if (i + 2 < b.length) {
          val h = Character.digit(b(i + 1), 16)
          val l = Character.digit(b(i + 2), 16)
          if (h >= 0 && l >= 0) { out.write((h << 4) | l); i += 3 }
          else { out.write(c); i += 1 }
        } else { out.write(c); i += 1 }
      } else { out.write(c); i += 1 }
    }
    val _ = header
    out.toByteArray
  }

  private def decodeBody(b: Array[Byte], off: Int, end: Int,
      cte: String): Array[Byte] = {
    val raw = java.util.Arrays.copyOfRange(b, off, math.max(off, end))
    val enc = if (cte == null) "" else cte.trim.toLowerCase(java.util.Locale.ROOT)
    enc match {
      case "base64" =>
        try {
          val d = java.util.Base64.getMimeDecoder.decode(
            new String(raw, "US-ASCII").replaceAll("[^A-Za-z0-9+/=]", ""))
          if (d.length > MaxDecoded) d.take(MaxDecoded) else d
        } catch { case _: Exception => Array.empty[Byte] }
      case "quoted-printable" => qpDecode(raw, header = false)
      case _ => raw
    }
  }

  private def charsetOf(contentType: String): java.nio.charset.Charset = {
    val cs = param(contentType, "charset")
    if (cs == null) java.nio.charset.StandardCharsets.UTF_8
    else try java.nio.charset.Charset.forName(cs.trim)
    catch { case _: Exception => java.nio.charset.StandardCharsets.ISO_8859_1 }
  }

  /** A Content-Type/Disposition parameter, quoted or bare. */
  def param(header: String, name: String): String = {
    if (header == null) return null
    val lower = header.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i >= 0) {
      i = lower.indexOf(name + "=", i)
      if (i < 0) return null
      val before = if (i == 0) ';' else lower.charAt(i - 1)
      if (before == ';' || before == ' ' || before == '\t') {
        var s = i + name.length + 1
        if (s < header.length && header.charAt(s) == '"') {
          val e = header.indexOf('"', s + 1)
          return if (e < 0) header.substring(s + 1) else header.substring(s + 1, e)
        }
        var e = s
        while (e < header.length && header.charAt(e) != ';' &&
            header.charAt(e) != ' ' && header.charAt(e) != '\t') e += 1
        return header.substring(s, e)
      }
      i += 1
    }
    null
  }

  // -------------------------------------------------------------- parse

  private final class Acc {
    var text: String = null
    var html: String = null
    val attachments = Vector.newBuilder[InternalRow]
    var parts = 0
  }

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    val (headers, bodyOff) = splitHeaders(b, 0, b.length)
    if (headers.isEmpty ||
        !headers.exists(h => KnownHeaders.contains(h._1))) return null
    val acc = new Acc
    walkPart(b, headers, bodyOff, b.length, acc, 0)
    def h(n: String): UTF8String = headers.find(_._1 == n)
      .map(v => UTF8String.fromString(decodeHeader(v._2))).orNull
    InternalRow(
      h("from"), h("to"), h("subject"), h("date"), h("message-id"),
      headers.find(_._1 == "content-type")
        .map(v => UTF8String.fromString(v._2.split(";")(0).trim
          .toLowerCase(java.util.Locale.ROOT))).orNull,
      if (acc.text == null) null else UTF8String.fromString(acc.text),
      if (acc.html == null) null else UTF8String.fromString(acc.html),
      new GenericArrayData(acc.attachments.result().toArray[Any]))
  }

  private def walkPart(b: Array[Byte], headers: Vector[(String, String)],
      off: Int, end: Int, acc: Acc, depth: Int): Unit = {
    if (depth > MaxDepth || acc.parts > MaxParts) return
    acc.parts += 1
    val ct = headers.find(_._1 == "content-type").map(_._2).orNull
    val mime = if (ct == null) "text/plain"
      else ct.split(";")(0).trim.toLowerCase(java.util.Locale.ROOT)
    val cte = headers.find(_._1 == "content-transfer-encoding").map(_._2).orNull
    val disp = headers.find(_._1 == "content-disposition").map(_._2).orNull
    val filename = {
      val f = param(disp, "filename")
      if (f != null) decodeHeader(f) else {
        val n = param(ct, "name")
        if (n != null) decodeHeader(n) else null
      }
    }
    val isAttachment = filename != null ||
      (disp != null && disp.trim.toLowerCase(java.util.Locale.ROOT)
        .startsWith("attachment"))

    if (mime.startsWith("multipart/")) {
      val boundary = param(ct, "boundary")
      if (boundary == null) return
      val delim = ("--" + boundary).getBytes("ISO-8859-1")
      // find each delimiter line; sections between successive
      // delimiters are parts (the terminal --boundary-- ends it)
      var positions = Vector.empty[Int]
      var i = off
      var terminal = end
      while (i >= 0 && i < end) {
        i = indexOfLine(b, delim, i, end)
        if (i >= 0) {
          val after = i + delim.length
          if (after + 1 < end && b(after) == '-' && b(after + 1) == '-') {
            terminal = i
            i = -1
          } else {
            positions :+= i
            i = after
          }
        }
      }
      var k = 0
      while (k < positions.length) {
        val partStart = skipLine(b, positions(k) + delim.length, end)
        val partEnd0 = if (k + 1 < positions.length) positions(k + 1) else terminal
        // strip the CRLF that belongs to the delimiter line
        var partEnd = partEnd0
        if (partEnd > partStart && b(partEnd - 1) == '\n') partEnd -= 1
        if (partEnd > partStart && b(partEnd - 1) == '\r') partEnd -= 1
        val (ph, pBodyOff) = splitHeaders(b, partStart, partEnd)
        walkPart(b, ph, pBodyOff, partEnd, acc, depth + 1)
        k += 1
      }
    } else if (mime == "message/rfc822" && !isAttachment) {
      val (ih, iOff) = splitHeaders(b, off, end)
      walkPart(b, ih, iOff, end, acc, depth + 1)
    } else {
      val data = decodeBody(b, off, end, cte)
      if (isAttachment) {
        if (acc.attachments.knownSize < 64)
          acc.attachments += InternalRow(
            if (filename == null) null else UTF8String.fromString(filename),
            if (ct == null) null else UTF8String.fromString(mime),
            data.length.toLong, data)
      } else if (mime == "text/plain" && acc.text == null) {
        acc.text = new String(data, charsetOf(ct)).stripLineEnd
      } else if (mime == "text/html" && acc.html == null) {
        acc.html = new String(data, charsetOf(ct)).stripLineEnd
      } else if (isAttachment || mime.startsWith("application/") ||
          mime.startsWith("image/") || mime.startsWith("audio/")) {
        // unnamed binary leaf: still an attachment, anonymous
        acc.attachments += InternalRow(null,
          if (ct == null) null else UTF8String.fromString(mime),
          data.length.toLong, data)
      }
    }
  }

  private def indexOfLine(b: Array[Byte], needle: Array[Byte], from: Int,
      end: Int): Int = {
    var i = from
    val n = end - needle.length
    while (i <= n) {
      if ((i == 0 || b(i - 1) == '\n') && startsWith(b, i, needle)) return i
      i += 1
    }
    -1
  }

  private def startsWith(b: Array[Byte], at: Int, needle: Array[Byte]): Boolean = {
    var k = 0
    while (k < needle.length) {
      if (b(at + k) != needle(k)) return false
      k += 1
    }
    true
  }

  private def skipLine(b: Array[Byte], from: Int, end: Int): Int = {
    var i = from
    while (i < end && b(i) != '\n') i += 1
    math.min(i + 1, end)
  }

  // ---------------------------------------------------------------- mbox

  def mboxSplit(b: Array[Byte]): Vector[Array[Byte]] = {
    if (b == null || b.length < 6) return null
    val sep = "From ".getBytes("ISO-8859-1")
    if (!startsWith(b, 0, sep)) return null
    var starts = Vector(0)
    var i = 1
    while (i < b.length - 5) {
      if (b(i - 1) == '\n' && startsWith(b, i, sep) &&
          (i < 2 || b(i - 2) == '\n' || (b(i - 2) == '\r' && i >= 3 && b(i - 3) == '\n')))
        starts :+= i
      i += 1
    }
    starts.zipAll(starts.drop(1), 0, b.length).map { case (s, e) =>
      val msgStart = skipLine(b, s, e) // drop the "From ..." separator line
      var msgEnd = e
      // drop the blank line that precedes the next separator
      if (msgEnd > msgStart && b(msgEnd - 1) == '\n') msgEnd -= 1
      if (msgEnd > msgStart && b(msgEnd - 1) == '\r') msgEnd -= 1
      val raw = java.util.Arrays.copyOfRange(b, msgStart, math.max(msgStart, msgEnd))
      unquoteFrom(raw)
    }
  }

  /** mbox body lines starting ">From " were quoted by the writer. */
  private def unquoteFrom(m: Array[Byte]): Array[Byte] = {
    val needle = ">From ".getBytes("ISO-8859-1")
    var has = false
    var i = 0
    while (i < m.length - 6 && !has) {
      if ((i == 0 || m(i - 1) == '\n') && startsWith(m, i, needle)) has = true
      i += 1
    }
    if (!has) return m
    val out = new java.io.ByteArrayOutputStream(m.length)
    i = 0
    while (i < m.length) {
      if ((i == 0 || m(i - 1) == '\n') && i + 6 <= m.length &&
          startsWith(m, i, needle)) i += 1 // drop the quoting '>'
      out.write(m(i)); i += 1
    }
    out.toByteArray
  }
}
