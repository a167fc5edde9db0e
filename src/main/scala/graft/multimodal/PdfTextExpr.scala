package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** pdf_text(payload): the document's extracted body text — the
  * pdftotext-shaped pass an LLM curation pipeline runs over the PDF
  * half of a crawl. NULL for non-PDF, encrypted, or structurally
  * hopeless payloads; never throws.
  *
  * On top of [[Pdf]]'s document skeleton this interprets the §9 text
  * machinery of every page's content stream:
  *
  *  - text blocks (BT/ET) with the show operators Tj, ', " and TJ
  *    (a TJ adjustment ≤ -180 thousandths of text space reads as an
  *    inter-word gap → one space, the classic extractor heuristic);
  *  - line structure from Td/TD (ty ≠ 0), T*, and Tm (a text-matrix
  *    reset whose y moved) → one '\n'; pages are separated by '\f'
  *    (the pdftotext convention);
  *  - Form XObjects (`/XObject … Do`) recurse with the form's own
  *    /Resources, depth-capped;
  *  - fonts via Tf from the page's (inherited) /Resources → a per-font
  *    byte→text decoder:
  *      * /ToUnicode CMaps win when present: codespacerange sets the
  *        code width, bfchar + both bfrange forms (incrementing
  *        UTF-16BE target, and the array form) map to Unicode;
  *      * simple fonts otherwise decode through their /Encoding —
  *        StandardEncoding (the default), WinAnsiEncoding,
  *        MacRomanEncoding, with /Differences applied through an
  *        Adobe-Glyph-List subset plus the uniXXXX/uXXXX[XX] forms;
  *      * Type0 fonts without a ToUnicode map carry opaque glyph ids
  *        (Identity-H) — undecodable by construction, skipped rather
  *        than emitted as garbage.
  *
  * Scale shape: a per-row map-side parse — one codegen'd scan, zero
  * shuffle; `pdf_text` over a binary column distributes exactly like
  * the image/audio decoders. Output capped at 16 MiB of text per
  * document (bomb guard). */
case class PdfTextExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "pdf_text"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      val s = PdfText.extract(b)
      if (s == null) null else UTF8String.fromString(s)
    } catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(newChild: Expression): PdfTextExpr =
    copy(child = newChild)
}

object PdfText {
  import Pdf._

  val MaxText = 16 << 20
  private val MaxFormDepth = 8

  /** null when the payload is not a readable, unencrypted PDF. */
  def extract(b: Array[Byte]): String = {
    val doc = Pdf.open(b)
    if (doc == null) return null
    // owner-password-only documents decrypt with the empty user
    // password (PdfCrypt); truly user-locked ones stay NULL
    if (doc.encrypted && !doc.unlocked) return null
    val pages = doc.pages()
    if (pages.isEmpty) return null
    val sb = new java.lang.StringBuilder(1024)
    val fontCache = mutable.AnyRefMap.empty[AnyRef, FontDec]
    var pi = 0
    while (pi < pages.length && sb.length < MaxText) {
      val (page, res) = pages(pi)
      if (pi > 0) sb.append('\f')
      val content = doc.pageContent(page)
      runContent(doc, content, res, sb, fontCache, 0)
      pi += 1
    }
    // trim a trailing newline the last line op left behind
    while (sb.length > 0 && (sb.charAt(sb.length - 1) == '\n' ||
        sb.charAt(sb.length - 1) == '\f')) sb.setLength(sb.length - 1)
    sb.toString
  }

  // -------------------------------------------------------- interpreter

  private def runContent(doc: Doc, content: Array[Byte], res: PDict,
      sb: java.lang.StringBuilder, fontCache: mutable.AnyRefMap[AnyRef, FontDec],
      formDepth: Int): Unit = {
    val lx = new Lexer(content)
    val operands = mutable.ArrayBuffer.empty[Obj]
    var font: FontDec = DefaultFont
    var inText = false
    var lastTmY = Double.NaN

    def newline(): Unit =
      if (sb.length > 0 && sb.charAt(sb.length - 1) != '\n' &&
          sb.charAt(sb.length - 1) != '\f') sb.append('\n')

    def show(o: Obj): Unit = o match {
      case PStr(bytes) => if (sb.length < MaxText) font.decode(bytes, sb)
      case _ =>
    }

    def num(o: Obj): Double = o match { case PNum(v) => v; case _ => 0.0 }

    while (!lx.atEnd && sb.length < MaxText) {
      lx.skipWs()
      if (!lx.atEnd) {
        val c = lx.peek
        if (c == '/' || c == '(' || c == '[' || c == '<' ||
            (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.') {
          try operands += lx.obj(0)
          catch { case _: Exception => lx.pos += 1 }
          if (operands.length > 256) operands.remove(0, operands.length - 256)
        } else {
          val op = lx.keyword()
          if (op == null) lx.pos += 1
          else op match {
            case "BT" => inText = true; lastTmY = Double.NaN
            case "ET" => inText = false
            case "Tf" =>
              if (operands.length >= 2) operands(operands.length - 2) match {
                case PName(fn) => font = lookupFont(doc, res, fn, fontCache)
                case _ =>
              }
            case "Td" if inText =>
              if (operands.length >= 2 && num(operands.last) != 0.0) newline()
            case "TD" if inText =>
              if (operands.length >= 2 && num(operands.last) != 0.0) newline()
            case "T*" if inText => newline()
            case "Tm" if inText =>
              if (operands.length >= 6) {
                val y = num(operands.last)
                if (!lastTmY.isNaN && math.abs(y - lastTmY) > 0.1) newline()
                lastTmY = y
              }
            case "Tj" if inText =>
              if (operands.nonEmpty) show(operands.last)
            case "'" if inText =>
              newline(); if (operands.nonEmpty) show(operands.last)
            case "\"" if inText =>
              newline(); if (operands.nonEmpty) show(operands.last)
            case "TJ" if inText =>
              if (operands.nonEmpty) operands.last match {
                case PArr(items) =>
                  items.foreach {
                    case s: PStr => show(s)
                    case PNum(v) =>
                      if (v <= -180 && sb.length > 0 &&
                          sb.charAt(sb.length - 1) != ' ' &&
                          sb.charAt(sb.length - 1) != '\n') sb.append(' ')
                    case _ =>
                  }
                case _ =>
              }
            case "Do" =>
              if (operands.nonEmpty && formDepth < MaxFormDepth)
                operands.last match {
                  case PName(xn) => runForm(doc, res, xn, sb, fontCache, formDepth)
                  case _ =>
                }
            case "BI" =>
              // inline image: skip bytes to the EI sentinel
              skipInlineImage(lx)
            case _ => // every other operator: operands consumed, no text effect
          }
          operands.clear()
        }
      }
    }
  }

  private def runForm(doc: Doc, res: PDict, name: String,
      sb: java.lang.StringBuilder, fontCache: mutable.AnyRefMap[AnyRef, FontDec],
      formDepth: Int): Unit = {
    val xobjs = doc.dict(res.get("XObject").getOrElse(PNull))
    doc.resolve(xobjs.get(name).getOrElse(PNull)) match {
      case s: PStream if s.dict.get("Subtype").contains(PName("Form")) =>
        val formRes = doc.resolve(s.dict.get("Resources").getOrElse(PNull)) match {
          case r: PDict => r
          case _ => res
        }
        val data = try doc.decodeStream(s) catch { case _: Exception => return }
        runContent(doc, data, formRes, sb, fontCache, formDepth + 1)
      case _ =>
    }
  }

  private def skipInlineImage(lx: Lexer): Unit = {
    // consume the param dict tokens until ID, then raw bytes until
    // whitespace-delimited EI
    var guard = 0
    var run = true
    while (run && guard < 4096) {
      val kw = try lx.obj(0) match { case _ => null } catch { case _: Exception => lx.keyword() }
      if (kw == "ID" || kw == null && lx.atEnd) run = false
      guard += 1
    }
    val b = lx.b
    var i = lx.pos
    val n = lx.end - 2
    while (i < n && !(b(i) == 'E' && b(i + 1) == 'I' &&
        (i + 2 >= lx.end || !isReg(b(i + 2) & 0xff)) &&
        i > 0 && isWsB(b(i - 1) & 0xff))) i += 1
    lx.pos = math.min(i + 2, lx.end)
  }

  private def isWsB(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isReg(c: Int): Boolean =
    !isWsB(c) && !"()<>[]{}/%".contains(c.toChar)

  // -------------------------------------------------------------- fonts

  sealed trait FontDec {
    def decode(bytes: Array[Byte], sb: java.lang.StringBuilder): Unit
  }

  /** No Tf seen (or unresolvable font): bytes are almost always
    * ASCII-ish simple-font codes — decode through StandardEncoding. */
  object DefaultFont extends FontDec {
    def decode(bytes: Array[Byte], sb: java.lang.StringBuilder): Unit =
      SimpleFont(Encodings.standard).decode(bytes, sb)
  }

  final case class SimpleFont(table: Array[String]) extends FontDec {
    def decode(bytes: Array[Byte], sb: java.lang.StringBuilder): Unit = {
      var i = 0
      while (i < bytes.length) {
        val s = table(bytes(i) & 0xff)
        if (s != null) sb.append(s)
        i += 1
      }
    }
  }

  /** Multi-byte (or ToUnicode-mapped single-byte) font: greedy
    * longest-code match over the declared code widths. */
  final case class CMapFont(map: Map[Int, String], widths: Array[Int]) extends FontDec {
    def decode(bytes: Array[Byte], sb: java.lang.StringBuilder): Unit = {
      var i = 0
      while (i < bytes.length) {
        var matched = false
        var wi = 0
        while (wi < widths.length && !matched) {
          val w = widths(wi)
          if (i + w <= bytes.length) {
            var code = 0
            var k = 0
            while (k < w) { code = (code << 8) | (bytes(i + k) & 0xff); k += 1 }
            map.get(code) match {
              case Some(s) => sb.append(s); i += w; matched = true
              case None =>
            }
          }
          wi += 1
        }
        if (!matched) i += math.max(1, widths.headOption.getOrElse(1)) // unmapped: skip a code
      }
    }
  }

  /** Identity-H with no ToUnicode: opaque glyph ids, nothing to emit. */
  object OpaqueFont extends FontDec {
    def decode(bytes: Array[Byte], sb: java.lang.StringBuilder): Unit = ()
  }

  private def lookupFont(doc: Doc, res: PDict, name: String,
      cache: mutable.AnyRefMap[AnyRef, FontDec]): FontDec = {
    val fonts = doc.dict(res.get("Font").getOrElse(PNull))
    val ref = fonts.get(name).getOrElse(PNull)
    cache.getOrElseUpdate(ref, buildFont(doc, doc.dict(ref)))
  }

  private def buildFont(doc: Doc, f: PDict): FontDec = {
    if (f.m.isEmpty) return DefaultFont
    val toUni = doc.resolve(f.get("ToUnicode").getOrElse(PNull)) match {
      case s: PStream =>
        try Some(parseCMap(doc.decodeStream(s))) catch { case _: Exception => None }
      case _ => None
    }
    val isType0 = f.get("Subtype").contains(PName("Type0"))
    toUni match {
      case Some((map, widths)) =>
        if (isType0 || widths.exists(_ > 1)) CMapFont(map, widths)
        else {
          // single-byte: overlay the CMap onto the encoding table
          val base = encodingTable(doc, f)
          val t = base.clone()
          map.foreach { case (code, s) => if (code < 256) t(code) = s }
          SimpleFont(t)
        }
      case None =>
        if (isType0) OpaqueFont
        else SimpleFont(encodingTable(doc, f))
    }
  }

  private def encodingTable(doc: Doc, f: PDict): Array[String] = {
    doc.resolve(f.get("Encoding").getOrElse(PNull)) match {
      case PName(n) => Encodings.byName(n)
      case d: PDict =>
        val base = d.get("BaseEncoding") match {
          case Some(PName(n)) => Encodings.byName(n)
          case _ => Encodings.standard
        }
        val t = base.clone()
        doc.resolve(d.get("Differences").getOrElse(PNull)) match {
          case PArr(items) =>
            var code = 0
            items.foreach {
              case PNum(v) => code = v.toInt
              case PName(g) =>
                if (code >= 0 && code < 256) {
                  t(code) = Encodings.glyphToUnicode(g)
                  code += 1
                }
              case _ =>
            }
          case _ =>
        }
        t
      case _ => Encodings.standard
    }
  }

  // --------------------------------------------------------- CMap parse

  /** ToUnicode CMap → (code → string, distinct code byte-widths,
    * widest first). */
  private def parseCMap(data: Array[Byte]): (Map[Int, String], Array[Int]) = {
    val lx = new Lexer(data)
    val map = Map.newBuilder[Int, String]
    val widths = mutable.SortedSet.empty[Int](Ordering.Int.reverse)

    def hexOf(o: Obj): Array[Byte] = o match {
      case PStr(b) => b
      case _ => null
    }
    def codeOf(b: Array[Byte]): Int = {
      var v = 0
      var i = 0
      while (i < b.length) { v = (v << 8) | (b(i) & 0xff); i += 1 }
      v
    }
    def utf16(b: Array[Byte]): String = new String(b, "UTF-16BE")

    val pending = mutable.ArrayBuffer.empty[Obj]
    var guard = 0
    while (!lx.atEnd && guard < (1 << 20)) {
      guard += 1
      lx.skipWs()
      if (!lx.atEnd) {
        val c = lx.peek
        if (c == '/' || c == '(' || c == '[' || c == '<' ||
            (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.') {
          try pending += lx.obj(0) catch { case _: Exception => lx.pos += 1 }
          if (pending.length > 1024) pending.remove(0, pending.length - 1024)
        } else lx.keyword() match {
          case "begincodespacerange" =>
            var run = true
            while (run && !lx.atEnd) {
              lx.skipWs()
              if (lx.peek == '<') {
                val lo = hexOf(lx.obj(0))
                lx.skipWs()
                if (lx.peek == '<') {
                  val hi = hexOf(lx.obj(0))
                  if (lo != null) widths += lo.length
                  val _ = hi
                } else run = false
              } else { lx.keyword(); run = false } // endcodespacerange
            }
          case "beginbfchar" =>
            var run = true
            while (run && !lx.atEnd) {
              lx.skipWs()
              if (lx.peek == '<') {
                val src = hexOf(lx.obj(0))
                lx.skipWs()
                val dst = try lx.obj(0) catch { case _: Exception => PNull }
                (src, dst) match {
                  case (s, PStr(d)) if s != null =>
                    map += codeOf(s) -> utf16(d)
                    widths += s.length
                  case _ =>
                }
              } else { lx.keyword(); run = false } // endbfchar
            }
          case "beginbfrange" =>
            var run = true
            while (run && !lx.atEnd) {
              lx.skipWs()
              if (lx.peek == '<') {
                val lo = hexOf(lx.obj(0))
                lx.skipWs()
                val hi = if (lx.peek == '<') hexOf(lx.obj(0)) else null
                lx.skipWs()
                val dst = try lx.obj(0) catch { case _: Exception => PNull }
                if (lo != null && hi != null) {
                  widths += lo.length
                  val loC = codeOf(lo); val hiC = codeOf(hi)
                  val span = math.min(hiC - loC, 65535)
                  dst match {
                    case PStr(d0) =>
                      var k = 0
                      while (k <= span) {
                        val d = d0.clone()
                        if (d.length >= 2) {
                          // increment the final UTF-16 code unit
                          val last = (((d(d.length - 2) & 0xff) << 8) |
                            (d(d.length - 1) & 0xff)) + k
                          d(d.length - 2) = ((last >> 8) & 0xff).toByte
                          d(d.length - 1) = (last & 0xff).toByte
                        }
                        map += (loC + k) -> utf16(d)
                        k += 1
                      }
                    case PArr(items) =>
                      var k = 0
                      while (k <= span && k < items.length) {
                        items(k) match {
                          case PStr(d) => map += (loC + k) -> utf16(d)
                          case _ =>
                        }
                        k += 1
                      }
                    case _ =>
                  }
                }
              } else { lx.keyword(); run = false } // endbfrange
            }
          case null => lx.pos += 1
          case _ =>
        }
      }
    }
    val w = if (widths.isEmpty) Array(1) else widths.toArray
    (map.result(), w)
  }
}
