package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** office_text(payload): body text from the ZIP-packaged document
  * family — struct<format, text> where format ∈ docx | pptx | xlsx |
  * odf | epub, NULL when the payload is not one of them. With
  * [[PdfTextExpr]] this closes the two big non-HTML document classes
  * a web crawl carries.
  *
  * Per format (all via [[Zip]] + the same minimal XML event scan —
  * tags, attributes, entity/CDATA text, the deterministic subset):
  *
  *  - docx (ECMA-376 WordprocessingML): `word/document.xml` — `w:t`
  *    runs, `w:p` paragraphs → '\n', `w:tab` → '\t', `w:br`/`w:cr`
  *    → '\n';
  *  - pptx (PresentationML): `ppt/slides/slideN.xml` in numeric
  *    order — `a:t` runs, `a:p` → '\n', slides separated by '\f';
  *  - xlsx (SpreadsheetML): `xl/sharedStrings.xml` `si` entries,
  *    then `xl/worksheets/sheetN.xml` in numeric order — cells
  *    resolve t="s" through the shared table, t="inlineStr" through
  *    `is`/`t`, numeric cells keep their raw `v`; cells join with
  *    '\t', rows with '\n', sheets with '\f';
  *  - odf (OpenDocument text/spreadsheet/presentation):
  *    `content.xml` inside `office:body` — `text:p`/`text:h` → '\n',
  *    `text:tab` → '\t', `text:line-break` → '\n';
  *  - epub (OCF/OPF): `META-INF/container.xml` names the OPF, whose
  *    manifest + spine order the XHTML chapters (fallback: every
  *    .x?html entry in archive order); chapters strip tags with
  *    p/div/li/h1-6/br/tr → '\n', script/style dropped, '\f' between
  *    chapters.
  *
  * Scale shape: per-row map-side parse, single scan, zero shuffle;
  * text capped at 16 MiB (bomb guard, [[PdfText.MaxText]] twin). */
case class OfficeTextExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "office_text"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      val r = OfficeText.extract(b)
      if (r == null) null
      else InternalRow(UTF8String.fromString(r._1), UTF8String.fromString(r._2))
    } catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(newChild: Expression): OfficeTextExpr =
    copy(child = newChild)
}

private[multimodal] object OfficeText {

  val MaxText = 16 << 20

  def extract(b: Array[Byte]): (String, String) = {
    val entries = Zip.entries(b)
    if (entries == null) return null
    val byName = entries.iterator.map(e => e.name -> e).toMap
    def data(n: String): Array[Byte] =
      byName.get(n).map(_.data).filter(_ != null).orNull

    if (byName.contains("word/document.xml")) {
      val d = data("word/document.xml")
      if (d == null) return null
      ("docx", docx(d))
    } else if (byName.contains("ppt/presentation.xml")) {
      val slides = numbered(entries, "ppt/slides/slide", ".xml")
      ("pptx", slides.map(e => pptxSlide(e.data)).filter(_ != null)
        .mkString("\f"))
    } else if (byName.contains("xl/workbook.xml")) {
      val shared = Option(data("xl/sharedStrings.xml"))
        .map(sharedStrings).getOrElse(Array.empty[String])
      val sheets = numbered(entries, "xl/worksheets/sheet", ".xml")
      ("xlsx", sheets.map(e => xlsxSheet(e.data, shared)).filter(_ != null)
        .mkString("\f"))
    } else if (byName.contains("content.xml")) {
      val mime = Option(data("mimetype")).map(new String(_, "UTF-8")).getOrElse("")
      if (!mime.startsWith("application/vnd.oasis.opendocument") &&
          mime.nonEmpty) return null
      val d = data("content.xml")
      if (d == null) return null
      ("odf", odf(d))
    } else if (byName.contains("META-INF/container.xml") ||
        entries.exists(e => e.name.endsWith(".xhtml") || e.name.endsWith(".html"))) {
      val chapters = epubChapters(entries, byName)
      if (chapters.isEmpty) return null
      ("epub", chapters.map(htmlText).mkString("\f"))
    } else null
  }

  private def numbered(entries: Array[Zip.Entry], prefix: String,
      suffix: String): Seq[Zip.Entry] =
    entries.filter(e => e.name.startsWith(prefix) && e.name.endsWith(suffix) &&
        e.data != null)
      .flatMap { e =>
        val mid = e.name.substring(prefix.length, e.name.length - suffix.length)
        if (mid.nonEmpty && mid.forall(_.isDigit)) Some((mid.toInt, e)) else None
      }.sortBy(_._1).map(_._2).toSeq

  // ----------------------------------------------------------- XML scan

  /** Minimal event scan: onTag(name, attrsRaw, selfClosing, isClose),
    * onText(decoded). Handles declarations, comments, CDATA, DOCTYPE. */
  private[multimodal] def scanXml(xml: Array[Byte],
      onTag: (String, String, Boolean, Boolean) => Unit,
      onText: String => Unit): Unit = {
    val s = new String(xml, "UTF-8")
    var i = 0
    val n = s.length
    val text = new java.lang.StringBuilder(64)
    def flushText(): Unit = {
      if (text.length > 0) { onText(decodeEntities(text.toString)); text.setLength(0) }
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          flushText()
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (s.startsWith("<![CDATA[", i)) {
          val e = s.indexOf("]]>", i + 9)
          text.append(s, i + 9, if (e < 0) n else e)
          i = if (e < 0) n else e + 3
        } else if (s.startsWith("<?", i) || s.startsWith("<!", i)) {
          flushText()
          val e = s.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else {
          flushText()
          val e = tagEnd(s, i + 1)
          if (e < 0) i = n
          else {
            var body = s.substring(i + 1, e)
            val isClose = body.startsWith("/")
            if (isClose) body = body.substring(1)
            val selfClosing = body.endsWith("/")
            if (selfClosing) body = body.substring(0, body.length - 1)
            val sp = body.indexWhere(ch => ch == ' ' || ch == '\t' ||
              ch == '\n' || ch == '\r')
            val (name, attrs) =
              if (sp < 0) (body.trim, "")
              else (body.substring(0, sp), body.substring(sp + 1))
            if (name.nonEmpty) onTag(name, attrs, selfClosing, isClose)
            i = e + 1
          }
        }
      } else { text.append(c); i += 1 }
    }
    flushText()
  }

  /** Find the '>' ending a tag, skipping quoted attribute values. */
  private def tagEnd(s: String, from: Int): Int = {
    var i = from
    var quote = 0.toChar
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i
      i += 1
    }
    -1
  }

  private[multimodal] def attr(attrs: String, name: String): String = {
    var i = 0
    while (i >= 0 && i < attrs.length) {
      i = attrs.indexOf(name + "=", i)
      if (i >= 0) {
        val before = if (i == 0) ' ' else attrs.charAt(i - 1)
        val vi = i + name.length + 1
        if ((before == ' ' || before == '\t' || before == '\n' || before == '\r') &&
            vi < attrs.length &&
            (attrs.charAt(vi) == '"' || attrs.charAt(vi) == '\'')) {
          val q = attrs.charAt(vi)
          val e = attrs.indexOf(q, vi + 1)
          if (e > vi) return decodeEntities(attrs.substring(vi + 1, e))
        }
        i += 1
      }
    }
    null
  }

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val e = s.indexOf(';', i + 1)
        if (e > i && e - i <= 10) {
          val ent = s.substring(i + 1, e)
          val rep = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try new String(Character.toChars(Integer.parseInt(ent.substring(2), 16)))
              catch { case _: Exception => null }
            case _ if ent.startsWith("#") =>
              try new String(Character.toChars(Integer.parseInt(ent.substring(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = e + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def local(name: String): String = {
    val k = name.indexOf(':')
    if (k < 0) name else name.substring(k + 1)
  }

  private def trimJoin(sb: java.lang.StringBuilder): String = {
    while (sb.length > 0 && (sb.charAt(sb.length - 1) == '\n')) sb.setLength(sb.length - 1)
    sb.toString
  }

  // --------------------------------------------------------------- docx

  private def docx(xml: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(1024)
    var inT = false
    scanXml(xml, (name, _, selfClosing, isClose) => {
      if (sb.length < MaxText) name match {
        case "w:t" => inT = !isClose && !selfClosing
        case "w:p" => if (isClose) sb.append('\n')
        case "w:tab" => if (!isClose) sb.append('\t')
        case "w:br" | "w:cr" => if (!isClose) sb.append('\n')
        case _ =>
      }
    }, t => if (inT && sb.length < MaxText) sb.append(t))
    trimJoin(sb)
  }

  // --------------------------------------------------------------- pptx

  private def pptxSlide(xml: Array[Byte]): String = {
    if (xml == null) return null
    val sb = new java.lang.StringBuilder(512)
    var inT = false
    scanXml(xml, (name, _, selfClosing, isClose) => {
      if (sb.length < MaxText) name match {
        case "a:t" => inT = !isClose && !selfClosing
        case "a:p" => if (isClose) sb.append('\n')
        case "a:br" => if (!isClose) sb.append('\n')
        case _ =>
      }
    }, t => if (inT && sb.length < MaxText) sb.append(t))
    trimJoin(sb)
  }

  // --------------------------------------------------------------- xlsx

  private def sharedStrings(xml: Array[Byte]): Array[String] = {
    val out = Vector.newBuilder[String]
    val cur = new java.lang.StringBuilder(32)
    var inSi = false
    var inT = false
    scanXml(xml, (name, _, selfClosing, isClose) => {
      local(name) match {
        case "si" =>
          if (isClose) { out += cur.toString; cur.setLength(0); inSi = false }
          else inSi = true
        case "t" => inT = inSi && !isClose && !selfClosing
        case _ =>
      }
    }, t => if (inT) cur.append(t))
    out.result().toArray
  }

  private def xlsxSheet(xml: Array[Byte], shared: Array[String]): String = {
    if (xml == null) return null
    val sb = new java.lang.StringBuilder(512)
    var cellType: String = null
    var inV = false
    var inIsT = false
    var firstCellInRow = true
    val cur = new java.lang.StringBuilder(16)
    scanXml(xml, (name, attrs, selfClosing, isClose) => {
      if (sb.length < MaxText) local(name) match {
        case "row" =>
          if (isClose) { sb.append('\n'); firstCellInRow = true }
        case "c" =>
          if (!isClose) {
            cellType = attr(attrs, "t")
            cur.setLength(0)
            if (!firstCellInRow) sb.append('\t')
            firstCellInRow = false
          } else {
            val v = cur.toString
            val resolved =
              if (cellType == "s") {
                val idx = try v.trim.toInt catch { case _: Exception => -1 }
                if (idx >= 0 && idx < shared.length) shared(idx) else ""
              } else v
            sb.append(resolved)
          }
        case "v" => inV = !isClose && !selfClosing
        case "t" => inIsT = !isClose && !selfClosing
        case _ =>
      }
    }, t => if ((inV || inIsT) && sb.length < MaxText) cur.append(t))
    trimJoin(sb)
  }

  // ---------------------------------------------------------------- odf

  private def odf(xml: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(1024)
    var bodyDepth = 0
    var pDepth = 0 // text collects only inside body paragraphs/headings
    scanXml(xml, (name, _, selfClosing, isClose) => {
      if (sb.length < MaxText) local(name) match {
        case "body" =>
          if (isClose) bodyDepth = math.max(0, bodyDepth - 1)
          else if (!selfClosing) bodyDepth += 1
        case "p" | "h" =>
          if (isClose) {
            pDepth = math.max(0, pDepth - 1)
            if (bodyDepth > 0) sb.append('\n')
          } else if (!selfClosing && bodyDepth > 0) pDepth += 1
        case "tab" => if (!isClose && pDepth > 0) sb.append('\t')
        case "line-break" => if (!isClose && pDepth > 0) sb.append('\n')
        case _ =>
      }
    }, t => if (bodyDepth > 0 && pDepth > 0 && sb.length < MaxText) sb.append(t))
    trimJoin(sb)
  }

  // --------------------------------------------------------------- epub

  private def epubChapters(entries: Array[Zip.Entry],
      byName: Map[String, Zip.Entry]): Seq[Array[Byte]] = {
    val container = byName.get("META-INF/container.xml").map(_.data).filter(_ != null)
    val viaOpf: Seq[Array[Byte]] = container.toSeq.flatMap { c =>
      var opfPath: String = null
      scanXml(c, (name, attrs, _, isClose) => {
        if (!isClose && local(name) == "rootfile" && opfPath == null) {
          val p = attr(attrs, "full-path")
          if (p != null) opfPath = p
        }
      }, _ => ())
      byName.get(if (opfPath == null) "" else opfPath)
        .map(_.data).filter(_ != null).toSeq.flatMap { opf =>
          val dir = {
            val k = opfPath.lastIndexOf('/')
            if (k < 0) "" else opfPath.substring(0, k + 1)
          }
          val hrefById = scala.collection.mutable.Map.empty[String, String]
          val spine = Vector.newBuilder[String]
          scanXml(opf, (name, attrs, _, isClose) => {
            if (!isClose) local(name) match {
              case "item" =>
                val id = attr(attrs, "id"); val href = attr(attrs, "href")
                if (id != null && href != null) hrefById(id) = href
              case "itemref" =>
                val idref = attr(attrs, "idref")
                if (idref != null) spine += idref
              case _ =>
            }
          }, _ => ())
          spine.result().flatMap(id => hrefById.get(id))
            .flatMap(href => byName.get(dir + href))
            .map(_.data).filter(_ != null)
        }
    }
    if (viaOpf.nonEmpty) viaOpf
    else entries.filter(e => (e.name.endsWith(".xhtml") || e.name.endsWith(".html")) &&
      e.data != null).map(_.data).toSeq
  }

  /** Tag-stripping text for XHTML chapters: block tags break lines,
    * script/style content dropped. */
  private[multimodal] def htmlText(xml: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(1024)
    var skip = 0
    val blocks = Set("p", "div", "li", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
      "br", "section", "article", "blockquote", "td")
    val skipped = Set("script", "style", "head", "title")
    scanXml(xml, (name, _, _, isClose) => {
      val n = local(name).toLowerCase
      if (skipped.contains(n)) skip = math.max(0, skip + (if (isClose) -1 else 1))
      else if (sb.length < MaxText && blocks.contains(n) &&
          (isClose || n == "br") && sb.length > 0 &&
          sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    }, t => {
      if (skip <= 0 && sb.length < MaxText) {
        val tt = t.replaceAll("\\s+", " ")
        if (tt.nonEmpty && tt != " ") sb.append(tt)
      }
    })
    trimJoin(sb)
  }
}
