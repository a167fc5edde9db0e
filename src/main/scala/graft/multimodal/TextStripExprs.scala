package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** html_text(html): tag-stripped text from an HTML/XHTML string —
  * the [[OfficeText.htmlText]] pass (block tags break lines,
  * script/style/head dropped, entities decoded, whitespace
  * collapsed) exposed as a first-class column so the crawl chain
  * composes as `html_text(http_response(p).text)` in one map-side
  * projection. NULL in, NULL out; never throws. */
case class HtmlTextExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "html_text"

  override protected def nullSafeEval(input: Any): Any = {
    try {
      val s = input.asInstanceOf[UTF8String].getBytes
      UTF8String.fromString(OfficeText.htmlText(s))
    } catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlTextExpr =
    copy(child = newChild)
}

/** markdown_text(md): CommonMark-shaped markdown reduced to plain
  * text — the normalization a README/docs corpus runs before quality
  * scoring and dedup (markup tokens otherwise skew every
  * length/punctuation/ngram statistic downstream):
  *
  *  - ATX headings lose their `#` fences, setext underlines drop;
  *  - emphasis/strike markers (`*` `_` `~~`) unwrap, inline code
  *    spans keep their content, fenced/indented code blocks keep
  *    their code but lose the ``` fences (and the info string);
  *  - links/images `[text](url)` / `![alt](url)` keep text/alt and
  *    drop the url, reference-style `[text][id]` likewise, link
  *    definition lines drop entirely, autolinks `<http://…>` keep
  *    the url;
  *  - list bullets/numbers and blockquote `>` prefixes strip,
  *    table pipes become tabs (separator rows drop), horizontal
  *    rules drop, raw HTML tags strip, entities decode.
  *
  * Line structure is preserved (one output line per source line;
  * dropped lines vanish). NULL in, NULL out; never throws. */
case class MarkdownTextExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "markdown_text"

  override protected def nullSafeEval(input: Any): Any = {
    try UTF8String.fromString(
      Markdown.toText(input.asInstanceOf[UTF8String].toString))
    catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(newChild: Expression): MarkdownTextExpr =
    copy(child = newChild)
}

private[multimodal] object Markdown {

  def toText(md: String): String = {
    val out = new java.lang.StringBuilder(md.length)
    val lines = md.split("\n", -1)
    var inFence = false
    var i = 0
    while (i < lines.length) {
      val raw = lines(i).stripSuffix("\r")
      val trimmed = raw.trim
      val fenceMark = trimmed.startsWith("```") || trimmed.startsWith("~~~")
      if (fenceMark) {
        inFence = !inFence // the fence line itself drops
      } else if (inFence) {
        out.append(raw).append('\n') // code kept verbatim
      } else if (isLinkDef(trimmed) || isHr(trimmed) || isTableSep(trimmed)) {
        // dropped lines
      } else {
        var line = raw
        // setext underline: drop if the whole line is = or - (len>=2)
        if (trimmed.length >= 2 &&
            (trimmed.forall(_ == '=') || trimmed.forall(_ == '-'))) {
          // covered by isHr for ---; === drops here
        } else {
          // blockquote prefixes
          line = line.replaceAll("^\\s{0,3}(>\\s?)+", "")
          // ATX headings
          line = line.replaceAll("^\\s{0,3}#{1,6}\\s+", "")
            .replaceAll("\\s+#+\\s*$", "")
          // list bullets / numbers
          line = line.replaceAll("^\\s*[-*+]\\s+", "")
            .replaceAll("^\\s*\\d{1,3}[.)]\\s+", "")
          line = inline(line)
          out.append(line).append('\n')
        }
      }
      i += 1
    }
    // trim trailing newline(s)
    var e = out.length
    while (e > 0 && out.charAt(e - 1) == '\n') e -= 1
    out.substring(0, e)
  }

  private def isLinkDef(t: String): Boolean =
    t.matches("^\\[[^\\]]+\\]:\\s*\\S+.*$")
  private def isHr(t: String): Boolean =
    t.matches("^(\\*\\s*){3,}$|^(-\\s*){3,}$|^(_\\s*){3,}$")
  private def isTableSep(t: String): Boolean =
    t.matches("^\\|?\\s*:?-{2,}:?\\s*(\\|\\s*:?-{2,}:?\\s*)+\\|?$")

  private def inline(s0: String): String = {
    var s = s0
    // images then links (inline + reference style)
    s = s.replaceAll("!\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    s = s.replaceAll("\\[([^\\]]+)\\]\\([^)]*\\)", "$1")
    s = s.replaceAll("\\[([^\\]]+)\\]\\[[^\\]]*\\]", "$1")
    // autolinks keep the url
    s = s.replaceAll("<(https?://[^>]+)>", "$1")
    // raw html tags
    s = s.replaceAll("</?[A-Za-z][^>]*>", "")
    // inline code spans: keep content
    s = s.replaceAll("`([^`]*)`", "$1")
    // emphasis / strong / strike markers around words
    s = s.replaceAll("(\\*\\*|__)(.+?)\\1", "$2")
    s = s.replaceAll("(?<![\\w*])\\*([^*\\s][^*]*)\\*(?![\\w*])", "$1")
    s = s.replaceAll("(?<![\\w_])_([^_\\s][^_]*)_(?![\\w_])", "$1")
    s = s.replaceAll("~~(.+?)~~", "$1")
    // table pipes -> tabs (outer pipes drop)
    if (s.contains("|")) {
      val body = s.trim.stripPrefix("|").stripSuffix("|")
      if (body.contains("|")) s = body.split("\\|", -1).map(_.trim).mkString("\t")
    }
    // entities
    s = s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
    s
  }
}
