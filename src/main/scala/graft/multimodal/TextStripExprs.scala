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

  // precompiled: replaceAll would recompile per row otherwise
  private val PQuote = java.util.regex.Pattern.compile("^\\s{0,3}(>\\s?)+")
  private val PAtx = java.util.regex.Pattern.compile("^\\s{0,3}#{1,6}\\s+")
  private val PAtxTail = java.util.regex.Pattern.compile("\\s+#+\\s*$")
  private val PBullet = java.util.regex.Pattern.compile("^\\s*[-*+]\\s+")
  private val PNumber = java.util.regex.Pattern.compile("^\\s*\\d{1,3}[.)]\\s+")
  private val PImage = java.util.regex.Pattern.compile("!\\[([^\\]]*)\\]\\([^)]*\\)")
  private val PLink = java.util.regex.Pattern.compile("\\[([^\\]]+)\\]\\([^)]*\\)")
  private val PRefLink = java.util.regex.Pattern.compile("\\[([^\\]]+)\\]\\[[^\\]]*\\]")
  private val PAuto = java.util.regex.Pattern.compile("<(https?://[^>]+)>")
  private val PHtml = java.util.regex.Pattern.compile("</?[A-Za-z][^>]*>")
  private val PCode = java.util.regex.Pattern.compile("`([^`]*)`")
  private val PStrong = java.util.regex.Pattern.compile("(\\*\\*|__)(.+?)\\1")
  private val PEmphA = java.util.regex.Pattern.compile(
    "(?<![\\w*])\\*([^*\\s][^*]*)\\*(?![\\w*])")
  private val PEmphU = java.util.regex.Pattern.compile(
    "(?<![\\w_])_([^_\\s][^_]*)_(?![\\w_])")
  private val PStrike = java.util.regex.Pattern.compile("~~(.+?)~~")
  private val PLinkDef = java.util.regex.Pattern.compile("^\\[[^\\]]+\\]:\\s*\\S+.*$")
  private val PHr = java.util.regex.Pattern.compile(
    "^(\\*\\s*){3,}$|^(-\\s*){3,}$|^(_\\s*){3,}$")
  private val PTableSep = java.util.regex.Pattern.compile(
    "^\\|?\\s*:?-{2,}:?\\s*(\\|\\s*:?-{2,}:?\\s*)+\\|?$")

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
          line = PQuote.matcher(line).replaceAll("")
          // ATX headings
          line = PAtxTail.matcher(PAtx.matcher(line).replaceAll(""))
            .replaceAll("")
          // list bullets / numbers
          line = PNumber.matcher(PBullet.matcher(line).replaceAll(""))
            .replaceAll("")
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

  private def isLinkDef(t: String): Boolean = PLinkDef.matcher(t).matches()
  private def isHr(t: String): Boolean = PHr.matcher(t).matches()
  private def isTableSep(t: String): Boolean = PTableSep.matcher(t).matches()

  private def inline(s0: String): String = {
    var s = s0
    // images then links (inline + reference style)
    s = PImage.matcher(s).replaceAll("$1")
    s = PLink.matcher(s).replaceAll("$1")
    s = PRefLink.matcher(s).replaceAll("$1")
    // autolinks keep the url
    s = PAuto.matcher(s).replaceAll("$1")
    // raw html tags
    s = PHtml.matcher(s).replaceAll("")
    // inline code spans: keep content
    s = PCode.matcher(s).replaceAll("$1")
    // emphasis / strong / strike markers around words
    s = PStrong.matcher(s).replaceAll("$2")
    s = PEmphA.matcher(s).replaceAll("$1")
    s = PEmphU.matcher(s).replaceAll("$1")
    s = PStrike.matcher(s).replaceAll("$1")
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
