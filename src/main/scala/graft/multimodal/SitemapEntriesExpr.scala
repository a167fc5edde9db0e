package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** sitemap_entries(payload): parse a sitemaps.org XML document — the
  * discovery half of the crawl-ingestion chain (robots.txt names the
  * sitemaps via its Sitemap: directive, [[RobotsCheckExpr]] gates the
  * fetches, this expression yields the URL inventory to join against
  * fetched pages). Returns
  * array<struct<kind, loc, lastmod, changefreq, priority>>:
  *
  *  - `<urlset>` roots yield kind "url" rows from their `<url>`
  *    children; `<sitemapindex>` roots yield kind "sitemap" rows from
  *    their `<sitemap>` children (the two shapes the protocol
  *    defines — an index's locs are further sitemaps to fetch);
  *  - `loc` is mandatory per the spec — entries without one are
  *    dropped; `lastmod` / `changefreq` are carried as trimmed
  *    strings (lastmod is W3C datetime of varying precision — the
  *    caller casts); `priority` parses to double, NULL when absent
  *    or non-numeric;
  *  - the deterministic XML subset a crawler needs: optional
  *    declaration/comments/DOCTYPE, namespace-prefixed tag names
  *    (local name wins, case-insensitive), attributes ignored,
  *    self-closing entries skipped, `&amp; &lt; &gt; &quot; &apos;
  *    &#NN; &#xNN;` entity and CDATA text forms;
  *  - a UTF-8 payload (BOM tolerated); gzip sitemaps route through
  *    [[DecompressExpr]] explicitly first, the http_response policy.
  *
  * Non-sitemap / malformed payloads yield NULL (never throws). Scale
  * shape: per-row map-side parse, single scan, zero shuffle —
  * `explode(sitemap_entries(body))` then a keyed join on loc is the
  * discovery audit. */
case class SitemapEntriesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true),
    StructField("changefreq", StringType, nullable = true),
    StructField("priority", DoubleType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sitemap_entries"

  /** Cap against adversarial megasitemaps: the protocol itself caps a
    * sitemap at 50,000 URLs, which we honor exactly. */
  private val MaxEntries = 50000

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try parse(b) catch { case _: Exception => null }
  }

  private def parse(b: Array[Byte]): Any = {
    val skip = if (b.length >= 3 && (b(0) & 0xff) == 0xef &&
      (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf) 3 else 0
    val x = new String(b, skip, b.length - skip,
      java.nio.charset.StandardCharsets.UTF_8)
    val n = x.length
    var i = 0
    def ws(): Unit = while (i < n && x.charAt(i).isWhitespace) i += 1
    // skip declaration, comments, doctype between elements
    def skipMisc(): Boolean = {
      var progressed = true
      while (progressed) {
        ws()
        if (x.startsWith("<?", i)) {
          val e = x.indexOf("?>", i)
          if (e < 0) return false
          i = e + 2
        } else if (x.startsWith("<!--", i)) {
          val e = x.indexOf("-->", i)
          if (e < 0) return false
          i = e + 3
        } else if (x.startsWith("<!", i)) {
          val e = x.indexOf('>', i)
          if (e < 0) return false
          i = e + 1
        } else progressed = false
      }
      true
    }
    // read a start tag at i ('<' expected): (localName, selfClosing);
    // null when not a start tag
    def startTag(): (String, Boolean) = {
      if (i >= n || x.charAt(i) != '<') return null
      val e = x.indexOf('>', i)
      if (e < 0) return null
      var inner = x.substring(i + 1, e)
      if (inner.startsWith("/")) return null
      val selfClose = inner.endsWith("/")
      if (selfClose) inner = inner.dropRight(1)
      val name0 = inner.takeWhile(c => !c.isWhitespace)
      val name = name0.substring(name0.lastIndexOf(':') + 1).toLowerCase
      if (name.isEmpty) return null
      i = e + 1
      (name, selfClose)
    }
    if (!skipMisc()) return null
    val root = startTag()
    if (root == null || root._2) return null
    val kind = root._1 match {
      case "urlset" => "url"
      case "sitemapindex" => "sitemap"
      case _ => return null
    }
    val rows = scala.collection.mutable.ArrayBuffer[InternalRow]()
    var done = false
    while (!done) {
      if (!skipMisc()) return null
      if (i >= n) return null // root never closed
      if (x.startsWith("</", i)) { // root close tag
        done = true
      } else {
        val tag = startTag()
        if (tag == null) return null
        if (tag._1 != kind) { // unknown child: skip its subtree flatly
          if (!tag._2) {
            val close = x.indexOf("</", i) // deterministic subset:
            if (close < 0) return null // unknown children carry text only
            val e = x.indexOf('>', close)
            if (e < 0) return null
            i = e + 1
          }
        } else if (!tag._2) {
          // one entry: simple child elements until the closing tag
          var loc: String = null
          var lastmod: String = null
          var changefreq: String = null
          var priority: java.lang.Double = null
          var entryDone = false
          while (!entryDone) {
            if (!skipMisc()) return null
            if (i >= n) return null
            if (x.startsWith("</", i)) {
              val e = x.indexOf('>', i)
              if (e < 0) return null
              i = e + 1
              entryDone = true
            } else {
              val c = startTag()
              if (c == null) return null
              if (c._2) () // self-closing child: no text
              else {
                val close = x.indexOf("</", i)
                if (close < 0) return null
                val text = decodeText(x.substring(i, close))
                val e = x.indexOf('>', close)
                if (e < 0) return null
                i = e + 1
                c._1 match {
                  case "loc" => loc = text
                  case "lastmod" => lastmod = text
                  case "changefreq" => changefreq = text
                  case "priority" =>
                    priority = try java.lang.Double.valueOf(text)
                    catch { case _: NumberFormatException => null }
                  case _ => ()
                }
              }
            }
          }
          if (loc != null && loc.nonEmpty && rows.length < MaxEntries)
            rows += InternalRow(
              UTF8String.fromString(kind), UTF8String.fromString(loc),
              if (lastmod == null) null else UTF8String.fromString(lastmod),
              if (changefreq == null) null
              else UTF8String.fromString(changefreq),
              if (priority == null) null else priority.doubleValue())
        }
      }
    }
    new GenericArrayData(rows.toArray[Any])
  }

  /** Element text: trimmed, CDATA unwrapped, the five XML entities +
    * decimal/hex character references decoded. */
  private def decodeText(raw: String): String = {
    var s = raw.trim
    if (s.startsWith("<![CDATA[") && s.endsWith("]]>"))
      return s.substring(9, s.length - 3)
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        val ent = if (semi < 0) "" else s.substring(i + 1, semi)
        val rep = ent match {
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case e if e.startsWith("#x") || e.startsWith("#X") =>
            try new String(Character.toChars(
              Integer.parseInt(e.substring(2), 16)))
            catch { case _: Exception => null }
          case e if e.startsWith("#") =>
            try new String(Character.toChars(Integer.parseInt(e.substring(1))))
            catch { case _: Exception => null }
          case _ => null
        }
        if (rep == null) { out.append(c); i += 1 }
        else { out.append(rep); i = semi + 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
