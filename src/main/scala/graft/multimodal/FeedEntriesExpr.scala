package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** feed_entries(payload): RSS 2.0 / RSS 1.0 (RDF) / Atom feed
  * parsing — the syndication half of crawl discovery (robots names
  * sitemaps, pages name feeds, feeds name fresh URLs with
  * timestamps). Returns struct<format, feed_title, entries:
  * array<struct<title, link, published, author, summary>>>, NULL
  * when the payload is not a feed.
  *
  *  - RSS 2.0: `<rss><channel>` — item title/link/pubDate/author
  *    (dc:creator honored)/description; RSS 1.0: an `<rdf:RDF>` root
  *    with `<item>` children, same fields;
  *  - Atom: `<feed>` — entry title, the first `<link>` href
  *    (rel="alternate" preferred), published (updated fallback),
  *    `<author><name>`, summary (content fallback);
  *  - the [[OfficeText]] XML event scan underneath: namespace
  *    prefixes resolve by local name, entities/CDATA decode,
  *    attributes via the quoted-or-bare reader; 10k entries cap
  *    (a real feed is tens).
  *
  * Scale shape: per-row map-side parse, single scan, zero shuffle;
  * `explode(feed_entries(body).entries)` joined on link against
  * fetched pages is the freshness audit. */
case class FeedEntriesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("feed_title", StringType, nullable = true),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("title", StringType, nullable = true),
      StructField("link", StringType, nullable = true),
      StructField("published", StringType, nullable = true),
      StructField("author", StringType, nullable = true),
      StructField("summary", StringType, nullable = true))),
      containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "feed_entries"

  private val MaxEntries = 10000

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try parse(b) catch { case _: Exception => null }
  }

  private def parse(b: Array[Byte]): Any = {
    var format: String = null
    var feedTitle: String = null
    val entries = Vector.newBuilder[InternalRow]
    var n = 0

    // per-entry state
    var inEntry = false
    var title: String = null
    var link: String = null
    var published: String = null
    var author: String = null
    var summary: String = null
    var atomLinkRel: String = null

    // text collection
    var field: String = null // which entry/feed slot text goes to
    val cur = new java.lang.StringBuilder(64)
    var depth = 0
    var entryDepth = -1
    var inAuthorElem = false

    def flushEntry(): Unit = {
      if (n < MaxEntries) {
        entries += InternalRow(
          if (title == null) null else UTF8String.fromString(title.trim),
          if (link == null) null else UTF8String.fromString(link.trim),
          if (published == null) null else UTF8String.fromString(published.trim),
          if (author == null) null else UTF8String.fromString(author.trim),
          if (summary == null) null else UTF8String.fromString(summary.trim))
        n += 1
      }
      title = null; link = null; published = null; author = null; summary = null
    }

    OfficeText.scanXml(b, (name, attrs, selfClosing, isClose) => {
      val ln = {
        val k = name.indexOf(':')
        (if (k < 0) name else name.substring(k + 1)).toLowerCase(java.util.Locale.ROOT)
      }
      if (!isClose && !selfClosing) depth += 1
      if (format == null && !isClose) {
        ln match {
          case "rss" => format = "rss"
          case "rdf" => format = "rss"
          case "feed" => format = "atom"
          case _ =>
        }
      }
      ln match {
        case "item" | "entry" =>
          if (!isClose && !selfClosing) { inEntry = true; entryDepth = depth }
          else if (isClose && inEntry) { inEntry = false; flushEntry() }
        case "title" =>
          if (!isClose && !selfClosing) { field = "title"; cur.setLength(0) }
          else if (isClose) {
            if (field == "title") {
              if (inEntry) title = cur.toString
              else if (feedTitle == null) feedTitle = cur.toString
            }
            field = null
          }
        case "link" =>
          if (inEntry) {
            val href = OfficeText.attr(attrs, "href")
            if (href != null) {
              // atom: prefer rel="alternate" (or the first unrel'd)
              val rel = OfficeText.attr(attrs, "rel")
              if (link == null || (rel == "alternate" && atomLinkRel != "alternate")) {
                link = href; atomLinkRel = rel
              }
            } else if (!isClose && !selfClosing) { field = "link"; cur.setLength(0) }
            else if (isClose && field == "link") {
              if (link == null) link = cur.toString
              field = null
            }
          }
        case "pubdate" | "published" | "date" =>
          if (inEntry) {
            if (!isClose && !selfClosing) { field = "pub"; cur.setLength(0) }
            else if (isClose && field == "pub") {
              if (published == null) published = cur.toString
              field = null
            }
          }
        case "updated" =>
          if (inEntry) {
            if (!isClose && !selfClosing) { field = "upd"; cur.setLength(0) }
            else if (isClose && field == "upd") {
              if (published == null) published = cur.toString // fallback
              field = null
            }
          }
        case "author" | "creator" =>
          if (inEntry) {
            if (!isClose && !selfClosing) {
              inAuthorElem = true; field = "author"; cur.setLength(0)
            } else if (isClose) {
              if (field == "author" && cur.length > 0 && author == null)
                author = cur.toString
              inAuthorElem = false
              field = null
            }
          }
        case "name" =>
          if (inEntry && inAuthorElem) {
            if (!isClose && !selfClosing) { field = "author"; cur.setLength(0) }
            else if (isClose && field == "author") {
              author = cur.toString
              field = null
            }
          }
        case "description" | "summary" | "content" =>
          if (inEntry) {
            if (!isClose && !selfClosing) { field = "summary"; cur.setLength(0) }
            else if (isClose && field == "summary") {
              // description/summary win; content only fills a gap
              if (ln == "content") { if (summary == null) summary = cur.toString }
              else summary = cur.toString
              field = null
            }
          }
        case _ =>
      }
      if (isClose) depth = math.max(0, depth - 1)
      val _ = entryDepth
    }, t => if (field != null) cur.append(t))

    if (format == null) return null
    InternalRow(UTF8String.fromString(format),
      if (feedTitle == null) null else UTF8String.fromString(feedTitle.trim),
      new GenericArrayData(entries.result().toArray[Any]))
  }

  override protected def withNewChildInternal(newChild: Expression): FeedEntriesExpr =
    copy(child = newChild)
}
