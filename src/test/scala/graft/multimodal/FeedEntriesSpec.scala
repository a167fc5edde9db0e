package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** feed_entries over hand-authored RSS 2.0 / RSS 1.0 / Atom
  * documents (the formats are plain XML specs; expected values are
  * exact by construction). */
class FeedEntriesSpec extends SparkSpec {

  private def feed(s: String) = {
    import spark.implicits._
    Seq(Tuple1(s.getBytes("UTF-8"))).toDF("p")
      .select(Multimodal.feedEntries($"p").as("f"))
      .selectExpr("f.format", "f.feed_title", "f.entries").head()
  }

  test("RSS 2.0: channel title, item fields, CDATA, dc:creator") {
    val r = feed("""<?xml version="1.0"?>
      <rss version="2.0" xmlns:dc="http://purl.org/dc/elements/1.1/">
       <channel>
        <title>Example Blog</title>
        <item>
         <title>First &amp; foremost</title>
         <link>https://example.org/a</link>
         <pubDate>Mon, 01 Jan 2024 10:00:00 GMT</pubDate>
         <dc:creator>Jo Writer</dc:creator>
         <description><![CDATA[A <b>rich</b> summary]]></description>
        </item>
        <item><title>Second</title><link>https://example.org/b</link></item>
       </channel>
      </rss>""")
    assert(r.getString(0) == "rss" && r.getString(1) == "Example Blog")
    val es = r.getSeq[org.apache.spark.sql.Row](2)
    assert(es.length == 2)
    assert(es(0).getString(0) == "First & foremost")
    assert(es(0).getString(1) == "https://example.org/a")
    assert(es(0).getString(2) == "Mon, 01 Jan 2024 10:00:00 GMT")
    assert(es(0).getString(3) == "Jo Writer")
    assert(es(0).getString(4) == "A <b>rich</b> summary")
    assert(es(1).getString(0) == "Second" && es(1).isNullAt(2))
  }

  test("Atom: entry links by rel, updated fallback, author/name, content fallback") {
    val r = feed("""<?xml version="1.0"?>
      <feed xmlns="http://www.w3.org/2005/Atom">
       <title>Atom Feed</title>
       <entry>
        <title>Entry one</title>
        <link rel="self" href="https://example.org/self"/>
        <link rel="alternate" href="https://example.org/e1"/>
        <updated>2024-01-02T03:04:05Z</updated>
        <author><name>A. Author</name></author>
        <content type="html">fallback content</content>
       </entry>
      </feed>""")
    assert(r.getString(0) == "atom" && r.getString(1) == "Atom Feed")
    val es = r.getSeq[org.apache.spark.sql.Row](2)
    assert(es.length == 1)
    assert(es(0).getString(1) == "https://example.org/e1") // alternate wins
    assert(es(0).getString(2) == "2024-01-02T03:04:05Z")
    assert(es(0).getString(3) == "A. Author")
    assert(es(0).getString(4) == "fallback content")
  }

  test("RSS 1.0 RDF roots parse as rss") {
    val r = feed("""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        xmlns="http://purl.org/rss/1.0/">
       <channel><title>RDF Chan</title></channel>
       <item><title>Old style</title><link>https://example.org/r</link></item>
      </rdf:RDF>""")
    assert(r.getString(0) == "rss" && r.getString(1) == "RDF Chan")
    val es = r.getSeq[org.apache.spark.sql.Row](2)
    assert(es.length == 1 && es(0).getString(0) == "Old style")
  }

  test("non-feeds are NULL; junk never throws") {
    import spark.implicits._
    val r = Seq(Tuple1("<html><body>a page</body></html>".getBytes)).toDF("p")
      .select(Multimodal.feedEntries($"p").as("f")).head()
    assert(r.isNullAt(0))
    val e = FeedEntriesExpr(org.apache.spark.sql.catalyst.expressions.Literal(
      Array.tabulate[Byte](400)(i => (i * 31).toByte)))
    e.eval(null)
  }
}
