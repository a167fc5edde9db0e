package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[SitemapEntriesExpr]] over hand-built sitemaps.org documents:
  * urlset and sitemapindex shapes, the deterministic XML subset
  * (declaration/comments, namespace prefixes, entities, CDATA,
  * self-closing and loc-less entries), and the never-throw policy. */
class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private def entries(xml: String): Seq[Row] = {
    val r = Seq(Tuple1(xml.getBytes("UTF-8"))).toDF("p")
      .select(Multimodal.sitemapEntries(col("p")).as("e")).head()
    if (r.isNullAt(0)) null else r.getSeq[Row](0)
  }

  test("urlset: loc/lastmod/changefreq/priority; entities and CDATA decode") {
    val xml = """<?xml version="1.0" encoding="UTF-8"?>
      <!-- crawler exports -->
      <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        <url>
          <loc>https://ex.com/a?x=1&amp;y=2</loc>
          <lastmod>2024-01-02</lastmod>
          <changefreq>daily</changefreq>
          <priority>0.8</priority>
        </url>
        <url><loc><![CDATA[https://ex.com/b?q=<raw&>]]></loc></url>
        <url><loc>https://ex.com/&#x63;&#100;</loc></url>
      </urlset>"""
    val e = entries(xml)
    assert(e.length == 3)
    assert(e(0) == Row("url", "https://ex.com/a?x=1&y=2", "2024-01-02",
      "daily", 0.8))
    assert(e(1) == Row("url", "https://ex.com/b?q=<raw&>", null, null, null))
    assert(e(2) == Row("url", "https://ex.com/cd", null, null, null))
  }

  test("sitemapindex yields kind=sitemap rows; robots Sitemap: composition") {
    val xml = """<sitemapindex>
        <sitemap><loc>https://ex.com/sm1.xml</loc>
          <lastmod>2024-02-03T04:05:06Z</lastmod></sitemap>
        <sitemap><loc>https://ex.com/sm2.xml</loc></sitemap>
      </sitemapindex>"""
    val e = entries(xml)
    assert(e.map(r => (r.getString(0), r.getString(1))) == Seq(
      ("sitemap", "https://ex.com/sm1.xml"),
      ("sitemap", "https://ex.com/sm2.xml")))
    assert(e(0).getString(2) == "2024-02-03T04:05:06Z")
  }

  test("namespace prefixes, loc-less and self-closing entries, junk priority") {
    val xml = """<ns:urlset xmlns:ns="http://www.sitemaps.org/schemas/sitemap/0.9">
        <ns:url><ns:lastmod>2024-03-04</ns:lastmod></ns:url>
        <ns:url/>
        <ns:url><ns:loc>https://ex.com/ok</ns:loc>
          <ns:priority>soon</ns:priority></ns:url>
        <other>ignored</other>
      </ns:urlset>"""
    val e = entries(xml)
    assert(e.length == 1) // loc-less and self-closing dropped
    assert(e(0) == Row("url", "https://ex.com/ok", null, null, null))
  }

  test("non-sitemap, malformed, truncated payloads are NULL, never throw") {
    assert(entries("<html><body>hi</body></html>") == null)
    assert(entries("not xml at all") == null)
    assert(entries("") == null)
    assert(entries("<urlset><url><loc>https://x") == null) // unclosed
    val good = """<urlset><url><loc>https://ex.com/a</loc></url></urlset>"""
    for (cut <- 1 until good.length) {
      val r = entries(good.take(cut))
      assert(r == null || r.nonEmpty)
    }
    // BOM-prefixed utf-8 parses
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      good.getBytes("UTF-8")
    val r = Seq(Tuple1(bom)).toDF("p")
      .select(Multimodal.sitemapEntries(col("p")).as("e")).head()
    assert(r.getSeq[Row](0).length == 1)
  }
}
