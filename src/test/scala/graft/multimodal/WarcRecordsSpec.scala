package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[WarcRecordsExpr]] over hand-built ISO 28500 files: field
  * extraction, Content-Length-authoritative blocks (content that
  * CONTAINS a "WARC/1.0" line must not split the record), CRLF/LF and
  * header-folding tolerance, the truncated-tail recovery policy, and
  * the decompress → warc_records pipeline shape Common Crawl uses. */
class WarcRecordsSpec extends SparkSpec {
  import spark.implicits._

  private def recs(bytes: Array[Byte])
      : Seq[(String, String, String, String, String, Array[Byte])] = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.warcRecords(col("p")).as("r")).head()
    if (r.isNullAt(0)) null
    else r.getSeq[org.apache.spark.sql.Row](0).map(x =>
      (x.getString(0), x.getString(1), x.getString(2), x.getString(3),
        x.getString(4), x.getAs[Array[Byte]](5)))
  }

  private def record(typ: String, uri: String, body: Array[Byte],
      sep: String = "\r\n", extra: String = ""): Array[Byte] =
    (s"WARC/1.0${sep}WARC-Type: $typ${sep}" +
      (if (uri != null) s"WARC-Target-URI: $uri$sep" else "") +
      s"WARC-Record-ID: <urn:uuid:42>${sep}" +
      s"WARC-Date: 2026-08-16T00:00:00Z${sep}" +
      s"Content-Type: text/plain${sep}$extra" +
      s"Content-Length: ${body.length}$sep$sep").getBytes("ISO-8859-1") ++
      body ++ s"$sep$sep".getBytes("ISO-8859-1")

  test("WET-shaped file: every field and body extracted, in order") {
    val f = record("warcinfo", null, "robots: classic".getBytes) ++
      record("conversion", "http://a.example/x", "hello world".getBytes) ++
      record("conversion", "http://b.example/y", "zweiter text".getBytes)
    val rs = recs(f)
    assert(rs.size == 3)
    assert(rs(0)._1 == "warcinfo" && rs(0)._3 == null)
    assert(rs(1)._1 == "conversion" &&
      rs(1)._3 == "http://a.example/x" &&
      rs(1)._2 == "<urn:uuid:42>" &&
      rs(1)._4 == "2026-08-16T00:00:00Z" &&
      rs(1)._5 == "text/plain" &&
      new String(rs(1)._6) == "hello world")
    assert(new String(rs(2)._6) == "zweiter text")
  }

  test("Content-Length is authoritative: a body containing WARC lines stays one record") {
    val trap = "WARC/1.0\r\nWARC-Type: fake\r\n\r\n".getBytes
    val f = record("response", "http://t/", trap) ++
      record("conversion", "http://u/", "tail".getBytes)
    val rs = recs(f)
    assert(rs.size == 2)
    assert(rs(0)._6.sameElements(trap))
    assert(new String(rs(1)._6) == "tail")
  }

  test("bare-LF line endings, folded headers, case-insensitive names") {
    val f = record("conversion", null, "lf body".getBytes, sep = "\n",
      extra = "warc-target-uri: http://folded.example/\n  deep/path\n")
    val rs = recs(f)
    assert(rs.size == 1)
    // folding joins with a single space per RFC
    assert(rs(0)._3 == "http://folded.example/ deep/path")
    assert(new String(rs(0)._6) == "lf body")
  }

  test("truncated tails keep the complete prefix; garbage starts are unknown") {
    val whole = record("conversion", "http://a/", ("x" * 100).getBytes) ++
      record("conversion", "http://b/", ("y" * 100).getBytes)
    // cut inside record 2's body: record 1 survives
    val cut = recs(whole.dropRight(60))
    assert(cut.size == 1 && cut(0)._3 == "http://a/")
    // cut inside record 1's headers: nothing complete -> unknown
    assert(recs(whole.take(30)) == null)
    // not WARC at all -> unknown
    assert(recs("HTTP/1.1 200 OK\r\n\r\n".getBytes) == null)
    assert(recs(Array.empty[Byte]) == null)
    // trailing garbage after complete records is tolerated
    val junk = recs(whole ++ "not a record".getBytes)
    assert(junk.size == 2)
  }

  test("record-count cap yields unknown, never a silent truncation") {
    // 100k+1 zero-length records: the bomb cap must stop the walk AND
    // surface it as NULL — a truncated set returned as complete would
    // poison every downstream count
    val one = "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    val sb = new StringBuilder(one.length * 100001)
    for (_ <- 0 until 100001) sb.append(one)
    assert(recs(sb.toString.getBytes("ISO-8859-1")) == null)
    // exactly at the cap with only blank tail: the complete file parses
    val atCap = new StringBuilder(one.length * 100000)
    for (_ <- 0 until 100000) atCap.append(one)
    assert(recs(atCap.toString.getBytes("ISO-8859-1")).size == 100000)
  }

  test("decompress -> warc_records: the Common Crawl member pipeline") {
    val wet = record("conversion", "http://cc.example/p",
      "extracted page text".getBytes)
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(wet); g.close()
      bos.toByteArray
    }
    val got = Seq(Tuple1(gz)).toDF("p")
      .select(explode(Multimodal.warcRecords(
        Multimodal.decompress(col("p"))("data"))).as("r"))
      .select(col("r.warc_type"), col("r.content").cast("string"))
      .collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "conversion")
    assert(got(0).getString(1) == "extracted page text")
  }
}
