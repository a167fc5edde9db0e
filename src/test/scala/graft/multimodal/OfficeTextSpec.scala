package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ZIP walk + Office/EPUB text extraction against python-zipfile-built
  * fixtures (tools/make_office_fixtures.py — hand-authored ECMA-376 /
  * ODF / OPF XML whose expected extraction is exact by construction).
  * Covers stored+deflate entries, cp437 vs UTF-8 names, archive
  * comments (EOCD scan-back), numeric slide/sheet ordering, shared +
  * rich + inline xlsx strings, ODF style-text exclusion, EPUB spine
  * ordering with script/style/head skipping, and the never-throw
  * fuzz obligation. */
class OfficeTextSpec extends SparkSpec {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/office/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def expected(name: String): String =
    new String(fixture(name + ".txt"), "UTF-8")

  private def office(b: Array[Byte]): (String, String) = OfficeText.extract(b)

  test("zip_entries walks stored+deflate entries with comments and UTF-8 names") {
    val es = Zip.entries(fixture("plain.zip"))
    assert(es != null && es.length == 3)
    val byName = es.map(e => e.name -> e).toMap
    assert(new String(byName("a.txt").data, "UTF-8") == "hello zip")
    assert(new String(byName("dir/b.txt").data, "UTF-8") == "b" * 400)
    assert(byName("dir/b.txt").method == "deflate" ||
      byName("dir/b.txt").method == "stored")
    assert(byName.contains("日本.txt")) // UTF-8 flag honored
    assert(new String(byName("日本.txt").data, "UTF-8") == "unicode name")
  }

  test("docx, pptx, xlsx, odt, epub extract the constructed text exactly") {
    val cases = Seq(
      ("doc.docx", "docx"), ("pres.pptx", "pptx"), ("book.xlsx", "xlsx"),
      ("text.odt", "odf"), ("book.epub", "epub"))
    for ((name, fmt) <- cases) {
      val r = office(fixture(name))
      assert(r != null, name)
      assert(r._1 == fmt, s"$name format")
      assert(r._2 == expected(name), s"$name text")
    }
  }

  test("non-archives and non-document archives are NULL, never throw") {
    assert(office("not a zip at all".getBytes) == null)
    assert(office(Array.empty[Byte]) == null)
    assert(Zip.entries("PK truncated local header".getBytes) == null)
    assert(office(fixture("plain.zip")) == null) // a zip, but no document
  }

  test("truncation sweep never throws") {
    for (name <- Seq("doc.docx", "book.epub", "plain.zip")) {
      val whole = fixture(name)
      var cut = 1
      while (cut < whole.length) {
        office(whole.take(cut)); Zip.entries(whole.take(cut))
        cut += 3
      }
    }
  }

  test("deterministic byte-mutation fuzz never throws") {
    val rnd = new scala.util.Random(0x0ff1ce)
    for (name <- Seq("plain.zip", "doc.docx", "pres.pptx", "book.xlsx",
        "text.odt", "book.epub"); _ <- 0 until 40) {
      val m = fixture(name).clone()
      for (_ <- 0 until 1 + rnd.nextInt(8))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      try { office(m); Zip.entries(m) }
      catch { case e: Exception => fail(s"fuzz escape on $name: $e") }
    }
  }

  test("office_text and zip_entries run as columns over a DataFrame") {
    import spark.implicits._
    val df = Seq((1, fixture("doc.docx")), (2, fixture("book.epub")),
      (3, "junk".getBytes)).toDF("id", "p")
    val out = df.select($"id",
      Multimodal.officeText($"p").as("o"),
      size(Multimodal.zipEntries($"p")).as("n"))
      .selectExpr("id", "o.format as fmt", "o.text as text", "n")
      .orderBy("id").collect()
    assert(out(0).getString(1) == "docx")
    assert(out(0).getString(2) == expected("doc.docx"))
    assert(out(1).getString(1) == "epub")
    assert(out(2).isNullAt(1) && out(2).isNullAt(3)) // both NULL on junk
  }
}
