package graft.multimodal

import graft.SparkSpec

/** PDF text extraction + metadata against the generated fixture
  * matrix (`tools/make_pdf_fixtures.py` — python-stdlib-assembled
  * ISO 32000-1 files whose expected text is exact by construction:
  * the strings placed in the content streams ARE the conformant
  * extraction). Covers both xref flavors, object streams, five
  * filters + the PNG up-predictor, encodings (WinAnsi /Differences,
  * Type0 ToUnicode bfchar/bfrange), incremental updates, xref
  * reconstruction, Form XObjects, and the never-throw fuzz
  * obligation every multimodal expression carries. */
class PdfSpec extends SparkSpec {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/pdf/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def expected(name: String): String = {
    new String(fixture(name + ".txt"), "UTF-8")
  }

  private def text(b: Array[Byte]): String = PdfText.extract(b)

  private val textFixtures = Seq("minimal", "flate", "tj_kerning",
    "multipage", "winansi_diffs", "type0", "filters", "escapes",
    "incremental", "badxref", "form", "xrefstream")

  test("fixture matrix extracts the constructed text exactly") {
    for (name <- textFixtures) {
      assert(text(fixture(name + ".pdf")) == expected(name), s"fixture $name")
    }
  }

  test("Standard security handler: empty-user-password docs decrypt across revisions") {
    // fixtures encrypted by the INDEPENDENT python `cryptography`
    // implementation (tools/make_pdf_crypt_fixtures.py): R2 40-bit
    // RC4, R3 128-bit RC4, R4 AESV2 crypt filters, R6 AES-256
    for (name <- Seq("rc4_r2", "rc4_r3", "aesv2_r4", "aes256_r6")) {
      assert(text(fixture(name + ".pdf")) == "Decrypted body text.", name)
      val row = PdfMetaExpr(org.apache.spark.sql.catalyst.expressions.Literal(
        fixture(name + ".pdf"))).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      assert(row.getBoolean(2), s"$name encrypted flag")
      // the Info /Title string decrypts through the same handler
      assert(row.getUTF8String(3).toString == "Secret title", s"$name title")
    }
  }

  test("a REAL user password refuses the empty-password key: NULL, never garbage") {
    assert(text(fixture("locked_r3.pdf")) == null)
    val row = PdfMetaExpr(org.apache.spark.sql.catalyst.expressions.Literal(
      fixture("locked_r3.pdf"))).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row.getBoolean(2)) // still audited as encrypted
  }

  test("encrypted documents yield NULL text but audited metadata") {
    assert(text(fixture("encrypted.pdf")) == null)
    val row = PdfMetaExpr(org.apache.spark.sql.catalyst.expressions.Literal(
      fixture("encrypted.pdf"))).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row.getBoolean(2), "encrypted flag")
    assert(row.getInt(1) == 1, "page count still audited")
  }

  test("metadata: version, page count, UTF-16BE and PDFDocEncoding Info strings") {
    val row = PdfMetaExpr(org.apache.spark.sql.catalyst.expressions.Literal(
      fixture("meta.pdf"))).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(row.getUTF8String(0).toString == "1.6")
    assert(row.getInt(1) == 2)
    assert(!row.getBoolean(2))
    assert(row.getUTF8String(3).toString == "Título — résumé")
    assert(row.getUTF8String(4).toString == "Caf” writer") // 0x8E PDFDocEncoding
    assert(row.getUTF8String(7).toString == "graft fixtures")
    assert(row.getUTF8String(8).toString == "D:20240102030405Z")
    assert(row.isNullAt(9)) // no ModDate
  }

  test("non-PDF payloads are NULL, never throw") {
    assert(text(null) == null)
    assert(text(Array.empty[Byte]) == null)
    assert(text("plain text, no header".getBytes) == null)
    assert(text(Array.fill[Byte](64)(0x25)) == null)
    // header buried past the 1024-byte junk-prefix tolerance
    assert(text((" " * 2000 + "%PDF-1.4").getBytes) == null)
    // junk prefix within tolerance still opens
    val prefixed = "GARBAGE".getBytes ++ fixture("minimal.pdf")
    assert(text(prefixed) == expected("minimal"))
  }

  test("truncation sweep never throws (every prefix of two structures)") {
    for (name <- Seq("minimal", "xrefstream")) {
      val whole = fixture(name + ".pdf")
      var cut = 1
      while (cut < whole.length) {
        val t = text(whole.take(cut)) // null or partial text; must not throw
        val _ = t
        cut += (if (whole.length > 1200) 7 else 1)
      }
    }
  }

  test("deterministic byte-mutation fuzz never throws") {
    val rnd = new scala.util.Random(0x9df5eed)
    val fuzzSet = textFixtures ++ Seq("rc4_r3", "aesv2_r4", "aes256_r6")
    for (name <- fuzzSet; _ <- 0 until 40) {
      val m = fixture(name + ".pdf").clone()
      val flips = 1 + rnd.nextInt(8)
      for (_ <- 0 until flips)
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      try {
        text(m)
        PdfMetaExpr(org.apache.spark.sql.catalyst.expressions.Literal(m)).eval(null)
      } catch {
        case e: Exception => fail(s"fuzz escape on $name: $e")
      }
    }
  }

  test("pdf_text and pdf_meta run as columns over a DataFrame") {
    import spark.implicits._
    val payload = fixture("multipage.pdf")
    val df = Seq((1, payload), (2, "not a pdf".getBytes)).toDF("id", "p")
    val out = df.select($"id",
      Multimodal.pdfText($"p").as("t"),
      Multimodal.pdfMeta($"p").as("m"))
      .selectExpr("id", "t", "m.pages as pages", "m.encrypted as enc")
      .orderBy("id").collect()
    assert(out(0).getString(1) == expected("multipage"))
    assert(out(0).getInt(2) == 3)
    assert(!out(0).getBoolean(3))
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }
}
