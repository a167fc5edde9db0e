package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[HttpResponseExpr]] over hand-built RFC 9112 messages: framing,
  * chunked transfer decoding, charset selection (declared, BOM,
  * mislabeled-utf-8 fallback), binary/encoded body policy, and the
  * full WARC→HTTP→text pipeline shape. */
class HttpResponseSpec extends SparkSpec {
  import spark.implicits._

  private def parse(bytes: Array[Byte])
      : (Int, String, String, Array[Byte], String) = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.httpResponse(col("p")).as("h"))
      .select("h.status", "h.content_type", "h.charset", "h.body", "h.text")
      .head()
    (r.getInt(0), r.getString(1), r.getString(2),
      if (r.isNullAt(3)) null else r.getAs[Array[Byte]](3),
      r.getString(4))
  }

  private def msg(status: Int, headers: Seq[String],
      body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\n" + headers.map(_ + "\r\n").mkString +
      "\r\n").getBytes("ISO-8859-1") ++ body

  test("plain utf-8 page: status, content type, charset, text") {
    val body = "héllo wörld 中文".getBytes("UTF-8")
    val (st, ct, cs, b, txt) = parse(msg(200,
      Seq("Content-Type: text/html; charset=UTF-8",
        s"Content-Length: ${body.length}"), body))
    assert(st == 200 && ct == "text/html; charset=UTF-8" && cs == "utf-8")
    assert(b.sameElements(body))
    assert(txt == "héllo wörld 中文")
  }

  test("chunked transfer decoding (hex sizes, extensions, terminator)") {
    val body = "5;ext=1\r\nhello\r\n6\r\n world\r\n0\r\n\r\n".getBytes
    val (st, _, _, _, txt) = parse(msg(200,
      Seq("Content-Type: text/plain", "Transfer-Encoding: chunked"), body))
    assert(st == 200 && txt == "hello world")
    // truncated mid-chunk keeps the captured prefix
    val cut = msg(200, Seq("Content-Type: text/plain",
      "Transfer-Encoding: chunked"),
      "5\r\nhello\r\nA\r\nwor".getBytes)
    assert(parse(cut)._5 == "hellowor")
  }

  test("mislabeled utf-8 falls back to latin-1; BOMs select the charset") {
    // declared utf-8 but carries a bare 0xE9 (latin-1 é): NOT valid
    // utf-8 — byte-preserving latin-1, no U+FFFD noise
    val lied = msg(200, Seq("Content-Type: text/plain; charset=utf-8"),
      Array[Byte]('c', 'a', 'f', 0xe9.toByte))
    assert(parse(lied)._5 == "café")
    // undeclared charset + utf-8 BOM
    val bom = msg(200, Seq("Content-Type: text/plain"),
      Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "ok".getBytes)
    val (_, _, cs, _, txt) = parse(bom)
    assert(cs == "utf-8" && txt == "ok")
    // utf-16le BOM
    val u16 = msg(200, Seq("Content-Type: text/plain"),
      Array[Byte](0xff.toByte, 0xfe.toByte) ++
        "hi".flatMap(c => Seq(c.toByte, 0.toByte)).toArray)
    assert(parse(u16)._5 == "hi")
  }

  test("header-declared utf-16 without a BOM keeps every character; short bodies survive") {
    // charset from the header, no BOM in the body: nothing stripped
    val noBom = msg(200, Seq("Content-Type: text/plain; charset=utf-16le"),
      "hi".flatMap(c => Seq(c.toByte, 0.toByte)).toArray)
    assert(parse(noBom)._5 == "hi")
    // bare 'utf-16' resolves byte order from the BOM
    val beBom = msg(200, Seq("Content-Type: text/plain; charset=utf-16"),
      Array[Byte](0xfe.toByte, 0xff.toByte, 0, 'o', 0, 'k'))
    assert(parse(beBom)._5 == "ok")
    // a 0-byte declared-utf-16 body must not collapse the row
    val empty = msg(204, Seq("Content-Type: text/plain; charset=utf-16le"),
      Array.empty[Byte])
    val (st, _, _, _, txt) = parse(empty)
    assert(st == 204 && txt == "")
  }

  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("CJK / legacy multibyte charsets decode (python-encoded fixtures)") {
    // every hex body below was produced by PYTHON's codecs
    // (tools-free: the bytes are pinned in-line), so the JDK decoder
    // the expression uses is cross-implementation-verified
    val cases = Seq(
      ("gbk", "CAFDBEDD2D", "数据-"),
      ("gb2312", "CAFDBEDD2D", "数据-"), // web label: GBK repertoire
      ("gb18030", "953085322D", "🙂-"), // 4-byte GB18030 sequence
      ("big5", "B8EAAEC62D", "資料-"),
      ("shift_jis", "8366815B835E2D", "データ-"),
      ("sjis", "8366815B835E2D", "データ-"),
      ("euc-jp", "A5C7A1BCA5BF2D", "データ-"),
      ("euc-kr", "B5A5C0CCC5CD2D", "데이터-"),
      ("iso-2022-jp", "1B24422547213C253F1B28422D", "データ-"))
    for ((label, hexBody, want) <- cases) {
      val body = unhex(hexBody) ++ "tail".getBytes("US-ASCII")
      val (st, _, cs, _, txt) = parse(msg(200,
        Seq(s"Content-Type: text/html; charset=$label"), body))
      assert(st == 200 && cs == label, s"$label charset")
      assert(txt == want + "tail", s"$label: got $txt")
    }
  }

  test("single-byte non-Latin charsets decode under their WHATWG labels") {
    // (label, python-encoded hex, expected text) — every family in
    // HttpResponseExpr.SingleByteCharsets, ASCII digits pass through
    val cases = Seq(
      ("windows-1251", "CFF0E8E2E5F22D", "Привет-"),
      ("koi8-r", "F0D2C9D7C5D42D", "Привет-"),
      ("koi8-u", "EBC9A7D72D", "Київ-"),
      ("iso-8859-5", "BFE0D8D2D5E22D", "Привет-"),
      ("ibm866", "8FE0A8A2A5E22D", "Привет-"),
      ("x-mac-cyrillic", "8FF0E8E2E5F22D", "Привет-"),
      ("windows-1250", "C8659A74696E612D", "Čeština-"),
      ("iso-8859-2", "C865B974696E612D", "Čeština-"),
      ("windows-1253", "C5EBEBDCE4E12D", "Ελλάδα-"),
      ("iso-8859-7", "C5EBEBDCE4E12D", "Ελλάδα-"),
      ("windows-1255", "F9ECE5ED2D", "שלום-"),
      ("iso-8859-8", "F9ECE5ED2D", "שלום-"),
      ("windows-1256", "E3D1CDC8C72D", "مرحبا-"),
      ("iso-8859-6", "E5D1CDC8C72D", "مرحبا-"),
      ("windows-1257", "4C6174766965F0752D", "Latviešu-"),
      ("windows-1258", "F0F56E2D", "đơn-"),
      ("iso-8859-15", "A475726F2D", "€uro-"),
      ("iso-8859-4", "E02D", "ā-"),
      ("iso-8859-13", "E22D", "ā-"),
      ("iso-8859-3", "F86F6A752D", "ĝoju-"),
      ("iso-8859-16", "BA2D", "ș-"),
      ("macintosh", "6361668EAA2D", "café™-"),
      // WHATWG folds: the ISO label's de-facto repertoire is the
      // windows superset — C1 bytes carry real characters
      ("iso-8859-9", "54FC726BE765922D", "Türkçe’-"), // 0x92 = ’ (cp1254)
      ("latin5", "54FC726BE765922D", "Türkçe’-"),
      ("tis-620", "C0D2C9D2E4B7C2852D", "ภาษาไทย…-"), // 0x85 = … (cp874)
      ("windows-874", "C0D2C9D2E4B7C2852D", "ภาษาไทย…-"),
      ("iso-8859-11", "C0D2C9D2E4B7C2852D", "ภาษาไทย…-"),
      // alias labels route to the same family
      ("cp1251", "CFF0E8E2E5F22D", "Привет-"),
      ("cyrillic", "BFE0D8D2D5E22D", "Привет-"),
      ("latin2", "C865B974696E612D", "Čeština-"),
      ("greek", "C5EBEBDCE4E12D", "Ελλάδα-"))
    for ((label, hexBody, want) <- cases) {
      val body = unhex(hexBody) ++ "tail".getBytes("US-ASCII")
      val (st, _, cs, _, txt) = parse(msg(200,
        Seq(s"Content-Type: text/html; charset=$label"), body))
      assert(st == 200 && cs == label, s"$label charset")
      assert(txt == want + "tail", s"$label: got $txt")
    }
    // mislabel fallback: windows-1253 leaves 0xAA undefined — strict
    // decode fails, latin-1 byte-preserving fallback, no U+FFFD
    val lied = msg(200,
      Seq("Content-Type: text/plain; charset=windows-1253"),
      Array[Byte](0xaa.toByte, 'A'))
    assert(parse(lied)._5 == "ªA")
    // x-user-defined (WHATWG private-use ramp): ASCII passes, high
    // bytes map to U+F780 + (b - 0x80)
    val xud = msg(200,
      Seq("Content-Type: text/plain; charset=x-user-defined"),
      Array[Byte]('A', 0x80.toByte, 0xff.toByte))
    assert(parse(xud)._5 == "A\uF780\uF7FF")
  }

  test("mislabeled CJK body falls back to latin-1, byte-preserving") {
    // declared gbk but 0x81 0x20 is not a valid GBK sequence (trail
    // byte out of range): strict decode fails -> latin-1, no U+FFFD
    val lied = msg(200, Seq("Content-Type: text/plain; charset=gbk"),
      Array[Byte](0x81.toByte, 0x20, 'A'))
    assert(parse(lied)._5 == " A")
    // truly unknown charset labels still yield NULL text, not noise
    val alien = msg(200,
      Seq("Content-Type: text/plain; charset=klingon-8"), "x".getBytes)
    assert(parse(alien)._5 == null && parse(alien)._3 == "klingon-8")
  }

  test("meta-charset prescan: header silent, no BOM -> <meta> wins (WHATWG order)") {
    val gbkText = unhex("CAFDBEDD2D")
    // <meta charset=...> form
    val m1 = "<html><head><meta charset=\"gbk\"></head><body>"
      .getBytes("US-ASCII") ++ gbkText ++ "</body>".getBytes("US-ASCII")
    val (_, _, cs1, _, txt1) = parse(msg(200,
      Seq("Content-Type: text/html"), m1))
    assert(cs1 == "gbk" && txt1.contains("数据-"))
    // <meta http-equiv=content-type content="text/html; charset=..."> form
    val m2 = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=euc-kr\"></head>").getBytes("US-ASCII") ++
      unhex("B5A5C0CCC5CD2D")
    val (_, _, cs2, _, txt2) = parse(msg(200,
      Seq("Content-Type: text/html"), m2))
    assert(cs2 == "euc-kr" && txt2.contains("데이터-"))
    // the header OUTRANKS the meta tag when both are present
    val m3 = "<meta charset=\"gbk\">café".getBytes("ISO-8859-1")
    val (_, _, cs3, _, txt3) = parse(msg(200,
      Seq("Content-Type: text/html; charset=iso-8859-1"), m3))
    assert(cs3 == "iso-8859-1" && txt3.endsWith("café"))
    // non-html bodies are never prescanned
    val m4 = "<meta charset=\"gbk\">plain".getBytes("US-ASCII")
    assert(parse(msg(200, Seq("Content-Type: text/plain"), m4))._3 == null)
    // the prescan window is 1024 bytes: a meta tag beyond it is unseen
    val far = ("x" * 1100 + "<meta charset=\"gbk\">").getBytes("US-ASCII")
    assert(parse(msg(200, Seq("Content-Type: text/html"), far))._3 == null)
    // "charset=" inside ANOTHER attribute's VALUE is not a
    // declaration (the WHATWG rule: only a charset attribute, or the
    // content value of an http-equiv=content-type meta, counts)
    val decoy = ("<html><head><meta name=\"description\" " +
      "content=\"how charset=big5 encoding works\"></head>" +
      "<body>cafÃ©</body>").getBytes("ISO-8859-1")
    val (_, _, csD, _, txtD) = parse(msg(200,
      Seq("Content-Type: text/html"), decoy))
    assert(csD == null && txtD.contains("café")) // utf-8 default held
    // ...and a decoy followed by a REAL declaration resolves to the
    // real one, not the decoy
    val both = ("<meta content=\"charset=big5\" name=\"x\">" +
      "<meta charset=\"gbk\">").getBytes("US-ASCII") ++ unhex("CAFDBEDD")
    assert(parse(msg(200, Seq("Content-Type: text/html"), both))._3
      == "gbk")
    // a '>' INSIDE a quoted attribute value does not truncate the tag:
    // the charset attribute after it must still be seen (WHATWG tag-end
    // scanning skips quoted values)
    val gtInQuote = ("<html><meta content=\"if a > b then\" " +
      "charset=\"gbk\">").getBytes("US-ASCII") ++ unhex("CAFDBEDD")
    assert(parse(msg(200, Seq("Content-Type: text/html"), gtInQuote))._3
      == "gbk")
  }

  test("prescan is scoped to HTML: silent header needs an HTML-sniffing body") {
    // header silent + body that does NOT sniff as HTML: a plain-text
    // body merely CONTAINING '<meta charset=...>' is not prescanned
    val prose = ("the tag <meta charset=\"gbk\"> sets the encoding"
      ).getBytes("US-ASCII")
    val (st, ct, cs, _, txt) = parse(msg(200, Seq.empty, prose))
    assert(st == 200 && ct == null && cs == null)
    assert(txt != null) // still decodes (utf-8 default), just no hijack
    // header silent + HTML-sniffing body: prescan runs
    val page = "<!doctype html><html><meta charset=\"gbk\">"
      .getBytes("US-ASCII") ++ unhex("CAFDBEDD")
    val (_, _, cs2, _, txt2) = parse(msg(200, Seq.empty, page))
    assert(cs2 == "gbk" && txt2.contains("数据"))
  }

  test("binary and content-encoded bodies surface bytes, not text") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G')
    val (st, _, _, b, txt) = parse(msg(200,
      Seq("Content-Type: image/png"), png))
    assert(st == 200 && b.sameElements(png) && txt == null)
    // gzip content-encoding: raw bytes out, text null — route through
    // decompress explicitly
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write("compressed page".getBytes); g.close()
      bos.toByteArray
    }
    val (st2, _, _, b2, txt2) = parse(msg(200,
      Seq("Content-Type: text/html", "Content-Encoding: gzip"), gz))
    assert(st2 == 200 && txt2 == null)
    val viaDecompress = Seq(Tuple1(b2)).toDF("p")
      .select(Multimodal.decompress(col("p"))("data").cast("string"))
      .head().getString(0)
    assert(viaDecompress == "compressed page")
  }

  test("non-HTTP, truncated headers, absurd status: unknown; never throws") {
    assert(parse("<html>not http</html>".getBytes)._1 == -1)
    assert(parse("HTTP/1.1 abc OK\r\n\r\n".getBytes)._1 == -1)
    assert(parse("HTTP/1.1 999999 OK\r\n\r\n".getBytes)._1 == -1)
    assert(parse("HTTP/1.1 200 OK\r\nHeader: v".getBytes)._1 == -1)
    assert(parse(Array.empty[Byte])._1 == -1)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val junk = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(junk)
      parse("HTTP/1.1 200 OK\r\n".getBytes ++ junk) // must not throw
    }
  }

  test("the full crawl chain: decompress -> warc_records -> http_response -> text") {
    val http = msg(200, Seq("Content-Type: text/html; charset=utf-8"),
      "<p>page body</p>".getBytes("UTF-8"))
    val warc = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: http://x/\r\nContent-Length: ${http.length}" +
      "\r\n\r\n").getBytes ++ http ++ "\r\n\r\n".getBytes
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(warc); g.close()
      bos.toByteArray
    }
    val got = Seq(Tuple1(gz)).toDF("p")
      .select(explode(Multimodal.warcRecords(
        Multimodal.decompress(col("p"))("data"))).as("r"))
      .select(Multimodal.httpResponse(col("r.content")).as("h"))
      .select(col("h.status"), col("h.text")).head()
    assert(got.getInt(0) == 200 && got.getString(1) == "<p>page body</p>")
  }
}
