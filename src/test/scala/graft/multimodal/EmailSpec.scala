package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** email_message / mbox_messages against python-email-stdlib-written
  * fixtures (tools/make_email_fixtures.py) — the independent RFC
  * 5322/2045/2047 implementation the Scala parser is pinned to. */
class EmailSpec extends SparkSpec {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/email/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def parse(b: Array[Byte]) =
    Email.parse(b).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]

  test("plain message: headers + 7bit body") {
    val r = parse(fixture("simple.eml"))
    assert(r.getUTF8String(0).toString == "Alice Example <alice@example.org>")
    assert(r.getUTF8String(1).toString == "bob@example.net")
    assert(r.getUTF8String(2).toString == "Plain hello")
    assert(r.getUTF8String(4).toString == "<simple-1@example.org>")
    assert(r.getUTF8String(5).toString == "text/plain")
    assert(r.getUTF8String(6).toString == "Just a plain body.\nTwo lines.")
    assert(r.isNullAt(7)) // no html part
  }

  test("multipart/mixed: alternative text+html, base64/QP bodies, attachment") {
    val r = parse(fixture("multipart.eml"))
    assert(r.getUTF8String(2).toString == "Héllo — múltipart") // B encoded-word
    assert(r.getUTF8String(5).toString == "multipart/mixed")
    assert(r.getUTF8String(6).toString == "Thé plain text pärt.") // base64+utf-8
    assert(r.getUTF8String(7).toString ==
      "<html><body><p>The <b>html</b> part.</p></body></html>") // qp+latin-1
    val atts = r.getArray(8)
    assert(atts.numElements() == 1)
    val att = atts.getStruct(0, 4)
    assert(att.getUTF8String(0).toString == "blob.bin")
    assert(att.getUTF8String(1).toString == "application/octet-stream")
    assert(att.getLong(2) == 64)
    assert(att.getBinary(3).toSeq == (0 until 64).map(_.toByte).toSeq)
  }

  test("quoted-printable soft breaks and Q encoded-words") {
    val r = parse(fixture("qp.eml"))
    assert(r.getUTF8String(0).toString == "André <andre@example.org>")
    assert(r.getUTF8String(2).toString == "café report")
    val base = "A long line that the quoted-printable encoder will wrap " +
      "with soft breaks, plus déjà-vu accents to force QP. "
    assert(r.getUTF8String(6).toString == base * 3)
  }

  test("mbox splits, drops separators, unquotes >From lines") {
    val ms = Email.mboxSplit(fixture("archive.mbox"))
    assert(ms != null && ms.length == 3)
    val bodies = ms.map(m => parse(m))
    assert(bodies(0).getUTF8String(2).toString == "Message 0")
    assert(bodies(1).getUTF8String(6).toString ==
      "second message\nFrom the middle of a line is fine")
    assert(bodies(2).getUTF8String(6).toString ==
      "third body\n>already quoted")
  }

  test("non-messages are NULL; truncation and mutation never throw") {
    assert(Email.parse("just some text\nwith lines\n".getBytes) == null)
    assert(Email.parse(Array.empty[Byte]) == null)
    assert(Email.mboxSplit("not an mbox".getBytes) == null)
    for (name <- Seq("multipart.eml", "archive.mbox")) {
      val whole = fixture(name)
      var cut = 1
      while (cut < whole.length) {
        Email.parse(whole.take(cut)); Email.mboxSplit(whole.take(cut))
        cut += 11
      }
      val rnd = new scala.util.Random(0xe41a11)
      for (_ <- 0 until 60) {
        val m = whole.clone()
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        Email.parse(m); Email.mboxSplit(m)
      }
    }
  }

  test("mbox -> explode -> email_message runs as a column chain") {
    import spark.implicits._
    val out = Seq(Tuple1(fixture("archive.mbox"))).toDF("p")
      .select(explode(Multimodal.mboxMessages($"p")).as("m"))
      .select(Multimodal.emailMessage($"m").as("e"))
      .selectExpr("e.subject", "e.text")
      .orderBy("subject").collect()
    assert(out.length == 3)
    assert(out(0).getString(0) == "Message 0")
    assert(out(0).getString(1) == "first message body")
  }
}
