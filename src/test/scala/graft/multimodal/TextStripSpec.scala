package graft.multimodal

import graft.SparkSpec

/** html_text / markdown_text normalization semantics (hand-authored
  * inputs, expected exact by construction). */
class TextStripSpec extends SparkSpec {

  private def md(s: String): String = Markdown.toText(s)

  test("markdown: headings, emphasis, links, code, lists, quotes") {
    val in =
      """# Title here
        |
        |Some **bold** and *emph* and `code span` text.
        |A [link text](https://example.org) and ![alt word](img.png).
        |Ref [style][1] and auto <https://auto.example>.
        |
        |- bullet one
        |2. numbered two
        |> quoted line
        |
        |```scala
        |val kept = "code"
        |```
        |
        |[1]: https://example.org/ref
        |---
        |Last ~~strike~~ line.""".stripMargin
    val want =
      """Title here
        |
        |Some bold and emph and code span text.
        |A link text and alt word.
        |Ref style and auto https://auto.example.
        |
        |bullet one
        |numbered two
        |quoted line
        |
        |val kept = "code"
        |
        |Last strike line.""".stripMargin
    assert(md(in) == want)
  }

  test("markdown: tables to tabs, setext underlines, html tags, entities") {
    val in =
      """Heading Two
        |===========
        || a | b |
        ||---|---|
        || 1 | 2 &amp; 3 |
        |<div class="x">html <b>inside</b></div>""".stripMargin
    assert(md(in) ==
      "Heading Two\na\tb\n1\t2 & 3\nhtml inside")
  }

  test("html_text and markdown_text run as columns; NULL passes through") {
    import spark.implicits._
    val out = Seq(
      (1, "<html><head><title>t</title></head><body><p>Hello <b>world</b></p><p>Bye</p></body></html>",
        "# Hi\n*there*"),
      (2, null, null))
      .toDF("id", "h", "m")
      .select($"id", Multimodal.htmlText($"h").as("ht"),
        Multimodal.markdownText($"m").as("mt"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "Hello world\nBye")
    assert(out(0).getString(2) == "Hi\nthere")
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }
}
