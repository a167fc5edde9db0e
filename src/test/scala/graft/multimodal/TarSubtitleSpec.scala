package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** tar_entries against python-tarfile-written archives (ustar / GNU
  * long-name / pax unicode dialects) and subtitle_cues against
  * hand-authored SRT/WebVTT (both exact by construction). */
class TarSubtitleSpec extends SparkSpec {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/tar/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def entries(b: Array[Byte]) = TarEntriesExpr.entries(b)

  test("ustar: files, dirs, symlinks, binary data") {
    val es = entries(fixture("ustar.tar"))
    assert(es != null && es.length == 4)
    val byName = es.map(e => e._1 -> e).toMap
    assert(new String(byName("a.txt")._4, "UTF-8") == "hello tar")
    assert(byName("dir/")._3 == "dir")
    assert(byName("dir/b.bin")._2 == 1024 && byName("dir/b.bin")._4.length == 1024)
    assert(byName("link")._3 == "symlink")
  }

  test("GNU long names resolve through the 'L' entry") {
    val es = entries(fixture("gnu_long.tar"))
    assert(es != null && es.length == 2)
    val long = "very/deep/directory/structure/with/an/extremely/long/path/name/" +
      "that/overflows/the/hundred/byte/ustar/field/payload-file.txt"
    assert(es(0)._1 == long)
    assert(new String(es(0)._4, "UTF-8") == "long-name content")
    assert(es(1)._1 == "short.txt")
  }

  test("pax path records override headers (unicode names)") {
    val es = entries(fixture("pax.tar"))
    assert(es != null && es.length == 2)
    assert(es(0)._1 == "データ/ファイル.txt")
    assert(new String(es(0)._4, "UTF-8") == "ユニコード内容")
    assert(es(1)._1 == "plain.txt")
  }

  test("non-tars are NULL; truncation and mutation never throw") {
    assert(entries(new Array[Byte](600)) == null)
    assert(entries("clearly not a tar file".getBytes ++ new Array[Byte](512)) == null)
    val whole = fixture("gnu_long.tar")
    var cut = 1
    while (cut < whole.length) { entries(whole.take(cut)); cut += 97 }
    val rnd = new scala.util.Random(0x7472)
    for (_ <- 0 until 120) {
      val m = whole.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      entries(m)
    }
  }

  test("decompress -> tar_entries opens a .tar.gz in one chain") {
    import spark.implicits._
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(fixture("ustar.tar")); g.close()
      bos.toByteArray
    }
    val row = Seq(Tuple1(gz)).toDF("p")
      .select(explode(Multimodal.tarEntries(
        Multimodal.decompress($"p").getField("data"))).as("e"))
      .select($"e.name", $"e.type", $"e.data".cast("string").as("t"))
      .where($"e.name" === "a.txt").head()
    assert(row.getString(1) == "file" && row.getString(2) == "hello tar")
  }

  // ---- subtitles

  private def cues(s: String): Seq[(Int, Long, Long, String)] = {
    import spark.implicits._
    val r = Seq(Tuple1(s.getBytes("UTF-8"))).toDF("p")
      .select(explode(Multimodal.subtitleCues($"p")).as("c"))
      .select($"c.idx", $"c.start_ms", $"c.end_ms", $"c.text")
      .collect()
    r.map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getString(3))).toSeq
  }

  test("SRT: indices, comma timestamps, multi-line text, markup strip") {
    val srt =
      """1
        |00:00:01,500 --> 00:00:04,000
        |First line
        |second line
        |
        |2
        |00:01:02,250 --> 01:02:03,999
        |<i>Italic</i> {\an8}positioned
        |""".stripMargin
    assert(cues(srt) == Seq(
      (1, 1500L, 4000L, "First line\nsecond line"),
      (2, 62250L, 3723999L, "Italic positioned")))
  }

  test("WebVTT: header, short timestamps, settings, NOTE blocks, voice tags") {
    val vtt =
      """WEBVTT
        |
        |NOTE this comment
        |spans lines
        |
        |intro
        |00:05.000 --> 00:09.500 align:start line:0%
        |<v Speaker>Hello <b>world</b>
        |
        |7
        |01:00:00.000 --> 01:00:01.000
        |Numbered id
        |""".stripMargin
    assert(cues(vtt) == Seq(
      (1, 5000L, 9500L, "Hello world"),
      (7, 3600000L, 3601000L, "Numbered id")))
  }

  test("neither format is NULL; junk never throws") {
    import spark.implicits._
    val r = Seq(Tuple1("no arrows or headers here".getBytes)).toDF("p")
      .select(Multimodal.subtitleCues($"p").as("c")).head()
    assert(r.isNullAt(0))
    val e = SubtitleCuesExpr(org.apache.spark.sql.catalyst.expressions.Literal(
      Array.tabulate[Byte](300)(i => (i * 7).toByte)))
    e.eval(null) // must not throw
  }
}
