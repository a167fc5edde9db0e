package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId identifies real multilingual samples") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy with the sun"),
      ("de", "der hund und die katze sind nicht in dem haus und das ist gut"),
      ("es", "el perro y el gato están en la casa con los niños para jugar"),
      ("fr", "le chien et le chat sont dans la maison avec les enfants qui jouent"),
      ("zh", "我 是 一个 学生 他 是 老师 这 是 我们 的 学校 人 都 很 好")
    ).toDF("want", "text")
    val got = samples.select($"want",
      TextAnalysis.langId($"text").as("got")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"want ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("quality score in [0,1]; short junk scores low, good text high") {
    val df = Seq(
      ("x", "!!"),
      ("good", "the quick brown fox jumps over a lazy dog and runs through the field")
    ).toDF("tag", "text")
    val m = df.select($"tag", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("x") <= 0.34)
    assert(m("good") == 1.0)
    m.values.foreach(q => assert(q >= 0.0 && q <= 1.0))
  }

  test("token counts: whitespace and bpe-ish") {
    val m = Seq(("a bb  ccc dddd, eee!", 1))
      .toDF("text", "i")
      .select(TextAnalysis.tokenCount($"text").as("ws"),
        TextAnalysis.bpeishTokenCount($"text").as("bpe"))
      .collect().head
    assert(m.getInt(0) == 5)
    // tokens: a, bb, ccc, dddd, ',', eee, '!'
    assert(m.getInt(1) == 7)
  }

  test("winnowing fingerprint: deterministic, shared grams overlap") {
    val df = Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (2L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (3L, "zyxwvutsrqponmlkjihgfedcba9876543210")
    ).toDF("id", "text")
    val fps = df.select($"id",
        TextAnalysis.winnowingFingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) == fps(2L))
    assert((fps(1L) & fps(3L)).size < fps(1L).size / 2)
  }

  test("dupNgramFraction matches hand-computed repetition") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("a b a b a b",     0),  // 2-grams: [a b, b a, a b, b a, a b] -> 2 distinct of 5
      ("w x y z",         1),  // all distinct -> 0.0
      ("r r r r r",       2)   // [r r]x4 -> 1 distinct of 4 -> 0.75
    ).toDF("text", "i")
    val got = df.select($"i",
        round(TextAnalysis.dupNgramFraction($"text", 2), 6).as("f"))
      .as[(Int, Double)].collect().toMap
    assert(got(0) == 0.6)
    assert(got(1) == 0.0)
    assert(got(2) == 0.75)
  }

  test("hashingTrickScore: mean bucket weight, deterministic, bounded") {
    import org.apache.spark.sql.functions._
    val ws = (0 until 16).map(i => i / 16.0 - 0.5)
    val df = Seq("alpha", "beta", "alpha alpha alpha", "alpha beta",
      "beta alpha").toDF("text")
    val got = df.select($"text",
        TextAnalysis.hashingTrickScore($"text", ws).as("s"))
      .as[(String, Double)].collect().toMap
    // repeating one token doesn't move its mean score
    assert(got("alpha") == got("alpha alpha alpha"))
    // token order doesn't matter for the mean
    assert(got("alpha beta") == got("beta alpha"))
    // the two-token score is the mean of the single-token scores
    assert(math.abs(got("alpha beta") -
      (got("alpha") + got("beta")) / 2) < 1e-12)
    // every score is a convex combination of the weight vector
    got.values.foreach(s => assert(s >= -0.5 && s <= 0.5))
  }

  test("redactPii scrubs emails, IPs and phone numbers") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      "mail me at jane.doe+x@sub.example.org today",
      "server 192.168.0.1 and 8.8.8.8 up",
      "call +14155550123 now",
      "nothing sensitive here"
    ).toDF("text")
    val got = df.select(TextAnalysis.redactPii($"text")).as[String].collect()
    assert(got(0) == "mail me at <EMAIL> today")
    assert(got(1) == "server <IP> and <IP> up")
    assert(got(2) == "call <PHONE> now")
    assert(got(3) == "nothing sensitive here")
  }

  test("hashingTrickScoreFast: same estimator laws as the portable scorer") {
    import org.apache.spark.sql.functions._
    val ws = (0 until 16).map(i => i / 16.0 - 0.5)
    val df = Seq("alpha", "alpha alpha alpha", "alpha beta", "beta alpha")
      .toDF("text")
    val got = df.select($"text",
        TextAnalysis.hashingTrickScoreFast($"text", ws).as("s"))
      .as[(String, Double)].collect().toMap
    assert(got("alpha") == got("alpha alpha alpha")) // mean invariance
    assert(got("alpha beta") == got("beta alpha"))   // order invariance
    got.values.foreach(s => assert(s >= -0.5 && s <= 0.5)) // convexity
  }

  test("cleanText: NFC-composes, strips controls, collapses whitespace") {
    import org.apache.spark.sql.functions._
    val decomposed = "cafe\u0301"  // e + combining acute
    val precomposed = "caf\u00e9"  // é
    val df = Seq(
      decomposed,
      precomposed,
      "a\u0000b\u0007c",     // NUL and BEL stripped, no space left behind
      "  x \t\n  y  ",       // runs collapse, ends trim
      "tab\tkept as space"
    ).toDF("text")
    val got = df.select(TextAnalysis.cleanText($"text")).as[String].collect()
    assert(got(0) == precomposed, "NFC must compose combining marks")
    assert(got(0) == got(1), "decomposed and precomposed must clean equal")
    assert(got(2) == "abc")
    assert(got(3) == "x y")
    assert(got(4) == "tab kept as space")
    // SQL surface parity
    graft.functions.register(spark)
    val viaSql = spark.sql(s"SELECT clean_text('cafe\u0301')")
      .as[String].collect().head
    assert(viaSql == precomposed)
  }

  test("chunkWords: full coverage, overlap, short-tail lengths") {
    import org.apache.spark.sql.functions._
    // 10 words, chunkSize 4, stride 3 -> starts 0,3,6,9
    val words = (1 to 10).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.chunkWords(df, "doc_id", "text", 4, 3)
      .orderBy($"chunk_idx").collect()
    assert(got.length == 4)
    assert(got.map(_.getAs[Int]("chunk_idx")).toSeq == Seq(0, 1, 2, 3))
    assert(got(0).getAs[String]("chunk_text") == "w1 w2 w3 w4")
    assert(got(1).getAs[String]("chunk_text") == "w4 w5 w6 w7")
    assert(got(3).getAs[String]("chunk_text") == "w10") // short tail
    assert(got.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 4L, 4L, 1L))
    // every word appears in some chunk (coverage), consecutive chunks
    // share chunkSize - stride words (overlap)
    val allWords = got.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet
    assert(allWords == words.toSet)
  }

  private def contentChunksOf(texts: Seq[String]): Seq[Seq[String]] = {
    import org.apache.spark.sql.functions._
    texts.toDF("text")
      .select(TextAnalysis.contentChunks($"text").as("cs"))
      .as[Seq[String]].collect().toSeq
  }

  test("contentChunks: lossless reconstruction, deterministic boundaries") {
    val rnd = new scala.util.Random(42)
    val texts = (1 to 20).map(_ =>
      (1 to 300).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val chunks = contentChunksOf(texts)
    texts.zip(chunks).foreach { case (t, cs) =>
      assert(cs.mkString == t) // nothing lost, nothing reordered
    }
    assert(chunks.exists(_.length > 1)) // divisor 64 on 300 chars cuts
    assert(contentChunksOf(texts) == chunks) // pure function
  }

  test("contentChunks: an insertion only disturbs chunks near the edit") {
    val rnd = new scala.util.Random(7)
    val t = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = t.substring(0, 1000) + "XYZ" + t.substring(1000)
    val Seq(a, b) = contentChunksOf(Seq(t, edited))
    val shared = a.toSet.intersect(b.toSet)
    // CDC's whole point: far-from-edit chunks re-sync and still dedup
    assert(shared.size >= a.size - 3,
      s"only ${shared.size}/${a.size} chunks survived the edit")
    assert(b.mkString == edited)
  }

  test("contentChunks: short and empty inputs") {
    assert(contentChunksOf(Seq("tiny")) == Seq(Seq("tiny"))) // < window
    assert(contentChunksOf(Seq("")) == Seq(Seq.empty[String]))
  }
}
