package graft.functions

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck equivalence properties (SURVEY.md §5): re-implemented
  * function semantics checked against a straightforward model. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  test("split_index(s, d, i) == s.split(d)(i) on in-range indices") {
    graft.functions.register(spark)
    check(Prop.forAll(Gen.listOfN(8, word), Gen.choose(0, 9)) {
      (ws: List[String], i: Int) =>
        val s = ws.mkString(",")
        val got = Seq(s).toDF("s")
          .selectExpr(s"split_index(s, ',', $i) v").collect().head
        val parts = s.split(",", -1)
        if (i < parts.length) got.getString(0) == parts(i)
        else got.isNullAt(0)
    }, n = 15)
  }

  test("minhash signature agreement estimates jaccard within tolerance") {
    val base = (0 until 60).map(i => s"tok$i")
    check(Prop.forAll(Gen.choose(0, 60)) { (overlapN: Int) =>
      val a = base.mkString(" ")
      val b = (base.take(overlapN) ++
        (0 until (60 - overlapN)).map(i => s"other$i")).mkString(" ")
      val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      val sigs = graft.operators.TextDedup.withSignature(df, "text", 1, 128)
        .select("minhash_sig").collect().map(_.getSeq[Long](0))
      val agree = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 128.0
      val trueJac = overlapN.toDouble / (120 - overlapN)
      math.abs(agree - trueJac) < 0.2
    }, n = 10)
  }

  test("winnowing fingerprint is deterministic and position-robust") {
    check(Prop.forAll(Gen.listOfN(30, Gen.alphaChar).map(_.mkString)) {
      (s: String) =>
        val df = Seq((s, s, "xxxxx" + s)).toDF("a", "b", "c")
        val r = df.select(
          graft.operators.TextAnalysis.winnowingFingerprint($"a").as("fa"),
          graft.operators.TextAnalysis.winnowingFingerprint($"b").as("fb"),
          graft.operators.TextAnalysis.winnowingFingerprint($"c").as("fc"))
          .collect().head
        val fa = r.getSeq[Long](0).toSet
        val fb = r.getSeq[Long](1).toSet
        val fc = r.getSeq[Long](2).toSet
        fa == fb && (fa & fc).size.toDouble / fa.size > 0.5
    }, n = 10)
  }

  test("SQL functions validate arity and accept optional int parameters") {
    graft.functions.register(spark)
    import spark.implicits._
    val df = Seq("the quick brown fox jumps").toDF("t")
    df.createOrReplaceTempView("fn_arity")
    // optional parameters change the result shape
    val sig64 = spark.sql("SELECT minhash_sig(t, 4, 64) AS s FROM fn_arity")
      .collect().head.getSeq[Long](0)
    assert(sig64.length == 64)
    val sigDefault = spark.sql("SELECT minhash_sig(t) AS s FROM fn_arity")
      .collect().head.getSeq[Long](0)
    assert(sigDefault.length == 32)
    // wrong arity fails analysis instead of silently using defaults
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_sig(t, 4) FROM fn_arity").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT split_index(t, ',') FROM fn_arity").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(t, 1) FROM fn_arity").collect()
    }
  }

  test("curation-layer SQL functions match the Scala operator surface") {
    graft.functions.register(spark)
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq("the quick brown fox the quick brown fox go go go")
      .toDF("t")
    df.createOrReplaceTempView("fn_cur")
    val viaSql = spark.sql(
      """SELECT quality_score(t) AS q, token_count(t) AS n,
                dup_ngram_fraction(t, 2) AS d,
                size(word_gram_hashes(t, 3)) AS g
         FROM fn_cur""").collect().head
    val viaApi = df.select(
      graft.operators.TextAnalysis.qualityScore(col("t")),
      graft.operators.TextAnalysis.tokenCount(col("t")),
      graft.operators.TextAnalysis.dupNgramFraction(col("t"), 2),
      org.apache.spark.sql.functions.size(
        graft.operators.TextDedup.gramHashes(col("t"), 3,
          distinct = false))).collect().head
    assert(viaSql.toSeq == viaApi.toSeq)
    // redact_pii + lang_id are callable and sane from SQL
    val red = spark.sql(
      "SELECT redact_pii('mail a@b.co now') AS r").as[String].head()
    assert(red == "mail <EMAIL> now")
    val lang = spark.sql(
      "SELECT lang_id('the cat and the dog is here') AS l")
      .as[String].head()
    assert(lang == "en")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT quality_score(t, 2) FROM fn_cur").collect()
    }
  }

  test("cleanText is idempotent and matches a driver-side model") {
    import org.apache.spark.sql.functions.col
    val messy = Gen.listOf(Gen.oneOf(
      word, Gen.const(" "), Gen.const("\t"), Gen.const("\n"),
      Gen.const("\u0007"), Gen.const("\u0000"), Gen.const("cafe\u0301")))
      .map(_.mkString)
    check(Prop.forAll(messy) { (s: String) =>
      val once = Seq(s).toDF("t")
        .select(graft.operators.TextAnalysis.cleanText(col("t")))
        .as[String].head()
      val twice = Seq(once).toDF("t")
        .select(graft.operators.TextAnalysis.cleanText(col("t")))
        .as[String].head()
      val model = java.text.Normalizer
        .normalize(s, java.text.Normalizer.Form.NFC)
        .replaceAll("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
        .replaceAll("\\s+", " ").trim
      once == model && twice == once
    }, n = 15)
  }

  test("chunkWords covers every word exactly; overlap is chunkSize - stride") {
    import org.apache.spark.sql.functions.col
    val gen = for {
      n <- Gen.choose(0, 60)
      size <- Gen.choose(1, 12)
      stride <- Gen.choose(1, 12)
    } yield (n, size, stride)
    check(Prop.forAll(gen) { case (n: Int, size: Int, stride: Int) =>
      val words = (1 to n).map(i => s"w$i")
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = graft.operators.TextAnalysis
        .chunkWords(df, "doc_id", "text", size, stride)
        .orderBy(col("chunk_idx"))
        .select(col("chunk_text")).as[String].collect()
        .map(c => if (c.isEmpty) Array.empty[String] else c.split(" "))
      // starts advance by stride; chunk i covers words [i*stride, +size);
      // an empty document yields NO chunks (no phantom empty chunk)
      val model =
        if (n == 0) Seq.empty
        else (0 to (n - 1) / stride)
          .map(i => words.slice(i * stride, i * stride + size).toArray)
      chunks.length == model.length &&
        chunks.zip(model).forall { case (a, b) => a.sameElements(b) }
    }, n = 25)
  }
}
