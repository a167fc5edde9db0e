package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gopher rules, A-ES weighted sampling, RRF fusion, MMR re-ranking. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("gopher rules: each rule fires on its targeted defect") {
    val longText = (("the of and that have with " * 10) + "word " * 30).trim
    val docs = Seq(
      (1L, longText),                                    // clean → keep
      (2L, "too short of the and that have with"),       // word count
      (3L, ("a b c d " * 20 + "the of and that have with").trim), // mean len < 3
      (4L, (("####### " * 30) + "the of and that have with word word " * 3).trim), // symbols
      (5L, (("123 456 " * 30) + "the of and that have with").trim), // alpha frac
      (6L, ("word " * 60).trim)                          // no stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("ok_word_count"))
    assert(!out(3L).getAs[Boolean]("ok_mean_word_len"))
    assert(!out(4L).getAs[Boolean]("ok_symbol_ratio"))
    assert(!out(5L).getAs[Boolean]("ok_alpha_words"))
    assert(!out(6L).getAs[Boolean]("ok_stopwords"))
  }

  test("gopher rules: bullet and ellipsis line ratios") {
    val bullety = (1 to 19).map(i => s"- item $i").mkString("\n") +
      "\nthe of and that have with " + ("word " * 40).trim
    val elliptical = (1 to 9).map(i => s"line $i trails off...").mkString("\n") +
      "\nthe of and that have with " + ("word " * 40).trim
    val docs = Seq((1L, bullety), (2L, elliptical)).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // 19 of 20 lines bulleted = 95% > 90% → fail
    assert(!out(1L).getAs[Boolean]("ok_bullets"))
    assert(out(1L).getAs[Long]("n_bullet_lines") === 19L)
    // 9 of 10 lines end in ... = 90% > 30% → fail
    assert(!out(2L).getAs[Boolean]("ok_ellipsis"))
    assert(out(2L).getAs[Long]("n_ellipsis_lines") === 9L)
  }

  test("gopher rules: exact-boundary documents are kept (> not >=)") {
    // 9 of 10 lines bulleted = exactly 90% → keep (Gopher drops only MORE than 90%)
    val boundary = (1 to 9).map(i => s"- item $i").mkString("\n") +
      "\nthe of and that have with " + ("word " * 40).trim
    // 3 of 10 lines end in ... = exactly 30% → keep
    val ell = (1 to 3).map(i => s"line $i trails off...").mkString("\n") +
      (4 to 9).map(i => s"\nline $i plain").mkString +
      "\nthe of and that have with " + ("word " * 40).trim
    val docs = Seq((1L, boundary), (2L, ell)).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_bullet_lines") === 9L)
    assert(out(1L).getAs[Boolean]("ok_bullets"))
    assert(out(2L).getAs[Long]("n_ellipsis_lines") === 3L)
    assert(out(2L).getAs[Boolean]("ok_ellipsis"))
  }

  test("html extraction: scripts/comments dropped, blocks break, entities decode") {
    val html =
      """<html><head><style>p {color:red}</style><script>if (1<2) alert("x");</script>
        |</head><body><!-- nav --><div><a href="/">Home &amp; start</a></div>
        |<h1>Title</h1>
        |<p>first  para with &lt;tag&gt; &quot;quoted&quot; &#39;s&nbsp;end</p>
        |<p>second para</p></body></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(TextAnalysis.extractHtmlText(col("h")).as("t"))
      .head().getString(0)
    assert(!out.contains("alert") && !out.contains("color") &&
      !out.contains("nav"))
    assert(out.contains("Home & start"))
    assert(out.contains("first para with <tag> \"quoted\" 's end"))
    assert(out.linesIterator.toSeq.contains("second para"))
    assert(!out.contains("<p>") && !out.contains("</h1>"))
  }

  test("html stats: link-heavy boilerplate scores high link fraction") {
    val navPage = "<body><div><a href='/'>AAAA</a><a href='/b'>BBBB</a></div>" +
      "<p>x</p></body>"
    val article = "<body><a href='/'>hi</a><p>" + ("word " * 50).trim +
      "</p></body>"
    val df = Seq((1L, navPage), (2L, article)).toDF("id", "h")
    val (nTags, nLinks, frac) = TextAnalysis.htmlStats(col("h"))
    val got = df.select(col("id"), nTags.as("t"), nLinks.as("l"),
        frac.as("f")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(1L)._2 == 2L && got(2L)._2 == 1L)
    assert(got(1L)._3 > 0.6, s"nav page frac ${got(1L)._3}")
    assert(got(2L)._3 < 0.05, s"article frac ${got(2L)._3}")
  }

  test("url canonicalization: case, ports, tracking params, fragments, param order") {
    val cases = Seq(
      "HTTPS://WWW.Example.COM:443/Path/X?utm_source=a&b=2&a=1#frag" ->
        "https://www.example.com/Path/X?a=1&b=2",
      "http://site.org:80/p" -> "http://site.org/p",
      "http://site.org:8080/p?gclid=z" -> "http://site.org:8080/p",
      "https://a.b.co.uk/x?z=1&y=2" -> "https://a.b.co.uk/x?y=2&z=1")
    val df = cases.map(_._1).toDF("url")
      .select(col("url"), Urls.canonicalizeUrl(col("url")).as("c"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, in) }
  }

  test("registrable domain: public-suffix aware, subdomains collapse") {
    val cases = Seq(
      "https://www.example.com/x" -> "example.com",
      "https://news.sub.example.co.uk/x" -> "example.co.uk",
      "https://user.github.io/repo" -> "user.github.io",
      "https://localhost/x" -> "localhost",
      "https://deep.a.b.site.io/" -> "site.io")
    val df = cases.map(_._1).toDF("url")
      .select(col("url"), Urls.registrableDomain(col("url")).as("d"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, in) }
  }

  test("weighted sample: deterministic, respects stratum size cap") {
    val df = (1 to 100).map(i => (i.toLong, s"s${i % 3}", i.toLong * 10))
      .toDF("id", "src", "w")
    val a = DataSplit.weightedSample(df, "id", col("w"), col("src"), 7)
    val b = DataSplit.weightedSample(df, "id", col("w"), col("src"), 7)
    assert(a.collect().toSet === b.collect().toSet)
    val perSrc = a.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc.values.forall(_ === 7L))
    assert(a.count() === 21L)
  }

  test("weighted sample: heavier rows win more often") {
    // two strata where one id has 1000x the weight of the rest: it must
    // be selected (P(miss) under A-ES is ~(1/1001)^selected, and the
    // md5-derived u makes the draw deterministic — this asserts the
    // weight actually biases the key)
    val df = ((1 to 50).map(i => (i.toLong, "a", 1L)) :+ (99L, "a", 100000L))
      .toDF("id", "src", "w")
    val kept = DataSplit.weightedSample(df, "id", col("w"), col("src"), 5)
      .select("id").as[Long].collect().toSet
    assert(kept.contains(99L))
  }

  test("weighted sample: non-positive weight raises instead of silently ranking") {
    val df = Seq((1L, "a", 10L), (2L, "a", 0L)).toDF("id", "src", "w")
    val e = intercept[Exception] {
      DataSplit.weightedSample(df, "id", col("w"), col("src"), 2).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString("\n")
    assert(chain.contains("non-positive weight"))
  }

  test("temperature sampling excludes null-source rows without NPE") {
    val df = (Seq((1L, null: String), (2L, null: String)) ++
      (3 to 40).map(i => (i.toLong, if (i % 2 == 0) "a" else "b")))
      .toDF("id", "src")
    val kept = DataSplit.temperatureSample(df, "id", "src",
      alpha = 0.5, budgetRows = 20)
    val ids = kept.select("id").as[Long].collect().toSet
    assert(!ids.contains(1L) && !ids.contains(2L))
    assert(ids.nonEmpty)
  }

  test("temperature sampling upsamples the low-resource domain") {
    // 900 vs 100 rows, alpha=0.5: p = 0.75/0.25, so rates are ~8.3% for
    // the big domain vs ~25% for the small one — the small domain must
    // keep a higher FRACTION than the big one (and than proportional)
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (1001 to 1100).map(i => (i.toLong, "small"))).toDF("id", "src")
    val kept = DataSplit.temperatureSample(df, "id", "src",
      alpha = 0.5, budgetRows = 100)
    val counts = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bigFrac = counts.getOrElse("big", 0L).toDouble / 900
    val smallFrac = counts.getOrElse("small", 0L).toDouble / 100
    assert(smallFrac > bigFrac * 1.5)
    // deterministic under re-evaluation
    assert(kept.collect().toSet ===
      DataSplit.temperatureSample(df, "id", "src", 0.5, 100)
        .collect().toSet)
  }

  test("incremental dedup: drops indexed content, keeps first in batch") {
    val batch = Seq(
      (1L, "Already In  Corpus"), // normalizes to an indexed hash
      (2L, "fresh doc a"),
      (3L, "Fresh Doc A"),        // within-batch dup of 2 (normalized)
      (4L, "fresh doc b")
    ).toDF("id", "text")
    val index = Seq("already in corpus").toDF("t")
      .select(TextDedup.normalizedHash(col("t")).as("h"))
    val kept = TextDedup.incrementalDedup(batch, "id", "text", index, "h")
      .select("id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L))
  }

  test("rrf fusion: agreement outranks single-list appearances") {
    val r1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val r2 = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("id", "rank")
    val out = Relevance.rrfFuse(Seq(r1, r2), "id", k = 60, topK = 4)
      .collect()
    // docs in both lists (10, 20) must beat docs in one list (30, 40)
    assert(out.take(2).map(_.getLong(0)).toSet === Set(10L, 20L))
    assert(out.map(r => r.getAs[Long]("n_lists")).take(2).forall(_ == 2L))
    // 20 (ranks 2+1) ties 10 (ranks 1+3)? 1/62+1/61 > 1/61+1/63 → 20 first
    assert(out.head.getLong(0) === 20L)
  }

  test("pca: recovers the dominant axis and centers projections") {
    // 40 points spread along e1 (sd ~ 10) with small e2 noise: the top
    // component must align with e1 and explain almost all variance
    val pts = (0 until 40).map { i =>
      (i.toLong, Array((i - 20) * 1.0f, (i % 3 - 1) * 0.1f, 0.0f))
    }
    val df = pts.toDF("id", "vec")
    val m = Similarity.pcaFit(df, "vec", dim = 3, k = 2)
    assert(math.abs(math.abs(m.components(0)(0)) - 1.0) < 1e-3)
    assert(m.variances(0) > 100 * m.variances(1))
    val proj = Similarity.pcaProject(df, "id", "vec", m)
      .select(element_at(col("proj"), 1).as("p1")).as[Double].collect()
    // projections are centered and preserve the spread
    assert(math.abs(proj.sum) < 1e-9 * 40)
    assert(math.abs(proj.map(x => x * x).sum / 40 - m.variances(0)) <
      1e-6 * m.variances(0))
  }

  test("mmr rerank: k selections, first is most relevant, no dup ids") {
    // query along e1; candidate 1 is top-rel but OFF the query axis, so
    // its near-dup (2) loses to the diverse candidate (3) in round 2:
    // mmr(2) = .7(.79) - .3(~1.0) ≈ .25 < mmr(3) = .7(.70) - .3(.13) ≈ .45
    val vecs = Map(
      1L -> Array(0.8f, 0.6f), // rel 0.8 (best)
      2L -> Array(0.79f, 0.613f), // near-dup of 1 (sim ≈ 1.0)
      3L -> Array(0.7f, -0.714f), // diverse (sim to 1 ≈ 0.13)
      4L -> Array(0.0f, 1.0f))
    val q = Array(1.0f, 0.0f)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val cands = vecs.toSeq.map { case (id, v) =>
      (0L, id, BigDecimal(cos(v, q)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, v)
    }.toDF("qid", "id", "rel", "vec")
    val out = Similarity.mmrRerank(cands, "qid", "id", "rel", "vec", k = 3)
      .orderBy("sel_rank").collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(1)).distinct.length === 3)
    // first pick = pure relevance
    assert(out.head.getLong(1) === 1L)
    // second pick diversifies away from the near-dup of 1: picks 3 or 4,
    // not 2 (whose sim to 1 is ~0.99)
    assert(out(1).getLong(1) !== 2L)
  }

  test("incremental near-dup: planted fuzzy dups drop vs corpus and within batch, smallest id survives") {
    val base = "the quick brown fox jumps over the lazy dog near the " +
      "river bank while birds sing in the tall green trees every morning"
    val nearBase = base.replace("lazy", "sleepy") // 1-word edit: near-dup
    val fresh = "completely different content about distributed query " +
      "engines shuffling partitioned data across executor nodes at scale"
    val nearFresh = fresh.replace("data", "rows")
    val distinct2 = "another unrelated document describing tokenizer " +
      "vocabularies byte pair merges and unigram language model pruning"
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    val index = TextDedup.nearDupIndex(corpus, "doc_id", "text",
      n = 3, numHashes = 32, bands = 16)
    val batch = Seq(
      (1L, nearBase),   // near-dup of the CORPUS doc → dropped vs index
      (2L, fresh),      // survives (smallest id of its cluster)
      (3L, nearFresh),  // within-batch near-dup of 2 → dropped
      (4L, distinct2)   // survives
    ).toDF("doc_id", "text")
    val out = TextDedup.incrementalNearDup(batch, "doc_id", "text", index,
      n = 3, numHashes = 32, bands = 16, estThreshold = 0.5)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ===
      Seq(2L, 4L))
    // survivors carry their signature, ready to append to the index
    assert(out.columns.contains("minhash_sig"))
    // an empty index passes everything except within-batch dups
    val noIdx = TextDedup.nearDupIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text",
      n = 3, numHashes = 32, bands = 16)
    val out2 = TextDedup.incrementalNearDup(batch, "doc_id", "text", noIdx,
      n = 3, numHashes = 32, bands = 16, estThreshold = 0.5)
    assert(out2.select("doc_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 4L))
  }
}
