package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about database query optimization and join ordering"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("jaccard: identical docs = 1.0, disjoint docs = 0.0") {
    val sh = docs.select($"doc_id", TextDedup.shingles($"text", 3).as("sh"))
    val a = sh.filter($"doc_id" === 1).select($"sh".as("a"))
    val pairs = a.crossJoin(sh.select($"doc_id", $"sh".as("b")))
      .select($"doc_id", TextDedup.jaccard($"a", $"b").as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pairs(1L) == 1.0 && pairs(4L) == 1.0)
    assert(pairs(3L) == 0.0)
    assert(pairs(2L) > 0.7 && pairs(2L) < 1.0)
  }

  test("minhash signature is deterministic and length numHashes") {
    val s1 = TextDedup.withSignature(docs, "text", 3, 32)
      .select($"doc_id", $"minhash_sig").collect()
    val s2 = TextDedup.withSignature(docs, "text", 3, 32)
      .select($"doc_id", $"minhash_sig").collect()
    assert(s1.map(_.getSeq[Long](1)).forall(_.length == 32))
    assert(s1.map(r => (r.getLong(0), r.getSeq[Long](1))).toMap ==
      s2.map(r => (r.getLong(0), r.getSeq[Long](1))).toMap)
  }

  test("minhash agreement tracks jaccard: dup > near-dup > disjoint") {
    val sigs = TextDedup.withSignature(docs, "text", 3, 64)
      .select($"doc_id", $"minhash_sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def agree(a: Long, b: Long): Int =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y }
    assert(agree(1, 4) == 64)        // exact dup: all hashes equal
    assert(agree(1, 2) > 32)          // near-dup: most equal
    assert(agree(1, 3) < 8)           // disjoint: almost none
  }

  test("lsh candidates find the planted near-dup and exact dup") {
    val cands = TextDedup.lshCandidates(docs, "doc_id", "text",
        n = 3, numHashes = 32, bands = 16)
      .select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 4L)))
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((1L, 3L)))
  }

  test("simhash: hamming(identical)=0, near-dup close, disjoint far") {
    val fps = docs.select($"doc_id", TextDedup.simHash64($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int =
      java.lang.Long.bitCount(fps(a) ^ fps(b))
    assert(ham(1, 4) == 0)
    assert(ham(1, 2) < ham(1, 3))
  }

  test("normalizedHashString matches the normalizedHash column twin") {
    val texts = Seq("A  b\tC", "the quick Brown fox", "x")
    val viaCol = texts.toDF("text")
      .select(TextDedup.normalizedHash($"text")).as[String].collect().toSeq
    assert(viaCol == texts.map(TextDedup.normalizedHashString))
  }

  test("normalizedHash collapses case and whitespace") {
    val hs = Seq("A  b\tC", "a b c").toDF("text")
      .select(TextDedup.normalizedHash($"text")).distinct().count()
    assert(hs == 1)
  }

  test("sharedSpanPairs finds docs sharing a verbatim token run") {
    val d = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y a b c d e f z w"),         // shares the 6-run "a b c d e f"
      (3L, "p q r s t u v w x2 y2"),       // nothing shared
      (4L, "a b c d e f g h i j")          // exact dup of 1
    ).toDF("doc_id", "text")
    val pairs = TextDedup.sharedSpanPairs(d, "doc_id", "text", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)))
    assert(pairs((1L, 4L)) == 5L)          // all five 6-gram spans shared
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // maxBucket drops degenerate spans entirely
    val capped = TextDedup.sharedSpanPairs(d, "doc_id", "text", 6,
      maxBucket = 1)
    assert(capped.count() == 0)
  }

  test("sharedSpanPairs matches a brute-force model on random docs") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val texts = (0L until 60L).map { id =>
      id -> (0 until (8 + rnd.nextInt(8)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val k = 4
    def spans(t: String): Set[Seq[String]] =
      t.split(" ").toSeq.sliding(k).filter(_.size == k).toSeq.toSet
    val expected = (for {
      (ia, ta) <- texts; (ib, tb) <- texts if ia < ib
      shared = (spans(ta) intersect spans(tb)).size if shared > 0
    } yield (ia, ib) -> shared.toLong).toMap
    val got = TextDedup.sharedSpanPairs(
        texts.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"${got.size} vs ${expected.size} pairs")
  }

  test("boilerplateSpans surfaces spans by document frequency") {
    val d = Seq(
      (1L, "common header text alpha"),
      (2L, "common header text beta"),
      (3L, "common header text gamma"),
      (4L, "totally different body here")
    ).toDF("doc_id", "text")
    // 3-token spans: "common header text" appears in docs 1,2,3 (df=3);
    // every other span is unique
    val got = TextDedup.boilerplateSpans(d, "text", 3, 2)
      .select($"df").as[Long].collect().toSeq
    assert(got == Seq(3L))
    // minDf above the max df -> empty
    assert(TextDedup.boilerplateSpans(d, "text", 3, 4).count() == 0)
  }

  test("contaminatedBloom: superset of exact, equal at low fpp") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally different words entirely here now"),
      (3L, "x y alpha beta gamma delta epsilon tail"),
      (4L, "unrelated content again nothing shared ok")
    ).toDF("id", "text")
    val bench = Seq("alpha beta gamma delta epsilon").toDF("text")
    val exact = TextDedup.contaminated(docs, "id", "text", bench, "text", 5)
      .as[Long].collect().toSet
    val bloom = TextDedup.contaminatedBloom(docs, "id", "text",
        bench, "text", 5, expectedGrams = 1000, fpp = 1e-6)
      .as[Long].collect().toSet
    assert(exact.subsetOf(bloom), s"false negative: $exact vs $bloom")
    assert(bloom == exact)                 // at fpp 1e-6 on 4 docs: equal
    // empty benchmark -> nothing contaminated (null bloom guard)
    val none = TextDedup.contaminatedBloom(docs, "id", "text",
      bench.limit(0), "text", 5).as[Long].collect()
    assert(none.isEmpty)
    // the probe plan is join-FREE: the corpus side is scan -> generate
    // -> filter(might_contain) -> distinct; only the tiny id distinct
    // shuffles
    val plan = TextDedup.contaminatedBloom(docs, "id", "text",
      bench, "text", 5).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("might_contain"), plan)
  }

  test("contaminated flags docs overlapping the benchmark set") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally different words entirely here now"),
      (3L, "x y alpha beta gamma delta epsilon tail"),
      (4L, "unrelated content again nothing shared ok")
    ).toDF("id", "text")
    val bench = Seq("alpha beta gamma delta epsilon").toDF("text")
    val got = TextDedup.contaminated(docs, "id", "text", bench, "text", 5)
      .as[Long].collect().toSet
    assert(got == Set(1L, 3L))
    // broadcast semi-join shape: no shuffle of the corpus gram stream
    val plan = TextDedup.contaminated(docs, "id", "text", bench, "text", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), plan)
  }

  test("simhashNearDup equals the all-pairs hamming join (exact banding)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "rho", "sigma", "tau")
    // 40 base docs + mutated clones (1-2 word edits -> small hamming)
    val base = (0 until 40).map { i =>
      i.toLong -> Seq.fill(12 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
    }
    val clones = base.take(10).map { case (id, ws) =>
      (id + 100) -> ws.updated(rnd.nextInt(ws.size), vocab(rnd.nextInt(vocab.size)))
    }
    val df = (base ++ clones).map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
    for (maxDist <- Seq(0, 3, 7)) {
      val got = TextDedup.simhashNearDup(df, "doc_id", "text", maxDist)
        .select($"id_a", $"id_b", $"dist")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val fps = df.select($"doc_id", TextDedup.simHash64($"text").as("sh"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = (for {
        a <- fps.keys; b <- fps.keys if a < b
        d = java.lang.Long.bitCount(fps(a) ^ fps(b))
        if d <= maxDist
      } yield (a, b) -> d).toMap
      assert(got == want, s"maxDist=$maxDist " +
        s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
      if (maxDist == 7) assert(want.nonEmpty) // clones must actually collide
    }
  }
}
