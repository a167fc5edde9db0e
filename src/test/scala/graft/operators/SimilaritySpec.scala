package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Array(1f, 0f, 2f), Array(1f, 0f, 2f), 1.0),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f), 0.0),
      (Array(1f, 2f, 3f), Array(-1f, -2f, -3f), -1.0)
    ).toDF("a", "b", "want")
    val got = df.select(Similarity.cosine($"a", $"b").as("c"), $"want")
      .collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("brute force top-k finds the planted nearest neighbor") {
    val corpus = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))
    }.toDF("vec_id", "embedding")
    // query 100 = tiny perturbation of corpus vector 7
    val qvec = Array.tabulate(8)(d => (math.sin(7 * 8 + d) + 0.001).toFloat)
    val queries = Seq((100L, qvec)).toDF("qid", "qvec")
    val top = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", "qid", "qvec", 3).collect()
    assert(top.head.getAs[Long]("vec_id") == 7L)
    assert(top.head.getAs[Int]("rank") == 1)
  }

  test("ivf top-k achieves high recall vs brute force on clustered data") {
    val corpus = (0 until 200).map { i =>
      val c = i % 8
      (i.toLong, Array.tabulate(16) { d =>
        (math.cos(c * 16 + d) + 0.02 * math.sin(i * 31 + d)).toFloat
      })
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val brute = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", "qid", "qvec", 5)
      .select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(corpus, queries,
        "vec_id", "embedding", "qid", "qvec", 5,
        dim = 16, nlist = 8, nprobe = 3, iters = 3)
      .select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("pq top-k achieves high recall vs brute force on clustered data") {
    val corpus = (0 until 200).map { i =>
      val c = i % 8
      (i.toLong, Array.tabulate(16) { d =>
        (math.cos(c * 16 + d) + 0.02 * math.sin(i * 31 + d)).toFloat
      })
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val brute = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", "qid", "qvec", 5)
      .select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(corpus, queries,
        "vec_id", "embedding", "qid", "qvec", 5,
        dim = 16, m = 4, codebookSize = 16, refine = 4)
      .select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("ivf-pq top-k achieves decent recall vs brute force on clustered data") {
    val corpus = (0 until 200).map { i =>
      val c = i % 8
      (i.toLong, Array.tabulate(16) { d =>
        (math.cos(c * 16 + d) + 0.02 * math.sin(i * 31 + d)).toFloat
      })
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val brute = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", "qid", "qvec", 5)
      .select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfPqTopK(corpus, queries,
        "vec_id", "embedding", "qid", "qvec", 5,
        dim = 16, nlist = 8, nprobe = 4, m = 4, codebookSize = 16,
        refine = 4)
      .select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & got).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("ivf-pq: a zero-norm query vector does not poison scores with NaN") {
    val corpus = (0 until 100).map { i =>
      (i.toLong, Array.tabulate(16)(d => math.cos(i + d).toFloat))
    }.toDF("vec_id", "embedding")
    val zeroQ = Seq((999L, Array.fill(16)(0f))).toDF("qid", "qvec")
    // unguarded, 0/0 made __qhat NaN and NaN ADC scores sorted first —
    // arbitrary candidates; the greatest(norm, 1e-12) guard keeps the
    // pipeline finite and deterministic
    def run() = Similarity.ivfPqTopK(corpus, zeroQ,
        "vec_id", "embedding", "qid", "qvec", 3,
        dim = 16, nlist = 4, nprobe = 2, m = 4, codebookSize = 8,
        refine = 4)
      .select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val a = run()
    assert(a == run()) // deterministic, not NaN-ordering-dependent
  }

  test("sq8 top-k matches brute force almost exactly (flat compression)") {
    val corpus = (0 until 200).map { i =>
      val c = i % 8
      (i.toLong, Array.tabulate(16) { d =>
        (math.cos(c * 16 + d) + 0.02 * math.sin(i * 31 + d)).toFloat
      })
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val brute = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", "qid", "qvec", 5)
      .select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // this corpus is 8 clusters of near-identical vectors: within a
    // cluster the sim gaps are smaller than the int8 error, so the
    // refine window must cover the whole cluster (25 members) for the
    // exact re-rank to recover the true order
    val sq8 = Similarity.sq8TopK(corpus, queries,
        "vec_id", "embedding", "qid", "qvec", 5, refine = 6)
      .select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & sq8).size.toDouble / brute.size
    assert(recall >= 0.95, s"recall $recall")
  }

  test("sq8 encode/dot: scale bound, byte range, dot close to exact") {
    val df = Seq(
      (Array(0.5f, -1.0f, 0.25f, 0f), Array(0.5f, -1.0f, 0.25f, 0f)),
      (Array(1f, 2f, 3f, 4f), Array(-4f, 3f, -2f, 1f))
    ).toDF("a", "b")
    val got = df.select(
        Similarity.sq8Dot(Similarity.sq8Encode($"a"),
          Similarity.sq8Encode($"b")).as("qd"),
        Similarity.dot($"a", $"b").as("xd"))
      .collect()
    // error scales with ||a||·||b|| (per-component quanta are
    // max|x|/127 on each side), not with the dot value itself
    val norms = df.select(
        (Similarity.norm($"a") * Similarity.norm($"b")).as("nn"))
      .collect().map(_.getDouble(0))
    got.zip(norms).foreach { case (r, nn) =>
      val (qd, xd) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(qd - xd) <= 0.02 * nn, s"sq8 dot $qd vs exact $xd")
    }
  }

  test("pq codes are m ints in [0, k) and encode is deterministic") {
    val corpus = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val cbs = Similarity.trainPq(corpus, "vec_id", "embedding",
      dim = 8, m = 4, k = 8, iters = 3)
    assert(cbs.length == 4 && cbs.forall(_.length == 8) &&
      cbs.forall(_.forall(_.length == 2)))
    val codes = corpus.select(
        Similarity.pqEncode($"embedding", cbs).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    val codes2 = corpus.select(
        Similarity.pqEncode($"embedding", cbs).as("c"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.toSeq == codes2.toSeq)
  }

  test("lsh top-k achieves high recall vs brute force on clustered data") {
    // clustered corpus: 10 clusters of 20 points each
    val corpus = (0 until 200).map { i =>
      val c = i % 10
      (i.toLong, Array.tabulate(16) { d =>
        (math.cos(c * 16 + d) + 0.02 * math.sin(i * 31 + d)).toFloat
      })
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val brute = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", "qid", "qvec", 5)
      .select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(corpus, queries,
        "vec_id", "embedding", "qid", "qvec", 5,
        dim = 16, planes = 8, tables = 8)
      .select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("cosine near-dup: LSH finds planted near-duplicates, exact precision") {
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val base = (0 until 80).map { i =>
      i.toLong -> unit(Array.fill(32)(rnd.nextGaussian().toFloat))
    }
    // plant 20 near-duplicates: tiny perturbations (cosine ~0.99)
    val dups = (0 until 20).map { i =>
      val (_, v) = base(i)
      (1000L + i) -> unit(v.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    }
    val corpus = (base ++ dups).toDF("vec_id", "embedding")
    val planted = (0 until 20).map(i => (i.toLong, 1000L + i)).toSet

    val exact = Similarity.cosineNearDupExact(
      corpus, "vec_id", "embedding", 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(exact), s"exact missed ${planted -- exact}")

    val lsh = Similarity.cosineNearDup(
      corpus, "vec_id", "embedding", 0.9, dim = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision is exact by construction (cosine recomputed)
    assert(lsh.subsetOf(exact))
    // recall on planted pairs
    val recall = (planted & lsh).size.toDouble / planted.size
    assert(recall >= 0.9, s"near-dup recall $recall")
  }

  test("incremental embed near-dup: planted dups drop vs corpus and within batch") {
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val rnd = new scala.util.Random(11)
    val v = unit(Array.fill(16)(rnd.nextGaussian().toFloat))
    val u = unit(Array.fill(16)(rnd.nextGaussian().toFloat))
    val w = unit(Array.fill(16)(rnd.nextGaussian().toFloat))
    def near(x: Array[Float]) =
      unit(x.map(c => c + 0.01f * rnd.nextGaussian().toFloat))
    val corpus = Seq(100L -> v).toDF("vec_id", "embedding")
    val index = Similarity.embedNearDupIndex(corpus, "embedding",
      dim = 16, planes = 4, tables = 8)
    val batch = Seq(
      1L -> near(v), // near-dup of the CORPUS vector -> dropped vs index
      2L -> u,       // survives (smallest id of its cluster)
      3L -> near(u), // within-batch near-dup of 2 -> dropped
      4L -> w        // survives
    ).toDF("vec_id", "embedding")
    val out = Similarity.incrementalEmbedNearDup(batch, "vec_id",
      "embedding", index, threshold = 0.95, dim = 16,
      planes = 4, tables = 8)
    assert(out.select("vec_id").as[Long].collect().sorted.toSeq ===
      Seq(2L, 4L))
    // empty index: only the within-batch rule applies
    val noIdx = Similarity.embedNearDupIndex(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      "embedding", dim = 16, planes = 4, tables = 8)
    val out2 = Similarity.incrementalEmbedNearDup(batch, "vec_id",
      "embedding", noIdx, threshold = 0.95, dim = 16,
      planes = 4, tables = 8)
    assert(out2.select("vec_id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 4L))
  }
}
