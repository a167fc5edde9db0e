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
}
