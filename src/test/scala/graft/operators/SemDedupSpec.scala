package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  // 3 identical vectors (planted dup group), plus well-separated singles
  private def corpus = Seq(
    (1L, vec(1, 0, 0, 0)),
    (2L, vec(1, 0, 0, 0)),
    (3L, vec(1, 0, 0, 0)),
    (10L, vec(0, 1, 0, 0)),
    (11L, vec(0, 0, 1, 0)),
    (12L, vec(0, 0, 0, 1))).toDF("vec_id", "embedding")

  test("planted duplicate group collapses to one survivor; singletons survive") {
    val kept = Similarity.semDedup(corpus, "vec_id", "embedding",
        eps = 0.99, dim = 4, nlist = 2, iters = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.intersect(Set(1L, 2L, 3L)).size == 1,
      s"exactly one of the identical triple must survive, kept=$kept")
    assert(Set(10L, 11L, 12L).subsetOf(kept))
  }

  test("unreachable eps keeps everything") {
    val kept = Similarity.semDedup(corpus, "vec_id", "embedding",
      eps = 2.0, dim = 4, nlist = 2, iters = 2)
    assert(kept.count() == 6)
  }

  test("nlist=1 keeps exactly one survivor per exact near-dup component") {
    // with a single cell, the within-cell graph IS the global graph, so
    // survivors == connected components of the exact pair graph
    val rnd = new scala.util.Random(7)
    val docs = (0L until 40L).map { i =>
      val base = Array.tabulate(8)(d => if (d == (i % 4).toInt) 1.0 else 0.05)
      (i, base.map(x => (x + rnd.nextDouble() * 0.02).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(docs, "vec_id", "embedding",
      eps = 0.9, dim = 8, nlist = 1, iters = 1)
    val pairs = Similarity.cosineNearDupExact(docs, "vec_id", "embedding", 0.9)
    val nComps = ConnectedComponents
      .withSingletons(docs.select("vec_id"), "vec_id", pairs, "id_a", "id_b")
      .select("comp").distinct().count()
    assert(kept.count() == nComps)
  }

  test("deterministic across runs") {
    val a = Similarity.semDedup(corpus, "vec_id", "embedding",
      eps = 0.99, dim = 4, nlist = 2, iters = 2).collect().toSet
    val b = Similarity.semDedup(corpus, "vec_id", "embedding",
      eps = 0.99, dim = 4, nlist = 2, iters = 2).collect().toSet
    assert(a == b)
  }
}
