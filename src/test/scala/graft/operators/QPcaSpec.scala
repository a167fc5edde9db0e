package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Engine-exact quantized PCA: the model must be a pure function of the
  * data (partitioning-invariant), its components near-orthonormal on
  * the 2^-15 grid, and the distributed projection must equal a
  * driver-side BigInt recomputation exactly. */
class QPcaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  // deterministic anisotropic cloud: strong variance on axis 0, less on
  // 1, so the top components are well-separated
  private def corpus(nRows: Int) = (0 until nRows).map { i =>
    val base = Array.tabulate(dim)(d => math.sin(i * (d + 1) * 0.7).toFloat)
    base(0) = (base(0) * 10).toFloat
    base(1) = (base(1) * 4).toFloat
    (i.toLong, base)
  }

  test("model is invariant to input partitioning") {
    val data = corpus(200)
    val m1 = Similarity.pcaFitExact(
      data.toDF("vec_id", "embedding").repartition(1),
      "embedding", dim, k = 3, iters = 8)
    val m7 = Similarity.pcaFitExact(
      data.toDF("vec_id", "embedding").repartition(7),
      "embedding", dim, k = 3, iters = 8)
    assert(m1.comps.map(_.toSeq).toSeq == m7.comps.map(_.toSeq).toSeq)
    assert(m1.sums.toSeq == m7.sums.toSeq && m1.n == m7.n)
  }

  test("components near-orthonormal on the grid; top axes recovered") {
    val df = corpus(200).toDF("vec_id", "embedding")
    val m = Similarity.pcaFitExact(df, "embedding", dim, k = 3, iters = 8)
    val g = m.grid.toDouble
    for (i <- 0 until 3; j <- i until 3) {
      val d = m.comps(i).zip(m.comps(j)).map { case (a, b) => a * b }.sum / (g * g)
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-3, s"dot($i,$j)=$d")
    }
    // the dominant axis (variance ~100x) must load on dim 0
    val c0 = m.comps(0).map(math.abs)
    assert(c0(0) == c0.max)
  }

  test("distributed projection equals a BigInt driver recomputation") {
    val data = corpus(120)
    val df = data.toDF("vec_id", "embedding").repartition(5)
    val m = Similarity.pcaFitExact(df, "embedding", dim, k = 2, iters = 6)
    val got = Similarity.pcaProjectExact(df, "vec_id", "embedding", m)
      .as[(Long, Double, Double)].collect()
      .map { case (id, p1, p2) => id -> Seq(p1, p2) }.toMap
    val denom = m.n.toDouble * m.scale * m.grid
    val expect = data.map { case (id, v) =>
      val xq = v.map(x => math.floor(x.toDouble * m.scale + 0.5).toLong)
      id -> m.comps.toSeq.map { cp =>
        val p = BigInt(m.n) * xq.zip(cp).map { case (x, w) => BigInt(x) * w }.sum -
          m.sums.zip(cp).map { case (s, w) => BigInt(s) * w }.sum
        p.toDouble / denom
      }
    }.toMap
    assert(got.size == 120 && got == expect)
  }
}
