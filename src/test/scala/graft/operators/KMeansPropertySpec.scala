package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Model-based checks: the distributed quantized Lloyd's against a
  * naive driver-side model on random small vector sets, and the PSI
  * table's sign invariant on random bucket distributions. */
class KMeansPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val vecsGen: Gen[List[Array[Float]]] =
    Gen.choose(2, 12).flatMap(n => Gen.listOfN(n,
      Gen.listOfN(3, Gen.choose(-8.0f, 8.0f)).map(_.toArray)))

  private def q(v: Array[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1024 + 0.5).toLong)

  test("assignment is the exact integer argmin over the model centroids") {
    check(Prop.forAll(vecsGen) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val m = KMeans.fit(df, "vec_id", "embedding", k = 3, iters = 2)
      val cents = m.centroids
      val got = m.assignments.collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      vecs.zipWithIndex.forall { case (v, i) =>
        val vq = q(v)
        val dists = cents.map { case (cid, c) =>
          (vq.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
        }
        val best = dists.minBy(d => (d._1, d._2))
        got(i.toLong) == ((best._2, best._1))
      }
    }, 15)
  }

  test("psi terms are non-negative with smoothed positive counts") {
    import org.apache.spark.sql.functions._
    val rowsGen = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.oneOf(true, false))))
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.zipWithIndex
        .map { case ((b, ina), i) => (i.toLong, b, ina) }
        .toDF("id", "bucket", "ina")
      val out = Drift.psiTable(df, col("bucket"), col("ina")).collect()
      // (p-q) and the quantized ln(p/q) always share a sign (floor of a
      // negative log is <= -1), so every PSI term is >= 0; smoothing
      // keeps both counts strictly positive
      out.forall { r =>
        r.getLong(4) >= 0L && r.getLong(1) > 0L && r.getLong(2) > 0L
      }
    }, 30)
  }
}
