package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def toy = Seq(
    // two tight groups far apart, plus one outlier between them
    (1L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)), (3L, Array(0.05f, 0.05f)),
    (4L, Array(9.9f, 10.0f)), (5L, Array(10.0f, 9.9f)), (6L, Array(10.1f, 10.1f)),
    (7L, Array(5.0f, 5.0f))
  ).toDF("vec_id", "embedding")

  test("two well-separated groups land in two distinct clusters") {
    val m = KMeans.fit(toy, "vec_id", "embedding", k = 2, iters = 3)
    val byId = m.assignments.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(1L, 2L, 3L).map(byId) .size == 1)
    assert(Set(4L, 5L, 6L).map(byId).size == 1)
    assert(byId(1L) != byId(4L))
  }

  test("assignment is total, deterministic, and dist is exact integer") {
    val m1 = KMeans.fit(toy, "vec_id", "embedding", k = 2, iters = 2)
    val m2 = KMeans.fit(toy, "vec_id", "embedding", k = 2, iters = 2)
    assert(m1.assignments.count() == 7)
    assert(m1.assignments.orderBy("vec_id").collect().toSeq ==
      m2.assignments.orderBy("vec_id").collect().toSeq)
    // every row's dist equals the integer L2 to its own centroid
    val cents = m1.centroids.toMap
    m1.assignments.collect().foreach { r =>
      val vq = toy.filter($"vec_id" === r.getLong(0))
        .select(KMeans.quantize($"embedding", 1024)).head.getSeq[Long](0)
      val c = cents(r.getInt(1))
      val d = vq.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(r.getLong(2) == d)
    }
  }

  test("iters=0 assigns against the hash-seeded initial centroids") {
    val m = KMeans.fit(toy, "vec_id", "embedding", k = 3, iters = 0)
    assert(m.centroids.size == 3)
    // seeds are actual corpus points, so their own dist is 0
    val zero = m.assignments.filter(col("dist") === 0L).count()
    assert(zero >= 3)
  }

  test("capPerCluster keeps at most cap rows per cluster, deterministically") {
    val m = KMeans.fit(toy, "vec_id", "embedding", k = 2, iters = 2)
    val capped = KMeans.capPerCluster(m.assignments, "vec_id", cap = 2)
    assert(capped.groupBy("cluster").count().collect()
      .forall(_.getLong(1) <= 2))
    val expected = m.assignments.groupBy("cluster").count().collect()
      .map(r => math.min(2L, r.getLong(1))).sum
    assert(capped.count() == expected)
    // subset of the full assignment
    assert(capped.join(m.assignments, Seq("vec_id", "cluster", "dist"))
      .count() == capped.count())
  }

  test("more clusters than points: dead cells drop, assignment still total") {
    val two = toy.limit(2)
    val m = KMeans.fit(two, "vec_id", "embedding", k = 5, iters = 2)
    assert(m.assignments.count() == 2)
    assert(m.centroids.size <= 2)
  }
}
