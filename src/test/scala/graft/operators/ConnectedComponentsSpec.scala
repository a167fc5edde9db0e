package graft.operators

import scala.util.Random

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Model: sequential union-find. */
  private def model(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n.toLong).map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n.toLong).map(i => i -> find(i)).toMap
  }

  test("components equal union-find on random graphs") {
    val rnd = new Random(42)
    (0 until 5).foreach { trial =>
      val n = 30 + trial * 10
      val edges = Seq.fill(n / 2)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val got = ConnectedComponents.withSingletons(
          (0L until n.toLong).toDF("id"), "id",
          edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toMap
      val want = model(n, edges)
      // same partition into groups with min-id labels
      assert(got == want, s"trial $trial")
    }
  }

  test("a long chain converges (worst-case diameter)") {
    val n = 40
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val got = ConnectedComponents.components(
      chain.toDF("src", "dst"), "src", "dst", maxIter = 50)
      .as[(Long, Long)].collect().toMap
    assert(got.size == n && got.values.forall(_ == 0L))
  }

  test("disjoint cliques stay separate") {
    def clique(ids: Seq[Long]) = for {
      a <- ids; b <- ids if a < b
    } yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L))
    val got = ConnectedComponents.components(
      edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
