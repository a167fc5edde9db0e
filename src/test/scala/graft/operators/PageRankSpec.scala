package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], iters: Int) =
    PageRank.run(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(String, Double)].collect().toMap

  test("matches the driver-side reference arithmetic exactly") {
    // deterministic pseudo-random graph, some nodes repeated
    val edges = (0 until 200).map(i =>
      (s"n${(i * 7) % 23}", s"n${(i * 13 + 5) % 23}"))
      .filter(e => e._1 != e._2)
    val expected = PageRank.reference(edges, 4)
    val got = run(edges, 4)
    assert(got.keySet == expected.keySet)
    // bit-exact: the distributed sum is a sum of 2^-20 multiples
    got.foreach { case (n, pr) => assert(pr == expected(n), n) }
  }

  test("star graph: the hub outranks the leaves") {
    val star = Seq("a", "b", "c", "d").map(l => ("hub", l))
    val pr = run(star, 6)
    assert(Seq("a", "b", "c", "d").forall(l => pr("hub") > pr(l)))
    // leaves are symmetric -> identical ranks
    assert(Set(pr("a"), pr("b"), pr("c"), pr("d")).size == 1)
  }

  test("stable under repartitioning (exact, not approximately)") {
    val edges = (0 until 150).map(i => (s"x${i % 17}", s"x${(i * 3 + 1) % 17}"))
      .filter(e => e._1 != e._2)
    val a = run(edges, 3)
    val b = PageRank.run(edges.toDF("src", "dst").repartition(13),
      "src", "dst", 3).as[(String, Double)].collect().toMap
    assert(a == b)
  }

  test("zero iterations returns the uniform init over the node set") {
    val pr = run(Seq(("a", "b"), ("b", "c")), 0)
    assert(pr == Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0))
  }
}
