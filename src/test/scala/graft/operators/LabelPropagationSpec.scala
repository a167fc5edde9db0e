package graft.operators

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int) =
    LabelPropagation.run(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("matches the driver-side reference vote/tie rule exactly") {
    // deterministic pseudo-random graph with repeated edges
    val edges = (0 until 300).map(i =>
      ((i * 7 % 29).toLong, (i * 13 + 5).toLong % 29))
      .filter(e => e._1 != e._2)
    for (iters <- Seq(1, 2, 4)) {
      val expected = LabelPropagation.reference(edges, iters)
      val got = run(edges, iters)
      assert(got == expected, s"iters=$iters")
    }
  }

  test("disjoint triangles converge to their minimum ids") {
    // a triangle reaches all-min-id by iteration 2 and is then stable
    val cliqueA = Seq[(Long, Long)]((1, 2), (1, 3), (2, 3))
    val cliqueB = Seq[(Long, Long)]((10, 11), (10, 12), (11, 12))
    val lab = run(cliqueA ++ cliqueB, 4)
    assert(Seq(1L, 2L, 3L).forall(lab(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(lab(_) == 10L))
  }

  test("stable under repartitioning (exact)") {
    val edges = (0 until 200).map(i =>
      ((i % 19).toLong, ((i * 3 + 1) % 19).toLong))
      .filter(e => e._1 != e._2)
    val a = run(edges, 3)
    val b = LabelPropagation.run(edges.toDF("src", "dst").repartition(13),
      "src", "dst", 3).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("zero iterations: every node keeps its own id") {
    val lab = run(Seq((1L, 2L), (2L, 3L)), 0)
    assert(lab == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
