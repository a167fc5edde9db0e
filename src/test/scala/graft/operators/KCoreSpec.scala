package graft.operators

import graft.SparkSpec

/** k-core peeling on closed-form graphs. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int) = {
    val und = KCore.symmetrize(edges.toDF("src", "dst"), "src", "dst")
    KCore.run(und, "src", "dst", k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("3-core of a 4-clique with a pendant path is exactly the clique") {
    // clique 1-2-3-4 plus path 4-5-6: peeling at k=3 removes 6 (deg 1),
    // then 5 (deg 1 after 6 goes) — multi-round peel
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val got = core(edges, 3)
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_ === 3L))
  }

  test("k above the max clique degree empties the graph") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    assert(core(edges, 3).isEmpty)
  }

  test("2-core keeps cycles, drops trees") {
    // triangle + tree hanging off node 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 10L), (10L, 11L),
      (10L, 12L))
    val got = core(edges, 2)
    assert(got.keySet === Set(1L, 2L, 3L))
  }

  test("non-convergence within maxRounds throws instead of returning a non-core") {
    // path 1-2-...-12 at k=2: each round peels only the two endpoints,
    // so 2 rounds cannot drain it — the partial live set is not a 2-core
    val path = (1L to 11L).map(i => (i, i + 1))
    val und = KCore.symmetrize(path.toDF("src", "dst"), "src", "dst")
    val e = intercept[IllegalArgumentException] {
      KCore.run(und, "src", "dst", 2, maxRounds = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // and with enough rounds the same input converges to the empty 2-core
    assert(KCore.run(und, "src", "dst", 2, maxRounds = 100).collect().isEmpty)
  }

  test("symmetrize drops self-loops and dedups both directions") {
    val und = KCore.symmetrize(
      Seq((1L, 2L), (2L, 1L), (3L, 3L)).toDF("src", "dst"), "src", "dst")
    assert(und.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L), (2L, 1L)))
  }
}
