package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Double], Map[Long, Double]) = {
    val rows = Hits.run(edges.toDF("h", "a"), "h", "a", iters)
      .as[(String, Long, Double)].collect()
    (rows.collect { case ("hub", id, s) => id -> s }.toMap,
      rows.collect { case ("auth", id, s) => id -> s }.toMap)
  }

  test("matches the driver-side reference arithmetic exactly") {
    val edges = (0 until 300).map(i =>
      ((i * 7 % 13).toLong, 100L + (i * 11 + 3) % 29))
    val (eh, ea) = Hits.reference(edges, 4)
    val (gh, ga) = run(edges, 4)
    assert(gh.keySet == eh.keySet && ga.keySet == ea.keySet)
    gh.foreach { case (n, s) => assert(s == eh(n), s"hub $n") }
    ga.foreach { case (n, s) => assert(s == ea(n), s"auth $n") }
  }

  test("the side maxima are exactly 1 and the popular authority wins") {
    // auth 100 is linked by every hub; auth 101 by one
    val edges = Seq((1L, 100L), (2L, 100L), (3L, 100L), (3L, 101L))
    val (gh, ga) = run(edges, 3)
    assert(ga.values.max == 1.0 && gh.values.max == 1.0)
    assert(ga(100L) == 1.0 && ga(101L) < 1.0)
    // hub 3 links to more (and to the best) authorities than 1/2 alone
    assert(gh(3L) == 1.0 && gh(1L) < 1.0 && gh(1L) == gh(2L))
  }

  test("stable under repartitioning (exact)") {
    val edges = (0 until 200).map(i =>
      ((i * 5 % 11).toLong, 50L + (i * 17 + 1) % 19))
    val a = run(edges, 3)
    val b = {
      val rows = Hits.run(edges.toDF("h", "a").repartition(13), "h", "a", 3)
        .as[(String, Long, Double)].collect()
      (rows.collect { case ("hub", id, s) => id -> s }.toMap,
        rows.collect { case ("auth", id, s) => id -> s }.toMap)
    }
    assert(a == b)
  }
}
