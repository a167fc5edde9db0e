package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random longs, including negatives
  private def noise(i: Long, salt: Long): Long =
    ((i * 2654435761L + salt * 40503L) % 2000L) - 1000L

  private def points = (0L until 400L)
    .map(i => (i, noise(i, 1))).toDF("pid", "p")
  private def intervals = (0L until 120L).map { i =>
    val s = noise(i, 2); (i, s, s + (i % 7) * 37L)
  }.toDF("iid", "s", "e")

  test("pointInInterval equals the naive theta join, any bucket width") {
    val naive = points.join(intervals,
        col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 13L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicates at w=$w")
      assert(got.toSet == naive, s"mismatch at w=$w")
    }
  }

  test("intervalOverlap equals the naive theta join, exactly once") {
    val a = (0L until 90L).map { i =>
      val s = noise(i, 3); (i, s, s + (i % 11) * 29L)
    }.toDF("aid", "as", "ae")
    val b = (0L until 90L).map { i =>
      val s = noise(i, 4); (i, s, s + (i % 5) * 53L)
    }.toDF("bid", "bs", "be")
    val naive = a.join(b, col("as") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    for (w <- Seq(7L, 50L, 400L)) {
      val got = RangeJoin.intervalOverlap(a, "as", "ae", b, "bs", "be", w)
        .select("aid", "bid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicates at w=$w")
      assert(got.toSet == naive, s"mismatch at w=$w")
    }
  }

  test("plans an equi join on the bucket key, not a nested loop") {
    val p = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 64L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
  }
}
