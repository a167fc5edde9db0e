package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def n(i: Long, salt: Long): Long =
    ((i * 2654435761L + salt * 40503L) % 5000L) - 2500L

  private def points = (0L until 600L).map(i => (i, n(i, 1))).toDF("pid", "p")
  private def intervals = (0L until 200L).map { i =>
    val s = n(i, 2); (i, s, s + (i % 9) * 31L)
  }.toDF("iid", "s", "e")

  private def withRule[T](w: Long)(body: => T): T = {
    RangeJoinRule.install(spark)
    spark.conf.set(RangeJoinRule.WidthConf, w.toString)
    try body finally spark.conf.set(RangeJoinRule.WidthConf, "0")
  }

  test("rewrites the keyless range join to a bucketized equi join") {
    val q = points.join(intervals, col("p") >= col("s") && col("p") <= col("e"))
    val expected = q.select("pid", "iid").as[(Long, Long)].collect().toSet
    withRule(64L) {
      val q2 = points.join(intervals,
        col("p") >= col("s") && col("p") <= col("e"))
      val plan = q2.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(plan.contains("__graft_bkt"), plan)
      val got = q2.select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, "duplicates")
      assert(got.toSet == expected)
    }
  }

  test("reversed comparison orientations and extra residuals still fire") {
    withRule(40L) {
      val q = points.join(intervals,
        col("s") <= col("p") && col("e") >= col("p") && col("iid") =!= col("pid"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_bkt"), plan)
      val naive = points.join(intervals,
        col("p") >= col("s") && col("p") <= col("e") && col("iid") =!= col("pid"))
      spark.conf.set(RangeJoinRule.WidthConf, "0")
      val expected = naive.select("pid", "iid").as[(Long, Long)].collect().toSet
      spark.conf.set(RangeJoinRule.WidthConf, "40")
      assert(q.select("pid", "iid").as[(Long, Long)].collect().toSet == expected)
    }
  }

  test("does not touch joins that already have an equi key") {
    withRule(64L) {
      val q = points.join(intervals,
        col("pid") === col("iid") && col("p") >= col("s") && col("p") <= col("e"))
      assert(!q.queryExecution.executedPlan.toString.contains("__graft_bkt"))
    }
  }

  test("off by default: conf unset leaves the nested loop in place") {
    RangeJoinRule.install(spark)
    val q = points.join(intervals, col("p") >= col("s") && col("p") <= col("e"))
    assert(!q.queryExecution.executedPlan.toString.contains("__graft_bkt"))
  }
}
