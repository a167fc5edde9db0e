package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join picks latest right <= left ts, per key") {
    val left = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "L1"),
      ("u1", ts("2024-01-01 12:00:00"), "L2"),
      ("u2", ts("2024-01-01 09:00:00"), "L3") // before any right row
    ).toDF("k", "ts", "tag")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 1.0),
      ("u1", ts("2024-01-01 11:00:00"), 2.0),
      ("u1", ts("2024-01-01 13:00:00"), 3.0), // after both left rows
      ("u2", ts("2024-01-01 10:00:00"), 4.0)
    ).toDF("k", "ts", "v")
    val got = AsOfJoin.backward(left, right, "k", "ts", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(got("L1") == Some(1.0))
    assert(got("L2") == Some(2.0))
    assert(got("L3") == None)
  }

  test("equal timestamps match inclusively") {
    val left = Seq(("k", ts("2024-01-01 10:00:00"), "L")).toDF("k", "ts", "tag")
    val right = Seq(("k", ts("2024-01-01 10:00:00"), 9.0)).toDF("k", "ts", "v")
    val got = AsOfJoin.backward(left, right, "k", "ts", Seq("v")).collect()
    assert(got.head.getDouble(3) == 9.0)
  }
}
