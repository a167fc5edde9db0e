package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class TimeWindowsSpec extends SparkSpec {
  import spark.implicits._

  test("cumulate assigns each row to its growing windows") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:20:00"))
    ).toDF("id", "ts")
    val got = TimeWindows.cumulate(df, "ts", 900L, 3600L)
      .select($"window_start", $"window_end").collect()
      .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString))
      .toSet
    // row at 00:20 → start 00:00; ends 00:30, 00:45, 01:00
    assert(got == Set(
      ("2024-01-01 00:00:00.0", "2024-01-01 00:30:00.0"),
      ("2024-01-01 00:00:00.0", "2024-01-01 00:45:00.0"),
      ("2024-01-01 00:00:00.0", "2024-01-01 01:00:00.0")))
  }

  test("cumulate window count is maxSize/step at window start") {
    val df = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:01"))).toDF("id", "ts")
    val n = TimeWindows.cumulate(df, "ts", 900L, 3600L).count()
    assert(n == 4) // ends 00:15, 00:30, 00:45, 01:00
  }
}
