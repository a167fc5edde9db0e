package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming LIMIT and dynamic-gap session windows (reference
  * StreamExecLimit; DynamicEventTimeSessionWindows). */
class StreamingLimitSpec extends SparkSpec {
  import spark.implicits._

  test("streamingLimit caps emission across micro-batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val out = StatefulOps.streamingLimit[String, (String, Long)](
      in.toDS(), _._1, n = 3)
    val q = out.writeStream.format("memory").queryName("slimit")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(("k", 1L), ("k", 2L))
      q.processAllAvailable()
      in.addData(("k", 3L), ("k", 4L), ("k", 5L))  // only one more fits
      q.processAllAvailable()
      in.addData(("j", 10L))                        // other key unaffected
      q.processAllAvailable()
      val rows = spark.table("slimit").as[(String, Long)].collect()
      assert(rows.count(_._1 == "k") == 3)
      assert(rows.count(_._1 == "j") == 1)
    } finally q.stop()
  }

  test("dynamic gap session windows use a per-row gap expression") {
    // gap depends on the row: 'fast' events close after 1 minute,
    // others after 10 minutes (reference DynamicEventTimeSessionWindows)
    val df = Seq(
      ("u", Timestamp.valueOf("2024-01-01 00:00:00"), "fast"),
      ("u", Timestamp.valueOf("2024-01-01 00:02:00"), "fast"),
      ("u", Timestamp.valueOf("2024-01-01 00:04:00"), "slow"),
      ("u", Timestamp.valueOf("2024-01-01 00:12:00"), "slow"))
      .toDF("k", "ts", "speed")
    val gap = when(col("speed") === "fast", lit("1 minute"))
      .otherwise(lit("10 minutes"))
    val sessions = df.groupBy(session_window(col("ts"), gap).as("w"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("n")).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).sortBy(_._1)
    // fast events close after 1 minute (two singleton sessions); the
    // slow 10-minute gap chains 00:04 and 00:12 into one session
    assert(sessions.length == 3)
    assert(sessions.map(_._2).toSeq == Seq(1L, 1L, 2L))
  }
}
