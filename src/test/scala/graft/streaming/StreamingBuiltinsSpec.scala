package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

case class TEv(user: String, ts: Timestamp, v: Double)

/** Streaming built-ins the reference maps onto (SURVEY.md §2.8):
  * watermarked tumbling window aggregate (append mode), event-time
  * dedup within watermark, stream-stream interval join. */
class StreamingBuiltinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked tumbling window agg finalizes closed windows (append)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[TEv]
    val agg = in.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"user")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .select($"window.start".as("ws"), $"user", $"n", $"s")
    val q = agg.writeStream.format("memory").queryName("twa")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(TEv("u", ts("2024-01-01 00:10:00"), 1),
        TEv("u", ts("2024-01-01 00:50:00"), 2))
      q.processAllAvailable()
      // advance watermark beyond 01:00 + 10min → first window closes
      in.addData(TEv("u", ts("2024-01-01 01:20:00"), 4))
      q.processAllAvailable()
      in.addData(TEv("u", ts("2024-01-01 03:00:00"), 8))
      q.processAllAvailable()
      val rows = spark.table("twa").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3)))
      assert(rows.contains(("2024-01-01 00:00:00.0", 2L, 3.0)))
    } finally q.stop()
  }

  test("streaming group aggregate in update mode revises per-key results") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[TEv]
    val agg = in.toDS().groupBy($"user")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val q = agg.writeStream.format("memory").queryName("sga")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(TEv("u", ts("2024-01-01 00:00:00"), 1))
      q.processAllAvailable()
      in.addData(TEv("u", ts("2024-01-01 00:01:00"), 2))
      q.processAllAvailable()
      val revisions = spark.table("sga").collect()
        .map(r => (r.getLong(1), r.getDouble(2)))
      // update mode emits the revised aggregate each batch: (1,1) then (2,3)
      assert(revisions.toSeq == Seq((1L, 1.0), (2L, 3.0)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups by key in event time") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[TEv]
    val dd = in.toDS()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user")
    val q = dd.writeStream.format("memory").queryName("ddw")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(TEv("a", ts("2024-01-01 00:00:00"), 1),
        TEv("a", ts("2024-01-01 00:05:00"), 2),
        TEv("b", ts("2024-01-01 00:06:00"), 3))
      q.processAllAvailable()
      assert(spark.table("ddw").count() == 2)
    } finally q.stop()
  }

  test("stream-stream interval join matches rows within time bound") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[TEv]
    val buys = MemoryStream[TEv]
    val c = clicks.toDS().withWatermark("ts", "1 hour")
      .select($"user".as("cu"), $"ts".as("cts"), $"v".as("cv"))
    val b = buys.toDS().withWatermark("ts", "1 hour")
      .select($"user".as("bu"), $"ts".as("bts"), $"v".as("bv"))
    val joined = c.join(b,
      $"cu" === $"bu" &&
        $"bts" >= $"cts" && $"bts" <= $"cts" + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(TEv("u", ts("2024-01-01 00:00:00"), 1))
      buys.addData(TEv("u", ts("2024-01-01 00:05:00"), 2), // within 10m
        TEv("u", ts("2024-01-01 00:30:00"), 3))            // outside
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
      assert(rows.length == 1 && rows.head.getAs[Double]("bv") == 2.0)
    } finally q.stop()
  }
}
