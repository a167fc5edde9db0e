package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming CUMULATE in append mode: growing slices fire exactly once
  * as the watermark passes their ends. */
class CumulateOpsSpec extends SparkSpec {
  import spark.implicits._

  private def wev(k: String, ts: Long, v: Double) =
    WEv(k, ts, v, new Timestamp(ts))

  test("cumulative slices fire once, append mode, as watermark advances") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[WEv]
    val src = in.toDS().withWatermark("ets", "0 seconds")
    // step 1s, max 4s: window [0, 4000) has slice ends 1000..4000
    val out = CumulateOps.cumulateAppendSum[String, WEv](
      src, _.k, _.ts, _.v, stepMs = 1000, maxMs = 4000)
    val q = out.writeStream.format("memory").queryName("cumulate_append")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(wev("k", 500, 1), wev("k", 1500, 2), wev("k", 2500, 4))
      q.processAllAvailable()
      in.addData(wev("k", 2600, 8))   // wm -> 2600: slices 1000, 2000 fire
      q.processAllAvailable()
      in.addData(wev("k", 9000, 0))   // wm -> 9000: 3000, 4000 fire
      q.processAllAvailable()
      in.addData(wev("k", 20000, 0))  // flush the 8000-12000 window slices
      q.processAllAvailable()
      val rows = spark.table("cumulate_append")
        .as[(String, Long, Long, Long, Double)].collect()
        .filter(_._2 == 0L).sortBy(_._3)
      // cumulative sums within window [0, 4000)
      assert(rows.map(r => (r._3, r._4, r._5)).toSeq == Seq(
        (1000L, 1L, 1.0),        // [0,1000): 500
        (2000L, 2L, 3.0),        // + 1500
        (3000L, 4L, 15.0),       // + 2500, 2600
        (4000L, 4L, 15.0)))      // nothing in [3000,4000)
      // exactly-once: no duplicate (start, end) rows
      val all = spark.table("cumulate_append")
        .as[(String, Long, Long, Long, Double)].collect()
      assert(all.map(r => (r._2, r._3)).distinct.length == all.length)
    } finally q.stop()
  }

  test("matches the batch TVF aggregation on the same data") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    val data = Seq(
      wev("a", 100, 1), wev("a", 1700, 2), wev("a", 3200, 3),
      wev("b", 900, 5), wev("b", 2100, 7))
    val in = MemoryStream[WEv]
    val src = in.toDS().withWatermark("ets", "0 seconds")
    val out = CumulateOps.cumulateAppendSum[String, WEv](
      src, _.k, _.ts, _.v, stepMs = 1000, maxMs = 4000)
    val q = out.writeStream.format("memory").queryName("cumulate_vs_batch")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(data: _*)
      q.processAllAvailable()
      in.addData(wev("z", 60000, 0)) // advance watermark far past all slices
      q.processAllAvailable()
      val streamed = spark.table("cumulate_vs_batch")
        .as[(String, Long, Long, Long, Double)].collect()
        .filter(_._1 != "z")
        .map(r => (r._1, r._2, r._3, r._4, r._5)).toSet
      val batch = graft.operators.TimeWindows
        .cumulate(data.toDF(), "ets", stepSec = 1, maxSec = 4)
        .groupBy(col("k"), col("window_start"), col("window_end"))
        .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum"))
        .collect()
        .map(r => (r.getString(0),
          r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
          r.getLong(3), r.getDouble(4))).toSet
      assert(streamed == batch,
        s"streamed=$streamed\nbatch=$batch")
    } finally q.stop()
  }
}
