package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class WEv(k: String, ts: Long, v: Double, ets: Timestamp)

/** Event-time stateful operators: streaming as-of join and rows-bounded
  * OVER aggregate (the SURVEY.md §7.4 hard items). */
class EventTimeOpsSpec extends SparkSpec {
  import spark.implicits._
  import StreamingAsOf.Tagged

  private def wev(k: String, ts: Long, v: Double) =
    WEv(k, ts, v, new Timestamp(ts))

  test("streaming as-of join picks latest version <= probe time") {
    implicit val sq = spark.sqlContext
    val probes = MemoryStream[WEv]
    val versions = MemoryStream[WEv]
    val l = probes.toDS()
      .map(e => StreamingAsOf.probeRow[WEv, WEv](e.k, e.ts, e))
      .withWatermark("ets", "0 seconds")
    val r = versions.toDS()
      .map(e => StreamingAsOf.versionRow[WEv, WEv](e.k, e.ts, e))
      .withWatermark("ets", "0 seconds")
    val out = StreamingAsOf.asOfJoin[WEv, WEv](l, r)
      .map { case (k, ts, p, v) => (k, ts, p.v, v.map(_.v).getOrElse(-1.0)) }
    val q = out.writeStream.format("memory").queryName("asofstream")
      .outputMode(OutputMode.Append()).start()
    try {
      versions.addData(wev("k", 1000, 10), wev("k", 3000, 30))
      probes.addData(wev("k", 2000, 99), wev("k", 500, 98))
      q.processAllAvailable()
      // advance both watermarks past the probes
      versions.addData(wev("k", 10000, 100))
      probes.addData(wev("k", 10000, 97))
      q.processAllAvailable()
      versions.addData(wev("k", 20000, 200))
      probes.addData(wev("k", 20000, 96))
      q.processAllAvailable()
      val rows = spark.table("asofstream")
        .as[(String, Long, Double, Double)].collect()
        .map(r => r._2 -> r._4).toMap
      assert(rows(500L) == -1.0)   // no version yet at t=500
      assert(rows(2000L) == 10.0)  // version@1000 is latest <= 2000
      assert(rows(10000L) == 100.0) // version@10000 ties inclusively
    } finally q.stop()
  }

  test("rowsBoundedSum emits trailing-window sums in event-time order") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[WEv]
    val src = in.toDS().withWatermark("ets", "0 seconds")
    val out = StatefulOps.rowsBoundedSum[String, WEv](
      src, _.k, _.ts, _.v, n = 2)
    val q = out.writeStream.format("memory").queryName("rbs")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(wev("a", 2000, 2.0), wev("a", 1000, 1.0))
      q.processAllAvailable()
      in.addData(wev("a", 3000, 4.0)) // advances wm to 3000, matures 1&2
      q.processAllAvailable()
      in.addData(wev("a", 9000, 8.0)) // matures ts=3000
      q.processAllAvailable()
      val rows = spark.table("rbs").as[(String, Long, Double)].collect()
        .map(r => r._2 -> r._3).toMap
      assert(rows(1000L) == 1.0)
      assert(rows(2000L) == 3.0) // 1+2
      assert(rows(3000L) == 6.0) // 2+4
    } finally q.stop()
  }
}
