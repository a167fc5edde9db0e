package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

case class WmEv(k: String, ts: Timestamp, v: Double)

class WindowMachinerySpec extends SparkSpec {
  import spark.implicits._

  private def ev(k: String, sec: Long, v: Double) =
    WmEv(k, new Timestamp(sec * 1000L), v)

  private def fires(name: String) =
    spark.table(name).as[(String, Long, Long, String, Seq[WmEv])].collect()

  test("event-time trigger: onTime fire, allowed-late re-fire, dropped-late side output") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[WmEv]
    // Flink composition: out-of-orderness 0, size 10s, lateness 10s ->
    // engine watermark held back by size+lateness=20s; the operator adds
    // the 20s lag back, so fires still happen at maxEventTime
    val windowed = WindowMachinery.tumbling[String, WmEv](
      in.toDS().withWatermark("ts", "20 seconds").as[WmEv],
      _.k, _.ts.getTime, sizeMs = 10000L,
      allowedLatenessMs = 10000L, watermarkLagMs = 20000L)
    val q = windowed.writeStream.format("memory").queryName("wm_et")
      .outputMode(OutputMode.Append()).start()
    // timestamps offset by 1000s: the engine watermark floors at 0 and
    // a small-epoch test would never climb past the hold-back
    val W = 1000L
    try {
      in.addData(ev("a", W + 1, 1.0), ev("a", W + 2, 2.0)) // [1000s,1010s)
      q.processAllAvailable()
      in.addData(ev("a", W + 15, 0.0)) // engine wm -> 995s (firing wm 1015s)
      q.processAllAvailable()
      in.addData(ev("a", W + 16, 0.0)) // batch fires [1000,1010) on time
      q.processAllAvailable()
      val onTime = fires("wm_et").filter(_._4 == "onTime")
      assert(onTime.exists(f =>
        f._2 == W * 1000 && f._5.map(_.v).sorted == Seq(1.0, 2.0)))

      // late but within lateness (end 1010s + 10s > firing wm 1016s):
      // re-fire with the full buffer including the late element
      in.addData(ev("a", W + 5, 5.0))
      q.processAllAvailable()
      val late = fires("wm_et").filter(_._4 == "late")
      assert(late.exists(f =>
        f._2 == W * 1000 && f._5.map(_.v).sorted == Seq(1.0, 2.0, 5.0)))

      // push the firing watermark past end+lateness=1020s, then a
      // beyond-horizon element: routed to the side output, not state
      in.addData(ev("a", W + 25, 0.0))
      q.processAllAvailable()
      in.addData(ev("a", W + 26, 0.0))
      q.processAllAvailable()
      in.addData(ev("a", W + 8, 8.0)) // [1000,1010) horizon 1020 < 1025
      q.processAllAvailable()
      val dropped = fires("wm_et").filter(_._4 == "droppedLate")
      assert(dropped.exists(f =>
        f._2 == W * 1000 && f._5.map(_.v) == Seq(8.0)))
    } finally q.stop()
  }

  test("count trigger fires every n elements; purging clears the buffer") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[WmEv]
    val windowed = WindowMachinery.tumbling[String, WmEv](
      in.toDS().withWatermark("ts", "0 seconds").as[WmEv],
      _.k, _.ts.getTime, sizeMs = 60000L,
      trigger = WindowMachinery.Trigger.Count(2))
    val q = windowed.writeStream.format("memory").queryName("wm_cnt")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev("a", 1, 1.0), ev("a", 2, 2.0), ev("a", 3, 3.0),
        ev("a", 4, 4.0))
      q.processAllAvailable()
      val early = fires("wm_cnt").filter(_._4 == "early").sortBy(_._5.size)
      // accumulating count trigger: fire at 2 and at 4 elements
      assert(early.map(_._5.map(_.v)).toSeq ==
        Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0, 4.0)))
    } finally q.stop()

    val in2 = MemoryStream[WmEv]
    val purged = WindowMachinery.tumbling[String, WmEv](
      in2.toDS().withWatermark("ts", "0 seconds").as[WmEv],
      _.k, _.ts.getTime, sizeMs = 60000L,
      trigger = WindowMachinery.Trigger.Count(2, purge = true))
    val q2 = purged.writeStream.format("memory").queryName("wm_cntp")
      .outputMode(OutputMode.Append()).start()
    try {
      in2.addData(ev("a", 1, 1.0), ev("a", 2, 2.0), ev("a", 3, 3.0),
        ev("a", 4, 4.0))
      q2.processAllAvailable()
      val early = fires("wm_cntp").filter(_._4 == "early")
      // purging: each fire sees only its own pane
      assert(early.map(_._5.map(_.v)).toSeq ==
        Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    } finally q2.stop()
  }

  test("count evictor keeps only the newest elements at fire time") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[WmEv]
    val windowed = WindowMachinery.tumbling[String, WmEv](
      in.toDS().withWatermark("ts", "0 seconds").as[WmEv],
      _.k, _.ts.getTime, sizeMs = 60000L,
      trigger = WindowMachinery.Trigger.Count(3),
      evictor = Some(WindowMachinery.Evictor.Count(2)))
    val q = windowed.writeStream.format("memory").queryName("wm_ev")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev("a", 1, 1.0), ev("a", 2, 2.0), ev("a", 3, 3.0))
      q.processAllAvailable()
      val early = fires("wm_ev").filter(_._4 == "early")
      assert(early.map(_._5.map(_.v)).toSeq == Seq(Seq(2.0, 3.0)))
    } finally q.stop()
  }

  // ---- incremental-accumulator scale path (tumblingAgg/slidingAgg) ----
  // accumulator functions live in the companion: a spec-method closure
  // would capture the (non-serializable) suite instance
  import WindowMachinerySpec.{CS, csZero, csAdd}

  private def aggFires(name: String) =
    spark.table(name).as[(String, Long, Long, String, CS)].collect()

  test("tumblingAgg parity with tumbling: onTime, late re-fire, droppedLate") {
    // the event-time test's exact feed sequence through BOTH operators;
    // the buffer variant's fires reduced by (count,sum) must equal the
    // accumulator variant's fires as multisets
    implicit val sq = spark.sqlContext
    val inB = MemoryStream[WmEv]
    val inA = MemoryStream[WmEv]
    val buffered = WindowMachinery.tumbling[String, WmEv](
      inB.toDS().withWatermark("ts", "20 seconds").as[WmEv],
      _.k, _.ts.getTime, sizeMs = 10000L,
      allowedLatenessMs = 10000L, watermarkLagMs = 20000L)
    val agged = WindowMachinery.tumblingAgg[String, WmEv, CS](
      inA.toDS().withWatermark("ts", "20 seconds").as[WmEv],
      _.k, _.ts.getTime, sizeMs = 10000L, zero = csZero, add = csAdd,
      allowedLatenessMs = 10000L, watermarkLagMs = 20000L)
    val qB = buffered.writeStream.format("memory").queryName("par_buf")
      .outputMode(OutputMode.Append()).start()
    val qA = agged.writeStream.format("memory").queryName("par_agg")
      .outputMode(OutputMode.Append()).start()
    val W = 1000L
    val feeds = Seq(
      Seq(ev("a", W + 1, 1.0), ev("a", W + 2, 2.0)),
      Seq(ev("a", W + 15, 0.5)),
      Seq(ev("a", W + 16, 0.25)),
      Seq(ev("a", W + 5, 5.0)),   // allowed-late -> re-fire
      Seq(ev("a", W + 25, 0.125)),
      Seq(ev("a", W + 26, 0.0625)),
      Seq(ev("a", W + 8, 8.0)))   // beyond horizon -> droppedLate
    try {
      feeds.foreach { f =>
        inB.addData(f: _*); qB.processAllAvailable()
        inA.addData(f: _*); qA.processAllAvailable()
      }
      def multiset(rows: Seq[(String, Long, Long, String, CS)]) =
        rows.groupBy(identity).view.mapValues(_.size).toMap
      val reduced = fires("par_buf").toSeq.map { case (k, ws, we, fi, els) =>
        (k, ws, we, fi, els.foldLeft(csZero)(csAdd))
      }
      assert(multiset(reduced) == multiset(aggFires("par_agg").toSeq),
        s"buffer-reduced=${reduced.sorted}\nagg=${aggFires("par_agg").toSeq.sorted}")
      // the cases themselves occurred (parity with a trivially-empty
      // board would be vacuous)
      val kinds = aggFires("par_agg").map(_._4).toSet
      assert(Set("onTime", "late", "droppedLate").subsetOf(kinds), kinds)
      // spot semantics: the late re-fire carries the absorbed element
      assert(aggFires("par_agg").exists(f =>
        f._4 == "late" && f._5 == ((3L, 8.0))))
    } finally { qB.stop(); qA.stop() }
  }

  test("tumblingAgg count trigger: accumulating and purging early fires") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[WmEv]
    val agged = WindowMachinery.tumblingAgg[String, WmEv, CS](
      in.toDS().withWatermark("ts", "0 seconds").as[WmEv],
      _.k, _.ts.getTime, sizeMs = 60000L, zero = csZero, add = csAdd,
      trigger = WindowMachinery.Trigger.Count(2))
    val q = agged.writeStream.format("memory").queryName("agg_cnt")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev("a", 1, 1.0), ev("a", 2, 2.0), ev("a", 3, 3.0),
        ev("a", 4, 4.0))
      q.processAllAvailable()
      val early = aggFires("agg_cnt").filter(_._4 == "early").sortBy(_._5._1)
      assert(early.map(_._5).toSeq == Seq((2L, 3.0), (4L, 10.0)))
    } finally q.stop()

    val in2 = MemoryStream[WmEv]
    val purged = WindowMachinery.tumblingAgg[String, WmEv, CS](
      in2.toDS().withWatermark("ts", "0 seconds").as[WmEv],
      _.k, _.ts.getTime, sizeMs = 60000L, zero = csZero, add = csAdd,
      trigger = WindowMachinery.Trigger.Count(2, purge = true))
    val q2 = purged.writeStream.format("memory").queryName("agg_cntp")
      .outputMode(OutputMode.Append()).start()
    try {
      in2.addData(ev("a", 1, 1.0), ev("a", 2, 2.0), ev("a", 3, 3.0),
        ev("a", 4, 4.0))
      q2.processAllAvailable()
      val early = aggFires("agg_cntp").filter(_._4 == "early")
      assert(early.map(_._5).toSeq == Seq((2L, 3.0), (2L, 7.0)))
    } finally q2.stop()
  }

  test("slidingAgg: hop elements land in every covering window") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[WmEv]
    // size 20s slide 10s: ts=15s belongs to [0,20) and [10,30)
    val agged = WindowMachinery.slidingAgg[String, WmEv, CS](
      in.toDS().withWatermark("ts", "0 seconds").as[WmEv],
      _.k, _.ts.getTime, sizeMs = 20000L, slideMs = 10000L,
      zero = csZero, add = csAdd)
    val q = agged.writeStream.format("memory").queryName("agg_hop")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev("a", 15, 3.0), ev("a", 5, 1.0))
      q.processAllAvailable()
      in.addData(ev("a", 35, 0.0)) // wm -> 35s: both windows fire
      q.processAllAvailable()
      in.addData(ev("a", 36, 0.0))
      q.processAllAvailable()
      val onTime = aggFires("agg_hop").filter(_._4 == "onTime")
        .map(f => (f._2 / 1000, f._5)).toMap
      assert(onTime(0L) == ((2L, 4.0)), onTime.toString)  // 5s + 15s
      assert(onTime(10L) == ((1L, 3.0)), onTime.toString) // 15s only
    } finally q.stop()
  }

  test("accumulator state is constant-size: wide panes cost what empty ones do") {
    // 5000 elements into ONE open window: the buffer variant's state
    // grows with the pane; the accumulator variant's does not — the
    // scale-path claim, asserted on the engine's own state metrics.
    implicit val sq = spark.sqlContext
    def stateBytes(pipe: MemoryStream[WmEv] => org.apache.spark.sql.Dataset[_],
        name: String): Long = {
      val in = MemoryStream[WmEv]
      val q = pipe(in).writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        val evs = (1 to 5000).map(i => ev("a", 10 + i % 40, i.toDouble))
        in.addData(evs: _*)
        q.processAllAvailable()
        q.lastProgress.stateOperators(0).memoryUsedBytes
      } finally q.stop()
    }
    val bufBytes = stateBytes(in => WindowMachinery.tumbling[String, WmEv](
      in.toDS().withWatermark("ts", "0 seconds").as[WmEv],
      _.k, _.ts.getTime, sizeMs = 60000L), "sz_buf")
    val aggBytes = stateBytes(in =>
      WindowMachinery.tumblingAgg[String, WmEv, CS](
        in.toDS().withWatermark("ts", "0 seconds").as[WmEv],
        _.k, _.ts.getTime, sizeMs = 60000L, zero = csZero, add = csAdd),
      "sz_agg")
    assert(aggBytes * 4 < bufBytes,
      s"accumulator state ($aggBytes B) must be far below the " +
        s"element buffer's ($bufBytes B)")
  }

  test("continuous event-time trigger fires periodically before the end") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[WmEv]
    val windowed = WindowMachinery.tumbling[String, WmEv](
      in.toDS().withWatermark("ts", "0 seconds").as[WmEv],
      _.k, _.ts.getTime, sizeMs = 30000L,
      trigger = WindowMachinery.Trigger.ContinuousEventTime(10000L))
    val q = windowed.writeStream.format("memory").queryName("wm_cont")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev("a", 1, 1.0), ev("a", 2, 2.0)) // window [0,30s)
      q.processAllAvailable()
      in.addData(ev("a", 12, 12.0)) // wm -> 12s
      q.processAllAvailable()
      in.addData(ev("a", 22, 22.0)) // batch wm=12s: early fire at 10s
      q.processAllAvailable()
      in.addData(ev("a", 40, 0.0)) // wm -> 40s
      q.processAllAvailable()
      in.addData(ev("a", 41, 0.0)) // batch wm=40s: fire 20s early + onTime
      q.processAllAvailable()
      val all = fires("wm_cont").filter(_._2 == 0L)
      assert(all.count(_._4 == "early") >= 2) // 10s and 20s boundaries
      val onTime = all.filter(_._4 == "onTime")
      assert(onTime.map(_._5.map(_.v).sorted).toSeq ==
        Seq(Seq(1.0, 2.0, 12.0, 22.0)))
    } finally q.stop()
  }

  test("default min policy aligns the watermark to the SLOWEST source") {
    // Flink's multi-input watermark rule: an operator's watermark is the
    // MIN over its inputs, so a slow source holds results back rather
    // than letting the fast source emit windows the slow one could still
    // dirty. Spark's default multipleWatermarkPolicy=min is the same
    // alignment — proven here: a window closes only once BOTH sources'
    // watermarks pass it.
    implicit val sq = spark.sqlContext
    val fast = MemoryStream[WmEv]
    val slow = MemoryStream[WmEv]
    val union = fast.toDS().withWatermark("ts", "0 seconds")
      .unionByName(slow.toDS().withWatermark("ts", "0 seconds"))
    val agg = union.groupBy(window(col("ts"), "10 seconds"), col("k"))
      .agg(sum(col("v")).as("s"))
    val q = agg.writeStream.format("memory").queryName("wm_align")
      .outputMode(OutputMode.Append()).start()
    try {
      fast.addData(ev("a", 1, 1.0))
      slow.addData(ev("a", 2, 2.0))
      q.processAllAvailable()
      // fast source races far ahead; slow stays inside the first window
      fast.addData(ev("a", 60, 0.0))
      q.processAllAvailable()
      fast.addData(ev("a", 61, 0.0))
      q.processAllAvailable()
      // aligned (min) watermark is still ~2s: the [0,10) window must
      // NOT have fired even though the fast source is at 61s
      assert(spark.table("wm_align").count() == 0)
      // a late row from the slow source still lands in [0,10) correctly
      slow.addData(ev("a", 5, 5.0))
      q.processAllAvailable()
      // now the slow source passes the window end -> [0,10) finalizes
      slow.addData(ev("a", 12, 0.0))
      q.processAllAvailable()
      slow.addData(ev("a", 13, 0.0))
      q.processAllAvailable()
      val rows = spark.table("wm_align")
        .selectExpr("s").as[Double].collect()
      assert(rows.contains(8.0), s"got ${rows.toSeq}") // 1+2+5 all counted
    } finally q.stop()
  }

  test("multipleWatermarkPolicy=max lets windows finalize despite an idle source") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.multipleWatermarkPolicy")
    Watermarks.advanceWatermarkPastIdleSources(spark)
    try {
      val active = MemoryStream[WmEv]
      val idle = MemoryStream[WmEv]
      val union = active.toDS().withWatermark("ts", "0 seconds")
        .unionByName(idle.toDS().withWatermark("ts", "0 seconds"))
      val agg = union.groupBy(window(col("ts"), "10 seconds"), col("k"))
        .agg(sum(col("v")).as("s"))
      val q = agg.writeStream.format("memory").queryName("wm_idle")
        .outputMode(OutputMode.Append()).start()
      try {
        // the idle stream NEVER receives data; with the default min
        // policy its watermark would pin the union at -inf and append
        // mode would emit nothing
        active.addData(ev("a", 1, 1.0), ev("a", 2, 2.0))
        q.processAllAvailable()
        active.addData(ev("a", 15, 0.0))
        q.processAllAvailable()
        active.addData(ev("a", 16, 0.0))
        q.processAllAvailable()
        assert(spark.table("wm_idle").count() >= 1)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", v)
        case None => spark.conf.unset("spark.sql.streaming.multipleWatermarkPolicy")
      }
    }
  }
}

object WindowMachinerySpec {
  type CS = (Long, Double) // (count, sum) accumulator
  val csZero: CS = (0L, 0.0)
  val csAdd: (CS, WmEv) => CS = (a, e) => (a._1 + 1, a._2 + e.v)
}
