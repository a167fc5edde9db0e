package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Watermark alignment by buffering: a fast source's far-future rows
  * are held until the group (MIN) watermark allows them within
  * maxDrift. */
class AlignedBufferSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    new Timestamp(1700000000000L + min * 60000L)

  test("fast-source rows beyond maxDrift are held until the group watermark catches up") {
    implicit val sq = spark.sqlContext
    val slow = MemoryStream[(String, Timestamp)]
    val fast = MemoryStream[(String, Timestamp)]
    val union =
      slow.toDF().toDF("src", "ts").withWatermark("ts", "0 seconds")
        .union(
          fast.toDF().toDF("src", "ts").withWatermark("ts", "0 seconds"))
        .as[(String, Timestamp)]
    val aligned = Watermarks.alignedBuffer[String, (String, Timestamp)](
      union, _._1, _._2.getTime, maxDriftMs = 60000L)
    val q = aligned.toDF().toDF("src", "ts")
      .writeStream.format("memory").queryName("aligned_sink")
      .outputMode(OutputMode.Append()).start()
    def emitted(): Set[(String, Long)] =
      spark.table("aligned_sink").as[(String, Timestamp)].collect()
        .map(r => r._1 -> r._2.getTime).toSet
    try {
      // batch 1: slow at t0, fast at t0 and t0+20min (20min drift)
      slow.addData(("s", ts(0)))
      fast.addData(("f", ts(0)), ("f", ts(20)))
      q.processAllAvailable()
      // watermark was uninitialized during batch 1 — everything buffered
      // batch 2 (empty nudge): group wm = min(t0, t0+20) = t0 →
      // limit t0+1min: both t0 rows release, f@t0+20 stays held
      slow.addData(("s", ts(1)))
      q.processAllAvailable()
      val afterCatchup = emitted()
      assert(afterCatchup.contains(("s", ts(0).getTime)))
      assert(afterCatchup.contains(("f", ts(0).getTime)))
      assert(!afterCatchup.contains(("f", ts(20).getTime)),
        "fast row released while group watermark lagged by 20min > 1min drift")
      // slow source advances to t0+19:30 → wm still short of t0+19 →
      // f@t0+20 NOT yet within drift... advance to t0+20 → released
      slow.addData(("s", ts(25)))
      q.processAllAvailable()
      slow.addData(("s", ts(30)))
      q.processAllAvailable()
      // group wm now min(25, 20) = t0+20 → limit t0+21 → f@t0+20 out
      val fin = emitted()
      assert(fin.contains(("f", ts(20).getTime)),
        s"held row not released after watermark caught up: $fin")
    } finally q.stop()
  }

  test("alignedBufferChained: downstream aggregation with checkCorrectness ON") {
    implicit val sq = spark.sqlContext
    // the checker must be at its default (enabled) — assert it
    assert(spark.conf.getOption(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
      .forall(_ == "true"))
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val slow = MemoryStream[(String, Timestamp)]
    val fast = MemoryStream[(String, Timestamp)]
    val union =
      slow.toDF().toDF("src", "ts").withWatermark("ts", "0 seconds")
        .union(
          fast.toDF().toDF("src", "ts").withWatermark("ts", "0 seconds"))
        .as[(String, Timestamp)]
    val aligned = Watermarks.alignedBufferChained[String, (String, Timestamp)](
      union, _._1, _._2.getTime, maxDriftMs = 60000L)
    // chained stateful op on the DECLARED aligned_ts column — legal
    // with the correctness checker on (the whole point of this variant)
    import org.apache.spark.sql.functions.{col, count, lit, window}
    val agg = aligned.toDF()
      .groupBy(col("value._1").as("src"),
        window(col("aligned_ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("aligned_tws_sink")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("aligner-ckpt").toString)
      .outputMode(OutputMode.Append()).start()
    try {
      // fast runs 20min ahead: its row must be held, not aggregated
      slow.addData(("s", ts(0)))
      fast.addData(("f", ts(0)), ("f", ts(20)))
      q.processAllAvailable()
      slow.addData(("s", ts(1)))
      q.processAllAvailable()
      // BOTH sources must keep advancing — the group watermark is the
      // MIN, so a quiet fast source stalls alignment (by design); with
      // both at t+60 the held row releases and its window closes
      slow.addData(("s", ts(25))); fast.addData(("f", ts(25)))
      q.processAllAvailable()
      slow.addData(("s", ts(40))); fast.addData(("f", ts(40)))
      q.processAllAvailable()
      slow.addData(("s", ts(60))); fast.addData(("f", ts(60)))
      q.processAllAvailable()
      slow.addData(("s", ts(80))); fast.addData(("f", ts(80)))
      q.processAllAvailable()
      val rows = spark.table("aligned_tws_sink")
        .select(col("src"), col("n")).as[(String, Long)].collect().toSeq
      // both fast rows eventually counted, in different windows
      assert(rows.count(_._1 == "f") >= 2, s"got $rows")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("alignedBuffer composes with a downstream streaming aggregation") {
    implicit val sq = spark.sqlContext
    val src = MemoryStream[(String, Timestamp)]
    val aligned = Watermarks.alignedBuffer[String, (String, Timestamp)](
      src.toDF().toDF("src", "ts").withWatermark("ts", "0 seconds")
        .as[(String, Timestamp)],
      _._1, _._2.getTime, maxDriftMs = 60000L)
    // the whole point of alignment: downstream aggregation sees a
    // drift-bounded stream — this plan must ANALYZE and RUN. No
    // re-watermark after the aligner: a downstream watermark node sees
    // no data until release, would pin the global MIN watermark at 0,
    // and deadlock the aligner (see alignedBuffer scaladoc) — the
    // update-mode aggregation runs off the upstream watermark alone.
    import org.apache.spark.sql.functions.{col, count, window}
    val agg = aligned.toDF().toDF("src", "ts")
      .groupBy(col("src"), window(col("ts"), "10 minutes"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"))
    // the chained-stateful correctness check flags exactly the
    // documented buffering-vs-throttling delta — disabled as the
    // operator's scaladoc prescribes
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled",
      "false")
    val q = agg.writeStream.format("memory").queryName("aligned_agg_sink")
      .outputMode(OutputMode.Update()).start()
    try {
      src.addData(("a", ts(0)), ("a", ts(1)))
      q.processAllAvailable()
      src.addData(("a", ts(2)))
      q.processAllAvailable()
      src.addData(("a", ts(3)))
      q.processAllAvailable()
      assert(spark.table("aligned_agg_sink").count() >= 1)
    } finally {
      q.stop()
      spark.conf.unset(
        "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    }
  }
}
