package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Per-split watermark semantics (reference: SourceOperator's
  * per-split WatermarkMultiplexer + WatermarksWithIdleness +
  * IndexedCombinedWatermarkStatus — combined watermark is the MIN over
  * ACTIVE splits; idle splits are excluded; splits past combined +
  * drift pause). Enforced by source admission, observed both through
  * the sink (what got read, per split) and [[AlignedReadCounter]]
  * (held files stay physically unopened). */
class SplitSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(dir: Path, split: String, name: String,
      rows: (Long, String)*): Unit = {
    val d = dir.resolve(split)
    Files.createDirectories(d)
    Files.write(d.resolve(name),
      rows.map { case (ms, v) => s"$ms,$v" }.mkString("\n")
        .getBytes("UTF-8"))
  }

  private def startQuery(dir: Path, sink: String,
      extra: Map[String, String] = Map.empty) = {
    val r = spark.readStream
      .format(classOf[SplitFileSource].getName)
      .option("path", dir.toString)
      .option("split.maxDriftMs", "5000")
    extra.foreach { case (k, v) => r.option(k, v) }
    r.load().writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
  }

  private def sinkRows(sink: String): Set[(String, String)] =
    spark.table(sink).select("split", "value").as[(String, String)]
      .collect().toSet

  test("a fast split pauses at combined+drift until the slow split catches up") {
    val dir = Files.createTempDirectory("split_pause")
    AlignedReadCounter.clear()
    // slow split: watermark 1000. fast split: one in-bound file, one
    // bound-crossing file (admitted, the one-more rule), one past it
    // (held unread).
    writeFile(dir, "slow", "1000-s1.csv", 1000L -> "s1")
    writeFile(dir, "fast", "2000-f1.csv", 2000L -> "f1")
    writeFile(dir, "fast", "100000-f2.csv", 100000L -> "f2")
    writeFile(dir, "fast", "100001-f3.csv", 100001L -> "f3")
    val q = startQuery(dir, "split_sink1")
    try {
      q.processAllAvailable()
      assert(sinkRows("split_sink1") ===
        Set("slow" -> "s1", "fast" -> "f1", "fast" -> "f2"))
      assert(!AlignedReadCounter.openedNames.contains("100001-f3.csv"),
        "the held split's file must stay physically unopened")
      // slow split advances -> combined advances -> fast split released
      writeFile(dir, "slow", "95001-s2.csv", 95001L -> "s2")
      q.processAllAvailable()
      assert(sinkRows("split_sink1") === Set("slow" -> "s1",
        "slow" -> "s2", "fast" -> "f1", "fast" -> "f2", "fast" -> "f3"))
    } finally q.stop()
  }

  test("a split with NO data holds the combined watermark until idleness releases it") {
    val dir = Files.createTempDirectory("split_idle")
    var clock = 1000000L
    SplitFileSource.nowMs = () => clock
    // 'empty' exists as a directory but has no files: a registered
    // split with no records contributes Long.MinValue to the MIN, so
    // 'busy' admits exactly its one-more-file and then pauses.
    Files.createDirectories(dir.resolve("empty"))
    writeFile(dir, "busy", "1000-b1.csv", 1000L -> "b1")
    writeFile(dir, "busy", "2000-b2.csv", 2000L -> "b2")
    val q = startQuery(dir, "split_sink2",
      Map("split.idlenessMs" -> "60000"))
    try {
      q.processAllAvailable()
      assert(sinkRows("split_sink2") === Set("busy" -> "b1"),
        "one-more-file against a MinValue combined watermark: exactly one admission")
      // idleness: the empty split is excluded from the MIN after 60s
      // of processing time with nothing to read
      clock += 61000L
      q.processAllAvailable()
      assert(sinkRows("split_sink2") === Set("busy" -> "b1", "busy" -> "b2"))
      // a revived split re-enters the MIN: new data in 'empty' with an
      // old timestamp does NOT regress the (monotonic) combined
      // watermark, and the rows are still read
      writeFile(dir, "empty", "1500-e1.csv", 1500L -> "e1")
      q.processAllAvailable()
      assert(sinkRows("split_sink2") ===
        Set("busy" -> "b1", "busy" -> "b2", "empty" -> "e1"))
    } finally { q.stop(); SplitFileSource.nowMs =
      () => System.currentTimeMillis() }
  }

  test("a split paused by the drift bound is backlogged, NOT idle") {
    val dir = Files.createTempDirectory("split_backlog")
    var clock = 2000000L
    SplitFileSource.nowMs = () => clock
    writeFile(dir, "slow", "1000-s1.csv", 1000L -> "s1")
    writeFile(dir, "fast", "2000-f1.csv", 2000L -> "f1")
    writeFile(dir, "fast", "500000-f2.csv", 500000L -> "f2")
    writeFile(dir, "fast", "500001-f3.csv", 500001L -> "f3")
    val q = startQuery(dir, "split_sink3",
      Map("split.idlenessMs" -> "60000"))
    try {
      q.processAllAvailable()
      assert(sinkRows("split_sink3") ===
        Set("slow" -> "s1", "fast" -> "f1", "fast" -> "f2"))
      // hours pass with the fast split BLOCKED (pending f3): it must
      // not be declared idle — and crucially the SLOW split (now
      // drained, hence idle-eligible) leaving the MIN must not let
      // the fast split's watermark take over the combined and
      // self-release; the fast split is still bounded by... itself
      // only once 'slow' is idle, so f3 DOES release. The non-idle
      // property under test is the fast split: its lastActivity keeps
      // refreshing while it has pending files.
      clock += 61000L
      q.processAllAvailable()
      // slow split went idle (drained + 61s); combined = fast's own
      // watermark; f3 admitted
      assert(sinkRows("split_sink3").contains("fast" -> "f3"))
    } finally { q.stop(); SplitFileSource.nowMs =
      () => System.currentTimeMillis() }
  }

  test("Trigger.AvailableNow drains every split even when alignment would pause them") {
    val dir = Files.createTempDirectory("split_avail_now")
    // 'empty' would hold the combined watermark at MinValue forever
    // under a continuous trigger — drain mode must suspend alignment or
    // the single-batch fallback terminates with b2/b3 unread
    Files.createDirectories(dir.resolve("empty"))
    writeFile(dir, "busy", "1000-b1.csv", 1000L -> "b1")
    writeFile(dir, "busy", "2000-b2.csv", 2000L -> "b2")
    writeFile(dir, "busy", "900000-b3.csv", 900000L -> "b3")
    val q = spark.readStream
      .format(classOf[SplitFileSource].getName)
      .option("path", dir.toString)
      .option("split.maxDriftMs", "5000")
      .load()
      .writeStream.format("memory").queryName("split_avail_now_sink")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(60000), "AvailableNow query must terminate")
      assert(sinkRows("split_avail_now_sink") ===
        Set("busy" -> "b1", "busy" -> "b2", "busy" -> "b3"))
    } finally q.stop()
  }

  test("per-split offsets compact committed names into per-split high watermarks") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = Files.createTempDirectory("split_compact")
    val s = new SplitMicroBatchStream(dir.toString, 5000L,
      Long.MaxValue, 0L)
    writeFile(dir, "a", "1000-x.csv", 1000L -> "x1")
    writeFile(dir, "b", "1100-y.csv", 1100L -> "y1")
    val o1 = s.latestOffset(s.initialOffset(), ReadLimit.allAvailable())
    assert(s.planInputPartitions(s.initialOffset(), o1).length === 2)
    s.commit(o1)
    writeFile(dir, "a", "2000-z.csv", 2000L -> "z1")
    val o2 = s.latestOffset(o1, ReadLimit.allAvailable())
    assert(!o2.json().contains("1000-x.csv") && !o2.json().contains("1100-y.csv"),
      s"committed names must fold into per-split hw: ${o2.json()}")
    assert(o2.json().contains("2000-z.csv"))
    assert(s.planInputPartitions(o1, o2).length === 1)
    // round trip
    assert(s.deserializeOffset(o2.json()).json() === o2.json())
  }

  test("combined watermark is observable and equals MIN over active split watermarks") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = Files.createTempDirectory("split_combined")
    val s = new SplitMicroBatchStream(dir.toString, 5000L,
      Long.MaxValue, 7L * 24 * 3600 * 1000)
    writeFile(dir, "a", "1000-x.csv", 1000L -> "x1")
    writeFile(dir, "b", "9000-y.csv", 9000L -> "y1")
    val o1 = s.latestOffset(s.initialOffset(), ReadLimit.allAvailable())
    s.commit(o1)
    s.latestOffset(o1, ReadLimit.allAvailable())
    // after both splits admitted their files: min(1000, 9000)
    assert(s.combinedWatermark === 1000L)
  }

  test("checkpointed restart resumes from committed split offsets — no re-reads, no gaps") {
    val dir = Files.createTempDirectory("split_restart")
    val ckpt = Files.createTempDirectory("split_restart_ckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer[(String, String)]()
    def start() = spark.readStream
      .format(classOf[SplitFileSource].getName)
      .option("path", dir.toString)
      .option("split.maxDriftMs", "500000")
      .load().writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select("split", "value")
          .collect().map(r => (r.getString(0), r.getString(1)))
        seen.synchronized { seen ++= rows }; ()
      }.start()
    writeFile(dir, "a", "1000-a1.csv", 1000L -> "a1")
    writeFile(dir, "b", "2000-b1.csv", 2000L -> "b1")
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(seen.synchronized(seen.toSet) === Set("a" -> "a1", "b" -> "b1"))
    // files arriving while the query is DOWN are picked up on restart;
    // committed files are not re-read (the offset log carries the
    // per-split (hw, files) state across the restart)
    writeFile(dir, "a", "3000-a2.csv", 3000L -> "a2")
    val q2 = start()
    try {
      q2.processAllAvailable()
      writeFile(dir, "b", "4000-b2.csv", 4000L -> "b2")
      q2.processAllAvailable()
    } finally q2.stop()
    val all = seen.synchronized(seen.toList)
    assert(all.size === all.distinct.size,
      s"restart must not re-deliver committed files: $all")
    assert(all.toSet === Set("a" -> "a1", "b" -> "b1",
      "a" -> "a2", "b" -> "b2"))
  }

  test("a deleted split carries its offset state; reappearing files are NOT re-admitted") {
    val dir = Files.createTempDirectory("split_carry")
    writeFile(dir, "a", "1000-a1.csv", 1000L -> "a1")
    writeFile(dir, "b", "1000-b1.csv", 1000L -> "b1")
    val q = startQuery(dir, "split_sink_carry")
    try {
      q.processAllAvailable()
      assert(sinkRows("split_sink_carry") ===
        Set("a" -> "a1", "b" -> "b1"))
      // split b's directory disappears (deletion, or a transient
      // listing failure) — its (hw, files) state must carry forward,
      // not be erased from the offset
      val bDir = dir.resolve("b")
      Files.delete(bDir.resolve("1000-b1.csv"))
      Files.delete(bDir)
      writeFile(dir, "a", "2000-a2.csv", 2000L -> "a2")
      q.processAllAvailable()
      assert(sinkRows("split_sink_carry") ===
        Set("a" -> "a1", "a" -> "a2", "b" -> "b1"))
      // the directory reappears with the SAME file: erased state would
      // re-admit it here and deliver the row twice (the memory sink
      // appends, so a duplicate would surface as a 4th b-row)
      writeFile(dir, "b", "1000-b1.csv", 1000L -> "b1")
      writeFile(dir, "a", "2500-a3.csv", 2500L -> "a3")
      q.processAllAvailable()
      val afterReappear = spark.table("split_sink_carry")
        .groupBy("split", "value").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(afterReappear(("b", "b1")) === 1L,
        s"b1 must not be re-admitted: $afterReappear")
      // genuinely NEW data in the reappeared split is admitted
      writeFile(dir, "b", "3000-b2.csv", 3000L -> "b2")
      q.processAllAvailable()
      assert(sinkRows("split_sink_carry").contains("b" -> "b2"))
    } finally q.stop()
  }
}
