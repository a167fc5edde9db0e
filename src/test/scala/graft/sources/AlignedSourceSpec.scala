package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** FLIP-182 source-THROTTLING semantics (reference:
  * flink-runtime/.../source/operator/SourceOperator.java pause/resume;
  * FLIP-182 maxAllowedWatermark = combined + drift): rows past the
  * alignment bound stay UNREAD at the source — asserted via
  * [[AlignedReadCounter]] (file never opened), which distinguishes true
  * throttling from the state-buffering aligner in
  * [[graft.streaming.Watermarks.alignedBuffer]]. */
class AlignedSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeFile(dir: Path, name: String, rows: (Long, String)*): Unit =
    Files.write(dir.resolve(name),
      rows.map { case (ms, v) => s"$ms,$v" }.mkString("\n")
        .getBytes("UTF-8"))

  private def startQuery(dir: Path, sinkName: String, group: String) =
    spark.readStream
      .format(classOf[AlignedFileSource].getName)
      .option("path", dir.toString)
      .option("alignment.group", group)
      .option("alignment.maxDriftMs", "5000")
      .load()
      .writeStream.format("memory").queryName(sinkName)
      .outputMode(OutputMode.Append()).start()

  private def sinkValues(sinkName: String): Set[String] =
    spark.table(sinkName).select("value").as[String].collect().toSet

  test("files past the alignment bound stay physically unopened until the group catches up") {
    val dir = Files.createTempDirectory("aligned_src")
    val group = "g_throttle"
    AlignmentGroups.clear(group)
    AlignedReadCounter.clear()
    // a: in-bound. b: the file that CROSSES the bound (admitted — the
    // reference likewise pauses only after its emitted watermark
    // crosses maxAllowedWatermark). c: must be held unread.
    writeFile(dir, "1000-a.csv", 500L -> "a1", 1000L -> "a2")
    writeFile(dir, "100000-b.csv", 100000L -> "b1")
    writeFile(dir, "100001-c.csv", 100001L -> "c1")
    AlignmentGroups.publish(group, 1000L)
    val q = startQuery(dir, "aligned_src_sink1", group)
    try {
      q.processAllAvailable()
      assert(sinkValues("aligned_src_sink1") === Set("a1", "a2", "b1"))
      assert(AlignedReadCounter.openedNames ===
        Set("1000-a.csv", "100000-b.csv"),
        "held file must never be OPENED — throttled at the source, not buffered downstream")
      // group watermark advances to within drift of c → released
      AlignmentGroups.publish(group, 95001L)
      q.processAllAvailable()
      assert(sinkValues("aligned_src_sink1") ===
        Set("a1", "a2", "b1", "c1"))
      assert(AlignedReadCounter.openedNames.contains("100001-c.csv"))
    } finally { q.stop(); AlignmentGroups.clear(group) }
  }

  test("a straggler file with a small event time is admitted without disturbing prior offsets") {
    val dir = Files.createTempDirectory("aligned_straggler")
    val group = "g_straggler"
    AlignmentGroups.clear(group)
    writeFile(dir, "2000-x.csv", 2000L -> "x1")
    AlignmentGroups.publish(group, 2000L)
    val q = startQuery(dir, "aligned_src_sink2", group)
    try {
      q.processAllAvailable()
      assert(sinkValues("aligned_src_sink2") === Set("x1"))
      // late-arriving file with an EARLIER max event time: joins the
      // pending list and is admitted next poll (offset is a file SET,
      // not a high-water count)
      writeFile(dir, "500-late.csv", 500L -> "late1")
      q.processAllAvailable()
      assert(sinkValues("aligned_src_sink2") === Set("x1", "late1"))
    } finally { q.stop(); AlignmentGroups.clear(group) }
  }

  test("no group watermark yet => alignment inactive, everything admitted") {
    val dir = Files.createTempDirectory("aligned_nogroup")
    val group = "g_inactive"
    AlignmentGroups.clear(group)
    writeFile(dir, "1000-p.csv", 1000L -> "p1")
    writeFile(dir, "9999999-q.csv", 9999999L -> "q1")
    val q = startQuery(dir, "aligned_src_sink3", group)
    try {
      q.processAllAvailable()
      assert(sinkValues("aligned_src_sink3") === Set("p1", "q1"))
    } finally { q.stop(); AlignmentGroups.clear(group) }
  }

  test("the slowest group member is never paused (liveness): own watermark IS the group minimum") {
    val dir = Files.createTempDirectory("aligned_slowest")
    val group = "g_slowest"
    AlignmentGroups.clear(group)
    // group watermark tracks THIS source (it is the slowest/only
    // member): every admission republishes, so the next file is always
    // within drift of the bound → no deadlock however far apart files are
    writeFile(dir, "1000-s1.csv", 1000L -> "s1")
    writeFile(dir, "500000-s2.csv", 500000L -> "s2")
    writeFile(dir, "900000-s3.csv", 900000L -> "s3")
    AlignmentGroups.publish(group, 1000L)
    val q = startQuery(dir, "aligned_src_sink4", group)
    try {
      // simulate the coordinator loop: group min follows the slowest
      // member's own emitted watermark
      (1 to 10).foreach { _ =>
        q.processAllAvailable()
        spark.table("aligned_src_sink4").select("ts").collect()
          .map(_.getTimestamp(0).getTime)
          .foldLeft(Long.MinValue)(math.max) match {
          case Long.MinValue => ()
          case m => AlignmentGroups.publish(group, m)
        }
      }
      assert(sinkValues("aligned_src_sink4") === Set("s1", "s2", "s3"))
    } finally { q.stop(); AlignmentGroups.clear(group) }
  }

  test("AlignmentGroups.attach feeds ONLY the named query's watermark into the group") {
    implicit val sq = spark.sqlContext
    val group = "g_attach"
    AlignmentGroups.clear(group)
    val in = MemoryStream[java.sql.Timestamp]
    val other = MemoryStream[java.sql.Timestamp]
    val listener = AlignmentGroups.attach(spark, group, "aligned_attach_sink")
    val q = in.toDF().toDF("ts").withWatermark("ts", "0 seconds")
      .groupBy($"ts").count()
      .writeStream.format("memory").queryName("aligned_attach_sink")
      .outputMode(OutputMode.Update()).start()
    // a second, much-further-ahead query on the SAME session: its
    // progress events hit the same listener bus but must be filtered
    // out, else the group watermark would race ahead of the target
    // query (the fail-open bug: fast sources never pause)
    val q2 = other.toDF().toDF("ts").withWatermark("ts", "0 seconds")
      .groupBy($"ts").count()
      .writeStream.format("memory").queryName("aligned_attach_other")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(new java.sql.Timestamp(1700000000000L))
      other.addData(new java.sql.Timestamp(1900000000000L))
      q.processAllAvailable(); q2.processAllAvailable()
      in.addData(new java.sql.Timestamp(1700000060000L))
      other.addData(new java.sql.Timestamp(1900000060000L))
      q.processAllAvailable(); q2.processAllAvailable()
      // listener delivery is async on the listener bus — poll briefly
      var wm = AlignmentGroups.get(group)
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!wm.exists(_ >= 1700000000000L) && System.nanoTime() < deadline) {
        q.processAllAvailable(); q2.processAllAvailable()
        Thread.sleep(100)
        wm = AlignmentGroups.get(group)
      }
      assert(wm.exists(_ >= 1700000000000L),
        s"expected published group watermark >= first event, got $wm")
      assert(wm.exists(_ < 1900000000000L),
        s"the other query's watermark leaked into the group: $wm")
    } finally {
      q.stop(); q2.stop(); spark.streams.removeListener(listener)
      AlignmentGroups.clear(group)
    }
  }

  test("publish is monotonic per member; the group watermark is the MIN over members") {
    AlignmentGroups.clear("g_mono")
    AlignmentGroups.publish("g_mono", 100L)
    AlignmentGroups.publish("g_mono", 50L)
    assert(AlignmentGroups.get("g_mono") === Some(100L))
    AlignmentGroups.publish("g_mono", 200L)
    assert(AlignmentGroups.get("g_mono") === Some(200L))
    // reference: SourceCoordinator.WatermarkAggregator — combined
    // watermark is the SMALLEST across keys; a fast member must not
    // drag the group forward past a slow one
    AlignmentGroups.publish("g_mono", "fast", 900000L)
    assert(AlignmentGroups.get("g_mono") === Some(200L))
    AlignmentGroups.publish("g_mono", "__default", 300L)
    assert(AlignmentGroups.get("g_mono") === Some(300L))
    AlignmentGroups.clear("g_mono")
  }

  test("a fast member is paused against the group MIN while a slow member lags") {
    val dir = Files.createTempDirectory("aligned_min")
    val group = "g_min"
    AlignmentGroups.clear(group)
    writeFile(dir, "1000-a.csv", 1000L -> "a1")
    writeFile(dir, "200000-b.csv", 200000L -> "b1")
    writeFile(dir, "200001-c.csv", 200001L -> "c1")
    // two members: the slow one pins the group minimum at 1000 even
    // though the fast one has advanced far past the held file
    AlignmentGroups.publish(group, "slow", 1000L)
    AlignmentGroups.publish(group, "fast", 500000L)
    val q = startQuery(dir, "aligned_min_sink", group)
    try {
      q.processAllAvailable()
      // a (in bound) + b (the bound-crossing file) admitted; c held
      assert(sinkValues("aligned_min_sink") === Set("a1", "b1"))
      AlignmentGroups.publish(group, "slow", 195002L)
      q.processAllAvailable()
      assert(sinkValues("aligned_min_sink") === Set("a1", "b1", "c1"))
    } finally { q.stop(); AlignmentGroups.clear(group) }
  }

  test("Trigger.AvailableNow drains all available files (reportLatestOffset lists fresh)") {
    val dir = Files.createTempDirectory("aligned_avail_now")
    val group = "g_avail_now"
    AlignmentGroups.clear(group)
    writeFile(dir, "1000-a.csv", 1000L -> "a1")
    writeFile(dir, "900000-b.csv", 900000L -> "b1")
    // c sits past even the one-more-file admission bound: a continuous
    // trigger would hold it until the group catches up, so it proves
    // drain mode actually suspends alignment (a single-batch fallback
    // with admission active would terminate WITHOUT it — silent loss,
    // like the old lastAdmitted=Nil snapshot that read ZERO files)
    writeFile(dir, "1800000-c.csv", 1800000L -> "c1")
    AlignmentGroups.publish(group, 1000L)
    val q = spark.readStream
      .format(classOf[AlignedFileSource].getName)
      .option("path", dir.toString)
      .option("alignment.group", group)
      .option("alignment.maxDriftMs", "5000")
      .load()
      .writeStream.format("memory").queryName("aligned_avail_now_sink")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(60000), "AvailableNow query must terminate")
      assert(sinkValues("aligned_avail_now_sink") === Set("a1", "b1", "c1"))
    } finally { q.stop(); AlignmentGroups.clear(group) }
  }

  test("offsets compact committed files into a high watermark; deleted committed files tolerated") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = Files.createTempDirectory("aligned_compact")
    def poll(s: AlignedMicroBatchStream,
        from: org.apache.spark.sql.connector.read.streaming.Offset) =
      s.latestOffset(from, ReadLimit.allAvailable())
    // retention 0: fold every committed name at the next poll
    val s = new AlignedMicroBatchStream(dir.toString, None, 5000L, 0L, 0L)
    writeFile(dir, "1000-a.csv", 1000L -> "a1")
    val o1 = poll(s, s.initialOffset())
    assert(o1.json().contains("1000-a.csv"))
    assert(s.planInputPartitions(s.initialOffset(), o1).length === 1)
    s.commit(o1)
    writeFile(dir, "2000-b.csv", 2000L -> "b1")
    val o2 = poll(s, o1)
    // a is committed and older than retention below maxCommittedTs → folded
    assert(!o2.json().contains("1000-a.csv"),
      s"committed file must fold into hw: ${o2.json()}")
    assert(o2.json().contains("\"hw\":1000"))
    assert(o2.json().contains("2000-b.csv"))
    val batch2 = s.planInputPartitions(o1, o2)
    assert(batch2.length === 1, "the fold must not re-plan or drop b")
    s.commit(o2)
    // deleting an already-committed file must not regress the source
    // watermark (event time is in the offset's own names/hw) nor break
    // the next poll or restart
    Files.delete(dir.resolve("1000-a.csv"))
    writeFile(dir, "3000-c.csv", 3000L -> "c1")
    val o3 = poll(s, o2)
    assert(o3.json().contains("3000-c.csv") && !o3.json().contains("2000-b"))
    assert(s.planInputPartitions(o2, o3).length === 1)
    s.commit(o3)
    // a straggler with event time under the compaction hw is dropped by
    // policy — the FileStreamSource maxFileAge trade, documented
    writeFile(dir, "500-z.csv", 500L -> "z1")
    val o4 = poll(s, o3)
    assert(!o4.json().contains("500-z.csv"))
    assert(s.planInputPartitions(o3, o4).isEmpty)
    // stable fixpoint: re-polling with no new data does not churn offsets
    assert(poll(s, o4).json() === o4.json())
    // legacy plain-array offsets (pre-hw checkpoints) still deserialize
    val legacy = s.deserializeOffset("""["1000-a.csv","2000-b.csv"]""")
    assert(s.planInputPartitions(s.initialOffset(), legacy).length === 2)
  }

  test("reportLatestOffset lists fresh from disk, independent of admission state") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = Files.createTempDirectory("aligned_report")
    val group = "g_report"
    AlignmentGroups.clear(group)
    AlignmentGroups.publish(group, 1000L)
    writeFile(dir, "1000-a.csv", 1000L -> "a1")
    writeFile(dir, "900000-b.csv", 900000L -> "b1")
    writeFile(dir, "900001-c.csv", 900001L -> "c1")
    val s = new AlignedMicroBatchStream(dir.toString, Some(group), 5000L,
      0L, 7L * 24 * 3600 * 1000)
    // BEFORE any latestOffset poll: must already report every file
    // (the old lastAdmitted implementation returned Nil here)
    val reported = s.reportLatestOffset().json()
    assert(reported.contains("1000-a.csv") && reported.contains("900000-b.csv")
      && reported.contains("900001-c.csv"))
    // and it reports AVAILABLE, not admitted: a and the bound-crossing
    // b are admitted this trigger, c is held — but stays reported
    val admitted = s.latestOffset(s.initialOffset(),
      ReadLimit.allAvailable()).json()
    assert(admitted.contains("900000-b.csv") &&
      !admitted.contains("900001-c.csv"))
    assert(s.reportLatestOffset().json().contains("900001-c.csv"))
    AlignmentGroups.clear(group)
  }
}
