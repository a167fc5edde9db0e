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

  test("AlignmentGroups.attach feeds a running query's global watermark into the group") {
    implicit val sq = spark.sqlContext
    val group = "g_attach"
    AlignmentGroups.clear(group)
    val in = MemoryStream[java.sql.Timestamp]
    val listener = AlignmentGroups.attach(spark, group)
    val q = in.toDF().toDF("ts").withWatermark("ts", "0 seconds")
      .groupBy($"ts").count()
      .writeStream.format("memory").queryName("aligned_attach_sink")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(new java.sql.Timestamp(1700000000000L))
      q.processAllAvailable()
      in.addData(new java.sql.Timestamp(1700000060000L))
      q.processAllAvailable()
      // listener delivery is async on the listener bus — poll briefly
      var wm = AlignmentGroups.get(group)
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!wm.exists(_ >= 1700000000000L) && System.nanoTime() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
        wm = AlignmentGroups.get(group)
      }
      assert(wm.exists(_ >= 1700000000000L),
        s"expected published group watermark >= first event, got $wm")
    } finally {
      q.stop(); spark.streams.removeListener(listener)
      AlignmentGroups.clear(group)
    }
  }

  test("publish is monotonic per group") {
    AlignmentGroups.clear("g_mono")
    AlignmentGroups.publish("g_mono", 100L)
    AlignmentGroups.publish("g_mono", 50L)
    assert(AlignmentGroups.get("g_mono") === Some(100L))
    AlignmentGroups.publish("g_mono", 200L)
    assert(AlignmentGroups.get("g_mono") === Some(200L))
    AlignmentGroups.clear("g_mono")
  }
}
