package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Cross-restart state-restore proofs — the reference's RestoreTestBase
  * discipline (flink-table-planner/src/test/java/.../nodes/exec/
  * testutils/RestoreTestBase.java: compiled plan + savepoint + expected
  * post-restore output) applied to each stateful-operator family: the
  * same feed sequence is run (a) uninterrupted and (b) hard-stopped
  * after EVERY feed and cold-restarted from a real checkpointLocation —
  * the emission MULTISETS must be identical, with the deciding change
  * placed AFTER a restart boundary so correct output is only possible
  * if the operator state (not merely the source offsets) was recovered.
  *
  * Families covered: changelog stream-stream JOIN state (signed
  * per-key multisets, [[StreamingChangelogJoin]]), retractable AGG
  * accumulator state ([[StreamingChangelogAgg]]), and rank/TopN state
  * ([[graft.streaming.StatefulOps.topN]]); dedup state has its own
  * restore proof in StreamingCurationSpec ("resume-equals-continuous").
  * Sink-side exactly-once (file commit log) is proven in SourcesSpec —
  * here the foreachBatch sink records emissions only after
  * processAllAvailable commits, so a replayed uncommitted batch would
  * surface as a multiset mismatch.
  */
class RestoreSpec extends SparkSpec {
  import spark.implicits._

  private type P = (String, Int)

  /** Register each restore family against BOTH state store providers —
    * the default HDFS-backed store and RocksDB (the reference gates
    * state compatibility across backends the same way,
    * flink-state-backends). The provider is read at query start, so
    * setting the session conf around the body covers every
    * start/restart inside it. */
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private def restoreTest(name: String)(body: => Unit): Unit = {
    test(name)(body)
    test(s"$name [RocksDB provider]") {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        RocksProvider)
      try body
      finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  /** Run `feeds` through `pipe`, hard-stopping + cold-restarting from
    * the same checkpoint after each feed when `interrupt`; returns the
    * emission multiset. */
  private def runFeeds[I: org.apache.spark.sql.Encoder, O](
      feeds: Seq[Seq[I]], interrupt: Boolean,
      pipe: org.apache.spark.sql.Dataset[I] => org.apache.spark.sql.Dataset[O],
      mode: OutputMode = OutputMode.Append())
      : Map[String, Int] = {
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_restore_ckpt").toString
    val in = MemoryStream[I]
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    def start() = pipe(in.toDS()).writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(mode)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[O], _: Long) =>
        val rows = batch.collect().map(_.toString)
        seen.synchronized { seen ++= rows }; ()
      }.start()
    var q = start()
    feeds.foreach { rows =>
      in.addData(rows: _*)
      q.processAllAvailable()
      if (interrupt) { q.stop(); q = start() }
    }
    q.processAllAvailable(); q.stop()
    seen.synchronized(seen.groupBy(identity).view.mapValues(_.size).toMap)
  }

  /** Same, for the two-input join (left/right MemoryStreams fed in
    * alternation; each feed may carry rows for both sides). */
  private def runJoinFeeds(
      feeds: Seq[(Seq[(P, String, Long)], Seq[(P, String, Long)])],
      interrupt: Boolean): Map[String, Int] = {
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_restore_join_ckpt").toString
    val lIn = MemoryStream[(P, String, Long)]
    val rIn = MemoryStream[(P, String, Long)]
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    def start() = StreamingChangelogJoin
      .join[String, P, P](lIn.toDS(), rIn.toDS(), _._1, _._1, "full")
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          StreamingChangelogJoin.Out[P, P]], _: Long) =>
        val rows = batch.collect().map(_.toString)
        seen.synchronized { seen ++= rows }; ()
      }.start()
    var q = start()
    feeds.foreach { case (ls, rs) =>
      if (ls.nonEmpty) lIn.addData(ls: _*)
      if (rs.nonEmpty) rIn.addData(rs: _*)
      q.processAllAvailable()
      if (interrupt) { q.stop(); q = start() }
    }
    q.processAllAvailable(); q.stop()
    seen.synchronized(seen.groupBy(identity).view.mapValues(_.size).toMap)
  }

  restoreTest("changelog join state restores: resume equals continuous, padding transitions cross the restart") {
    // Each feed touches ONE side: an addData call is atomic, so every
    // feed lands in exactly one trigger in both runs — feeding both
    // MemoryStreams in one step would let the engine's trigger race
    // between the two addData calls and split micro-batches
    // nondeterministically (a real property of two-source queries, but
    // noise for this equality proof).
    // Feeds 1-2 establish join state on both sides; feed 3 (after a
    // restart) swaps the right row — its emissions must carry the
    // RECOVERED left multiset; feed 4 kills the right side, so the
    // full-outer padding for the recovered left rows must come back.
    val empty = Seq.empty[(P, String, Long)]
    val feeds = Seq(
      (Seq((("a", 1), "+I", 0L), (("a", 2), "+I", 1L)), empty),
      (empty, Seq((("a", 10), "+I", 2L))),
      (empty, Seq((("a", 10), "-U", 3L), (("a", 11), "+U", 4L))),
      (empty, Seq((("a", 11), "-D", 5L))))
    val continuous = runJoinFeeds(feeds, interrupt = false)
    val resumed = runJoinFeeds(feeds, interrupt = true)
    assert(continuous == resumed,
      s"continuous=$continuous\nresumed=$resumed")
    // the right side died twice (10→gone momentarily inside feed 3, 11
    // in feed 4): each death re-pads both recovered left rows
    val pads = resumed.filter { case (row, _) =>
      row.contains("+U") && row.contains("None") }
    assert(pads.values.sum == 4, s"expected 4 restored paddings: $resumed")
    // feed 4's -D joined rows prove the pre-restart left multiset
    // (both (a,1) and (a,2)) survived every restart
    assert(resumed.getOrElse("(-D,Some((a,1)),Some((a,11)))", 0) == 1 &&
      resumed.getOrElse("(-D,Some((a,2)),Some((a,11)))", 0) == 1,
      resumed.toString)
  }

  restoreTest("changelog agg accumulator restores: post-restart -U carries the pre-restart (cnt,sum)") {
    val feeds = Seq(
      Seq(("k", 2.0, "+I", 0L), ("k", 3.0, "+I", 1L)), // state (2, 5.0)
      Seq(("k", 7.0, "+U", 2L)), // -U(2,5.0) proves the accumulator survived
      Seq(("k", 2.0, "-D", 3L), ("k", 3.0, "-D", 4L), ("k", 7.0, "-D", 5L)))
    val pipe = (ds: org.apache.spark.sql.Dataset[(String, Double, String, Long)]) =>
      StreamingChangelogAgg.updateStream[String](ds)
    val continuous = runFeeds(feeds, interrupt = false, pipe)
    val resumed = runFeeds(feeds, interrupt = true, pipe)
    assert(continuous == resumed, s"continuous=$continuous\nresumed=$resumed")
    assert(resumed.keys.exists(r => r.contains("-U") && r.contains("5.0")),
      s"the retraction must carry the recovered accumulator: $resumed")
    // the group died cleanly: a final -D at net count zero
    assert(resumed.keys.exists(_.contains("-D")), resumed.toString)
  }

  restoreTest("count-window buffer restores: a window started before the restart completes after it") {
    val feeds = Seq(
      Seq(("g", 1), ("g", 2)), // buffer 2 of 3 — window MUST NOT fire yet
      Seq(("g", 3)), // completes window 0 only if the buffer survived
      Seq(("g", 4), ("g", 5), ("g", 6))) // window 1 entirely post-restart
    val pipe = (ds: org.apache.spark.sql.Dataset[(String, Int)]) =>
      StatefulOps.countWindow[String, (String, Int)](ds, _._1, 3)
    val continuous = runFeeds(feeds, interrupt = false, pipe)
    val resumed = runFeeds(feeds, interrupt = true, pipe)
    assert(continuous == resumed, s"continuous=$continuous\nresumed=$resumed")
    // window 0 carries the two PRE-restart elements + the post-restart
    // third; the window index counter also survived (window 1 next)
    assert(resumed.keys.exists(r => r.contains("0,") &&
      r.contains("(g,1)") && r.contains("(g,3)")), resumed.toString)
    assert(resumed.keys.exists(_.contains("1,")), resumed.toString)
  }

  restoreTest("streaming-limit count restores: the cap holds across restarts") {
    val feeds = Seq(
      Seq(("g", 1), ("g", 2)), // 2 of 3 emitted
      Seq(("g", 3), ("g", 4)), // only 3 may pass if the count survived
      Seq(("g", 5))) // must emit nothing
    val pipe = (ds: org.apache.spark.sql.Dataset[(String, Int)]) =>
      StatefulOps.streamingLimit[String, (String, Int)](ds, _._1, 3L)
    val continuous = runFeeds(feeds, interrupt = false, pipe)
    val resumed = runFeeds(feeds, interrupt = true, pipe)
    assert(continuous == resumed, s"continuous=$continuous\nresumed=$resumed")
    assert(resumed.values.sum == 3, s"cap must survive the restart: $resumed")
    assert(!resumed.keys.exists(_.contains("(g,4)")) &&
      !resumed.keys.exists(_.contains("(g,5)")), resumed.toString)
  }

  restoreTest("event-time OVER buffer + watermark restore: immature rows mature after the restart") {
    import java.sql.Timestamp
    def wev(k: String, ts: Long, v: Double) = WEv(k, ts, v, new Timestamp(ts))
    val feeds = Seq(
      Seq(wev("a", 2000, 2.0), wev("a", 1000, 1.0)), // buffered, immature
      Seq(wev("a", 3000, 4.0)), // watermark 3000: matures 1000+2000 —
      // their trailing-2 sums are only right if the buffer AND the
      // recovered watermark both survived the restart
      Seq(wev("a", 9000, 8.0))) // matures ts=3000
    val pipe = (ds: org.apache.spark.sql.Dataset[WEv]) =>
      StatefulOps.rowsBoundedSum[String, WEv](
        ds.withWatermark("ets", "0 seconds"), _.k, _.ts, _.v, n = 2)
    val continuous = runFeeds(feeds, interrupt = false, pipe)
    val resumed = runFeeds(feeds, interrupt = true, pipe)
    assert(continuous == resumed, s"continuous=$continuous\nresumed=$resumed")
    assert(resumed.keySet == Set("(a,1000,1.0)", "(a,2000,3.0)", "(a,3000,6.0)"),
      resumed.toString)
  }

  restoreTest("CEP partial-match buffer restores: a pattern started before the restart completes after it") {
    import graft.cep.{CEP, Pattern}
    import graft.cep.CES
    def ev(ts: Long, typ: String) =
      CES("k", ts, typ, new java.sql.Timestamp(ts))
    val pattern = Pattern.begin[CES]("a").where(_.typ == "a")
      .followedBy("b").where(_.typ == "b").within(5000)
    val feeds = Seq(
      Seq(ev(1000, "a")), // pattern OPEN: 'a' buffered, undecidable
      Seq(ev(2000, "b")), // completes [a@1000, b@2000] — only if the
      // buffered 'a' survived the restart (window not yet closed)
      Seq(ev(20000, "x"))) // watermark past 6000: finalize and emit
    val pipe = (ds: org.apache.spark.sql.Dataset[CES]) =>
      CEP.matchPatternStream[String, CES](
        ds.withWatermark("ets", "0 seconds"), _.k, _.ts, pattern)
        .map { case (k, i, m) => (k, i, m("a").head.ts, m("b").head.ts) }
    val continuous = runFeeds(feeds, interrupt = false, pipe)
    val resumed = runFeeds(feeds, interrupt = true, pipe)
    assert(continuous == resumed, s"continuous=$continuous\nresumed=$resumed")
    assert(resumed.keySet == Set("(k,0,1000,2000)"), resumed.toString)
  }

  restoreTest("streaming CUMULATE bucket state restores: pre-restart rows count in post-restart slices") {
    import java.sql.Timestamp
    def wev(k: String, ts: Long, v: Double) = WEv(k, ts, v, new Timestamp(ts))
    val feeds = Seq(
      Seq(wev("k", 500, 1.0), wev("k", 1500, 2.0)), // buckets open, no slice fired
      Seq(wev("k", 2600, 4.0)), // watermark 2600: slices 1000, 2000 fire —
      // slice 2000's cumulative sum (1+2=3) needs the RECOVERED buckets
      Seq(wev("k", 9000, 0.0))) // flush the remaining [0,4000) slices
    val pipe = (ds: org.apache.spark.sql.Dataset[WEv]) =>
      CumulateOps.cumulateAppendSum[String, WEv](
        ds.withWatermark("ets", "0 seconds"), _.k, _.ts, _.v,
        stepMs = 1000, maxMs = 4000)
    val continuous = runFeeds(feeds, interrupt = false, pipe)
    val resumed = runFeeds(feeds, interrupt = true, pipe)
    assert(continuous == resumed, s"continuous=$continuous\nresumed=$resumed")
    // window [0,4000): cumulative sums 1 (slice 1000), 3 (2000), 7
    // (3000 — includes the post-restart 2600 row), 7 (4000)
    Seq("1000,1,1.0", "2000,2,3.0", "3000,3,7.0", "4000,3,7.0")
      .foreach(frag => assert(
        resumed.keys.exists(_.contains(frag)), s"missing $frag: $resumed"))
  }

  restoreTest("topN rank state restores: a post-restart score must displace the recovered ranking") {
    val feeds = Seq(
      Seq(("g", 5.0), ("g", 3.0), ("g", 8.0)), // top2 after feed 1: 8, 5
      Seq(("g", 6.0)), // displaces 5 ONLY if the recovered state held (8, 5)
      Seq(("g", 1.0))) // below the recovered top2 — must emit nothing
    val pipe = (ds: org.apache.spark.sql.Dataset[(String, Double)]) =>
      StatefulOps.topN[String, (String, Double)](ds, _._1, _._2, 2)
    val continuous = runFeeds(feeds, interrupt = false, pipe, OutputMode.Update())
    val resumed = runFeeds(feeds, interrupt = true, pipe, OutputMode.Update())
    assert(continuous == resumed, s"continuous=$continuous\nresumed=$resumed")
    // final ranking emitted after feed 2: (8.0 @1, 6.0 @2); feed 3
    // changed nothing (no emission — checked by multiset equality)
    assert(resumed.keys.exists(r => r.contains("6.0") && r.contains("2")),
      s"6.0 must enter at rank 2 against the recovered state: $resumed")
    assert(!resumed.keys.exists(_.contains("1.0")),
      s"1.0 must not displace the recovered top2: $resumed")
  }
}
