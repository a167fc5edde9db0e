package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.cdc.{ChangelogFormats, ChangelogJoin}

/** The streaming changelog⋈changelog join against its batch twin: the
  * same event sequence fed one micro-batch at a time must emit exactly
  * the multiset [[ChangelogJoin.updateStream]] replays from sequence
  * columns — the two operators implement one semantics (the reference
  * StreamingJoinOperator) from opposite ends. */
class StreamingChangelogJoinSpec extends SparkSpec {
  import spark.implicits._

  private val K = ChangelogFormats.RowKindCol

  // (side 0|1, key, tag, kind) — both sides update, a content update
  // (-U/+U), deletions, and a key whose right side dies and revives
  private val events = Seq(
    (0, "a", 1, "+I"), (1, "a", 10, "+I"),
    (0, "a", 1, "-U"), (0, "a", 2, "+U"),
    (1, "b", 20, "+I"), (0, "b", 3, "+I"),
    (1, "a", 10, "-D"), (1, "a", 11, "+I"),
    (0, "b", 3, "-D"))

  private type P = (String, Int)
  private type Emit = (Option[P], Option[P], String)

  private def batchEmissions(jt: String): Map[Emit, Int] = {
    val l = events.zipWithIndex.filter(_._1._1 == 0)
      .map { case ((_, k, tag, kind), i) => (k, tag, kind, i.toLong) }
      .toDF("lk", "ltag", K, "lseq")
    val r = events.zipWithIndex.filter(_._1._1 == 1)
      .map { case ((_, k, tag, kind), i) => (k, tag, kind, i.toLong) }
      .toDF("rk", "rtag", K, "rseq")
    ChangelogJoin.updateStream(l, r, "lk", "rk", jt,
        Seq("lseq"), Seq("rseq"))
      .collect().toSeq.map { row =>
        def opt(k: String, t: String): Option[P] =
          if (row.isNullAt(row.fieldIndex(k))) None
          else Some((row.getString(row.fieldIndex(k)),
            row.getInt(row.fieldIndex(t))))
        (opt("lk", "ltag"), opt("rk", "rtag"),
          row.getString(row.fieldIndex(K)))
      }.groupBy(identity).view.mapValues(_.size).toMap
  }

  /** `batchSizes`: how many events to feed per micro-batch — 1 is the
    * original one-event-per-trigger feed; larger batches exercise the
    * intra-trigger (seq, side) reordering, where several changes for
    * one key (from both sides) land in a single group iterator. */
  private def streamEmissions(jt: String, batchSize: Int): Map[Emit, Int] = {
    implicit val sq = spark.sqlContext
    val lIn = MemoryStream[(P, String, Long)]
    val rIn = MemoryStream[(P, String, Long)]
    val joined = StreamingChangelogJoin.join[String, P, P](
      lIn.toDS(), rIn.toDS(), _._1, _._1, jt)
    val name = s"scj_${jt}_$batchSize"
    val q = joined.toDF("kind", "l", "r").writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      events.zipWithIndex.grouped(batchSize).foreach { batch =>
        batch.foreach { case ((side, k, tag, kind), i) =>
          if (side == 0) lIn.addData(((k, tag), kind, i.toLong))
          else rIn.addData(((k, tag), kind, i.toLong))
        }
        q.processAllAvailable()
      }
      spark.table(name)
        .select(col("l"), col("r"), col("kind"))
        .as[(Option[P], Option[P], String)]
        .collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
    } finally q.stop()
  }

  Seq("inner", "left", "full").foreach { jt =>
    test(s"streaming $jt join emits exactly the batch replay's multiset") {
      val got = streamEmissions(jt, batchSize = 1)
      val want = batchEmissions(jt)
      assert(got == want, s"\n got=$got\n want=$want")
    }
    test(s"streaming $jt join: whole history in ONE trigger still " +
        "matches the batch replay") {
      val got = streamEmissions(jt, batchSize = events.size)
      val want = batchEmissions(jt)
      assert(got == want, s"\n got=$got\n want=$want")
    }
  }
  test("streaming full join at mixed trigger granularity matches") {
    assert(streamEmissions("full", batchSize = 4) == batchEmissions("full"))
  }

  test("state drops dead contents (net-zero entries leave the multiset)") {
    implicit val sq = spark.sqlContext
    val lIn = MemoryStream[(P, String, Long)]
    val rIn = MemoryStream[(P, String, Long)]
    val joined = StreamingChangelogJoin.join[String, P, P](
      lIn.toDS(), rIn.toDS(), _._1, _._1, "inner")
    val q = joined.toDF("kind", "l", "r").writeStream
      .format("memory").queryName("scj_state")
      .outputMode(OutputMode.Append()).start()
    try {
      lIn.addData((("a", 1), "+I", 0L)); q.processAllAvailable()
      lIn.addData((("a", 1), "-D", 1L)); q.processAllAvailable()
      // the left side is empty again: a right insert must emit nothing
      rIn.addData((("a", 9), "+I", 2L)); q.processAllAvailable()
      assert(spark.table("scj_state").count() == 0)
    } finally q.stop()
  }
}
