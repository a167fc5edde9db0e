package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.cdc.{ChangelogFormats, ChangelogInference}

/** Deep-DAG streaming parity: the q_cdc_agg_join_agg SHAPE — GroupAgg →
  * Join ← GroupAgg — run LIVE on the streaming twins
  * ([[StreamingChangelogAgg]] update streams feeding
  * [[StreamingChangelogJoin]]), micro-batch-fed, must emit exactly the
  * multiset the batch replay ([[ChangelogInference]] over
  * [[graft.cdc.ChangelogAgg]]/[[graft.cdc.ChangelogJoin]]) produces for
  * the same event sequence. Round-7 only proved the single join node
  * against its batch twin; this covers the composed chain, where the
  * join's INPUTS are themselves derived update streams whose -U/+U
  * pairs and (seq, sub) emission order have to line up across
  * operators.
  */
class DeepChangelogParitySpec extends SparkSpec {
  import spark.implicits._

  private val K = ChangelogFormats.RowKindCol

  // (side L|R, custkey, value, kind) with a GLOBAL seq = index. Left =
  // order changes (value = order amount), right = customer changes
  // (value = nation, recovered through the aggregate's SUM as in
  // q_cdc_agg_join_agg). Covers: multi-change keys, a nation
  // reassignment (-U/+U), an order retraction, and a customer death
  // that strips its pairs.
  private val events = Seq(
    ('L', 1L, 10.0, "+I"),
    ('R', 1L, 5.0, "+I"),
    ('L', 1L, 20.0, "+I"),
    ('R', 1L, 5.0, "-U"), ('R', 1L, 6.0, "+U"),
    ('L', 2L, 5.0, "+I"),
    ('R', 2L, 5.0, "+I"),
    ('L', 1L, 10.0, "-D"),
    ('R', 2L, 5.0, "-D"))

  private type LP = (Long, Long, Double) // (o_custkey, n_ord, sum_v)
  private type RP = (Long, Int) // (c_custkey, nationkey)
  private type Emit = (Option[LP], Option[RP], String)

  private def batchEmissions(): Map[Emit, Int] = {
    import ChangelogInference._
    val l = events.zipWithIndex.filter(_._1._1 == 'L')
      .map { case ((_, k, v, kind), i) => (k, v, kind, i.toLong) }
      .toDF("o_custkey", "v", K, "seq")
    val r = events.zipWithIndex.filter(_._1._1 == 'R')
      .map { case ((_, k, v, kind), i) => (k, v, kind, i.toLong) }
      .toDF("c_custkey", "nation", K, "seq")
    val lAgg = Calc(
      GroupAgg(Source(l, seqCols = Seq("seq")), Seq("o_custkey"), "v"),
      df => df.withColumnRenamed("cnt", "n_ord")
        .withColumnRenamed("sum_val", "sum_v"))
    val rAgg = Calc(
      GroupAgg(Source(r, seqCols = Seq("seq")), Seq("c_custkey"), "nation"),
      df => df.withColumn("nationkey", col("sum_val").cast("int"))
        .drop("cnt", "sum_val"))
    ChangelogInference.execute(
        Sink(Join(lAgg, rAgg, "o_custkey", "c_custkey", "inner")))
      .select(col("o_custkey"), col("n_ord"), col("sum_v"),
        col("c_custkey"), col("nationkey"), col(K))
      .collect().toSeq.map { row =>
        val lp = if (row.isNullAt(0)) None
          else Some((row.getLong(0), row.getLong(1), row.getDouble(2)))
        val rp = if (row.isNullAt(3)) None
          else Some((row.getLong(3), row.getInt(4)))
        (lp, rp, row.getString(5))
      }.groupBy(identity).view.mapValues(_.size).toMap
  }

  private def streamEmissions(batchSize: Int): Map[Emit, Int] = {
    implicit val sq = spark.sqlContext
    val lIn = MemoryStream[(Long, Double, String, Long)]
    val rIn = MemoryStream[(Long, Double, String, Long)]
    val lAgg = StreamingChangelogAgg.updateStream(lIn.toDS())
      .map { case (k, cnt, sum, kind, seq) =>
        ((k, cnt, sum), kind, seq) }
    val rAgg = StreamingChangelogAgg.updateStream(rIn.toDS())
      .map { case (k, _, sum, kind, seq) =>
        ((k, sum.toInt), kind, seq) }
    val joined = StreamingChangelogJoin.join[Long, LP, RP](
      lAgg, rAgg, _._1, _._1, "inner")
    val name = s"deep_parity_$batchSize"
    val q = joined.toDF("kind", "l", "r").writeStream
      .format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      events.zipWithIndex.grouped(batchSize).foreach { batch =>
        batch.foreach { case ((side, k, v, kind), i) =>
          if (side == 'L') lIn.addData((k, v, kind, i.toLong))
          else rIn.addData((k, v, kind, i.toLong))
        }
        q.processAllAvailable()
      }
      spark.table(name)
        .select(col("l"), col("r"), col("kind"))
        .as[(Option[LP], Option[RP], String)]
        .collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
    } finally q.stop()
  }

  test("live agg → join ← agg emits the batch replay's multiset " +
      "(one event per trigger)") {
    val got = streamEmissions(batchSize = 1)
    val want = batchEmissions()
    assert(got == want, s"\n got=$got\n want=$want")
  }

  test("live chain at coarse trigger granularity still matches") {
    val want = batchEmissions()
    assert(streamEmissions(batchSize = 3) == want)
    assert(streamEmissions(batchSize = events.size) == want)
  }

  test("the live chain's emissions net to the hand-computed final pairs") {
    val net = scala.collection.mutable.Map.empty[(LP, RP), Int]
    streamEmissions(batchSize = 2).foreach { case ((lo, ro, kind), n) =>
      (lo, ro) match {
        case (Some(lp), Some(rp)) =>
          val w = if (kind == "+I" || kind == "+U") n else -n
          val key = (lp, rp)
          val m = net.getOrElse(key, 0) + w
          if (m == 0) net.remove(key) else net(key) = m
        case _ => fail(s"inner join emitted a padded row: ($lo, $ro)")
      }
    }
    // cust 1: orders +10 +20 -10 → (1 order live? no: cnt 2-1=1, sum 20);
    // nation reassigned 5→6. cust 2 died → no pair.
    assert(net.toMap == Map(((1L, 1L, 20.0), (1L, 6)) -> 1))
  }
}
