package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{LongType, StringType, StructType}

case class Upsert(pk: Long, name: String, deleted: Boolean)

class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("name", StringType)

  test("debezium decode: c/u/d → +I / -U +U / -D") {
    val df = Seq(
      """{"before":null,"after":{"id":1,"name":"a"},"op":"c"}""",
      """{"before":{"id":1,"name":"a"},"after":{"id":1,"name":"b"},"op":"u"}""",
      """{"before":{"id":1,"name":"b"},"after":null,"op":"d"}"""
    ).toDF("value")
    val got = ChangelogFormats.fromDebezium(df, "value", schema)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      ("+I", 1L, "a"), ("-U", 1L, "a"), ("+U", 1L, "b"), ("-D", 1L, "b")))
  }

  test("maxwell decode merges partial old image into -U row") {
    val df = Seq(
      """{"data":{"id":7,"name":"new"},"old":{"name":"old"},"type":"update"}"""
    ).toDF("value")
    val got = ChangelogFormats.fromMaxwell(df, "value", schema)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(("-U", 7L, "old"), ("+U", 7L, "new")))
  }

  test("canal decode handles row arrays with positional old images") {
    val df = Seq(
      """{"data":[{"id":1,"name":"x1"},{"id":2,"name":"x2"}],
          "old":[{"name":"o1"},{"name":"o2"}],"type":"UPDATE"}"""
        .replaceAll("\n\\s*", "")
    ).toDF("value")
    val got = ChangelogFormats.fromCanal(df, "value", schema)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSet == Set(
      ("-U", 1L, "o1"), ("+U", 1L, "x1"),
      ("-U", 2L, "o2"), ("+U", 2L, "x2")))
  }

  test("ogg decode: I/U/D ops") {
    val df = Seq(
      """{"before":null,"after":{"id":3,"name":"z"},"op_type":"I"}"""
    ).toDF("value")
    val got = ChangelogFormats.fromOgg(df, "value", schema)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(("+I", 3L, "z")))
  }

  test("changelogNormalize emits +I / -U +U / -D across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Upsert]
    val out = ChangelogNormalize.normalize[Long, Upsert](
      in.toDS(), _.pk, _.deleted)
    val q = out.writeStream.format("memory").queryName("cn")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(Upsert(1, "a", deleted = false))
      q.processAllAvailable()
      in.addData(Upsert(1, "b", deleted = false)) // update
      q.processAllAvailable()
      in.addData(Upsert(1, "b", deleted = true))  // tombstone
      q.processAllAvailable()
      val got = spark.table("cn").as[(String, Upsert)].collect()
        .map(r => (r._1, r._2.name))
      assert(got.toSeq == Seq(
        ("+I", "a"), ("-U", "a"), ("+U", "b"), ("-D", "b")))
    } finally q.stop()
  }

  test("batch changelog materialization handles retractions exactly") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("A", 10.0, "+I"), ("A", 10.0, "-U"), ("A", 30.0, "+U"),
      ("A", 5.0, "+I"),
      ("B", 7.0, "+I"), ("B", 7.0, "-D"))
      .toDF("k", "v", ChangelogFormats.RowKindCol)
    val out = ChangelogAgg.materialize(df, Seq("k"), "v").collect()
    assert(out.length == 1)                 // B fully retracted
    val a = out.head
    assert(a.getString(0) == "A" && a.getLong(1) == 2L)
    assert(a.getDouble(2) == 35.0)          // 30 + 5
    assert(a.getDouble(3) == 5.0 && a.getDouble(4) == 30.0)
  }

  test("duplicate values retract one multiplicity, not all") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("A", 10.0, "+I"), ("A", 10.0, "+I"), ("A", 10.0, "-D"),
      ("A", 20.0, "+I"))
      .toDF("k", "v", ChangelogFormats.RowKindCol)
    val out = ChangelogAgg.materialize(df, Seq("k"), "v").collect().head
    assert(out.getLong(1) == 2L)
    assert(out.getDouble(3) == 10.0)        // one 10 still live
  }

  test("updateStream emits +I then -U/+U pairs, -D on death, +I on revival") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("A", 10.0, "+I", 1), ("A", 20.0, "+I", 2),
      ("B", 7.0, "+I", 1), ("B", 7.0, "-D", 2),  // B dies...
      ("B", 9.0, "+I", 3))                       // ...and revives
      .toDF("k", "v", ChangelogFormats.RowKindCol, "seq")
    val got = ChangelogAgg.updateStream(df, Seq("k"), "v", Seq(col("seq")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getString(3)))
    val a = got.filter(_._1 == "A").toSeq
    assert(a == Seq(("A", 1L, 10.0, "+I"),
      ("A", 1L, 10.0, "-U"), ("A", 2L, 30.0, "+U")))
    val b = got.filter(_._1 == "B").toSeq
    // death emits a -D of the dying state (reference GroupAggFunction
    // DELETE at count zero); the revival is an INSERT — the store has
    // no current row for the key after the delete
    assert(b == Seq(("B", 1L, 7.0, "+I"),
      ("B", 1L, 7.0, "-D"), ("B", 1L, 9.0, "+I")))
  }

  test("two-stage chain: second materialize nets the update stream") {
    import org.apache.spark.sql.functions._
    // A ends with 2 orders, B with 1 — the intermediate cnt=1 state of
    // A must vanish from the bucket histogram via its -U
    val df = Seq(
      ("A", 10.0, "+I", 1), ("A", 20.0, "+I", 2),
      ("B", 5.0, "+I", 1))
      .toDF("k", "v", ChangelogFormats.RowKindCol, "seq")
    val upd = ChangelogAgg.updateStream(df, Seq("k"), "v", Seq(col("seq")))
    val out = ChangelogAgg.materialize(
        upd.select(col("cnt").as("bucket"), col("sum_val").as("s"),
          col(ChangelogFormats.RowKindCol)),
        Seq("bucket"), "s")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out == Map(1L -> ((1L, 5.0)), 2L -> ((1L, 30.0))))
  }

  test("streaming retractable aggregate updates min/max through retractions") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Double, String)]
    val out = ChangelogAgg.streamingMaterialize[String](in.toDS())
    val q = out.writeStream.format("memory").queryName("clagg")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(("k", 10.0, "+I"), ("k", 20.0, "+I"))
      q.processAllAvailable()
      in.addData(("k", 10.0, "-D"))   // retract the current minimum
      q.processAllAvailable()
      val hist = spark.table("clagg")
        .as[(String, Long, Double, Double, Double)].collect()
      assert(hist.length == 2)
      assert(hist(0) == (("k", 2L, 30.0, 10.0, 20.0)))
      assert(hist(1) == (("k", 1L, 20.0, 20.0, 20.0)))
    } finally q.stop()
  }
}
