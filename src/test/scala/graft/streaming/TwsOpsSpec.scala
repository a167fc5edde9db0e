package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** transformWithState (Spark 4 StatefulProcessor) — requires RocksDB
  * state store provider. */
class TwsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("keepLastTws dedups per key via ValueState") {
    implicit val sq = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Ev]
    val out = TwsOps.keepLastTws[String, Ev](in.toDS(), _.k, _.seq)
    val q = out.writeStream.format("memory").queryName("tws")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tws-ckpt").toString)
      .outputMode(OutputMode.Update())
      .start()
    try {
      in.addData(Ev("a", 1, 1.0), Ev("a", 3, 3.0))
      q.processAllAvailable()
      in.addData(Ev("a", 2, 2.0)) // stale
      in.addData(Ev("b", 7, 7.0))
      q.processAllAvailable()
      val rows = spark.table("tws").as[Ev].collect()
      val latest = rows.groupBy(_.k).map { case (k, rs) => k -> rs.last.seq }
      assert(latest("a") == 3 && latest("b") == 7)
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
}
