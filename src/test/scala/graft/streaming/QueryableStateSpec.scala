package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Queryable state over the statestore data source: a streaming
  * aggregation's live per-key state is readable as a table and by
  * point lookup. */
class QueryableStateSpec extends SparkSpec {
  import spark.implicits._

  test("aggregation state is queryable by table scan and point lookup") {
    implicit val sq = spark.sqlContext
    val ckpt = Files.createTempDirectory("qstate").toString
    val in = MemoryStream[(String, Long)]
    val agg = in.toDF().toDF("k", "v")
      .groupBy(col("k")).agg(sum(col("v")).as("total"),
        count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("qstate_sink")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", ckpt)
      .start()
    try {
      in.addData(("a", 10L), ("a", 5L), ("b", 7L))
      q.processAllAvailable()
      in.addData(("b", 3L))
      q.processAllAvailable()

      // the state rows carry the aggregation BUFFER (physical field
      // names sum/count), not the output aliases — same as the
      // reference, where queryable state exposes the accumulator
      val flat = QueryableState.flattened(spark, ckpt)
      val byKey = flat.collect()
        .map(r => r.getString(0) -> r.getLong(r.fieldIndex("sum"))).toMap
      assert(byKey == Map("a" -> 15L, "b" -> 10L))

      val hit = QueryableState.lookup(spark, ckpt, "b")
      assert(hit.count() == 1)
      assert(hit.select(col("sum")).head().getLong(0) == 10L)

      val miss = QueryableState.lookup(spark, ckpt, "zzz")
      assert(miss.count() == 0)

      // under-specified composite keys are rejected, not prefix-matched
      val e = intercept[IllegalArgumentException] {
        QueryableState.lookupComposite(spark, ckpt, Seq("b", "extra"))
      }
      assert(e.getMessage.contains("one value per field"))

      // time travel: the state AS OF the first committed batch
      val first = QueryableState.store(spark, ckpt, batchId = Some(0L))
      val v0 = first.select(col("key.k"), col("value.sum")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(v0 == Map("a" -> 15L, "b" -> 7L))
    } finally q.stop()
  }
}
