package graft.core

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Source/sink/format coverage — reference: FileSource/FileSink + format
  * modules (SURVEY.md §2.1). Spark's DataFrameReader/Writer and the file
  * stream source are the mappings; these tests prove the read/write
  * paths round-trip on this build (avro connector is not bundled in
  * this environment; csv/json/orc/text/parquet are).
  */
class SourcesSpec extends SparkSpec {

  private lazy val nation = Tables.load(spark, sfDir, "nation")

  private def roundtrip(format: String): Unit = {
    val dir = Files.createTempDirectory(s"graft-$format").toString
    nation.write.format(format).option("header", "true")
      .mode("overwrite").save(dir)
    val back = spark.read.format(format)
      .option("inferSchema", "true").option("header", "true")
      .schema(nation.schema).load(dir)
    assert(back.count() == 25)
    assert(back.select(sum(col("n_nationkey"))).collect().head.getLong(0) ==
      nation.select(sum(col("n_nationkey"))).collect().head.getLong(0))
  }

  test("csv roundtrip")(roundtrip("csv"))
  test("json roundtrip")(roundtrip("json"))
  test("orc roundtrip")(roundtrip("orc"))
  test("parquet roundtrip")(roundtrip("parquet"))

  test("text format reads lines") {
    val dir = Files.createTempDirectory("graft-text").toString
    nation.select(col("n_name")).write.mode("overwrite").text(dir)
    assert(spark.read.text(dir).count() == 25)
  }

  test("partitioned write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft-part").toString
    nation.write.partitionBy("n_regionkey").mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("n_regionkey") === 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(one.count() == nation.filter(col("n_regionkey") === 0).count())
    // partition filter must not appear as a data filter (pruned at scan)
    assert(!plan.contains("PushedFilters: [IsNotNull(n_regionkey)"))
  }

  test("file stream source picks up files incrementally (dir monitoring)") {
    val dir = Files.createTempDirectory("graft-stream-src").toString
    nation.limit(10).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(nation.schema).parquet(dir)
    val q = stream.groupBy().count()
      .writeStream.format("memory").queryName("filesrc")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val n1 = spark.table("filesrc").collect().head.getLong(0)
      assert(n1 == 10)
      nation.limit(5).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val n2 = spark.table("filesrc").collect().head.getLong(0)
      assert(n2 == 15)
    } finally q.stop()
  }

  test("streaming file sink commits exactly-once via checkpoint") {
    val src = Files.createTempDirectory("graft-sink-src").toString
    val out = Files.createTempDirectory("graft-sink-out").toString
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString
    nation.write.mode("append").parquet(src)
    val q = spark.readStream.schema(nation.schema).parquet(src)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).count() == 25)
  }
}
