package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-generated TPC-H-ish parquet test data
  * (TESTDATA.md). Mirrors the reference's metastore-free filesystem table
  * connector (reference: flink-connectors/flink-connector-files/src/main/java/
  * org/apache/flink/connector/file/table/FileSystemTableFactory.java) —
  * tables are parquet directories addressed by name; Spark's vectorized
  * parquet reader handles scan, pushdown and pruning.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects. The data is µs-precision (ns remainder = 0), so read
    // nanos as long and rebuild a proper TimestampType column — lossless.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
        .select(raw.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` can address it —
    * the analogue of the reference's `TableEnvironment` catalog
    * registration (flink-table-api-java/.../TableEnvironmentImpl.java).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
