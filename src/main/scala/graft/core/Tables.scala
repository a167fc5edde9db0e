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
    // events.ts precision varies across driver testdata generations:
    // TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read
    // nanos as long, rebuild; the data is µs-precision so it's lossless),
    // or native TIMESTAMP / TIMESTAMP_NTZ micros. Normalize all of them
    // to TimestampType (session TZ is pinned to UTC, so NTZ → LTZ is the
    // identity on the wall-clock values).
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val fixed = raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts",
          expr("timestamp_micros(ts DIV 1000)"))
        case TimestampNTZType => raw.withColumn("ts",
          col("ts").cast(TimestampType))
        case _ => raw
      }
      fixed.select(raw.columns.map(col).toSeq: _*)
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` can address it —
    * the analogue of the reference's `TableEnvironment` catalog
    * registration (flink-table-api-java/.../TableEnvironmentImpl.java).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
