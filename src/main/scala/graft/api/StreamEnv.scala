package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** DataStream-environment facade — reference:
  * StreamExecutionEnvironment.java:775-1112 (fromElements /
  * fromCollection / fromSequence / socketTextStream), the datagen source
  * (DataGenTableSourceFactory.java), print/blackhole sinks
  * (PrintTableSinkFactory.java / BlackHoleTableSinkFactory.java), and
  * side outputs (OutputTag / SingleOutputStreamOperator.getSideOutput).
  */
final class StreamEnv(val spark: SparkSession) {

  /** Reference fromElements/fromCollection. */
  def fromElements[T: Encoder](xs: T*): Dataset[T] =
    spark.createDataset(xs)
  def fromCollection[T: Encoder](xs: Seq[T]): Dataset[T] =
    spark.createDataset(xs)

  /** Reference fromSequence (bounded). */
  def fromSequence(from: Long, to: Long): Dataset[java.lang.Long] =
    spark.range(from, to + 1).as(org.apache.spark.sql.Encoders.LONG)

  /** Reference socketTextStream: unbounded line stream. */
  def socketTextStream(host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Reference datagen source: `rowsPerSecond` synthetic rows with a
    * monotonic id + processing timestamp; add columns with exprs. */
  def datagen(rowsPerSecond: Int, columns: (String, String)*): DataFrame = {
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    columns.foldLeft(base) { case (df, (name, sqlExpr)) =>
      df.withColumn(name, expr(sqlExpr))
    }
  }

  /** Reference print sink. */
  def printSink[T](ds: Dataset[T]): DataStreamWriter[T] =
    ds.writeStream.format("console")

  /** Reference blackhole sink (for benchmarking). */
  def blackholeSink[T](ds: Dataset[T]): DataStreamWriter[T] =
    ds.writeStream.format("noop")

  /** Side outputs (reference OutputTag): split one stream into tagged
    * substreams. Spark has no operator-level side outputs; the
    * micro-batch equivalent is a shared tag column + per-tag filters
    * (each consumer prunes its partition of the plan), or foreachBatch
    * multi-sink. Returns tag -> filtered stream. */
  def sideOutputs[T](ds: Dataset[T], tagCol: org.apache.spark.sql.Column,
      tags: Seq[String]): Map[String, DataFrame] = {
    val tagged = ds.withColumn("__tag", tagCol)
    tags.map(t => t -> tagged.filter(col("__tag") === t).drop("__tag")).toMap
  }
}

object StreamEnv {
  def apply(spark: SparkSession): StreamEnv = new StreamEnv(spark)
}
