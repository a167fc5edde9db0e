package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.io.{BytesWritable, IntWritable, LongWritable, SequenceFile, Text, Writable}
import org.apache.hadoop.io.compress.CompressionCodec
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Hadoop SequenceFile <K, V> read/write + compressed-sink codecs —
  * reference: flink-formats/flink-sequence-file
  * (SequenceFileWriterFactory: a BulkWriter of Writable pairs) and
  * flink-formats/flink-compress (CompressWriterFactory: codec-wrapped
  * file sink). Spark's Hadoop integration provides both runtimes; this
  * module closes the SURFACE: a typed DataFrame boundary in each
  * direction with the writable classes handled for the caller.
  *
  * Supported key/value Spark types (the reference writer is likewise
  * generic over Writables; these cover its shipped SerializerWritable
  * cases): BIGINT↔LongWritable, INT↔IntWritable, STRING↔Text,
  * BINARY↔BytesWritable.
  *
  * Reading sniffs the key/value classes from the SequenceFile header
  * of the first part file — the header names them, so no schema
  * declaration is needed. Hadoop REUSES writable instances per record;
  * every conversion below copies out immediately (the classic
  * sequence-file aliasing trap).
  *
  * Compression: `codec` ∈ gzip | bzip2 | deflate | none, BLOCK
  * compression type (the sequence-file default for analytics). All
  * three codecs run pure-JVM when native Hadoop libs are absent.
  * For plain text/csv/json sinks, Spark's own writer option does the
  * same job — see [[compressedWrite]].
  *
  * Scale shape: saveAsHadoopFile / sc.sequenceFile are partition-
  * parallel with zero driver involvement beyond the header sniff (one
  * small read). */
object SequenceFiles {

  private def writableClass(dt: DataType): Class[_ <: Writable] = dt match {
    case LongType => classOf[LongWritable]
    case IntegerType => classOf[IntWritable]
    case StringType => classOf[Text]
    case BinaryType => classOf[BytesWritable]
    case other => throw new IllegalArgumentException(
      s"sequence-file: unsupported column type $other " +
        "(supported: BIGINT, INT, STRING, BINARY)")
  }

  private def toWritable(v: Any, dt: DataType): Writable = dt match {
    case LongType => new LongWritable(v.asInstanceOf[Long])
    case IntegerType => new IntWritable(v.asInstanceOf[Int])
    case StringType => new Text(v.asInstanceOf[String])
    case BinaryType => new BytesWritable(v.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(other.toString)
  }

  /** Copy a (possibly reused) writable out to a Spark value. */
  private def fromWritable(w: Writable): Any = w match {
    case l: LongWritable => l.get()
    case i: IntWritable => i.get()
    case t: Text => t.toString
    case b: BytesWritable => b.copyBytes()
    case other => throw new IllegalArgumentException(
      s"sequence-file: unsupported writable ${other.getClass.getName}")
  }

  private def sparkType(cls: String): DataType = cls match {
    case c if c == classOf[LongWritable].getName => LongType
    case c if c == classOf[IntWritable].getName => IntegerType
    case c if c == classOf[Text].getName => StringType
    case c if c == classOf[BytesWritable].getName => BinaryType
    case other => throw new IllegalArgumentException(
      s"sequence-file: unsupported writable class $other")
  }

  def codecClass(name: String): Option[Class[_ <: CompressionCodec]] =
    name.toLowerCase match {
      case "none" | "" => None
      case "gzip" =>
        Some(classOf[org.apache.hadoop.io.compress.GzipCodec])
      case "bzip2" =>
        Some(classOf[org.apache.hadoop.io.compress.BZip2Codec])
      case "deflate" =>
        Some(classOf[org.apache.hadoop.io.compress.DefaultCodec])
      case other => throw new IllegalArgumentException(
        s"unsupported codec '$other' (gzip | bzip2 | deflate | none)")
    }

  /** Write a two-column DataFrame as SequenceFile<K, V> part files. */
  def write(df: DataFrame, path: String, codec: String = "none"): Unit = {
    require(df.schema.length == 2,
      s"sequence-file writes (key, value) — got ${df.schema.length} columns")
    val (kT, vT) = (df.schema(0).dataType, df.schema(1).dataType)
    val (kc, vc) = (writableClass(kT), writableClass(vT))
    val conf = new org.apache.hadoop.mapred.JobConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    conf.set("mapreduce.output.fileoutputformat.compress.type", "BLOCK")
    val rdd = df.rdd.map(r => (toWritable(r.get(0), kT), toWritable(r.get(1), vT)))
    val fmt = classOf[org.apache.hadoop.mapred.SequenceFileOutputFormat[
      Writable, Writable]]
    codecClass(codec) match {
      case Some(c) => rdd.saveAsHadoopFile(path, kc, vc, fmt, conf, Some(c))
      case None => rdd.saveAsHadoopFile(path, kc, vc, fmt, conf, None)
    }
  }

  /** Read SequenceFile part files back as a (key, value) DataFrame —
    * key/value types sniffed from the file header. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val (kCls, vCls) = sniffClasses(conf, path)
    val (kT, vT) = (sparkType(kCls), sparkType(vCls))
    val schema = StructType(Seq(
      StructField("key", kT, nullable = false),
      StructField("value", vT, nullable = false)))
    val rdd = spark.sparkContext
      .sequenceFile(path, classOf[Writable], classOf[Writable])
      .map { case (k, v) => Row(fromWritable(k), fromWritable(v)) }
    spark.createDataFrame(rdd, schema)
  }

  /** The SequenceFile header of the first part file names the key and
    * value classes. */
  private def sniffClasses(conf: Configuration, path: String): (String, String) = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val part = fs.listStatus(p).map(_.getPath)
      .filter(q => q.getName.startsWith("part-"))
      .sortBy(_.getName).headOption
      .getOrElse(throw new IllegalArgumentException(
        s"no part- files under $path"))
    val reader = new SequenceFile.Reader(conf, SequenceFile.Reader.file(part))
    try (reader.getKeyClassName, reader.getValueClassName)
    finally reader.close()
  }

  /** Compressed text-family sink (flink-compress's CompressWriterFactory
    * surface): Spark's writers carry the codec natively; reads are
    * transparent (the codec is inferred from the file extension). */
  def compressedWrite(df: DataFrame, path: String, format: String,
      codec: String): Unit = {
    require(Set("text", "csv", "json")(format),
      s"compressed sink supports text|csv|json, got $format")
    codecClass(codec) // validate the name eagerly
    df.write.format(format).option("compression", codec)
      .mode("overwrite").save(path)
  }
}
