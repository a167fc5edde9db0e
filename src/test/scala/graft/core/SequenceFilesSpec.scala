package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SequenceFile round-trips per supported writable pair, codec'd
  * variants, header-sniffed schema on read, and the compressed
  * text-sink surface. */
class SequenceFilesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).resolve("out").toString

  test("long/text round-trips; read sniffs types from the header") {
    val dir = tmp("graft_seq_lt")
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("k", "v")
    SequenceFiles.write(df, dir)
    val back = SequenceFiles.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq(("key", "bigint"), ("value", "string")))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
  }

  test("int/bytes round-trips (BytesWritable copy-out, no aliasing)") {
    val dir = tmp("graft_seq_ib")
    val rows = (0 until 50).map(i => (i, Array.tabulate[Byte](8)(j => (i + j).toByte)))
    SequenceFiles.write(rows.toDF("k", "v").repartition(4), dir)
    val back = SequenceFiles.read(spark, dir)
      .collect().map(r => (r.getInt(0), r.getAs[Array[Byte]](1).toSeq)).toSet
    // distinct byte payloads per key: a reused/aliased writable would
    // collapse them to one buffer's content
    assert(back == rows.map { case (k, v) => (k, v.toSeq) }.toSet)
  }

  test("gzip and bzip2 block compression round-trip (pure-JVM codecs)") {
    for (codec <- Seq("gzip", "bzip2", "deflate")) {
      val dir = tmp(s"graft_seq_$codec")
      val df = spark.range(0, 500)
        .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"))
      SequenceFiles.write(df, dir, codec)
      assert(SequenceFiles.read(spark, dir).count() == 500, codec)
    }
  }

  test("unsupported column type / codec raise with guidance") {
    val dir = tmp("graft_seq_bad")
    val e1 = intercept[IllegalArgumentException] {
      SequenceFiles.write(Seq((1.5, "x")).toDF("k", "v"), dir)
    }
    assert(e1.getMessage.contains("supported"))
    val e2 = intercept[IllegalArgumentException] {
      SequenceFiles.write(Seq((1L, "x")).toDF("k", "v"), dir, "lzo")
    }
    assert(e2.getMessage.contains("codec"))
  }

  test("compressed text sink writes codec'd files Spark reads transparently") {
    val dir = tmp("graft_compress_csv")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    SequenceFiles.compressedWrite(df, dir, "csv", "gzip")
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".csv.gz")), files.mkString(","))
    val back = spark.read.schema("k LONG, v STRING").csv(dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
