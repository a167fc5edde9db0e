package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class AvroFormatSpec extends SparkSpec {

  private val schemaJson = """{"type":"record","name":"rec","fields":[
    {"name":"id","type":"long"},
    {"name":"name","type":["null","string"]},
    {"name":"score","type":"double"},
    {"name":"active","type":"boolean"},
    {"name":"payload","type":["null","bytes"]}]}"""

  test("avro schema maps to the spark schema subset") {
    assert(AvroFormat.sparkType(schemaJson) == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = false),
      StructField("active", BooleanType, nullable = false),
      StructField("payload", BinaryType, nullable = true))))
  }

  test("roundtrip preserves values including nulls and bytes") {
    val schema = AvroFormat.sparkType(schemaJson)
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3)),
      Row(2L, null, -0.25, false, null),
      Row(3L, "gamma", 0.0, true, Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val bin = AvroFormat.toAvro(df, schemaJson)
    assert(bin.schema.fieldNames.toSeq == Seq("value"))
    val back = AvroFormat.fromAvro(bin, "value", schemaJson).collect()
      .sortBy(_.getLong(0))
    assert(back.length == 3)
    assert(back(0).getLong(0) == 1L && back(0).getString(1) == "alpha" &&
      back(0).getDouble(2) == 1.5 && back(0).getBoolean(3) &&
      back(0).getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2, 3))
    assert(back(1).isNullAt(1) && back(1).isNullAt(4))
    assert(back(2).getAs[Array[Byte]](4).isEmpty)
  }

  test("field order follows the avro schema, not the dataframe") {
    val schema = AvroFormat.sparkType(schemaJson)
    val rows = Seq(Row(7L, "x", 2.0, false, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .select("score", "active", "id", "name", "payload") // shuffled cols
    val back = AvroFormat.fromAvro(
      AvroFormat.toAvro(df, schemaJson), "value", schemaJson)
    assert(back.schema.fieldNames.toSeq ==
      Seq("id", "name", "score", "active", "payload"))
    assert(back.collect().head.getLong(0) == 7L)
  }
}
