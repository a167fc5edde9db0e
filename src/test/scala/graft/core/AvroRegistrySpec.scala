package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** avro-confluent wire format against a live (embedded) registry over
  * real HTTP: frame layout, round-trip, per-JVM schema-fetch caching,
  * and the schema-evolution decode that is the format's whole point. */
class AvroRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val v1 = """{"type":"record","name":"doc","fields":[
    {"name":"k","type":"long"},
    {"name":"name","type":"string"}]}"""
  // v2 adds a defaulted field (backward-compatible evolution)
  private val v2 = """{"type":"record","name":"doc","fields":[
    {"name":"k","type":"long"},
    {"name":"name","type":"string"},
    {"name":"score","type":"double","default":0.5}]}"""

  test("wire frame is magic 0x00 + big-endian id + avro body; round-trips") {
    val reg = new EmbeddedSchemaRegistry
    reg.start()
    try {
      SchemaRegistryClient.clearCaches()
      val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
      val framed = AvroRegistryFormat.toAvro(df, v1, reg.url, "doc-value")
      val bytes = framed.collect().map(_.getAs[Array[Byte]](0))
      assert(bytes.forall(b => b(0) == 0x0 && b.length > 5))
      val id = new SchemaRegistryClient(reg.url).register("doc-value", v1)
      assert(bytes.forall(b =>
        ((b(1) & 0xff) << 24 | (b(2) & 0xff) << 16 |
          (b(3) & 0xff) << 8 | (b(4) & 0xff)) == id))
      val back = AvroRegistryFormat.fromAvro(framed, "value", v1, reg.url)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(back == Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally reg.stop()
  }

  test("schema fetch is once per JVM, not per record or per partition") {
    val reg = new EmbeddedSchemaRegistry
    reg.start()
    try {
      SchemaRegistryClient.clearCaches()
      val df = spark.range(0, 400, 1, 8) // 8 partitions
        .select(col("id").as("k"), concat(lit("n"), col("id")).as("name"))
      val framed = AvroRegistryFormat.toAvro(df, v1, reg.url, "doc-value")
      val n = AvroRegistryFormat.fromAvro(framed, "value", v1, reg.url).count()
      assert(n == 400)
      assert(reg.posts.get() == 1,
        s"register must hit HTTP once per JVM, saw ${reg.posts.get()}")
      assert(reg.gets.get() == 1,
        s"schema-by-id must hit HTTP once per JVM, saw ${reg.gets.get()}")
    } finally reg.stop()
  }

  test("schema evolution: v1 and v2 writers decode under the v2 reader") {
    val reg = new EmbeddedSchemaRegistry
    reg.start()
    try {
      SchemaRegistryClient.clearCaches()
      val oldRows = Seq((1L, "old1"), (2L, "old2")).toDF("k", "name")
      val newRows = Seq((3L, "new1", 9.25)).toDF("k", "name", "score")
      val mixed = AvroRegistryFormat.toAvro(oldRows, v1, reg.url, "doc-value")
        .unionByName(
          AvroRegistryFormat.toAvro(newRows, v2, reg.url, "doc-value"))
      val got = AvroRegistryFormat.fromAvro(mixed, "value", v2, reg.url)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      // v1 records gain score from the v2 default; v2 keeps its value
      assert(got == Set((1L, "old1", 0.5), (2L, "old2", 0.5),
        (3L, "new1", 9.25)))
      // two distinct schemas -> two registered ids, two fetches
      assert(reg.posts.get() == 2 && reg.gets.get() == 2)
    } finally reg.stop()
  }

  test("non-confluent payload fails with a frame diagnosis, not an avro decode error") {
    val reg = new EmbeddedSchemaRegistry
    reg.start()
    try {
      val junk = Seq(Tuple1(Array[Byte](7, 7, 7))).toDF("value")
      val e = intercept[org.apache.spark.SparkException] {
        AvroRegistryFormat.fromAvro(junk, "value", v1, reg.url).collect()
      }
      assert(e.getMessage.contains("confluent") ||
        Option(e.getCause).exists(_.getMessage.contains("confluent")))
    } finally reg.stop()
  }
}
