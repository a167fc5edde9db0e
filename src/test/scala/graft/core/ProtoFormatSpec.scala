package graft.core

import java.io.ByteArrayOutputStream

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class ProtoFormatSpec extends SparkSpec {

  private val proto = """
    message Rec {
      int64 id = 1;
      optional string name = 2;
      double score = 3;
      bool active = 4;
      bytes payload = 5;
      sint64 delta = 6;
      float ratio = 7;
      repeated int64 xs = 8;
      repeated string tags = 9;
      fixed64 fx = 10;
      sfixed32 sf = 11;
    }"""

  test("proto text parses to the spark schema subset") {
    val st = ProtoFormat.sparkType(proto)
    assert(st("id") == StructField("id", LongType, nullable = true))
    assert(st("name") == StructField("name", StringType, nullable = true))
    assert(st("xs") == StructField("xs", ArrayType(LongType, containsNull = false), nullable = true))
    assert(st("tags") == StructField("tags", ArrayType(StringType, containsNull = false), nullable = true))
    assert(st("sf") == StructField("sf", IntegerType, nullable = true))
  }

  test("golden bytes: spec example field 1 varint 150 encodes as 08 96 01") {
    // The canonical example from the public protobuf encoding documentation.
    val f = ProtoFormat.parse("int64 a = 1;")
    val out = new ByteArrayOutputStream()
    val bytes = ProtoFormat.encodeRow(f, Seq(150L), out)
    assert(bytes.toSeq == Seq(0x08, 0x96, 0x01).map(_.toByte))
    assert(ProtoFormat.decodeRow(f, bytes).toSeq == Seq(150L))
  }

  test("roundtrip preserves values: negatives, zigzag, zero, empty, multibyte utf8") {
    val f = ProtoFormat.parse(proto)
    val out = new ByteArrayOutputStream()
    val cases: Seq[Seq[Any]] = Seq(
      Seq(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3), -42L, 0.5f, Seq(1L, -2L, 3L), Seq("a", "ü†"), -1L, -7),
      Seq(-9223372036854775808L, null, -0.25, false, Array.empty[Byte], 9223372036854775807L, -3.25f, Seq.empty[Long], Seq.empty[String], 0L, 0),
      Seq(0L, "", 0.0, false, null, 0L, 0.0f, Seq(0L), Seq(""), 123456789012345L, 2147483647))
    cases.foreach { vals =>
      val bytes = ProtoFormat.encodeRow(f, vals, out)
      val back = ProtoFormat.decodeRow(f, bytes).toSeq
      vals.indices.foreach { i =>
        (vals(i), back(i)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.toSeq == b.toSeq)
          // proto3 presence: we encode null as absent; 0/""/false VALUES are
          // still emitted (we only skip nulls), so they roundtrip exactly.
          case (a, b) => assert(b == a, s"field $i")
        }
      }
    }
  }

  test("unknown fields are skipped by wire type (forward compatibility)") {
    val wide = ProtoFormat.parse(
      "int64 id = 1; string extra = 2; double d = 3; repeated int64 xs = 4; fixed32 fx = 5;")
    val narrow = ProtoFormat.parse("int64 id = 1;")
    val out = new ByteArrayOutputStream()
    val bytes = ProtoFormat.encodeRow(wide, Seq(9L, "junk", 2.5, Seq(1L, 2L), 77L), out)
    assert(ProtoFormat.decodeRow(narrow, bytes).toSeq == Seq(9L))
  }

  test("unpacked repeated scalars accumulate across tags") {
    // Hand-build: field 8 (repeated int64) written unpacked — tag 0x40, value.
    val f = ProtoFormat.parse("repeated int64 xs = 8;")
    val bytes = Array[Byte](0x40, 0x05, 0x40, 0x07)
    assert(ProtoFormat.decodeRow(f, bytes).head == Seq(5L, 7L))
  }

  test("absent singular decodes null; absent repeated decodes empty") {
    val f = ProtoFormat.parse("int64 id = 1; string s = 2; repeated int64 xs = 3;")
    val out = new ByteArrayOutputStream()
    val bytes = ProtoFormat.encodeRow(f, Seq(null, null, null), out)
    assert(bytes.isEmpty)
    assert(ProtoFormat.decodeRow(f, bytes).toSeq == Seq(null, null, Seq.empty))
  }

  test("dataframe roundtrip follows proto field order, not dataframe order") {
    val p = "message M { int64 id = 1; string name = 2; double score = 3; repeated int64 xs = 4; }"
    val schema = ProtoFormat.sparkType(p)
    val rows = Seq(
      Row(7L, "x", 2.0, Seq(1L, 2L)),
      Row(8L, null, -1.5, Seq.empty[Long]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .select("score", "name", "xs", "id") // shuffled cols
    val bin = ProtoFormat.toProto(df, p)
    assert(bin.schema.fieldNames.toSeq == Seq("value"))
    val back = ProtoFormat.fromProto(bin, "value", p)
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "score", "xs"))
    val got = back.collect().sortBy(_.getLong(0))
    assert(got(0).getLong(0) == 7L && got(0).getString(1) == "x" &&
      got(0).getDouble(2) == 2.0 && got(0).getSeq[Long](3) == Seq(1L, 2L))
    assert(got(1).isNullAt(1) && got(1).getSeq[Long](3).isEmpty)
  }
}
