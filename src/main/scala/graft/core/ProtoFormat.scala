package graft.core

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Protobuf payload format — reference: flink-formats/flink-protobuf
  * (PbRowDataDeserializationSchema / PbRowDataSerializationSchema), which
  * (de)serializes proto-encoded message payloads to rows from a compiled
  * message class. This environment has no protobuf-java jar, so the codec
  * below implements the (public, stable) proto3 wire format directly —
  * varints, zigzag, fixed32/64, length-delimited, packed repeated — from a
  * parsed `.proto` message text rather than a generated class.
  *
  * Wire-format rules implemented (proto3 encoding spec):
  *  - tag = (fieldNumber << 3) | wireType; varint = base-128 LE groups
  *  - int32/int64/bool → varint (negatives = 10-byte two's complement)
  *  - sint32/sint64 → zigzag varint; double/fixed64 → wire type 1 (LE);
  *    float/fixed32 → wire type 5 (LE); string/bytes → length-delimited
  *  - repeated scalars decode both packed (one length-delimited block) and
  *    unpacked (repeated tags); we encode scalars packed, strings per-tag
  *  - unknown field numbers are skipped by wire type (forward compat)
  *  - absent field ⇒ null on decode for singular fields, empty array for
  *    repeated; null values are omitted on encode (proto3 presence)
  *
  * Scale shape: pure mapPartitions, buffers reused per partition, no
  * shuffle, no driver involvement — decode sits scan-side exactly like the
  * reference's DeserializationSchema.
  */
object ProtoFormat {

  private[core] case class Field(number: Int, name: String, ptype: String, repeated: Boolean)

  private val FieldRe =
    """(?s)\s*(repeated|optional)?\s*(double|float|int32|int64|uint32|uint64|sint32|sint64|fixed32|fixed64|sfixed32|sfixed64|bool|string|bytes)\s+(\w+)\s*=\s*(\d+)\s*;""".r

  /** Parse a minimal proto3 `message` body: `[repeated|optional] type name = N;` lines.
    * Accepts either a full `message X { ... }` or just the field lines. */
  private[core] def parse(protoText: String): Seq[Field] = {
    val body = {
      val i = protoText.indexOf('{')
      if (i >= 0) protoText.substring(i + 1, protoText.lastIndexOf('}')) else protoText
    }
    val fields = FieldRe.findAllMatchIn(body).map { m =>
      Field(m.group(4).toInt, m.group(3), m.group(2), m.group(1) == "repeated")
    }.toSeq
    require(fields.nonEmpty, s"no proto fields parsed from: $protoText")
    require(fields.map(_.number).distinct.size == fields.size, "duplicate field numbers")
    fields
  }

  /** Proto schema (subset) -> Spark schema; all fields nullable (proto3 presence). */
  def sparkType(protoText: String): StructType =
    StructType(parse(protoText).map { f =>
      val base = scalarType(f.ptype)
      StructField(f.name, if (f.repeated) ArrayType(base, containsNull = false) else base, nullable = true)
    })

  private def scalarType(t: String): DataType = t match {
    case "double" => DoubleType
    case "float" => FloatType
    case "int32" | "sint32" | "sfixed32" => IntegerType
    case "uint32" | "fixed32" => LongType // uint32 range exceeds Int
    case "int64" | "uint64" | "sint64" | "fixed64" | "sfixed64" => LongType
    case "bool" => BooleanType
    case "string" => StringType
    case "bytes" => BinaryType
  }

  private def wireType(t: String): Int = t match {
    case "double" | "fixed64" | "sfixed64" => 1
    case "float" | "fixed32" | "sfixed32" => 5
    case "string" | "bytes" => 2
    case _ => 0
  }

  // ---- low-level writers ----------------------------------------------

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def writeTag(out: ByteArrayOutputStream, number: Int, wt: Int): Unit =
    writeVarint(out, (number.toLong << 3) | wt)

  private def writeFixed(out: ByteArrayOutputStream, v: Long, bytes: Int): Unit = {
    var i = 0
    while (i < bytes) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def writeScalar(out: ByteArrayOutputStream, t: String, v: Any): Unit = t match {
    case "double" => writeFixed(out, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8)
    case "float" => writeFixed(out, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong & 0xffffffffL, 4)
    case "fixed64" | "sfixed64" => writeFixed(out, v.asInstanceOf[Long], 8)
    case "fixed32" => writeFixed(out, v.asInstanceOf[Long] & 0xffffffffL, 4)
    case "sfixed32" => writeFixed(out, v.asInstanceOf[Int].toLong & 0xffffffffL, 4)
    case "sint32" => writeVarint(out, zigzag(v.asInstanceOf[Int].toLong))
    case "sint64" => writeVarint(out, zigzag(v.asInstanceOf[Long]))
    case "int32" => writeVarint(out, v.asInstanceOf[Int].toLong) // negatives sign-extend to 10 bytes
    case "uint32" => writeVarint(out, v.asInstanceOf[Long] & 0xffffffffL)
    case "int64" | "uint64" => writeVarint(out, v.asInstanceOf[Long])
    case "bool" => writeVarint(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
    case "string" =>
      val b = v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
      writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
    case "bytes" =>
      val b = v.asInstanceOf[Array[Byte]]
      writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
  }

  private[core] def encodeRow(fields: Seq[Field], values: Seq[Any], out: ByteArrayOutputStream): Array[Byte] = {
    out.reset()
    fields.iterator.zip(values.iterator).foreach { case (f, v) =>
      if (v != null) {
        if (f.repeated) {
          val xs = v.asInstanceOf[scala.collection.Seq[Any]]
          if (wireType(f.ptype) == 2) { // strings/bytes: one tag per element
            xs.foreach { x => writeTag(out, f.number, 2); writeScalar(out, f.ptype, x) }
          } else if (xs.nonEmpty) { // packed scalars
            val tmp = new ByteArrayOutputStream()
            xs.foreach(writeScalar(tmp, f.ptype, _))
            writeTag(out, f.number, 2)
            val b = tmp.toByteArray
            writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
          }
        } else {
          writeTag(out, f.number, wireType(f.ptype))
          writeScalar(out, f.ptype, v)
        }
      }
    }
    out.toByteArray
  }

  // ---- low-level reader -----------------------------------------------

  private final class Reader(buf: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < buf.length
    def readVarint(): Long = {
      var shift = 0; var result = 0L
      while (shift < 64) {
        val b = buf(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def readFixed(bytes: Int): Long = {
      var v = 0L; var i = 0
      while (i < bytes) { v |= (buf(pos + i).toLong & 0xff) << (8 * i); i += 1 }
      pos += bytes; v
    }
    def readBytes(): Array[Byte] = {
      val len = readVarint().toInt
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + len); pos += len; a
    }
    def skip(wt: Int): Unit = wt match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => val len = readVarint().toInt; pos += len
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"cannot skip wire type $other")
    }
  }

  private def decodeScalar(r: Reader, t: String): Any = t match {
    case "double" => java.lang.Double.longBitsToDouble(r.readFixed(8))
    case "float" => java.lang.Float.intBitsToFloat(r.readFixed(4).toInt)
    case "fixed64" | "sfixed64" => r.readFixed(8)
    case "fixed32" => r.readFixed(4) & 0xffffffffL
    case "sfixed32" => r.readFixed(4).toInt
    case "sint32" => unzigzag(r.readVarint()).toInt
    case "sint64" => unzigzag(r.readVarint())
    case "int32" => r.readVarint().toInt
    case "uint32" => r.readVarint() & 0xffffffffL
    case "int64" | "uint64" => r.readVarint()
    case "bool" => r.readVarint() != 0L
    case "string" => new String(r.readBytes(), StandardCharsets.UTF_8)
    case "bytes" => r.readBytes()
  }

  private[core] def decodeRow(fields: Seq[Field], bytes: Array[Byte]): Array[Any] = {
    val byNumber = fields.iterator.zipWithIndex.map { case (f, i) => (f.number, (f, i)) }.toMap
    val out = new Array[Any](fields.length)
    fields.iterator.zipWithIndex.foreach { case (f, i) =>
      if (f.repeated) out(i) = scala.collection.mutable.ArrayBuffer.empty[Any]
    }
    val r = new Reader(bytes)
    while (r.hasMore) {
      val tag = r.readVarint()
      val number = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      byNumber.get(number) match {
        case None => r.skip(wt)
        case Some((f, i)) =>
          if (f.repeated) {
            val acc = out(i).asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]]
            if (wt == 2 && wireType(f.ptype) != 2) { // packed block
              val block = r.readBytes()
              val pr = new Reader(block)
              while (pr.hasMore) acc += decodeScalar(pr, f.ptype)
            } else acc += decodeScalar(r, f.ptype)
          } else out(i) = decodeScalar(r, f.ptype)
      }
    }
    var i = 0
    while (i < fields.length) {
      out(i) match { case b: scala.collection.mutable.ArrayBuffer[_] => out(i) = b.toSeq; case _ => }
      i += 1
    }
    out
  }

  // ---- DataFrame surface ----------------------------------------------

  /** Serialize the schema's columns of `df` into one proto-binary `value`
    * column (field order/names from the proto text). */
  def toProto(df: DataFrame, protoText: String): DataFrame = {
    val fields = parse(protoText)
    val inSchema = df.schema
    val idx = fields.map(f => inSchema.fieldIndex(f.name)).toArray
    val outSchema = StructType(Seq(StructField("value", BinaryType, nullable = false)))
    df.mapPartitions { rows =>
      val bos = new ByteArrayOutputStream()
      rows.map { row =>
        val vals = idx.map(row.get(_)).toSeq
        Row(encodeRow(fields, vals, bos))
      }
    }(Encoders.row(outSchema))
  }

  /** Decode a proto-binary column into the schema's columns (payload-format
    * semantics — the rest of the input row is dropped, like a Kafka value). */
  def fromProto(df: DataFrame, binaryCol: String, protoText: String): DataFrame = {
    val fields = parse(protoText)
    val outSchema = sparkType(protoText)
    val colIdx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        Row.fromSeq(decodeRow(fields, row.getAs[Array[Byte]](colIdx)).toSeq)
      }
    }(Encoders.row(outSchema))
  }
}
