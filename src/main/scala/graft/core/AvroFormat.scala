package graft.core

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Avro record format — reference: flink-formats/flink-avro
  * (AvroRowDataDeserializationSchema / AvroRowDataSerializationSchema,
  * AvroToRowDataConverters.java), which (de)serializes message payloads
  * (Kafka values, file records) to rows. The environment ships avro-core
  * (no spark-avro datasource module), so this implements the same
  * payload-level surface against the avro library directly.
  *
  * Supported schema subset: records of primitives (long, int, double,
  * float, boolean, string, bytes) and [null, T] unions. Temporal columns
  * convert to long (epoch micros) before encoding — same convention the
  * reference's avro timestamp logical types use.
  *
  * Scale shape: pure mapPartitions — writer/reader and codec buffers are
  * reused per partition, no shuffle, no driver involvement; decode sits
  * scan-side exactly like the reference's DeserializationSchema.
  */
object AvroFormat {

  /** Avro schema (subset) -> Spark schema. */
  def sparkType(schemaJson: String): StructType = {
    val schema = new Schema.Parser().parse(schemaJson)
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = fieldType(f.schema)
      StructField(f.name, dt, nullable)
    }.toSeq)
  }

  private def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported: $s")
      (fieldType(nonNull.head)._1, true)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case t => throw new IllegalArgumentException(s"unsupported avro type $t")
  }

  /** Serialize every column of `df` into a single avro-binary `value`
    * column (field order and names from the avro schema). */
  def toAvro(df: DataFrame, schemaJson: String): DataFrame = {
    val outSchema = StructType(Seq(StructField("value", BinaryType, nullable = false)))
    val inSchema = df.schema
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fieldNames = schema.getFields.asScala.map(_.name).toArray
      val idx = fieldNames.map(inSchema.fieldIndex)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val bos = new ByteArrayOutputStream()
      var encReuse: BinaryEncoder = null
      rows.map { r =>
        bos.reset()
        encReuse = EncoderFactory.get().binaryEncoder(bos, encReuse)
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fieldNames.length) {
          rec.put(fieldNames(i), toAvroValue(r.get(idx(i))))
          i += 1
        }
        writer.write(rec, encReuse)
        encReuse.flush()
        Row(bos.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  private[core] def toAvroValue(v: Any): AnyRef = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case o => o.asInstanceOf[AnyRef]
  }

  /** Decode an avro-binary column into the schema's columns (the rest of
    * the input row is dropped — payload-format semantics, like reading a
    * Kafka value). */
  def fromAvro(df: DataFrame, binaryCol: String, schemaJson: String): DataFrame = {
    val outSchema = sparkType(schemaJson)
    val colIdx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val fields = schema.getFields.asScala.map(_.name).toArray
      val reader = new GenericDatumReader[GenericRecord](schema)
      var decReuse: BinaryDecoder = null
      var recReuse: GenericRecord = null
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](colIdx)
        decReuse = DecoderFactory.get().binaryDecoder(bytes, decReuse)
        recReuse = reader.read(recReuse, decReuse)
        Row.fromSeq(fields.toSeq.map(f => fromAvroValue(recReuse.get(f))))
      }
    }(Encoders.row(outSchema))
  }

  private[core] def fromAvroValue(v: AnyRef): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case bb: java.nio.ByteBuffer =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case o => o
  }
}
