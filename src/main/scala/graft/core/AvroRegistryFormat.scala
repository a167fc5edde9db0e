package graft.core

import java.io.ByteArrayOutputStream

import scala.collection.JavaConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** avro-confluent payload format — [[AvroFormat]] framed with the
  * Confluent wire format and wired to a schema registry (reference:
  * flink-formats/flink-avro-confluent-registry,
  * RegistryAvroSerializationSchema / RegistryAvroDeserializationSchema
  * + ConfluentSchemaRegistryCoder). Wire layout (public Confluent
  * spec): magic byte 0x00, 4-byte BIG-ENDIAN global schema id, avro
  * binary body.
  *
  * What the registry buys over plain [[AvroFormat]] is SCHEMA
  * EVOLUTION: every record names its exact writer schema by id, so a
  * topic/corpus can mix generations — the decoder resolves each
  * record's writer schema from the registry and resolves it AGAINST
  * the caller's reader schema (avro schema resolution: new fields
  * filled from defaults, dropped fields skipped), which is how a
  * 100 TB corpus written over years decodes under today's schema.
  *
  * Scale shape: identical to [[AvroFormat]] — pure mapPartitions,
  * no shuffle. Registry traffic is one HTTP round-trip per DISTINCT
  * schema per executor JVM ([[SchemaRegistryClient]]'s caches), never
  * per record; serialization registers lazily on first use per JVM
  * (no driver-side or plan-construction side effects). */
object AvroRegistryFormat {

  val Magic: Byte = 0x0

  /** Serialize every column of `df` into a wire-framed avro `value`
    * column; the schema is registered under `subject` on first use. */
  def toAvro(df: DataFrame, schemaJson: String, registryUrl: String,
      subject: String): DataFrame = {
    val outSchema =
      StructType(Seq(StructField("value", BinaryType, nullable = false)))
    val inSchema = df.schema
    df.mapPartitions { rows =>
      val client = new SchemaRegistryClient(registryUrl)
      val id = client.register(subject, schemaJson) // JVM-cached
      val schema = new Schema.Parser().parse(schemaJson)
      val fieldNames = schema.getFields.asScala.map(_.name).toArray
      val idx = fieldNames.map(inSchema.fieldIndex)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val bos = new ByteArrayOutputStream()
      var encReuse: BinaryEncoder = null
      rows.map { r =>
        bos.reset()
        bos.write(Magic)
        bos.write((id >>> 24) & 0xff); bos.write((id >>> 16) & 0xff)
        bos.write((id >>> 8) & 0xff); bos.write(id & 0xff)
        encReuse = EncoderFactory.get().binaryEncoder(bos, encReuse)
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fieldNames.length) {
          rec.put(fieldNames(i), AvroFormat.toAvroValue(r.get(idx(i))))
          i += 1
        }
        writer.write(rec, encReuse)
        encReuse.flush()
        Row(bos.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /** Decode a wire-framed avro column under `readerSchemaJson`: each
    * record's WRITER schema is resolved from the registry by the id in
    * its frame, then avro schema resolution maps writer -> reader
    * (defaults for added fields, skipped removed fields). Output
    * columns come from the READER schema. */
  def fromAvro(df: DataFrame, binaryCol: String, readerSchemaJson: String,
      registryUrl: String): DataFrame = {
    val outSchema = AvroFormat.sparkType(readerSchemaJson)
    val colIdx = df.schema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      val client = new SchemaRegistryClient(registryUrl)
      val reader = new Schema.Parser().parse(readerSchemaJson)
      val fields = reader.getFields.asScala.map(_.name).toArray
      // one datum reader per distinct writer id seen by this partition
      val readers =
        scala.collection.mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
      var decReuse: BinaryDecoder = null
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](colIdx)
        if (bytes.length < 5 || bytes(0) != Magic)
          throw new IllegalArgumentException(
            s"not a confluent-framed avro payload (magic ${
              if (bytes.isEmpty) "<empty>" else bytes(0).toString}, " +
              s"len ${bytes.length})")
        val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
          ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
        val datumReader = readers.getOrElseUpdate(id, {
          val writer = new Schema.Parser().parse(client.schemaById(id))
          new GenericDatumReader[GenericRecord](writer, reader)
        })
        decReuse = DecoderFactory.get()
          .binaryDecoder(bytes, 5, bytes.length - 5, decReuse)
        val rec = datumReader.read(null, decReuse)
        Row.fromSeq(fields.toSeq.map(f =>
          AvroFormat.fromAvroValue(rec.get(f))))
      }
    }(Encoders.row(outSchema))
  }
}
