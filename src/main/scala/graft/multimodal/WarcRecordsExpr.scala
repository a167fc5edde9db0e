package graft.multimodal

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** warc_records(payload): parse an ISO 28500 WARC file (the Common
  * Crawl container — WET text extracts and WARC fetches alike) into
  * an array of records, each struct<warc_type, record_id, target_uri,
  * date, content_type, content: binary>. The natural downstream of
  * [[DecompressExpr]]: Common Crawl ships per-record gzip members, so
  * `explode(warc_records(decompress(payload).data))` is the whole
  * ingestion front of a web-corpus pipeline.
  *
  * Parse rules (the public WARC 1.0/1.1 spec): records start
  * "WARC/<version>" CRLF; header lines are name:value with RFC-style
  * continuation folding (leading SP/HT); Content-Length is
  * authoritative for the block; the block is followed by two CRLFs.
  * Header names are case-insensitive; bare-LF line endings are
  * tolerated (corpus files carry both).
  *
  * Corpus tolerance: COMPLETE records parse even when the file's tail
  * is truncated mid-record — the complete prefix is returned (the
  * standard recovery for interrupted fetches); a payload that does not
  * begin with a WARC version line at all yields NULL (unknown).
  * Bomb guard: the record count is capped (the array is bounded by
  * the input size already — content slices reference-copy from the
  * payload — but a hostile zero-length-record loop must not spin);
  * a payload with MORE records than the cap yields NULL (unknown)
  * rather than a silently truncated set downstream counts would
  * mistake for the complete file.
  *
  * Scale shape: per-row map-side parse, single scan, zero shuffle
  * (PlanSpec-pinned via q_warc_records). Reference analogue: the
  * source-format decode stage of table-API preprocessing. */
case class WarcRecordsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content", BinaryType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "warc_records"

  private val MaxRecords = 100000

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try parse(b) catch { case _: Exception => null }
  }

  private def line(b: Array[Byte], i: Int): (String, Int) =
    TextFraming.line(b, i)

  private def parse(b: Array[Byte]): GenericArrayData = {
    val out = ArrayBuffer.empty[InternalRow]
    var i = 0
    var done = false
    while (!done && out.size < MaxRecords) {
      // skip inter-record blank lines
      var l = line(b, i)
      while (l != null && l._1.isEmpty) { i = l._2; l = line(b, i) }
      if (l == null) done = true
      else if (!l._1.startsWith("WARC/")) {
        // not a record boundary: garbage start -> unknown; garbage
        // after complete records -> tolerated tail
        if (out.isEmpty) return null
        done = true
      } else {
        i = l._2
        var warcType: String = null; var recordId: String = null
        var uri: String = null; var date: String = null
        var ctype: String = null
        var contentLength = -1L
        var headersOk = true
        var blank = false
        while (!blank && headersOk) {
          val hl = line(b, i)
          if (hl == null) headersOk = false // truncated mid-headers
          else if (hl._1.isEmpty) { blank = true; i = hl._2 }
          else {
            var (text, next) = hl
            // RFC continuation folding: following SP/HT lines join
            var look = line(b, next)
            while (look != null && look._1.nonEmpty &&
                (look._1.charAt(0) == ' ' || look._1.charAt(0) == '\t')) {
              text += " " + look._1.trim
              next = look._2
              look = line(b, next)
            }
            i = next
            val colon = text.indexOf(':')
            if (colon > 0) {
              val name = text.substring(0, colon).trim.toLowerCase
              val value = text.substring(colon + 1).trim
              name match {
                case "warc-type" => warcType = value
                case "warc-record-id" => recordId = value
                case "warc-target-uri" => uri = value
                case "warc-date" => date = value
                case "content-type" => ctype = value
                case "content-length" =>
                  contentLength = try value.toLong catch {
                    case _: NumberFormatException => -1L
                  }
                case _ => ()
              }
            }
          }
        }
        if (!headersOk || contentLength < 0 ||
            i + contentLength > b.length) {
          // truncated / unsized record: keep the complete prefix
          if (out.isEmpty) return null
          done = true
        } else {
          val content = java.util.Arrays.copyOfRange(
            b, i, i + contentLength.toInt)
          out += InternalRow(
            if (warcType == null) null else UTF8String.fromString(warcType),
            if (recordId == null) null else UTF8String.fromString(recordId),
            if (uri == null) null else UTF8String.fromString(uri),
            if (date == null) null else UTF8String.fromString(date),
            if (ctype == null) null else UTF8String.fromString(ctype),
            content)
          i += contentLength.toInt
        }
      }
    }
    if (!done && out.size >= MaxRecords) {
      // the record-count cap stopped the walk: only return the array
      // if nothing but blank lines remains — a silently truncated
      // record set must read as unknown, not as the complete file
      var l = line(b, i)
      while (l != null && l._1.isEmpty) { i = l._2; l = line(b, i) }
      if (l != null) return null // more records follow: cap hit
    }
    // zero complete records (empty payload, blank-only, or a file
    // that never yielded one) is not a WARC file: unknown
    if (out.isEmpty) null else new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
