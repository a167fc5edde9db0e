package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** subtitle_cues(payload): SRT and WebVTT parsing — the text half of
  * a video-caption training corpus (speech-aligned text is exactly
  * what multimodal pretraining pairs against frames; this yields it
  * with millisecond alignment). Returns array<struct<idx, start_ms,
  * end_ms, text>> or NULL when the payload is neither format.
  *
  *  - SRT: `N` / `HH:MM:SS,mmm --> HH:MM:SS,mmm` / text lines /
  *    blank-line separation; index carried as given (missing → cue
  *    ordinal); tolerant of '.' decimal commas and BOM;
  *  - WebVTT: the `WEBVTT` header line, optional cue identifiers
  *    (carried as idx when numeric, else ordinal), cue settings
  *    after the end timestamp dropped, `MM:SS.mmm` short timestamps,
  *    NOTE/STYLE/REGION blocks skipped, inline markup (`<i>`, `<b>`,
  *    `<c.class>`, `<v Speaker>`, timestamps `<00:01.000>`) stripped;
  *  - multi-line cue text joined with '\n'; 50k cue cap (a feature
  *    film is ~2k).
  *
  * Scale shape: per-row map-side parse, single scan, zero shuffle. */
case class SubtitleCuesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("start_ms", LongType, nullable = false),
    StructField("end_ms", LongType, nullable = false),
    StructField("text", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "subtitle_cues"

  private val MaxCues = 50000

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try parse(b) catch { case _: Exception => null }
  }

  private def parse(b: Array[Byte]): Any = {
    var s = new String(b, "UTF-8")
    if (s.nonEmpty && s.charAt(0) == '﻿') s = s.substring(1)
    val isVtt = s.startsWith("WEBVTT")
    val lines = s.split("\r\n|\n|\r", -1)
    var i = if (isVtt) 1 else 0
    val cues = Vector.newBuilder[InternalRow]
    var ordinal = 0
    var sawTimestamp = false
    while (i < lines.length && ordinal < MaxCues) {
      var line = lines(i).trim
      if (line.isEmpty) i += 1
      else if (isVtt && (line.startsWith("NOTE") || line.startsWith("STYLE") ||
          line.startsWith("REGION"))) {
        // block runs to the next blank line
        while (i < lines.length && lines(i).trim.nonEmpty) i += 1
      } else {
        // optional identifier line before the timestamp
        var idx = -1
        if (!line.contains("-->")) {
          if (line.forall(_.isDigit) && line.nonEmpty)
            idx = try line.toInt catch { case _: Exception => -1 }
          i += 1
          line = if (i < lines.length) lines(i).trim else ""
        }
        val arrow = line.indexOf("-->")
        if (arrow < 0) { i += 1 }
        else {
          val start = timestamp(line.substring(0, arrow).trim)
          val endPart = line.substring(arrow + 3).trim
          val endTok = endPart.split("[ \t]", 2)(0) // cue settings dropped
          val end = timestamp(endTok)
          i += 1
          val text = new java.lang.StringBuilder(64)
          while (i < lines.length && lines(i).trim.nonEmpty) {
            if (text.length > 0) text.append('\n')
            text.append(stripMarkup(lines(i).trim, isVtt))
            i += 1
          }
          if (start >= 0 && end >= 0) {
            ordinal += 1
            sawTimestamp = true
            cues += InternalRow(if (idx > 0) idx else ordinal, start, end,
              UTF8String.fromString(text.toString))
          }
        }
      }
    }
    val result = cues.result()
    if (!sawTimestamp && !isVtt) null // neither format
    else new GenericArrayData(result.toArray[Any])
  }

  /** "HH:MM:SS,mmm", "HH:MM:SS.mmm", or VTT's "MM:SS.mmm" → ms. */
  private def timestamp(t: String): Long = {
    val m = "^(?:(\\d{1,4}):)?(\\d{1,2}):(\\d{1,2})[.,](\\d{3})$".r
      .findFirstMatchIn(t).orNull
    if (m == null) return -1
    val h = Option(m.group(1)).map(_.toLong).getOrElse(0L)
    h * 3600000L + m.group(2).toLong * 60000L + m.group(3).toLong * 1000L +
      m.group(4).toLong
  }

  /** VTT inline markup: <i>/<b>/<u>/<c.class>/<v Name>/<00:00.000>;
    * SRT commonly carries the HTML-ish subset too. */
  private def stripMarkup(s: String, isVtt: Boolean): String = {
    val _ = isVtt
    if (s.indexOf('<') < 0 && s.indexOf('{') < 0) return s
    val noTags = s.replaceAll("<[^>]*>", "")
    noTags.replaceAll("\\{\\\\an\\d\\}", "") // SRT positioning overrides
  }

  override protected def withNewChildInternal(newChild: Expression): SubtitleCuesExpr =
    copy(child = newChild)
}
