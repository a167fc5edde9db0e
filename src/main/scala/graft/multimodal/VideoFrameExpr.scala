package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** video_frame(payload, n): the n-th (0-based) video frame of an
  * MJPEG AVI, decoded to real pixels, plus the total frame count — the
  * REAL video frame-sampling path. Motion-JPEG stores every frame as a
  * standalone JPEG, so the pinned-integer [[JpegDecode]] pipeline
  * applies per frame and the exact-decode contract extends to a true
  * video container; only INTER-coded video (H.264/HEVC motion
  * compensation) remains behind the FakeCodec boundary.
  *
  * Container walk (public AVI RIFF layout): 'RIFF'+'AVI ', nested LIST
  * chunks to 'movi', video frames in '..dc'/'..db' chunks (stream 00,
  * word-aligned). The stream header's codec is verified per frame by
  * the JPEG SOI magic rather than trusting the fourcc — corpus files
  * lie. Frame n is decoded with the full baseline/progressive pipeline;
  * non-JPEG payloads in the chosen chunk, out-of-range n, or malformed
  * containers yield the unknown row (never-throw corpus policy). The
  * [[ImageDecodeExpr.MaxPixels]] bomb guard applies to the decoded
  * frame.
  *
  * Output: struct<format, width, height, frames, pixels> with format
  * "mjpeg". Scale shape: single-scan map-side projection — a stride
  * frame-sample stage is `video_frame(payload, k * stride)` per row,
  * zero shuffle.
  *
  * Reference analogue: the frame-sample stage of table-API multimodal
  * preprocessing. */
case class VideoFrameExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  import ImageDecodeExpr.MaxPixels

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = true)))
  override def prettyName: String = "video_frame"

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "ISO-8859-1")

  private val unknown =
    InternalRow(UTF8String.fromString("unknown"), -1, -1, -1, null)

  override protected def nullSafeEval(payload: Any, idx: Any): Any = {
    val b = payload.asInstanceOf[Array[Byte]]
    val n = idx.asInstanceOf[Int]
    try walk(b, n) catch { case _: Exception => unknown }
  }

  private def walk(b: Array[Byte], want: Int): InternalRow = {
    if (want < 0 || b.length < 24 || fourcc(b, 0) != "RIFF" ||
        fourcc(b, 8) != "AVI ") return unknown
    val riffEnd = math.min(b.length.toLong, 8L + le32(b, 4)).toInt
    // locate the movi LIST (top-level chunk scan)
    var i = 12
    var movi = -1; var moviEnd = -1
    while (movi < 0 && i + 8 <= riffEnd) {
      val id = fourcc(b, i)
      val len = le32(b, i + 4)
      if (len < 0 || i + 8 + len > riffEnd) return unknown
      if (id == "LIST" && len >= 4 && fourcc(b, i + 8) == "movi") {
        movi = i + 12; moviEnd = i + 8 + len
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (movi < 0) return unknown
    // iterate stream video chunks ('..dc' compressed / '..db' raw),
    // descending into 'rec ' grouping LISTs via an explicit worklist —
    // chunk order within movi IS frame order, and a rec LIST's chunks
    // sit between its neighbors', so ranges are processed depth-first
    var frames = 0
    var result: JpegDecode.Decoded = null
    var ranges = List((movi, moviEnd))
    while (ranges.nonEmpty) {
      var (j, e) = ranges.head
      ranges = ranges.tail
      var descended = false
      while (!descended && j + 8 <= e) {
        val id = fourcc(b, j)
        val len = le32(b, j + 4)
        if (len < 0 || j + 8 + len > e) return unknown
        val next = j + 8 + len + (len & 1)
        if (id == "LIST" && len >= 4 && fourcc(b, j + 8) == "rec ") {
          // continue after the LIST once its payload is drained
          ranges = (j + 12, j + 8 + len) :: (next, e) :: ranges
          descended = true
        } else {
          if (id.endsWith("dc") || id.endsWith("db")) {
            if (frames == want) {
              // the frame must be a standalone JPEG (MJPEG contract)
              if (len < 4 || (b(j + 8) & 0xff) != 0xff ||
                  (b(j + 9) & 0xff) != 0xd8) return unknown
              val frame = java.util.Arrays.copyOfRange(b, j + 8, j + 8 + len)
              result = JpegDecode.decode(frame, MaxPixels)
              if (result == null) return unknown
            }
            frames += 1
          } // audio '..wb' / 'idx1' / others skipped
          j = next
        }
      }
    }
    if (result == null) unknown
    else InternalRow(UTF8String.fromString("mjpeg"), result.width,
      result.height, frames, new GenericArrayData(result.pixels))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
