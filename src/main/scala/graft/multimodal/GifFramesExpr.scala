package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** gif_frame(payload, n): the n-th (0-based) frame of an animated GIF,
  * composed per the GIF89a disposal model, plus the total frame count —
  * the REAL frame-sampling path for the one video-like container whose
  * frames are losslessly decodable (H.264/HEVC frames stay behind the
  * FakeCodec boundary; animated GIFs in a web corpus do not need it).
  * A frame-sampling curation stage (`n` = stride positions) runs
  * entirely map-side off this expression.
  *
  * Composition (public GIF89a spec §23 + the de-facto browser model):
  *  - the canvas starts fully transparent;
  *  - each frame draws its non-transparent indices at (left, top);
  *  - disposal 0/1 keep the canvas; disposal 2 clears the FRAME RECT
  *    to transparent (the modern-decoder pin — "background color" in
  *    the 89a text, but every browser restores transparency); disposal
  *    3 restores the canvas as it was before the frame drew.
  *
  * Output: struct<format, width, height, frames, pixels> — pixels is
  * the composed canvas AFTER frame n draws; `frames` is the total
  * count. n out of range / malformed / non-GIF payloads yield the
  * unknown row (never-throw corpus policy); the
  * [[ImageDecodeExpr.MaxPixels]] bomb guard applies to the canvas.
  *
  * Reference analogue: the frame-sample stage of table-API multimodal
  * preprocessing. */
case class GifFramesExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  import ImageDecodeExpr.MaxPixels

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false),
      nullable = true)))
  override def prettyName: String = "gif_frame"

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val unknown =
    InternalRow(UTF8String.fromString("unknown"), -1, -1, -1, null)

  override protected def nullSafeEval(payload: Any, idx: Any): Any = {
    val b = payload.asInstanceOf[Array[Byte]]
    val n = idx.asInstanceOf[Int]
    try walk(b, n) catch { case _: Exception => unknown }
  }

  private def walk(b: Array[Byte], want: Int): InternalRow = {
    if (want < 0 || b.length < 13 || b(0) != 'G' || b(1) != 'I' ||
        b(2) != 'F' || b(3) != '8' || (b(4) != '7' && b(4) != '9') ||
        b(5) != 'a') return unknown
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return unknown
    val packed = b(10) & 0xff
    var i = 13
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      gct = GifCodec.readColorTable(b, i, n); i += n * 3
    }
    val canvas = new Array[Int](w * h) // starts transparent (0)
    var result: Array[Int] = null
    var frames = 0
    var transparent = -1
    var disposal = 0
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x21 => // extension
          val label = b(i + 1) & 0xff
          if (label == 0xf9 && i + 6 < b.length) {
            val gcePacked = b(i + 3) & 0xff
            disposal = (gcePacked >> 2) & 7
            transparent =
              if ((gcePacked & 1) != 0) b(i + 6) & 0xff else -1
          }
          i += 2
          while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
          i += 1
        case 0x2c => // image descriptor: one frame
          val left0 = le16(b, i + 1); val top = le16(b, i + 3)
          val fw = le16(b, i + 5); val fh = le16(b, i + 7)
          val ipacked = b(i + 9) & 0xff
          i += 10
          var ct = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            ct = GifCodec.readColorTable(b, i, n); i += n * 3
          }
          if (ct == null || fw <= 0 || fh <= 0 ||
              left0 + fw > w || top + fh > h) return unknown
          val interlaced = (ipacked & 0x40) != 0
          val minCode = b(i) & 0xff; i += 1
          val data = new java.io.ByteArrayOutputStream()
          while (i < b.length && (b(i) & 0xff) != 0) {
            val n = b(i) & 0xff
            if (i + 1 + n > b.length) return unknown
            data.write(b, i + 1, n); i += 1 + n
          }
          i += 1 // sub-block terminator
          val indices = GifCodec.lzw(data.toByteArray, minCode, fw * fh)
          if (indices == null) return unknown
          // snapshot for disposal 3 (restore-to-previous)
          val before =
            if (disposal == 3) java.util.Arrays.copyOf(canvas, canvas.length)
            else null
          val rowOrder: Array[Int] =
            if (!interlaced) Array.tabulate(fh)(identity)
            else ((0 until fh by 8) ++ (4 until fh by 8) ++
              (2 until fh by 4) ++ (1 until fh by 2)).toArray
          var r = 0
          while (r < fh) {
            val y = rowOrder(r)
            var x = 0
            while (x < fw) {
              val idx = indices(r * fw + x) & 0xff
              if (idx != transparent) {
                if (idx >= ct.length) return unknown
                canvas((top + y) * w + (left0 + x)) = ct(idx)
              }
              x += 1
            }
            r += 1
          }
          if (frames == want)
            result = java.util.Arrays.copyOf(canvas, canvas.length)
          frames += 1
          // post-frame disposal prepares the canvas for the NEXT frame
          disposal match {
            case 2 =>
              var y = 0
              while (y < fh) {
                java.util.Arrays.fill(canvas, (top + y) * w + left0,
                  (top + y) * w + left0 + fw, 0)
                y += 1
              }
            case 3 => System.arraycopy(before, 0, canvas, 0, canvas.length)
            case _ => ()
          }
          disposal = 0
          transparent = -1
        case 0x3b => // trailer
          return if (result == null) unknown
            else InternalRow(UTF8String.fromString("gif"), w, h, frames,
              new GenericArrayData(result))
        case _ => return unknown
      }
    }
    // missing trailer: tolerate (truncated tail) if the frame was found
    if (result == null) unknown
    else InternalRow(UTF8String.fromString("gif"), w, h, frames,
      new GenericArrayData(result))
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}
