package graft.multimodal

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[GifFramesExpr]] against hand-built multi-frame GIF89a streams —
  * the LZW encoder here is literal-codes-only (every index emitted as
  * its own code, mirroring the decoder's dictionary growth for the
  * width schedule), so the bytes are valid GIF LZW without sharing any
  * compressor logic with the decoder; the single-frame LZW path is
  * separately proven against the JDK codec in ImageDecodeSpec. */
class GifFramesSpec extends SparkSpec {
  import spark.implicits._

  private def frame(bytes: Array[Byte], n: Int)
      : (String, Int, Int, Int, Seq[Int]) = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.gifFrame(col("p"), lit(n)).as("f"))
      .select("f.format", "f.width", "f.height", "f.frames", "f.pixels")
      .head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
      if (r.isNullAt(4)) null else r.getSeq[Int](4))
  }

  /** Literal-code LZW: valid GIF LZW that never uses dictionary codes
    * but must still track the decoder's width schedule exactly. */
  private def lzwEncode(indices: Seq[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val outB = ArrayBuffer[Byte]()
    var cur = 0; var nb = 0
    var width = minCode + 1
    var dictSize = end + 1
    def emit(code: Int): Unit = {
      var k = 0
      while (k < width) {
        if (((code >> k) & 1) != 0) cur |= 1 << nb
        nb += 1
        if (nb == 8) { outB += cur.toByte; cur = 0; nb = 0 }
        k += 1
      }
    }
    emit(clear)
    indices.zipWithIndex.foreach { case (idx, j) =>
      emit(idx)
      if (j > 0 && dictSize < 4096) { // decoder adds an entry per code
        dictSize += 1
        if (dictSize < 4096 && (dictSize & (dictSize - 1)) == 0 &&
            dictSize > clear) width += 1
      }
    }
    emit(end)
    if (nb > 0) outB += cur.toByte
    outB.toArray
  }

  /** (left, top, fw, fh, indices, disposal, transparent or -1) */
  private type Frame = (Int, Int, Int, Int, Seq[Int], Int, Int)

  private def gif(w: Int, h: Int, gct: Seq[Int], fs: Seq[Frame])
      : Array[Byte] = {
    require((gct.size & (gct.size - 1)) == 0 && gct.size >= 4)
    val minCode = math.max(2,
      32 - Integer.numberOfLeadingZeros(gct.size - 1)) // log2
    val sizeBits = 31 - Integer.numberOfLeadingZeros(gct.size) - 1
    val b = ArrayBuffer[Byte]()
    def le16(v: Int): Unit = { b += (v & 0xff).toByte; b += ((v >> 8) & 0xff).toByte }
    b ++= "GIF89a".getBytes
    le16(w); le16(h)
    b += (0x80 | sizeBits).toByte; b += 0; b += 0
    gct.foreach { c =>
      b += ((c >> 16) & 0xff).toByte
      b += ((c >> 8) & 0xff).toByte
      b += (c & 0xff).toByte
    }
    fs.foreach { case (left, top, fw, fh, idx, disposal, trans) =>
      // GCE
      b += 0x21.toByte; b += 0xf9.toByte; b += 4
      b += ((disposal << 2) | (if (trans >= 0) 1 else 0)).toByte
      le16(0)
      b += (if (trans >= 0) trans else 0).toByte
      b += 0
      // descriptor
      b += 0x2c.toByte; le16(left); le16(top); le16(fw); le16(fh); b += 0
      b += minCode.toByte
      val data = lzwEncode(idx, minCode)
      data.grouped(255).foreach { chunk =>
        b += chunk.length.toByte; b ++= chunk
      }
      b += 0
    }
    b += 0x3b.toByte
    b.toArray
  }

  private val C = Seq(0xff112233, 0xff445566, 0xff778899, 0xffaabbcc)

  test("disposal keep: later frames composite onto the running canvas") {
    // frame0: full 2x2 [0,1,2,3] keep; frame1: 1x1 at (1,1) drawing 0
    val g = gif(2, 2, C, Seq(
      (0, 0, 2, 2, Seq(0, 1, 2, 3), 1, -1),
      (1, 1, 1, 1, Seq(0), 0, -1)))
    val (f0, w0, h0, n0, p0) = frame(g, 0)
    assert((f0, w0, h0, n0) == ("gif", 2, 2, 2))
    assert(p0 == Seq(C(0), C(1), C(2), C(3)))
    val (_, _, _, _, p1) = frame(g, 1)
    assert(p1 == Seq(C(0), C(1), C(2), C(0)), "frame1 composites onto frame0")
  }

  test("disposal 2 clears the frame rect to transparent for the next frame") {
    // frame0 fills 2x2 with disposal 2 over its own rect -> frame1's
    // canvas starts fully transparent; frame1 draws only (0,0)
    val g = gif(2, 2, C, Seq(
      (0, 0, 2, 2, Seq(0, 1, 2, 3), 2, -1),
      (0, 0, 1, 1, Seq(3), 0, -1)))
    val (_, _, _, n, p1) = frame(g, 1)
    assert(n == 2)
    assert(p1 == Seq(C(3), 0, 0, 0),
      s"disposal-2 must clear before frame1: $p1")
  }

  test("disposal 3 restores the pre-frame canvas") {
    // frame0 full [0,0,0,0] keep; frame1 draws 1x1 of color 3 at (0,0)
    // with disposal 3; frame2 draws 1x1 color 2 at (1,1): frame2's
    // canvas must show frame0's pixel at (0,0), NOT frame1's
    val g = gif(2, 2, C, Seq(
      (0, 0, 2, 2, Seq(0, 0, 0, 0), 1, -1),
      (0, 0, 1, 1, Seq(3), 3, -1),
      (1, 1, 1, 1, Seq(2), 0, -1)))
    val (_, _, _, n, p2) = frame(g, 2)
    assert(n == 3)
    assert(p2 == Seq(C(0), C(0), C(0), C(2)),
      s"disposal-3 must restore frame0's canvas: $p2")
  }

  test("transparency holes reveal the running canvas across frames") {
    // frame0 full [1,1,1,1]; frame1 full [0,2,0,2] with transparent=0:
    // the 0-indices are holes showing frame0's color
    val g = gif(2, 2, C, Seq(
      (0, 0, 2, 2, Seq(1, 1, 1, 1), 1, -1),
      (0, 0, 2, 2, Seq(0, 2, 0, 2), 0, 0)))
    val (_, _, _, _, p1) = frame(g, 1)
    assert(p1 == Seq(C(1), C(2), C(1), C(2)))
  }

  test("frame count, out-of-range index, and corpus safety") {
    val g = gif(2, 2, C, Seq(
      (0, 0, 2, 2, Seq(0, 1, 2, 3), 1, -1),
      (0, 0, 1, 1, Seq(2), 0, -1),
      (1, 0, 1, 1, Seq(3), 0, -1)))
    assert(frame(g, 0)._4 == 3)
    assert(frame(g, 3)._1 == "unknown") // only frames 0..2 exist
    assert(frame(g, -1)._1 == "unknown")
    assert(frame(g.dropRight(4), 2)._1 == "unknown") // truncated mid-frame
    assert(frame("notagif".getBytes, 0)._1 == "unknown")
    // a 256-color table exercises minCode 8 and the width schedule
    val big = gif(2, 2, (0 until 256).map(i => 0xff000000 | (i * 65793)),
      Seq((0, 0, 2, 2, Seq(10, 20, 200, 255), 1, -1)))
    assert(frame(big, 0)._5 ==
      Seq(10, 20, 200, 255).map(i => 0xff000000 | (i * 65793)))
    // agreement with the single-frame decoder on frame 0
    val viaDecode = Seq(Tuple1(g)).toDF("p")
      .select(Multimodal.decodeImage(col("p")).as("d"))
      .select("d.pixels").head().getSeq[Int](0)
    assert(frame(g, 0)._5 == viaDecode)
  }
}
