package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import scala.collection.mutable.ArrayBuffer

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[VideoFrameExpr]] over hand-built MJPEG AVI containers whose frames
  * are JDK-encoded JPEGs: the container walk is exercised here, the
  * per-frame pixel correctness rides the already-JDK-proven
  * [[JpegDecode]] pipeline (each extracted frame must decode identically
  * to decodeImage over the same raw JPEG bytes). */
class VideoFrameSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("java.awt.headless", "true")

  private def frame(bytes: Array[Byte], n: Int)
      : (String, Int, Int, Int, Seq[Int]) = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.videoFrame(col("p"), lit(n)).as("f"))
      .select("f.format", "f.width", "f.height", "f.frames", "f.pixels")
      .head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
      if (r.isNullAt(4)) null else r.getSeq[Int](4))
  }

  private def jpegOf(seed: Int, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, 0xff000000 |
        (((x * 3 + y * 2 + seed) % 256) << 16) |
        (((255 - x * 2 + y + seed) % 256) << 8) |
        ((x + y * 4 + seed * 7) % 256))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val b = ArrayBuffer[Byte]()
    b ++= id.getBytes("ISO-8859-1")
    val len = payload.length
    b += (len & 0xff).toByte; b += ((len >> 8) & 0xff).toByte
    b += ((len >> 16) & 0xff).toByte; b += ((len >> 24) & 0xff).toByte
    b ++= payload
    if ((len & 1) == 1) b += 0 // word alignment pad
    b.toArray
  }
  private def list(kind: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", kind.getBytes("ISO-8859-1") ++ payload)

  /** Minimal-but-realistic AVI: hdrl with an avih stub, then movi. */
  private def avi(moviPayload: Array[Byte]): Array[Byte] = {
    val avih = chunk("avih", new Array[Byte](56))
    val hdrl = list("hdrl", avih)
    val movi = list("movi", moviPayload)
    chunk("RIFF", "AVI ".getBytes ++ hdrl ++ movi)
  }

  test("MJPEG AVI: frame n decodes exactly like the raw JPEG; count right") {
    val jpegs = (0 until 3).map(s => jpegOf(s, 19, 13))
    val movi = jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _)
    val payload = avi(movi)
    for (n <- 0 until 3) {
      val (f, w, h, cnt, px) = frame(payload, n)
      assert((f, w, h, cnt) == ("mjpeg", 19, 13, 3))
      val direct = Seq(Tuple1(jpegs(n))).toDF("p")
        .select(Multimodal.decodeImage(col("p")).as("d"))
        .select("d.pixels").head().getSeq[Int](0)
      assert(px == direct, s"frame $n must equal the raw JPEG decode")
    }
  }

  test("interleaved audio chunks and idx1 are skipped; rec grouping descends") {
    val j0 = jpegOf(9, 8, 8); val j1 = jpegOf(11, 8, 8)
    // movi: audio, rec[frame0, audio], frame1, idx1 after movi
    val movi = chunk("01wb", Array.fill[Byte](33)(7)) ++
      list("rec ", chunk("00dc", j0) ++ chunk("01wb", Array.fill[Byte](5)(1))) ++
      chunk("00db", j1)
    val idx = chunk("idx1", new Array[Byte](16))
    val payload = chunk("RIFF", "AVI ".getBytes ++
      list("hdrl", chunk("avih", new Array[Byte](56))) ++
      list("movi", movi) ++ idx)
    val (f0, _, _, cnt, px0) = frame(payload, 0)
    assert((f0, cnt) == ("mjpeg", 2))
    val direct0 = Seq(Tuple1(j0)).toDF("p")
      .select(Multimodal.decodeImage(col("p")).as("d"))
      .select("d.pixels").head().getSeq[Int](0)
    assert(px0 == direct0)
    assert(frame(payload, 1)._1 == "mjpeg")
  }

  test("corpus-safety: out of range, truncated, non-JPEG frames, non-AVI") {
    val payload = avi(chunk("00dc", jpegOf(1, 8, 8)))
    assert(frame(payload, 1)._1 == "unknown") // only frame 0 exists
    assert(frame(payload, -1)._1 == "unknown")
    assert(frame(payload.dropRight(10), 0)._1 == "unknown") // truncated
    // a frame that is not a JPEG (inter-coded video would look like this)
    val h264ish = avi(chunk("00dc", Array[Byte](0, 0, 0, 1, 0x67, 42, 42)))
    assert(frame(h264ish, 0)._1 == "unknown")
    assert(frame("RIFFxxxxWAVE".getBytes, 0)._1 == "unknown") // not AVI
    assert(frame(Array.empty[Byte], 0)._1 == "unknown")
  }
}
