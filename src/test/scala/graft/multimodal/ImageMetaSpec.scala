package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden-byte tests for [[ImageMetaExpr]]: each container's header
  * layout, the JPEG marker walk, and the must-not-fail policy on
  * malformed input (a corrupt file yields ("unknown",-1,-1); it must
  * never kill a corpus-wide scan). */
class ImageMetaSpec extends SparkSpec {
  import spark.implicits._

  private def meta(bytes: Array[Byte]): (String, Int, Int) = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.imageMeta(col("p")).as("m"))
      .select("m.format", "m.width", "m.height").head()
    (r.getString(0), r.getInt(1), r.getInt(2))
  }

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("png: IHDR big-endian dimensions") {
    // 800x600
    assert(meta(hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00000320 00000258")) ===
      ("png", 800, 600))
  }

  test("png signature with a non-IHDR first chunk is unknown") {
    assert(meta(hexBytes(
      "89504E470D0A1A0A 0000000D 58585858 00000320 00000258"))._1 ===
      "unknown")
  }

  test("gif87a and gif89a: little-endian logical screen") {
    assert(meta(hexBytes("474946383761 4001 F000")) === ("gif", 320, 240))
    assert(meta(hexBytes("474946383961 0005 0003")) === ("gif", 1280, 768))
  }

  test("bmp: little-endian dims; top-down (negative height) normalized") {
    val filler = "00" * 16
    assert(meta(hexBytes(s"424D $filler 80020000 E0010000")) ===
      ("bmp", 640, 480))
    // height -480 stored two's complement little-endian
    assert(meta(hexBytes(s"424D $filler 80020000 20FEFFFF")) ===
      ("bmp", 640, 480))
  }

  test("jpeg: marker walk skips APPn/DQT segments to the first SOF") {
    // FFD8, APP0 (len 16), DQT (len 4), SOF0 precision 8, 1080x1920
    val jpeg = "FFD8" +
      "FFE0 0010 4A46494600 0101 00 0048 0048 00 00" + // APP0, 16 bytes
      "FFDB 0004 0000" +                                // DQT, 4 bytes
      "FFC0 000B 08 0438 0780 00"                       // SOF0 h=1080 w=1920
    assert(meta(hexBytes(jpeg)) === ("jpeg", 1920, 1080))
  }

  test("jpeg: progressive SOF2 and standalone RST/TEM markers are handled") {
    val jpeg = "FFD8" + "FFD0" + "FF01" + // RST0 + TEM: no length field
      "FFC2 000B 08 0100 0200 00"         // SOF2 h=256 w=512
    assert(meta(hexBytes(jpeg)) === ("jpeg", 512, 256))
    // EOI before any SOF ends the walk: no frame header exists
    assert(meta(hexBytes("FFD8 FFD9"))._1 === "unknown")
  }

  test("jpeg: full SOFn range parses; the walk stops at SOS") {
    // lossless SOF3 and arithmetic SOF9 share the frame-header layout
    assert(meta(hexBytes("FFD8 FFC3 000B 08 0040 0080 00")) ===
      ("jpeg", 128, 64))
    assert(meta(hexBytes("FFD8 FFC9 000B 08 0010 0020 00")) ===
      ("jpeg", 32, 16))
    // DHT (C4) is NOT a frame: it must be skipped as length-prefixed,
    // with the real SOF0 after it
    assert(meta(hexBytes(
      "FFD8 FFC4 0004 0000 FFC0 000B 08 0100 0200 00")) ===
      ("jpeg", 512, 256))
    // SOS before any SOF: entropy-coded data follows — a stray FF C0
    // byte pair inside it must NOT parse as bogus dimensions
    assert(meta(hexBytes(
      "FFD8 FFDA 0008 01 01 00 00 3F 00" + // SOS header
        "FFC0 000B 08 0438 0780 00"))._1 === "unknown")
  }

  test("tiff: IFD0 dims in both byte orders; JDK-written TIFF parses") {
    // hand-built: II with SHORT dims, MM with LONG dims
    val ii = hexBytes("49492A00" + "08000000" + "0200" +
      "00010300" + "01000000" + "4001" + "0000" + // width 320 (LE short)
      "01010400" + "01000000" + "B4000000" + // height 180 (LE long)
      "00000000")
    assert(meta(ii) == (("tiff", 320, 180)))
    val mm = hexBytes("4D4D002A" + "00000008" + "0002" +
      "01000003" + "00000001" + "0140" + "0000" +
      "01010003" + "00000001" + "00B4" + "0000" + "00000000")
    assert(meta(mm) == (("tiff", 320, 180)))
    // the JDK ships a real TIFF writer: cross-check the walk on its
    // output (dims only; content irrelevant)
    val img = new java.awt.image.BufferedImage(37, 23,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "tiff", bos))
    assert(meta(bos.toByteArray) == (("tiff", 37, 23)))
  }

  test("webp: VP8 lossy, VP8L lossless, and VP8X extended layouts") {
    // lossy: sync 9D012A then 14-bit LE dims (320x180)
    val vp8 = hexBytes("52494646" + "24000000" + "57454250" + "56503820" +
      "10000000" + "000000" + "9D012A" + "4001" + "B400")
    assert(meta(vp8) == (("webp", 320, 180)))
    // lossless: 0x2F, w-1=319, h-1=179 LSB-packed
    // b1=319&255=0x3F b2=(319>>8)|((179&3)<<6)=0x01|0xC0=0xC1
    // b3=(179>>2)=0x2C b4=0
    val vp8l = hexBytes("52494646" + "20000000" + "57454250" + "5650384C" +
      "0C000000" + "2F" + "3F" + "C1" + "2C" + "00" + "0000000000")
    assert(meta(vp8l) == (("webp", 320, 180)))
    // extended: 24-bit LE canvas minus one
    val vp8x = hexBytes("52494646" + "20000000" + "57454250" + "56503858" +
      "0A000000" + "00000000" + "3F0100" + "B30000")
    assert(meta(vp8x) == (("webp", 320, 180)))
    // bad VP8 sync / unknown first chunk degrade to unknown
    val badSync = vp8.clone(); badSync(23) = 0x00
    assert(meta(badSync)._1 == "unknown")
    assert(meta(hexBytes("52494646" + "20000000" + "57454250" +
      "414C5048" + "0A000000" + "00" * 10))._1 == "unknown")
  }

  test("pnm and tga dims (footer-signed TGA; netpbm header ints)") {
    val p6 = "P6 # c\n 37\t21\n255\n".getBytes ++ new Array[Byte](37 * 21 * 3)
    val r1 = meta(p6)
    assert(r1 == ("pnm", 37, 21))
    val hdr = Array[Byte](0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      5, 1, 7, 0, 24, 0x20) // w=261 h=7
    val footer = new Array[Byte](8) ++ "TRUEVISION-XFILE".getBytes ++
      Array[Byte]('.', 0)
    val tga = hdr ++ new Array[Byte](261 * 7 * 3) ++ footer
    assert(meta(tga) == ("tga", 261, 7))
    // footer-less TGA is NOT detected (no leading magic exists)
    assert(meta(hdr ++ new Array[Byte](261 * 7 * 3))._1 == "unknown")
    // decode parity: files image_decode rejects yield no dimensions
    def withHdr(edit: Array[Byte] => Unit): Array[Byte] = {
      val h2 = hdr.clone(); edit(h2)
      h2 ++ new Array[Byte](261 * 7 * 3) ++ footer
    }
    assert(meta(withHdr(_(2) = 0))._1 == "unknown") // imgType 0: no data
    assert(meta(withHdr(_(1) = 2))._1 == "unknown") // cmType 2: nonstd
    assert(meta(withHdr(_(16) = 9))._1 == "unknown") // depth 9 truecolor
    assert(meta(withHdr(_(17) = 0x30))._1 == "unknown") // right-to-left
    assert(meta(withHdr { h => h(1) = 1; h(7) = 13 })._1 == "unknown")
  }

  test("avif/heic: ftyp brands + meta/iprp/ipco ispe via the ipma chain") {
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8) ++ typ.getBytes("ISO-8859-1") ++ body
    def full(typ: String, ver: Int, flags: Int, body: Array[Byte]) =
      box(typ, Array[Byte](ver.toByte, (flags >> 16).toByte,
        (flags >> 8).toByte, flags.toByte) ++ body)
    def ispe(w: Int, h: Int) = full("ispe", 0, 0, be32(w) ++ be32(h))
    def ftyp(major: String, compat: String*) = box("ftyp",
      major.getBytes ++ be32(0) ++ compat.flatMap(_.getBytes))
    // primary item 1 -> property 2 (1280x720); item 2 (thumbnail)
    // -> property 1 (160x90); property 3 is an opaque codec config
    val ipco = box("ipco", ispe(160, 90) ++ ispe(1280, 720) ++
      box("av1C", Array[Byte](0x81.toByte, 0, 0, 0)))
    val ipmaV0 = full("ipma", 0, 0, be32(2) ++
      (be16(1) ++ Array[Byte](1, 2)) ++ (be16(2) ++ Array[Byte](1, 1)))
    val metaBox = full("meta", 0, 0,
      full("pitm", 0, 0, be16(1)) ++ box("iprp", ipco ++ ipmaV0))
    assert(meta(ftyp("avif") ++ metaBox) == ("avif", 1280, 720))
    // heic brands; specific codec brand in the compatible list wins
    assert(meta(ftyp("heic") ++ metaBox) == ("heic", 1280, 720))
    assert(meta(ftyp("mif1", "miaf", "avif") ++ metaBox)
      == ("avif", 1280, 720))
    // bare mif1 with no codec brand reports generic heif
    assert(meta(ftyp("mif1", "miaf") ++ metaBox) == ("heif", 1280, 720))
    // ipma version 1 (u32 item ids) + flags&1 (15-bit property index)
    val ipmaV1 = full("ipma", 1, 1, be32(1) ++
      be32(1) ++ Array[Byte](1) ++ be16(0x8002))
    val metaV1 = full("meta", 0, 0,
      full("pitm", 1, 0, be32(1)) ++ box("iprp", ipco ++ ipmaV1))
    assert(meta(ftyp("avif") ++ metaV1) == ("avif", 1280, 720))
    // association chain absent: MAX over ispe (thumbnails never win)
    val metaNoAssoc = full("meta", 0, 0, box("iprp", ipco))
    assert(meta(ftyp("avis") ++ metaNoAssoc) == ("avif", 1280, 720))
    // a VIDEO mp4 (no image brand) stays out of image_meta's domain
    assert(meta(ftyp("isom", "mp42") ++ metaBox)._1 == "unknown")
    // no ispe anywhere -> unknown; truncation sweep never throws
    val noIspe = ftyp("avif") ++ full("meta", 0, 0,
      box("iprp", box("ipco", box("av1C", be32(0)))))
    assert(meta(noIspe)._1 == "unknown")
    val whole = ftyp("heic") ++ metaBox
    for (cut <- 1 until whole.length)
      assert(meta(whole.take(cut))._1 == "unknown" ||
        meta(whole.take(cut))._2 > 0)
  }

  test("malformed and truncated payloads degrade to unknown, never throw") {
    assert(meta(Array[Byte]())._1 === "unknown")
    assert(meta("not an image".getBytes("UTF-8"))._1 === "unknown")
    assert(meta(hexBytes("89504E47"))._1 === "unknown") // truncated png
    assert(meta(hexBytes("FFD8 FFE0 FFFF"))._1 === "unknown") // bad length
    assert(meta(hexBytes("FFD8 00C0 000B"))._1 === "unknown") // lost sync
    assert(meta(hexBytes("FFD8 FFC0 0005 08 01"))._1 === "unknown") // cut SOF
  }

  test("jpeg xl: SizeHeader forms, ratio table, container route (round 14)") {
    // bare codestream, small form 16x16 (ratio 1:1)
    assert(meta(hexBytes("ff0a4300")) === ("jxl", 16, 16))
    // small form, explicit xsize: 64x32
    assert(meta(hexBytes("ff0a070e")) === ("jxl", 64, 32))
    // non-small 1000x1000 via ratio 1:1
    assert(meta(hexBytes("ff0a3a1f01")) === ("jxl", 1000, 1000))
    // 16:9 ratio: height 1080 -> width 1920
    assert(meta(hexBytes("ff0aba2105")) === ("jxl", 1920, 1080))
    // explicit non-small both dims: 123x77
    assert(meta(hexBytes("ff0a6002f400")) === ("jxl", 123, 77))
    // ISOBMFF container: ftyp "jxl " + jxlc box holding the codestream
    val boxed = hexBytes(
      "0000001466747970" + "6a786c2000000000" + "6a786c20" + // ftyp jxl
      "0000000c" + "6a786c63" + "ff0a4300")                  // jxlc
    assert(meta(boxed) === ("jxl", 16, 16))
    // truncated codestream: unknown, never throws
    assert(meta(hexBytes("ff0a"))._1 === "unknown")
    assert(meta(hexBytes("ff0aba"))._1 === "unknown")
  }
}
