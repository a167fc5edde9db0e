package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[JpegDecode]] against the INDEPENDENT IJG-derived codec in the JDK
  * (javax.imageio's JPEG plugin wraps the libjpeg6b algorithms): real
  * JPEGs are written by the JDK encoder and decoded by BOTH decoders —
  * the pinned integer pipeline must match the JDK pixel-for-pixel
  * (grayscale + 4:2:0 color, partial MCUs, several qualities). Plus
  * hand-built streams covering restart markers, 16-bit DQT, negative
  * coefficients, and the corpus-safety policy (progressive / truncated
  * / bomb payloads yield unknown, never a throw). */
class JpegDecodeSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("java.awt.headless", "true")

  private def decode(bytes: Array[Byte]): (String, Int, Int, Seq[Int]) = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.decodeImage(col("p")).as("d"))
      .select("d.format", "d.width", "d.height", "d.pixels").head()
    (r.getString(0), r.getInt(1), r.getInt(2),
      if (r.isNullAt(3)) null else r.getSeq[Int](3))
  }

  /** Smooth-ish deterministic raster (JPEG-friendly content: gradients
    * plus mild texture, so every AC path is exercised without the
    * pathological noise a quality-0.8 encode would crush anyway). */
  private def raster(w: Int, h: Int, gray: Boolean): BufferedImage = {
    val img = new BufferedImage(w, h,
      if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 3 + y * 2 + ((x * y) % 7)) % 256
      val g = (255 - x * 2 + y + ((x + y * 3) % 5)) % 256
      val b = (x + y * 4 + ((x * 2 + y) % 11)) % 256
      val rgb = if (gray) {
        val v = (r + g + b) / 3
        (v << 16) | (v << 8) | v
      } else (r << 16) | (g << 8) | b
      img.setRGB(x, y, 0xff000000 | rgb)
    }
    img
  }

  private def encode(img: BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  /** Max per-channel abs diff vs the JDK decode + where. Grayscale
    * compares RAW raster samples (getRGB on TYPE_BYTE_GRAY routes
    * through Java's linear-gray ColorSpace and applies a gamma
    * transform that has nothing to do with the JPEG decode). */
  private def vsJdk(payload: Array[Byte]): (Int, String) = {
    val jdk = ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val (fmt, w, h, px) = decode(payload)
    assert(fmt == "jpeg", s"expected jpeg decode, got $fmt")
    assert(w == jdk.getWidth && h == jdk.getHeight)
    val gray = jdk.getRaster.getNumBands == 1
    var worst = 0; var where = ""
    for (y <- 0 until h; x <- 0 until w) {
      val b = px(y * w + x)
      if (gray) {
        val a = jdk.getRaster.getSample(x, y, 0)
        val d = math.abs(a - (b & 0xff))
        if (d > worst) { worst = d; where = s"($x,$y) jdk=$a got=${b & 0xff}" }
      } else {
        val a = jdk.getRGB(x, y)
        for (sh <- Seq(16, 8, 0)) {
          val d = math.abs(((a >> sh) & 0xff) - ((b >> sh) & 0xff))
          if (d > worst) { worst = d; where = s"($x,$y) ch>>$sh jdk=${(a>>sh)&0xff} got=${(b>>sh)&0xff}" }
        }
      }
    }
    (worst, where)
  }

  test("grayscale JPEG matches the JDK decoder bit-exactly (odd dims)") {
    for ((w, h, q) <- Seq((17, 13, 0.85f), (32, 24, 0.5f), (9, 25, 0.95f))) {
      val (worst, where) = vsJdk(encode(raster(w, h, gray = true), q))
      assert(worst == 0, s"gray ${w}x$h q=$q: max diff $worst at $where")
    }
  }

  test("4:2:0 color JPEG matches the JDK decoder bit-exactly") {
    for ((w, h, q) <- Seq((16, 16, 0.75f), (19, 11, 0.9f), (40, 28, 0.6f))) {
      val (worst, where) = vsJdk(encode(raster(w, h, gray = false), q))
      assert(worst == 0, s"color ${w}x$h q=$q: max diff $worst at $where")
    }
  }

  test("property: 25 random rasters/sizes/qualities match the JDK bit-exactly") {
    // deterministic seed: sequential + progressive, gray + color,
    // random dims incl. 1-pixel edges and partial MCUs
    val rnd = new scala.util.Random(0x4A504547L)
    for (trial <- 0 until 25) {
      val w = 1 + rnd.nextInt(48)
      val h = 1 + rnd.nextInt(40)
      val gray = rnd.nextBoolean()
      val prog = rnd.nextBoolean()
      val q = 0.3f + rnd.nextFloat() * 0.65f
      val img = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY
        else BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, 0xff000000 | rnd.nextInt(0x1000000))
      val payload = encode(img, q, progressive = prog)
      val (worst, where) = vsJdk(payload)
      assert(worst == 0,
        s"trial $trial ${w}x$h gray=$gray prog=$prog q=$q: diff $worst at $where")
    }
  }

  test("progressive JPEG (SOF2) matches the JDK decoder bit-exactly") {
    // the JDK encoder's progressive mode emits real spectral-selection
    // + successive-approximation scan scripts (DC first/refine, AC
    // first/refine with EOB runs) — decoded by BOTH decoders
    for ((w, h, q, gray) <- Seq(
        (17, 13, 0.85f, true), (32, 24, 0.5f, true),
        (16, 16, 0.75f, false), (19, 11, 0.9f, false),
        (40, 28, 0.6f, false))) {
      val payload = encode(raster(w, h, gray), q, progressive = true)
      // confirm the payload really is SOF2
      val isProg = payload.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2)
      assert(isProg, "JDK writer did not produce a progressive stream")
      val (worst, where) = vsJdk(payload)
      assert(worst == 0,
        s"progressive gray=$gray ${w}x$h q=$q: max diff $worst at $where")
    }
  }

  test("progressive DC first + refinement scans with restart markers") {
    // 8x16 grayscale SOF2, DRI=1, two successive-approximation DC
    // scans (Al=1 then Ah=1/Al=0), RST0 between blocks in BOTH scans
    // (marker numbering restarts per scan), byte-aligned at restarts.
    // Block1: dc=20 at Al=1 -> 40, refine bit 1 -> DC=41.
    // Block2 (prediction reset by RST): dc=-17 -> -34, bit 0 -> DC=-34.
    val p = hx("FFD8" +
      "FFDB0043" + "00" + "11" * 64 +
      "FFC2000B08" + "0010" + "0008" + "01" + "011100" + // SOF2 8x16
      "FFC40015" + "00" + "0101" + "00" * 14 + "0005" +
      "FFDD0004" + "0001" + // DRI = 1
      "FFDA000801" + "0100" + "000001" + // scan 1: Ss=0 Se=0 Ah=0 Al=1
      f"${0x80 | (20 << 1)}%02X" + "FFD0" + f"${0x80 | ((-17 + 31) << 1)}%02X" +
      "FFDA000801" + "0100" + "000010" + // scan 2: Ah=1 Al=0 (raw bits)
      "80" + "FFD0" + "00" +
      "FFD9")
    val (fmt, w, h, px) = decode(p)
    assert((fmt, w, h) == ("jpeg", 8, 16))
    def flat(dc: Int) =
      math.min(255, math.max(0, 128 + Math.floorDiv(dc * 17 + 4, 8)))
    val top = flat(41); val bot = flat(-34)
    assert((0 until 64).forall(i => (px(i) & 0xff) == top),
      s"top want $top got ${px.head & 0xff}")
    assert((64 until 128).forall(i => (px(i) & 0xff) == bot),
      s"bot want $bot got ${px(64) & 0xff}")
  }

  test("progressive bomb guard is 4x tighter (coefficient buffering)") {
    val prog = encode(raster(16, 16, gray = true), 0.8f, progressive = true)
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc2).get
    // declare 5000x5000 = 25M px: legal for baseline (2^26), over the
    // progressive cap (2^24)
    val bomb = prog.clone()
    bomb(sofAt + 5) = 0x13.toByte; bomb(sofAt + 6) = 0x88.toByte
    bomb(sofAt + 7) = 0x13.toByte; bomb(sofAt + 8) = 0x88.toByte
    assert(decode(bomb)._1 == "unknown")
  }

  // ---- hand-built streams: the byte-level features the JDK encoder
  // won't emit on demand ----

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  /** The q_jpeg_decode synthesis shape (see SamplingPackQueries):
    * 8x8, DC-only blocks, two quant tables (17 luma / 23 chroma),
    * custom 2-entry DC table (cat0='0', cat5='10') and 1-entry AC
    * table (EOB='0') — each component's scan data is exactly one byte
    * 0x80|(field<<1) where field = dc (positive) or dc+31 (negative). */
  private def dcOnlyColor(dcY: Int, dcCb: Int, dcCr: Int): Array[Byte] = {
    def scanByte(dc: Int): String =
      f"${0x80 | ((if (dc >= 0) dc else dc + 31) << 1)}%02X"
    hx("FFD8" +
      "FFDB0043" + "00" + "11" * 64 + // DQT 0: all 17
      "FFDB0043" + "01" + "17" * 64 + // DQT 1: all 23
      "FFC0001108" + "0008" + "0008" + "03" + // SOF0 8x8 3 comps 4:4:4
      "011100" + "021101" + "031101" +
      "FFC40015" + "00" + "0101" + "00" * 14 + "0005" + // DC: cat0,cat5
      "FFC40014" + "10" + "01" + "00" * 15 + "00" + // AC: EOB only
      "FFDA000C03" + "0100" + "0200" + "0300" + "003F00" +
      scanByte(dcY) + scanByte(dcCb) + scanByte(dcCr) +
      "FFD9")
  }

  /** The IJG arithmetic the oracle replays (DC-only block):
    * sample = clamp(128 + floor((dc*q + 4) / 8)), then the fixed-point
    * YCbCr->RGB tables. */
  private def expectedRgb(dcY: Int, dcCb: Int, dcCr: Int): Int = {
    def flat(dc: Int, q: Int): Int = {
      val s = dc * q
      math.min(255, math.max(0, 128 + Math.floorDiv(s + 4, 8)))
    }
    val y = flat(dcY, 17); val cb = flat(dcCb, 23); val cr = flat(dcCr, 23)
    def cl(v: Int) = math.min(255, math.max(0, v))
    val r = cl(y + ((91881 * (cr - 128) + 32768) >> 16))
    val g = cl(y + ((-22554 * (cb - 128) + 32768 + -46802 * (cr - 128)) >> 16))
    val b = cl(y + ((116130 * (cb - 128) + 32768) >> 16))
    0xff000000 | (r << 16) | (g << 8) | b
  }

  test("DC-only 4:4:4 color stream decodes to the exact IJG arithmetic") {
    for ((dy, db, dr) <- Seq((16, 20, 25), (31, 16, -31), (24, 31, -16))) {
      val (fmt, w, h, px) = decode(dcOnlyColor(dy, db, dr))
      assert((fmt, w, h) == ("jpeg", 8, 8))
      val want = expectedRgb(dy, db, dr)
      assert(px.forall(_ == want),
        s"dc=($dy,$db,$dr): got ${px.head.toHexString}, want ${want.toHexString}")
    }
  }

  test("4:2:2 MCU layout: two Y blocks with DC prediction, h2v1 chroma") {
    // 16x8 4:2:2 (Y h=2 v=1): one MCU = Y(0) Y(1) Cb Cr. The second Y
    // block's DC is DIFFERENTIAL; flat chroma upsamples to itself under
    // the fancy filter, so expected pixels split left/right on Y only.
    val dcY1 = 18; val dY2 = 20; val dcCb = 22; val dcCr = -19
    def sb(v: Int): String =
      f"${0x80 | ((if (v >= 0) v else v + 31) << 1)}%02X"
    val p = hx("FFD8" +
      "FFDB0043" + "00" + "11" * 64 +
      "FFDB0043" + "01" + "17" * 64 +
      "FFC0001108" + "0008" + "0010" + "03" + // 16 wide, 8 high
      "012100" + "021101" + "031101" + // Y 2x1, Cb/Cr 1x1
      "FFC40015" + "00" + "0101" + "00" * 14 + "0005" +
      "FFC40014" + "10" + "01" + "00" * 15 + "00" +
      "FFDA000C03" + "0100" + "0200" + "0300" + "003F00" +
      sb(dcY1) + sb(dY2) + sb(dcCb) + sb(dcCr) +
      "FFD9")
    val (fmt, w, h, px) = decode(p)
    assert((fmt, w, h) == ("jpeg", 16, 8))
    def flat(dc: Int, q: Int) =
      math.min(255, math.max(0, 128 + Math.floorDiv(dc * q + 4, 8)))
    def cl(v: Int) = math.min(255, math.max(0, v))
    def rgb(y: Int): Int = {
      val cb = flat(dcCb, 23); val cr = flat(dcCr, 23)
      val r = cl(y + ((91881 * (cr - 128) + 32768) >> 16))
      val g = cl(y + ((-22554 * (cb - 128) + 32768 + -46802 * (cr - 128)) >> 16))
      val b = cl(y + ((116130 * (cb - 128) + 32768) >> 16))
      0xff000000 | (r << 16) | (g << 8) | b
    }
    val left = rgb(flat(dcY1, 17)); val right = rgb(flat(dcY1 + dY2, 17))
    for (y <- 0 until 8; x <- 0 until 16) {
      val want = if (x < 8) left else right
      assert(px(y * 16 + x) == want,
        s"($x,$y): got ${px(y * 16 + x).toHexString}, want ${want.toHexString}")
    }
  }

  test("restart markers: DRI resets DC prediction per interval") {
    // grayscale 8x16 (two MCUs), DRI=1: each MCU is its own interval,
    // so the second block's DC is NOT differential off the first.
    // Scan: block(dc=20) FFD0 block(dc=-17); flat values must be
    // clamp(128 + floor((dc*17+4)/8)) per block independently.
    val p = hx("FFD8" +
      "FFDB0043" + "00" + "11" * 64 +
      "FFC0000B08" + "0010" + "0008" + "01" + "011100" + // 8 wide, 16 high
      "FFC40015" + "00" + "0101" + "00" * 14 + "0005" +
      "FFC40014" + "10" + "01" + "00" * 15 + "00" +
      "FFDD0004" + "0001" + // DRI = 1
      "FFDA000801" + "0100" + "003F00" +
      f"${0x80 | (20 << 1)}%02X" + "FFD0" + f"${0x80 | ((-17 + 31) << 1)}%02X" +
      "FFD9")
    val (fmt, w, h, px) = decode(p)
    assert((fmt, w, h) == ("jpeg", 8, 16))
    def flat(dc: Int) =
      math.min(255, math.max(0, 128 + Math.floorDiv(dc * 17 + 4, 8)))
    val top = flat(20); val bot = flat(-17)
    assert((0 until 64).forall(i => (px(i) & 0xff) == top), s"top=$top ${px.head & 0xff}")
    assert((64 until 128).forall(i => (px(i) & 0xff) == bot), s"bot=$bot")
  }

  test("16-bit DQT entries are honored") {
    // same DC-only grayscale shape but Pq=1 with q0 = 300 (> 255):
    // sample = clamp(128 + floor((16*300+4)/8)) = clamp(128+600) = 255
    val q16 = (0 until 64).map(_ => "012C").mkString // 300 each
    val p = hx("FFD8" +
      "FFDB0083" + "10" + q16 + // len = 2+1+128 = 131 = 0x83
      "FFC0000B08" + "0008" + "0008" + "01" + "011100" +
      "FFC40015" + "00" + "0101" + "00" * 14 + "0005" +
      "FFC40014" + "10" + "01" + "00" * 15 + "00" +
      "FFDA000801" + "0100" + "003F00" +
      f"${0x80 | (16 << 1)}%02X" + "FFD9")
    val (fmt, _, _, px) = decode(p)
    assert(fmt == "jpeg")
    assert(px.forall(p => (p & 0xff) == 255))
  }

  test("corpus-safety: progressive, truncated, non-JPEG, bomb -> unknown") {
    val good = dcOnlyColor(16, 16, 16)
    // flip SOF0 -> SOF2: the full-band interleaved scan is malformed
    // AS progressive (DC scans must have Se=0) -> unknown, not a throw
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(decode(prog)._1 == "unknown")
    // truncated mid-scan
    assert(decode(good.dropRight(3))._1 == "unknown")
    // garbage after SOI
    assert(decode(hx("FFD8DEADBEEF"))._1 == "unknown")
    // bomb: declared 30000x30000 (> 2^26 pixels) must die BEFORE alloc
    val bomb = good.clone()
    // SOF0 height/width at sofAt+5..8
    bomb(sofAt + 5) = 0x75.toByte; bomb(sofAt + 6) = 0x30.toByte
    bomb(sofAt + 7) = 0x75.toByte; bomb(sofAt + 8) = 0x30.toByte
    assert(decode(bomb)._1 == "unknown")
  }

  private def orient(bytes: Array[Byte]): Int =
    Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.exifOrientation(col("p")).as("o"))
      .head().getInt(0)

  test("exif orientation: both TIFF endians, multi-entry IFDs, corpus safety") {
    def le(o: Int) = hx("FFD8" + "FFE10022" + "457869660000" +
      "49492A00" + "08000000" + "0100" + "12010300" + "01000000" +
      f"$o%02X" + "000000" + "00000000" + "FFD9")
    def be(o: Int) = hx("FFD8" + "FFE10022" + "457869660000" +
      "4D4D002A" + "00000008" + "0001" + "01120003" + "00000001" +
      "00" + f"$o%02X" + "0000" + "00000000" + "FFD9")
    (1 to 8).foreach { o =>
      assert(orient(le(o)) == o, s"LE orientation $o")
      assert(orient(be(o)) == o, s"BE orientation $o")
    }
    // APP0 before APP1, and the orientation tag NOT first in the IFD
    // (preceded by an ImageDescription entry; tag order per TIFF spec)
    val multi = hx("FFD8" +
      "FFE000104A46494600010100000100010000" + // JFIF APP0
      "FFE1002E" + "457869660000" +
      "49492A00" + "08000000" + "0200" + // 2 entries
      "0E010200" + "04000000" + "41424300" + // 0x010E ASCII "ABC\0"
      "12010300" + "01000000" + "06000000" + // orientation 6
      "00000000" + "FFD9")
    assert(orient(multi) == 6)
    // EXIF-less, truncated, non-JPEG, out-of-range value -> 0
    assert(orient(hx("FFD8" +
      "FFE000104A46494600010100000100010000" + "FFD9")) == 0)
    assert(orient(le(3).dropRight(6)) == 0 ||
      orient(le(3).dropRight(6)) == 3) // truncation after the IFD is fine
    assert(orient(hx("89504E47")) == 0)
    assert(orient(le(9)) == 0) // 9 is outside the legal 1-8 range
  }

  test("exif orientation: WebP EXIF chunk routes to the same TIFF walk") {
    // raw TIFF blob in the EXIF chunk (the libwebp mux shape)
    def webp(o: Int) = hx("52494646" + "26000000" + "57454250" +
      "45584946" + "1A000000" +
      "49492A00" + "08000000" + "0100" + "12010300" + "01000000" +
      f"$o%02X" + "000000" + "00000000")
    (1 to 8).foreach(o => assert(orient(webp(o)) == o, s"webp raw $o"))
    // some writers keep the JPEG-style "Exif\0\0" prefix: skipped
    val prefixed = hx("52494646" + "2C000000" + "57454250" +
      "45584946" + "20000000" + "457869660000" +
      "49492A00" + "08000000" + "0100" + "12010300" + "01000000" +
      "06000000" + "00000000")
    assert(orient(prefixed) == 6)
    // EXIF-less WebP (a plain VP8L still) -> 0
    assert(orient(hx("52494646" + "1C000000" + "57454250" + "5650384C" +
      "0F000000" + "2F" + "07000000" + "380060010AD0FF020000" + "00")) == 0)
  }

  test("exif orientation: AVIF/HEIC META item (iinf/iloc) and bare TIFF routes") {
    // ftyp avif + meta{iinf(infe v2 'Exif' id 1) + iloc(v0, absolute
    // offset)} + mdat{ExifDataBlock}; generated by tools-free python
    // box assembly, orientation byte spliced
    val raw = "000000146674797061766966000000006D6966310000004D6D65746" +
      "1000000000000002369696E6600000000000100000015696E66650200000000" +
      "01000045786966000000001E696C6F63000000004400000100010000000100" +
      "0000690000001E000000266D6461740000000049492A0008000000010012010" +
      "30001000000" + "06" + "00000000000000"
    // same but the ExifDataBlock keeps "Exif\0\0" and points
    // exif_tiff_header_offset past it (both writer conventions)
    val pre = "000000146674797061766966000000006D6966310000004D6D6574" +
      "61000000000000002369696E6600000000000100000015696E666502000000" +
      "0001000045786966000000001E696C6F6300000000440000010001000000010" +
      "0000069000000240000002C6D6461740000000645786966000049492A000800" +
      "00000100120103000100000003" + "00000000000000"
    def orientOf(hexStr: String, o: Int) =
      orient(hx(hexStr.dropRight(16) + f"$o%02X" + "000000" + "00000000"))
    (1 to 8).foreach { o =>
      assert(orientOf(raw, o) == o, s"avif raw $o")
      assert(orientOf(pre, o) == o, s"avif Exif-prefixed $o")
    }
    // EXIF-less BMFF (a video mp4 shell) -> 0; truncations never throw
    assert(orient(hx("000000146674797069736F6D0000000069736F6D")) == 0)
    val whole = hx(raw)
    for (cut <- 1 until whole.length)
      assert(orient(whole.take(cut)) == 0 || orient(whole.take(cut)) == 6)
    // bare TIFF payloads route straight to the shared walk
    assert(orient(hx("49492A00" + "08000000" + "0100" + "12010300" +
      "01000000" + "05000000" + "00000000")) == 5)
    assert(orient(hx("4D4D002A" + "00000008" + "0001" + "01120003" +
      "00000001" + "00070000" + "00000000")) == 7)
  }

  test("resize composes over decoded JPEG pixels") {
    val p = dcOnlyColor(20, 18, 22)
    val want = expectedRgb(20, 18, 22)
    val r = Seq(Tuple1(p)).toDF("p")
      .select(Multimodal.resizeDecoded(
        Multimodal.decodeImage(col("p")), 2, 2).as("d"))
      .select("d.width", "d.height", "d.pixels").head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 2)
    assert(r.getSeq[Int](2).forall(_ == want))
  }
}
