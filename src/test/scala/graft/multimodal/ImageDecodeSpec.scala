package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[ImageDecodeExpr]] against an INDEPENDENT codec: images are encoded
  * with the JDK's javax.imageio writers (and by a hand-rolled PNG
  * encoder that forces each scanline filter type), decoded with the
  * expression, and compared pixel-exact. Plus the corpus-safety
  * policy: truncated/corrupt/bomb payloads yield ("unknown",-1,-1,NULL)
  * and never throw. */
class ImageDecodeSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("java.awt.headless", "true")

  private def decode(bytes: Array[Byte]): (String, Int, Int, Seq[Int]) = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.decodeImage(col("p")).as("d"))
      .select("d.format", "d.width", "d.height", "d.pixels").head()
    (r.getString(0), r.getInt(1), r.getInt(2),
      if (r.isNullAt(3)) null else r.getSeq[Int](3))
  }

  /** Deterministic test raster. */
  private def testImage(w: Int, h: Int, imgType: Int): BufferedImage = {
    val img = new BufferedImage(w, h, imgType)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 37 + y * 11) % 256
      val g = (x * 5 + y * 73) % 256
      val b = (x * 97 + y * 3) % 256
      val a = if (imgType == BufferedImage.TYPE_INT_ARGB)
        (128 + (x + y) * 17 % 128) else 255
      img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encodeJdk(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  private def argb(img: BufferedImage): Seq[Int] =
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      yield img.getRGB(x, y)

  test("png rgb round-trips pixel-exact against the JDK encoder") {
    val img = testImage(23, 17, BufferedImage.TYPE_INT_RGB)
    val (f, w, h, px) = decode(encodeJdk(img, "png"))
    assert((f, w, h) == ("png", 23, 17))
    assert(px == argb(img))
  }

  test("png rgba keeps the alpha channel") {
    val img = testImage(9, 14, BufferedImage.TYPE_INT_ARGB)
    val (f, w, h, px) = decode(encodeJdk(img, "png"))
    assert((f, w, h) == ("png", 9, 14))
    assert(px == argb(img))
    assert(px.exists(p => (p >>> 24) != 0xff), "alpha must vary")
  }

  test("png Adam7 interlace round-trips pixel-exact (JDK progressive writer)") {
    // 13x11 exercises partial passes (empty columns in late passes)
    for ((w, h) <- Seq((13, 11), (8, 8), (3, 2), (1, 1), (16, 9))) {
      val img = testImage(w, h, BufferedImage.TYPE_INT_RGB)
      val out = new ByteArrayOutputStream()
      val writer = ImageIO.getImageWritersByFormatName("png").next()
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      writer.dispose(); ios.close()
      val bytes = out.toByteArray
      assert(bytes(28) == 1, "writer did not set the IHDR interlace flag")
      val (f, dw, dh, px) = decode(bytes)
      assert((f, dw, dh) == ("png", w, h))
      assert(px == argb(img), s"${w}x$h Adam7 mismatch")
    }
  }

  test("png 16-bit gray folds each sample to its MSB") {
    val img = new BufferedImage(9, 7, BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 7; x <- 0 until 9)
      img.getRaster.setSample(x, y, 0, (x * 8191 + y * 257) % 65536)
    val bytes = encodeJdk(img, "png")
    // confirm the JDK wrote depth 16 (IHDR bit-depth byte)
    assert(bytes(24) == 16, s"expected depth 16, got ${bytes(24)}")
    val (f, w, h, px) = decode(bytes)
    assert((f, w, h) == ("png", 9, 7))
    val want = for (y <- 0 until 7; x <- 0 until 9) yield {
      val g = img.getRaster.getSample(x, y, 0) >> 8
      0xff000000 | (g << 16) | (g << 8) | g
    }
    assert(px == want)
  }

  test("png sub-byte depths: 1-bit gray and 4-bit palette") {
    val bin = new BufferedImage(19, 5, BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until 5; x <- 0 until 19)
      bin.setRGB(x, y, if ((x * 3 + y * 7) % 5 < 2) 0xffffff else 0)
    val binBytes = encodeJdk(bin, "png")
    assert(binBytes(24) == 1, s"expected depth 1, got ${binBytes(24)}")
    val (f1, w1, h1, px1) = decode(binBytes)
    assert((f1, w1, h1) == ("png", 19, 5))
    assert(px1 == argb(bin)) // 0/255 scaling == the JDK's binary raster

    // 4-bit palette: an IndexColorModel with 16 entries
    val cm = new java.awt.image.IndexColorModel(4, 16,
      Array.tabulate(16)(i => (i * 17).toByte),
      Array.tabulate(16)(i => (255 - i * 17).toByte),
      Array.tabulate(16)(i => ((i * 53) % 256).toByte))
    val pal = new BufferedImage(11, 6, BufferedImage.TYPE_BYTE_BINARY, cm)
    for (y <- 0 until 6; x <- 0 until 11)
      pal.getRaster.setSample(x, y, 0, (x * 5 + y * 3) % 16)
    val palBytes = encodeJdk(pal, "png")
    assert(palBytes(24) == 4 && palBytes(25) == 3,
      s"expected depth-4 palette, got depth ${palBytes(24)} ct ${palBytes(25)}")
    val (f2, w2, h2, px2) = decode(palBytes)
    assert((f2, w2, h2) == ("png", 11, 6))
    assert(px2 == argb(pal))
  }

  private def encodeTiff(img: BufferedImage,
      compression: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    if (compression != null) {
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(compression)
    }
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  test("tiff: uncompressed and PackBits round-trip against the JDK codec") {
    // RGB uncompressed + PackBits, odd dims (multi-strip territory)
    for (comp <- Seq(null, "PackBits")) {
      val img = testImage(21, 17, BufferedImage.TYPE_3BYTE_BGR)
      val (f, w, h, px) = decode(encodeTiff(img, comp))
      assert((f, w, h) == ("tiff", 21, 17), s"compression=$comp")
      assert(px == argb(img), s"tiff rgb compression=$comp")
    }
    // gray (photometric BlackIsZero) — compare raw raster samples
    val gray = testImage(11, 9, BufferedImage.TYPE_BYTE_GRAY)
    val (fg, _, _, pxg) = decode(encodeTiff(gray, "PackBits"))
    assert(fg == "tiff")
    val want = for (y <- 0 until 9; x <- 0 until 11) yield {
      val g = gray.getRaster.getSample(x, y, 0)
      0xff000000 | (g << 16) | (g << 8) | g
    }
    assert(pxg == want)
  }

  test("tiff: LZW and Deflate round-trip against the JDK codec") {
    for (comp <- Seq("LZW", "ZLib", "Deflate")) {
      val img = testImage(21, 17, BufferedImage.TYPE_3BYTE_BGR)
      val (f, w, h, px) = decode(encodeTiff(img, comp))
      assert((f, w, h) == ("tiff", 21, 17), s"compression=$comp")
      assert(px == argb(img), s"tiff rgb compression=$comp")
      // a taller gray image crosses the writer's strip boundary, so
      // the per-strip decoder state reset is exercised
      val gray = testImage(64, 48, BufferedImage.TYPE_BYTE_GRAY)
      val (fg, wg, hg, pxg) = decode(encodeTiff(gray, comp))
      assert((fg, wg, hg) == ("tiff", 64, 48), s"compression=$comp")
      val want = for (y <- 0 until 48; x <- 0 until 64) yield {
        val g = gray.getRaster.getSample(x, y, 0)
        0xff000000 | (g << 16) | (g << 8) | g
      }
      assert(pxg == want, s"tiff gray compression=$comp")
    }
  }

  test("tiff LZW property: 8 random noise images force every code width") {
    // random rasters grow the dictionary ~1 entry/byte: a 96x64 RGB
    // strip is ~18k bytes, driving the code width through all of
    // 9->10->11->12 and the encoder's 4096-entry Clear reset — the
    // early-change off-by-one shows up immediately if wrong
    val rnd = new scala.util.Random(11161992)
    for (t <- 0 until 8) {
      val (w, h) = (96, 64)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt(1 << 24))
      val (f, ww, hh, px) = decode(encodeTiff(img, "LZW"))
      assert((f, ww, hh) == ("tiff", w, h), s"trial $t")
      assert(px == argb(img), s"trial $t")
    }
  }

  test("tiff: deflate with horizontal-differencing predictor (hand-built)") {
    // the JDK writer does not emit predictor 2, so build the TIFF by
    // hand: gray 13x7, rows differenced then zlib-deflated, tag 317=2
    val (w, h) = (13, 7)
    val raster = Array.tabulate(w * h)(i => ((i * 37 + 11) % 256).toByte)
    val diffed = raster.clone()
    for (y <- 0 until h; x <- (w - 1) until 0 by -1)
      diffed(y * w + x) = (raster(y * w + x) - raster(y * w + x - 1)).toByte
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput(diffed); d.finish()
      val buf = new Array[Byte](diffed.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    def le16t(v: Int) = Array[Byte]((v & 0xff).toByte, (v >> 8).toByte)
    def le32t(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def entry(tag: Int, typ: Int, cnt: Int, v: Int) =
      le16t(tag) ++ le16t(typ) ++ le32t(cnt) ++ le32t(v)
    val nE = 10
    val dataOff = 8 + 2 + nE * 12 + 4
    val ifd = le16t(nE) ++
      entry(256, 3, 1, w) ++ entry(257, 3, 1, h) ++
      entry(258, 3, 1, 8) ++ entry(259, 3, 1, 8) ++ // Deflate
      entry(262, 3, 1, 1) ++ entry(273, 4, 1, dataOff) ++
      entry(277, 3, 1, 1) ++ entry(278, 3, 1, h) ++
      entry(279, 4, 1, defl.length) ++ entry(317, 3, 1, 2) ++
      le32t(0) // next-IFD terminator
    val bytes = "II".getBytes ++ le16t(42) ++ le32t(8) ++ ifd ++ defl
    val (f, ww, hh, px) = decode(bytes)
    assert((f, ww, hh) == ("tiff", w, h))
    val want = for (i <- 0 until w * h) yield {
      val g = raster(i) & 0xff
      0xff000000 | (g << 16) | (g << 8) | g
    }
    assert(px == want)
  }

  test("png gray decodes to replicated-channel ARGB") {
    val img = testImage(12, 8, BufferedImage.TYPE_BYTE_GRAY)
    val (f, w, h, px) = decode(encodeJdk(img, "png"))
    assert((f, w, h) == ("png", 12, 8))
    // compare against the RAW gray samples (getRGB would run the
    // gray->sRGB colorspace transform, which is not plain replication)
    val want = for (y <- 0 until 8; x <- 0 until 12) yield {
      val g = img.getRaster.getSample(x, y, 0)
      0xff000000 | (g << 16) | (g << 8) | g
    }
    assert(px == want)
  }

  test("png palette (indexed) resolves through PLTE") {
    val img = testImage(16, 16, BufferedImage.TYPE_BYTE_INDEXED)
    val (f, w, h, px) = decode(encodeJdk(img, "png"))
    assert((f, w, h) == ("png", 16, 16))
    assert(px == argb(img))
  }

  test("pnm: P6/P5/P4 binary rasters decode exactly (comments, 16-bit fold)") {
    // P6 RGB with a comment and odd whitespace in the header
    val rgb = Array.tabulate(2 * 3 * 3)(i => ((i * 41 + 7) % 256).toByte)
    val p6 = "P6 # a comment\n 3\t2\n255\n".getBytes ++ rgb
    val (f1, w1, h1, px1) = decode(p6)
    assert((f1, w1, h1) == ("pnm", 3, 2))
    val want1 = for (p <- 0 until 6) yield 0xff000000 |
      ((rgb(p * 3) & 0xff) << 16) | ((rgb(p * 3 + 1) & 0xff) << 8) |
      (rgb(p * 3 + 2) & 0xff)
    assert(px1 == want1)
    // P5 gray, 16-bit (maxval 65535) folds to the MSB
    val g16 = Array[Byte](0x12, 0x34, 0xFF.toByte, 0x00, 0x00, 0x01,
      0x80.toByte, 0x7F)
    val p5 = "P5\n2 2\n65535\n".getBytes ++ g16
    val (f2, w2, h2, px2) = decode(p5)
    assert((f2, w2, h2) == ("pnm", 2, 2))
    assert(px2 == Seq(0x12, 0xFF, 0x00, 0x80).map(g =>
      0xff000000 | (g << 16) | (g << 8) | g))
    // P4 bitmap: width 10 = 2 bytes/row, 1 = black
    val bits = Array[Byte](0xA5.toByte, 0x80.toByte, 0x5A, 0x40)
    val p4 = "P4\n10 2\n".getBytes ++ bits
    val (f3, w3, h3, px3) = decode(p4)
    assert((f3, w3, h3) == ("pnm", 10, 2))
    val want3 = "1010010110" + "0101101001"
    assert(px3 == want3.map(c => if (c == '1') 0xff000000
      else 0xffffffff))
    // corpus-safety: truncated raster / ASCII P3 / bad maxval
    assert(decode(p6.dropRight(2))._1 == "unknown")
    assert(decode("P3\n1 1\n255\n1 2 3\n".getBytes)._1 == "unknown")
    assert(decode("P5\n2 2\n0\nxxxx".getBytes)._1 == "unknown")
  }

  private def tgaFile(imgType: Int, w: Int, h: Int, depth: Int,
      data: Array[Byte], desc: Int = 0, palette: Array[Byte] = null,
      cmBits: Int = 24): Array[Byte] = {
    val cmType = if (palette != null) 1 else 0
    val cmLen = if (palette != null) palette.length / ((cmBits + 7) / 8) else 0
    val hdr = Array[Byte](0, cmType.toByte, imgType.toByte,
      0, 0, (cmLen & 0xff).toByte, ((cmLen >> 8) & 0xff).toByte,
      cmBits.toByte, 0, 0, 0, 0,
      (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0xff).toByte,
      depth.toByte, desc.toByte)
    val footer = new Array[Byte](8) ++ "TRUEVISION-XFILE".getBytes ++
      Array[Byte]('.', 0)
    hdr ++ (if (palette != null) palette else Array.empty[Byte]) ++
      data ++ footer
  }

  test("tga: truecolor/gray/palette, RLE packets, origins, 5-5-5 replication") {
    // 24-bit bottom-up 2x2: stored rows are (bottom, top)
    val bgr = Array[Byte](1, 2, 3, 4, 5, 6, /*row y=1*/ 7, 8, 9, 10, 11, 12)
    val (f1, w1, h1, px1) = decode(tgaFile(2, 2, 2, 24, bgr))
    assert((f1, w1, h1) == ("tga", 2, 2))
    assert(px1 == Seq(0xff090807, 0xff0c0b0a, 0xff030201, 0xff060504))
    // RLE truecolor top-down: run of 3 + raw of 1
    val rle = Array[Byte](0x82.toByte, 10, 20, 30, 0x00, 40, 50, 60)
    val (f2, w2, h2, px2) = decode(tgaFile(10, 2, 2, 24, rle, desc = 0x20))
    assert((f2, w2, h2) == ("tga", 2, 2))
    assert(px2 == Seq(0xff1e140a, 0xff1e140a, 0xff1e140a, 0xff3c3228))
    // 8-bit palette (BGR map), top-down
    val pal = Array[Byte](10, 20, 30, 40, 50, 60) // entries 0,1
    val (f3, _, _, px3) = decode(
      tgaFile(1, 2, 1, 8, Array[Byte](1, 0), desc = 0x20, palette = pal))
    assert(f3 == "tga")
    assert(px3 == Seq(0xff3c3228, 0xff1e140a))
    // gray + 16-bit 5-5-5 with (v<<3)|(v>>2) replication, top-down
    val (f4, _, _, px4) = decode(
      tgaFile(3, 2, 1, 8, Array[Byte](0, 255.toByte), desc = 0x20))
    assert(f4 == "tga" && px4 == Seq(0xff000000, 0xffffffff))
    val v555 = (31 << 10) | (16 << 5) | 1 // R=31 G=16 B=1
    val (f5, _, _, px5) = decode(tgaFile(2, 1, 1, 16,
      Array[Byte]((v555 & 0xff).toByte, (v555 >> 8).toByte), desc = 0x20))
    def c5(x: Int) = (x << 3) | (x >> 2)
    assert(f5 == "tga" &&
      px5 == Seq(0xff000000 | (c5(31) << 16) | (c5(16) << 8) | c5(1)))
    // corpus-safety: no v2 footer -> not even detected; truncated RLE;
    // palette index out of range
    val noFooter = tgaFile(2, 2, 2, 24, bgr).dropRight(26)
    assert(decode(noFooter)._1 == "unknown")
    assert(decode(tgaFile(10, 4, 4, 24, rle, desc = 0x20))._1 == "unknown")
    assert(decode(tgaFile(1, 2, 1, 8, Array[Byte](5, 0), desc = 0x20,
      palette = pal))._1 == "unknown")
    // color-map gates hold for truecolor too: a present-but-unused
    // map is skipped correctly, while nonstandard map types/strides
    // are rejected rather than reading pixels at a garbage offset
    val tcMap = tgaFile(2, 1, 1, 24, Array[Byte](40, 50, 60),
      desc = 0x20, palette = pal) // cmType=1, 2x24-bit entries skipped
    assert(decode(tcMap)._4 == Seq(0xff3c3228))
    val cm2 = tcMap.clone(); cm2(1) = 2 // cmType 2: stride unknowable
    assert(decode(cm2)._1 == "unknown")
    val cm0 = tcMap.clone(); cm0(7) = 0 // cmType 1 + 0-bit entries
    assert(decode(cm0)._1 == "unknown")
    val cm13 = tcMap.clone(); cm13(7) = 13 // non-spec entry width
    assert(decode(cm13)._1 == "unknown")
  }

  test("bmp palette formats round-trip against the JDK writer (8/1-bit, gray)") {
    // 8-bit indexed with a non-trivial palette
    val cm = new java.awt.image.IndexColorModel(8, 64,
      Array.tabulate(64)(i => (i * 4).toByte),
      Array.tabulate(64)(i => (255 - i * 3).toByte),
      Array.tabulate(64)(i => ((i * 37) % 256).toByte))
    val idx = new BufferedImage(23, 9, BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until 9; x <- 0 until 23)
      idx.getRaster.setSample(x, y, 0, (x * 7 + y * 3) % 64)
    val (f1, w1, h1, px1) = decode(encodeJdk(idx, "bmp"))
    assert((f1, w1, h1) == ("bmp", 23, 9))
    assert(px1 == argb(idx))
    // 1-bit binary (stride/bit-order edge: width 19)
    val bin = new BufferedImage(19, 5, BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until 5; x <- 0 until 19)
      bin.setRGB(x, y, if ((x * 3 + y * 7) % 5 < 2) 0xffffff else 0)
    val (f2, w2, h2, px2) = decode(encodeJdk(bin, "bmp"))
    assert((f2, w2, h2) == ("bmp", 19, 5))
    assert(px2 == argb(bin))
    // 8-bit gray goes through a linear 256-entry gray palette — compare
    // against the RAW samples (argb()/getRGB would apply the gray->sRGB
    // transform; same rationale as the PNG gray test)
    val gray = testImage(11, 7, BufferedImage.TYPE_BYTE_GRAY)
    val (f3, w3, h3, px3) = decode(encodeJdk(gray, "bmp"))
    assert((f3, w3, h3) == ("bmp", 11, 7))
    val want = for (y <- 0 until 7; x <- 0 until 11) yield {
      val g = gray.getRaster.getSample(x, y, 0)
      0xff000000 | (g << 16) | (g << 8) | g
    }
    assert(px3 == want)
  }

  test("bmp BI_RLE8 compression round-trips against the JDK writer") {
    def encodeRle(img: BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val writer = ImageIO.getImageWritersByFormatName("bmp").next()
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType("BI_RLE8")
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      writer.dispose(); ios.close()
      out.toByteArray
    }
    // runs of equal pixels + noise stretches exercise encoded AND
    // absolute RLE modes
    val img = new BufferedImage(37, 11, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 11; x <- 0 until 37)
      img.getRaster.setSample(x, y, 0,
        if (x < 15) y * 3 else (x * 31 + y * 17) % 256)
    val (f, w, h, px) = decode(encodeRle(img))
    assert((f, w, h) == ("bmp", 37, 11))
    assert(px == argb(img))
  }

  test("bmp 4bpp palette round-trips against the JDK writer; RLE4 decodes hand-built runs") {
    // 4bpp via the JDK writer (16-entry palette)
    val cm = new java.awt.image.IndexColorModel(4, 16,
      Array.tabulate(16)(i => (i * 17).toByte),
      Array.tabulate(16)(i => (255 - i * 17).toByte),
      Array.tabulate(16)(i => ((i * 53) % 256).toByte))
    val img = new BufferedImage(11, 6, BufferedImage.TYPE_BYTE_BINARY, cm)
    for (y <- 0 until 6; x <- 0 until 11)
      img.getRaster.setSample(x, y, 0, (x * 5 + y * 3) % 16)
    val (f1, w1, h1, px1) = decode(encodeJdk(img, "bmp"))
    assert((f1, w1, h1) == ("bmp", 11, 6))
    assert(px1 == argb(img))
    // hand-built BI_RLE4 5x2: bottom row one encoded run (nibbles
    // alternate 0,1), top row one absolute run of 5 nibbles (padded
    // to a word boundary)
    def le32x(v: Int) = Array[Byte]((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    def le16x(v: Int) = Array[Byte]((v & 0xff).toByte, (v >> 8).toByte)
    val pal = Array[Byte](10, 20, 30, 0, 40, 50, 60, 0, 70, 80, 90, 0)
    val rle = Array[Byte](5, 0x01, // run: 0,1,0,1,0
      0, 0, // end of line
      0, 5, 0x20, 0x12, 0x00, 0, // absolute: 2,0,1,2,0 (+pad byte)
      0, 1) // end of bitmap
    val bmp = "BM".getBytes ++ le32x(0) ++ le32x(0) ++ le32x(66) ++
      le32x(40) ++ le32x(5) ++ le32x(2) ++ le16x(1) ++ le16x(4) ++
      le32x(2) ++ le32x(rle.length) ++ le32x(0) ++ le32x(0) ++
      le32x(3) ++ le32x(0) ++ pal ++ rle
    val (f2, w2, h2, px2) = decode(bmp)
    assert((f2, w2, h2) == ("bmp", 5, 2))
    def p(k: Int) = 0xff000000 | ((pal(k * 4 + 2) & 0xff) << 16) |
      ((pal(k * 4 + 1) & 0xff) << 8) | (pal(k * 4) & 0xff)
    assert(px2 == Seq(p(2), p(0), p(1), p(2), p(0), // top (image row 0)
      p(0), p(1), p(0), p(1), p(0))) // bottom (image row 1)
  }

  test("tga: nonzero color-map first-entry offset and 0-attribute-bit 32bpp alpha") {
    // palette covering indices 2..3 (cmFirst = 2)
    val pal = Array[Byte](10, 20, 30, 40, 50, 60)
    val hdr = Array[Byte](0, 1, 1, 2, 0, 2, 0, 24, 0, 0, 0, 0,
      2, 0, 1, 0, 8, 0x20)
    val footer = new Array[Byte](8) ++ "TRUEVISION-XFILE".getBytes ++
      Array[Byte]('.', 0)
    val withOffset = hdr ++ pal ++ Array[Byte](3, 2) ++ footer
    val (f1, _, _, px1) = decode(withOffset)
    assert(f1 == "tga")
    assert(px1 == Seq(0xff3c3228, 0xff1e140a)) // entries 1 then 0
    // an index below cmFirst is out of map range
    val below = hdr ++ pal ++ Array[Byte](1, 2) ++ footer
    assert(decode(below)._1 == "unknown")
    // 32bpp with 0 attribute bits: 4th byte is padding, alpha opaque
    val t32 = tgaFile(2, 1, 1, 32, Array[Byte](5, 6, 7, 0), desc = 0x20)
    assert(decode(t32)._4 == Seq(0xff070605))
    // 32bpp declaring 8 attribute bits: 4th byte IS alpha
    val t32a = tgaFile(2, 1, 1, 32,
      Array[Byte](5, 6, 7, 0x80.toByte), desc = 0x28)
    assert(decode(t32a)._4 == Seq(0x80070605))
  }

  test("pnm: non-canonical maxval is rejected, not decoded unscaled") {
    assert(decode(("P5\n2 1\n15\n".getBytes ++
      Array[Byte](15, 0)))._1 == "unknown")
    assert(decode(("P6\n1 1\n1000\n".getBytes ++
      Array[Byte](3, -24, 0, 0, 0, 0)))._1 == "unknown")
  }

  test("bmp 24bpp round-trips pixel-exact (bottom-up rows, padded stride)") {
    // width 7: a 21-byte row pads to 24 — exercises the stride math
    val img = testImage(7, 5, BufferedImage.TYPE_INT_RGB)
    val (f, w, h, px) = decode(encodeJdk(img, "bmp"))
    assert((f, w, h) == ("bmp", 7, 5))
    assert(px == argb(img))
  }

  // ---- hand-rolled PNG encoder: forces ONE filter type on every
  // scanline (the JDK writer picks adaptively, so alone it cannot
  // guarantee coverage of Sub/Up/Average/Paeth)
  private def crc32(b: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32(); c.update(b); c.getValue.toInt
  }
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
    bb.putInt(crc32(typ.getBytes("US-ASCII") ++ data))
    bb.array()
  }
  private def pngWithFilter(pix: Array[Array[Int]], filter: Int)
      : Array[Byte] = {
    val h = pix.length; val w = pix(0).length
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    val prev = new Array[Byte](stride)
    for (y <- 0 until h) {
      val cur = new Array[Byte](stride)
      for (x <- 0 until w) {
        cur(x * 3) = ((pix(y)(x) >> 16) & 0xff).toByte
        cur(x * 3 + 1) = ((pix(y)(x) >> 8) & 0xff).toByte
        cur(x * 3 + 2) = (pix(y)(x) & 0xff).toByte
      }
      raw(y * (stride + 1)) = filter.toByte
      for (x <- 0 until stride) {
        val a = if (x >= 3) cur(x - 3) & 0xff else 0
        val b = prev(x) & 0xff
        val c = if (x >= 3) prev(x - 3) & 0xff else 0
        val pred = filter match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val (pa, pb, pc) =
              (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(y * (stride + 1) + 1 + x) = ((cur(x) & 0xff) - pred).toByte
      }
      System.arraycopy(cur, 0, prev, 0, stride)
    }
    val z = { // zlib-compress the filtered scanlines
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length * 2 + 64)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", z) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("every scanline filter type (None/Sub/Up/Average/Paeth) unfilters exactly") {
    val rnd = new scala.util.Random(42)
    val pix = Array.fill(6, 11)(rnd.nextInt() & 0xffffff)
    val want = pix.flatten.map(0xff000000 | _).toSeq
    for (filter <- 0 to 4) {
      val (f, w, h, px) = decode(pngWithFilter(pix, filter))
      assert((f, w, h) == ("png", 11, 6), s"filter $filter")
      assert(px == want, s"filter $filter")
    }
  }

  test("gif round-trips pixel-exact against the JDK encoder (LZW is lossless)") {
    // indexed input: the gif writer's palette derivation is then exact
    val img = testImage(21, 13, BufferedImage.TYPE_BYTE_INDEXED)
    val bytes = encodeJdk(img, "gif")
    val (f, w, h, px) = decode(bytes)
    assert((f, w, h) == ("gif", 21, 13))
    // compare against the JDK's OWN reading of the same bytes — two
    // independent LZW decoders must agree exactly
    val jdk = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(px == argb(jdk))
  }

  test("interlaced gif reorders the 4-pass rows correctly") {
    val img = testImage(19, 17, BufferedImage.TYPE_BYTE_INDEXED)
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val bytes = bos.toByteArray
    // confirm the interlace flag is actually set in the image descriptor
    val desc = bytes.indexWhere(_ == 0x2c)
    assert(desc > 0 && (bytes(desc + 9) & 0x40) != 0, "writer not interlaced")
    val (f, w, h, px) = decode(bytes)
    assert((f, w, h) == ("gif", 19, 17))
    val jdk = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(px == argb(jdk))
  }

  test("gif transparency: GCE transparent index decodes to alpha 0") {
    // 4-color palette with index 3 fully transparent
    val cmap = Array(0xff102030, 0xff405060, 0xff708090, 0x00000000)
    val icm = new java.awt.image.IndexColorModel(
      2, 4, cmap, 0, true, 3, java.awt.image.DataBuffer.TYPE_BYTE)
    val img = new BufferedImage(8, 6, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until 6; x <- 0 until 8)
      img.getRaster.setSample(x, y, 0, (x + y) % 4)
    val bytes = encodeJdk(img, "gif")
    val (f, w, h, px) = decode(bytes)
    assert((f, w, h) == ("gif", 8, 6))
    val want = for (y <- 0 until 6; x <- 0 until 8)
      yield if ((x + y) % 4 == 3) 0 else cmap((x + y) % 4)
    assert(px == want)
  }

  test("gif property: 25 random indexed images round-trip exactly") {
    // random sizes/contents force varied LZW code streams (dictionary
    // growth, width bumps, clear codes from the JDK encoder)
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 25) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(30)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt() | 0xff000000)
      val bytes = encodeJdk(img, "gif")
      val (f, dw, dh, px) = decode(bytes)
      assert((f, dw, dh) == ("gif", w, h), s"trial $trial")
      // reference = the ORIGINAL raster, not ImageIO.read: the JDK's
      // GIF reader demonstrably fails to read back its own writer's
      // output for some small sizes (e.g. 26x2 drops row 1 to black),
      // while this decoder recovers the written pixels exactly
      assert(px == argb(img), s"trial $trial ($w x $h)")
      // truncating mid-stream yields unknown (or, if the cut landed
      // after the complete image block, the identical full decode) —
      // never WRONG pixels
      val cut = decode(bytes.take(bytes.length / 2))
      assert(cut._1 == "unknown" || cut._4 == px, s"trial $trial cut")
    }
  }

  test("corpus-safety: corrupt, truncated, bomb, and unsupported payloads are unknown") {
    val good = encodeJdk(testImage(8, 8, BufferedImage.TYPE_INT_RGB), "png")
    assert(decode(good.take(30))._1 == "unknown") // truncated mid-chunk
    assert(decode(Array.fill[Byte](64)(0x55))._1 == "unknown") // garbage
    // declared 100k x 100k canvas in a 50-byte file: the bomb guard
    // must refuse BEFORE allocating 40 GB
    val bombIhdr = java.nio.ByteBuffer.allocate(13)
      .putInt(100000).putInt(100000).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val bomb =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        chunk("IHDR", bombIhdr) ++ chunk("IEND", Array.empty[Byte])
    assert(decode(bomb)._1 == "unknown")
    // interlace flag LIED onto a sequential stream: the Adam7 raw
    // length no longer matches the deflate payload -> unknown, not
    // garbage pixels
    val inter = good.clone()
    inter(28) = 1 // IHDR interlace byte (8 sig + 8 hdr + 12 data)
    assert(decode(inter)._1 == "unknown")
    // baseline JPEG decodes for real since round 11 (JpegDecodeSpec
    // proves pixel parity with the JDK) — here just the dispatch
    val jpeg = encodeJdk(testImage(8, 8, BufferedImage.TYPE_INT_RGB), "jpg")
    assert(decode(jpeg)._1 == "jpeg")
    assert(decode(Array.empty[Byte])._1 == "unknown")
  }

  // ---- ICO builders (public ICONDIR/ICONDIRENTRY + headerless-BMP
  // entry layout), shared by the decode and policy tests below
  private def le16b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)
  /** entries: (dirWidth, dirHeight, bitCount, payload) */
  private def ico(entries: (Int, Int, Int, Array[Byte])*): Array[Byte] = {
    var off = 6 + 16 * entries.length
    val dirs = entries.map { case (w, h, bpp, p) =>
      val e = Array[Byte](w.toByte, h.toByte, 0, 0) ++ le16b(1) ++
        le16b(bpp) ++ le32b(p.length) ++ le32b(off)
      off += p.length
      e
    }
    Array[Byte](0, 0, 1, 0) ++ le16b(entries.length) ++
      dirs.flatten ++ entries.flatMap(_._4)
  }
  /** headerless-BMP DIB with the ICO doubled height */
  private def icoDib(w: Int, h: Int, bpp: Int, clrUsed: Int = 0) =
    le32b(40) ++ le32b(w) ++ le32b(h * 2) ++ le16b(1) ++ le16b(bpp) ++
      le32b(0) ++ le32b(0) ++ le32b(0) ++ le32b(0) ++ le32b(clrUsed) ++
      le32b(0)

  test("ico: largest entry wins; XOR+AND BMP entries; PNG entries; 32bpp alpha") {
    def px(i: Int) = 0xff000000 | ((10 + i) << 16) | ((20 + i) << 8) | (30 + i)
    def bgr(i: Int) = Array[Byte]((30 + i).toByte, (20 + i).toByte,
      (10 + i).toByte)
    // 2x2 24bpp: XOR bottom-up (row 1 first), 2-byte row pad; AND mask
    // marks display pixel (0,0) transparent
    val xor24 = bgr(2) ++ bgr(3) ++ Array[Byte](0, 0) ++
      bgr(0) ++ bgr(1) ++ Array[Byte](0, 0)
    val and24 = Array[Byte](0, 0, 0, 0) ++ // display row 1: opaque
      Array[Byte](0x80.toByte, 0, 0, 0) // display row 0: (0,0) masked
    val bmp2 = icoDib(2, 2, 24) ++ xor24 ++ and24
    // 1x1 24bpp loser entry
    val bmp1 = icoDib(1, 1, 24) ++ Array[Byte](9, 9, 9, 0) ++
      Array[Byte](0, 0, 0, 0)
    val two = ico((1, 1, 24, bmp1), (2, 2, 24, bmp2))
    assert(decode(two) == ("ico", 2, 2,
      Seq(0, px(1), px(2), px(3)))) // p0 transparent via the AND mask
    // PNG entry: JDK-encoded stream routed to the png decoder
    val img = testImage(4, 4, BufferedImage.TYPE_INT_RGB)
    val fromPng = ico((4, 4, 32, encodeJdk(img, "png")))
    assert(decode(fromPng) == ("ico", 4, 4, argb(img)))
    // 32bpp BGRA entry: alpha from the 4th byte; AND mask IGNORED
    // (all-ones mask must not blank the image — Vista+ convention)
    def bgra(i: Int, a: Int) = bgr(i) ++ Array[Byte](a.toByte)
    val xor32 = bgra(2, 200) ++ bgra(3, 250) ++ bgra(0, 100) ++ bgra(1, 150)
    val and32 = Array.fill[Byte](8)(0xff.toByte)
    val bmp32 = icoDib(2, 2, 32) ++ xor32 ++ and32
    assert(decode(ico((2, 2, 32, bmp32))) == ("ico", 2, 2, Seq(
      (px(0) & 0xffffff) | (100 << 24), (px(1) & 0xffffff) | (150 << 24),
      (px(2) & 0xffffff) | (200 << 24), (px(3) & 0xffffff) | (250 << 24))))
    // 8bpp palette entry (colorsUsed = 2): indices through the BGRA
    // quad table, AND mask opaque
    val pal = Array[Byte](30, 20, 10, 0) ++ Array[Byte](33, 23, 13, 0)
    val xor8 = Array[Byte](1, 0, 0, 0) ++ Array[Byte](0, 1, 0, 0)
    val bmp8 = icoDib(2, 2, 8, clrUsed = 2) ++ pal ++ xor8 ++
      Array.fill[Byte](8)(0)
    assert(decode(ico((2, 2, 8, bmp8))) == ("ico", 2, 2,
      Seq(px(0), px(3), px(3), px(0))))
    // meta agrees on the directory's largest entry
    val m = Seq(Tuple1(two)).toDF("p")
      .select(Multimodal.imageMeta(col("p")).as("m"))
      .select("m.format", "m.width", "m.height").head()
    assert((m.getString(0), m.getInt(1), m.getInt(2)) == ("ico", 2, 2))
  }

  test("ico: cursors, odd heights, out-of-bounds entries degrade to unknown") {
    val good = icoDib(1, 1, 24) ++ Array[Byte](9, 9, 9, 0, 0, 0, 0, 0)
    // cursor type (2) is not an icon
    val cur = ico((1, 1, 24, good))
    cur(2) = 2
    assert(decode(cur)._1 == "unknown")
    // entry claiming bytes past the payload
    val oob = ico((1, 1, 24, good))
    oob(6 + 8) = 99 // inflate the size field
    assert(decode(oob)._1 == "unknown")
    // odd (un-doubled) DIB height
    val odd = icoDib(1, 1, 24).clone()
    odd(8) = 1 // height 1 instead of 2
    assert(decode(ico((1, 1, 24, odd ++ Array[Byte](9, 9, 9, 0, 0, 0, 0, 0))))._1
      == "unknown")
    // truncation sweep never throws
    val whole = ico((1, 1, 24, good))
    for (cut <- 1 until whole.length) {
      val r = decode(whole.take(cut))
      assert(r._1 == "unknown" || r._2 > 0)
    }
  }

  test("resizeDecoded: nearest-neighbor downsample matches the direct computation") {
    val img = testImage(16, 12, BufferedImage.TYPE_INT_RGB)
    val r = Seq(Tuple1(encodeJdk(img, "png"))).toDF("p")
      .select(Multimodal.resizeDecoded(
        Multimodal.decodeImage(col("p")), 4, 3).as("d"))
      .select("d.width", "d.height", "d.pixels").head()
    assert((r.getInt(0), r.getInt(1)) == (4, 3))
    val want = for (y <- 0 until 3; x <- 0 until 4)
      yield img.getRGB(x * 16 / 4, y * 12 / 3)
    assert(r.getSeq[Int](2) == want)
    // a failed decode resizes to NULL, not an error
    val bad = Seq(Tuple1(Array.fill[Byte](16)(1))).toDF("p")
      .select(Multimodal.resizeDecoded(
        Multimodal.decodeImage(col("p")), 4, 3).as("d")).head()
    assert(bad.isNullAt(0))
  }
}
