package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[Vp8Decode]] against the SYSTEM libwebp (RFC 6386's reference
  * implementation): `src/test/resources/vp8/` holds rasters encoded
  * by WebPEncodeRGB across qualities 10-95 (different quantizers,
  * segment maps, loop-filter levels, mode mixes) with libwebp's own
  * decoded Y/U/V planes as ground truth (`tools/make_vp8_fixtures.py`).
  * YUV is the decoder's native output — bit-exact comparison,
  * independent of any RGB upsampling policy. Plus truncation/bit-flip
  * fuzz under the never-throw corpus policy. */
class Vp8DecodeSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val manifest: Seq[(String, Int, Int)] =
    new String(resource("manifest.txt"), "UTF-8").linesIterator
      .filter(_.nonEmpty).map { l =>
        val p = l.split(" "); (p(0), p(1).toInt, p(2).toInt)
      }.toSeq

  /** Find the 'VP8 ' chunk payload inside a .webp container. */
  private def vp8Chunk(b: Array[Byte]): (Int, Int) = {
    var i = 12
    while (i + 8 <= b.length) {
      val len = (b(i + 4) & 0xff) | ((b(i + 5) & 0xff) << 8) |
        ((b(i + 6) & 0xff) << 16) | ((b(i + 7) & 0xff) << 24)
      if (b(i) == 'V' && b(i + 1) == 'P' && b(i + 2) == '8' &&
        b(i + 3) == ' ') return (i + 8, len)
      i += 8 + len + (len & 1)
    }
    fail("no VP8 chunk")
  }

  private def planesDiff(name: String, got: Array[Byte],
      want: Array[Byte]): Option[String] = {
    if (got.length != want.length)
      return Some(s"$name length ${got.length} vs ${want.length}")
    var i = 0
    var bad = 0
    var firstAt = -1
    var maxd = 0
    while (i < got.length) {
      if (got(i) != want(i)) {
        bad += 1
        if (firstAt < 0) firstAt = i
        val d = math.abs((got(i) & 0xff) - (want(i) & 0xff))
        if (d > maxd) maxd = d
      }
      i += 1
    }
    if (bad == 0) None
    else Some(s"$name: $bad/${got.length} bytes differ, first at $firstAt " +
      s"(got ${got(firstAt) & 0xff} want ${want(firstAt) & 0xff}), maxd $maxd")
  }

  test("libwebp lossy fixtures decode to bit-exact YUV planes") {
    var failures = List.empty[String]
    for ((name, w, h) <- manifest) {
      val enc = resource(s"$name.webp")
      val (o, l) = vp8Chunk(enc)
      val yuv = Vp8Decode.decode(enc, o, l, 1L << 26)
      if (yuv.isEmpty) failures ::= s"$name: decode returned None"
      else {
        val d = yuv.get
        assert(d.width == w && d.height == h, name)
        val truth = resource(s"$name.yuv")
        val cw = (w + 1) / 2
        val ch = (h + 1) / 2
        val yT = truth.slice(0, w * h)
        val uT = truth.slice(w * h, w * h + cw * ch)
        val vT = truth.slice(w * h + cw * ch, w * h + 2 * cw * ch)
        planesDiff(s"$name.y", d.y, yT).foreach(m => failures ::= m)
        planesDiff(s"$name.u", d.u, uT).foreach(m => failures ::= m)
        planesDiff(s"$name.v", d.v, vT).foreach(m => failures ::= m)
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} failures:\n" + failures.reverse.take(12).mkString("\n"))
  }

  test("container decode to RGB matches libwebp's no-fancy output") {
    // .rgb fixtures are WebPDecode(MODE_RGB, no_fancy_upsampling=1)
    // bytes — the full container path (WebpDecode -> Vp8Decode ->
    // toArgb) must reproduce them exactly
    val shipped = Seq("photo_64x48_q75", "blocks_17x31_q50",
      "gradient_129x65_q95", "noise_20x12_q10", "flat_16x16_q95",
      "photo_33x17_q10")
    for (name <- shipped) {
      val enc = resource(s"$name.webp")
      val want = resource(s"$name.rgb")
      val r = WebpDecode.decode(enc, 1L << 26)
      assert(r.nonEmpty, name)
      val d = r.get
      assert(d.pixels.length * 3 == want.length, name)
      var i = 0
      var bad = 0
      while (i < d.pixels.length) {
        val p = d.pixels(i)
        if (((p >> 16) & 0xff) != (want(3 * i) & 0xff) ||
          ((p >> 8) & 0xff) != (want(3 * i + 1) & 0xff) ||
          (p & 0xff) != (want(3 * i + 2) & 0xff)) bad += 1
        i += 1
      }
      assert(bad == 0, s"$name: $bad/${d.pixels.length} pixels differ")
    }
  }

  test("MediaBench's spec-forward writer produces decodable keyframes") {
    // the writer exists only to feed the bench; its streams must be
    // valid VP8 (cross-checked once against libwebp at authoring
    // time — see tools/make_vp8_fixtures.py provenance note)
    for (id <- 0L to 4L; size <- Seq(16, 48, 128)) {
      val enc = graft.MediaBench.vp8Bytes(id, size)
      val (o, l) = vp8Chunk(enc)
      val d = Vp8Decode.decode(enc, o, l, 1L << 26)
      assert(d.nonEmpty, s"id=$id size=$size")
      assert(d.get.width == size && d.get.height == size)
      val d2 = Vp8Decode.decode(enc, o, l, 1L << 26).get
      assert(java.util.Arrays.equals(d.get.y, d2.y))
    }
  }

  test("truncation and bit flips never throw (decode or None)") {
    val rnd = new scala.util.Random(20260816)
    for (name <- Seq("photo_64x48_q75", "gradient_16x16_q50")) {
      val enc = resource(s"$name.webp")
      val (o, l) = vp8Chunk(enc)
      for (cut <- 1 until l by math.max(1, l / 40))
        Vp8Decode.decode(enc, o, cut, 1L << 26) // must not throw
      for (_ <- 1 to 60) {
        val mut = enc.clone()
        val at = o + rnd.nextInt(l)
        mut(at) = (mut(at) ^ (1 << rnd.nextInt(8))).toByte
        Vp8Decode.decode(mut, o, l, 1L << 26) // must not throw
      }
    }
    // pixel bomb: a 16384x16384 header against a 1 MPx cap
    val enc = resource("flat_16x16_q75.webp").clone()
    val (o, _) = vp8Chunk(enc)
    enc(o + 6) = 0xff.toByte; enc(o + 7) = 0x3f.toByte
    enc(o + 8) = 0xff.toByte; enc(o + 9) = 0x3f.toByte
    assert(Vp8Decode.decode(enc, o, enc.length - o, 1L << 20).isEmpty)
  }
}
