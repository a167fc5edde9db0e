package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[WebpDecode]] against the format's REFERENCE implementation:
  * `src/test/resources/webp/` holds rasters encoded by the system
  * libwebp (`tools/make_webp_fixtures.py`, each fixture round-trip
  * verified by libwebp's own decoder at generation time) — the decoder
  * must return the encoder's input pixel-exact. The corpus is shaped
  * to force every VP8L feature: dense prefix codes (noise), the
  * predictor and cross-color transforms (gradients / photo-ish),
  * color-indexing at every pixel-bundling width (2/4/16/200 colors),
  * LZ77 with short plane-code distances (repeated tiles), color
  * cache, 1-wide/1-tall shapes, and single-symbol codes (constant).
  *
  * A hand-assembled minimal stream additionally pins the raw bit
  * conventions (LSB-first reads, simple-code layout, canonical
  * 2-symbol ordering) independent of any encoder, and the
  * corpus-safety policy (truncation, version, lossy VP8, bombs,
  * random corruption) is asserted to never throw. */
class WebpDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def decode(bytes: Array[Byte]): (String, Int, Int, Seq[Int]) = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.decodeImage(col("p")).as("d"))
      .select("d.format", "d.width", "d.height", "d.pixels").head()
    (r.getString(0), r.getInt(1), r.getInt(2),
      if (r.isNullAt(3)) null else r.getSeq[Int](3))
  }

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/webp/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val manifest: Seq[(String, Int, Int)] =
    new String(resource("manifest.txt"), "UTF-8").linesIterator
      .filter(_.nonEmpty).map { l =>
        val p = l.split(" ")
        (p(0), p(1).toInt, p(2).toInt)
      }.toSeq

  test("lossy+ALPH fixtures decode to libwebp's no-fancy RGBA, pixel-exact") {
    // transparent lossy WebP: VP8X + ALPH (compressed headerless-VP8L
    // and hand-built raw variants across all 4 filters) + VP8, each
    // pinned against the system libwebp's MODE_RGBA no-fancy decode
    // (tools/make_webp_alpha_fixtures.py)
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/webp_alpha/$name")
      assert(in != null, s"missing fixture $name")
      try in.readAllBytes() finally in.close()
    }
    val alphaManifest = new String(res("manifest.txt"), "UTF-8")
      .linesIterator.filter(_.nonEmpty).map { l =>
        val p = l.split(" "); (p(0), p(1).toInt, p(2).toInt)
      }.toSeq
    assert(alphaManifest.size >= 8, "alpha fixture corpus went missing")
    for ((name, w, h) <- alphaManifest) {
      val enc = res(s"$name.webp")
      val rgba = res(s"$name.rgba")
      val expected = Seq.tabulate(w * h) { i =>
        ((rgba(4 * i + 3) & 0xff) << 24) | ((rgba(4 * i) & 0xff) << 16) |
          ((rgba(4 * i + 1) & 0xff) << 8) | (rgba(4 * i + 2) & 0xff)
      }
      val (f, gw, gh, px) = decode(enc)
      assert((f, gw, gh) == (("webp", w, h)), name)
      assert(px == expected, name)
    }
    // pre-processed alpha (level reduction) is a documented None:
    // flipping the P bits on a raw-alpha fixture must yield unknown
    val enc = res("rawalpha_f0_16x16.webp").clone()
    var i = 12
    var alph = -1
    while (alph < 0 && i + 8 <= enc.length) {
      val len = (enc(i + 4) & 0xff) | ((enc(i + 5) & 0xff) << 8) |
        ((enc(i + 6) & 0xff) << 16) | ((enc(i + 7) & 0xff) << 24)
      if (enc(i) == 'A' && enc(i + 1) == 'L' && enc(i + 2) == 'P' &&
        enc(i + 3) == 'H') alph = i + 8
      i += 8 + len + (len & 1)
    }
    enc(alph) = (enc(alph) | 0x10).toByte
    assert(decode(enc)._1 == "unknown")
  }

  test("libwebp-encoded fixtures decode to the encoder's input, pixel-exact") {
    assert(manifest.size >= 15, "fixture corpus went missing")
    for ((name, w, h) <- manifest) {
      val enc = resource(s"$name.webp")
      val rgba = resource(s"$name.rgba")
      val expected = Seq.tabulate(w * h) { i =>
        ((rgba(4 * i + 3) & 0xff) << 24) | ((rgba(4 * i) & 0xff) << 16) |
          ((rgba(4 * i + 1) & 0xff) << 8) | (rgba(4 * i + 2) & 0xff)
      }
      val (f, gw, gh, px) = decode(enc)
      assert((f, gw, gh) == (("webp", w, h)), name)
      assert(px == expected, name)
    }
  }

  test("fixtures decode identically through a whole DataFrame column") {
    // same decode, but as one vectorized pass over all fixtures — the
    // operator shape the documents-table queries use
    val rows = manifest.map { case (name, w, h) =>
      (name, resource(s"$name.webp"), w, h)
    }
    val got = rows.toDF("name", "payload", "w", "h")
      .select(col("name"), col("w"), col("h"),
        Multimodal.decodeImage(col("payload")).as("d"))
      .select(col("name"),
        (col("d.format") === "webp" && col("d.width") === col("w") &&
          col("d.height") === col("h") && col("d.pixels").isNotNull)
          .as("ok"))
      .collect()
    assert(got.forall(_.getBoolean(1)), got.mkString(","))
  }

  test("hand-assembled minimal VP8L stream pins the bit conventions") {
    // 8x1, no transforms, no cache, no meta codes; green code is the
    // simple 2-symbol form (g0=0x55, g1=0xAA — canonical order makes
    // 0x55 code 0), red/blue/alpha/distance single-symbol (r=1, b=2,
    // a=0xFF, d=0); pixel bits select g0/g1 per pixel LSB-first.
    // Payload bit layout after the 5 fixed bytes (sig + 14+14+1+3):
    //   0 transform, 0 cache, 0 meta,
    //   green:  1 simple, 1 two-sym, 1 8-bit, 01010101(g0=0x55 LSB
    //   first), 8 bits g1=0xAA, then r/b/a/d codes: 1,0,1,<8 bits>
    //   each, then 8 selection bits.
    def assemble(sel: Int): Array[Byte] = {
      val bits = new scala.collection.mutable.ArrayBuffer[Int]
      def put(v: Int, n: Int): Unit =
        (0 until n).foreach(k => bits += ((v >> k) & 1))
      put(0, 1); put(0, 1); put(0, 1) // no transform / cache / meta
      put(1, 1); put(1, 1); put(1, 1); put(0x55, 8); put(0xAA, 8) // green
      for (v <- Seq(1, 2, 0xff, 0)) { // red, blue, alpha, distance
        put(1, 1); put(0, 1); put(1, 1); put(v, 8)
      }
      put(sel, 8)
      val payload = bits.grouped(8).map(g =>
        g.zipWithIndex.map { case (b, i) => b << i }.sum.toByte).toArray
      val hdr = Array[Byte](0x2f, 7, 0, 0, 0) // w-1=7, h-1=0, hint+ver 0
      val vp8l = hdr ++ payload
      val chunk = "VP8L".getBytes ++ le32(vp8l.length) ++ vp8l ++
        (if (vp8l.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
      val body = "WEBP".getBytes ++ chunk
      "RIFF".getBytes ++ le32(body.length) ++ body
    }
    def px(g: Int) = (0xff << 24) | (1 << 16) | (g << 8) | 2
    val (f, w, h, got) = decode(assemble(0xB1)) // 10110001 LSB-first
    assert((f, w, h) == (("webp", 8, 1)))
    // bit i of sel = 1 selects g1 (0xAA): canonical 2-symbol order is
    // by symbol value, 0x55 < 0xAA so 0x55 is code 0
    val sel = 0xB1
    assert(got == Seq.tabulate(8)(i =>
      if (((sel >> i) & 1) == 1) px(0xAA) else px(0x55)))
  }

  test("VP8X-wrapped VP8L decodes; lossy VP8 and corrupt streams are unknown") {
    val simple = resource("noise_small.webp")
    // re-wrap the VP8L chunk in an extended (VP8X) container
    val vp8lLen = le32v(simple, 16)
    val vp8l = simple.slice(12, 20 + vp8lLen + (vp8lLen & 1))
    val vp8x = "VP8X".getBytes ++ le32(10) ++
      Array[Byte](0, 0, 0, 0, 10, 0, 0, 6, 0, 0) // 11x7 canvas
    val body = "WEBP".getBytes ++ vp8x ++ vp8l
    val wrapped = "RIFF".getBytes ++ le32(body.length) ++ body
    val (f, w, h, px) = decode(wrapped)
    assert((f, w, h) == (("webp", 11, 7)) && px != null)
    // malformed lossy VP8 chunk (no sync code) -> unknown; valid
    // lossy streams decode via Vp8Decode (Vp8DecodeSpec)
    val lossyBody = "WEBP".getBytes ++ "VP8 ".getBytes ++ le32(4) ++
      Array[Byte](1, 2, 3, 4)
    assert(decode("RIFF".getBytes ++ le32(lossyBody.length) ++
      lossyBody)._1 == "unknown")
    // bad VP8L version bits -> unknown
    val badVer = simple.clone()
    badVer(24) = (badVer(24) | 0x20).toByte // version != 0
    assert(decode(badVer)._1 == "unknown")
    // truncations at every prefix never throw
    for (cut <- 1 until simple.length by 7)
      assert(decode(simple.take(cut))._1 == "unknown")
  }

  test("meta-group bomb: an entropy-image code beyond the cell count is rejected") {
    // 1x1 image whose meta bit is set and whose 1x1 entropy image
    // claims group 65535 — honoring it would eagerly build 65536
    // five-code groups from a tiny stream; the guard rejects codes
    // beyond the entropy-image cell count (a legit encoder references
    // at most one distinct group per cell)
    val bits = new scala.collection.mutable.ArrayBuffer[Int]
    def put(v: Int, n: Int): Unit =
      (0 until n).foreach(k => bits += ((v >> k) & 1))
    put(0, 1) // no transform
    put(0, 1) // no cache
    put(1, 1) // meta-prefix present
    put(0, 3) // huffman bits = 2
    // entropy image (1x1, no recursion/cache): its own stream —
    // no cache bit, then 5 simple codes; the green code's two symbols
    // set (red<<8)|green = 0xFFFF -> meta code 65535
    put(0, 1) // entropy image: no color cache
    // green: simple, 1 symbol, 8-bit = 255
    put(1, 1); put(0, 1); put(1, 1); put(255, 8)
    // red: simple, 1 symbol, 8-bit = 255
    put(1, 1); put(0, 1); put(1, 1); put(255, 8)
    // blue / alpha / distance: single symbol 0
    for (_ <- 1 to 3) { put(1, 1); put(0, 1); put(1, 1); put(0, 8) }
    // (the single entropy pixel then decodes with zero further bits)
    val payload = bits.grouped(8).map(g =>
      g.zipWithIndex.map { case (b, i) => b << i }.sum.toByte).toArray
    val vp8l = Array[Byte](0x2f, 0, 0, 0, 0) ++ payload // 1x1, ver 0
    val chunk = "VP8L".getBytes ++ le32(vp8l.length) ++ vp8l ++
      (if (vp8l.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val body = "WEBP".getBytes ++ chunk
    assert(decode("RIFF".getBytes ++ le32(body.length) ++ body)._1
      == "unknown")
  }

  test("decompression bomb: huge declared dimensions are rejected before allocation") {
    // 16384x16384 header (the VP8L maximum) = 268M pixels > the cap;
    // last byte 0x0f keeps alpha-hint and version bits zero so the
    // rejection is the bomb guard, not the version gate
    val hdr = Array[Byte](0x2f, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0x0f)
    val chunk = "VP8L".getBytes ++ le32(5) ++ hdr ++ Array[Byte](0)
    val body = "WEBP".getBytes ++ chunk
    assert(decode("RIFF".getBytes ++ le32(body.length) ++ body)._1
      == "unknown")
  }

  test("MediaBench's literal-only writer decodes exactly (full 8/9-bit codes)") {
    // the bench payload generator is a second, minimal spec-forward
    // writer: its pixels must come back exactly per its LCG recipe
    val size = 32
    val (f, w, h, px) = decode(graft.MediaBench.webpBytes(7L, size))
    assert((f, w, h) == (("webp", size, size)))
    var s = 7L * 6364136223846793005L + 1442695040888963407L
    val expected = Seq.fill(size * size) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val g = ((s >>> 24) & 0xff).toInt
      val r = ((s >>> 32) & 0xff).toInt
      val b = ((s >>> 40) & 0xff).toInt
      val a = ((s >>> 48) & 0xff).toInt
      (a << 24) | (r << 16) | (g << 8) | b
    }
    assert(px == expected)
  }

  test("random corruption of real streams never throws (decode or unknown)") {
    val rnd = new scala.util.Random(20260816)
    for (name <- Seq("noise_small", "tiles", "photoish", "two_color");
         _ <- 1 to 50) {
      val bytes = resource(s"$name.webp")
      val flip = 20 + rnd.nextInt(bytes.length - 20) // keep container
      bytes(flip) = (bytes(flip) ^ (1 << rnd.nextInt(8))).toByte
      val (f, _, _, _) = decode(bytes) // must not throw
      assert(f == "webp" || f == "unknown")
    }
  }

  private def le32(v: Int) = Array[Byte]((v & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 24) & 0xff).toByte)
  private def le32v(b: Array[Byte], i: Int) = (b(i) & 0xff) |
    ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) |
    ((b(i + 3) & 0xff) << 24)
}
