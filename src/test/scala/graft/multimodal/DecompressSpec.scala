package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[DecompressExpr]] against INDEPENDENT system implementations:
  * `src/test/resources/compress/` holds payloads compressed by python's
  * stdlib zlib/gzip/bz2/lzma and the distro libzstd/liblz4
  * (`tools/make_compress_fixtures.py`) — the expression must sniff the
  * codec and return the raw bytes exactly. Plus the gzip trailer
  * policy (verify intact, tolerate truncated), multi-member gzip,
  * snappy (no system lib: framed+raw roundtrip through the Spark-
  * shipped codec), the incremental bomb guard, and the never-throw
  * corpus policy under truncation and bit flips. */
class DecompressSpec extends SparkSpec {
  import spark.implicits._

  private def dec(bytes: Array[Byte], codec: String = "auto")
      : (String, Array[Byte]) = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.decompress(col("p"), codec).as("d"))
      .select("d.format", "d.data").head()
    (r.getString(0), if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))
  }

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/compress/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val manifest: Seq[(String, Seq[String])] =
    new String(resource("manifest.txt"), "UTF-8").linesIterator
      .filter(_.nonEmpty).map { l =>
        val p = l.split(" ").toSeq
        (p.head, p.tail)
      }.toSeq

  test("system-compressed fixtures decompress byte-exact with sniffed codecs") {
    for ((name, codecs) <- manifest; codec <- codecs) {
      val raw = resource(s"$name.raw")
      val enc = resource(s"$name.$codec")
      val (fmt, data) = codec match {
        case "deflate" => dec(enc, "deflate") // raw deflate has no magic
        case _ => dec(enc)
      }
      val wantFmt = if (codec == "gzip2") "gzip" else codec
      assert(fmt == wantFmt, s"$name.$codec sniffed as $fmt")
      assert(data != null && data.sameElements(raw), s"$name.$codec bytes")
    }
  }

  test("explicit codec argument overrides sniffing; mismatch is unknown") {
    val raw = resource("ascii.raw")
    assert(dec(resource("ascii.zstd"), "zstd")._2.sameElements(raw))
    assert(dec(resource("ascii.zstd"), "gzip")._1 == "unknown")
    assert(dec(resource("ascii.gzip"), "zstd")._1 == "unknown")
    assert(dec(raw)._1 == "unknown") // plain text: no codec magic
    assert(dec(resource("ascii.lz4"), "nope")._1 == "unknown")
  }

  test("snappy framed and raw roundtrip through the Spark-shipped codec") {
    val raw = resource("utf8.raw")
    val framed = {
      val bos = new java.io.ByteArrayOutputStream()
      val s = new org.xerial.snappy.SnappyFramedOutputStream(bos)
      s.write(raw); s.close()
      bos.toByteArray
    }
    val (f1, d1) = dec(framed)
    assert(f1 == "snappy" && d1.sameElements(raw))
    val (f2, d2) = dec(org.xerial.snappy.Snappy.compress(raw), "snappy-raw")
    assert(f2 == "snappy-raw" && d2.sameElements(raw))
  }

  test("zstd payloads led by a skippable frame sniff and decode") {
    // real .zst shards may open with a skippable frame (magic
    // 0x184D2A50-5F LE); the sniffer routes it to zstd and the codec
    // skips it per RFC 8878
    val raw = resource("ascii.raw")
    val skippable = Array[Byte](0x50, 0x2a, 0x4d, 0x18, // magic
      4, 0, 0, 0, // frame size 4
      1, 2, 3, 4) // skipped payload
    val (f, d) = dec(skippable ++ resource("ascii.zstd"))
    assert(f == "zstd" && d != null && d.sameElements(raw))
  }

  test("a skippable frame followed by an lz4 frame sniffs as lz4") {
    // magic 0x184D2A50..5F is SHARED by zstd and lz4: the payload's
    // identity is the first non-skippable frame, and lz4-java skips
    // leading skippable frames just like libzstd does
    val raw = resource("ascii.raw")
    val skippable = Array[Byte](0x5a, 0x2a, 0x4d, 0x18, // magic (..5A)
      4, 0, 0, 0, // frame size 4
      9, 9, 9, 9) // skipped payload
    val (f, d) = dec(skippable ++ resource("ascii.lz4"))
    assert(f == "lz4" && d != null && d.sameElements(raw))
    // two stacked skippable frames still resolve the real one behind
    val (f2, d2) = dec(skippable ++ skippable ++ resource("ascii.zstd"))
    assert(f2 == "zstd" && d2.sameElements(raw))
    // all-skippable and truncated-skippable payloads are unknown
    assert(dec(skippable)._1 == "unknown")
    assert(dec(skippable.take(6))._1 == "unknown")
  }

  test("zlib preset-dictionary (FDICT) streams are rejected, not misread") {
    // CMF=0x78 FLG=0x20: CM=8, FDICT set, FCHECK valid ((30720+32)%31
    // == 0) — undecodable without the external dictionary, so neither
    // the sniffer nor the explicit-codec gate may raw-inflate the
    // 4-byte DICTID as deflate data
    val body = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput("dict stream".getBytes); d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end(); bos.toByteArray
    }
    val withDict = Array[Byte](0x78, 0x20, 1, 2, 3, 4) ++ body
    assert(dec(withDict)._1 == "unknown") // sniff: not zlib
    assert(dec(withDict, "zlib")._1 == "unknown") // explicit: rejected
  }

  test("gzip trailer: intact is VERIFIED, truncated is tolerated") {
    val raw = resource("ascii.raw")
    val gz = resource("ascii.gzip")
    // flip a CRC byte in the intact trailer -> corruption -> unknown
    val badCrc = gz.clone()
    badCrc(gz.length - 6) = (badCrc(gz.length - 6) ^ 0x55).toByte
    assert(dec(badCrc)._1 == "unknown")
    // drop the trailer entirely -> tolerated, data intact
    val (f, d) = dec(gz.dropRight(8))
    assert(f == "gzip" && d.sameElements(raw))
    // but a cut INSIDE the deflate body is corruption
    assert(dec(gz.dropRight(20))._1 == "unknown")
  }

  test("decompression bomb: incremental cap, not the declared size") {
    // 80 MiB of zeros deflates to ~80 KiB; the 64 MiB output cap must
    // trip while reading, long before materializing the payload
    val big = new Array[Byte](80 << 20)
    val deflater = new java.util.zip.Deflater(6, true)
    deflater.setInput(big); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val bomb = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0,
      0, 0) ++ out.toByteArray
    assert(dec(bomb)._1 == "unknown")
  }

  test("truncation and bit-flips never throw (decompress or unknown)") {
    val rnd = new scala.util.Random(20260816)
    for (codec <- Seq("gzip", "zstd", "lz4", "bzip2", "xz", "zlib")) {
      val enc = resource(s"noise.$codec")
      for (cut <- 1 until enc.length by math.max(1, enc.length / 40))
        dec(enc.take(cut)) // must not throw
      for (_ <- 1 to 30) {
        val mut = enc.clone()
        val at = rnd.nextInt(mut.length)
        mut(at) = (mut(at) ^ (1 << rnd.nextInt(8))).toByte
        val (f, _) = dec(mut)
        assert(f == codec || f == "unknown")
      }
    }
  }

  test("whole-column decompress over mixed codecs") {
    val rows = manifest.flatMap { case (name, codecs) =>
      codecs.filter(c => c != "deflate" && c != "gzip2")
        .map(c => (s"$name.$c", resource(s"$name.$c"), resource(s"$name.raw")))
    }
    val got = rows.toDF("name", "payload", "raw")
      .select(col("name"),
        (col("raw") === Multimodal.decompress(col("payload"), "auto")("data"))
          .as("ok"))
      .collect()
    assert(got.forall(_.getBoolean(1)),
      got.filterNot(_.getBoolean(1)).map(_.getString(0)).mkString(","))
  }
}
