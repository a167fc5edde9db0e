package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[BrotliDecode]] against the SYSTEM libbrotli (RFC 7932):
  * `src/test/resources/brotli/` holds a quality×window matrix of
  * payloads compressed by libbrotlienc via ctypes
  * (`tools/make_brotli_fixtures.py`) — quality 0-2 exercise the fast
  * paths (simple codes, uncompressed blocks), 5-9 the standard paths,
  * and 11 full context modeling + static-dictionary references. The
  * dump also carries transform ground truth: every Appendix B
  * transform applied to probe words (ASCII and multibyte) by
  * BrotliTransformDictionaryWord. Plus the incremental bomb guard,
  * the explicit-codec route through [[DecompressExpr]], and the
  * never-throw corpus policy under truncation and bit flips. */
class BrotliDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/brotli/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val manifest: Seq[(String, String)] =
    new String(resource("manifest.txt"), "UTF-8").linesIterator
      .filter(_.nonEmpty).map { l =>
        val p = l.split(" "); (p(0), p(1))
      }.toSeq

  test("libbrotlienc fixtures decode byte-exact across the quality/window matrix") {
    for ((enc, raw) <- manifest) {
      val want = resource(raw)
      val got = BrotliDecode.decode(resource(enc), 1L << 26)
      assert(got != null, s"$enc decoded to null")
      assert(got.sameElements(want),
        s"$enc: ${got.length} vs ${want.length} bytes")
    }
    assert(manifest.size >= 90) // the matrix must actually be there
  }

  test("every Appendix B transform matches BrotliTransformDictionaryWord") {
    val dst = new Array[Byte](128)
    var rows = 0
    for (l <- new String(resource("transform_probes.txt"), "UTF-8")
        .linesIterator if l.nonEmpty) {
      val p = l.split(" ")
      def unhex(s: String) = if (s.isEmpty) Array.empty[Byte]
        else s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      val word = unhex(p(0))
      val idx = p(1).toInt
      val want = unhex(if (p.length > 2) p(2) else "")
      val n = BrotliDecode.transformWord(word, 0, word.length, idx, dst)
      assert(java.util.Arrays.equals(dst.take(n), want),
        s"transform $idx on ${p(0)}")
      rows += 1
    }
    assert(rows == 121 * 5)
  }

  test("the transforms table matches the system library's triples") {
    val opName = Map(0 -> "ID", 10 -> "UF", 11 -> "UA") ++
      (1 to 9).map(n => n -> s"OL$n") ++
      (12 to 20).map(n => n -> s"OF${n - 11}")
    val rows = new String(resource("transforms.txt"), "UTF-8")
      .linesIterator.filter(_.nonEmpty).toSeq
    assert(rows.size == 121 && BrotliDecode.Transforms.length == 121)
    for (l <- rows) {
      val p = l.split(" ", -1)
      val i = p(0).toInt
      val (pre, op, suf) = BrotliDecode.Transforms(i)
      assert(pre.map("%02x".format(_)).mkString == p(1), s"prefix $i")
      assert(opName(op) == p(2), s"op $i")
      assert(suf.map("%02x".format(_)).mkString == p(3), s"suffix $i")
    }
  }

  test("bomb guard trips incrementally; malformed inputs return null") {
    val zeros = resource("zeros.q1w22.br") // decodes to 70,000 bytes
    assert(BrotliDecode.decode(zeros, 1L << 26) != null)
    assert(BrotliDecode.decode(zeros, 65536) == null) // over the cap
    assert(BrotliDecode.decode(Array.empty[Byte], 1L << 26) == null)
    assert(BrotliDecode.decode(Array[Byte](0x11, 0x22, 0x33), 1L << 26)
      == null || true) // any verdict, just must not throw
  }

  test("metadata meta-blocks: final is accepted, nonzero padding rejected") {
    // 0x1A = WBITS 16, ISLAST=1, MNIBBLES=0 metadata, skip 0 — the
    // reference returns SUCCESS with empty output (verified against
    // libbrotlidec), so a final metadata block is legal
    val last = BrotliDecode.decode(Array[Byte](0x1a), 1L << 26)
    assert(last != null && last.length == 0)
    // mid-stream metadata then last-empty block
    val mid = BrotliDecode.decode(Array[Byte](0x0c, 0x03), 1L << 26)
    assert(mid != null && mid.length == 0)
    // same stream with a nonzero bit in the byte-alignment padding:
    // the reference rejects ("corrupted padding bits"), so null here
    assert(BrotliDecode.decode(Array[Byte](0x8c.toByte, 0x03),
      1L << 26) == null)
  }

  test("truncation and bit flips never throw (decode or null)") {
    val rnd = new scala.util.Random(20260816)
    for (name <- Seq("english.q11w22.br", "rep.q5w22.br", "utf8.q1w22.br")) {
      val enc = resource(name)
      for (cut <- 1 until enc.length by math.max(1, enc.length / 50))
        BrotliDecode.decode(enc.take(cut), 1L << 26) // must not throw
      for (_ <- 1 to 60) {
        val mut = enc.clone()
        val at = rnd.nextInt(mut.length)
        mut(at) = (mut(at) ^ (1 << rnd.nextInt(8))).toByte
        BrotliDecode.decode(mut, 1L << 26) // must not throw
      }
    }
  }

  test("MediaBench's minimal writer round-trips through the decoder") {
    val enc = graft.MediaBench.brotliBytes(7L, 60000)
    val got = BrotliDecode.decode(enc, 1L << 26)
    assert(got != null && got.length == 60000)
    var s = 7L * 6364136223846793005L + 1442695040888963407L
    var k = 0
    while (k < 60000) {
      s = s * 6364136223846793005L + 1442695040888963407L
      assert(got(k) == ('a' + ((s >>> 33) & 3)).toByte, s"literal $k")
      k += 1
    }
  }

  test("decompress(payload, 'br') routes the Content-Encoding: br body") {
    val raw = resource("english.raw")
    val enc = resource("english.q11w22.br")
    val r = Seq(Tuple1(enc)).toDF("p")
      .select(Multimodal.decompress(col("p"), "br").as("d"))
      .select("d.format", "d.data").head()
    assert(r.getString(0) == "br")
    assert(r.getAs[Array[Byte]](1).sameElements(raw))
    // no magic exists: auto-sniff must NOT claim brotli
    val sniffed = Seq(Tuple1(enc)).toDF("p")
      .select(Multimodal.decompress(col("p"), "auto")("format")).head()
    assert(sniffed.getString(0) == "unknown")
  }
}
