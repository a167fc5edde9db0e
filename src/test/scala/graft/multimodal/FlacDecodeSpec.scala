package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[FlacDecode]] against golden streams produced by an INDEPENDENT
  * reference encoder (tools/gen_flac_fixtures.py — a from-the-spec
  * Python implementation, cross-language so a shared misreading of
  * RFC 9639 cannot hide): every subframe type (constant / verbatim /
  * fixed / LPC), rice + rice2 with partitions and an escape partition,
  * all four channel assignments, wasted bits, multi-frame streams and
  * 8/16/24-bit depths. Corruption tests pin the CRC-8/CRC-16 gates. */
class FlacDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def decode(bytes: Array[Byte])
      : (String, Int, Int, Int, Int, Seq[Int]) = {
    val r = Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.decodeAudio(col("p")).as("a"))
      .select("a.format", "a.channels", "a.sample_rate", "a.bits",
        "a.n_samples", "a.samples").head()
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
      if (r.isNullAt(5)) null else r.getSeq[Int](5))
  }

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // (payload hex, expected interleaved samples, channels, rate, bits)
  private val fixtures: Seq[(String, Seq[Int], Int, Int, Int)] = Seq(
  // mono constant
  ("664c6143800000220010ffff00000000000001f400f00000000800000000000000000000000000000000fff87000000007bf00fffb7f03",
   Seq(-5, -5, -5, -5, -5, -5, -5, -5), 1, 8000, 16),
  // mono verbatim
  ("664c6143800000220010ffff0000000000000ac440f00000000800000000000000000000000000000000fff87000000007bf0200000001ffff7fff800004d2ef1f00635dee",
   Seq(0, 1, -1, 32767, -32768, 1234, -4321, 99), 1, 44100, 16),
  // mono fixed multi-frame
  ("664c6143800000220010ffff00000000000003e800f00000001000000000000000000000000000000000fff87000000007bf12000a00b766b46012cafff87000010007d4140014001200eb912d80c720",
   Seq(10, 11, 9, 12, 15, 14, 13, 20, 20, 18, 17, 19, 25, 30, 28, 26), 1, 16000, 16),
  // stereo independent
  ("664c6143800000220010ffff00000000000001f402f00000000800000000000000000000000000000000fff87010000007d802006400660065006300620067006900680200320031003300340030002f00350032a8f9",
   Seq(100, 50, 102, 49, 101, 51, 99, 52, 98, 48, 103, 47, 105, 53, 104, 50), 2, 8000, 16),
  // stereo left/side
  ("664c6143800000220010ffff00000000000001f402f00000000800000000000000000000000000000000fff870800000078e0200640066006500630062006700690068020019000d40064002f0019000e0006800366506",
   Seq(100, 50, 102, 49, 101, 51, 99, 52, 98, 48, 103, 47, 105, 53, 104, 50), 2, 8000, 16),
  // stereo side/right
  ("664c6143800000220010ffff00000000000001f402f00000000800000000000000000000000000000000fff87090000007e9020019000d40064002f0019000e0006800360200320031003300340030002f00350032580c",
   Seq(100, 50, 102, 49, 101, 51, 99, 52, 98, 48, 103, 47, 105, 53, 104, 50), 2, 8000, 16),
  // stereo mid/side
  ("664c6143800000220010ffff00000000000001f402f00000000800000000000000000000000000000000fff870a00000074002004b004b004c004b0049004b004f004d020019000d40064002f0019000e00068003690c2",
   Seq(100, 50, 102, 49, 101, 51, 99, 52, 98, 48, 103, 47, 105, 53, 104, 50), 2, 8000, 16),
  // mono lpc order2
  ("664c6143800000220010ffff000000000000056220f00000001000000000000000000000000000000000fff8700000000f87420064006ec5aee383001c565cc565cc5658a9b0",
   Seq(100, 110, 112, 111, 109, 103, 96, 90, 85, 82, 76, 70, 65, 62, 61, 57), 1, 22050, 16),
  // rice2 partitions with escape
  ("664c6143800000220010ffff00000000000001f400f00000002000000000000000000000000000000000fff8700000001ff7120000489294a529489294a5294a5f381020408102040925294a529480ec17",
   Seq(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31), 1, 8000, 16),
  // wasted bits
  ("664c6143800000220010ffff00000000000001f400f00000000800000000000000000000000000000000fff87000000007bf034001fff8003fff0005ffe8007ffe00e7d5",
   Seq(4, -8, 12, -16, 20, -24, 28, -32), 1, 8000, 16),
  // 8-bit verbatim
  ("664c6143800000220010ffff00000000000001f400700000000800000000000000000000000000000000fff87000000007bf020001ff7f802ad607e942",
   Seq(0, 1, -1, 127, -128, 42, -42, 7), 1, 8000, 8),
  // 24-bit fixed0
  ("664c6143800000220010ffff00000000000001f401700000000800000000000000000000000000000000fff87000000007bf1003f20000003fffffe00000003c481f6040f0000157f9e58400000209c8",
   Seq(0, 8388607, -8388608, 123456, -654321, 42, -99999, 1), 1, 8000, 24)
  )

  test("golden fixtures from the independent reference encoder decode exactly") {
    fixtures.zipWithIndex.foreach { case ((h, want, ch, rate, bits), i) =>
      val (f, gotCh, gotRate, gotBits, n, got) = decode(hex(h))
      assert(f == "flac", s"fixture $i")
      assert((gotCh, gotRate, gotBits) == (ch, rate, bits), s"fixture $i")
      assert(n == want.length / ch, s"fixture $i")
      assert(got == want, s"fixture $i")
    }
  }

  test("corruption: a flipped payload bit fails the CRC gates, never throws") {
    val clean = hex(fixtures(2)._1) // multi-frame fixed
    // flip one bit in every byte position, one at a time — the decode
    // must come back unknown or (for bits the format ignores) intact,
    // and must never throw
    for (i <- 0 until clean.length) {
      val bad = clean.clone(); bad(i) = (bad(i) ^ 0x10).toByte
      val f = decode(bad)._1
      assert(f == "flac" || f == "unknown", s"byte $i -> $f")
    }
    // a flipped SAMPLE bit specifically must be caught by CRC-16
    val frameBody = clean.length - 6
    val bad = clean.clone(); bad(frameBody) = (bad(frameBody) ^ 0x01).toByte
    assert(decode(bad)._1 == "unknown")
  }

  test("truncation at every byte boundary is unknown, never a throw") {
    val clean = hex(fixtures(0)._1)
    for (len <- 4 until clean.length)
      assert(decode(clean.take(len))._1 == "unknown", s"len $len")
  }
}
