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

  // header-path fixtures (generator --headers): natural block-size
  // codes (192 / 576<<n / 256<<n / 8-bit), explicit sample-rate codes
  // (table, 8-bit kHz, 16-bit Hz, 16-bit x10), explicit sample-size
  // code, and multi-byte UTF-8 frame numbers
  private val headerFixtures: Seq[(String, Seq[Int], Int, Int, Int)] = Seq(
  // bsCode 1 (192) x2 frames, utf8 frame number 201
  ("664c6143800000220010ffff00000000000001f400f00000018000000000000000000000000000000000fff81000002812ff80017aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d7406f18fff81000c389bc12ffa5017aebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d740b74a",
   Seq(-128, -115, -102, -89, -76, -63, -50, -37, -24, -11, 2, 15, 28, 41, 54, 67, 80, 93, 106, 119, -124, -111, -98, -85, -72, -59, -46, -33, -20, -7, 6, 19, 32, 45, 58, 71, 84, 97, 110, 123, -120, -107, -94, -81, -68, -55, -42, -29, -16, -3, 10, 23, 36, 49, 62, 75, 88, 101, 114, 127, -116, -103, -90, -77, -64, -51, -38, -25, -12, 1, 14, 27, 40, 53, 66, 79, 92, 105, 118, -125, -112, -99, -86, -73, -60, -47, -34, -21, -8, 5, 18, 31, 44, 57, 70, 83, 96, 109, 122, -121, -108, -95, -82, -69, -56, -43, -30, -17, -4, 9, 22, 35, 48, 61, 74, 87, 100, 113, 126, -117, -104, -91, -78, -65, -52, -39, -26, -13, 0, 13, 26, 39, 52, 65, 78, 91, 104, 117, -126, -113, -100, -87, -74, -61, -48, -35, -22, -9, 4, 17, 30, 43, 56, 69, 82, 95, 108, 121, -122, -109, -96, -83, -70, -57, -44, -31, -18, -5, 8, 21, 34, 47, 60, 73, 86, 99, 112, 125, -118, -105, -92, -79, -66, -53, -40, -27, -14, -1, 12, 25, 38, 51, -91, -78, -65, -52, -39, -26, -13, 0, 13, 26, 39, 52, 65, 78, 91, 104, 117, -126, -113, -100, -87, -74, -61, -48, -35, -22, -9, 4, 17, 30, 43, 56, 69, 82, 95, 108, 121, -122, -109, -96, -83, -70, -57, -44, -31, -18, -5, 8, 21, 34, 47, 60, 73, 86, 99, 112, 125, -118, -105, -92, -79, -66, -53, -40, -27, -14, -1, 12, 25, 38, 51, 64, 77, 90, 103, 116, -127, -114, -101, -88, -75, -62, -49, -36, -23, -10, 3, 16, 29, 42, 55, 68, 81, 94, 107, 120, -123, -110, -97, -84, -71, -58, -45, -32, -19, -6, 7, 20, 33, 46, 59, 72, 85, 98, 111, 124, -119, -106, -93, -80, -67, -54, -41, -28, -15, -2, 11, 24, 37, 50, 63, 76, 89, 102, 115, -128, -115, -102, -89, -76, -63, -50, -37, -24, -11, 2, 15, 28, 41, 54, 67, 80, 93, 106, 119, -124, -111, -98, -85, -72, -59, -46, -33, -20, -7, 6, 19, 32, 45, 58, 71, 84, 97, 110, 123, -120, -107, -94, -81, -68, -55, -42, -29, -16, -3, 10, 23, 36, 49, 62, 75, 88), 1, 8000, 16),
  // bsCode 2 (576), srCode 9 (44100) explicit, ssCode 4 (16)
  ("664c6143800000220010ffff0000000000000ac440f00000024000000000000000000000000000000000fff82908005b12ff80017aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebaeba00012f5d740655",
   Seq(-128, -115, -102, -89, -76, -63, -50, -37, -24, -11, 2, 15, 28, 41, 54, 67, 80, 93, 106, 119, -124, -111, -98, -85, -72, -59, -46, -33, -20, -7, 6, 19, 32, 45, 58, 71, 84, 97, 110, 123, -120, -107, -94, -81, -68, -55, -42, -29, -16, -3, 10, 23, 36, 49, 62, 75, 88, 101, 114, 127, -116, -103, -90, -77, -64, -51, -38, -25, -12, 1, 14, 27, 40, 53, 66, 79, 92, 105, 118, -125, -112, -99, -86, -73, -60, -47, -34, -21, -8, 5, 18, 31, 44, 57, 70, 83, 96, 109, 122, -121, -108, -95, -82, -69, -56, -43, -30, -17, -4, 9, 22, 35, 48, 61, 74, 87, 100, 113, 126, -117, -104, -91, -78, -65, -52, -39, -26, -13, 0, 13, 26, 39, 52, 65, 78, 91, 104, 117, -126, -113, -100, -87, -74, -61, -48, -35, -22, -9, 4, 17, 30, 43, 56, 69, 82, 95, 108, 121, -122, -109, -96, -83, -70, -57, -44, -31, -18, -5, 8, 21, 34, 47, 60, 73, 86, 99, 112, 125, -118, -105, -92, -79, -66, -53, -40, -27, -14, -1, 12, 25, 38, 51, 64, 77, 90, 103, 116, -127, -114, -101, -88, -75, -62, -49, -36, -23, -10, 3, 16, 29, 42, 55, 68, 81, 94, 107, 120, -123, -110, -97, -84, -71, -58, -45, -32, -19, -6, 7, 20, 33, 46, 59, 72, 85, 98, 111, 124, -119, -106, -93, -80, -67, -54, -41, -28, -15, -2, 11, 24, 37, 50, 63, 76, 89, 102, 115, -128, -115, -102, -89, -76, -63, -50, -37, -24, -11, 2, 15, 28, 41, 54, 67, 80, 93, 106, 119, -124, -111, -98, -85, -72, -59, -46, -33, -20, -7, 6, 19, 32, 45, 58, 71, 84, 97, 110, 123, -120, -107, -94, -81, -68, -55, -42, -29, -16, -3, 10, 23, 36, 49, 62, 75, 88, 101, 114, 127, -116, -103, -90, -77, -64, -51, -38, -25, -12, 1, 14, 27, 40, 53, 66, 79, 92, 105, 118, -125, -112, -99, -86, -73, -60, -47, -34, -21, -8, 5, 18, 31, 44, 57, 70, 83, 96, 109, 122, -121, -108, -95, -82, -69, -56, -43, -30, -17, -4, 9, 22, 35, 48, 61, 74, 87, 100, 113, 126, -117, -104, -91, -78, -65, -52, -39, -26, -13, 0, 13, 26, 39, 52, 65, 78, 91, 104, 117, -126, -113, -100, -87, -74, -61, -48, -35, -22, -9, 4, 17, 30, 43, 56, 69, 82, 95, 108, 121, -122, -109, -96, -83, -70, -57, -44, -31, -18, -5, 8, 21, 34, 47, 60, 73, 86, 99, 112, 125, -118, -105, -92, -79, -66, -53, -40, -27, -14, -1, 12, 25, 38, 51, 64, 77, 90, 103, 116, -127, -114, -101, -88, -75, -62, -49, -36, -23, -10, 3, 16, 29, 42, 55, 68, 81, 94, 107, 120, -123, -110, -97, -84, -71, -58, -45, -32, -19, -6, 7, 20, 33, 46, 59, 72, 85, 98, 111, 124, -119, -106, -93, -80, -67, -54, -41, -28, -15, -2, 11, 24, 37, 50, 63, 76, 89, 102, 115, -128, -115, -102, -89, -76, -63, -50, -37, -24, -11, 2, 15, 28, 41, 54, 67, 80, 93, 106, 119, -124, -111, -98, -85, -72, -59, -46, -33, -20, -7, 6, 19, 32, 45, 58, 71, 84, 97, 110, 123, -120, -107, -94, -81, -68, -55, -42, -29, -16, -3, 10, 23, 36, 49, 62, 75, 88, 101, 114, 127, -116, -103, -90, -77), 1, 44100, 16),
  // bsCode 8 (256), srCode 12 (8-bit kHz)
  ("664c6143800000220010ffff00000000000001f400f00000010000000000000000000000000000000000fff88c0000085e12ff80017aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaeba26ed",
   Seq(-128, -115, -102, -89, -76, -63, -50, -37, -24, -11, 2, 15, 28, 41, 54, 67, 80, 93, 106, 119, -124, -111, -98, -85, -72, -59, -46, -33, -20, -7, 6, 19, 32, 45, 58, 71, 84, 97, 110, 123, -120, -107, -94, -81, -68, -55, -42, -29, -16, -3, 10, 23, 36, 49, 62, 75, 88, 101, 114, 127, -116, -103, -90, -77, -64, -51, -38, -25, -12, 1, 14, 27, 40, 53, 66, 79, 92, 105, 118, -125, -112, -99, -86, -73, -60, -47, -34, -21, -8, 5, 18, 31, 44, 57, 70, 83, 96, 109, 122, -121, -108, -95, -82, -69, -56, -43, -30, -17, -4, 9, 22, 35, 48, 61, 74, 87, 100, 113, 126, -117, -104, -91, -78, -65, -52, -39, -26, -13, 0, 13, 26, 39, 52, 65, 78, 91, 104, 117, -126, -113, -100, -87, -74, -61, -48, -35, -22, -9, 4, 17, 30, 43, 56, 69, 82, 95, 108, 121, -122, -109, -96, -83, -70, -57, -44, -31, -18, -5, 8, 21, 34, 47, 60, 73, 86, 99, 112, 125, -118, -105, -92, -79, -66, -53, -40, -27, -14, -1, 12, 25, 38, 51, 64, 77, 90, 103, 116, -127, -114, -101, -88, -75, -62, -49, -36, -23, -10, 3, 16, 29, 42, 55, 68, 81, 94, 107, 120, -123, -110, -97, -84, -71, -58, -45, -32, -19, -6, 7, 20, 33, 46, 59, 72, 85, 98, 111, 124, -119, -106, -93, -80, -67, -54, -41, -28, -15, -2, 11, 24, 37, 50, 63, 76, 89, 102, 115), 1, 8000, 16),
  // bsCode 6 (8-bit size), srCode 13 (16-bit Hz)
  ("664c6143800000220010ffff000000000000030390f00000006400000000000000000000000000000000fff86d00006330392d12ff80017aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004ad52f",
   Seq(-128, -115, -102, -89, -76, -63, -50, -37, -24, -11, 2, 15, 28, 41, 54, 67, 80, 93, 106, 119, -124, -111, -98, -85, -72, -59, -46, -33, -20, -7, 6, 19, 32, 45, 58, 71, 84, 97, 110, 123, -120, -107, -94, -81, -68, -55, -42, -29, -16, -3, 10, 23, 36, 49, 62, 75, 88, 101, 114, 127, -116, -103, -90, -77, -64, -51, -38, -25, -12, 1, 14, 27, 40, 53, 66, 79, 92, 105, 118, -125, -112, -99, -86, -73, -60, -47, -34, -21, -8, 5, 18, 31, 44, 57, 70, 83, 96, 109, 122, -121), 1, 12345, 16),
  // srCode 14 (16-bit x10)
  ("664c6143800000220010ffff0000000000000ac440f0000000c000000000000000000000000000000000fff81e0000113ab012ff80017aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d7400025ebaebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebae80004bd75d75d75d75d75d75d75d75d75d000097aebaebaebaebaebaebaebaebaeba00012f5d75d75d75d75d75d740d44e",
   Seq(-128, -115, -102, -89, -76, -63, -50, -37, -24, -11, 2, 15, 28, 41, 54, 67, 80, 93, 106, 119, -124, -111, -98, -85, -72, -59, -46, -33, -20, -7, 6, 19, 32, 45, 58, 71, 84, 97, 110, 123, -120, -107, -94, -81, -68, -55, -42, -29, -16, -3, 10, 23, 36, 49, 62, 75, 88, 101, 114, 127, -116, -103, -90, -77, -64, -51, -38, -25, -12, 1, 14, 27, 40, 53, 66, 79, 92, 105, 118, -125, -112, -99, -86, -73, -60, -47, -34, -21, -8, 5, 18, 31, 44, 57, 70, 83, 96, 109, 122, -121, -108, -95, -82, -69, -56, -43, -30, -17, -4, 9, 22, 35, 48, 61, 74, 87, 100, 113, 126, -117, -104, -91, -78, -65, -52, -39, -26, -13, 0, 13, 26, 39, 52, 65, 78, 91, 104, 117, -126, -113, -100, -87, -74, -61, -48, -35, -22, -9, 4, 17, 30, 43, 56, 69, 82, 95, 108, 121, -122, -109, -96, -83, -70, -57, -44, -31, -18, -5, 8, 21, 34, 47, 60, 73, 86, 99, 112, 125, -118, -105, -92, -79, -66, -53, -40, -27, -14, -1, 12, 25, 38, 51), 1, 44100, 16)
  )

  // 32-bit extremes: the side channel needs 33 bits and the mid/side
  // reconstruction sum needs 33 — exact only because the decode
  // pipeline runs in Long (generator --wide)
  private val wideFixtures: Seq[(String, Seq[Int], Int, Int, Int)] = Seq(
  // 32-bit mid/side extremes
  ("664c6143800000220010ffff00000000000001f403f00000000800000000000000000000000000000000fff870a00000074002ffffffffffffffff7ffffffe80000000ffffffff000000003b9ac9fdc4653602027fffffffc0000000400000003ffffffff3b9aca00e2329affcee6b280b88ca6bfba47e",
   Seq(2147483647, -2147483648, -2147483648, 2147483647, 2147483647, 2147483646, -2147483648, -2147483647, 1000000000, -1000000001, -1000000000, 1000000001, 2000000000, -5, -2000000000, 5), 2, 8000, 32),
  // 32-bit left/side extremes
  ("664c6143800000220010ffff00000000000001f403f00000000800000000000000000000000000000000fff870800000078e027fffffff800000007fffffff800000003b9aca00c46536007735940088ca6c00027fffffffc0000000400000003ffffffff3b9aca00e2329affcee6b280b88ca6bfb47df",
   Seq(2147483647, -2147483648, -2147483648, 2147483647, 2147483647, 2147483646, -2147483648, -2147483647, 1000000000, -1000000001, -1000000000, 1000000001, 2000000000, -5, -2000000000, 5), 2, 8000, 32)
  )

  test("32-bit stereo decorrelation at int32 extremes decodes exactly") {
    wideFixtures.zipWithIndex.foreach { case ((h, want, ch, rate, bits), i) =>
      val (f, gotCh, gotRate, gotBits, n, got) = decode(hex(h))
      assert(f == "flac", s"wide fixture $i")
      assert((gotCh, gotRate, gotBits) == (ch, rate, bits), s"wide fixture $i")
      assert(n == want.length / ch && got == want, s"wide fixture $i")
    }
  }

  test("header paths: blocksize/rate/size codes and wide frame numbers decode exactly") {
    headerFixtures.zipWithIndex.foreach { case ((h, want, ch, rate, bits), i) =>
      val (f, gotCh, gotRate, gotBits, n, got) = decode(hex(h))
      assert(f == "flac", s"header fixture $i")
      assert((gotCh, gotRate, gotBits) == (ch, rate, bits), s"header fixture $i")
      assert(n == want.length / ch, s"header fixture $i")
      assert(got == want, s"header fixture $i")
    }
  }

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
