package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus-safety fuzz sweep across the WHOLE decode family: at 100 TB a
  * binary column contains every possible malformation, so every decode
  * expression must map arbitrary bytes to its unknown row — never throw,
  * never allocate past the bomb guard. Three adversarial classes:
  * pure random bytes, random bytes behind REAL format magics (so the
  * parsers walk deep before hitting garbage), and every proper prefix
  * of a small VALID payload per format (truncation at every byte
  * boundary — the classic parser-overread trigger). */
class FuzzSafetySpec extends SparkSpec {
  import spark.implicits._

  private val exprs: Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)] = Seq(
    ("image_decode", Multimodal.decodeImage),
    ("image_meta", Multimodal.imageMeta),
    ("audio_decode", Multimodal.decodeAudio),
    ("audio_meta", Multimodal.audioMeta),
    ("video_meta", Multimodal.videoMeta),
    ("exif_orientation", Multimodal.exifOrientation),
    ("gif_frame", c => Multimodal.gifFrame(c, lit(0))),
    ("video_frame", c => Multimodal.videoFrame(c, lit(0))),
    ("decompress", c => Multimodal.decompress(c)),
    ("warc_records", Multimodal.warcRecords),
    ("http_response", Multimodal.httpResponse),
    ("sitemap_entries", Multimodal.sitemapEntries),
    ("pdf_text", Multimodal.pdfText),
    ("pdf_meta", Multimodal.pdfMeta),
    ("zip_entries", Multimodal.zipEntries),
    ("office_text", Multimodal.officeText),
    ("media_tags", Multimodal.mediaTags),
    ("tar_entries", Multimodal.tarEntries),
    ("subtitle_cues", Multimodal.subtitleCues),
    ("email_message", Multimodal.emailMessage),
    ("mbox_messages", Multimodal.mboxMessages),
    ("feed_entries", Multimodal.feedEntries))

  private def sweep(payloads: Seq[Array[Byte]], label: String): Unit = {
    val df = payloads.map(Tuple1(_)).toDF("p")
    exprs.foreach { case (name, fn) =>
      // collect() forces full evaluation of every row; any throw from
      // the expression fails the spark job and thus the assertion
      val n = df.select(fn(col("p")).as("r")).collect().length
      assert(n == payloads.length, s"$label: $name dropped rows")
    }
  }

  test("random bytes never throw in any decode expression") {
    val rnd = new scala.util.Random(42)
    val payloads = Seq.tabulate(200) { i =>
      val len = rnd.nextInt(300)
      val b = new Array[Byte](len); rnd.nextBytes(b); b
    }
    sweep(payloads, "random")
  }

  test("random bytes behind real format magics never throw") {
    val rnd = new scala.util.Random(43)
    val magics = Seq[Array[Byte]](
      Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      Array('B', 'M'),
      Array('G', 'I', 'F', '8', '9', 'a'),
      Array(0xff.toByte, 0xd8.toByte, 0xff.toByte), // JPEG SOI
      Array('I', 'I', 42, 0), Array('M', 'M', 0, 42), // TIFF
      "RIFF....WAVE".getBytes, "RIFF....WEBP".getBytes,
      "RIFF....AVI ".getBytes,
      Array(0x1f, 0x8b.toByte, 8), // gzip
      Array(0x28, 0xb5.toByte, 0x2f, 0xfd.toByte), // zstd
      Array(0x53, 0x2a, 0x4d, 0x18), // zstd skippable frame
      Array(0x04, 0x22, 0x4d, 0x18), // lz4 frame
      "BZh9".getBytes, Array(0xfd.toByte, '7', 'z', 'X', 'Z', 0), // xz
      Array[Byte](0x78, 0x9c.toByte), // zlib
      "WARC/1.0\r\n".getBytes, "HTTP/1.1 200 OK\r\n".getBytes,
      ".snd".getBytes, "FORM....AIFF".getBytes, "fLaC".getBytes,
      "OggS".getBytes, "P6\n".getBytes, "P5 ".getBytes,
      Array(0, 0, 0, 0x14, 'f', 't', 'y', 'p'), // BMFF
      Array[Byte](0, 0, 1, 0, 1, 0), // ICO directory
      Array(0x1a, 0x45, 0xdf.toByte, 0xa3.toByte), // Matroska EBML
      Array('I', 'D', '3'), Array(0xff.toByte, 0xfb.toByte), // MP3
      "%PDF-1.4\n".getBytes, // PDF header
      Array[Byte]('P', 'K', 3, 4), // ZIP local header
      Array[Byte]('P', 'K', 5, 6), // ZIP EOCD
      "WEBVTT\n".getBytes, // WebVTT header
      "From x@y Thu Jan  1 00:00:00 2024\n".getBytes, // mbox separator
      "From: a@b\nTo: c@d\n\n".getBytes) // RFC 5322 header block
    val payloads = for (m <- magics; _ <- 0 until 12) yield {
      val tail = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(tail)
      m ++ tail
    }
    sweep(payloads, "magic+garbage")
  }

  test("every truncation of a valid payload per format never throws") {
    // small VALID payloads (the oracle-query synthesis shapes), then
    // every proper prefix of each
    def hex(s: String) = s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val valid = Seq(
      // 2x2 BMP (q_image_resize shape)
      hex("424D46000000000000003600000028000000020000000200000001001800" +
        "0000000010000000000000000000000000000000000000000000" +
        "0102030405060000" + "0708090A0B0C0000"),
      // mono 16-bit WAV, 2 samples
      hex("52494646" + "28000000" + "57415645" + "666D7420" + "10000000" +
        "0100" + "0100" + "401F0000" + "803E0000" + "0200" + "1000" +
        "64617461" + "04000000" + "11223344"),
      // minimal mp4 ftyp+moov shell (q_video_meta shape, no trak)
      hex("000000146674797069736F6D0000000069736F6D" +
        "0000007C6D6F6F760000006C6D766864" + "00" * 100),
      // 1-frame GIF, 2x2, 2-entry palette
      hex("474946383961" + "02000200" + "80" + "00" + "00" +
        "000000" + "FFFFFF" +
        "2C" + "00000000" + "02000200" + "00" +
        "02" + "02" + "4C01" + "00" + "3B"),
      // 8x1 WebP VP8L (q_webp_decode shape, doc_id=0 instance)
      hex("52494646" + "1C000000" + "57454250" + "5650384C" +
        "0F000000" + "2F" + "07000000" +
        "380060010AD0FF020000" + "00"),
      // lossy VP8 keyframe (q_webp_lossy's flat_16x16_q75 fixture)
      hex("5249464634000000574542505650382028000000B001009D012A1000" +
        "100002003425A00274BA0005D400009BFFC439D0E74397FEFEB6BDB78" +
        "6140000"),
      // animated WebP (q_webp_anim's 2-frame VP8 animation)
      hex("52494646C800000057454250565038580A000000020000001000001E" +
        "0000414E494D06000000000000000000414E4D464000000000000000" +
        "00000F00000F0000280000005650382028000000B001009D012A1000" +
        "100002003425A00274BA0005D400009BFFC439D0E74397FEFEB6BDB7" +
        "86140000414E4D46540000000000000000000F00000F000028000000" +
        "565038203C000000F001009D012A1000100002C04C25B00274010F0C" +
        "12F2E44000FEF9527D589C0276F91644594E47952BFDAE2A6D5FB0FF" +
        "FD310DAFEEDB7E6084000000"),
      // 2-frame 2x2 APNG (round-14 acTL/fcTL/fdAT route; the
      // q_apng_frames doc_id=0 shape)
      hex("89504E470D0A1A0A0000000D4948445200000002000000020802000000" +
        "00000000000000086163544C0000000200000000000000000000001A66" +
        "63544C0000000000000002000000020000000000000000000100640000" +
        "0000000000000015494441547801010E00F1FF00001D3A0D2A47001A37" +
        "54274461000000000000001A6663544C00000001000000020000000200" +
        "0000000000000000010000000000000000000000196664415400000002" +
        "7801010E00F1FF0034516E415E7B004E6B885B78950000000000000000" +
        "49454E4400000000"),
      // 1x1 ICO with a headerless-BMP entry (round-14 favicon route)
      hex("000001000100" + "01010000" + "0100" + "1800" +
        "30000000" + "16000000" +
        "28000000" + "01000000" + "02000000" + "0100" + "1800" +
        "00000000" * 6 + "09090900" + "00000000"),
      // AVIF (round-14 BMFF image route: ftyp + meta/pitm/iprp/ipco
      // with two ispe properties + the ipma association table)
      hex("000000146674797061766966000000006D696631000000766D65746100" +
        "0000000000000E7069746D0000000000010000005C697072700000003C" +
        "6970636F000000146973706500000000000000A00000005A0000001469" +
        "7370650000000000000500000002D00000000C61763143810000000000" +
        "001869706D6100000000000000020001010200020101"),
      // transparent lossy WebP (q_webp_alpha's alphagrad_16x16_q75:
      // VP8X + compressed-alpha ALPH + VP8)
      hex("524946468A00000057454250565038580A000000100000000F00000F" +
        "0000414C504824000000017F20104852D81F788588481DCC0240A310" +
        "4B2CB1C4124B2CB1CC607F44FF0394D3DD5F5650382040000000D001" +
        "009D012A1000100002003425B0027400D8BC90C8C000C749A4A60F62" +
        "7C8E30007EF8065F59FFD3606FFF86937EFF35590EC47FF8C4F2EB8F" +
        "F02E85E00000"),
      // one-page text PDF, classic xref (round-14 pdf_text route)
      hex("255044462D312E340A312030206F626A0A3C3C2F547970652F436174" +
        "616C6F672F50616765732032203020523E3E0A656E646F626A0A3220" +
        "30206F626A0A3C3C2F547970652F50616765732F4B6964735B332030" +
        "20525D2F436F756E7420313E3E0A656E646F626A0A332030206F626A" +
        "0A3C3C2F547970652F506167652F506172656E742032203020522F43" +
        "6F6E74656E74732034203020522F5265736F75726365733C3C2F466F" +
        "6E743C3C2F46312035203020523E3E3E3E3E3E0A656E646F626A0A34" +
        "2030206F626A0A3C3C2F4C656E6774682033353E3E73747265616D0A" +
        "4254202F4631203920546620352035205464202846757A7A206D652E" +
        "2920546A2045540A656E6473747265616D0A656E646F626A0A352030" +
        "206F626A0A3C3C2F547970652F466F6E742F537562747970652F5479" +
        "7065312F42617365466F6E742F48656C7665746963613E3E0A656E64" +
        "6F626A0A787265660A3020360A303030303030303030302036353533" +
        "352066200A30303030303030303039203030303030206E200A303030" +
        "30303030303534203030303030206E200A3030303030303031303520" +
        "3030303030206E200A30303030303030313935203030303030206E20" +
        "0A30303030303030323737203030303030206E200A747261696C6572" +
        "0A3C3C2F53697A6520362F526F6F742031203020523E3E0A73746172" +
        "74787265660A3334300A2525454F46"))
    val payloads = valid.flatMap(v => (0 until v.length).map(v.take))
    sweep(payloads, "truncation")
  }
}
