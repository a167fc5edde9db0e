package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.operators.{DataSplit, GlobalRank, SequencePacking, Similarity, TextAnalysis, TextDedup}
import graft.multimodal.Multimodal
import Q._

/** Splits, sampling, packing, layout, multimodal plumbing — md5/
  * group/stratified splits, DSIR resampling, temperature mixtures,
  * domain caps, Z-order layout, sequence packing with loss masks, and
  * the curation pipeline DAG.
  */
object SamplingPackQueries {

  /** Fixed-width one-page PDF shell as a hex column (q_pdf_*): the
    * classic-xref file layout is constant, so every offset in the
    * embedded xref table is byte-exact; the only variable parts are
    * fixed-length — the header's version digit, the 40-byte text the
    * content stream shows as a hex string via Tj, and the 24-byte
    * Info /Title. Assembled from the same object syntax as
    * tools/make_pdf_fixtures.py; the sanitizer keeps the ASCII subset
    * that StandardEncoding maps to itself (no quote characters —
    * 0x27/0x60 are quoteright/quoteleft in Annex D). */
  private[queries] def pdfShellHex(docId: org.apache.spark.sql.Column,
      content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val txt = rpad(regexp_replace(substring(content, 1, 60),
      "[^a-zA-Z0-9 .,]", ""), 40, ".")
    val title = rpad(regexp_replace(substring(content, 1, 30),
      "[^a-zA-Z0-9 .,]", ""), 24, "t")
    val ver = lpad(hex(pmod(docId, lit(8)) + 48), 2, "0")
    // the shown text rides as a <hex string> inside the content
    // stream, so the payload embeds the hex CHARACTERS — hex(hex(.));
    // the /Title rides as a literal string — raw bytes, hex(.) once
    concat(lit(PdfShell1), ver, lit(PdfShell2), hex(hex(txt)), lit(PdfShell3),
      hex(title), lit(PdfShell4))
  }

  // "%PDF-1." — the version digit follows
  private val PdfShell1 = "255044462D312E"
  // objects 1-3 (catalog, pages, page) + object 4's dict and the
  // content-stream prefix up to the '<' of the shown hex string
  private val PdfShell2 =
    "0A312030206F626A0A3C3C202F54797065202F436174616C6F67202F5061676573203220302052203E3E0A656E646F626A0A" +
    "322030206F626A0A3C3C202F54797065202F5061676573202F4B696473205B33203020525D202F436F756E742031203E3E0A" +
    "656E646F626A0A332030206F626A0A3C3C202F54797065202F50616765202F506172656E74203220302052202F436F6E7465" +
    "6E7473203420302052202F5265736F7572636573203C3C202F466F6E74203C3C202F4631203520302052203E3E203E3E203E" +
    "3E0A656E646F626A0A342030206F626A0A3C3C202F4C656E67746820313131203E3E0A73747265616D0A4254202F46312031" +
    "3220546620373220373230205464203C"
  // "> Tj ET\nendstream", object 5 (font), object 6's "/Title (" prefix
  private val PdfShell3 =
    "3E20546A2045540A656E6473747265616D0A656E646F626A0A352030206F626A0A3C3C202F54797065202F466F6E74202F53" +
    "756274797065202F5479706531202F42617365466F6E74202F48656C766574696361203E3E0A656E646F626A0A362030206F" +
    "626A0A3C3C202F5469746C652028"
  // ") /Producer (graft) >>", the xref table with burnt-in offsets,
  // trailer, startxref, %%EOF
  private val PdfShell4 =
    "29202F50726F64756365722028677261667429203E3E0A656E646F626A0A787265660A3020370A3030303030303030303020" +
    "36353533352066200A30303030303030303039203030303030206E200A30303030303030303538203030303030206E200A30" +
    "303030303030313135203030303030206E200A30303030303030323137203030303030206E200A3030303030303033373920" +
    "3030303030206E200A30303030303030343439203030303030206E200A747261696C65720A3C3C202F53697A652037202F52" +
    "6F6F74203120302052202F496E666F203620302052203E3E0A7374617274787265660A3532320A2525454F460A"

  // V4/R4 crypt-filter shell for q_pdf_decrypt (generated alongside
  // tools/make_pdf_crypt_fixtures.py): /StmF /Identity keeps the
  // varying content clear; /O //U/Title are the real RC4 handler
  // outputs for the empty user password, owner password "owner",
  // /ID 000102..0f
  private val PdfEncShellPre =
    "255044462D312E360A312030206F626A0A3C3C202F54797065202F436174616C6F67202F5061676573203220302052203E3E" +
    "0A656E646F626A0A322030206F626A0A3C3C202F54797065202F5061676573202F4B696473205B33203020525D202F436F75" +
    "6E742031203E3E0A656E646F626A0A332030206F626A0A3C3C202F54797065202F50616765202F506172656E742032203020" +
    "52202F436F6E74656E7473203420302052202F5265736F7572636573203C3C202F466F6E74203C3C202F4631203520302052" +
    "203E3E203E3E203E3E0A656E646F626A0A342030206F626A0A3C3C202F4C656E67746820313131203E3E0A73747265616D0A" +
    "4254202F463120313220546620373220373230205464203C"
  private val PdfEncShellPost =
    "3E20546A2045540A656E6473747265616D0A656E646F626A0A352030206F626A0A3C3C202F54797065202F466F6E74202F53" +
    "756274797065202F5479706531202F42617365466F6E74202F48656C766574696361203E3E0A656E646F626A0A362030206F" +
    "626A0A3C3C202F5469746C65203C3631383432623865616539653163336133303966333232313E203E3E0A656E646F626A0A" +
    "372030206F626A0A3C3C202F46696C746572202F5374616E64617264202F562034202F522034202F4C656E67746820313238" +
    "202F4346203C3C202F5374644346203C3C202F43464D202F5632202F4C656E677468203136203E3E203E3E202F53746D4620" +
    "2F4964656E74697479202F53747246202F5374644346202F4F203C3536366661383733656533336337393763643362393034" +
    "66646164663831346166613334646639613338663665643431623938346532633664613261613666353E202F55203C323338" +
    "3439643839366632326665626435646233356263636431333930653933303030303030303030303030303030303030303030" +
    "30303030303030303030303E202F50202D3434203E3E0A656E646F626A0A787265660A3020380A3030303030303030303020" +
    "36353533352066200A30303030303030303039203030303030206E200A30303030303030303538203030303030206E200A30" +
    "303030303030313135203030303030206E200A30303030303030323137203030303030206E200A3030303030303033373920" +
    "3030303030206E200A30303030303030343439203030303030206E200A30303030303030353034203030303030206E200A74" +
    "7261696C65720A3C3C202F53697A652038202F526F6F74203120302052202F496E666F203620302052202F456E6372797074" +
    "203720302052202F4944205B3C30303031303230333034303530363037303830393061306230633064306530663E203C3030" +
    "3031303230333034303530363037303830393061306230633064306530663E5D203E3E0A7374617274787265660A3738340A" +
    "2525454F460A"

  // One-entry stored docx shell for q_office_text / q_zip_entries:
  // local header up to CRC (L1), the rest of the local header + name
  // (L2), the document.xml around its 40-char text (XmlPre/Post),
  // central header up to CRC (C1), the rest + EOCD (C2); the CRC is
  // computed in-query and spliced at both sites
  private val DocxZipL1 = "504B030414000000000000000000"
  private val DocxZipL2 =
    "940000009400000011000000776F72642F646F63756D656E742E786D6C"
  private val DocxXmlPre =
    "3C3F786D6C2076657273696F6E3D22312E30223F3E3C773A646F63756D656E7420786D6C6E733A773D2278223E3C773A626F" +
    "64793E3C773A703E3C773A723E3C773A743E"
  private val DocxXmlPost =
    "3C2F773A743E3C2F773A723E3C2F773A703E3C2F773A626F64793E3C2F773A646F63756D656E743E"
  private val DocxZipC1 = "504B0102140014000000000000000000"
  private val DocxZipC2 =
    "9400000094000000110000000000000000000000000000000000776F72642F646F63756D656E742E786D6C504B0506000000" +
    "00010001003F000000C30000000000"

  // The constant 512-byte ustar header for q_tar_entries (python
  // tarfile output: name doc.txt, size 40, mtime 0, valid checksum)
  private val TarDocHeader =
    "646F632E74787400000000000000000000000000000000000000000000000000000000000000000000000000000000000000" +
    "0000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000" +
    "3030303036343400303030303030300030303030303030003030303030303030303530003030303030303030303030003030" +
    "3732343600203000000000000000000000000000000000000000000000000000000000000000000000000000000000000000" +
    "0000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000" +
    "0000000000000075737461720030300000000000000000000000000000000000000000000000000000000000000000000000" +
    "0000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000" +
    "0000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000" +
    "0000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000" +
    "0000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000" +
    "000000000000000000000000"

  val defs: Seq[QueryDef] = Seq(


    // ---- multimodal plumbing ----

    // Binary payload + metadata + batched decode stub. The stub decoder
    // is deterministic (FakeCodec: float32 accumulation of payload
    // bytes), so even the feature value is oracled — DuckDB replays the
    // same IEEE single-precision adds in the same order via REAL casts;
    // the corpus is ASCII so payload bytes == code points == length.
    QueryDef("q_multimodal", (s, dir) => {
      val media = Multimodal.withFakeMedia(t(s, dir, "documents"))
      Multimodal.decodeFeatures(s, media)
        .toDF()
        .select(col("doc_id"), col("mediaType").as("media_type"),
          col("nBytes").as("n_bytes"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
    }, Some("""
      WITH cs AS (
        SELECT doc_id, text,
          list_transform(generate_series(1, length(text)),
            i -> unicode(text[i])) AS codes
        FROM documents)
      SELECT doc_id,
        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
          ELSE 'video' END AS media_type,
        CAST(length(text) AS BIGINT) AS n_bytes,
        ROUND(CAST(list_reduce(
          list_prepend(CAST(0 AS REAL),
            list_transform(list_filter(generate_series(1, len(codes)),
                i -> (i - 1) % 8 = 0),
              i -> CAST(codes[i] AS REAL) / CAST(255 AS REAL))),
          (a, x) -> CAST(a + x AS REAL)) AS DOUBLE), 4) AS f0
      FROM cs""")),


    QueryDef("q_multimodal_meta", (s, dir) => {
      Multimodal.withFakeMedia(t(s, dir, "documents"))
        .select(col("doc_id"),
          col("meta.mediaType").as("media_type"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.nBytes").as("n_bytes"))
    }, Some("""
      SELECT doc_id,
        ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
        CAST(doc_id % 4 AS INT) * 160 + 320 AS width,
        CAST(doc_id % 4 AS INT) * 90 + 180 AS height,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents""")),


    // REAL image metadata extraction (ImageMetaExpr): per doc a minimal
    // VALID png/jpeg/gif/bmp payload is synthesized from doc_id with
    // pure builtins (hex/lpad/unhex byte building — big- and
    // little-endian as each container demands, the JPEG variant with an
    // APP1 segment BEFORE the SOF so the marker walk is exercised), and
    // the expression parses format + dimensions back out of the BYTES.
    // The oracle computes the expected values from doc_id arithmetic —
    // a parse-inverts-synthesis end-to-end value check. Pixel decode is
    // also real now (q_image_decode below); this is the header pass.
    QueryDef("q_image_meta", (s, dir) => {
      def be16(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
      def be32(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
      def le16(c: org.apache.spark.sql.Column) =
        concat(substring(be16(c), 3, 2), substring(be16(c), 1, 2))
      def le32(c: org.apache.spark.sql.Column) =
        concat(substring(be32(c), 7, 2), substring(be32(c), 5, 2),
          substring(be32(c), 3, 2), substring(be32(c), 1, 2))
      val w = (col("doc_id") % 13 * 16 + 320).cast("int")
      val h = (col("doc_id") % 7 * 32 + 180).cast("int")
      val pngHex = concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        be32(w), be32(h))
      val jpegHex = concat(lit("FFD8" + "FFE1" + "0008" + "457869660000" +
        "FFC0" + "000B" + "08"), be16(h), be16(w), lit("0000"))
      val gifHex = concat(lit("474946383961"), le16(w), le16(h))
      val bmpHex = concat(lit("424D" + "0" * 32), le32(w), le32(h))
      val payload = unhex(
        when(col("doc_id") % 4 === 0, pngHex)
          .when(col("doc_id") % 4 === 1, jpegHex)
          .when(col("doc_id") % 4 === 2, gifHex)
          .otherwise(bmpHex))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.imageMeta(payload).as("m"))
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.width").as("width"), col("m.height").as("height"))
    }, Some("""
      SELECT doc_id,
        ['png','jpeg','gif','bmp'][CAST(doc_id % 4 AS INT) + 1] AS format,
        CAST(doc_id % 13 * 16 + 320 AS INT) AS width,
        CAST(doc_id % 7 * 32 + 180 AS INT) AS height
      FROM documents""")),


    // TIFF raster decode (round-11 ImageDecodeExpr surface): evens a
    // little-endian uncompressed 2x2 RGB TIFF (9-entry IFD, the
    // BitsPerSample triple stored OUT-of-line — count*size > 4 — so the
    // offset-vs-inline rule is exercised), odds a big-endian PACKBITS
    // gray 2x2 (one literal run). Pixels carry the q_image_decode v()
    // arithmetic; the oracle replays them.
    QueryDef("q_tiff_decode", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def v(i: Int, c: Int) = pmod(col("doc_id") * 7 + i * 13 + c * 29,
        lit(256)).cast("int")
      def rgb(i: Int) = concat(hx(v(i, 0)), hx(v(i, 1)), hx(v(i, 2)))
      val tiffRgb = concat(
        lit("49492A00" + "08000000" + "0900" +
          "00010300" + "01000000" + "02000000" +
          "01010300" + "01000000" + "02000000" +
          "02010300" + "03000000" + "7A000000" + // bps -> offset 122
          "03010300" + "01000000" + "01000000" +
          "06010300" + "01000000" + "02000000" +
          "11010400" + "01000000" + "80000000" + // strip at 128
          "15010300" + "01000000" + "03000000" +
          "16010300" + "01000000" + "02000000" +
          "17010400" + "01000000" + "0C000000" +
          "00000000" + "080008000800"),
        rgb(0), rgb(1), rgb(2), rgb(3))
      val tiffGray = concat(
        lit("4D4D002A" + "00000008" + "0009" +
          "01000003" + "00000001" + "00020000" +
          "01010003" + "00000001" + "00020000" +
          "01020003" + "00000001" + "00080000" +
          "01030003" + "00000001" + "80050000" + // PackBits
          "01060003" + "00000001" + "00010000" +
          "01110004" + "00000001" + "0000007A" + // strip at 122
          "01150003" + "00000001" + "00010000" +
          "01160003" + "00000001" + "00020000" +
          "01170004" + "00000001" + "00000005" +
          "00000000" + "03"), // literal run of 4
        hx(v(0, 0)), hx(v(1, 0)), hx(v(2, 0)), hx(v(3, 0)))
      val payload = unhex(
        when(col("doc_id") % 2 === 0, tiffRgb).otherwise(tiffGray))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.decodeImage(payload).as("d"))
        .select(col("doc_id"), col("d.format").as("format"),
          col("d.width").as("width"), col("d.height").as("height"),
          element_at(col("d.pixels"), 1).as("p0"),
          element_at(col("d.pixels"), 4).as("p3"))
    }, Some("""
      SELECT doc_id, 'tiff' AS format, 2 AS width, 2 AS height,
        """ + Seq(0, 3).map(i =>
          s"""CAST(CASE WHEN doc_id % 2 = 0 THEN
              (doc_id*7 + $i*13) % 256 * 65536
              + (doc_id*7 + $i*13 + 29) % 256 * 256
              + (doc_id*7 + $i*13 + 58) % 256
            ELSE (doc_id*7 + $i*13) % 256 * 65793 END
            - 16777216 AS INTEGER) AS p${if (i == 0) 0 else 3}""")
          .mkString(",\n        ") + """
      FROM documents""")),

    // TIFF Deflate + horizontal-differencing predictor (round-11
    // ImageDecodeExpr surfaces): a little-endian gray 4x2 TIFF whose
    // strip is a STORED-deflate zlib block (the q_image_decode trick)
    // of the DIFFERENCED bytes d(i) = (doc_id*5 + i*19) % 256, with
    // predictor tag 317 = 2 — so the decoder must run the per-row
    // cumulative sum mod 256 (TIFF 6.0 §14), which the oracle replays
    // literally. LZW strips are proven against the JDK encoder in
    // ImageDecodeSpec (no SQL-expressible LZW synthesis exists).
    QueryDef("q_tiff_predictor", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def dv(i: Int) = pmod(col("doc_id") * 5 + i * 19, lit(256)).cast("int")
      val tiffHex = concat(
        lit("49492A00" + "08000000" + "0A00" +
          "00010300" + "01000000" + "04000000" +
          "01010300" + "01000000" + "02000000" +
          "02010300" + "01000000" + "08000000" +
          "03010300" + "01000000" + "08000000" + // Deflate
          "06010300" + "01000000" + "01000000" +
          "11010400" + "01000000" + "86000000" + // strip at 134
          "15010300" + "01000000" + "01000000" +
          "16010300" + "01000000" + "02000000" +
          "17010400" + "01000000" + "0F000000" + // 15 strip bytes
          "3D010300" + "01000000" + "02000000" + // predictor 2
          "00000000" +
          "7801" + "01" + "0800" + "F7FF"), // zlib STORED, len 8
        hx(dv(0)), hx(dv(1)), hx(dv(2)), hx(dv(3)),
        hx(dv(4)), hx(dv(5)), hx(dv(6)), hx(dv(7)),
        // 4 trailing junk bytes OUTSIDE the declared strip: the strip
        // count stops at the stored data so the inflater never parses
        // a zlib trailer (the q_image_decode IDAT discipline)
        lit("00000000"))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.decodeImage(unhex(tiffHex)).as("d"))
        .select(col("doc_id"), col("d.format").as("format"),
          col("d.width").as("width"), col("d.height").as("height"),
          element_at(col("d.pixels"), 1).as("p0"),
          element_at(col("d.pixels"), 4).as("p3"),
          element_at(col("d.pixels"), 5).as("p4"),
          element_at(col("d.pixels"), 8).as("p7"))
    }, Some {
      def d(i: Int) = s"(doc_id*5 + $i*19) % 256"
      def cum(is: Seq[Int]) = is.map(d).mkString("(", " + ", ") % 256")
      def px(name: String, g: String) =
        s"CAST(($g) * 65793 - 16777216 AS INTEGER) AS $name"
      s"""
      SELECT doc_id, 'tiff' AS format, 4 AS width, 2 AS height,
        ${px("p0", d(0))},
        ${px("p3", cum(0 to 3))},
        ${px("p4", d(4))},
        ${px("p7", cum(4 to 7))}
      FROM documents"""
    }),

    // WebP + TIFF metadata (round-11 ImageMetaExpr surfaces): all three
    // public WebP first-chunk layouts — lossy VP8 (sync 9D012A + 14-bit
    // dims), lossless VP8L (0x2F + LSB-packed w-1/h-1), extended VP8X
    // (24-bit LE canvas) — and TIFF 6.0 IFD0 tag-256/257 dims in BOTH
    // byte orders. Dims from the q_image_meta arithmetic; the oracle
    // replays them.
    QueryDef("q_image_meta_ext", (s, dir) => {
      def be16h(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
      def le16h(c: org.apache.spark.sql.Column) =
        concat(substring(be16h(c), 3, 2), substring(be16h(c), 1, 2))
      def hx1(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      val w = (col("doc_id") % 13 * 16 + 320).cast("int")
      val h = (col("doc_id") % 7 * 32 + 180).cast("int")
      val wm = w - 1; val hm = h - 1
      val vp8 = concat(
        lit("52494646" + "24000000" + "57454250" + "56503820" +
          "10000000" + "000000" + "9D012A"), le16h(w), le16h(h))
      val vp8l = concat(
        lit("52494646" + "20000000" + "57454250" + "5650384C" +
          "0C000000" + "2F"),
        hx1(pmod(wm, lit(256))),
        hx1(shiftright(wm, 8) + pmod(hm, lit(4)) * 64),
        hx1(pmod(shiftright(hm, 2), lit(256))),
        hx1(shiftright(hm, 10)),
        lit("0000000000")) // pad to the 30-byte sniff minimum
      val vp8x = concat(
        lit("52494646" + "20000000" + "57454250" + "56503858" +
          "0A000000" + "00000000"),
        hx1(pmod(wm, lit(256))), hx1(shiftright(wm, 8)), lit("00"),
        hx1(pmod(hm, lit(256))), hx1(shiftright(hm, 8)), lit("00"))
      val tiffIi = concat(
        lit("49492A00" + "08000000" + "0200" +
          "00010300" + "01000000"), le16h(w), lit("0000" +
          "01010300" + "01000000"), le16h(h), lit("0000" + "00000000"))
      val tiffMm = concat(
        lit("4D4D002A" + "00000008" + "0002" +
          "01000003" + "00000001"), be16h(w), lit("0000" +
          "01010003" + "00000001"), be16h(h), lit("0000" + "00000000"))
      val payload = unhex(
        when(col("doc_id") % 5 === 0, vp8)
          .when(col("doc_id") % 5 === 1, vp8l)
          .when(col("doc_id") % 5 === 2, vp8x)
          .when(col("doc_id") % 5 === 3, tiffIi)
          .otherwise(tiffMm))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.imageMeta(payload).as("m"))
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.width").as("width"), col("m.height").as("height"))
    }, Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 5 <= 2 THEN 'webp' ELSE 'tiff' END AS format,
        CAST(doc_id % 13 * 16 + 320 AS INT) AS width,
        CAST(doc_id % 7 * 32 + 180 AS INT) AS height
      FROM documents""")),

    // AVIF/HEIC metadata (round-14 ImageMetaExpr BMFF route — the
    // modern web's fastest-growing image formats): per doc an
    // ISO/IEC 23008-12 HEIF payload built from hex builtins — ftyp
    // brand (avif / heic / mif1-with-avif-compat), meta/pitm/iprp/
    // ipco with TWO ispe properties (a fixed 160x90 thumbnail and the
    // parametric primary), the primary resolved through the ipma
    // association chain on two shapes and through the max-over-ispe
    // fallback (no ipma) on the third. Dims from the q_image_meta
    // arithmetic; the oracle replays them. Pixel decode stays out of
    // scope (AV1/HEVC inter-prediction — the documented boundary).
    QueryDef("q_image_meta_bmff", (s, dir) => {
      def be32h(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
      val w = (col("doc_id") % 13 * 16 + 320).cast("int")
      val h = (col("doc_id") % 7 * 32 + 180).cast("int")
      val ispeThumb = "00000014" + "69737065" + "00000000" +
        "000000A0" + "0000005A" // 160x90
      def ispeMain = concat(lit("00000014" + "69737065" + "00000000"),
        be32h(w), be32h(h))
      // pitm item 1 -> ipma association -> property 2 (the primary)
      val pitm = "0000000E" + "7069746D" + "00000000" + "0001"
      val ipma = "00000014" + "69706D61" + "00000000" + "00000001" +
        "0001" + "01" + "02"
      def metaChain = concat(
        lit("00000066" + "6D657461" + "00000000" + pitm +
          "0000004C" + "69707270" + "00000030" + "6970636F" + ispeThumb),
        ispeMain, lit(ipma))
      def metaFallback = concat( // no pitm/ipma: MAX over ispe
        lit("00000044" + "6D657461" + "00000000" +
          "00000038" + "69707270" + "00000030" + "6970636F" + ispeThumb),
        ispeMain)
      def ftyp(major: String, compat: String) =
        "00000014" + "66747970" + major + "00000000" + compat
      val avif = concat(lit(ftyp("61766966", "6D696631")), metaChain)
      val heic = concat(lit(ftyp("68656963", "6D696631")), metaChain)
      val mif = concat(lit(ftyp("6D696631", "61766966")), metaFallback)
      val payload = unhex(
        when(col("doc_id") % 3 === 0, avif)
          .when(col("doc_id") % 3 === 1, heic)
          .otherwise(mif))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.imageMeta(payload).as("m"))
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.width").as("width"), col("m.height").as("height"))
    }, Some("""
      SELECT doc_id,
        CASE CAST(doc_id % 3 AS INT) WHEN 1 THEN 'heic' ELSE 'avif' END
          AS format,
        CAST(doc_id % 13 * 16 + 320 AS INT) AS width,
        CAST(doc_id % 7 * 32 + 180 AS INT) AS height
      FROM documents""")),

    // REAL pixel decode (ImageDecodeExpr): per doc a complete VALID
    // 2x2 image is synthesized from doc_id with pure builtins — evens
    // get a 24bpp bottom-up BMP (padded stride), odds a PNG whose IDAT
    // is a STORED-deflate zlib block (so the pixel bytes are
    // byte-addressable from SQL; the decoder's inflate handles it like
    // any compressed stream) — and the expression decodes the exact
    // packed-ARGB pixel values back out. The oracle recomputes each
    // pixel int from the same doc_id arithmetic: decode-inverts-
    // synthesis, value-exact, both container layouts + the zlib path
    // covered. Pixel byte formula: v(i,c) = (doc_id*7 + i*13 + c*29) %
    // 256 for pixel i (row-major), channel c (0=R,1=G,2=B).
    QueryDef("q_image_decode", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def v(i: Int, c: Int) = pmod(col("doc_id") * 7 + i * 13 + c * 29,
        lit(256)).cast("int")
      // one pixel as RGB hex (png scanline order) / BGR hex (bmp order)
      def rgb(i: Int) = concat(hx(v(i, 0)), hx(v(i, 1)), hx(v(i, 2)))
      def bgr(i: Int) = concat(hx(v(i, 2)), hx(v(i, 1)), hx(v(i, 0)))
      // BMP: 54-byte header, 2x2 @24bpp, 6-byte rows padded to 8,
      // bottom-up (pixels 2,3 = row y=1 stored first)
      val bmpHex = concat(
        lit("424D" + "46000000" + "00000000" + "36000000" + // file header
          "28000000" + "02000000" + "02000000" + "0100" + "1800" +
          "00000000" + "10000000" + "00000000" + "00000000" +
          "00000000" + "00000000"),
        bgr(2), bgr(3), lit("0000"), bgr(0), bgr(1), lit("0000"))
      // PNG: IHDR(2x2, depth 8, color 2) + IDAT carrying one STORED
      // zlib block of the 14 raw scanline bytes (2 rows x (filter 0 +
      // 6 px bytes)); chunk CRCs and the Adler trailer are dummies —
      // the decoder is documented to tolerate both
      val pngHex = concat(
        lit("89504E470D0A1A0A" + "0000000D" + "49484452" +
          "00000002" + "00000002" + "08" + "02" + "000000" + "00000000" +
          "00000015" + "49444154" + "7801" + "01" + "0E00" + "F1FF" + "00"),
        rgb(0), rgb(1), lit("00"), rgb(2), rgb(3),
        lit("00000000" + "00000000" + "49454E44" + "00000000"))
      val payload = unhex(
        when(col("doc_id") % 2 === 0, bmpHex).otherwise(pngHex))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.decodeImage(payload).as("d"))
        .select(col("doc_id"), col("d.format").as("format"),
          col("d.width").as("width"), col("d.height").as("height"),
          element_at(col("d.pixels"), 1).as("p0"),
          element_at(col("d.pixels"), 2).as("p1"),
          element_at(col("d.pixels"), 3).as("p2"),
          element_at(col("d.pixels"), 4).as("p3"))
    }, Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format,
        2 AS width, 2 AS height,
        """ + (0 to 3).map(i =>
          s"""CAST((doc_id*7 + $i*13) % 256 * 65536
            + (doc_id*7 + $i*13 + 29) % 256 * 256
            + (doc_id*7 + $i*13 + 58) % 256
            - 16777216 AS INTEGER) AS p$i""").mkString(",\n        ") + """
      FROM documents""")),

    // ICO favicon decode (round-14 ImageDecodeExpr route — web corpora
    // are saturated with favicons): evens a TWO-entry ICO (a 1x1
    // zero-pixel loser, then the 2x2 24bpp winner whose headerless BMP
    // carries the q_image_decode XOR arithmetic and an AND mask that
    // blanks display pixel 0 — largest-entry selection AND mask
    // transparency both oracled), odds a single entry wrapping the
    // stored-deflate 2x2 PNG stream verbatim. Oracle replays pixels
    // from the shared v(i,c) arithmetic; even p0 is the transparent 0.
    QueryDef("q_ico_decode", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def v(i: Int, c: Int) = pmod(col("doc_id") * 7 + i * 13 + c * 29,
        lit(256)).cast("int")
      def rgb(i: Int) = concat(hx(v(i, 0)), hx(v(i, 1)), hx(v(i, 2)))
      def bgr(i: Int) = concat(hx(v(i, 2)), hx(v(i, 1)), hx(v(i, 0)))
      def dib(w: Int, h2: Int) = "28000000" +
        s"0${w}000000" + s"0${h2}000000" + "0100" + "1800" +
        "00000000" * 6
      // dir(38) + bmp1(48) @38 + bmp2(64) @86
      val icoBmpHex = concat(
        lit("00000100" + "0200" +
          "01010000" + "0100" + "1800" + "30000000" + "26000000" +
          "02020000" + "0100" + "1800" + "40000000" + "56000000" +
          dib(1, 2) + "00000000" + "00000000" + // 1x1 xor + and
          dib(2, 4)),
        bgr(2), bgr(3), lit("0000"), bgr(0), bgr(1), lit("0000" +
          "00000000" + "80000000")) // and: row1 opaque, (0,0) masked
      // dir(22) + the q_image_decode stored-deflate PNG (78 B) @22
      val icoPngHex = concat(
        lit("00000100" + "0100" +
          "02020000" + "0100" + "2000" + "4E000000" + "16000000" +
          "89504E470D0A1A0A" + "0000000D" + "49484452" +
          "00000002" + "00000002" + "08" + "02" + "000000" + "00000000" +
          "00000015" + "49444154" + "7801" + "01" + "0E00" + "F1FF" + "00"),
        rgb(0), rgb(1), lit("00"), rgb(2), rgb(3),
        lit("00000000" + "00000000" + "49454E44" + "00000000"))
      val payload = unhex(
        when(col("doc_id") % 2 === 0, icoBmpHex).otherwise(icoPngHex))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.decodeImage(payload).as("d"))
        .select(col("doc_id"), col("d.format").as("format"),
          col("d.width").as("width"), col("d.height").as("height"),
          element_at(col("d.pixels"), 1).as("p0"),
          element_at(col("d.pixels"), 2).as("p1"),
          element_at(col("d.pixels"), 3).as("p2"),
          element_at(col("d.pixels"), 4).as("p3"))
    }, Some("""
      SELECT doc_id, 'ico' AS format, 2 AS width, 2 AS height,
        CASE WHEN doc_id % 2 = 0 THEN 0 ELSE
          CAST((doc_id*7) % 256 * 65536 + (doc_id*7 + 29) % 256 * 256
            + (doc_id*7 + 58) % 256 - 16777216 AS INTEGER) END AS p0,
        """ + (1 to 3).map(i =>
          s"""CAST((doc_id*7 + $i*13) % 256 * 65536
            + (doc_id*7 + $i*13 + 29) % 256 * 256
            + (doc_id*7 + $i*13 + 58) % 256
            - 16777216 AS INTEGER) AS p$i""").mkString(",\n        ") + """
      FROM documents""")),

    // APNG frame sampling (round-14 VideoFrameExpr route — the
    // acTL/fcTL/fdAT symmetry of q_gif_frames/q_webp_anim): per doc a
    // TWO-frame 2x2 APNG — frame 0 carried by the IDAT (its fcTL
    // precedes it), frame 1 by an fdAT chunk, both STORED-deflate zlib
    // blocks of the shared v(i,c) scanline arithmetic (frame 1 uses
    // pixel indices 4..7). Both frames are sampled and every pixel is
    // replayed by the oracle.
    QueryDef("q_apng_frames", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def v(i: Int, c: Int) = pmod(col("doc_id") * 7 + i * 13 + c * 29,
        lit(256)).cast("int")
      def rgb(i: Int) = concat(hx(v(i, 0)), hx(v(i, 1)), hx(v(i, 2)))
      def be16h(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
      def stored(base: Int) = concat(
        lit("7801" + "01" + "0E00" + "F1FF" + "00"),
        rgb(base), rgb(base + 1), lit("00"), rgb(base + 2), rgb(base + 3))
      def fctl(seqHex: String, num: org.apache.spark.sql.Column,
          denHex: String) = concat(
        lit("0000001A" + "6663544C" + seqHex +
          "00000002" + "00000002" + "00000000" + "00000000"),
        be16h(num), lit(denHex + "0000" + "00000000"))
      val apngHex = concat(
        lit("89504E470D0A1A0A" +
          "0000000D" + "49484452" + "00000002" + "00000002" +
          "08" + "02" + "000000" + "00000000" +
          "00000008" + "6163544C" + "00000002" + "00000000" + "00000000"),
        fctl("00000000", pmod(col("doc_id"), lit(20)) + 1, "0064"),
        lit("00000015" + "49444154"), stored(0), lit("00000000"),
        fctl("00000001", pmod(col("doc_id"), lit(7)) + 1, "0000"),
        lit("00000019" + "66644154" + "00000002"), stored(4),
        lit("00000000" + "00000000" + "49454E44" + "00000000"))
      val payload = unhex(apngHex)
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.videoFrame(payload, lit(0)).as("f0"),
          Multimodal.videoFrame(payload, lit(1)).as("f1"))
        .select(col("doc_id"), col("f0.format").as("format"),
          col("f0.width").as("width"), col("f0.height").as("height"),
          col("f0.frames").as("frames"),
          element_at(col("f0.pixels"), 1).as("a0"),
          element_at(col("f0.pixels"), 4).as("a3"),
          element_at(col("f1.pixels"), 1).as("b0"),
          element_at(col("f1.pixels"), 4).as("b3"))
    }, Some("""
      SELECT doc_id, 'apng' AS format, 2 AS width, 2 AS height,
        2 AS frames,
        """ + Seq(("a0", 0), ("a3", 3), ("b0", 4), ("b3", 7)).map {
          case (name, i) =>
            s"""CAST((doc_id*7 + $i*13) % 256 * 65536
              + (doc_id*7 + $i*13 + 29) % 256 * 256
              + (doc_id*7 + $i*13 + 58) % 256
              - 16777216 AS INTEGER) AS $name""" }.mkString(",\n        ") + """
      FROM documents""")),

    // APNG metadata (the q_video_meta duration-row symmetry): the
    // q_apng_frames payload through video_meta — duration = the sum
    // of fcTL delays, frame 1 pinning the zero-denominator-means-100
    // rule; canvas from IHDR; tracks = 1.
    QueryDef("q_video_meta_apng", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def v(i: Int, c: Int) = pmod(col("doc_id") * 7 + i * 13 + c * 29,
        lit(256)).cast("int")
      def rgb(i: Int) = concat(hx(v(i, 0)), hx(v(i, 1)), hx(v(i, 2)))
      def be16h(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
      def stored(base: Int) = concat(
        lit("7801" + "01" + "0E00" + "F1FF" + "00"),
        rgb(base), rgb(base + 1), lit("00"), rgb(base + 2), rgb(base + 3))
      def fctl(seqHex: String, num: org.apache.spark.sql.Column,
          denHex: String) = concat(
        lit("0000001A" + "6663544C" + seqHex +
          "00000002" + "00000002" + "00000000" + "00000000"),
        be16h(num), lit(denHex + "0000" + "00000000"))
      val apngHex = concat(
        lit("89504E470D0A1A0A" +
          "0000000D" + "49484452" + "00000002" + "00000002" +
          "08" + "02" + "000000" + "00000000" +
          "00000008" + "6163544C" + "00000002" + "00000000" + "00000000"),
        fctl("00000000", pmod(col("doc_id"), lit(20)) + 1, "0064"),
        lit("00000015" + "49444154"), stored(0), lit("00000000"),
        fctl("00000001", pmod(col("doc_id"), lit(7)) + 1, "0000"),
        lit("00000019" + "66644154" + "00000002"), stored(4),
        lit("00000000" + "00000000" + "49454E44" + "00000000"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.videoMeta(unhex(apngHex)).as("m"))
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.duration_ms").as("duration_ms"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.tracks").as("tracks"))
    }, Some("""
      SELECT doc_id, 'apng' AS format,
        CAST((doc_id % 20 + 1) * 10 + (doc_id % 7 + 1) * 10 AS BIGINT)
          AS duration_ms,
        2 AS width, 2 AS height, 1 AS tracks
      FROM documents""")),

    // REAL nearest-neighbor resize over decoded pixels
    // (Multimodal.resizeDecoded — pure Catalyst sequence/transform/
    // element_at, no UDF): the q_image_decode payloads are decoded,
    // upsampled 2x2 -> 4x4 and downsampled -> 1x1, and EVERY output
    // pixel is replayed by the oracle from the synthesis arithmetic
    // (out(x,y) samples src(x*sw/tw, y*sh/th)). Pixel arrays compare
    // as comma-joined strings (the q_agg_array convention).
    QueryDef("q_image_resize", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def v(i: Int, c: Int) = pmod(col("doc_id") * 7 + i * 13 + c * 29,
        lit(256)).cast("int")
      def bgr(i: Int) = concat(hx(v(i, 2)), hx(v(i, 1)), hx(v(i, 0)))
      val bmpHex = concat(
        lit("424D" + "46000000" + "00000000" + "36000000" +
          "28000000" + "02000000" + "02000000" + "0100" + "1800" +
          "00000000" + "10000000" + "00000000" + "00000000" +
          "00000000" + "00000000"),
        bgr(2), bgr(3), lit("0000"), bgr(0), bgr(1), lit("0000"))
      val d = Multimodal.decodeImage(unhex(bmpHex))
      val up = Multimodal.resizeDecoded(d, 4, 4)
      val down = Multimodal.resizeDecoded(d, 1, 1)
      fanOut(t(s, dir, "documents")) // per-row decode+resize (§2.5 guard)
        .select(col("doc_id"), up.as("u"), down.as("d1"))
        .select(col("doc_id"),
          col("u.width").as("width"), col("u.height").as("height"),
          concat_ws(",", col("u.pixels").cast("array<string>")).as("px4"),
          element_at(col("d1.pixels"), 1).as("p1"))
    }, Some("""
      SELECT doc_id, 4 AS width, 4 AS height,
        ARRAY_TO_STRING(list_transform(generate_series(0, 15), j ->
          CAST(CAST(
            (doc_id*7 + (((j // 4) // 2) * 2 + ((j % 4) // 2)) * 13) % 256 * 65536
            + (doc_id*7 + (((j // 4) // 2) * 2 + ((j % 4) // 2)) * 13 + 29) % 256 * 256
            + (doc_id*7 + (((j // 4) // 2) * 2 + ((j % 4) // 2)) * 13 + 58) % 256
            - 16777216 AS INTEGER) AS VARCHAR)), ',') AS px4,
        CAST((doc_id*7) % 256 * 65536 + (doc_id*7 + 29) % 256 * 256
          + (doc_id*7 + 58) % 256 - 16777216 AS INTEGER) AS p1
      FROM documents""")),

    // REAL audio metadata (AudioMetaExpr): evens an MP3 of
    // 3 + doc_id%5 CBR frames (128 kbps / 44.1 kHz stereo, 417-byte
    // frames of zero payload — the walker reads only headers) behind an
    // ID3v2 tag of doc_id%8 syncsafe bytes; odds a 16-bit stereo 8 kHz
    // WAV whose data length makes duration_ms = doc_id%50 + 1 exactly.
    // Oracle replays the frame-count and byte-rate arithmetic.
    QueryDef("q_audio_meta", (s, dir) => {
      def hx1(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def le32h(c: org.apache.spark.sql.Column) = {
        val hh = lpad(hex(c), 8, "0")
        concat(substring(hh, 7, 2), substring(hh, 5, 2),
          substring(hh, 3, 2), substring(hh, 1, 2))
      }
      val frameHex = "FFFB9000" + "00" * 413 // 417-byte 128k/44.1k frame
      val id3Sz = pmod(col("doc_id"), lit(8)).cast("int")
      val mp3Hex = concat(
        lit("494433" + "0400" + "00" + "000000"), hx1(id3Sz),
        expr("repeat('00', cast(doc_id % 8 as int))"),
        expr(s"repeat('$frameHex', cast(doc_id % 5 + 3 as int))"))
      val dataLen = ((pmod(col("doc_id"), lit(50)) + 1) * 32).cast("int")
      val wavHex = concat(
        lit("52494646"), le32h(dataLen + 36), lit("57415645" +
          "666D7420" + "10000000" + "0100" + "0200" +
          "401F0000" + "007D0000" + "0400" + "1000" + "64617461"),
        le32h(dataLen), expr("repeat('00', cast((doc_id % 50 + 1) * 32 as int))"))
      val payload = unhex(
        when(col("doc_id") % 2 === 0, mp3Hex).otherwise(wavHex))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.audioMeta(payload).as("m"))
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.channels").as("channels"),
          col("m.sample_rate").as("sample_rate"),
          col("m.duration_ms").as("duration_ms"),
          col("m.bitrate_kbps").as("bitrate_kbps"),
          col("m.frames").as("frames"))
    }, Some("""
      SELECT doc_id,
        CASE WHEN doc_id % 2 = 0 THEN 'mp3' ELSE 'wav' END AS format,
        2 AS channels,
        CAST(CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 8000 END AS INT)
          AS sample_rate,
        CAST(CASE WHEN doc_id % 2 = 0
          THEN FLOOR((doc_id % 5 + 3) * 1152 * 1000 / 44100.0)
          ELSE doc_id % 50 + 1 END AS BIGINT) AS duration_ms,
        CAST(CASE WHEN doc_id % 2 = 0 THEN 128 ELSE 256 END AS INT)
          AS bitrate_kbps,
        CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 5 + 3 ELSE -1 END
          AS INT) AS frames
      FROM documents""")),

    // MJPEG video frame sampling (VideoFrameExpr): a 2-frame AVI whose
    // '00dc' chunks carry the q_jpeg_decode grayscale DC-only JPEGs
    // (142 bytes each, container sizes constant, only the scan byte
    // varies) — frame 1 is selected and its flat gray replayed by the
    // oracle through the same pinned IDCT arithmetic:
    //   gray = clamp(128 + floor((dc*17 + 4)/8)), dc = 16+(doc_id*5)%16
    QueryDef("q_video_frames", (s, dir) => {
      def hx1(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      val dc0 = (pmod(col("doc_id"), lit(16)) + 16).cast("int")
      val dc1 = (pmod(col("doc_id") * 5, lit(16)) + 16).cast("int")
      def sb(dc: org.apache.spark.sql.Column) = hx1(lit(128) + dc * 2)
      val gp = "FFD8" + "FFDB0043" + "00" + "11" * 64 +
        "FFC0000B08" + "0008" + "0008" + "01" + "011100" +
        "FFC40015" + "00" + "0101" + "00" * 14 + "0005" +
        "FFC40014" + "10" + "01" + "00" * 15 + "00" +
        "FFDA000801" + "0100" + "003F00" // 139 bytes; +scan+EOI = 142
      val aviHex = concat(
        lit("52494646" + "88010000" + "41564920" + // RIFF 392 'AVI '
          "4C495354" + "44000000" + "6864726C" + // LIST 68 'hdrl'
          "61766968" + "38000000" + "00" * 56 + // avih stub (56 B)
          "4C495354" + "30010000" + "6D6F7669" + // LIST 304 'movi'
          "30306463" + "8E000000" + gp), sb(dc0), lit("FFD9" +
          "30306463" + "8E000000" + gp), sb(dc1), lit("FFD9"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.videoFrame(unhex(aviHex), lit(1)).as("f"))
        .select(col("doc_id"), col("f.format").as("format"),
          col("f.width").as("width"), col("f.height").as("height"),
          col("f.frames").as("frames"),
          element_at(col("f.pixels"), 1).as("p0"),
          element_at(col("f.pixels"), 64).as("p63"))
    }, Some("""
      WITH g AS (
        SELECT doc_id,
          LEAST(255, GREATEST(0, 128 + CAST(
            FLOOR(((16 + (doc_id*5) % 16) * 17 + 4) / 8.0) AS INT))) AS v
        FROM documents)
      SELECT doc_id, 'mjpeg' AS format, 8 AS width, 8 AS height,
        2 AS frames,
        CAST(v * 65793 - 16777216 AS INTEGER) AS p0,
        CAST(v * 65793 - 16777216 AS INTEGER) AS p63
      FROM g""")),

    // Column-level payload decompression (round-12 DecompressExpr —
    // the WARC/WET ingestion primitive): per doc the text
    // 'wet-record-<doc_id>' is wrapped by doc_id % 4 in one of four
    // REAL container layouts built from stored/raw blocks so the
    // whole payload is constructible in pure column arithmetic:
    // zlib stored-deflate (dummy Adler — tolerated like PNG IDAT),
    // gzip stored-deflate with a truncated trailer (tolerated; the
    // corpus-tail policy), a zstd single-segment raw-block frame
    // (RFC 8878), an lz4 frame with one uncompressed block
    // (FLG 0x60/BD 0x40, header checksum 0x82 = xxh32 of the
    // descriptor, verified against liblz4 output), and — round-13 —
    // a brotli stream (RFC 7932: WBITS-16 fast path, one
    // uncompressed meta-block with 4-nibble MLEN, ISLASTEMPTY
    // terminator 0x03) through the explicit 'br' codec route, since
    // brotli carries no magic to sniff. The oracle replays
    // format + text directly.
    QueryDef("q_decompress_text", (s, dir) => {
      def hx2(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def le16h(c: org.apache.spark.sql.Column) = {
        val hh = lpad(hex(c), 4, "0")
        concat(substring(hh, 3, 2), substring(hh, 1, 2))
      }
      val txt = concat(lit("wet-record-"), col("doc_id"))
      val dataHex = hex(txt.cast("binary"))
      val len = length(txt)
      val stored = concat(lit("01"), le16h(len), le16h(lit(65535) - len),
        dataHex)
      val zlibHex = concat(lit("7801"), stored, lit("00000000"))
      val gzipHex = concat(lit("1F8B08" + "00" * 7), stored)
      val zstdHex = concat(lit("28B52FFD" + "20"), hx2(len),
        hx2(pmod(len * 8 + 1, lit(256))),
        hx2(floor((len * 8 + 1) / 256).cast("int")), lit("00"), dataHex)
      val lz4Hex = concat(lit("04224D18" + "6040" + "82"),
        hx2(len), lit("000080"), dataHex, lit("00000000"))
      // brotli, bits LSB-first with M = MLEN-1: byte0 = wbits-16 '0',
      // ISLAST 0, MNIBBLES 00, M low nibble; byte1 = M>>4; byte2 =
      // M>>12 | ISUNCOMPRESSED<<4; then raw bytes; then 0x03 (ISLAST
      // + ISLASTEMPTY)
      val m1 = len - 1
      val brHex = concat(hx2(pmod(m1, lit(16)) * 16),
        hx2(pmod(floor(m1 / 16).cast("int"), lit(256))),
        hx2(floor(m1 / 4096).cast("int") + 16),
        dataHex, lit("03"))
      val m = pmod(col("doc_id"), lit(5))
      val payload = unhex(
        when(m === 0, zlibHex)
          .when(m === 1, gzipHex)
          .when(m === 2, zstdHex)
          .when(m === 3, lz4Hex)
          .otherwise(brHex))
      val dec = when(m === 4,
          Multimodal.decompress(payload, "br"))
        .otherwise(Multimodal.decompress(payload))
      t(s, dir, "documents")
        .select(col("doc_id"), dec.as("d"))
        .select(col("doc_id"), col("d.format").as("format"),
          col("d.data").cast("string").as("text"))
    }, Some("""
      SELECT doc_id,
        CASE doc_id % 5 WHEN 0 THEN 'zlib' WHEN 1 THEN 'gzip'
          WHEN 2 THEN 'zstd' WHEN 3 THEN 'lz4' ELSE 'br' END AS format,
        'wet-record-' || doc_id AS text
      FROM documents""")),

    // WARC/WET record parsing (round-12 WarcRecordsExpr — the ISO
    // 28500 container Common Crawl ships): per doc a 2-record WET
    // file is synthesized in pure string arithmetic (record bodies
    // and URIs carry doc_id; Content-Length computed per body),
    // exploded, and every extracted field + body replayed by the
    // oracle. The layering partner of q_decompress_text: together
    // they certify explode(warc_records(decompress(p).data)).
    QueryDef("q_warc_records", (s, dir) => {
      val crlf = "\r\n"
      def rec(idx: Int) = {
        val body = concat(lit(s"text-$idx-"), col("doc_id"))
        concat(
          lit("WARC/1.0" + crlf + "WARC-Type: conversion" + crlf +
            "WARC-Target-URI: http://cc.example/"),
          col("doc_id"), lit(s"/$idx$crlf" + "Content-Length: "),
          length(body).cast("string"), lit(crlf + crlf),
          body, lit(crlf + crlf))
      }
      val payload = concat(rec(0), rec(1)).cast("binary")
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(Multimodal.warcRecords(payload)).as(Seq("idx", "r")))
        .select(col("doc_id"), col("idx"),
          col("r.warc_type").as("warc_type"),
          col("r.target_uri").as("target_uri"),
          col("r.content").cast("string").as("text"))
    }, Some("""
      SELECT doc_id, idx, 'conversion' AS warc_type,
        'http://cc.example/' || doc_id || '/' || idx AS target_uri,
        'text-' || idx || '-' || doc_id AS text
      FROM documents, (VALUES (0), (1)) AS t(idx)""")),

    // Matroska/WebM metadata (round-12 VideoMetaExpr MKV path): per
    // doc a minimal webm — EBML header with DocType, unknown-size
    // Segment, Info with a 4-byte FLOAT Duration (2500.0 at the
    // default 1 ms TimestampScale, constant bytes 451C4000), one
    // video TrackEntry whose PixelWidth/Height carry the doc_id
    // arithmetic. The oracle replays every field.
    QueryDef("q_video_meta_mkv", (s, dir) => {
      def hx2(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      val w = (pmod(col("doc_id"), lit(200)) + 1).cast("int")
      val h = (pmod(col("doc_id"), lit(150)) + 1).cast("int")
      val mkvHex = concat(
        lit("1A45DFA3" + "87" + "4282" + "84" + "7765626D" + // webm
          "18538067" + "FF" + // Segment, unknown size
          "1549A966" + "87" + "4489" + "84" + "451C4000" + // 2500.0f
          "1654AE6B" + "90" + "AE" + "8E" +
          "D78101" + "838101" + "E0" + "86" + "B081"),
        hx2(w), lit("BA81"), hx2(h))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.videoMeta(unhex(mkvHex)).as("m"))
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.duration_ms").as("duration_ms"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.tracks").as("tracks"))
    }, Some("""
      SELECT doc_id, 'webm' AS format, CAST(2500 AS BIGINT) AS duration_ms,
        CAST(doc_id % 200 + 1 AS INT) AS width,
        CAST(doc_id % 150 + 1 AS INT) AS height, 1 AS tracks
      FROM documents""")),

    // Crawl-ingestion E2E certification (round-12): the full chain a
    // web-corpus pipeline runs per crawl member — gzip(WARC(HTTP(
    // text))) built per doc in pure column arithmetic (stored-deflate
    // gzip with truncated-trailer tolerance, WARC Content-Length from
    // the live HTTP-message length, HTTP charset header) and then
    // decompress -> warc_records -> http_response -> text in ONE
    // map-side projection. Every stage is individually oracled
    // (q_decompress_text / q_warc_records / q_http_response); this
    // query certifies the COMPOSITION, like q_crawl_e2e does for the
    // text-curation DAG. The oracle replays every surfaced field.
    QueryDef("q_crawl_ingest_e2e", (s, dir) => {
      def le16h(c: org.apache.spark.sql.Column) = {
        val hh = lpad(hex(c), 4, "0")
        concat(substring(hh, 3, 2), substring(hh, 1, 2))
      }
      val body = concat(lit("crawl page "), col("doc_id"))
      val http = concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
          "charset=utf-8\r\n\r\n"), body)
      val warc = concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\n" +
          "WARC-Target-URI: http://site.example/"), col("doc_id"),
        lit("\r\nContent-Length: "), length(http).cast("string"),
        lit("\r\n\r\n"), http, lit("\r\n\r\n"))
      val warcHex = hex(warc.cast("binary"))
      val wlen = length(warc)
      val gzHex = concat(lit("1F8B08" + "00" * 7), // header, FLG 0
        lit("01"), le16h(wlen), le16h(lit(65535) - wlen), // stored blk
        warcHex) // no trailer: the tolerated truncated-tail shape
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.decompress(unhex(gzHex)).as("d"))
        .select(col("doc_id"), col("d.format").as("format"),
          explode(Multimodal.warcRecords(col("d.data"))).as("r"))
        .select(col("doc_id"), col("format"),
          col("r.warc_type").as("warc_type"),
          col("r.target_uri").as("target_uri"),
          Multimodal.httpResponse(col("r.content")).as("h"))
        .select(col("doc_id"), col("format"), col("warc_type"),
          col("target_uri"), col("h.status").as("status"),
          col("h.charset").as("charset"), col("h.text").as("text"))
    }, Some("""
      SELECT doc_id, 'gzip' AS format, 'response' AS warc_type,
        'http://site.example/' || doc_id AS target_uri,
        CAST(200 AS INT) AS status, 'utf-8' AS charset,
        'crawl page ' || doc_id AS text
      FROM documents""")),

    // Chunked + Content-Encoding COMPOSITION (round-13): the
    // documented route — http_response de-chunks the transfer coding
    // and surfaces a Content-Encoding body as raw bytes with NULL
    // text; decompress() then opens it explicitly. This query builds
    // chunked(gzip(text)) per doc (stored-deflate gzip, one chunk
    // whose ASCII-hex size is computed from the gzip byte length) and
    // certifies BOTH stages compose: header_text replays NULL, the
    // decompressed text replays the original page.
    QueryDef("q_crawl_chunked_gzip", (s, dir) => {
      def le16h(c: org.apache.spark.sql.Column) = {
        val hh = lpad(hex(c), 4, "0")
        concat(substring(hh, 3, 2), substring(hh, 1, 2))
      }
      val text = concat(lit("compressed page "), col("doc_id"))
      val tlen = length(text)
      // stored-deflate gzip member, trailer-less (tolerated tail)
      val gz = unhex(concat(lit("1F8B08" + "00" * 7),
        lit("01"), le16h(tlen), le16h(lit(65535) - tlen),
        hex(text.cast("binary"))))
      val msg = concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8" +
          "\r\nContent-Encoding: gzip\r\nTransfer-Encoding: chunked" +
          "\r\n\r\n").cast("binary"),
        concat(lower(hex(length(gz))), lit("\r\n")).cast("binary"),
        gz, lit("\r\n0\r\n\r\n").cast("binary"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.httpResponse(msg).as("h"))
        .select(col("doc_id"), col("h.status").as("status"),
          col("h.text").as("header_text"),
          Multimodal.decompress(col("h.body")).as("d"))
        .select(col("doc_id"), col("status"), col("header_text"),
          col("d.format").as("format"),
          col("d.data").cast("string").as("text"))
    }, Some("""
      SELECT doc_id, CAST(200 AS INT) AS status,
        CAST(NULL AS VARCHAR) AS header_text, 'gzip' AS format,
        'compressed page ' || doc_id AS text
      FROM documents""")),

    // robots.txt ∘ crawl chain (round-13): the reprocessing-under-
    // new-rules shape — fetched pages come out of the full
    // decompress → warc_records → http_response chain, their site is
    // extracted from the WARC target URI, and a per-site robots.txt
    // TABLE joins in by host (broadcast: the robots side is one row
    // per site, dwarfed by the page corpus at any scale) before
    // robots_check filters the pages the site's CURRENT rules allow.
    // Site 0 disallows /private/, site 1 disallows everything, site 2
    // disallows everything EXCEPT for corpusbot — so the surviving
    // set exercises path rules, deny-all, and agent-specific override
    // across the keyed join. The oracle replays chain + verdict.
    QueryDef("q_crawl_robots_join", (s, dir) => {
      val site = pmod(col("doc_id"), lit(3))
      val path = when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("/private/"), col("doc_id")))
        .otherwise(concat(lit("/public/"), col("doc_id")))
      val body = concat(lit("page "), col("doc_id"))
      val http = concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
          "charset=utf-8\r\n\r\n"), body)
      val warc = concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\n" +
          "WARC-Target-URI: http://site"), site,
        lit(".example"), path,
        lit("\r\nContent-Length: "), length(http).cast("string"),
        lit("\r\n\r\n"), http, lit("\r\n\r\n")).cast("binary")
      val pages = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(Multimodal.warcRecords(warc)).as("r"))
        .select(col("doc_id"), col("r.target_uri").as("target_uri"),
          Multimodal.httpResponse(col("r.content")).as("h"))
        .select(col("doc_id"), col("target_uri"),
          regexp_extract(col("target_uri"), "//([^/]+)", 1).as("host"),
          regexp_extract(col("target_uri"), "//[^/]+(/.*)", 1).as("path"),
          col("h.text").as("text"))
      val robots = t(s, dir, "documents")
        .select(concat(lit("site"), pmod(col("doc_id"), lit(3)),
          lit(".example")).as("host")).distinct()
        .withColumn("robots_txt",
          when(col("host") === "site0.example",
            lit("User-agent: *\nDisallow: /private/"))
          .when(col("host") === "site1.example",
            lit("User-agent: *\nDisallow: /"))
          .otherwise(lit(
            "User-agent: corpusbot\nAllow: /\nUser-agent: *\nDisallow: /")))
      pages.join(broadcast(robots), "host")
        .withColumn("c", Multimodal.robotsCheck(col("robots_txt"),
          lit("corpusbot/1.0"), col("path")))
        .where(col("c.allowed"))
        .select(col("doc_id"), col("host"), col("path"),
          col("c.matched_rule").as("matched_rule"), col("text"))
    }, Some("""
      SELECT doc_id, 'site' || (doc_id % 3) || '.example' AS host,
        CASE WHEN doc_id % 2 = 0 THEN '/private/' || doc_id
             ELSE '/public/' || doc_id END AS path,
        CASE WHEN doc_id % 3 = 2 THEN '/' ELSE NULL END AS matched_rule,
        'page ' || doc_id AS text
      FROM documents
      WHERE (doc_id % 3 = 0 AND doc_id % 2 = 1) OR doc_id % 3 = 2""")),

    // sitemap.xml parsing (round-14 SitemapEntriesExpr — the discovery
    // half of the crawl chain robots.txt's Sitemap: directive names):
    // per doc one of THREE sitemaps.org shapes — a two-URL urlset with
    // lastmod/changefreq/priority and an &amp; entity in the second
    // loc, a sitemapindex (kind "sitemap"), and a namespace-prefixed
    // urlset whose first url LACKS the mandatory loc (dropped) with
    // the surviving loc in CDATA. The oracle replays the exploded rows
    // as a UNION of doc_id arithmetic.
    QueryDef("q_sitemap_entries", (s, dir) => {
      val m = pmod(col("doc_id"), lit(3))
      val urlset = concat(
        lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
          "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">" +
          "<url><loc>https://ex.com/a"), col("doc_id"),
        lit("</loc><lastmod>2024-01-02</lastmod>" +
          "<changefreq>daily</changefreq><priority>0."),
        pmod(col("doc_id"), lit(10)),
        lit("</priority></url><url><loc>https://ex.com/b"), col("doc_id"),
        lit("?x=1&amp;y=2</loc></url></urlset>"))
      val index = concat(
        lit("<sitemapindex><sitemap><loc>https://ex.com/sm"), col("doc_id"),
        lit(".xml</loc><lastmod>2024-02-03T04:05:06Z</lastmod>" +
          "</sitemap></sitemapindex>"))
      val prefixed = concat(
        lit("<ns:urlset xmlns:ns=\"x\">" +
          "<ns:url><ns:lastmod>2024-03-04</ns:lastmod></ns:url>" +
          "<ns:url><ns:loc><![CDATA[https://ex.com/c"), col("doc_id"),
        lit("]]></ns:loc></ns:url></ns:urlset>"))
      val xml = when(m === 0, urlset).when(m === 1, index)
        .otherwise(prefixed)
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(Multimodal.sitemapEntries(encode(xml, "UTF-8"))).as("e"))
        .select(col("doc_id"), col("e.kind").as("kind"),
          col("e.loc").as("loc"), col("e.lastmod").as("lastmod"),
          col("e.changefreq").as("changefreq"),
          col("e.priority").as("priority"))
    }, Some("""
      SELECT doc_id, 'url' AS kind,
        'https://ex.com/a' || doc_id AS loc, '2024-01-02' AS lastmod,
        'daily' AS changefreq,
        CAST(doc_id % 10 AS DOUBLE) / 10 AS priority
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, 'url', 'https://ex.com/b' || doc_id || '?x=1&y=2',
        NULL, NULL, NULL
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, 'sitemap', 'https://ex.com/sm' || doc_id || '.xml',
        '2024-02-03T04:05:06Z', NULL, NULL
      FROM documents WHERE doc_id % 3 = 1
      UNION ALL
      SELECT doc_id, 'url', 'https://ex.com/c' || doc_id,
        NULL, NULL, NULL
      FROM documents WHERE doc_id % 3 = 2""")),

    // sitemap -> fetched-pages discovery join (round-14 — closes the
    // crawl-ingestion discovery story: robots names sitemaps, sitemaps
    // name URLs, the join audits coverage of what was actually
    // fetched): pages live on 16 hosts (doc_id % 16); each host's
    // sitemap is AGGREGATED from the docs the host "lists" (doc_id %
    // 3 != 0 — a third of the corpus is deliberately unlisted), then
    // exploded through sitemap_entries and joined back on (host, url).
    // The oracle replays the discovered flag as pure arithmetic. Scale
    // shape: the per-host aggregation is one shuffle over 16 keys
    // (real sitemaps cap at the protocol's 50k URLs per file); the
    // discovery join is a keyed equi-join on (host, url) — both sides
    // partition by the same key, no broadcast needed, no skew (hosts
    // are uniform by construction).
    QueryDef("q_crawl_sitemap_join", (s, dir) => {
      val pages = t(s, dir, "documents")
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(16)).cast("int").as("host"))
        .withColumn("url", concat(lit("https://h"), col("host"),
          lit(".ex/doc/"), col("doc_id")))
      val sitemaps = pages
        .filter(pmod(col("doc_id"), lit(3)) =!= 0)
        .groupBy("host")
        .agg(concat(lit("<urlset>"),
          concat_ws("", sort_array(collect_list(
            concat(lit("<url><loc>"), col("url"), lit("</loc></url>"))))),
          lit("</urlset>")).as("xml"))
      val listed = sitemaps
        .select(col("host"),
          explode(Multimodal.sitemapEntries(encode(col("xml"), "UTF-8")))
            .as("e"))
        .select(col("host"), col("e.loc").as("url"),
          lit(true).as("found"))
      pages.join(listed, Seq("host", "url"), "left")
        .select(col("doc_id"),
          coalesce(col("found"), lit(false)).as("discovered"))
    }, Some("""
      SELECT doc_id, doc_id % 3 <> 0 AS discovered
      FROM documents""")),

    // Full discovery chain E2E (round-14): robots.txt → Sitemap:
    // directives (robots_sitemaps) → fetched sitemap XML →
    // sitemap_entries → pages. Eight hosts; each robots names TWO
    // sitemaps (sm lists doc_id % 5 != 0 pages, sm2 the even
    // multiples of 5), so a page is discovered unless doc_id is an
    // ODD multiple of 5 — replayed by the oracle as arithmetic. The
    // sitemap-url hop joins on (host, sitemap_url) — only sitemaps
    // the robots actually names are read, the compliance-correct
    // order. Scale shape: two keyed joins + one 8-key aggregation;
    // everything else single-scan map-side.
    QueryDef("q_crawl_discovery_e2e", (s, dir) => {
      val pages = t(s, dir, "documents")
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(8)).cast("int").as("host"))
        .withColumn("url", concat(lit("https://h"), col("host"),
          lit(".ex/p/"), col("doc_id")))
      val robots = pages.select("host").distinct()
        .withColumn("robots_txt", concat(
          lit("User-agent: *\nDisallow:\nSitemap: https://h"), col("host"),
          lit(".ex/sm.xml\nSitemap: https://h"), col("host"),
          lit(".ex/sm2.xml\n")))
      val wanted = robots.select(col("host"),
        explode(Multimodal.robotsSitemaps(col("robots_txt")))
          .as("sitemap_url"))
      def smXml(listed: org.apache.spark.sql.DataFrame, name: String) =
        listed.groupBy("host")
          .agg(concat(lit("<urlset>"),
            concat_ws("", sort_array(collect_list(concat(
              lit("<url><loc>"), col("url"), lit("</loc></url>"))))),
            lit("</urlset>")).as("xml"))
          .withColumn("sitemap_url", concat(lit("https://h"), col("host"),
            lit(s".ex/$name")))
      val fetched = smXml(pages.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          "sm.xml")
        .unionByName(smXml(pages.filter(
          pmod(col("doc_id"), lit(5)) === 0 &&
            pmod(col("doc_id"), lit(2)) === 0), "sm2.xml"))
      val discovered = wanted.join(fetched, Seq("host", "sitemap_url"))
        .select(col("host"),
          explode(Multimodal.sitemapEntries(encode(col("xml"), "UTF-8")))
            .as("e"))
        .select(col("host"), col("e.loc").as("url"), lit(true).as("found"))
      pages.join(discovered, Seq("host", "url"), "left")
        .select(col("doc_id"),
          coalesce(col("found"), lit(false)).as("discovered"))
    }, Some("""
      SELECT doc_id,
        doc_id % 5 <> 0 OR doc_id % 2 = 0 AS discovered
      FROM documents""")),

    // robots.txt evaluation (round-12 RobotsCheckExpr, RFC 9309): a
    // FIXED rule file (specific group with a prefix disallow, a
    // longer allow override, a *$-anchored wildcard, crawl-delay,
    // and a deny-all * fallback group) evaluated against doc_id-built
    // paths — every branch of the longest-match decision is hit and
    // the oracle replays the verdicts as a CASE.
    QueryDef("q_robots_check", (s, dir) => {
      val robots = lit(Seq(
        "User-agent: corpusbot",
        "Disallow: /private/",
        "Allow: /private/override/",
        "Disallow: /*.php$",
        "Crawl-delay: 3",
        "User-agent: *",
        "Disallow: /").mkString("\n"))
      val path = when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit("/private/"), col("doc_id")))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          concat(lit("/private/override/"), col("doc_id")))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          concat(lit("/data/"), col("doc_id"), lit(".php")))
        .otherwise(concat(lit("/open/"), col("doc_id")))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.robotsCheck(robots, lit("corpusbot/1.0"), path)
            .as("c"))
        .select(col("doc_id"), col("c.allowed").as("allowed"),
          col("c.matched_rule").as("matched_rule"),
          col("c.crawl_delay").as("crawl_delay"))
    }, Some("""
      SELECT doc_id,
        CASE doc_id % 4 WHEN 0 THEN false WHEN 2 THEN false
          ELSE true END AS allowed,
        CASE doc_id % 4 WHEN 0 THEN '/private/'
          WHEN 1 THEN '/private/override/'
          WHEN 2 THEN '/*.php$' ELSE NULL END AS matched_rule,
        3 AS crawl_delay
      FROM documents""")),

    // HTTP response parsing (round-12 HttpResponseExpr — the step
    // between a WARC `response` record and clean text): per doc one
    // of NINE RFC 9112 message shapes — plain utf-8, chunked transfer
    // coding (hex chunk size computed from the body length), a
    // declared latin-1 404, five CJK/legacy multibyte pages
    // (gbk/big5/shift_jis/euc-jp/euc-kr bodies built from
    // python-encoded hex constants + the doc's ASCII digits, which
    // every one of these charsets passes through unchanged), and a
    // header-silent HTML page whose charset comes from the
    // `<meta charset>` prescan (round-13, the WHATWG order). The
    // oracle replays status/charset/text from the doc_id arithmetic —
    // DuckDB emits the expected CJK strings as plain utf-8 literals.
    QueryDef("q_http_response", (s, dir) => {
      def hx(str: String) =
        str.getBytes("ISO-8859-1").map("%02X".format(_)).mkString
      val body = concat(lit("page-"), col("doc_id"))
      val plain = concat(lit("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/plain; charset=utf-8\r\n\r\n"), body)
        .cast("binary")
      val chunked = concat(lit("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/plain\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n"),
        lower(hex(length(body))), lit("\r\n"), body, lit("\r\n0\r\n\r\n"))
        .cast("binary")
      val latin = concat(lit("HTTP/1.1 404 Not Found\r\n" +
        "Content-Type: text/html; charset=iso-8859-1\r\n\r\n"), body)
        .cast("binary")
      val digitsHex = hex(col("doc_id").cast("string").cast("binary"))
      // (charset label, python-encoded body prefix hex) — ASCII-safe
      def cjk(label: String, prefixHex: String) = unhex(concat(
        lit(hx(s"HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
          s"charset=$label\r\n\r\n") + prefixHex), digitsHex))
      val meta = unhex(concat(
        lit(hx("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
          "<html><head><meta charset=\"gbk\"></head><body>") +
          "CAFDBEDD2D"), digitsHex))
      val m = pmod(col("doc_id"), lit(9))
      val payload = when(m === 0, plain)
        .when(m === 1, chunked)
        .when(m === 2, latin)
        .when(m === 3, cjk("gbk", "CAFDBEDD2D")) // 数据-
        .when(m === 4, cjk("big5", "B8EAAEC62D")) // 資料-
        .when(m === 5, cjk("shift_jis", "8366815B835E2D")) // データ-
        .when(m === 6, cjk("euc-jp", "A5C7A1BCA5BF2D")) // データ-
        .when(m === 7, cjk("euc-kr", "B5A5C0CCC5CD2D")) // 데이터-
        .otherwise(meta)
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.httpResponse(payload).as("h"))
        .select(col("doc_id"), col("h.status").as("status"),
          col("h.charset").as("charset"), col("h.text").as("text"))
    }, Some("""
      SELECT doc_id,
        CAST(CASE WHEN doc_id % 9 = 2 THEN 404 ELSE 200 END AS INT)
          AS status,
        CASE doc_id % 9 WHEN 0 THEN 'utf-8' WHEN 2 THEN 'iso-8859-1'
          WHEN 3 THEN 'gbk' WHEN 4 THEN 'big5' WHEN 5 THEN 'shift_jis'
          WHEN 6 THEN 'euc-jp' WHEN 7 THEN 'euc-kr' WHEN 8 THEN 'gbk'
          ELSE NULL END AS charset,
        CASE doc_id % 9
          WHEN 3 THEN '数据-' || doc_id
          WHEN 4 THEN '資料-' || doc_id
          WHEN 5 THEN 'データ-' || doc_id
          WHEN 6 THEN 'データ-' || doc_id
          WHEN 7 THEN '데이터-' || doc_id
          WHEN 8 THEN '<html><head><meta charset="gbk"></head><body>数据-'
            || doc_id
          ELSE 'page-' || doc_id END AS text
      FROM documents""")),

    // Single-byte non-Latin charsets (round-14 — the long tail of the
    // multilingual web after round-13's CJK families): per doc one of
    // SIXTEEN declared-charset pages — Cyrillic under four encodings
    // (windows-1251 / koi8-r / iso-8859-5 / ibm866) plus koi8-u,
    // Central European ×2 (windows-1250 / iso-8859-2), Greek ×2
    // (windows-1253 / iso-8859-7), Hebrew (windows-1255), Arabic
    // (windows-1256), Baltic (windows-1257), Vietnamese
    // (windows-1258), the euro latin9 (iso-8859-15), and the two
    // WHATWG label FOLDS pinned with a C1 byte the ISO tables lack:
    // iso-8859-9 → windows-1254 (0x92 = ’) and tis-620 → windows-874
    // (0x85 = …). Bodies are python-encoded hex constants + the doc's
    // ASCII digits (every family passes ASCII through unchanged); the
    // oracle replays charset/text as utf-8 literals off the doc_id
    // arithmetic.
    QueryDef("q_http_charsets", (s, dir) => {
      def hx(str: String) =
        str.getBytes("ISO-8859-1").map("%02X".format(_)).mkString
      val digitsHex = hex(col("doc_id").cast("string").cast("binary"))
      def page(label: String, prefixHex: String) = unhex(concat(
        lit(hx(s"HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
          s"charset=$label\r\n\r\n") + prefixHex), digitsHex))
      val shapes = Seq(
        "windows-1251" -> "CFF0E8E2E5F22D", // Привет-
        "koi8-r" -> "F0D2C9D7C5D42D", // Привет-
        "iso-8859-5" -> "BFE0D8D2D5E22D", // Привет-
        "ibm866" -> "8FE0A8A2A5E22D", // Привет-
        "windows-1250" -> "C8659A74696E612D", // Čeština-
        "iso-8859-2" -> "C865B974696E612D", // Čeština-
        "windows-1253" -> "C5EBEBDCE4E12D", // Ελλάδα-
        "iso-8859-7" -> "C5EBEBDCE4E12D", // Ελλάδα-
        "iso-8859-9" -> "54FC726BE765922D", // Türkçe’- (cp1254 fold)
        "windows-1255" -> "F9ECE5ED2D", // שלום-
        "windows-1256" -> "E3D1CDC8C72D", // مرحبا-
        "tis-620" -> "C0D2C9D2E4B7C2852D", // ภาษาไทย…- (cp874 fold)
        "windows-1257" -> "4C6174766965F0752D", // Latviešu-
        "windows-1258" -> "F0F56E2D", // đơn-
        "iso-8859-15" -> "A475726F2D", // €uro-
        "koi8-u" -> "EBC9A7D72D") // Київ-
      val m = pmod(col("doc_id"), lit(16))
      val payload = shapes.zipWithIndex.tail.foldLeft(
        when(m === 0, page(shapes.head._1, shapes.head._2))) {
        case (acc, ((label, prefix), i)) =>
          acc.when(m === i, page(label, prefix))
      }
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.httpResponse(payload).as("h"))
        .select(col("doc_id"), col("h.status").as("status"),
          col("h.charset").as("charset"), col("h.text").as("text"))
    }, Some("""
      SELECT doc_id, CAST(200 AS INT) AS status,
        CASE doc_id % 16
          WHEN 0 THEN 'windows-1251' WHEN 1 THEN 'koi8-r'
          WHEN 2 THEN 'iso-8859-5' WHEN 3 THEN 'ibm866'
          WHEN 4 THEN 'windows-1250' WHEN 5 THEN 'iso-8859-2'
          WHEN 6 THEN 'windows-1253' WHEN 7 THEN 'iso-8859-7'
          WHEN 8 THEN 'iso-8859-9' WHEN 9 THEN 'windows-1255'
          WHEN 10 THEN 'windows-1256' WHEN 11 THEN 'tis-620'
          WHEN 12 THEN 'windows-1257' WHEN 13 THEN 'windows-1258'
          WHEN 14 THEN 'iso-8859-15' ELSE 'koi8-u' END AS charset,
        CASE doc_id % 16
          WHEN 0 THEN 'Привет-' WHEN 1 THEN 'Привет-'
          WHEN 2 THEN 'Привет-' WHEN 3 THEN 'Привет-'
          WHEN 4 THEN 'Čeština-' WHEN 5 THEN 'Čeština-'
          WHEN 6 THEN 'Ελλάδα-' WHEN 7 THEN 'Ελλάδα-'
          WHEN 8 THEN 'Türkçe’-' WHEN 9 THEN 'שלום-'
          WHEN 10 THEN 'مرحبا-' WHEN 11 THEN 'ภาษาไทย…-'
          WHEN 12 THEN 'Latviešu-' WHEN 13 THEN 'đơn-'
          WHEN 14 THEN '€uro-' ELSE 'Київ-' END || doc_id AS text
      FROM documents""")),

    // MJPEG-in-MP4 frame sampling (round-12 VideoFrameExpr BMFF walk):
    // the same 2-frame DC-only JPEG payloads as q_video_frames, but
    // addressed through a real ISO 14496-12 sample table — stsd 'jpeg'
    // entry, uniform stsz (142 B), one stsc run (chunk 1, 2 samples),
    // stco absolute offset 24 into mdat. Same oracle arithmetic.
    QueryDef("q_video_frames_mp4", (s, dir) => {
      def hx1(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      val dc0 = (pmod(col("doc_id"), lit(16)) + 16).cast("int")
      val dc1 = (pmod(col("doc_id") * 5, lit(16)) + 16).cast("int")
      def sb(dc: org.apache.spark.sql.Column) = hx1(lit(128) + dc * 2)
      val gp = "FFD8" + "FFDB0043" + "00" + "11" * 64 +
        "FFC0000B08" + "0008" + "0008" + "01" + "011100" +
        "FFC40015" + "00" + "0101" + "00" * 14 + "0005" +
        "FFC40014" + "10" + "01" + "00" * 15 + "00" +
        "FFDA000801" + "0100" + "003F00" // 139 bytes; +scan+EOI = 142
      val mp4Hex = concat(
        lit("00000010" + "66747970" + "69736F6D" + "00000000" + // ftyp
          "00000124" + "6D646174" + gp), sb(dc0), lit("FFD9" + gp),
        sb(dc1), lit("FFD9" +
          "0000008C" + "6D6F6F76" + // moov
          "00000084" + "7472616B" + // trak
          "0000007C" + "6D646961" + // mdia
          "00000074" + "6D696E66" + // minf
          "0000006C" + "7374626C" + // stbl
          "00000020" + "73747364" + "00000000" + "00000001" + // stsd
          "00000010" + "6A706567" + "00" * 8 + // 'jpeg' entry
          "00000014" + "7374737A" + "00000000" + "0000008E" +
          "00000002" + // stsz: uniform 142, count 2
          "0000001C" + "73747363" + "00000000" + "00000001" +
          "00000001" + "00000002" + "00000001" + // stsc: 1 run
          "00000014" + "7374636F" + "00000000" + "00000001" +
          "00000018")) // stco: chunk at offset 24
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.videoFrame(unhex(mp4Hex), lit(1)).as("f"))
        .select(col("doc_id"), col("f.format").as("format"),
          col("f.width").as("width"), col("f.height").as("height"),
          col("f.frames").as("frames"),
          element_at(col("f.pixels"), 1).as("p0"),
          element_at(col("f.pixels"), 64).as("p63"))
    }, Some("""
      WITH g AS (
        SELECT doc_id,
          LEAST(255, GREATEST(0, 128 + CAST(
            FLOOR(((16 + (doc_id*5) % 16) * 17 + 4) / 8.0) AS INT))) AS v
        FROM documents)
      SELECT doc_id, 'mjpeg' AS format, 8 AS width, 8 AS height,
        2 AS frames,
        CAST(v * 65793 - 16777216 AS INTEGER) AS p0,
        CAST(v * 65793 - 16777216 AS INTEGER) AS p63
      FROM g""")),

    // MJPEG-in-MKV frame sampling (round-12 VideoFrameExpr EBML walk):
    // same frames behind a Matroska layout — unknown-size Segment (the
    // streaming-writer shape), Tracks/TrackEntry with CodecID V_MJPEG,
    // one Cluster with two SimpleBlocks (track vint, int16 timecode,
    // keyframe flags, no lacing). Same oracle arithmetic.
    QueryDef("q_video_frames_mkv", (s, dir) => {
      def hx1(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      val dc0 = (pmod(col("doc_id"), lit(16)) + 16).cast("int")
      val dc1 = (pmod(col("doc_id") * 5, lit(16)) + 16).cast("int")
      def sb(dc: org.apache.spark.sql.Column) = hx1(lit(128) + dc * 2)
      val gp = "FFD8" + "FFDB0043" + "00" + "11" * 64 +
        "FFC0000B08" + "0008" + "0008" + "01" + "011100" +
        "FFC40015" + "00" + "0101" + "00" * 14 + "0005" +
        "FFC40014" + "10" + "01" + "00" * 15 + "00" +
        "FFDA000801" + "0100" + "003F00"
      val mkvHex = concat(
        lit("1A45DFA3" + "80" + // EBML header, empty
          "18538067" + "FF" + // Segment, UNKNOWN size (to EOF)
          "1654AE6B" + "91" + // Tracks (17 B)
          "AE" + "8F" + // TrackEntry (15 B)
          "D7" + "81" + "01" + // TrackNumber 1
          "83" + "81" + "01" + // TrackType video
          "86" + "87" + "565F4D4A504547" + // CodecID V_MJPEG
          "1F43B675" + "412D" + // Cluster (301 B)
          "E7" + "81" + "00" + // cluster timestamp 0
          "A3" + "4092" + "81" + "0000" + "80" + gp), sb(dc0),
        lit("FFD9" +
          "A3" + "4092" + "81" + "0000" + "80" + gp), sb(dc1),
        lit("FFD9"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.videoFrame(unhex(mkvHex), lit(1)).as("f"))
        .select(col("doc_id"), col("f.format").as("format"),
          col("f.width").as("width"), col("f.height").as("height"),
          col("f.frames").as("frames"),
          element_at(col("f.pixels"), 1).as("p0"),
          element_at(col("f.pixels"), 64).as("p63"))
    }, Some("""
      WITH g AS (
        SELECT doc_id,
          LEAST(255, GREATEST(0, 128 + CAST(
            FLOOR(((16 + (doc_id*5) % 16) * 17 + 4) / 8.0) AS INT))) AS v
        FROM documents)
      SELECT doc_id, 'mjpeg' AS format, 8 AS width, 8 AS height,
        2 AS frames,
        CAST(v * 65793 - 16777216 AS INTEGER) AS p0,
        CAST(v * 65793 - 16777216 AS INTEGER) AS p63
      FROM g""")),

    // Animated-GIF frame sampling (GifFramesExpr): a 2-frame 2x2 GIF89a
    // whose LZW streams are CONSTANT bytes (indices [0,1,2,3] then a
    // 1x1 [0] overlay at (1,1), literal-code LZW verified in
    // GifFramesSpec) while the GLOBAL COLOR TABLE carries the doc_id
    // arithmetic — so frame composition (disposal keep + overlay) is
    // exercised and every decoded pixel is replayable: frame 1 =
    // [c0, c1, c2, c0] with c_k = v(k,*) packed ARGB.
    QueryDef("q_gif_frames", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def v(i: Int, c: Int) = pmod(col("doc_id") * 7 + i * 13 + c * 29,
        lit(256)).cast("int")
      def rgb(i: Int) = concat(hx(v(i, 0)), hx(v(i, 1)), hx(v(i, 2)))
      val gifHex = concat(
        lit("474946383961" + "0200" + "0200" + "81" + "00" + "00"),
        rgb(0), rgb(1), rgb(2), rgb(3),
        lit("21F9040400000000" + // GCE frame 0: disposal keep
          "2C000000000200020000" + "02" + "03" + "443405" + "00" +
          "21F9040000000000" + // GCE frame 1
          "2C010001000100010000" + "02" + "02" + "4401" + "00" +
          "3B"))
      val payload = unhex(gifHex)
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.gifFrame(payload, lit(1)).as("f"))
        .select(col("doc_id"), col("f.format").as("format"),
          col("f.frames").as("frames"),
          element_at(col("f.pixels"), 1).as("p0"),
          element_at(col("f.pixels"), 2).as("p1"),
          element_at(col("f.pixels"), 3).as("p2"),
          element_at(col("f.pixels"), 4).as("p3"))
    }, Some("""
      SELECT doc_id, 'gif' AS format, 2 AS frames,
        """ + Seq(0, 1, 2, 0).zipWithIndex.map { case (k, p) =>
          s"""CAST((doc_id*7 + $k*13) % 256 * 65536
            + (doc_id*7 + $k*13 + 29) % 256 * 256
            + (doc_id*7 + $k*13 + 58) % 256
            - 16777216 AS INTEGER) AS p$p""" }.mkString(",\n        ") + """
      FROM documents""")),

    // Wide-sample PCM decode (round-11 AudioDecodeExpr surfaces): evens
    // a 24-bit mono WAV (2 frames, sample u(i) = (doc_id*13 + i*31) %
    // 2^24 stored LE, decoded via sign extension), odds a 32-bit mono
    // WAV (u(i) = (doc_id*9 + i*17) % 2^32, full-width two's
    // complement). The oracle replays the signed reinterpretation.
    QueryDef("q_audio_decode_wide", (s, dir) => {
      def le(c: org.apache.spark.sql.Column, hexDigits: Int) = {
        val hh = lpad(hex(c), hexDigits, "0")
        concat((hexDigits - 1 to 1 by -2).map(i => substring(hh, i, 2)): _*)
      }
      def u24(i: Int) =
        pmod(col("doc_id") * 13 + i * 31, lit(16777216L)).cast("long")
      def u32(i: Int) =
        pmod(col("doc_id") * 9 + i * 17, lit(4294967296L)).cast("long")
      val wav24 = concat(
        lit("52494646" + "2A000000" + "57415645" +
          "666D7420" + "10000000" + "0100" + "0100" +
          "401F0000" + "C05D0000" + "0300" + "1800" +
          "64617461" + "06000000"),
        le(u24(0), 6), le(u24(1), 6))
      val wav32 = concat(
        lit("52494646" + "2C000000" + "57415645" +
          "666D7420" + "10000000" + "0100" + "0100" +
          "401F0000" + "007D0000" + "0400" + "2000" +
          "64617461" + "08000000"),
        le(u32(0), 8), le(u32(1), 8))
      val payload = unhex(
        when(col("doc_id") % 2 === 0, wav24).otherwise(wav32))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.decodeAudio(payload).as("a"))
        .select(col("doc_id"), col("a.bits").as("bits"),
          col("a.n_samples").as("n_samples"),
          element_at(col("a.samples"), 1).as("s0"),
          element_at(col("a.samples"), 2).as("s1"))
    }, Some("""
      WITH u AS (
        SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN (doc_id*13) % 16777216
               ELSE (doc_id*9) % 4294967296 END AS u0,
          CASE WHEN doc_id % 2 = 0 THEN (doc_id*13 + 31) % 16777216
               ELSE (doc_id*9 + 17) % 4294967296 END AS u1,
          CASE WHEN doc_id % 2 = 0 THEN 8388608 ELSE 2147483648 END AS half,
          CASE WHEN doc_id % 2 = 0 THEN 24 ELSE 32 END AS bits
        FROM documents)
      SELECT doc_id, CAST(bits AS INT) AS bits, 2 AS n_samples,
        CAST(CASE WHEN u0 >= half THEN u0 - 2*half ELSE u0 END AS INT) AS s0,
        CAST(CASE WHEN u1 >= half THEN u1 - 2*half ELSE u1 END AS INT) AS s1
      FROM u""")),

    // G.711 companded audio decode (round-11 AudioDecodeExpr surfaces):
    // per doc a mono mu-law WAV (fmt code 7, codes c(i) = (doc_id*7 +
    // i*31) % 256) and a mono A-law WAV (fmt code 6, codes (doc_id*13 +
    // i*29) % 256) are synthesized with pure builtins and expanded to
    // 16-bit linear via the ITU-T G.711 piecewise map (sign + 3-bit
    // segment + 4-bit quantization — the public-domain g711.c
    // reference, bit-identical to the JDK codec per AudioDecodeSpec).
    // The oracle replays the integer formula per code.
    QueryDef("q_audio_g711", (s, dir) => {
      def hx2(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def uc(i: Int) = pmod(col("doc_id") * 7 + i * 31, lit(256)).cast("int")
      def ac(i: Int) = pmod(col("doc_id") * 13 + i * 29, lit(256)).cast("int")
      def wavHex(fmtLe: String, c0: org.apache.spark.sql.Column,
          c1: org.apache.spark.sql.Column, c2: org.apache.spark.sql.Column,
          c3: org.apache.spark.sql.Column) = concat(
        lit("52494646" + "28000000" + "57415645" +
          "666D7420" + "10000000" + fmtLe + "0100" +
          "401F0000" + "401F0000" + "0100" + "0800" +
          "64617461" + "04000000"),
        hx2(c0), hx2(c1), hx2(c2), hx2(c3))
      val ulaw = Multimodal.decodeAudio(
        unhex(wavHex("0700", uc(0), uc(1), uc(2), uc(3))))
      val alaw = Multimodal.decodeAudio(
        unhex(wavHex("0600", ac(0), ac(1), ac(2), ac(3))))
      t(s, dir, "documents")
        .select(col("doc_id"), ulaw.as("u"), alaw.as("a"))
        .select(col("doc_id"),
          col("u.format").as("u_format"), col("a.format").as("a_format"),
          concat_ws(",", col("u.samples").cast("array<string>"))
            .as("u_samples"),
          concat_ws(",", col("a.samples").cast("array<string>"))
            .as("a_samples"))
    }, Some("""
      WITH g AS (
        SELECT doc_id, i,
          255 - (doc_id*7 + i*31) % 256 AS u,
          xor((doc_id*13 + i*29) % 256, 85) AS a
        FROM documents CROSS JOIN generate_series(0, 3) AS t(i)),
      v AS (
        SELECT doc_id, i,
          CASE WHEN u >= 128
            THEN 132 - ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))
            ELSE ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) - 132
          END AS us,
          (CASE WHEN a >= 128 THEN 1 ELSE -1 END) *
            (CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
                  WHEN (a // 16) % 8 = 1 THEN (a % 16) * 16 + 264
                  ELSE ((a % 16) * 16 + 264) * (1 << ((a // 16) % 8 - 1))
             END) AS asamp
        FROM g)
      SELECT doc_id, 'wav-ulaw' AS u_format, 'wav-alaw' AS a_format,
        STRING_AGG(CAST(us AS VARCHAR), ',' ORDER BY i) AS u_samples,
        STRING_AGG(CAST(asamp AS VARCHAR), ',' ORDER BY i) AS a_samples
      FROM v GROUP BY doc_id""")),

    // IMA ADPCM decode (round-11 AudioDecodeExpr surfaces): per doc a
    // mono single-block IMA WAV (fmt code 17, block align 8 = 4-byte
    // header + 8 nibbles) is synthesized from doc_id — initial
    // predictor (doc_id*31) % 2^16 as int16, initial step index
    // doc_id % 89, nibbles n(k) = (doc_id*3 + k*5) % 16 — and decoded
    // through the IMA 1992 integer recursion (proven bit-exact against
    // a hand-derived vector and a reference encoder in
    // AudioDecodeSpec). The oracle replays the 8-step recursion as a
    // chained-CTE state machine over the literal step/index tables.
    QueryDef("q_audio_ima", (s, dir) => {
      def hx2(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def le16h(c: org.apache.spark.sql.Column) = {
        val hh = lpad(hex(c), 4, "0")
        concat(substring(hh, 3, 2), substring(hh, 1, 2))
      }
      val p0 = pmod(col("doc_id") * 31, lit(65536)).cast("int")
      val i0 = pmod(col("doc_id"), lit(89)).cast("int")
      def nib(k: Int) = pmod(col("doc_id") * 3 + k * 5, lit(16)).cast("int")
      def codeByte(j: Int) = hx2(nib(2 * j) + nib(2 * j + 1) * 16)
      val wavHex = concat(
        lit("52494646" + "30000000" + "57415645" +
          "666D7420" + "14000000" + "1100" + "0100" +
          "401F0000" + "C71B0000" + "0800" + "0400" + "0200" + "0900" +
          "64617461" + "08000000"),
        le16h(p0), hx2(i0), lit("00"),
        codeByte(0), codeByte(1), codeByte(2), codeByte(3))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.decodeAudio(unhex(wavHex)).as("a"))
        .select(col("doc_id"), col("a.format").as("format"),
          col("a.n_samples").as("n_samples"),
          concat_ws(",", col("a.samples").cast("array<string>"))
            .as("samples"))
    }, Some {
      val stepTab = "[" + graft.multimodal.AudioDecodeExpr.ImaStep
        .mkString(",") + "]"
      val idxTab = "[" + graft.multimodal.AudioDecodeExpr.ImaIndex
        .mkString(",") + "]"
      val init = """
      s0 AS (
        SELECT doc_id,
          (doc_id*31) % 65536 - CASE WHEN (doc_id*31) % 65536 >= 32768
            THEN 65536 ELSE 0 END AS p,
          doc_id % 89 AS ix,
          CAST((doc_id*31) % 65536 - CASE WHEN (doc_id*31) % 65536 >= 32768
            THEN 65536 ELSE 0 END AS VARCHAR) AS acc
        FROM documents)"""
      val steps = (1 to 8).map { k =>
        s"""
      s$k AS (
        SELECT doc_id,
          LEAST(32767, GREATEST(-32768,
            p + CASE WHEN nk >= 8 THEN -d ELSE d END)) AS p,
          LEAST(88, GREATEST(0, ix + list_extract($idxTab, nk + 1))) AS ix,
          acc || ',' || CAST(LEAST(32767, GREATEST(-32768,
            p + CASE WHEN nk >= 8 THEN -d ELSE d END)) AS VARCHAR) AS acc
        FROM (
          SELECT doc_id, p, ix, acc, nk,
            st // 8 + CASE WHEN nk % 2 = 1 THEN st // 4 ELSE 0 END
                    + CASE WHEN (nk // 2) % 2 = 1 THEN st // 2 ELSE 0 END
                    + CASE WHEN (nk // 4) % 2 = 1 THEN st ELSE 0 END AS d
          FROM (
            SELECT doc_id, p, ix, acc,
              (doc_id*3 + ${k - 1}*5) % 16 AS nk,
              list_extract($stepTab, ix + 1) AS st
            FROM s${k - 1})))"""
      }.mkString(",")
      s"""
      WITH$init,$steps
      SELECT doc_id, 'wav-ima' AS format, 9 AS n_samples, acc AS samples
      FROM s8"""
    }),

    // MS ADPCM decode (round-11 AudioDecodeExpr surfaces): per doc a
    // mono single-block MS-ADPCM WAV (fmt code 2, block align 9 =
    // 7-byte header + 4 nibbles) — predictor pair doc_id % 7, initial
    // delta (doc_id*3) % 256 + 16, header samples from doc_id
    // arithmetic, nibbles n(k) = (doc_id*3 + k*7) % 16 — decoded via
    // the public Microsoft recursion (hand vector + reference-encoder
    // tracking in AudioDecodeSpec). The oracle replays the 4-step
    // recursion as a chained-CTE state machine. The predictor base is
    // TRUNCATING division toward zero (MS spec / ffmpeg), spelled out
    // sign-split in SQL so it cannot depend on an engine's floor vs
    // trunc convention; the u1/u2 header samples span both signs, so
    // about half the rows exercise negative predictor sums where
    // trunc and floor-shift genuinely diverge. The delta update stays
    // >> 8 (delta is always positive: floor == trunc).
    QueryDef("q_audio_ms", (s, dir) => {
      def hx2(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def le16h(c: org.apache.spark.sql.Column) = {
        val hh = lpad(hex(c), 4, "0")
        concat(substring(hh, 3, 2), substring(hh, 1, 2))
      }
      val pidx = pmod(col("doc_id"), lit(7)).cast("int")
      val d0 = (pmod(col("doc_id") * 3, lit(256)) + 16).cast("int")
      val u1 = pmod(col("doc_id") * 31, lit(65536)).cast("int")
      val u2 = pmod(col("doc_id") * 17, lit(65536)).cast("int")
      def nib(k: Int) = pmod(col("doc_id") * 3 + k * 7, lit(16)).cast("int")
      val wavHex = concat(
        lit("52494646" + "2D000000" + "57415645" +
          "666D7420" + "10000000" + "0200" + "0100" +
          "401F0000" + "401F0000" + "0900" + "0400" +
          "64617461" + "09000000"),
        hx2(pidx), le16h(d0), le16h(u1), le16h(u2),
        hx2(nib(0) * 16 + nib(1)), hx2(nib(2) * 16 + nib(3)))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.decodeAudio(unhex(wavHex)).as("a"))
        .select(col("doc_id"), col("a.format").as("format"),
          col("a.n_samples").as("n_samples"),
          concat_ws(",", col("a.samples").cast("array<string>"))
            .as("samples"))
    }, Some {
      val c1Tab = "[" + graft.multimodal.AudioDecodeExpr.MsCoef1
        .mkString(",") + "]"
      val c2Tab = "[" + graft.multimodal.AudioDecodeExpr.MsCoef2
        .mkString(",") + "]"
      val adTab = "[" + graft.multimodal.AudioDecodeExpr.MsAdapt
        .mkString(",") + "]"
      val init = s"""
      s0 AS (
        SELECT doc_id,
          (doc_id*31) % 65536 - CASE WHEN (doc_id*31) % 65536 >= 32768
            THEN 65536 ELSE 0 END AS p1,
          (doc_id*17) % 65536 - CASE WHEN (doc_id*17) % 65536 >= 32768
            THEN 65536 ELSE 0 END AS p2,
          (doc_id*3) % 256 + 16 AS dl,
          list_extract($c1Tab, doc_id % 7 + 1) AS c1,
          list_extract($c2Tab, doc_id % 7 + 1) AS c2,
          CAST((doc_id*17) % 65536 - CASE WHEN (doc_id*17) % 65536 >= 32768
            THEN 65536 ELSE 0 END AS VARCHAR) || ',' ||
          CAST((doc_id*31) % 65536 - CASE WHEN (doc_id*31) % 65536 >= 32768
            THEN 65536 ELSE 0 END AS VARCHAR) AS acc
        FROM documents)"""
      val steps = (1 to 4).map { k =>
        s"""
      s$k AS (
        SELECT doc_id, p AS p1, p1 AS p2,
          GREATEST(16, (list_extract($adTab, nk + 1) * dl) >> 8) AS dl,
          c1, c2,
          acc || ',' || CAST(p AS VARCHAR) AS acc
        FROM (
          SELECT doc_id, p1, p2, dl, c1, c2, acc, nk,
            LEAST(32767, GREATEST(-32768,
              CASE WHEN p1*c1 + p2*c2 < 0
                   THEN -((-(p1*c1 + p2*c2)) // 256)
                   ELSE (p1*c1 + p2*c2) // 256 END +
              (nk - CASE WHEN nk >= 8 THEN 16 ELSE 0 END) * dl)) AS p
          FROM (
            SELECT doc_id, p1, p2, dl, c1, c2, acc,
              (doc_id*3 + ${k - 1}*7) % 16 AS nk
            FROM s${k - 1})))"""
      }.mkString(",")
      s"""
      WITH$init,$steps
      SELECT doc_id, 'wav-ms' AS format, 6 AS n_samples, acc AS samples
      FROM s4"""
    }),

    // AU + AIFF container decode (round-11 AudioDecodeExpr surfaces):
    // evens a Sun/NeXT .au carrying G.711 mu-law codes (the
    // q_audio_g711 arithmetic, so the oracle replays the same
    // expansion), odds an AIFF whose COMM carries the 8 kHz rate as an
    // 80-bit extended float (constant 0x400B FA00...) and whose SSND
    // holds 2 big-endian int16 samples u(i) = (doc_id*11 + i*17) %
    // 2^16. One schema across both containers; the oracle branches on
    // parity.
    QueryDef("q_audio_containers", (s, dir) => {
      def hx2(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def be16h(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
      def uc(i: Int) = pmod(col("doc_id") * 7 + i * 31, lit(256)).cast("int")
      def u16(i: Int) =
        pmod(col("doc_id") * 11 + i * 17, lit(65536)).cast("int")
      val auHex = concat(
        lit("2E736E64" + "00000018" + "00000004" + "00000001" +
          "00001F40" + "00000001"),
        hx2(uc(0)), hx2(uc(1)), hx2(uc(2)), hx2(uc(3)))
      val aiffHex = concat(
        lit("464F524D" + "00000032" + "41494646" +
          "434F4D4D" + "00000012" + "0001" + "00000002" + "0010" +
          "400BFA00000000000000" +
          "53534E44" + "0000000C" + "00000000" + "00000000"),
        be16h(u16(0)), be16h(u16(1)))
      val payload = unhex(
        when(col("doc_id") % 2 === 0, auHex).otherwise(aiffHex))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.decodeAudio(payload).as("a"))
        .select(col("doc_id"), col("a.format").as("format"),
          col("a.sample_rate").as("sample_rate"),
          col("a.n_samples").as("n_samples"),
          concat_ws(",", col("a.samples").cast("array<string>"))
            .as("samples"))
    }, Some("""
      WITH g AS (
        SELECT doc_id, i, 255 - (doc_id*7 + i*31) % 256 AS u
        FROM documents CROSS JOIN generate_series(0, 3) AS t(i)
        WHERE doc_id % 2 = 0),
      ul AS (
        SELECT doc_id,
          STRING_AGG(CAST(CASE WHEN u >= 128
            THEN 132 - ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))
            ELSE ((u % 16) * 8 + 132) * (1 << ((u // 16) % 8)) - 132
          END AS VARCHAR), ',' ORDER BY i) AS samples
        FROM g GROUP BY doc_id)
      SELECT doc_id, 'au-ulaw' AS format, 8000 AS sample_rate,
        4 AS n_samples, samples
      FROM ul
      UNION ALL
      SELECT doc_id, 'aiff' AS format, 8000 AS sample_rate,
        2 AS n_samples,
        CAST((doc_id*11) % 65536 - CASE WHEN (doc_id*11) % 65536 >= 32768
          THEN 65536 ELSE 0 END AS VARCHAR) || ',' ||
        CAST((doc_id*11 + 17) % 65536 -
          CASE WHEN (doc_id*11 + 17) % 65536 >= 32768
          THEN 65536 ELSE 0 END AS VARCHAR) AS samples
      FROM documents WHERE doc_id % 2 = 1""")),


    // FLAC decode (round-11 FlacDecode): 16 distinct mono fixed-order-1
    // FLAC streams produced by the INDEPENDENT reference encoder
    // (tools/gen_flac_fixtures.py --variants; cross-language, so a
    // shared spec misreading cannot hide), selected per doc by
    // doc_id % 16 — rice-coded residuals, CRC-8/CRC-16 verified, the
    // STREAMINFO rate varying per variant. The oracle replays the
    // expected rate and sample vector from the same generator run.
    // Full variable-content coverage (LPC, stereo modes, rice2
    // escapes, wasted bits, depths) is pinned in FlacDecodeSpec.
    QueryDef("q_audio_flac", (s, dir) => {
      val variants = Seq(
        "664c6143800000220010ffff00000000000001f400f00000000800000000000000000000000000000000fff87000000007bf12ff3800f2d55a883997",
        "664c6143800000220010ffff0000000000000203a0f00000000800000000000000000000000000000000fff87000000007bf12ff5d00d11fd29ca202",
        "664c6143800000220010ffff000000000000021340f00000000800000000000000000000000000000000fff87000000007bf12ff8200d396aad4005195",
        "664c6143800000220010ffff0000000000000222e0f00000000800000000000000000000000000000000fff87000000007bf12ffa700f511fd29a39d",
        "664c6143800000220010ffff000000000000023280f00000000800000000000000000000000000000000fff87000000007bf12ffcc00e5396aadd8c5",
        "664c6143800000220010ffff000000000000024220f00000000800000000000000000000000000000000fff87000000007bf12fff100eb511fd2e0dd",
        "664c6143800000220010ffff0000000000000251c0f00000000800000000000000000000000000000000fff87000000007bf12001600fa5396aa1bf1",
        "664c6143800000220010ffff000000000000026160f00000000800000000000000000000000000000000fff87000000007bf12003b00d55a88fe4a9f",
        "664c6143800000220010ffff000000000000027100f00000000800000000000000000000000000000000fff87000000007bf12006000ffa5396aa3b2",
        "664c6143800000220010ffff0000000000000280a0f00000000800000000000000000000000000000000fff87000000007bf12008500ed55a88fbbcb",
        "664c6143800000220010ffff000000000000029040f00000000800000000000000000000000000000000fff87000000007bf1200aa00e3fa5396d9f3",
        "664c6143800000220010ffff000000000000029fe0f00000000800000000000000000000000000000000fff87000000007bf1200cf00f2d55a88a19e",
        "664c6143800000220010ffff00000000000002af80f00000000800000000000000000000000000000000fff87000000007bf1200f400d11fd29cea52",
        "664c6143800000220010ffff00000000000002bf20f00000000800000000000000000000000000000000fff87000000007bf12011900d396aad400a100",
        "664c6143800000220010ffff00000000000002cec0f00000000800000000000000000000000000000000fff87000000007bf12013e00f511fd296aed",
        "664c6143800000220010ffff00000000000002de60f00000000800000000000000000000000000000000fff87000000007bf12016300e5396aad8183")
      val pick = element_at(
        array(variants.map(lit): _*),
        (pmod(col("doc_id"), lit(16)) + 1).cast("int"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.decodeAudio(unhex(pick)).as("a"))
        .select(col("doc_id"), col("a.format").as("format"),
          col("a.sample_rate").as("sample_rate"),
          col("a.n_samples").as("n_samples"),
          concat_ws(",", col("a.samples").cast("array<string>"))
            .as("samples"))
    }, Some("""
      SELECT doc_id, 'flac' AS format,
        CAST(list_extract([8000,8250,8500,8750,9000,9250,9500,9750,10000,10250,10500,10750,11000,11250,11500,11750],
          CAST(doc_id % 16 + 1 AS INT)) AS INT) AS sample_rate,
        8 AS n_samples,
        ARRAY_TO_STRING(list_extract([[-200,-198,-200,-195,-194,-197,-193,-193], [-163,-159,-159,-163,-160,-161,-166,-164], [-126,-131,-129,-131,-126,-125,-128,-124], [-89,-92,-88,-88,-92,-89,-90,-95], [-52,-53,-58,-56,-58,-53,-52,-55], [-15,-14,-17,-13,-13,-17,-14,-15], [22,25,24,19,21,19,24,25], [59,64,65,62,66,66,62,65], [96,92,95,94,89,91,89,94], [133,131,136,137,134,138,138,134], [170,170,166,169,168,163,165,163], [207,209,207,212,213,210,214,214], [244,248,248,244,247,246,241,243], [281,276,278,276,281,282,279,283], [318,315,319,319,315,318,317,312], [355,354,349,351,349,354,355,352]],
          CAST(doc_id % 16 + 1 AS INT)), ',') AS samples
      FROM documents""")),

    // Ogg metadata (round-11 AudioMetaExpr surfaces): per doc a
    // two-page Ogg stream — BOS page carrying a Vorbis identification
    // header with rate 8000 + doc_id % 32000, EOS page whose granule
    // position is doc_id % 100000 + 4096 PCM frames — synthesized with
    // pure builtins (the page CRC is not part of the metadata
    // contract) and walked back out; the oracle replays the
    // granule-to-duration arithmetic.
    QueryDef("q_audio_ogg_meta", (s, dir) => {
      def leN(c: org.apache.spark.sql.Column, hexDigits: Int) = {
        val hh = lpad(hex(c), hexDigits, "0")
        concat((hexDigits - 1 to 1 by -2).map(i => substring(hh, i, 2)): _*)
      }
      val rate = (lit(8000) + pmod(col("doc_id"), lit(32000))).cast("int")
      val granule = (pmod(col("doc_id"), lit(100000)) + 4096).cast("long")
      val vorbisId = concat(
        lit("01" + "766F72626973" + "00000000" + "02"),
        leN(rate, 8), lit("00" * 12 + "66" + "01"))
      val page1 = concat(
        lit("4F676753" + "00" + "02" + "FF" * 8 +
          "07000000" + "00000000" + "00000000" + "01" + "1E"),
        vorbisId)
      val page2 = concat(
        lit("4F676753" + "00" + "04"), leN(granule, 16),
        lit("07000000" + "01000000" + "00000000" + "01" + "01" + "AA"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.audioMeta(unhex(concat(page1, page2))).as("m"))
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.channels").as("channels"),
          col("m.sample_rate").as("sample_rate"),
          col("m.duration_ms").as("duration_ms"))
    }, Some("""
      SELECT doc_id, 'ogg-vorbis' AS format, 2 AS channels,
        CAST(8000 + doc_id % 32000 AS INT) AS sample_rate,
        CAST((doc_id % 100000 + 4096) * 1000
          // (8000 + doc_id % 32000) AS BIGINT) AS duration_ms
      FROM documents""")),

    // BMP palette + RLE decode (round-11 ImageDecodeExpr surfaces):
    // evens a 2x2 8bpp palette BMP (4 BGRA table entries from doc_id
    // arithmetic, indices 0..3, bottom-up rows), odds a 4x2 BI_RLE8
    // BMP (2-entry palette, one encoded run per row with EOL/EOF
    // escapes). The oracle replays the palette arithmetic.
    QueryDef("q_bmp_palette", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def v(k: Int, c: Int) = pmod(col("doc_id") * 7 + k * 13 + c * 29,
        lit(256)).cast("int")
      def quad(k: Int) = // palette entry: B,G,R,reserved
        concat(hx(v(k, 2)), hx(v(k, 1)), hx(v(k, 0)), lit("00"))
      val pal8 = concat(
        lit("424D" + "4E000000" + "00000000" + "46000000" + // data at 70
          "28000000" + "02000000" + "02000000" + "0100" + "0800" +
          "00000000" + "08000000" + "00000000" + "00000000" +
          "04000000" + "00000000"), // colorsUsed = 4
        quad(0), quad(1), quad(2), quad(3),
        // bottom-up: indices (2,3) then (0,1), rows pad to 4 bytes
        lit("0203" + "0000" + "0001" + "0000"))
      val rle8 = concat(
        lit("424D" + "4A000000" + "00000000" + "3E000000" + // data at 62
          "28000000" + "04000000" + "02000000" + "0100" + "0800" +
          "01000000" + "0C000000" + "00000000" + "00000000" + // BI_RLE8
          "02000000" + "00000000"), // colorsUsed = 2
        quad(0), quad(1),
        // bottom row: 4 x index0, EOL; top row: 4 x index1, EOF
        lit("0400" + "0000" + "0401" + "0001"))
      val payload = unhex(
        when(col("doc_id") % 2 === 0, pal8).otherwise(rle8))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.decodeImage(payload).as("d"))
        .select(col("doc_id"), col("d.format").as("format"),
          col("d.width").as("width"), col("d.height").as("height"),
          element_at(col("d.pixels"), 1).as("p_first"),
          when(col("doc_id") % 2 === 0, element_at(col("d.pixels"), 4))
            .otherwise(element_at(col("d.pixels"), 8)).as("p_last"))
    }, Some {
      def pix(k: String) =
        s"""(doc_id*7 + $k*13) % 256 * 65536
           + (doc_id*7 + $k*13 + 29) % 256 * 256
           + (doc_id*7 + $k*13 + 58) % 256 - 16777216"""
      s"""
      SELECT doc_id, 'bmp' AS format,
        CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 4 END AS INT) AS width,
        2 AS height,
        CAST(CASE WHEN doc_id % 2 = 0 THEN ${pix("0")}
             ELSE ${pix("1")} END AS INTEGER) AS p_first,
        CAST(CASE WHEN doc_id % 2 = 0 THEN ${pix("3")}
             ELSE ${pix("0")} END AS INTEGER) AS p_last
      FROM documents"""
    }),

    // PNM decode (round-11 ImageDecodeExpr surfaces): per doc a binary
    // P6 2x2 RGB raster ("P6\\n2 2\\n255\\n" + 12 bytes of the
    // q_image_decode v() arithmetic); the oracle replays the pixels.
    QueryDef("q_pnm_decode", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def v(i: Int, c: Int) = pmod(col("doc_id") * 7 + i * 13 + c * 29,
        lit(256)).cast("int")
      def rgb(i: Int) = concat(hx(v(i, 0)), hx(v(i, 1)), hx(v(i, 2)))
      val pnmHex = concat(
        lit("50360A3220320A3235350A"), // "P6\n2 2\n255\n"
        rgb(0), rgb(1), rgb(2), rgb(3))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.decodeImage(unhex(pnmHex)).as("d"))
        .select(col("doc_id"), col("d.format").as("format"),
          col("d.width").as("width"), col("d.height").as("height"),
          element_at(col("d.pixels"), 1).as("p0"),
          element_at(col("d.pixels"), 4).as("p3"))
    }, Some("""
      SELECT doc_id, 'pnm' AS format, 2 AS width, 2 AS height,
        """ + Seq(0, 3).map(i =>
          s"""CAST((doc_id*7 + $i*13) % 256 * 65536
            + (doc_id*7 + $i*13 + 29) % 256 * 256
            + (doc_id*7 + $i*13 + 58) % 256
            - 16777216 AS INTEGER) AS p${if (i == 0) 0 else 3}""")
          .mkString(",\n        ") + """
      FROM documents""")),

    // TGA decode (round-11 ImageDecodeExpr surfaces): per doc a v2
    // (footer-signed) truecolor 24-bit 2x2 TGA, bottom-up rows stored
    // BGR (pixels 2,3 first); the q_image_decode v() arithmetic, the
    // oracle replays it.
    QueryDef("q_tga_decode", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def v(i: Int, c: Int) = pmod(col("doc_id") * 7 + i * 13 + c * 29,
        lit(256)).cast("int")
      def bgr(i: Int) = concat(hx(v(i, 2)), hx(v(i, 1)), hx(v(i, 0)))
      val tgaHex = concat(
        lit("00" + "00" + "02" + "0000" + "0000" + "00" +
          "00000000" + "0200" + "0200" + "18" + "00"),
        bgr(2), bgr(3), bgr(0), bgr(1), // bottom-up storage
        lit("00" * 8 + "5452554556495349" + "4F4E2D5846494C45" + "2E00"))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.decodeImage(unhex(tgaHex)).as("d"))
        .select(col("doc_id"), col("d.format").as("format"),
          col("d.width").as("width"), col("d.height").as("height"),
          element_at(col("d.pixels"), 1).as("p0"),
          element_at(col("d.pixels"), 4).as("p3"))
    }, Some("""
      SELECT doc_id, 'tga' AS format, 2 AS width, 2 AS height,
        """ + Seq(0, 3).map(i =>
          s"""CAST((doc_id*7 + $i*13) % 256 * 65536
            + (doc_id*7 + $i*13 + 29) % 256 * 256
            + (doc_id*7 + $i*13 + 58) % 256
            - 16777216 AS INTEGER) AS p${if (i == 0) 0 else 3}""")
          .mkString(",\n        ") + """
      FROM documents""")),

    // WebP VP8L lossless decode (round-12 WebpDecode, RFC 9649): per
    // doc an 8x1 VP8L stream is synthesized from doc_id — the green
    // prefix code is the simple 2-symbol form over g0 = doc_id % 128
    // and g1 = (doc_id*7) % 128 + 128 (g0 < 128 <= g1, so canonical
    // symbol-sorted assignment puts g0 on code 0 unconditionally),
    // red/blue/alpha/distance are single-symbol codes, and the 8
    // selection bits come from (doc_id*5) % 256 read LSB-first. All
    // field boundaries in the byte assembly are non-overlapping, so
    // plain add/mod arithmetic builds each byte. The oracle replays
    // the pixels from the same doc_id arithmetic. (Fixture-level
    // correctness against the reference libwebp encoder is pinned in
    // WebpDecodeSpec; this query certifies the Catalyst surface.)
    QueryDef("q_webp_decode", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def div(c: org.apache.spark.sql.Column, n: Int) =
        floor(c / n).cast("int")
      val g0 = pmod(col("doc_id"), lit(128)).cast("int")
      val g1 = (pmod(col("doc_id") * 7, lit(128)) + 128).cast("int")
      val r = pmod(col("doc_id") * 13, lit(256)).cast("int")
      val bl = pmod(col("doc_id") * 29, lit(256)).cast("int")
      val sel = pmod(col("doc_id") * 5, lit(256)).cast("int")
      val webpHex = concat(
        lit("52494646" + "1C000000" + "57454250" +
          "5650384C" + "0F000000" + "2F" + "07000000"),
        hx(lit(56) + pmod(g0, lit(4)) * 64), // simple/2sym/8bit + g0 lo
        hx(div(g0, 4) + pmod(g1, lit(4)) * 64), // g0 hi + g1 lo
        hx(div(g1, 4) + 64), // g1 hi + red simple bit
        hx(lit(1) + pmod(r, lit(128)) * 2), // red 8-bit flag + value lo
        hx(div(r, 128) + 10 + pmod(bl, lit(16)) * 16), // blue code + lo
        hx(div(bl, 16) + 208), // bl hi + alpha code + alpha bit0 (255)
        lit("FF" + "02"), // alpha bits 1-7 + dist simple; dist sym 0
        hx(pmod(sel, lit(64)) * 4), // selection bits 0-5
        hx(div(sel, 64)), // selection bits 6-7, rest zero padding
        lit("00")) // RIFF pad (odd chunk length)
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.decodeImage(unhex(webpHex)).as("d"))
        .select(Seq(col("doc_id"), col("d.format").as("format"),
          col("d.width").as("width"), col("d.height").as("height")) ++
          (0 to 7).map(i =>
            element_at(col("d.pixels"), i + 1).as(s"p$i")): _*)
    }, Some("""
      SELECT doc_id, 'webp' AS format, 8 AS width, 1 AS height,
        """ + (0 to 7).map(i =>
          s"""CAST((doc_id*13) % 256 * 65536
            + (CASE WHEN ((doc_id*5) % 256 // ${1 << i}) % 2 = 1
               THEN (doc_id*7) % 128 + 128 ELSE doc_id % 128 END) * 256
            + (doc_id*29) % 256 - 16777216 AS INTEGER) AS p$i""")
          .mkString(",\n        ") + """
      FROM documents""")),

    // WebP lossy VP8 decode (round-13 Vp8Decode, RFC 6386): unlike
    // every other decode query, a VP8 keyframe's first partition is
    // BOOL-CODED (arithmetic coding), so a stream cannot be assembled
    // from doc_id column arithmetic — instead each doc selects one of
    // four complete system-libwebp-ENCODED streams (the q10-q75 /
    // flat-gradient-blocks corners of the Vp8DecodeSpec fixture
    // matrix, incl. odd 17x31 dims) and the oracle carries the pixel
    // values of the system libwebp DECODER's own no-fancy RGB output
    // for those streams (tools/make_vp8_fixtures.py provenance) — an
    // independent-implementation oracle rather than an arithmetic
    // replay. Bit-exactness over the full 48-fixture matrix is pinned
    // in Vp8DecodeSpec; this query certifies the Catalyst surface.
    QueryDef("q_webp_lossy", (s, dir) => {
      val streams = Seq(
        // flat_16x16_q75
        "5249464634000000574542505650382028000000B001009D012A100010000" +
          "2003425A00274BA0005D400009BFFC439D0E74397FEFEB6BDB786140000",
        // gradient_16x16_q50
        "524946464800000057454250565038203C000000F001009D012A100010000" +
          "2C04C25B00274010F0C12F2E44000FEF9527D589C0276F91644594E47952B" +
          "FDAE2A6D5FB0FFFD310DAFEEDB7E6084000000",
        // gradient_8x8_q75
        "524946464E0000005745425056503820420000005002009D012A080008000" +
          "2003425B00274BA01F80002D17D2CB40000FEFAA10F00F91A35BB13AF7D31" +
          "FDB357723D32F9C79CF27FD47EC1EECD67FCFFA2FFB1288000",
        // blocks_17x31_q10
        "524946465E0000005745425056503820520000005003009D012A11001F003" +
          "F5196C058B0ABA723B7E802102A0968009D2E95817F08EE8000F629FFF31D" +
          "3945C17FF20C7729E29F3E2DF74B3424D9CFAC02FC7FFE818F8733C6EE2AC" +
          "17F2BDE216C2386400000")
      val sel = pmod(col("doc_id"), lit(4))
      val payload = unhex(streams.zipWithIndex.tail.foldLeft(
        when(sel === 0, streams.head)) { case (w, (hx, i)) =>
          w.when(sel === i, hx) })
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.decodeImage(payload).as("d"))
        .select(col("doc_id"), col("d.format").as("format"),
          col("d.width").as("width"), col("d.height").as("height"),
          element_at(col("d.pixels"), 1).as("p0"),
          element_at(col("d.pixels"),
            (col("d.width") * col("d.height") / 2).cast("int") + 1)
            .as("pmid"),
          element_at(col("d.pixels"), size(col("d.pixels"))).as("plast"))
    }, Some("""
      SELECT doc_id, 'webp' AS format,
        CAST(CASE doc_id % 4 WHEN 0 THEN 16 WHEN 1 THEN 16
          WHEN 2 THEN 8 ELSE 17 END AS INT) AS width,
        CAST(CASE doc_id % 4 WHEN 0 THEN 16 WHEN 1 THEN 16
          WHEN 2 THEN 8 ELSE 31 END AS INT) AS height,
        CAST(CASE doc_id % 4 WHEN 0 THEN -10843190 WHEN 1 THEN -16775680
          WHEN 2 THEN -16776448 ELSE -14100617 END AS INT) AS p0,
        CAST(CASE doc_id % 4 WHEN 0 THEN -10843190 WHEN 1 THEN -16741353
          WHEN 2 THEN -16738784 ELSE -15417481 END AS INT) AS pmid,
        CAST(CASE doc_id % 4 WHEN 0 THEN -10842940 WHEN 1 THEN -2165
          WHEN 2 THEN -1910 ELSE -1816453 END AS INT) AS plast
      FROM documents""")),

    // WebM V_VP8 frame sampling (round-13 VideoFrameExpr route): each
    // doc selects one of four complete WebM containers — the
    // q_webp_lossy VP8 keyframes muxed into a Matroska V_VP8 track as
    // two SimpleBlocks (tools-side mux, same EBML layout the MJPEG-MKV
    // spec pins) — and samples frame doc_id%2, so both block slots are
    // exercised and the frame count is certified. Pixel expectations
    // are the same system-libwebp decode constants as q_webp_lossy
    // (identical streams); the oracle replays the CASE mapping.
    QueryDef("q_video_frames_webm", (s, dir) => {
      val streams = Seq(
        // flat_16x16_q75 x2 blocks
        "1A45DFA38018538067F51654AE6B8FAE8DD781018381018685565F5650381" +
          "F43B675DCA3AC81000080B001009D012A1000100002003425A00274BA000" +
          "5D400009BFFC439D0E74397FEFEB6BDB786140000A3AC81000080B001009" +
          "D012A1000100002003425A00274BA0005D400009BFFC439D0E74397FEFEB" +
          "6BDB786140000",
        // gradient_16x16_q50 x2
        "1A45DFA38018538067409E1654AE6B8FAE8DD781018381018685565F56503" +
          "81F43B6754084A3C081000080F001009D012A1000100002C04C25B002740" +
          "10F0C12F2E44000FEF9527D589C0276F91644594E47952BFDAE2A6D5FB0F" +
          "FFD310DAFEEDB7E6084000000A3C081000080F001009D012A10001000" +
          "02C04C25B00274010F0C12F2E44000FEF9527D589C0276F91644594E4795" +
          "2BFDAE2A6D5FB0FFFD310DAFEEDB7E6084000000",
        // gradient_8x8_q75 x2
        "1A45DFA3801853806740AA1654AE6B8FAE8DD781018381018685565F56503" +
          "81F43B6754090A3C6810000805002009D012A0800080002003425B002" +
          "74BA01F80002D17D2CB40000FEFAA10F00F91A35BB13AF7D31FDB357723D" +
          "32F9C79CF27FD47EC1EECD67FCFFA2FFB1288000A3C681000080500200" +
          "9D012A0800080002003425B00274BA01F80002D17D2CB40000FEFAA10F00" +
          "F91A35BB13AF7D31FDB357723D32F9C79CF27FD47EC1EECD67FCFFA2FFB1" +
          "288000",
        // blocks_17x31_q10 x2
        "1A45DFA3801853806740CA1654AE6B8FAE8DD781018381018685565F56503" +
          "81F43B67540B0A3D6810000805003009D012A11001F003F5196C058B0A" +
          "BA723B7E802102A0968009D2E95817F08EE8000F629FFF31D3945C17FF20" +
          "C7729E29F3E2DF74B3424D9CFAC02FC7FFE818F8733C6EE2AC17F2BDE216" +
          "C2386400000A3D6810000805003009D012A11001F003F5196C058B0ABA72" +
          "3B7E802102A0968009D2E95817F08EE8000F629FFF31D3945C17FF20C772" +
          "9E29F3E2DF74B3424D9CFAC02FC7FFE818F8733C6EE2AC17F2BDE216C238" +
          "6400000")
      val sel = pmod(col("doc_id"), lit(4))
      val payload = unhex(streams.zipWithIndex.tail.foldLeft(
        when(sel === 0, streams.head)) { case (w, (hx, i)) =>
          w.when(sel === i, hx) })
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.videoFrame(payload,
          pmod(col("doc_id"), lit(2)).cast("int")).as("f"))
        .select(col("doc_id"), col("f.format").as("format"),
          col("f.width").as("width"), col("f.height").as("height"),
          col("f.frames").as("frames"),
          element_at(col("f.pixels"), 1).as("p0"),
          element_at(col("f.pixels"),
            (col("f.width") * col("f.height") / 2).cast("int") + 1)
            .as("pmid"),
          element_at(col("f.pixels"), size(col("f.pixels"))).as("plast"))
    }, Some("""
      SELECT doc_id, 'vp8' AS format,
        CAST(CASE doc_id % 4 WHEN 0 THEN 16 WHEN 1 THEN 16
          WHEN 2 THEN 8 ELSE 17 END AS INT) AS width,
        CAST(CASE doc_id % 4 WHEN 0 THEN 16 WHEN 1 THEN 16
          WHEN 2 THEN 8 ELSE 31 END AS INT) AS height,
        CAST(2 AS INT) AS frames,
        CAST(CASE doc_id % 4 WHEN 0 THEN -10843190 WHEN 1 THEN -16775680
          WHEN 2 THEN -16776448 ELSE -14100617 END AS INT) AS p0,
        CAST(CASE doc_id % 4 WHEN 0 THEN -10843190 WHEN 1 THEN -16741353
          WHEN 2 THEN -16738784 ELSE -15417481 END AS INT) AS pmid,
        CAST(CASE doc_id % 4 WHEN 0 THEN -10842940 WHEN 1 THEN -2165
          WHEN 2 THEN -1910 ELSE -1816453 END AS INT) AS plast
      FROM documents""")),

    // Transparent lossy WebP (round-13 ALPH chunk decode): each doc
    // selects one of four complete containers — two encoder-produced
    // (WebPEncodeRGBA: VP8X + compressed headerless-VP8L alpha + VP8,
    // incl. a filtered compressed plane) and two hand-built raw-alpha
    // variants exercising the horizontal and gradient row filters —
    // with pixel expectations from the system libwebp's MODE_RGBA
    // no-fancy decode (tools/make_webp_alpha_fixtures.py), the same
    // independent-implementation oracle pattern as q_webp_lossy.
    QueryDef("q_webp_alpha", (s, dir) => {
      val streams = Seq(
        // alphagrad_16x16_q75
        "524946468A00000057454250565038580A000000100000000F00000F0000" +
          "414C504824000000017F20104852D81F788588481DCC0240A3104B2CB1C4" +
          "124B2CB1CC607F44FF0394D3DD5F5650382040000000D001009D012A1000" +
          "100002003425B0027400D8BC90C8C000C749A4A60F627C8E30007EF8065F" +
          "59FFD3606FFF86937EFF35590EC47FF8C4F2EB8FF02E85E00000",
        // alphanoise_20x12_q50
        "524946463601000057454250565038580A000000100000001300000B0000" +
          "414C50481A00000001990A44F43F40266D33FF2252C97B23262017200001" +
          "0290B90656503820F60000003005009D012A14000C003ED154A34BA824A3" +
          "21B00801001A096C009D3281E0039ECEC8BC88439C97CD002CD96C3EB5FE" +
          "51A800FA093162F40B1378049344C1A4E764C9233EA99FD3963091AE9B0B" +
          "44D49ED8E3BBDDFEDCF54E7E7C41F0C9BEC244788ACA8441E5B2AA72D96F" +
          "A7C8469E13408CB9A30E0A636E7D8B87D00FBF5D52F166862302BEC944FC" +
          "6A85AFD7E3E891AA6171F8F7857B8017E3832F00A85018B312D9133F3E5B" +
          "F9876FF1E5B6748FEB0D7DEE4185019AC0F20C3FAA0C832BDA56EF4F85F4" +
          "C0624DAF1B74E6E6671BEA8FD909BBF837A8B783ACBBE67E0CAA260BB3D5" +
          "D2DD2AAC1AC79B251C1FB0CF11D8A9BB0000",
        // rawalpha_f1_16x16
        "524946466801000057454250565038580A000000100000000F00000F0000" +
          "414C50480101000004001111111111111111111111111111110011111111" +
          "111111111111111111111100111111111111111111111111111111001111" +
          "111111111111111111111111110011111111111111111111111111111100" +
          "111111111111111111111111111111001111111111111111111111111111" +
          "110011111111111111111111111111111100111111111111111111111111" +
          "111111001111111111111111111111111111110011111111111111111111" +
          "111111111100111111111111111111111111111111001111111111111111" +
          "111111111111110011111111111111111111111111111100111111111111" +
          "111111111111111111001111111111111111111111111111110056503820" +
          "40000000D001009D012A1000100002003425B0027400D8BC90C8C000C749" +
          "A4A60F627C8E30007EF8065F59FFD3606FFF86937EFF35590EC47FF8C4F2" +
          "EB8FF02E85E00000",
        // rawalpha_f3_16x16
        "524946466801000057454250565038580A000000100000000F00000F0000" +
          "414C5048010100000C001111111111111111111111111111110000000000" +
          "000000000000000000000000000000000000000000000000000000000000" +
          "000000000000000000000000000000000000000000000000000000000000" +
          "000000000000000000000000000000000000000000000000000000000000" +
          "000000000000000000000000000000000000000000000000000000000000" +
          "000000000000000000000000000000000000000000000000000000000000" +
          "000000000000000000000000000000000000000000000000000000000000" +
          "000000000000000000000000000000000000000000000000000000000000" +
          "000000000000000000000000000000000000000000000000000056503820" +
          "40000000D001009D012A1000100002003425B0027400D8BC90C8C000C749" +
          "A4A60F627C8E30007EF8065F59FFD3606FFF86937EFF35590EC47FF8C4F2" +
          "EB8FF02E85E00000")
      val sel = pmod(col("doc_id"), lit(4))
      val payload = unhex(streams.zipWithIndex.tail.foldLeft(
        when(sel === 0, streams.head)) { case (w, (hx, i)) =>
          w.when(sel === i, hx) })
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.decodeImage(payload).as("d"))
        .select(col("doc_id"), col("d.format").as("format"),
          col("d.width").as("width"), col("d.height").as("height"),
          element_at(col("d.pixels"), 1).as("p0"),
          element_at(col("d.pixels"),
            (col("d.width") * col("d.height") / 2).cast("int") + 1)
            .as("pmid"),
          element_at(col("d.pixels"), size(col("d.pixels"))).as("plast"))
    }, Some("""
      SELECT doc_id, 'webp' AS format,
        CAST(CASE doc_id % 4 WHEN 0 THEN 16 WHEN 1 THEN 20
          WHEN 2 THEN 16 ELSE 16 END AS INT) AS width,
        CAST(CASE doc_id % 4 WHEN 0 THEN 16 WHEN 1 THEN 12
          WHEN 2 THEN 16 ELSE 16 END AS INT) AS height,
        CAST(CASE doc_id % 4 WHEN 0 THEN 3065601 WHEN 1 THEN 13718096
          WHEN 2 THEN 3065601 ELSE 3065601 END AS INT) AS p0,
        CAST(CASE doc_id % 4 WHEN 0 THEN 3514122 WHEN 1 THEN 12091205
          WHEN 2 THEN 3514122 ELSE 3514122 END AS INT) AS pmid,
        CAST(CASE doc_id % 4 WHEN 0 THEN -6191934 WHEN 1 THEN -1096961683
          WHEN 2 THEN -6191934 ELSE -6191934 END AS INT) AS plast
      FROM documents""")),

    // Animated WebP frame sampling (round-13 VideoFrameExpr route):
    // each doc selects one of two hand-muxed animations — ANIM/ANMF
    // containers whose frames are the q_webp_lossy VP8 keyframe
    // streams — and samples frame doc_id%2, a period-4 cycle over the
    // same four system-libwebp-decoded pixel expectations. Frames
    // decode standalone from their ANMF sub-chunks (no compositing).
    QueryDef("q_webp_anim", (s, dir) => {
      val streams = Seq(
        // animation 0: flat_16x16_q75 + gradient_16x16_q50
        "52494646C800000057454250565038580A000000020000001000001E0000" +
          "414E494D06000000000000000000414E4D46400000000000000000000F00" +
          "000F0000280000005650382028000000B001009D012A1000100002003425" +
          "A00274BA0005D400009BFFC439D0E74397FEFEB6BDB786140000414E4D46" +
          "540000000000000000000F00000F000028000000565038203C000000F001" +
          "009D012A1000100002C04C25B00274010F0C12F2E44000FEF9527D589C02" +
          "76F91644594E47952BFDAE2A6D5FB0FFFD310DAFEEDB7E6084000000",
        // animation 1: gradient_8x8_q75 + blocks_17x31_q10
        "52494646F800000057454250565038580A000000020000001000001E0000" +
          "414E494D06000000000000000000414E4D465A0000000000000000000700" +
          "000700002800000056503820420000005002009D012A0800080002003425" +
          "B00274BA01F80002D17D2CB40000FEFAA10F00F91A35BB13AF7D31FDB357" +
          "723D32F9C79CF27FD47EC1EECD67FCFFA2FFB1288000414E4D466A000000" +
          "0000000000001000001E00002800000056503820520000005003009D012A" +
          "11001F003F5196C058B0ABA723B7E802102A0968009D2E95817F08EE8000" +
          "F629FFF31D3945C17FF20C7729E29F3E2DF74B3424D9CFAC02FC7FFE818F" +
          "8733C6EE2AC17F2BDE216C2386400000")
      val sel = pmod(floor(col("doc_id") / 2), lit(2)).cast("int")
      val payload = unhex(when(sel === 0, streams.head)
        .when(sel === 1, streams(1)))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.videoFrame(payload,
          pmod(col("doc_id"), lit(2)).cast("int")).as("f"))
        .select(col("doc_id"), col("f.format").as("format"),
          col("f.width").as("width"), col("f.height").as("height"),
          col("f.frames").as("frames"),
          element_at(col("f.pixels"), 1).as("p0"),
          element_at(col("f.pixels"),
            (col("f.width") * col("f.height") / 2).cast("int") + 1)
            .as("pmid"),
          element_at(col("f.pixels"), size(col("f.pixels"))).as("plast"))
    }, Some("""
      SELECT doc_id, 'webp' AS format,
        CAST(CASE doc_id % 4 WHEN 0 THEN 16 WHEN 1 THEN 16
          WHEN 2 THEN 8 ELSE 17 END AS INT) AS width,
        CAST(CASE doc_id % 4 WHEN 0 THEN 16 WHEN 1 THEN 16
          WHEN 2 THEN 8 ELSE 31 END AS INT) AS height,
        CAST(2 AS INT) AS frames,
        CAST(CASE doc_id % 4 WHEN 0 THEN -10843190 WHEN 1 THEN -16775680
          WHEN 2 THEN -16776448 ELSE -14100617 END AS INT) AS p0,
        CAST(CASE doc_id % 4 WHEN 0 THEN -10843190 WHEN 1 THEN -16741353
          WHEN 2 THEN -16738784 ELSE -15417481 END AS INT) AS pmid,
        CAST(CASE doc_id % 4 WHEN 0 THEN -10842940 WHEN 1 THEN -2165
          WHEN 2 THEN -1910 ELSE -1816453 END AS INT) AS plast
      FROM documents""")),

    // Animated-WebP metadata (round-13 VideoMetaExpr route): the
    // q_webp_anim animation-0 container with frame 0's ANMF duration
    // field SPLICED from doc_id column arithmetic (24-bit LE at a
    // fixed container offset — non-overlapping hex concat), so the
    // oracle replays duration_ms = 40 + (doc_id % 500) + 40 along
    // with the VP8X canvas and the chunk walk.
    QueryDef("q_video_meta_webp", (s, dir) => {
      def hx1(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      val d = (pmod(col("doc_id"), lit(500)) + 40).cast("int")
      def div(c: org.apache.spark.sql.Column, n: Int) =
        floor(c / n).cast("int")
      val webmHex = concat(
        lit("52494646C800000057454250565038580A000000020000001000001E00" +
          "00414E494D06000000000000000000414E4D4640000000000000000000" +
          "0F00000F0000"),
        hx1(pmod(d, lit(256))), hx1(pmod(div(d, 256), lit(256))),
        hx1(div(d, 65536)),
        lit("005650382028000000B001009D012A1000100002003425A00274BA0005" +
          "D400009BFFC439D0E74397FEFEB6BDB786140000414E4D465400000000" +
          "00000000000F00000F0000"),
        lit("280000"), // frame 1 duration stays 40 ms
        lit("00565038203C000000F001009D012A1000100002C04C25B00274010F0C" +
          "12F2E44000FEF9527D589C0276F91644594E47952BFDAE2A6D5FB0FFFD" +
          "310DAFEEDB7E6084000000"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.videoMeta(unhex(webmHex)).as("m"))
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.duration_ms").as("duration_ms"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.tracks").as("tracks"))
    }, Some("""
      SELECT doc_id, 'webp' AS format,
        CAST(80 + doc_id % 500 AS BIGINT) AS duration_ms,
        CAST(17 AS INT) AS width, CAST(31 AS INT) AS height,
        CAST(1 AS INT) AS tracks
      FROM documents""")),

    // WebP EXIF orientation (round-13 ExifOrientationExpr route): per
    // doc a WebP extended container with an EXIF chunk carrying the
    // same TIFF IFD0 blob is synthesized from doc_id — raw TIFF for
    // doc_id%2==0, "Exif\0\0"-prefixed (the JPEG-style variant some
    // muxers keep) for %2==1. The oracle replays the orientation
    // arithmetic.
    QueryDef("q_exif_webp", (s, dir) => {
      def hx1(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      val o = (pmod(col("doc_id"), lit(8)) + 1).cast("int")
      val tiff = concat(
        lit("49492A00" + "08000000" + "0100" +
          "12010300" + "01000000"),
        hx1(o), lit("000000" + "00000000"))
      val raw = concat(
        lit("52494646" + "26000000" + "57454250" +
          "45584946" + "1A000000"), tiff)
      val prefixed = concat(
        lit("52494646" + "2C000000" + "57454250" +
          "45584946" + "20000000" + "457869660000"), tiff)
      val payload = unhex(
        when(pmod(col("doc_id"), lit(2)) === 0, raw).otherwise(prefixed))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.exifOrientation(payload).as("orientation"))
    }, Some("""
      SELECT doc_id, CAST(1 + doc_id % 8 AS INT) AS orientation
      FROM documents""")),

    // PDF text extraction (round-14 PdfTextExpr, ISO 32000-1): per doc
    // a complete classic-xref one-page PDF — catalog/pages/page/font +
    // a content stream showing a 40-char hex string via Tj — is
    // synthesized around the doc's own sanitized content prefix; the
    // shell is fixed-width (every offset in the embedded xref table is
    // byte-exact), the version digit and Info /Title vary per doc.
    // pdf_text must hand the exact constructed text back; DuckDB
    // replays the sanitization. The spec's fixture matrix
    // (PdfSpec/make_pdf_fixtures.py) covers the compressed/Type0/
    // ObjStm/reconstruction paths this single-scan oracle can't.
    QueryDef("q_pdf_text", (s, dir) => {
      val payload = unhex(SamplingPackQueries.pdfShellHex(col("doc_id"),
        col("text")))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.pdfText(payload).as("txt"))
    }, Some("""
      SELECT doc_id,
             rpad(regexp_replace(substring(text, 1, 60),
                                 '[^a-zA-Z0-9 .,]', '', 'g'), 40, '.') AS txt
      FROM documents""")),

    // PDF metadata (round-14 PdfMetaExpr): the same synthesized shell,
    // auditing header version, page-tree leaf count, the /Encrypt
    // flag, and Info-dict strings without touching page content.
    QueryDef("q_pdf_meta", (s, dir) => {
      val payload = unhex(SamplingPackQueries.pdfShellHex(col("doc_id"),
        col("text")))
      val m = Multimodal.pdfMeta(payload)
      t(s, dir, "documents")
        .select(col("doc_id"), m.getField("version").as("version"),
          m.getField("pages").as("pages"),
          m.getField("encrypted").as("encrypted"),
          m.getField("title").as("title"),
          m.getField("producer").as("producer"))
    }, Some("""
      SELECT doc_id,
             '1.' || CAST(doc_id % 8 AS VARCHAR) AS version,
             CAST(1 AS INT) AS pages,
             FALSE AS encrypted,
             rpad(regexp_replace(substring(text, 1, 30),
                                 '[^a-zA-Z0-9 .,]', '', 'g'), 24, 't') AS title,
             'graft' AS producer
      FROM documents""")),

    // Crawl-chain composition: an HTTP/1.1 response carrying
    // Content-Type: application/pdf -> http_response keeps the body
    // as bytes (binary type, no text decode) -> pdf_text extracts the
    // document text. Two round-14 expressions chained in one
    // map-side projection, zero shuffle.
    QueryDef("q_pdf_ingest", (s, dir) => {
      val http = lit(("HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n" +
        "\r\n").getBytes("ISO-8859-1").map("%02X".format(_)).mkString)
      val payload = unhex(concat(http,
        SamplingPackQueries.pdfShellHex(col("doc_id"), col("text"))))
      val r = Multimodal.httpResponse(payload)
      t(s, dir, "documents")
        .select(col("doc_id"), r.getField("status").as("status"),
          Multimodal.pdfText(r.getField("body")).as("txt"))
    }, Some("""
      SELECT doc_id, CAST(200 AS INT) AS status,
             rpad(regexp_replace(substring(text, 1, 60),
                                 '[^a-zA-Z0-9 .,]', '', 'g'), 40, '.') AS txt
      FROM documents""")),

    // Document-ingestion E2E (round-14 certification): one chain
    // over a mixed crawl — per doc an HTTP response whose body is a
    // PDF, a docx, or an HTML page by doc_id%3; http_response parses
    // the message, the Content-Type header dispatches to
    // pdf_text / office_text / html_text, and every branch's
    // extracted text replays in DuckDB. The real-corpus shape: one
    // scan, one projection, zero shuffle, three decoders behind one
    // CASE.
    QueryDef("q_doc_ingest_e2e", (s, dir) => {
      val txt = rpad(regexp_replace(substring(col("text"), 1, 60),
        "[^a-zA-Z0-9 .,]", ""), 40, ".")
      val branch = pmod(col("doc_id"), lit(3))
      // bodies (hex): the fixed-offset shells used by q_pdf_text /
      // q_office_text, and a plain html page
      val pdfHex = SamplingPackQueries.pdfShellHex(col("doc_id"), col("text"))
      val xmlHex = concat(lit(SamplingPackQueries.DocxXmlPre), hex(txt),
        lit(SamplingPackQueries.DocxXmlPost))
      val crcHex = lpad(hex(crc32(unhex(xmlHex))), 8, "0")
      val crcLe = concat(substring(crcHex, 7, 2), substring(crcHex, 5, 2),
        substring(crcHex, 3, 2), substring(crcHex, 1, 2))
      val docxHex = concat(lit(SamplingPackQueries.DocxZipL1), crcLe,
        lit(SamplingPackQueries.DocxZipL2), xmlHex,
        lit(SamplingPackQueries.DocxZipC1), crcLe,
        lit(SamplingPackQueries.DocxZipC2))
      val htmlHex = hex(concat(lit("<html><body><p>"), txt,
        lit("</p></body></html>")))
      val ct = when(branch === 0, "application/pdf")
        .when(branch === 1,
          "application/vnd.openxmlformats-officedocument.wordprocessingml.document")
        .otherwise("text/html; charset=utf-8")
      val bodyHex = when(branch === 0, pdfHex)
        .when(branch === 1, docxHex).otherwise(htmlHex)
      val payload = unhex(concat(
        hex(concat(lit("HTTP/1.1 200 OK\r\nContent-Type: "), ct,
          lit("\r\n\r\n"))), bodyHex))
      val r = Multimodal.httpResponse(payload)
      val extracted = when(branch === 0, Multimodal.pdfText(r.getField("body")))
        .when(branch === 1,
          Multimodal.officeText(r.getField("body")).getField("text"))
        .otherwise(Multimodal.htmlText(r.getField("text")))
      t(s, dir, "documents")
        .select(col("doc_id"), r.getField("status").as("status"),
          r.getField("content_type").as("content_type"),
          extracted.as("txt"))
    }, Some("""
      SELECT doc_id, CAST(200 AS INT) AS status,
             CASE doc_id % 3
               WHEN 0 THEN 'application/pdf'
               WHEN 1 THEN 'application/vnd.openxmlformats-officedocument.wordprocessingml.document'
               ELSE 'text/html; charset=utf-8'
             END AS content_type,
             CASE WHEN doc_id % 3 = 2
               THEN regexp_replace(rpad(regexp_replace(substring(text, 1, 60),
                                        '[^a-zA-Z0-9 .,]', '', 'g'), 40, '.'),
                                   ' +', ' ', 'g')
               ELSE rpad(regexp_replace(substring(text, 1, 60),
                                        '[^a-zA-Z0-9 .,]', '', 'g'), 40, '.')
             END AS txt
      FROM documents""")),

    // JPEG XL metadata (round-14 jxlSize, ISO 18181-1 SizeHeader):
    // per doc a bare codestream in the small square form — LSB-first
    // bits small=1 | ysize5 | ratio=1 pack to one byte 0x41|(v<<1) —
    // dimensions replayed from doc_id; the non-small selectors, the
    // full ratio table, and the BMFF jxlc container route are pinned
    // in ImageMetaSpec.
    QueryDef("q_image_meta_jxl", (s, dir) => {
      val v = pmod(col("doc_id"), lit(32))
      val payload = unhex(concat(lit("FF0A"),
        lpad(hex(lit(0x41) + v * 2), 2, "0"), lit("00")))
      val m = Multimodal.imageMeta(payload)
      t(s, dir, "documents")
        .select(col("doc_id"), m.getField("format").as("format"),
          m.getField("width").as("width"), m.getField("height").as("height"))
    }, Some("""
      SELECT doc_id, 'jxl' AS format,
             CAST(8 * (doc_id % 32 + 1) AS INT) AS width,
             CAST(8 * (doc_id % 32 + 1) AS INT) AS height
      FROM documents""")),

    // Markdown normalization (round-14 MarkdownTextExpr): per doc a
    // markdown document authored from its own text — ATX heading,
    // bold span, inline link — whose stripped form is replayed as
    // plain concatenation in DuckDB. The fence/table/quote/list
    // matrix is pinned in TextStripSpec.
    QueryDef("q_markdown_text", (s, dir) => {
      def clean(n: Int, len: Int) = concat(lit("w"),
        rpad(regexp_replace(substring(col("text"), n, 40),
          "[^a-zA-Z ]", ""), len, "m"))
      val mdSrc = concat(lit("# "), clean(1, 12), lit("\n\n**"), clean(5, 8),
        lit("** ["), clean(9, 8), lit("](https://example.org/x)"))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.markdownText(mdSrc).as("txt"))
    }, Some("""
      SELECT doc_id,
        'w' || rpad(regexp_replace(substring(text, 1, 40), '[^a-zA-Z ]', '', 'g'), 12, 'm')
        || chr(10) || chr(10) ||
        'w' || rpad(regexp_replace(substring(text, 5, 40), '[^a-zA-Z ]', '', 'g'), 8, 'm')
        || ' ' ||
        'w' || rpad(regexp_replace(substring(text, 9, 40), '[^a-zA-Z ]', '', 'g'), 8, 'm')
        AS txt
      FROM documents""")),

    // HTML normalization (round-14 HtmlTextExpr): the crawl chain's
    // last step as one expression — an html document authored from
    // the doc's text, tag-stripped with block-level line breaks and
    // whitespace collapse, replayed in DuckDB (the same collapse).
    QueryDef("q_html_text", (s, dir) => {
      def clean(n: Int) = rpad(regexp_replace(substring(col("text"), n, 40),
        "[^a-zA-Z0-9 .,]", ""), 24, "h")
      val html = concat(
        lit("<html><head><title>skip me</title><style>p{}</style></head>" +
          "<body><h1>"), clean(1),
        lit("</h1><p>"), clean(3),
        lit(" <b>bold</b></p><script>var x=1;</script></body></html>"))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.htmlText(html).as("txt"))
    }, Some("""
      SELECT doc_id,
        regexp_replace(rpad(regexp_replace(substring(text, 1, 40),
                                           '[^a-zA-Z0-9 .,]', '', 'g'), 24, 'h'),
                       ' +', ' ', 'g')
        || chr(10) ||
        regexp_replace(rpad(regexp_replace(substring(text, 3, 40),
                                           '[^a-zA-Z0-9 .,]', '', 'g'), 24, 'h')
                         || ' ',
                       ' +', ' ', 'g')
        || 'bold' AS txt
      FROM documents""")),

    // Feed parsing (round-14 FeedEntriesExpr): per doc an RSS 2.0
    // document authored in-query — channel title + two items (one
    // with entity-encoded title, link, pubDate, description; one
    // minimal) — exploded to entry rows and replayed in DuckDB. The
    // Atom/RDF shapes, CDATA, dc:creator, and link-rel preference
    // are pinned in FeedEntriesSpec.
    QueryDef("q_feed_entries", (s, dir) => {
      val t1 = rpad(regexp_replace(substring(col("text"), 1, 30),
        "[^a-zA-Z0-9 .,]", ""), 16, "f")
      val xml = concat(
        lit("<?xml version=\"1.0\"?><rss version=\"2.0\"><channel>" +
          "<title>corpus feed</title><item><title>"), t1,
        lit("</title><link>https://example.org/doc/"), col("doc_id"),
        lit("</link><pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>" +
          "<description>summary &amp; detail</description></item>" +
          "<item><title>static second</title>" +
          "<link>https://example.org/static</link></item>" +
          "</channel></rss>"))
      val f = Multimodal.feedEntries(xml.cast("binary"))
      t(s, dir, "documents")
        .select(col("doc_id"), f.getField("format").as("format"),
          f.getField("feed_title").as("feed_title"),
          explode(f.getField("entries")).as("e"))
        .select(col("doc_id"), col("format"), col("feed_title"),
          col("e.title").as("title"), col("e.link").as("link"),
          col("e.published").as("published"),
          col("e.summary").as("summary"))
    }, Some("""
      SELECT doc_id, 'rss' AS format, 'corpus feed' AS feed_title,
             title, link, published, summary FROM (
        SELECT doc_id,
               trim(rpad(regexp_replace(substring(text, 1, 30),
                                        '[^a-zA-Z0-9 .,]', '', 'g'), 16, 'f'),
                    ' ') AS title,
               'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS link,
               'Mon, 01 Jan 2024 00:00:00 GMT' AS published,
               'summary & detail' AS summary
        FROM documents
        UNION ALL
        SELECT doc_id, 'static second', 'https://example.org/static',
               NULL, NULL
        FROM documents
      )""")),

    // Email chain (round-14 MboxMessagesExpr + EmailMessageExpr): per
    // doc a two-message unix mbox authored in-query — message 1
    // carries a B-encoded-word subject (base64 round-trip) and a
    // base64 body built from the doc's text, message 2 a plain 7bit
    // body; mbox split -> explode -> header/body extraction all
    // map-side. The python-email fixture matrix (QP soft breaks,
    // multipart/alternative, attachments, >From quoting) is pinned
    // in EmailSpec.
    QueryDef("q_email_mbox", (s, dir) => {
      val subj = rpad(regexp_replace(substring(col("text"), 1, 20),
        "[^a-zA-Z0-9.,]", ""), 12, "t")
      val body1 = concat(lit("body: "), rpad(regexp_replace(
        substring(col("text"), 1, 60), "[^a-zA-Z0-9 .,]", ""), 40, "."))
      val msg1 = concat(
        lit("From d0 Thu Jan  1 00:00:00 2024\nFrom: d"), col("doc_id"),
        lit("@example.org\nTo: corpus@example.org\nSubject: =?utf-8?B?"),
        base64(subj.cast("binary")), lit("?=\nDate: Mon, 01 Jan 2024 00:00:00 +0000\n" +
          "Content-Type: text/plain; charset=\"utf-8\"\n" +
          "Content-Transfer-Encoding: base64\n\n"),
        base64(body1.cast("binary")), lit("\n\n"))
      val msg2 = concat(
        lit("From d1 Thu Jan  1 00:00:00 2024\nFrom: second@example.org\n" +
          "Subject: plain two\n\nbody: constant second message\n"))
      val payload = concat(msg1, msg2).cast("binary")
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(Multimodal.mboxMessages(payload)).as("m"))
        .select(col("doc_id"), Multimodal.emailMessage(col("m")).as("e"))
        .select(col("doc_id"), col("e.from").as("from_hdr"),
          col("e.subject").as("subject"), col("e.text").as("body"))
    }, Some("""
      SELECT doc_id, from_hdr, subject, body FROM (
        SELECT doc_id,
               'd' || CAST(doc_id AS VARCHAR) || '@example.org' AS from_hdr,
               rpad(regexp_replace(substring(text, 1, 20),
                                   '[^a-zA-Z0-9.,]', '', 'g'), 12, 't')
                 AS subject,
               'body: ' || rpad(regexp_replace(substring(text, 1, 60),
                                               '[^a-zA-Z0-9 .,]', '', 'g'),
                                40, '.') AS body
        FROM documents
        UNION ALL
        SELECT doc_id, 'second@example.org', 'plain two',
               'body: constant second message'
        FROM documents
      )""")),

    // tar walk (round-14 TarEntriesExpr): per doc a one-member ustar
    // archive — the 512-byte header (name doc.txt, size 40, checksum)
    // is the CONSTANT python-tarfile output, so only the member data
    // varies and the header checksum stays byte-exact; data padded to
    // its 512 block + the two terminator blocks. GNU long names and
    // pax unicode records are pinned in TarSubtitleSpec against
    // python-tarfile dialect fixtures.
    QueryDef("q_tar_entries", (s, dir) => {
      val txt = rpad(regexp_replace(substring(col("text"), 1, 60),
        "[^a-zA-Z0-9 .,]", ""), 40, ".")
      val payload = unhex(concat(lit(SamplingPackQueries.TarDocHeader),
        hex(txt), lit("00" * (472 + 1024))))
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(Multimodal.tarEntries(payload)).as("e"))
        .select(col("doc_id"), col("e.name").as("name"),
          col("e.size").as("size"), col("e.type").as("tar_type"),
          col("e.data").cast("string").as("entry_text"))
    }, Some("""
      SELECT doc_id, 'doc.txt' AS name, CAST(40 AS BIGINT) AS size,
             'file' AS tar_type,
             rpad(regexp_replace(substring(text, 1, 60),
                                 '[^a-zA-Z0-9 .,]', '', 'g'), 40, '.')
               AS entry_text
      FROM documents""")),

    // Subtitle cues (round-14 SubtitleCuesExpr): per doc a two-cue
    // SRT authored in-query from the doc's own text and doc_id-derived
    // timestamps; the cue index, ms conversions, multi-line join and
    // markup stripping replay in DuckDB. WebVTT (short timestamps,
    // settings, NOTE blocks, voice tags) is pinned in TarSubtitleSpec.
    QueryDef("q_subtitle_cues", (s, dir) => {
      val sec = lpad(pmod(col("doc_id"), lit(60)).cast("string"), 2, "0")
      // no spaces in the cue line: the parser trims each text line,
      // so leading/trailing spaces would not replay
      val line1 = rpad(regexp_replace(substring(col("text"), 1, 40),
        "[^a-zA-Z0-9.,]", ""), 20, "x")
      val srt = concat(
        lit("1\n00:00:"), sec, lit(",000 --> 00:01:"), sec,
        lit(",500\n<i>"), line1, lit("</i>\nsecond line\n\n2\n"),
        lit("00:02:00,000 --> 00:02:05,000\nclosing cue\n"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(Multimodal.subtitleCues(srt.cast("binary"))).as("c"))
        .select(col("doc_id"), col("c.idx").as("idx"),
          col("c.start_ms").as("start_ms"), col("c.end_ms").as("end_ms"),
          col("c.text").as("cue_text"))
    }, Some("""
      SELECT doc_id, idx, start_ms, end_ms, cue_text FROM (
        SELECT doc_id, 1 AS idx,
               (doc_id % 60) * 1000 AS start_ms,
               60000 + (doc_id % 60) * 1000 + 500 AS end_ms,
               rpad(regexp_replace(substring(text, 1, 40),
                                   '[^a-zA-Z0-9.,]', '', 'g'), 20, 'x')
                 || chr(10) || 'second line' AS cue_text
        FROM documents
        UNION ALL
        SELECT doc_id, 2, 120000, 125000, 'closing cue' FROM documents
      )""")),

    // Media tags (round-14 MediaTagsExpr): per doc a fixed-layout
    // ID3v2.3 tag — latin-1 TIT2/TPE1/TRCK/TYER frames of constant
    // width so every size field is byte-exact — built from the doc's
    // own sanitized text; the v2.2/v2.4 layouts, UTF-16 encodings,
    // COMM framing, ID3v1 merge, Vorbis/Opus/FLAC comments, MP4
    // ilst and RIFF INFO are pinned in MediaTagsSpec.
    QueryDef("q_media_tags", (s, dir) => {
      val title = rpad(regexp_replace(substring(col("text"), 1, 40),
        "[^a-zA-Z0-9 .,]", ""), 24, ".")
      val artist = rpad(col("source"), 16, "_")
      val track = lpad((pmod(col("doc_id"), lit(99)) + 1).cast("string"), 2, "0")
      // "ID3" v2.3, flags 0, syncsafe size 90 = the four fixed frames
      val payload = unhex(concat(
        lit("4944330300" + "00" + "0000005A"),
        lit("54495432" + "00000019" + "0000" + "00"), hex(title),
        lit("54504531" + "00000011" + "0000" + "00"), hex(artist),
        lit("5452434B" + "00000003" + "0000" + "00"), hex(track),
        lit("54594552" + "00000005" + "0000" + "00" + "32303234")))
      val m = Multimodal.mediaTags(payload)
      t(s, dir, "documents")
        .select(col("doc_id"), m.getField("format").as("format"),
          element_at(m.getField("tags"), "title").as("title"),
          element_at(m.getField("tags"), "artist").as("artist"),
          element_at(m.getField("tags"), "track").as("track"),
          element_at(m.getField("tags"), "date").as("tag_date"))
    }, Some("""
      SELECT doc_id, 'id3v2' AS format,
             trim(rpad(regexp_replace(substring(text, 1, 40),
                                      '[^a-zA-Z0-9 .,]', '', 'g'), 24, '.'),
                  ' ') AS title,
             trim(rpad(source, 16, '_'), ' ') AS artist,
             lpad(CAST(doc_id % 99 + 1 AS VARCHAR), 2, '0') AS track,
             '2024' AS tag_date
      FROM documents""")),

    // Office document text (round-14 OfficeTextExpr over the
    // ZipEntriesExpr container walk): per doc a real one-entry docx —
    // stored word/document.xml with a correct CRC-32 (computed
    // in-query via crc32(), spliced little-endian into both the
    // local and central headers at fixed offsets) around the doc's
    // sanitized 40-char text in a w:t run. The pptx/xlsx/odf/epub
    // shapes and deflate entries are pinned in OfficeTextSpec
    // against python-zipfile-built fixtures.
    QueryDef("q_office_text", (s, dir) => {
      val txt = rpad(regexp_replace(substring(col("text"), 1, 60),
        "[^a-zA-Z0-9 .,]", ""), 40, ".")
      val xmlHex = concat(lit(SamplingPackQueries.DocxXmlPre), hex(txt),
        lit(SamplingPackQueries.DocxXmlPost))
      val crcHex = lpad(hex(crc32(unhex(xmlHex))), 8, "0")
      val crcLe = concat(substring(crcHex, 7, 2), substring(crcHex, 5, 2),
        substring(crcHex, 3, 2), substring(crcHex, 1, 2))
      val payload = unhex(concat(lit(SamplingPackQueries.DocxZipL1), crcLe,
        lit(SamplingPackQueries.DocxZipL2), xmlHex,
        lit(SamplingPackQueries.DocxZipC1), crcLe,
        lit(SamplingPackQueries.DocxZipC2)))
      val o = Multimodal.officeText(payload)
      t(s, dir, "documents")
        .select(col("doc_id"), o.getField("format").as("format"),
          o.getField("text").as("txt"))
    }, Some("""
      SELECT doc_id, 'docx' AS format,
             rpad(regexp_replace(substring(text, 1, 60),
                                 '[^a-zA-Z0-9 .,]', '', 'g'), 40, '.') AS txt
      FROM documents""")),

    // ZIP container walk (round-14 ZipEntriesExpr): the same per-doc
    // archive exploded to its entry rows — name, declared vs stored
    // sizes, method, and the entry bytes surfaced as text.
    QueryDef("q_zip_entries", (s, dir) => {
      val txt = rpad(regexp_replace(substring(col("text"), 1, 60),
        "[^a-zA-Z0-9 .,]", ""), 40, ".")
      val xmlHex = concat(lit(SamplingPackQueries.DocxXmlPre), hex(txt),
        lit(SamplingPackQueries.DocxXmlPost))
      val crcHex = lpad(hex(crc32(unhex(xmlHex))), 8, "0")
      val crcLe = concat(substring(crcHex, 7, 2), substring(crcHex, 5, 2),
        substring(crcHex, 3, 2), substring(crcHex, 1, 2))
      val payload = unhex(concat(lit(SamplingPackQueries.DocxZipL1), crcLe,
        lit(SamplingPackQueries.DocxZipL2), xmlHex,
        lit(SamplingPackQueries.DocxZipC1), crcLe,
        lit(SamplingPackQueries.DocxZipC2)))
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(Multimodal.zipEntries(payload)).as("e"))
        .select(col("doc_id"), col("e.name").as("name"),
          col("e.size").as("size"), col("e.method").as("method"),
          col("e.data").cast("string").as("entry_text"))
    }, Some("""
      SELECT doc_id, 'word/document.xml' AS name, CAST(148 AS BIGINT) AS size,
             'stored' AS method,
             '<?xml version="1.0"?><w:document xmlns:w="x"><w:body><w:p><w:r><w:t>'
               || rpad(regexp_replace(substring(text, 1, 60),
                                      '[^a-zA-Z0-9 .,]', '', 'g'), 40, '.')
               || '</w:t></w:r></w:p></w:body></w:document>' AS entry_text
      FROM documents""")),

    // PDF decryption (round-14 PdfCrypt, ISO 32000 §7.6 Standard
    // security handler): the shell is a V4/R4 crypt-filter document
    // with /StmF /Identity and /StrF /StdCF (CFM V2 = 128-bit RC4) —
    // the per-doc content stream rides in the clear (so the oracle
    // can replay it) while opening the document still requires the
    // full empty-user-password authentication (algorithms 2+5 against
    // /O //U) and the Info /Title is real RC4 ciphertext decrypted
    // with the object-6 key. The all-ciphertext revisions (R2/R3
    // RC4, R4 AESV2, R6 AES-256) are pinned in PdfSpec against the
    // independent python `cryptography` encryptors.
    QueryDef("q_pdf_decrypt", (s, dir) => {
      val txt = rpad(regexp_replace(substring(col("text"), 1, 60),
        "[^a-zA-Z0-9 .,]", ""), 40, ".")
      val payload = unhex(concat(lit(SamplingPackQueries.PdfEncShellPre),
        hex(hex(txt)), lit(SamplingPackQueries.PdfEncShellPost)))
      val m = Multimodal.pdfMeta(payload)
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.pdfText(payload).as("txt"),
          m.getField("title").as("title"),
          m.getField("encrypted").as("encrypted"))
    }, Some("""
      SELECT doc_id,
             rpad(regexp_replace(substring(text, 1, 60),
                                 '[^a-zA-Z0-9 .,]', '', 'g'), 40, '.') AS txt,
             'Secret title' AS title,
             TRUE AS encrypted
      FROM documents""")),

    // EXIF orientation from AVIF/HEIC containers (round-14 bmffExif —
    // the ISO 23008-12 META-item walk): per doc an avif whose iinf
    // names an 'Exif' item and whose iloc points (absolute offsets,
    // v0) at an mdat-held ExifDataBlock — evens with
    // exif_tiff_header_offset 0 and a bare TIFF, odds keeping the
    // JPEG-style "Exif\0\0" prefix with the offset pointing past it
    // (both writer conventions). Orientation replayed from doc_id.
    QueryDef("q_exif_bmff", (s, dir) => {
      def hx1(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      val o = (pmod(col("doc_id"), lit(8)) + 1).cast("int")
      val shell = "000000146674797061766966000000006D6966310000004D" +
        "6D657461000000000000002369696E660000000000010000001569" +
        "6E6665020000000001000045786966000000001E696C6F6300000000" +
        "44000001000100000001"
      val raw = concat(
        lit(shell + "000000690000001E" + "000000266D64617400000000" +
          "49492A00" + "08000000" + "0100" + "12010300" + "01000000"),
        hx1(o), lit("000000" + "00000000"))
      val prefixed = concat(
        lit(shell + "0000006900000024" + "0000002C6D64617400000006" +
          "457869660000" +
          "49492A00" + "08000000" + "0100" + "12010300" + "01000000"),
        hx1(o), lit("000000" + "00000000"))
      val payload = unhex(
        when(pmod(col("doc_id"), lit(2)) === 0, raw).otherwise(prefixed))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.exifOrientation(payload).as("orientation"))
    }, Some("""
      SELECT doc_id, CAST(1 + doc_id % 8 AS INT) AS orientation
      FROM documents""")),

    // EXIF orientation (ExifOrientationExpr): per doc a JPEG APP1
    // segment with a real TIFF 6.0 IFD0 carrying tag 0x0112 is
    // synthesized from doc_id — little-endian (II) for doc_id%3==0,
    // big-endian (MM) for %3==1 (the SHORT value is left-justified in
    // the entry's 4-byte value field per the TIFF spec, so the two
    // layouts differ), and an EXIF-less JFIF stream for %3==2 (-> 0).
    // The oracle replays the orientation arithmetic.
    QueryDef("q_exif_orientation", (s, dir) => {
      def hx1(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      val o = (pmod(col("doc_id"), lit(8)) + 1).cast("int")
      val exifLe = concat(
        lit("FFD8" + "FFE10022" + "457869660000" +
          "49492A00" + "08000000" + "0100" +
          "12010300" + "01000000"),
        hx1(o), lit("000000" + "00000000" + "FFD9"))
      val exifBe = concat(
        lit("FFD8" + "FFE10022" + "457869660000" +
          "4D4D002A" + "00000008" + "0001" +
          "01120003" + "00000001" + "00"),
        hx1(o), lit("0000" + "00000000" + "FFD9"))
      val plain = lit("FFD8" +
        "FFE000104A46494600010100000100010000" + "FFD9")
      val payload = unhex(
        when(pmod(col("doc_id"), lit(3)) === 0, exifLe)
          .when(pmod(col("doc_id"), lit(3)) === 1, exifBe)
          .otherwise(plain))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.exifOrientation(payload).as("orientation"))
    }, Some("""
      SELECT doc_id,
        CAST(CASE WHEN doc_id % 3 = 2 THEN 0
          ELSE 1 + doc_id % 8 END AS INT) AS orientation
      FROM documents""")),

    // PNG Adam7 interlace + 16-bit depth decode (round-11
    // ImageDecodeExpr surfaces): evens an INTERLACED 2x2 RGB8 PNG
    // whose three non-empty Adam7 passes carry the pixels in pass
    // order (pass1: (0,0); pass6: (1,0); pass7: (0,1),(1,1)) inside a
    // STORED-deflate block — the decoder must scatter them back to
    // raster order; odds a non-interlaced 2x2 gray16 PNG where each
    // sample's MSB is v(i,0) and the LSB is v(i,1) — the decoder must
    // fold to the MSB. Oracle replays both from the doc_id arithmetic
    // (same v() formula as q_image_decode).
    QueryDef("q_png_advanced", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def v(i: Int, c: Int) = pmod(col("doc_id") * 7 + i * 13 + c * 29,
        lit(256)).cast("int")
      def rgb(i: Int) = concat(hx(v(i, 0)), hx(v(i, 1)), hx(v(i, 2)))
      def g16(i: Int) = concat(hx(v(i, 0)), hx(v(i, 1))) // MSB, LSB
      // interlaced RGB8: IHDR(2x2, d8, ct2, interlace 1); raw stream =
      // pass1 row [00 px0] + pass6 row [00 px1] + pass7 row [00 px2 px3]
      val ilaceHex = concat(
        lit("89504E470D0A1A0A" + "0000000D" + "49484452" +
          "00000002" + "00000002" + "08" + "02" + "0000" + "01" +
          "00000000" +
          "00000016" + "49444154" + "7801" + "01" + "0F00" + "F0FF" + "00"),
        rgb(0), lit("00"), rgb(1), lit("00"), rgb(2), rgb(3),
        lit("00000000" + "00000000" + "49454E44" + "00000000"))
      // gray16: IHDR(2x2, d16, ct0); rows [00 s0 s1] [00 s2 s3], 2B each
      val g16Hex = concat(
        lit("89504E470D0A1A0A" + "0000000D" + "49484452" +
          "00000002" + "00000002" + "10" + "00" + "0000" + "00" +
          "00000000" +
          "00000011" + "49444154" + "7801" + "01" + "0A00" + "F5FF" + "00"),
        g16(0), g16(1), lit("00"), g16(2), g16(3),
        lit("00000000" + "00000000" + "49454E44" + "00000000"))
      val payload = unhex(
        when(col("doc_id") % 2 === 0, ilaceHex).otherwise(g16Hex))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.decodeImage(payload).as("d"))
        .select(col("doc_id"), col("d.format").as("format"),
          col("d.width").as("width"), col("d.height").as("height"),
          element_at(col("d.pixels"), 1).as("p0"),
          element_at(col("d.pixels"), 2).as("p1"),
          element_at(col("d.pixels"), 3).as("p2"),
          element_at(col("d.pixels"), 4).as("p3"))
    }, Some("""
      SELECT doc_id, 'png' AS format, 2 AS width, 2 AS height,
        """ + (0 to 3).map(i =>
          s"""CAST(CASE WHEN doc_id % 2 = 0 THEN
              (doc_id*7 + $i*13) % 256 * 65536
              + (doc_id*7 + $i*13 + 29) % 256 * 256
              + (doc_id*7 + $i*13 + 58) % 256
            ELSE (doc_id*7 + $i*13) % 256 * 65793 END
            - 16777216 AS INTEGER) AS p$i""").mkString(",\n        ") + """
      FROM documents""")),

    // REAL JPEG pixel decode (JpegDecode via ImageDecodeExpr): per doc
    // a complete VALID baseline JPEG is synthesized from doc_id with
    // pure builtins — evens a grayscale 8x8, odds a 4:4:4 color 8x8
    // (negative chroma DC when doc_id%4==3) — with REAL Huffman tables
    // (DC: cat0='0', cat5='10'; AC: EOB='0'), two quant tables (17
    // luma / 23 chroma) and DC-only blocks, so each component's scan
    // data is exactly one byte 0x80|(field<<1). The decoder runs the
    // full pipeline (marker walk, canonical Huffman, dequant, islow
    // IDCT incl. its DESCALE round-half-up — q=17/23 make the rounding
    // bite — level shift, fixed-point YCbCr->RGB) and the oracle
    // replays the pinned integer arithmetic:
    //   sample = clamp(128 + floor((dc*q + 4)/8))
    //   R = clamp(Y + (91881*(Cr-128)+32768 >> 16)), etc. (IJG tables)
    // p0/p63 are the first/last pixels of the flat raster (equal by
    // construction — proves the full 64-pixel surface was written).
    // The full-AC / 4:2:0 / restart surfaces are proven bit-exact
    // against the JDK's IJG codec in JpegDecodeSpec.
    QueryDef("q_jpeg_decode", (s, dir) => {
      def hx1(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      val dcY = (pmod(col("doc_id"), lit(16)) + 16).cast("int")
      val dcCb = (pmod(col("doc_id") * 3, lit(16)) + 16).cast("int")
      val mag = (pmod(col("doc_id") * 5, lit(16)) + 16).cast("int")
      val dcCr = when(pmod(col("doc_id"), lit(4)) === 3, -mag).otherwise(mag)
      def sb(dc: org.apache.spark.sql.Column) =
        hx1(lit(128) + (when(dc >= 0, dc).otherwise(dc + 31)) * 2)
      val dhtDc = "FFC40015" + "00" + "0101" + "00" * 14 + "0005"
      val dhtAc = "FFC40014" + "10" + "01" + "00" * 15 + "00"
      val grayHex = concat(
        lit("FFD8" + "FFDB0043" + "00" + "11" * 64 +
          "FFC0000B08" + "0008" + "0008" + "01" + "011100" +
          dhtDc + dhtAc + "FFDA000801" + "0100" + "003F00"),
        sb(dcY), lit("FFD9"))
      val colorHex = concat(
        lit("FFD8" + "FFDB0043" + "00" + "11" * 64 +
          "FFDB0043" + "01" + "17" * 64 +
          "FFC0001108" + "0008" + "0008" + "03" +
          "011100" + "021101" + "031101" +
          dhtDc + dhtAc +
          "FFDA000C03" + "0100" + "0200" + "0300" + "003F00"),
        sb(dcY), sb(dcCb), sb(dcCr), lit("FFD9"))
      val payload = unhex(
        when(col("doc_id") % 2 === 0, grayHex).otherwise(colorHex))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.decodeImage(payload).as("d"))
        .select(col("doc_id"), col("d.format").as("format"),
          col("d.width").as("width"), col("d.height").as("height"),
          element_at(col("d.pixels"), 1).as("p0"),
          element_at(col("d.pixels"), 64).as("p63"))
    }, Some("""
      WITH dc AS (
        SELECT doc_id,
          16 + doc_id % 16 AS dcy,
          16 + (doc_id * 3) % 16 AS dcb,
          CASE WHEN doc_id % 4 = 3 THEN -(16 + (doc_id * 5) % 16)
               ELSE 16 + (doc_id * 5) % 16 END AS dcr
        FROM documents),
      planes AS (
        SELECT doc_id,
          LEAST(255, GREATEST(0, 128 + CAST(FLOOR((dcy * 17 + 4) / 8.0) AS INT))) AS ypix,
          LEAST(255, GREATEST(0, 128 + CAST(FLOOR((dcb * 23 + 4) / 8.0) AS INT))) AS cb,
          LEAST(255, GREATEST(0, 128 + CAST(FLOOR((dcr * 23 + 4) / 8.0) AS INT))) AS cr
        FROM dc),
      rgb AS (
        SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN ypix
            ELSE LEAST(255, GREATEST(0, ypix +
              CAST(FLOOR((91881 * (cr - 128) + 32768) / 65536.0) AS INT))) END AS r,
          CASE WHEN doc_id % 2 = 0 THEN ypix
            ELSE LEAST(255, GREATEST(0, ypix +
              CAST(FLOOR((-22554 * (cb - 128) + 32768 + -46802 * (cr - 128)) / 65536.0) AS INT))) END AS g,
          CASE WHEN doc_id % 2 = 0 THEN ypix
            ELSE LEAST(255, GREATEST(0, ypix +
              CAST(FLOOR((116130 * (cb - 128) + 32768) / 65536.0) AS INT))) END AS b
        FROM planes)
      SELECT doc_id, 'jpeg' AS format, 8 AS width, 8 AS height,
        CAST(r * 65536 + g * 256 + b - 16777216 AS INTEGER) AS p0,
        CAST(r * 65536 + g * 256 + b - 16777216 AS INTEGER) AS p63
      FROM rgb""")),

    // REAL audio decode (AudioDecodeExpr): per doc a complete VALID
    // RIFF/WAVE (16-bit stereo PCM, 2 frames) is synthesized from
    // doc_id with pure builtins and decoded back to the exact signed
    // samples — the oracle replays the two's-complement arithmetic.
    // Sample formula: u(i) = (doc_id*11 + i*17) % 65536, stored
    // little-endian; decoded s(i) = u(i) - 65536 when u >= 32768.
    QueryDef("q_audio_decode", (s, dir) => {
      def hx4(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
      def le16(c: org.apache.spark.sql.Column) =
        concat(substring(hx4(c), 3, 2), substring(hx4(c), 1, 2))
      def u(i: Int) = pmod(col("doc_id") * 11 + i * 17, lit(65536)).cast("int")
      val wavHex = concat(
        lit("52494646" + "2C000000" + "57415645" + // RIFF size=44 WAVE
          "666D7420" + "10000000" + "0100" + "0200" + // fmt: pcm, 2ch
          "401F0000" + "007D0000" + "0400" + "1000" + // 8000Hz 16-bit
          "64617461" + "08000000"), // data, 8 bytes
        le16(u(0)), le16(u(1)), le16(u(2)), le16(u(3)))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.decodeAudio(unhex(wavHex)).as("a"))
        .select(col("doc_id"), col("a.format").as("format"),
          col("a.channels").as("channels"),
          col("a.sample_rate").as("sample_rate"),
          col("a.n_samples").as("n_samples"),
          concat_ws(",", col("a.samples").cast("array<string>"))
            .as("samples"))
    }, Some("""
      SELECT doc_id, 'wav' AS format, 2 AS channels,
        8000 AS sample_rate, 2 AS n_samples,
        ARRAY_TO_STRING(list_transform(generate_series(0, 3), i ->
          CAST(CAST((doc_id*11 + i*17) % 65536
            - CASE WHEN (doc_id*11 + i*17) % 65536 >= 32768
              THEN 65536 ELSE 0 END AS INTEGER) AS VARCHAR)), ',')
          AS samples
      FROM documents""")),

    // REAL video-container metadata (VideoMetaExpr — ISO BMFF box
    // walk): per doc a minimal VALID mp4 (ftyp + moov(mvhd + trak/
    // tkhd)) is synthesized from doc_id with pure builtins — big-endian
    // box sizes, a version-0 movie header at timescale 1000 (so
    // duration_ms = the stored duration), 16.16 fixed-point track
    // dimensions — and the expression walks the boxes back out. The
    // oracle recomputes everything from doc_id arithmetic.
    QueryDef("q_video_meta", (s, dir) => {
      def hx4(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
      def be32(c: org.apache.spark.sql.Column) = lpad(hex(c), 8, "0")
      val dur = (col("doc_id") % 9000 + 1000).cast("int")
      val w = (col("doc_id") % 13 * 16 + 320).cast("int")
      val h = (col("doc_id") % 7 * 32 + 180).cast("int")
      val mp4Hex = concat(
        // ftyp(20): major 'isom', minor 0, one compatible brand
        lit("00000014" + "66747970" + "69736F6D" + "00000000" + "69736F6D" +
          // moov(216) { mvhd(108): v0, times 0, timescale 1000, duration,
          // 80 pad; trak(100) { tkhd(92): v0 + 72 pad + w.16 + h.16 } }
          "000000D8" + "6D6F6F76" +
          "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
          "000003E8"),
        be32(dur), lit("00" * 80),
        lit("00000064" + "7472616B" + "0000005C" + "746B6864" +
          "00000000" + "00" * 72),
        hx4(w), lit("0000"), hx4(h), lit("0000"))
      t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.videoMeta(unhex(mp4Hex)).as("m"))
        .select(col("doc_id"), col("m.format").as("format"),
          col("m.duration_ms").as("duration_ms"),
          col("m.width").as("width"), col("m.height").as("height"),
          col("m.tracks").as("tracks"))
    }, Some("""
      SELECT doc_id, 'isom' AS format,
        CAST(doc_id % 9000 + 1000 AS BIGINT) AS duration_ms,
        CAST(doc_id % 13 * 16 + 320 AS INT) AS width,
        CAST(doc_id % 7 * 32 + 180 AS INT) AS height,
        1 AS tracks
      FROM documents""")),

    // Multimodal QUALITY FILTERS over REAL decoded content — the
    // corpus-curation pass the decode family exists for: per doc the
    // q_image_decode BMP and the q_audio_decode WAV are decoded and
    // the standard gate metrics computed in pure Catalyst higher-order
    // functions (no UDF): integer luma sum (too-dark/too-bright image
    // gates), peak |sample| and a clipping flag (broken-audio gates).
    // Every metric is integer-exact and replayed by the oracle from
    // the synthesis arithmetic.
    QueryDef("q_media_quality", (s, dir) => {
      def hx(c: org.apache.spark.sql.Column) = lpad(hex(c), 2, "0")
      def v(i: Int, c: Int) = pmod(col("doc_id") * 7 + i * 13 + c * 29,
        lit(256)).cast("int")
      def bgr(i: Int) = concat(hx(v(i, 2)), hx(v(i, 1)), hx(v(i, 0)))
      val bmpHex = concat(
        lit("424D" + "46000000" + "00000000" + "36000000" +
          "28000000" + "02000000" + "02000000" + "0100" + "1800" +
          "00000000" + "10000000" + "00000000" + "00000000" +
          "00000000" + "00000000"),
        bgr(2), bgr(3), lit("0000"), bgr(0), bgr(1), lit("0000"))
      def hx4(c: org.apache.spark.sql.Column) = lpad(hex(c), 4, "0")
      def le16(c: org.apache.spark.sql.Column) =
        concat(substring(hx4(c), 3, 2), substring(hx4(c), 1, 2))
      def u(i: Int) = pmod(col("doc_id") * 11 + i * 17, lit(65536)).cast("int")
      val wavHex = concat(
        lit("52494646" + "2C000000" + "57415645" +
          "666D7420" + "10000000" + "0100" + "0200" +
          "401F0000" + "007D0000" + "0400" + "1000" +
          "64617461" + "08000000"),
        le16(u(0)), le16(u(1)), le16(u(2)), le16(u(3)))
      val px = Multimodal.decodeImage(unhex(bmpHex)).getField("pixels")
      val smp = Multimodal.decodeAudio(unhex(wavHex)).getField("samples")
      // ITU-R 601 integer luma (x1000): 299*R + 587*G + 114*B
      val lumaSum = aggregate(px, lit(0L), (acc, p) =>
        acc + shiftright(p, 16).bitwiseAND(255).cast("long") * 299L +
          shiftright(p, 8).bitwiseAND(255).cast("long") * 587L +
          p.bitwiseAND(255).cast("long") * 114L)
      val peak = aggregate(smp, lit(0L), (acc, x) =>
        greatest(acc, abs(x.cast("long"))))
      t(s, dir, "documents")
        .select(col("doc_id"), lumaSum.as("luma_sum"), peak.as("peak"))
        .withColumn("img_ok", // 4 px * 255000 max; gate the extremes
          col("luma_sum").between(102000L, 918000L))
        .withColumn("audio_clipped", col("peak") >= 32700L)
    }, Some("""
      WITH m AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(generate_series(0, 3), i ->
            (doc_id*7 + i*13) % 256 * 299
            + (doc_id*7 + i*13 + 29) % 256 * 587
            + (doc_id*7 + i*13 + 58) % 256 * 114)) AS BIGINT) AS luma_sum,
          CAST(list_max(list_transform(generate_series(0, 3), i ->
            abs((doc_id*11 + i*17) % 65536
              - CASE WHEN (doc_id*11 + i*17) % 65536 >= 32768
                THEN 65536 ELSE 0 END))) AS BIGINT) AS peak
        FROM documents)
      SELECT doc_id, luma_sum, peak,
        luma_sum BETWEEN 102000 AND 918000 AS img_ok,
        peak >= 32700 AS audio_clipped
      FROM m""")),

    // Per-domain cap: URL host extraction (parse_url) + keep-first-K per
    // domain — row-level output so the oracle checks the exact kept set.
    QueryDef("q_domain_cap", (s, dir) => {
      val docs = t(s, dir, "documents").withColumn("__url",
        concat(lit("https://w"), col("doc_id") % 2, lit("."), col("source"),
          lit(".example.com/p/"), col("doc_id")))
      val dom = docs.withColumn("domain",
        parse_url(col("__url"), lit("HOST")))
      DataSplit.capPerKey(dom, "domain", "doc_id", 8)
        .select(col("doc_id"), col("domain"))
    }, Some("""
      SELECT doc_id, domain FROM (
        SELECT doc_id, domain,
          ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
        FROM (SELECT doc_id,
                'w' || (doc_id % 2)::VARCHAR || '.' || source ||
                  '.example.com' AS domain
              FROM documents))
      WHERE rn <= 8""")),


    // Z-order (Morton) layout key: the write-side clustering value that
    // makes parquet min/max stats prune multi-dimensional filters
    // (operators.Layout). Row-level oracle: DuckDB recomputes the
    // bit interleave arithmetically, proving the codegen'd expression
    // bit-exact.
    QueryDef("q_zorder", (s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
          graft.operators.Layout.zorder(16,
            col("l_orderkey"), col("l_partkey")).as("z"))
    }, Some("""
      SELECT l_orderkey, l_partkey,
        CAST(list_sum(list_transform(generate_series(0, 15),
          i -> ((((l_orderkey & 65535) >> i) & 1) << (2*i))
             + ((((l_partkey  & 65535) >> i) & 1) << (2*i + 1))))
          AS BIGINT) AS z
      FROM lineitem""")),


    // DSIR importance resampling (Xie et al. 2023, public): select the
    // documents whose unigram distribution is closest to a target domain
    // (here: the lang='en' slice) by log-likelihood-ratio score, sampled
    // without replacement via deterministic hash-Gumbel top-k. Every ln
    // is floor-quantized to k/1024 so the score SUM is exact and
    // order-free; the DuckDB oracle replays the full DAG (vocab cap, raw
    // counts, weights, scoring, Gumbel key, top-k) and checks the exact
    // kept set and scores.
    QueryDef("q_importance_resample", (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Relevance.importanceResample(
        docs, "doc_id", "text", docs.filter(col("lang") === "en"), "text",
        keepN = 200, dim = 1024)
    }, Some("""
      WITH tb AS (
        SELECT ('0x' || substr(md5(word || 'dsir_feat'), 1, 8))::BIGINT
                 % 1024 AS b,
               COUNT(*) AS tcnt
        FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS word
              FROM documents WHERE lang = 'en')
        GROUP BY 1),
      cw AS (
        SELECT doc_id,
          ('0x' || substr(md5(word || 'dsir_feat'), 1, 8))::BIGINT
            % 1024 AS b
        FROM (SELECT doc_id,
                unnest(regexp_extract_all(lower(text), '\S+')) AS word
              FROM documents)),
      raw AS (SELECT b, COUNT(*) AS rcnt FROM cw GROUP BY b),
      base AS (
        SELECT COALESCE(r.b, t.b) AS b, COALESCE(t.tcnt, 0) AS tcnt,
               COALESCE(r.rcnt, 0) AS rcnt
        FROM raw r FULL OUTER JOIN tb t ON r.b = t.b),
      tot AS (SELECT SUM(tcnt) AS t, SUM(rcnt) AS r FROM base),
      wts AS (
        SELECT b,
          floor((ln(CAST(tcnt + 1 AS DOUBLE) / CAST(t + 1024 AS DOUBLE))
               - ln(CAST(rcnt + 1 AS DOUBLE) / CAST(r + 1024 AS DOUBLE)))
            * 1024) / 1024.0 AS weight
        FROM base, tot),
      sc AS (
        SELECT c.doc_id, SUM(w.weight) AS score
        FROM cw c JOIN wts w ON c.b = w.b GROUP BY c.doc_id)
      SELECT doc_id, score, sel_key FROM (
        SELECT d.doc_id, COALESCE(s.score, 0.0) AS score,
          COALESCE(s.score, 0.0) + floor(-ln(-ln(
            (CAST(('0x' || substr(md5(d.doc_id::VARCHAR || 'dsir'), 1, 8))
               ::BIGINT % 1048576 AS DOUBLE) + 0.5) / 1048576.0)) * 1024)
            / 1024.0 AS sel_key
        FROM documents d LEFT JOIN sc s ON d.doc_id = s.doc_id)
      ORDER BY sel_key DESC, doc_id LIMIT 200""")),


    // ---- splitting / sampling / packing ----

    // Deterministic train/val/test split: content-addressed md5 buckets
    // (operators.DataSplit) — pure projection, stable under reruns and
    // repartitioning. The oracle recomputes the same md5-mod in DuckDB,
    // proving the assignment is engine-portable.
    QueryDef("q_split_hash", (s, dir) => {
      DataSplit.assignSplit(t(s, dir, "documents"), "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"))
    }, Some("""
      SELECT CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split,
        COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        MIN(doc_id) AS min_id
      FROM (SELECT doc_id, n_chars,
              ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8))::BIGINT
                % 100 AS b
            FROM documents)
      GROUP BY 1""")),


    // Leakage-guarded split: hash the dedup-GROUP key (normalized-text
    // md5), not the row id, so exact-duplicate documents can never
    // straddle train/test (the eval-contamination bug). Row-level
    // output: the oracle checks the exact assignment of every doc.
    QueryDef("q_group_split", (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("gkey", TextDedup.normalizedHash(col("text")))
      DataSplit.groupAwareSplit(docs, "gkey")
        .select(col("doc_id"), col("gkey"), col("split"))
    }, Some("""
      SELECT doc_id, gkey,
        CASE WHEN b < 80 THEN 'train'
             WHEN b < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM (SELECT doc_id,
              md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS gkey,
              ('0x' || substr(md5(
                md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
                  || 'gsplit'), 1, 8))::BIGINT % 100 AS b
            FROM documents)""")),


    // Deterministic ~5% hash sample — row-level output so the oracle
    // verifies the exact membership, not just the count.
    QueryDef("q_sample_hash", (s, dir) => {
      DataSplit.sampleByHash(t(s, dir, "documents"), "doc_id", 500)
        .select(col("doc_id"), col("lang"))
    }, Some("""
      SELECT doc_id, lang FROM documents
      WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'sample'), 1, 8))::BIGINT
              % 10000 < 500""")),


    // Domain-mixture reweighting: per-source keep rates, deterministic
    // by content hash. Row-level output so the oracle checks exact
    // membership under the target mixture.
    QueryDef("q_mixture_sample", (s, dir) => {
      val rates = (0 until 20).map { i =>
        s"src$i" -> (if (i < 5) 10000 else if (i < 10) 5000 else 1000)
      }.toMap
      DataSplit.mixtureSample(t(s, dir, "documents"), "doc_id", "source",
          rates)
        .select(col("doc_id"), col("source"))
    }, Some("""
      SELECT doc_id, source FROM documents
      WHERE ('0x' || substr(md5(doc_id::VARCHAR || 'mixture'), 1, 8))::BIGINT
              % 10000
        < CASE WHEN source IN ('src0','src1','src2','src3','src4')
                 THEN 10000
               WHEN source IN ('src5','src6','src7','src8','src9')
                 THEN 5000
               ELSE 1000 END""")),


    // END-TO-END curation pipeline: exact-dedup keep-first -> quality
    // gate -> repetition gate -> benchmark decontamination -> train
    // split -> sequence packing, all as ONE composed Spark plan over
    // the operator layer. The oracle replays the identical DAG as a
    // DuckDB CTE chain, so a green row proves the operators compose
    // (each is also oracled individually). At scale the whole thing is
    // one scan + the dedup/pack shuffles — the gates and split are
    // zero-shuffle projections fused into the scan stage.
    QueryDef("q_pipeline_e2e", (s, dir) => {
      val docs = t(s, dir, "documents")
      val deduped = DataSplit.capPerKey(
        docs.withColumn("__h", TextDedup.normalizedHash(col("text"))),
        "__h", "doc_id", 1).drop("__h")
      val filtered = deduped
        .filter(TextAnalysis.qualityScore(col("text")) >= 0.66)
        .filter(round(TextAnalysis.dupNgramFraction(col("text"), 2), 6)
          <= 0.2)
      val bench = docs.filter(col("doc_id") % 50 === 0)
      val contam = TextDedup.contaminated(
        filtered, "doc_id", "text", bench, "text", 5)
      val clean = filtered.join(contam, Seq("doc_id"), "left_anti")
      val train = DataSplit.assignSplit(clean, "doc_id")
        .filter(col("split") === "train")
        .select(col("doc_id"), expr("(n_chars + 3) div 4").as("n_tok"))
      SequencePacking.pack(train, "doc_id", "n_tok", 2048L)
        .select(col("doc_id"), col("n_tok"), col("tok_offset"),
          col("seq_first"), col("pos_in_seq"))
    }, Some("""
      WITH dedup AS (
        SELECT doc_id, text, n_chars FROM (
          SELECT doc_id, text, n_chars,
            ROW_NUMBER() OVER (
              PARTITION BY md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
              ORDER BY doc_id) AS rn
          FROM documents) WHERE rn = 1),
      quality AS (
        SELECT doc_id, text, n_chars FROM dedup
        WHERE ROUND((
            (CASE WHEN LEN(regexp_extract_all(text, '\S+'))
                BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END) +
            (CASE WHEN (LENGTH(text) - LEN(regexp_extract_all(text, '\S+'))
                  + 1.0) / LEN(regexp_extract_all(text, '\S+'))
                BETWEEN 2.5 AND 12.0 THEN 1.0 ELSE 0.0 END) +
            (CASE WHEN CAST(LEN(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
                  AS DOUBLE) / LENGTH(text) <= 0.2
              THEN 1.0 ELSE 0.0 END)) / 3.0, 4) >= 0.66
          AND ROUND(1 - CAST(len(list_distinct(list_transform(
                generate_series(1,
                  greatest(len(string_split(text,' ')) - 1, 1)),
                i -> array_to_string(string_split(text,' ')[i:i+1], ' '))))
                AS DOUBLE)
              / len(list_transform(
                generate_series(1,
                  greatest(len(string_split(text,' ')) - 1, 1)),
                i -> array_to_string(string_split(text,' ')[i:i+1], ' '))),
              6) <= 0.2),
      qgrams AS (
        SELECT doc_id,
          list_transform(
            generate_series(1, greatest(len(string_split(text,' ')) - 4, 1)),
            i -> array_to_string(string_split(text,' ')[i:i+4], ' '))
            AS grams
        FROM quality),
      bgrams AS (
        SELECT list_transform(
            generate_series(1, greatest(len(string_split(text,' ')) - 4, 1)),
            i -> array_to_string(string_split(text,' ')[i:i+4], ' '))
            AS grams
        FROM documents WHERE doc_id % 50 = 0),
      contam AS (
        SELECT DISTINCT q.doc_id
        FROM qgrams q, bgrams b
        WHERE len(list_intersect(q.grams, b.grams)) > 0),
      train AS (
        SELECT doc_id, (n_chars + 3) // 4 AS n_tok FROM quality
        WHERE doc_id NOT IN (SELECT doc_id FROM contam)
          AND ('0x' || substr(md5(doc_id::VARCHAR || 'split'), 1, 8))::BIGINT
                % 100 < 80)
      SELECT doc_id, n_tok,
        off AS tok_offset,
        off // 2048 AS seq_first,
        off % 2048 AS pos_in_seq
      FROM (
        SELECT doc_id, n_tok,
          CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS off
        FROM train)""")),


    // GPT-style sequence packing: global token offsets via the
    // distributed two-phase prefix sum (operators.SequencePacking).
    // The oracle is the SEQUENTIAL definition — DuckDB's global window
    // cumsum — so a green row proves the distributed decomposition is
    // exact. Token proxy: (n_chars+3) div 4, integer in both engines.
    QueryDef("q_seq_pack", (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), expr("(n_chars + 3) div 4").as("n_tok"))
      SequencePacking.pack(docs, "doc_id", "n_tok", 2048L)
        .select(col("doc_id"), col("n_tok"), col("tok_offset"),
          col("seq_first"), col("seq_last"), col("pos_in_seq"))
    }, Some("""
      SELECT doc_id, n_tok,
        off AS tok_offset,
        off // 2048 AS seq_first,
        (off + n_tok - 1) // 2048 AS seq_last,
        off % 2048 AS pos_in_seq
      FROM (
        SELECT doc_id, (n_chars + 3) // 4 AS n_tok,
          CAST(COALESCE(SUM((n_chars + 3) // 4) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS off
        FROM documents)""")),


    // Length-sorted sequence packing: rank the corpus by descending
    // token count (distributed two-phase GlobalRank — never a
    // single-partition window) and pack in RANK order. Sorting before
    // packing is the standard padding/fragmentation reducer (long
    // documents land at window starts instead of straddling
    // boundaries); the emitted per-doc boundary-split flag lets the
    // oracle certify the whole composition, and the split count is
    // strictly comparable to q_seq_pack's arrival-order packing.
    QueryDef("q_pack_sorted", (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), expr("(n_chars + 3) div 4").as("n_tok"))
      val ranked = GlobalRank.withRank(docs, "r",
        col("n_tok").desc, col("doc_id"))
      SequencePacking.pack(ranked, "r", "n_tok", 2048L)
        .select(col("doc_id"), col("n_tok"), col("r"), col("tok_offset"),
          col("seq_first"), col("seq_last"),
          (col("seq_last") > col("seq_first")).as("split"))
        .orderBy(col("r"))
    }, Some("""
      SELECT doc_id, n_tok, r,
        off AS tok_offset,
        off // 2048 AS seq_first,
        (off + n_tok - 1) // 2048 AS seq_last,
        (off + n_tok - 1) // 2048 > off // 2048 AS split
      FROM (
        SELECT doc_id, n_tok,
          row_number() OVER (ORDER BY n_tok DESC, doc_id) AS r,
          CAST(COALESCE(SUM(n_tok) OVER (ORDER BY n_tok DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS off
        FROM (SELECT doc_id, (n_chars + 3) // 4 AS n_tok FROM documents))
      ORDER BY r"""))
  )
}
