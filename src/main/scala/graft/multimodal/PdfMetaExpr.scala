package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** pdf_meta(payload): the corpus-audit header of a PDF —
  * struct<version, pages, encrypted, title, author, subject, creator,
  * producer, created, modified> — without touching page content, so
  * an audit pass over a mixed crawl is cheap even where pdf_text
  * would do real work. NULL for non-PDF payloads; never throws.
  *
  *  - `version` is the header's `%PDF-1.x`, overridden by the
  *    catalog's /Version when newer (§7.5.2 note 2);
  *  - `pages` counts page-tree leaves (the walk [[Pdf.Doc.pages]]
  *    uses, not the root /Count claim — crawls see lying counts);
  *  - `encrypted` is the trailer /Encrypt flag (pdf_text yields NULL
  *    for those; the audit still sees them counted here);
  *  - Info-dict strings decode per §7.9.2.2: UTF-16BE BOM, the
  *    PDF 2.0 UTF-8 BOM, else PDFDocEncoding (the 0x80-0x9E
  *    punctuation block spelled out below); dates stay raw
  *    (`D:YYYYMMDD...`) for the caller to cast.
  *
  * Scale shape: per-row map-side parse, single scan, zero shuffle. */
case class PdfMetaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = PdfMetaExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "pdf_meta"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try eval0(b) catch { case _: Exception => null }
  }

  private def eval0(b: Array[Byte]): Any = {
    val doc = Pdf.open(b)
    if (doc == null) return null
    val version: String = {
      val hdr = {
        var e = 5
        while (e < math.min(b.length, 16) && !PdfMetaExpr.isWsByte(b(e))) e += 1
        val all = new String(b, 0, math.min(b.length, e), "ISO-8859-1")
        val k = all.indexOf("%PDF-")
        if (k >= 0) all.substring(k + 5) else null
      }
      val cat = doc.dict(doc.trailer.get("Root").getOrElse(Pdf.PNull))
      cat.get("Version") match {
        case Some(Pdf.PName(v)) if hdr == null || v > hdr => v
        case _ => hdr
      }
    }
    val pages = try doc.pages().length catch { case _: Exception => 0 }
    val info = doc.dict(doc.trailer.get("Info").getOrElse(Pdf.PNull))
    // a truly locked document's Info strings are ciphertext — NULL
    // beats surfacing garbage (unlocked docs decrypt transparently)
    val locked = doc.encrypted && !doc.unlocked
    def s(k: String): UTF8String =
      if (locked) null
      else doc.resolve(info.get(k).getOrElse(Pdf.PNull)) match {
        case Pdf.PStr(bytes) =>
          UTF8String.fromString(PdfMetaExpr.decodeTextString(bytes))
        case _ => null
      }
    InternalRow(
      if (version == null) null else UTF8String.fromString(version),
      pages,
      doc.encrypted,
      s("Title"), s("Author"), s("Subject"), s("Creator"), s("Producer"),
      s("CreationDate"), s("ModDate"))
  }

  override protected def withNewChildInternal(newChild: Expression): PdfMetaExpr =
    copy(child = newChild)
}

object PdfMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("version", StringType, nullable = true),
    StructField("pages", IntegerType, nullable = false),
    StructField("encrypted", BooleanType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("author", StringType, nullable = true),
    StructField("subject", StringType, nullable = true),
    StructField("creator", StringType, nullable = true),
    StructField("producer", StringType, nullable = true),
    StructField("created", StringType, nullable = true),
    StructField("modified", StringType, nullable = true)))

  private[multimodal] def isWsByte(b: Byte): Boolean = {
    val c = b & 0xff
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  }

  /** §7.9.2.2 text-string decode: BOM-tagged UTF-16BE / UTF-8, else
    * PDFDocEncoding. */
  def decodeTextString(b: Array[Byte]): String = {
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      new String(b, 2, b.length - 2, "UTF-16BE")
    else if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
        (b(2) & 0xff) == 0xbf)
      new String(b, 3, b.length - 3, "UTF-8")
    else {
      val sb = new java.lang.StringBuilder(b.length)
      var i = 0
      while (i < b.length) {
        val c = b(i) & 0xff
        val m = if (c >= 0x80 && c <= 0x9e) pdfDocHigh(c - 0x80)
          else if (c >= 0x18 && c <= 0x1f) pdfDocLow(c - 0x18)
          else c.toChar
        if (c != 0x9f && c != 0xad) sb.append(m) // the two undefined slots
        i += 1
      }
      sb.toString
    }
  }

  // PDFDocEncoding's deviations from Latin-1 (Annex D.3): 0x18-0x1F
  // are accents, 0x80-0x9E the punctuation/ligature block; 0x9F and
  // 0xAD are undefined.
  private val pdfDocLow: Array[Char] =
    Array('˘', 'ˇ', 'ˆ', '˙', '˝', '˛', '˚', '˜')
  private val pdfDocHigh: Array[Char] = Array(
    '•', '†', '‡', '…', '—', '–', 'ƒ', '⁄',
    '‹', '›', '−', '‰', '„', '“', '”', '‘',
    '’', '‚', '™', 'ﬁ', 'ﬂ', 'Ł', 'Œ', 'Š',
    'Ÿ', 'Ž', 'ı', 'ł', 'œ', 'š', 'ž')
}
