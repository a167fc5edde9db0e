package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** zip_entries(payload): the ZIP container walk (APPNOTE.TXT / ISO
  * 21320) behind the Office/EPUB document family — returns
  * array<struct<name, size, compressed, method, data: binary>> in
  * central-directory order, or NULL when the payload is not a
  * readable archive. The crawl-side gateway: every OOXML/ODF/EPUB
  * document, and plenty of raw .zip corpus payloads, open with this
  * one expression and feed the per-format extractors ([[OfficeTextExpr]]).
  *
  *  - the end-of-central-directory record is found by tail scan
  *    (comment-tolerant, last 64 KiB + 22), entries come from the
  *    CENTRAL directory (the authoritative one — local headers lie
  *    in streamed archives) with each local header re-read only for
  *    the data offset (its own name/extra lengths govern, §4.3.7);
  *  - methods: stored (0) and deflate (8) inflate to `data`; anything
  *    else (bzip2/lzma/ppmd/encrypted) carries NULL data with its
  *    method id in `method` — audited, not silently dropped;
  *    encrypted entries (GP bit 0) report method "encrypted";
  *  - names decode UTF-8 when GP bit 11 says so, cp437 otherwise
  *    (the DOS legacy default);
  *  - bomb guards: 4096 entries, 64 MiB per entry and 128 MiB total
  *    inflated (the classic zip-bomb ceiling — excess entries carry
  *    NULL data, the walk itself completes).
  *
  * Scale shape: per-row map-side parse, single scan, zero shuffle. */
case class ZipEntriesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ZipEntriesExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "zip_entries"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      val entries = Zip.entries(b)
      if (entries == null) null
      else new GenericArrayData(entries.map { e =>
        InternalRow(UTF8String.fromString(e.name), e.size, e.compressed,
          UTF8String.fromString(e.method),
          if (e.data == null) null else e.data)
      })
    } catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(newChild: Expression): ZipEntriesExpr =
    copy(child = newChild)
}

object ZipEntriesExpr {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("compressed", LongType, nullable = false),
    StructField("method", StringType, nullable = false),
    StructField("data", BinaryType, nullable = true))), containsNull = false)
}

private[multimodal] object Zip {

  val MaxEntries = 4096
  val MaxEntry = 64 << 20
  val MaxTotal = 128 << 20

  final case class Entry(name: String, size: Long, compressed: Long,
      method: String, data: Array[Byte])

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** cp437 high half (0x80-0xFF) — the legacy name encoding. */
  private val Cp437High: String =
    "ÇüéâäàåçêëèïîìÄÅÉæÆôöòûùÿÖÜ¢£¥₧ƒáíóúñÑªº¿⌐¬½¼¡«»" +
    "░▒▓│┤╡╢╖╕╣║╗╝╜╛┐└┴┬├─┼╞╟╚╔╩╦╠═╬╧╨╤╥╙╘╒╓╫╪┘┌█▄▌▐▀" +
    "αßΓπΣσµτΦΘΩδ∞φε∩≡±≥≤⌠⌡÷≈°∙·√ⁿ²■ "

  private def decodeName(b: Array[Byte], off: Int, len: Int, utf8: Boolean): String =
    if (utf8) new String(b, off, len, "UTF-8")
    else {
      val sb = new java.lang.StringBuilder(len)
      var i = 0
      while (i < len) {
        val c = b(off + i) & 0xff
        sb.append(if (c < 0x80) c.toChar else Cp437High.charAt(c - 0x80))
        i += 1
      }
      sb.toString
    }

  /** null = not a zip; entries with unreadable data carry data=null. */
  def entries(b: Array[Byte]): Array[Entry] = {
    if (b == null || b.length < 22) return null
    // EOCD: scan back over a possible comment (<= 64 KiB)
    var eocd = -1
    val stop = math.max(0, b.length - 22 - 65535)
    var i = b.length - 22
    while (i >= stop && eocd < 0) {
      if (b(i) == 0x50 && b(i + 1) == 0x4b && b(i + 2) == 0x05 && b(i + 3) == 0x06)
        eocd = i
      i -= 1
    }
    if (eocd < 0) return null
    val count = u16(b, eocd + 10)
    val cdOff = u32(b, eocd + 16)
    if (cdOff >= b.length) return null
    val out = Vector.newBuilder[Entry]
    var p = cdOff.toInt
    var n = 0
    var total = 0L
    val lim = math.min(count, MaxEntries)
    if (lim == 0) return Array.empty[Entry] // a valid empty archive
    while (n < lim && p + 46 <= b.length &&
        b(p) == 0x50 && b(p + 1) == 0x4b && b(p + 2) == 0x01 && b(p + 3) == 0x02) {
      val gp = u16(b, p + 8)
      val method = u16(b, p + 10)
      val csize = u32(b, p + 20)
      val usize = u32(b, p + 24)
      val nameLen = u16(b, p + 28)
      val extraLen = u16(b, p + 30)
      val commentLen = u16(b, p + 32)
      val lho = u32(b, p + 42)
      if (p + 46 + nameLen > b.length) return finish(out, n)
      val name = decodeName(b, p + 46, nameLen, (gp & 0x800) != 0)
      val encryptedE = (gp & 1) != 0
      val methodName =
        if (encryptedE) "encrypted"
        else method match {
          case 0 => "stored"
          case 8 => "deflate"
          case m => s"method$m"
        }
      var data: Array[Byte] = null
      if (!encryptedE && (method == 0 || method == 8) &&
          usize <= MaxEntry && total + usize <= MaxTotal &&
          lho + 30 <= b.length) {
        val l = lho.toInt
        if (b(l) == 0x50 && b(l + 1) == 0x4b && b(l + 2) == 0x03 && b(l + 3) == 0x04) {
          // the LOCAL header's own name/extra lengths set the offset
          val dataOff = l + 30 + u16(b, l + 26) + u16(b, l + 28)
          val avail = b.length - dataOff
          if (dataOff <= b.length && avail >= 0) {
            val clen = math.min(csize, avail.toLong).toInt
            data =
              try {
                if (method == 0) java.util.Arrays.copyOfRange(b, dataOff,
                  dataOff + math.min(clen.toLong, usize).toInt)
                else inflateRaw(b, dataOff, clen, usize.toInt)
              } catch { case _: Exception => null }
            if (data != null) total += data.length
          }
        }
      }
      out += Entry(name, usize, csize, methodName, data)
      p += 46 + nameLen + extraLen + commentLen
      n += 1
    }
    finish(out, n)
  }

  private def finish(out: scala.collection.mutable.Builder[Entry, Vector[Entry]],
      n: Int): Array[Entry] = {
    val v = out.result()
    // a non-empty declaration whose directory didn't parse at all
    if (n == 0) null else v.toArray
  }

  private def inflateRaw(b: Array[Byte], off: Int, len: Int,
      expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(b, off, len)
    val out = new java.io.ByteArrayOutputStream(math.min(math.max(expected, 64), MaxEntry))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && out.size <= MaxEntry) {
        val k = inf.inflate(buf)
        if (k == 0) {
          if (inf.needsInput() || inf.needsDictionary()) return out.toByteArray
        } else out.write(buf, 0, k)
      }
    } finally inf.end()
    if (out.size > MaxEntry) null else out.toByteArray
  }
}
