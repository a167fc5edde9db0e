package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** tar_entries(payload): the POSIX ustar / GNU tar walk — returns
  * array<struct<name, size, type, data: binary>> or NULL when the
  * payload is not a tar. `decompress(p)` → `tar_entries` opens the
  * .tar.gz / .tar.zst corpus-distribution format in one map-side
  * chain (the zip twin for the unix-shaped half of a crawl).
  *
  *  - 512-byte blocks, octal size/checksum fields (with the GNU
  *    base-256 extension for sizes ≥ 8 GiB), entries gated on the
  *    "ustar" magic at offset 257 OR a valid header checksum (the
  *    pre-POSIX fallback — tar has no leading magic, so the gate is
  *    what rejects non-tars);
  *  - GNU long names (typeflag 'L' data names the next entry) and
  *    pax extended headers (typeflag 'x', `len key=value\n` records;
  *    `path` and `size` override the next header); ustar
  *    prefix[155] joined with '/';
  *  - `type` is "file" ('0'/NUL), "dir" ('5'), "symlink" ('2'),
  *    "hardlink" ('1'), else "type<c>"; data is carried for regular
  *    files only, under the [[Zip]] bomb guards (64 MiB per entry,
  *    128 MiB total, 4096 entries — excess carries NULL data).
  *
  * Scale shape: per-row map-side parse, single scan, zero shuffle. */
case class TarEntriesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("data", BinaryType, nullable = true))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "tar_entries"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      val es = TarEntriesExpr.entries(b)
      if (es == null) null
      else new GenericArrayData(es.map { e =>
        InternalRow(UTF8String.fromString(e._1), e._2,
          UTF8String.fromString(e._3), e._4)
      })
    } catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(newChild: Expression): TarEntriesExpr =
    copy(child = newChild)
}

private[multimodal] object TarEntriesExpr {

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    // GNU base-256: high bit of the first byte
    if ((b(off) & 0x80) != 0) {
      var v = (b(off) & 0x7f).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
      return v
    }
    var v = 0L
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    while (i < end && b(i) >= '0' && b(i) <= '7') { v = (v << 3) | (b(i) - '0'); i += 1 }
    v
  }

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var e = off
    val end = off + len
    while (e < end && b(e) != 0) e += 1
    new String(b, off, e - off, "UTF-8")
  }

  private def checksumOk(b: Array[Byte], off: Int): Boolean = {
    val stored = octal(b, off + 148, 8)
    var sum = 0L
    var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) 32 else b(off + i) & 0xff)
      i += 1
    }
    sum == stored && stored != 0
  }

  /** entries or null when not a tar; (name, size, type, data). */
  def entries(b: Array[Byte]): Array[(String, Long, String, Array[Byte])] = {
    if (b == null || b.length < 512) return null
    val out = Vector.newBuilder[(String, Long, String, Array[Byte])]
    var p = 0
    var n = 0
    var total = 0L
    var sawValid = false
    var pendingName: String = null
    var paxPath: String = null
    var paxSize = -1L
    while (p + 512 <= b.length && n < Zip.MaxEntries) {
      // two zero blocks = end; a single zero block also terminates
      if (b(p) == 0) return if (sawValid) out.result().toArray else null
      val magicOk = p + 263 <= b.length &&
        b(p + 257) == 'u' && b(p + 258) == 's' && b(p + 259) == 't' &&
        b(p + 260) == 'a' && b(p + 261) == 'r'
      if (!magicOk && !checksumOk(b, p))
        return if (sawValid) out.result().toArray else null
      sawValid = true
      val rawName = str(b, p, 100)
      val size = if (paxSize >= 0) paxSize else octal(b, p + 124, 12)
      val typeflag = (b(p + 156) & 0xff).toChar
      val prefix = if (magicOk) str(b, p + 345, 155) else ""
      val name =
        if (paxPath != null) paxPath
        else if (pendingName != null) pendingName
        else if (prefix.nonEmpty) prefix + "/" + rawName
        else rawName
      pendingName = null; paxPath = null; paxSize = -1L
      val dataOff = p + 512
      val avail = math.max(0, b.length - dataOff)
      typeflag match {
        case 'L' => // GNU long name: data names the NEXT entry
          pendingName = str(b, dataOff, math.min(size, avail).toInt)
        case 'x' | 'g' => // pax records: "<len-in-BYTES> key=value\n"
          val dlen = math.min(size, avail).toInt
          var i = 0
          var guard = 0
          while (i < dlen && guard < 256) {
            var sp = i
            while (sp < dlen && b(dataOff + sp) != ' ') sp += 1
            val recLen =
              try new String(b, dataOff + i, sp - i, "US-ASCII").toInt
              catch { case _: Exception => -1 }
            if (sp >= dlen || recLen <= 0 || i + recLen > dlen) i = dlen
            else {
              val rec = new String(b, dataOff + sp + 1,
                i + recLen - sp - 1, "UTF-8").stripSuffix("\n")
              val eq = rec.indexOf('=')
              if (eq > 0 && typeflag == 'x') {
                rec.substring(0, eq) match {
                  case "path" => paxPath = rec.substring(eq + 1)
                  case "size" =>
                    paxSize = try rec.substring(eq + 1).toLong
                      catch { case _: Exception => -1L }
                  case _ =>
                }
              }
              i += recLen
            }
            guard += 1
          }
        case _ =>
          val tpe = typeflag match {
            case '\u0000' | '0' => "file"
            case '5' => "dir"
            case '2' => "symlink"
            case '1' => "hardlink"
            case c => s"type$c"
          }
          val data: Array[Byte] =
            if (tpe == "file" && size <= Zip.MaxEntry &&
                total + size <= Zip.MaxTotal) {
              val take = math.min(size, avail).toInt
              total += take
              java.util.Arrays.copyOfRange(b, dataOff, dataOff + take)
            } else null
          out += ((name, size, tpe, data))
          n += 1
      }
      // advance past the data blocks; a size beyond the payload (lying
      // header or truncated tar) ends the walk after this entry
      if (size < 0 || size > avail.toLong) p = b.length
      else p = dataOff + ((size + 511) / 512).toInt * 512
    }
    if (sawValid) out.result().toArray else null
  }
}
