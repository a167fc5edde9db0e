package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** media_tags(payload): the descriptive-metadata audit across the
  * audio/video container family — struct<format, tags:
  * map<string,string>> with normalized keys (title, artist, album,
  * date, genre, track, comment, albumartist, composer, vendor), NULL
  * when the payload carries none. A media-corpus curation pass needs
  * these before any sample decode: dedup by (artist, title),
  * language/genre stratification, provenance audits.
  *
  *  - ID3v2.2/2.3/2.4 ("id3v2"): syncsafe header, extended-header
  *    skip, per-version frame layouts (3-byte v2.2 ids/sizes, BE
  *    v2.3, syncsafe v2.4), text encodings 0-3 (latin-1, UTF-16 BOM,
  *    UTF-16BE, UTF-8), COMM language+description framing, v2.4
  *    null-separated multi-values joined with ", "; an ID3v1 trailer
  *    fills keys v2 left missing;
  *  - ID3v1/1.1 ("id3v1"): the 128-byte TAG trailer, v1.1 track
  *    byte, the standard genre table;
  *  - Vorbis comments: FLAC block 4 ("flac"), Ogg Vorbis packet-3
  *    ("vorbis") and OpusTags ("opus") found by bounded page scan —
  *    vendor + KEY=value pairs, keys lowercased, TRACKNUMBER→track;
  *  - MP4/M4A ilst ("mp4"): moov/udta/meta/ilst data atoms (©nam,
  *    ©ART, ©alb, ©day, ©gen, ©cmt, aART, ©wrt as UTF-8; trkn and
  *    gnre binary, gnre via the ID3 genre table);
  *  - RIFF LIST/INFO ("wav"/"avi"): INAM/IART/IPRD/ICRD/IGNR/ICMT/
  *    ITRK chunks, UTF-8 with latin-1 fallback.
  *
  * TXXX/custom keys are out of scope (unbounded vocabulary); genre
  * text is carried verbatim (the "(NN)" ID3v2 references resolve
  * through the same table). Caps: 64 tags, 8 KiB per value. Scale
  * shape: per-row map-side parse, single scan, zero shuffle. */
case class MediaTagsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("tags", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "media_tags"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    try {
      val r = MediaTags.extract(b)
      if (r == null || r._2.isEmpty) null
      else {
        val ks = r._2.keys.toArray.sorted
        InternalRow(UTF8String.fromString(r._1),
          ArrayBasedMapData(ks.map(UTF8String.fromString),
            ks.map(k => UTF8String.fromString(r._2(k)))))
      }
    } catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(newChild: Expression): MediaTagsExpr =
    copy(child = newChild)
}

private[multimodal] object MediaTags {

  val MaxTags = 64
  val MaxValue = 8192

  /** The standard ID3v1 genre table (ids 0-79). */
  private val Genres = Array(
    "Blues", "Classic Rock", "Country", "Dance", "Disco", "Funk", "Grunge",
    "Hip-Hop", "Jazz", "Metal", "New Age", "Oldies", "Other", "Pop", "R&B",
    "Rap", "Reggae", "Rock", "Techno", "Industrial", "Alternative", "Ska",
    "Death Metal", "Pranks", "Soundtrack", "Euro-Techno", "Ambient",
    "Trip-Hop", "Vocal", "Jazz+Funk", "Fusion", "Trance", "Classical",
    "Instrumental", "Acid", "House", "Game", "Sound Clip", "Gospel", "Noise",
    "Alternative Rock", "Bass", "Soul", "Punk", "Space", "Meditative",
    "Instrumental Pop", "Instrumental Rock", "Ethnic", "Gothic", "Darkwave",
    "Techno-Industrial", "Electronic", "Pop-Folk", "Eurodance", "Dream",
    "Southern Rock", "Comedy", "Cult", "Gangsta", "Top 40", "Christian Rap",
    "Pop/Funk", "Jungle", "Native American", "Cabaret", "New Wave",
    "Psychedelic", "Rave", "Showtunes", "Trailer", "Lo-Fi", "Tribal",
    "Acid Punk", "Acid Jazz", "Polka", "Retro", "Musical", "Rock & Roll",
    "Hard Rock")

  def extract(b: Array[Byte]): (String, mutable.LinkedHashMap[String, String]) = {
    if (b == null || b.length < 8) return null
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val tags = id3v2(b)
      // an ID3v1 trailer fills what v2 left missing
      id3v1Into(b, tags, onlyMissing = true)
      return ("id3v2", tags)
    }
    if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S') return ogg(b)
    if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')
      return ("flac", flac(b))
    if (b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')
      return ("mp4", mp4(b))
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
      val kind = new String(b, 8, 4, "ISO-8859-1")
      if (kind == "WAVE" || kind == "AVI ")
        return (if (kind == "WAVE") "wav" else "avi", riffInfo(b))
    }
    val v1 = mutable.LinkedHashMap.empty[String, String]
    id3v1Into(b, v1, onlyMissing = false)
    if (v1.nonEmpty) ("id3v1", v1) else null
  }

  private def put(tags: mutable.LinkedHashMap[String, String], k: String,
      v: String): Unit = {
    val t = if (v == null) "" else v.trim
    if (t.nonEmpty && tags.size < MaxTags && !tags.contains(k))
      tags(k) = if (t.length > MaxValue) t.substring(0, MaxValue) else t
  }

  // ---------------------------------------------------------------- ID3v2

  private def syncsafe(b: Array[Byte], i: Int): Int =
    ((b(i) & 0x7f) << 21) | ((b(i + 1) & 0x7f) << 14) |
      ((b(i + 2) & 0x7f) << 7) | (b(i + 3) & 0x7f)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private val FrameKeys = Map(
    "TIT2" -> "title", "TT2" -> "title",
    "TPE1" -> "artist", "TP1" -> "artist",
    "TALB" -> "album", "TAL" -> "album",
    "TYER" -> "date", "TDRC" -> "date", "TYE" -> "date",
    "TCON" -> "genre", "TCO" -> "genre",
    "TRCK" -> "track", "TRK" -> "track",
    "TPE2" -> "albumartist", "TP2" -> "albumartist",
    "TCOM" -> "composer", "TCM" -> "composer")

  private def decodeId3Text(b: Array[Byte], off: Int, len: Int): String = {
    if (len <= 0) return ""
    val enc = b(off) & 0xff
    val s = off + 1
    val n = len - 1
    val raw = enc match {
      case 0 => new String(b, s, n, "ISO-8859-1")
      case 1 => new String(b, s, n, "UTF-16") // BOM-led; JDK handles
      case 2 => new String(b, s, n, "UTF-16BE")
      case _ => new String(b, s, n, "UTF-8")
    }
    // strip trailing NULs; v2.4 multi-values join
    raw.replaceAll("\u0000+$", "").replace("\u0000", ", ")
  }

  private def genreText(g: String): String = {
    // "(NN)" and bare "NN" references resolve through the table
    val m = "^\\((\\d{1,3})\\)$|^(\\d{1,3})$".r.findFirstMatchIn(g)
    m.flatMap { mm =>
      val idx = Option(mm.group(1)).getOrElse(mm.group(2)).toInt
      if (idx >= 0 && idx < Genres.length) Some(Genres(idx)) else None
    }.getOrElse(g)
  }

  private def id3v2(b: Array[Byte]): mutable.LinkedHashMap[String, String] = {
    val tags = mutable.LinkedHashMap.empty[String, String]
    if (b.length < 10) return tags
    val major = b(3) & 0xff
    val flags = b(5) & 0xff
    val end = math.min(10 + syncsafe(b, 6), b.length)
    var i = 10
    if ((flags & 0x40) != 0 && i + 4 <= end) {
      // extended header: v2.4 size is syncsafe incl. itself, v2.3 excl.
      val es = if (major >= 4) syncsafe(b, i) else be32(b, i) + 4
      i += math.max(4, es)
    }
    val idLen = if (major <= 2) 3 else 4
    val hdrLen = if (major <= 2) 6 else 10
    var guard = 0
    while (i + hdrLen <= end && b(i) != 0 && guard < 4096) {
      val id = new String(b, i, idLen, "ISO-8859-1")
      val size =
        if (major <= 2)
          ((b(i + 3) & 0xff) << 16) | ((b(i + 4) & 0xff) << 8) | (b(i + 5) & 0xff)
        else if (major >= 4) syncsafe(b, i + 4)
        else be32(b, i + 4)
      val dataOff = i + hdrLen
      if (size < 0 || dataOff + size > end) return tags
      FrameKeys.get(id) match {
        case Some(key) =>
          val v = decodeId3Text(b, dataOff, size)
          put(tags, key, if (key == "genre") genreText(v) else v)
        case None if id == "COMM" || id == "COM" =>
          if (size >= 4) {
            val enc = b(dataOff) & 0xff
            // skip language(3) + null-terminated description
            var p = dataOff + 4
            val step = if (enc == 1 || enc == 2) 2 else 1
            var found = false
            while (!found && p + step <= dataOff + size) {
              val isNul = if (step == 2) b(p) == 0 && b(p + 1) == 0 else b(p) == 0
              if (isNul) found = true
              p += step
            }
            if (found) {
              val vlen = dataOff + size - p
              val raw = new Array[Byte](1 + vlen)
              raw(0) = enc.toByte
              System.arraycopy(b, p, raw, 1, vlen)
              put(tags, "comment", decodeId3Text(raw, 0, raw.length))
            }
          }
        case None =>
      }
      i = dataOff + size
      guard += 1
    }
    tags
  }

  private def id3v1Into(b: Array[Byte],
      tags: mutable.LinkedHashMap[String, String], onlyMissing: Boolean): Unit = {
    val s = b.length - 128
    if (s < 0 || b(s) != 'T' || b(s + 1) != 'A' || b(s + 2) != 'G') return
    def field(off: Int, len: Int): String = {
      var e = off + len
      while (e > off && (b(s + e - 1) == 0 || b(s + e - 1) == ' ')) e -= 1
      new String(b, s + off, e - off, "ISO-8859-1")
    }
    def maybe(k: String, v: String): Unit =
      if (!onlyMissing || !tags.contains(k)) put(tags, k, v)
    maybe("title", field(3, 30))
    maybe("artist", field(33, 30))
    maybe("album", field(63, 30))
    maybe("date", field(93, 4))
    // v1.1: comment[28] == 0 marks a track byte at [29]
    if (b(s + 125) == 0 && (b(s + 126) & 0xff) != 0) {
      maybe("comment", field(97, 28))
      maybe("track", (b(s + 126) & 0xff).toString)
    } else maybe("comment", field(97, 30))
    val g = b(s + 127) & 0xff
    if (g < Genres.length) maybe("genre", Genres(g))
  }

  // ------------------------------------------------------ vorbis comments

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Parse a Vorbis comment block at off; returns tags (possibly
    * empty when malformed). */
  private def vorbisComments(b: Array[Byte], off: Int,
      end: Int): mutable.LinkedHashMap[String, String] = {
    val tags = mutable.LinkedHashMap.empty[String, String]
    var p = off
    if (p + 4 > end) return tags
    val vlen = le32(b, p); p += 4
    if (vlen < 0 || p + vlen > end) return tags
    put(tags, "vendor", new String(b, p, vlen.toInt, "UTF-8"))
    p += vlen.toInt
    if (p + 4 > end) return tags
    val count = le32(b, p); p += 4
    var k = 0L
    while (k < count && p + 4 <= end && tags.size < MaxTags) {
      val len = le32(b, p); p += 4
      if (len < 0 || p + len > end) return tags
      val entry = new String(b, p, len.toInt, "UTF-8")
      p += len.toInt
      val eq = entry.indexOf('=')
      if (eq > 0) {
        val key0 = entry.substring(0, eq).toLowerCase(java.util.Locale.ROOT)
        val key = if (key0 == "tracknumber") "track" else key0
        put(tags, key, entry.substring(eq + 1))
      }
      k += 1
    }
    tags
  }

  private def ogg(b: Array[Byte]): (String, mutable.LinkedHashMap[String, String]) = {
    // concatenate the first pages' payloads, then find the comment
    // packet marker ("\x03vorbis" / "OpusTags")
    val buf = new java.io.ByteArrayOutputStream(4096)
    var p = 0
    var pages = 0
    while (p + 27 <= b.length && pages < 8 &&
        b(p) == 'O' && b(p + 1) == 'g' && b(p + 2) == 'g' && b(p + 3) == 'S') {
      val segs = b(p + 26) & 0xff
      var dataLen = 0
      var si = 0
      if (p + 27 + segs > b.length) return nullOr(buf)
      while (si < segs) { dataLen += b(p + 27 + si) & 0xff; si += 1 }
      val dataOff = p + 27 + segs
      val n = math.min(dataLen, b.length - dataOff)
      if (n > 0) buf.write(b, dataOff, n)
      p = dataOff + dataLen
      pages += 1
    }
    nullOr(buf)
  }

  private def nullOr(buf: java.io.ByteArrayOutputStream)
      : (String, mutable.LinkedHashMap[String, String]) = {
    val d = buf.toByteArray
    var i = 0
    while (i + 8 <= d.length) {
      if (d(i) == 3 && d(i + 1) == 'v' && d(i + 2) == 'o' && d(i + 3) == 'r' &&
          d(i + 4) == 'b' && d(i + 5) == 'i' && d(i + 6) == 's')
        return ("vorbis", vorbisComments(d, i + 7, d.length))
      if (d(i) == 'O' && d(i + 1) == 'p' && d(i + 2) == 'u' && d(i + 3) == 's' &&
          d(i + 4) == 'T' && d(i + 5) == 'a' && d(i + 6) == 'g' && d(i + 7) == 's')
        return ("opus", vorbisComments(d, i + 8, d.length))
      i += 1
    }
    null
  }

  private def flac(b: Array[Byte]): mutable.LinkedHashMap[String, String] = {
    var p = 4
    var last = false
    var guard = 0
    while (!last && p + 4 <= b.length && guard < 1024) {
      val hdr = b(p) & 0xff
      last = (hdr & 0x80) != 0
      val tpe = hdr & 0x7f
      val size = ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      if (tpe == 4 && p + 4 + size <= b.length)
        return vorbisComments(b, p + 4, p + 4 + size)
      p += 4 + size
      guard += 1
    }
    mutable.LinkedHashMap.empty
  }

  // ------------------------------------------------------------ MP4 ilst

  private val IlstKeys = Map(
    "©nam" -> "title", "©ART" -> "artist", "©alb" -> "album",
    "©day" -> "date", "©gen" -> "genre", "©cmt" -> "comment",
    "aART" -> "albumartist", "©wrt" -> "composer")

  private def mp4(b: Array[Byte]): mutable.LinkedHashMap[String, String] = {
    val tags = mutable.LinkedHashMap.empty[String, String]
    Bmff.boxes(b, 0, b.length) { (t, s, e) =>
      if (t == "moov") Bmff.boxes(b, s, e) { (t2, s2, e2) =>
        if (t2 == "udta") Bmff.boxes(b, s2, e2) { (t3, s3, e3) =>
          if (t3 == "meta" && e3 - s3 > 4)
            Bmff.boxes(b, s3 + 4, e3) { (t4, s4, e4) =>
              if (t4 == "ilst") Bmff.boxes(b, s4, e4) { (t5, s5, e5) =>
                ilstItem(b, t5, s5, e5, tags)
              }
            }
        }
      }
    }
    tags
  }

  private def ilstItem(b: Array[Byte], name: String, s: Int, e: Int,
      tags: mutable.LinkedHashMap[String, String]): Unit = {
    Bmff.boxes(b, s, e) { (dt, ds, de) =>
      if (dt == "data" && de - ds >= 8) {
        val dataType = Bmff.be32(b, ds).toInt & 0xffffff
        val payloadOff = ds + 8
        val n = de - payloadOff
        if (n >= 0) {
          IlstKeys.get(name) match {
            case Some(key) if dataType == 1 =>
              put(tags, key, new String(b, payloadOff, n, "UTF-8"))
            case _ if name == "trkn" && dataType == 0 && n >= 4 =>
              val trk = ((b(payloadOff + 2) & 0xff) << 8) | (b(payloadOff + 3) & 0xff)
              if (trk > 0) put(tags, "track", trk.toString)
            case _ if name == "gnre" && dataType == 0 && n >= 2 =>
              val g = (((b(payloadOff) & 0xff) << 8) | (b(payloadOff + 1) & 0xff)) - 1
              if (g >= 0 && g < Genres.length) put(tags, "genre", Genres(g))
            case _ =>
          }
        }
      }
    }
  }

  // ----------------------------------------------------------- RIFF INFO

  private val RiffKeys = Map(
    "INAM" -> "title", "IART" -> "artist", "IPRD" -> "album",
    "ICRD" -> "date", "IGNR" -> "genre", "ICMT" -> "comment",
    "ITRK" -> "track")

  private def riffInfo(b: Array[Byte]): mutable.LinkedHashMap[String, String] = {
    val tags = mutable.LinkedHashMap.empty[String, String]
    var p = 12
    var guard = 0
    while (p + 8 <= b.length && guard < 4096) {
      val id = new String(b, p, 4, "ISO-8859-1")
      val size = le32(b, p + 4).toInt
      if (size < 0 || p + 8 + size > b.length) return tags
      if (id == "LIST" && size >= 4 &&
          new String(b, p + 8, 4, "ISO-8859-1") == "INFO") {
        var q = p + 12
        while (q + 8 <= p + 8 + size) {
          val cid = new String(b, q, 4, "ISO-8859-1")
          val csize = le32(b, q + 4).toInt
          if (csize < 0 || q + 8 + csize > p + 8 + size) return tags
          RiffKeys.get(cid).foreach { key =>
            var e = q + 8 + csize
            while (e > q + 8 && b(e - 1) == 0) e -= 1
            val raw = java.util.Arrays.copyOfRange(b, q + 8, e)
            val txt = try {
              val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
              dec.onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
              dec.decode(java.nio.ByteBuffer.wrap(raw)).toString
            } catch {
              case _: Exception => new String(raw, "ISO-8859-1")
            }
            put(tags, key, txt)
          }
          q += 8 + csize + (csize & 1) // chunks are word-aligned
        }
      }
      p += 8 + size + (size & 1)
      guard += 1
    }
    tags
  }
}
