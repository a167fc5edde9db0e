package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decode-throughput sweep at corpus-realistic payload sizes.
  *
  * The decode family's correctness is proven on tiny synthesized
  * payloads (exact oracles); this main measures the other claim — that
  * per-row decode cost scales linearly in payload size and sustains
  * corpus-scan throughput. For each (format, size) cell it generates
  * deterministic payloads ON THE EXECUTORS (PNG and baseline JPEG via
  * the JDK encoder, WAV PCM bytes directly), persists them so encode
  * cost is out of the measurement, then times a full decode pass
  * (sum over a decoded pixel/sample forces the whole codec) and
  * reports MB/s aggregate and per core.
  *
  * Usage: runMain graft.MediaBench [cpus]  (default 8)
  */
object MediaBench {

  private def pngBytes(id: Long, size: Int): Array[Byte] = {
    val img = new BufferedImage(size, size, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    var s = id * 6364136223846793005L + 1442695040888963407L
    while (y < size) {
      var x = 0
      while (x < size) {
        s = s * 6364136223846793005L + 1442695040888963407L
        // noisy content: PNG's deflate can't cheat the measurement
        img.setRGB(x, y, (s >>> 24).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def jpegBytes(id: Long, size: Int,
      progressive: Boolean = false): Array[Byte] = {
    val img = new BufferedImage(size, size, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < size) {
      var x = 0
      while (x < size) {
        // smooth gradients + texture: realistic JPEG entropy
        val r = (x * 3 + y * 2 + ((x * y + id).toInt % 7)) & 0xff
        val g = (255 - x * 2 + y + ((x + y * 3) % 5)) & 0xff
        val b = (x + y * 4 + ((x * 2 + y) % 11)) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.8f)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose(); ios.close()
    out.toByteArray
  }

  /** 1-second 44.1 kHz 16-bit stereo RIFF/WAVE (176,444 bytes). */
  private def wavBytes(id: Long): Array[Byte] = {
    val frames = 44100
    val data = new Array[Byte](44 + frames * 4)
    val hdr = Array[Int](
      0x52, 0x49, 0x46, 0x46, 0, 0, 0, 0, 0x57, 0x41, 0x56, 0x45,
      0x66, 0x6d, 0x74, 0x20, 16, 0, 0, 0, 1, 0, 2, 0,
      0x44, 0xac, 0, 0, 0x10, 0xb1, 2, 0, 4, 0, 16, 0,
      0x64, 0x61, 0x74, 0x61, 0, 0, 0, 0)
    var i = 0
    while (i < 44) { data(i) = hdr(i).toByte; i += 1 }
    def le32(off: Int, v: Int): Unit = {
      data(off) = v.toByte; data(off + 1) = (v >> 8).toByte
      data(off + 2) = (v >> 16).toByte; data(off + 3) = (v >> 24).toByte
    }
    le32(4, 36 + frames * 4)
    le32(40, frames * 4)
    var f = 0
    var s = id
    while (f < frames) {
      s = s * 6364136223846793005L + 1442695040888963407L
      le32(44 + f * 4, (s >>> 16).toInt)
      f += 1
    }
    data
  }

  /** Noise-content LZW TIFF via the JDK writer (the independent
    * encoder the decode spec pins against): random pixels defeat the
    * dictionary, so this measures the worst-case code-width path. */
  private def tiffLzwBytes(id: Long, size: Int): Array[Byte] = {
    val img = new BufferedImage(size, size, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    var s = id * 6364136223846793005L + 1442695040888963407L
    while (y < size) {
      var x = 0
      while (x < size) {
        s = s * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, (s >>> 24).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("tiff").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("LZW")
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  /** ~1 s mono G.711 mu-law WAV of random codes. */
  private def ulawBytes(id: Long): Array[Byte] = {
    val frames = 44100
    val data = new Array[Byte](44 + frames)
    val hdr = Array[Int](
      0x52, 0x49, 0x46, 0x46, 0, 0, 0, 0, 0x57, 0x41, 0x56, 0x45,
      0x66, 0x6d, 0x74, 0x20, 16, 0, 0, 0, 7, 0, 1, 0,
      0x44, 0xac, 0, 0, 0x44, 0xac, 0, 0, 1, 0, 8, 0,
      0x64, 0x61, 0x74, 0x61, 0, 0, 0, 0)
    var i = 0
    while (i < 44) { data(i) = hdr(i).toByte; i += 1 }
    def le32(off: Int, v: Int): Unit = {
      data(off) = v.toByte; data(off + 1) = (v >> 8).toByte
      data(off + 2) = (v >> 16).toByte; data(off + 3) = (v >> 24).toByte
    }
    le32(4, 36 + frames); le32(40, frames)
    var f = 0; var s = id
    while (f < frames) {
      s = s * 6364136223846793005L + 1442695040888963407L
      data(44 + f) = (s >>> 40).toByte
      f += 1
    }
    data
  }

  /** ~1 s mono MS ADPCM WAV (512-byte blocks = 1012 frames each,
    * 44 blocks) of random code nibbles. */
  private def msBytes(id: Long): Array[Byte] = {
    val blockAlign = 512
    val blocks = 44 // 44 x 1012 frames ~ 1.01 s at 44.1 kHz
    val dataLen = blocks * blockAlign
    val data = new Array[Byte](44 + dataLen)
    val hdr = Array[Int](
      0x52, 0x49, 0x46, 0x46, 0, 0, 0, 0, 0x57, 0x41, 0x56, 0x45,
      0x66, 0x6d, 0x74, 0x20, 16, 0, 0, 0, 2, 0, 1, 0,
      0x44, 0xac, 0, 0, 0x22, 0x56, 0, 0, 0, 2, 4, 0,
      0x64, 0x61, 0x74, 0x61, 0, 0, 0, 0)
    var i = 0
    while (i < 44) { data(i) = hdr(i).toByte; i += 1 }
    def le32(off: Int, v: Int): Unit = {
      data(off) = v.toByte; data(off + 1) = (v >> 8).toByte
      data(off + 2) = (v >> 16).toByte; data(off + 3) = (v >> 24).toByte
    }
    le32(4, 36 + dataLen); le32(40, dataLen)
    var s = id
    var blk = 0
    while (blk < blocks) {
      val bo = 44 + blk * blockAlign
      s = s * 6364136223846793005L + 1442695040888963407L
      data(bo) = (((s >>> 24) & 0x7fffffffL) % 7).toByte // predictor
      data(bo + 1) = 64 // initial delta 64
      var j = 3
      while (j < blockAlign) {
        s = s * 6364136223846793005L + 1442695040888963407L
        data(bo + j) = (s >>> 36).toByte
        j += 1
      }
      blk += 1
    }
    data
  }

  /** ~1 s mono IMA ADPCM WAV (1024-byte blocks = 2041 frames each,
    * 22 blocks) of random code nibbles — maximal state churn. */
  private def imaBytes(id: Long): Array[Byte] = {
    val blockAlign = 1024
    val blocks = 22 // 22 x 2041 frames/block ~ 1.02 s at 44.1 kHz
    val dataLen = blocks * blockAlign
    val data = new Array[Byte](44 + dataLen)
    val hdr = Array[Int](
      0x52, 0x49, 0x46, 0x46, 0, 0, 0, 0, 0x57, 0x41, 0x56, 0x45,
      0x66, 0x6d, 0x74, 0x20, 16, 0, 0, 0, 17, 0, 1, 0,
      0x44, 0xac, 0, 0, 0x22, 0x56, 0, 0, 0, 4, 4, 0,
      0x64, 0x61, 0x74, 0x61, 0, 0, 0, 0)
    var i = 0
    while (i < 44) { data(i) = hdr(i).toByte; i += 1 }
    def le32(off: Int, v: Int): Unit = {
      data(off) = v.toByte; data(off + 1) = (v >> 8).toByte
      data(off + 2) = (v >> 16).toByte; data(off + 3) = (v >> 24).toByte
    }
    le32(4, 36 + dataLen); le32(40, dataLen)
    var s = id
    var blk = 0
    while (blk < blocks) {
      val bo = 44 + blk * blockAlign
      s = s * 6364136223846793005L + 1442695040888963407L
      data(bo) = (s >>> 24).toByte // predictor int16
      data(bo + 1) = (s >>> 32).toByte
      data(bo + 2) = (((s >>> 40) & 0x7fffffffL) % 89).toByte // index
      var j = 4
      while (j < blockAlign) {
        s = s * 6364136223846793005L + 1442695040888963407L
        data(bo + j) = (s >>> 36).toByte
        j += 1
      }
      blk += 1
    }
    data
  }

  /** Noise-content VP8L WebP: literal-only stream under full canonical
    * prefix codes (greens 232x8-bit + 48x9-bit, R/B/A 256x8-bit — both
    * exactly complete), ~33 coded bits per pixel. No LZ77 and no
    * cache hits on noise, so this is the honest worst case for the
    * decoder's per-symbol path; there is no JDK WebP encoder, so the
    * payloads come from this minimal spec-conformant writer (decoded
    * exactly by the fixture-proven [[graft.multimodal.WebpDecode]]). */
  private[graft] def webpBytes(id: Long, size: Int): Array[Byte] = {
    val bits = new java.util.BitSet(size * size * 34 + 1024)
    var n = 0
    def putVal(v: Int, w: Int): Unit = { // LSB-first value field
      var k = 0
      while (k < w) { if (((v >> k) & 1) == 1) bits.set(n); n += 1; k += 1 }
    }
    def putCode(c: Int, w: Int): Unit = { // MSB-first prefix code
      var k = w - 1
      while (k >= 0) { if (((c >> k) & 1) == 1) bits.set(n); n += 1; k -= 1 }
    }
    putVal(size - 1, 14); putVal(size - 1, 14); putVal(0, 1); putVal(0, 3)
    putVal(0, 1); putVal(0, 1); putVal(0, 1) // no transform/cache/meta
    // green: code-length-coded; CL symbols 8 and 9 (transmission
    // order indices 11 and 12) both get length 1
    putVal(0, 1) // not simple
    putVal(9, 4) // num_code_lengths = 13 (covers order indices 11, 12)
    var k = 0
    while (k < 13) { putVal(if (k == 11 || k == 12) 1 else 0, 3); k += 1 }
    putVal(0, 1) // no max-symbol field
    k = 0
    while (k < 280) { putCode(if (k < 232) 0 else 1, 1); k += 1 }
    // red / blue / alpha: all 256 symbols at length 8 via a 0-bit CL
    // tree (only CL symbol 8, order index 11, coded) — the 256
    // per-symbol reads cost nothing
    var c = 0
    while (c < 3) {
      putVal(0, 1); putVal(8, 4) // 12 code lengths: index 11 = sym 8
      k = 0
      while (k < 12) { putVal(if (k == 11) 1 else 0, 3); k += 1 }
      putVal(0, 1)
      c += 1
    }
    putVal(1, 1); putVal(0, 1); putVal(0, 1); putVal(0, 1) // dist: single 0
    var s = id * 6364136223846793005L + 1442695040888963407L
    var px = 0
    while (px < size * size) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val g = ((s >>> 24) & 0xff).toInt
      if (g < 232) putCode(g, 8) else putCode(464 + (g - 232), 9)
      putCode(((s >>> 32) & 0xff).toInt, 8) // red
      putCode(((s >>> 40) & 0xff).toInt, 8) // blue
      putCode(((s >>> 48) & 0xff).toInt, 8) // alpha
      px += 1
    }
    val payload = new Array[Byte]((n + 7) / 8)
    k = 0
    while (k < n) {
      if (bits.get(k)) payload(k / 8) = (payload(k / 8) | (1 << (k % 8))).toByte
      k += 1
    }
    val vp8l = 0x2f.toByte +: payload
    val pad = vp8l.length & 1
    val out = new Array[Byte](20 + vp8l.length + pad)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    "RIFF".getBytes.copyToArray(out, 0)
    le32(4, out.length - 8)
    "WEBPVP8L".getBytes.copyToArray(out, 8)
    le32(16, vp8l.length)
    vp8l.copyToArray(out, 20)
    out
  }

  /** Lossy-VP8 keyframe (RFC 6386): spec-forward bool ENCODER (the
    * RFC's reference write_bool/flush, carry-propagating) driving two
    * partitions — a header+mode partition (default coeff probs, no
    * segmentation, normal loop filter, mode mix DC/V/H/TM varied per
    * MB) and a token partition where every MB codes a ONE token in
    * its Y2 block (so the WHT, all 16 per-block IDCTs, prediction and
    * the loop filter all run) with EOB everywhere else, contexts
    * tracked exactly as the decoder does. No VP8 encoder exists on
    * the JVM; this minimal writer pairs with the 48-fixture
    * libwebp-pinned [[graft.multimodal.Vp8Decode]] exactly like
    * webpBytes/VP8L and brotliBytes. */
  private[graft] def vp8Bytes(id: Long, size: Int): Array[Byte] = {
    import graft.multimodal.Vp8Decode
    final class BoolEnc {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
      private var range = 255
      private var low = 0
      private var count = -24
      def bit(prob: Int, b: Int): Unit = {
        val split = 1 + (((range - 1) * prob) >> 8)
        if (b != 0) { low += split; range -= split } else range = split
        var shift = Integer.numberOfLeadingZeros(range) - 24
        range <<= shift
        count += shift
        if (count >= 0) { // emit the ripe byte (offset >= 1 always:
          val offset = shift - count // count was < 0 before this bit)
          if (((low << (offset - 1)) & 0x80000000) != 0) {
            var x = buf.length - 1
            while (x >= 0 && buf(x) == 0xff.toByte) { buf(x) = 0; x -= 1 }
            if (x >= 0) buf(x) = (buf(x) + 1).toByte
          }
          buf += ((low >> (24 - offset)) & 0xff).toByte
          low = (low << offset) & 0xffffff
          shift = count
          count -= 8
        }
        low <<= shift
      }
      def literal(v: Int, n: Int): Unit = {
        var k = n - 1
        while (k >= 0) { bit(128, (v >> k) & 1); k -= 1 }
      }
      /** walk `tree` to the leaf -token, emitting path bits with
        * probs(pOff + node/2) — the encoder mirror of treeB. */
      def tok(tree: Array[Int], probs: Array[Byte], pOff: Int,
          token: Int): Unit = {
        def dfs(node: Int, path: List[(Int, Int)]): List[(Int, Int)] = {
          var b = 0
          while (b < 2) {
            val v = tree(node + b)
            val p = (node >> 1, b) :: path
            if (v <= 0) { if (-v == token) return p.reverse }
            else { val r = dfs(v, p); if (r != null) return r }
            b += 1
          }
          null
        }
        for ((pi, b) <- dfs(0, Nil)) bit(probs(pOff + pi) & 0xff, b)
      }
      /** reference stop_encode: 32 zero bits push everything out. */
      def result(): Array[Byte] = {
        var i = 0
        while (i < 32) { bit(128, 0); i += 1 }
        buf.toArray
      }
    }
    val mbs = (size + 15) >> 4
    val hdr = new BoolEnc
    hdr.literal(0, 1); hdr.literal(0, 1) // color space, clamping
    hdr.bit(128, 0) // no segmentation
    hdr.literal(0, 1) // normal (not simple) filter
    hdr.literal(20 + (id % 20).toInt, 6) // filter level
    hdr.literal((id % 8).toInt, 3) // sharpness
    hdr.bit(128, 0) // no lf deltas
    hdr.literal(0, 2) // 1 token partition
    hdr.literal(20 + (id % 60).toInt, 7) // yac quant index
    var i = 0
    while (i < 5) { hdr.bit(128, 0); i += 1 } // no quant deltas
    hdr.literal(1, 1) // refresh entropy probs
    var k = 0
    while (k < 1056) { hdr.bit(Vp8Decode.CoeffUpdate(k) & 0xff, 0); k += 1 }
    hdr.bit(128, 1); hdr.literal(128, 8) // skip prob coded, = 128
    val tok = new BoolEnc
    val aboveY2 = new Array[Int](mbs)
    var mbY = 0
    while (mbY < mbs) {
      var leftY2 = 0
      var mbX = 0
      while (mbX < mbs) {
        hdr.bit(128, 0) // not skipped
        val ym = ((id + mbX * 7 + mbY * 13) % 4).toInt // DC/V/H/TM
        hdr.tok(Vp8Decode.KfYModeTree,
          Vp8Decode.KfYModeProb.map(_.toByte), 0, ym)
        hdr.tok(Vp8Decode.UvModeTree,
          Vp8Decode.KfUvModeProb.map(_.toByte), 0, 0) // uv DC
        // tokens: Y2 = ONE,+,EOB; 16 Y (type 0, from coeff 1) = EOB;
        // 8 chroma = EOB. probs offset = (type*8 + band)*33 + ctx*11.
        val ctxY2 = leftY2 + aboveY2(mbX)
        tok.tok(Vp8Decode.CoeffTree, Vp8Decode.CoeffProbs0,
          (1 * 8 + Vp8Decode.Bands(0)) * 33 + ctxY2 * 11, 1)
        tok.bit(128, 0) // positive sign
        tok.tok(Vp8Decode.CoeffTree, Vp8Decode.CoeffProbs0,
          (1 * 8 + Vp8Decode.Bands(1)) * 33 + 1 * 11, 11)
        leftY2 = 1; aboveY2(mbX) = 1
        var blk = 0
        while (blk < 16) { // luma, zero ctx stays zero
          tok.tok(Vp8Decode.CoeffTree, Vp8Decode.CoeffProbs0,
            (0 * 8 + Vp8Decode.Bands(1)) * 33, 11)
          blk += 1
        }
        blk = 0
        while (blk < 8) { // chroma
          tok.tok(Vp8Decode.CoeffTree, Vp8Decode.CoeffProbs0,
            (2 * 8 + Vp8Decode.Bands(0)) * 33, 11)
          blk += 1
        }
        mbX += 1
      }
      mbY += 1
    }
    val part0 = hdr.result()
    val part1 = tok.result()
    val frame = new Array[Byte](10 + part0.length + part1.length)
    val tag = part0.length << 5 | 0x10 // keyframe, version 0, shown
    frame(0) = tag.toByte; frame(1) = (tag >> 8).toByte
    frame(2) = (tag >> 16).toByte
    frame(3) = 0x9d.toByte; frame(4) = 0x01; frame(5) = 0x2a
    frame(6) = size.toByte; frame(7) = ((size >> 8) & 0x3f).toByte
    frame(8) = size.toByte; frame(9) = ((size >> 8) & 0x3f).toByte
    part0.copyToArray(frame, 10)
    part1.copyToArray(frame, 10 + part0.length)
    val pad = frame.length & 1
    val out = new Array[Byte](20 + frame.length + pad)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    "RIFF".getBytes.copyToArray(out, 0)
    le32(4, out.length - 8)
    "WEBPVP8 ".getBytes.copyToArray(out, 8)
    le32(16, frame.length)
    frame.copyToArray(out, 20)
    out
  }

  /** Transparent lossy WebP: VP8X + a raw (uncompressed, filter-0)
    * noise ALPH plane + the [[vp8Bytes]] keyframe — the round-13
    * alpha route at corpus sizes (the raw plane isolates alpha-apply
    * cost; the compressed-plane path rides the VP8L machinery already
    * measured by the webp rows). */
  private[graft] def vp8AlphaBytes(id: Long, size: Int): Array[Byte] = {
    val base = vp8Bytes(id, size)
    val vp8Chunk = java.util.Arrays.copyOfRange(base, 12, base.length)
    val alphaData = new Array[Byte](1 + size * size) // header byte 0 = raw
    var s = id
    var i = 1
    while (i < alphaData.length) {
      s = s * 6364136223846793005L + 1442695040888963407L
      alphaData(i) = (s >>> 32).toByte
      i += 1
    }
    val alphaPad = alphaData.length & 1
    val out = new Array[Byte](12 + 18 + 8 + alphaData.length + alphaPad +
      vp8Chunk.length)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def le24(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte
    }
    "RIFF".getBytes.copyToArray(out, 0)
    le32(4, out.length - 8)
    "WEBPVP8X".getBytes.copyToArray(out, 8)
    le32(16, 10)
    out(20) = 0x10 // alpha flag
    le24(24, size - 1); le24(27, size - 1)
    "ALPH".getBytes.copyToArray(out, 30)
    le32(34, alphaData.length)
    alphaData.copyToArray(out, 38)
    vp8Chunk.copyToArray(out, 38 + alphaData.length + alphaPad)
    out
  }

  /** Animated WebP: `frames` ANMF chunks each wrapping an independent
    * [[vp8Bytes]] keyframe — the round-13 ANMF walk + per-frame
    * standalone decode at corpus sizes. */
  private[graft] def webpAnimBytes(id: Long, size: Int,
      frames: Int): Array[Byte] = {
    val subs = (0 until frames).map { f =>
      val base = vp8Bytes(id * 31 + f, size)
      java.util.Arrays.copyOfRange(base, 12, base.length)
    }
    val anmf = subs.map { sub =>
      val len = 16 + sub.length
      val c = new Array[Byte](8 + len + (len & 1))
      "ANMF".getBytes.copyToArray(c, 0)
      c(4) = len.toByte; c(5) = (len >> 8).toByte; c(6) = (len >> 16).toByte
      // x=0 y=0; w-1/h-1 24-bit LE; duration 40 ms; flags 0
      c(14) = (size - 1).toByte; c(15) = ((size - 1) >> 8).toByte
      c(17) = (size - 1).toByte; c(18) = ((size - 1) >> 8).toByte
      c(20) = 40
      sub.copyToArray(c, 24)
      c
    }
    val body = 18 + 14 + anmf.map(_.length).sum // VP8X + ANIM + frames
    val out = new Array[Byte](12 + body)
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    "RIFF".getBytes.copyToArray(out, 0)
    le32(4, out.length - 8)
    "WEBPVP8X".getBytes.copyToArray(out, 8)
    le32(16, 10)
    out(20) = 0x02 // animation flag
    out(24) = (size - 1).toByte; out(25) = ((size - 1) >> 8).toByte
    out(27) = (size - 1).toByte; out(28) = ((size - 1) >> 8).toByte
    "ANIM".getBytes.copyToArray(out, 30)
    le32(34, 6) // 6-byte body (bgcolor + loop count), ends at 44
    var o = 44
    anmf.foreach { c => c.copyToArray(out, o); o += c.length }
    out
  }

  /** Noise-content brotli (RFC 7932): one LAST compressed meta-block,
    * single block types, one 4-symbol literal code (2 bits/literal),
    * a degenerate single-command code whose one command inserts the
    * whole MLEN — so the measured loop is the decoder's per-symbol
    * canonical walk, the honest hot path (real corpus streams do
    * fewer, bigger copy steps). No encoder exists on the JVM; this
    * minimal spec-conformant writer pairs with the fixture-proven
    * [[graft.multimodal.BrotliDecode]] exactly like webpBytes/VP8L. */
  private[graft] def brotliBytes(id: Long, n: Int): Array[Byte] = {
    require(n > 22594 && n <= 65536)
    val bits = new java.util.BitSet(n * 2 + 512)
    var bn = 0
    def putVal(v: Int, w: Int): Unit = { // LSB-first value field
      var k = 0
      while (k < w) { if (((v >> k) & 1) == 1) bits.set(bn); bn += 1; k += 1 }
    }
    def putCode(c: Int, w: Int): Unit = { // MSB-first prefix code
      var k = w - 1
      while (k >= 0) { if (((c >> k) & 1) == 1) bits.set(bn); bn += 1; k -= 1 }
    }
    putVal(0, 1) // WBITS 16
    putVal(1, 1); putVal(0, 1) // ISLAST, not empty
    putVal(0, 2); putVal(n - 1, 16) // 4 nibbles, MLEN
    putVal(0, 1); putVal(0, 1); putVal(0, 1) // NBLTYPES L/I/D = 1
    putVal(0, 2); putVal(0, 4) // NPOSTFIX, NDIRECT
    putVal(0, 2) // literal context mode LSB6 (1 tree: unused)
    putVal(0, 1); putVal(0, 1) // NTREES_L = NTREES_D = 1
    // literal code: simple, 4 symbols 'a'..'d', flat 2-bit
    putVal(1, 2); putVal(3, 2)
    putVal('a', 8); putVal('b', 8); putVal('c', 8); putVal('d', 8)
    putVal(0, 1) // tree-select: 2,2,2,2
    // command code: simple, 1 symbol = 504 (insert code 23, copy 0)
    putVal(1, 2); putVal(0, 2); putVal(504, 10)
    // distance code: simple, 1 symbol (alphabet 64 -> 6 bits); unread
    putVal(1, 2); putVal(0, 2); putVal(0, 6)
    // body: the one (degenerate, 0-bit) command; insert extra bits
    putVal(n - 22594, 24)
    var s = id * 6364136223846793005L + 1442695040888963407L
    var k = 0
    while (k < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      putCode(((s >>> 33) & 3).toInt, 2)
      k += 1
    }
    val out = new Array[Byte]((bn + 7) / 8)
    k = 0
    while (k < bn) {
      if (bits.get(k)) out(k / 8) = (out(k / 8) | (1 << (k % 8))).toByte
      k += 1
    }
    out
  }

  /** A `pages`-page text PDF with Flate-compressed content streams
    * (the corpus norm): 40 lines x ~60 chars of deterministic prose
    * per page, classic xref, shared font inherited from the Pages
    * node — the pdf_text throughput payload. */
  private def pdfBytes(id: Long, pages: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def obj(num: Int)(body: => Unit): Unit = {
      offsets += ((num, out.size)); w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }
    var s = id * 6364136223846793005L + 1442695040888963407L
    w("%PDF-1.4\n")
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>") }
    val kids = (0 until pages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    obj(2) { w(s"<< /Type /Pages /Kids [$kids] /Count $pages " +
      "/Resources << /Font << /F1 3 0 R >> >> >>") }
    obj(3) { w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") }
    var i = 0
    while (i < pages) {
      val sbc = new java.lang.StringBuilder("BT /F1 10 Tf 50 780 Td ")
      var line = 0
      while (line < 40) {
        sbc.append('(')
        var k = 0
        while (k < 60) {
          s = s * 6364136223846793005L + 1442695040888963407L
          val r = ((s >>> 40) % 27).toInt
          sbc.append(if (r == 26) ' ' else ('a' + r).toChar)
          k += 1
        }
        sbc.append(") Tj 0 -18 TD ")
        line += 1
      }
      sbc.append("ET")
      val raw = sbc.toString.getBytes("ISO-8859-1")
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val cn = d.deflate(buf); d.end()
      obj(4 + 2 * i) { w(s"<< /Type /Page /Parent 2 0 R /Contents ${5 + 2 * i} 0 R >>") }
      obj(5 + 2 * i) {
        w(s"<< /Length $cn /Filter /FlateDecode >>\nstream\n")
        out.write(buf, 0, cn); w("\nendstream")
      }
      i += 1
    }
    val xref = out.size
    val maxNum = 3 + 2 * pages
    w(s"xref\n0 ${maxNum + 1}\n0000000000 65535 f \n")
    val map = offsets.toMap
    var n = 1
    while (n <= maxNum) { w(f"${map(n)}%010d 00000 n \n"); n += 1 }
    w(s"trailer\n<< /Size ${maxNum + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    println(s"heap=${Runtime.getRuntime.maxMemory >> 20}MiB cpus=$cpus")
    val cells = Seq(
      ("png", 64, 2000), ("png", 128, 800), ("png", 256, 240),
      ("png", 512, 64), ("png", 2048, 8),
      ("jpeg", 64, 4000), ("jpeg", 128, 1600), ("jpeg", 256, 480),
      ("jpeg", 512, 128), ("jpeg", 2048, 16),
      ("jpeg-prog", 256, 480), ("jpeg-prog", 512, 128),
      ("tiff-lzw", 256, 240), ("tiff-lzw", 512, 64),
      ("webp", 128, 800), ("webp", 256, 240), ("webp", 512, 64),
      ("webp", 2048, 8),
      ("vp8", 128, 800), ("vp8", 256, 240), ("vp8", 512, 64),
      ("vp8-alpha", 256, 240), ("vp8-alpha", 512, 64),
      ("webp-anim", 256, 120), ("webp-anim", 512, 32),
      ("wav", 44100, 400), ("wav-ulaw", 44100, 400),
      ("wav-ima", 44100, 400), ("wav-ms", 44100, 400),
      ("br", 60000, 400), ("br", 60000, 1600),
      ("pdf", 5, 400), ("pdf", 20, 100))
    val rows = cells.map { case (fmt, size, n) =>
      val payloads = spark.range(n).repartition(cpus)
        .map { id =>
          fmt match {
            case "png" => pngBytes(id, size)
            case "jpeg" => jpegBytes(id, size)
            case "jpeg-prog" => jpegBytes(id, size, progressive = true)
            case "tiff-lzw" => tiffLzwBytes(id, size)
            case "webp" => webpBytes(id, size)
            case "vp8" => vp8Bytes(id, size)
            case "vp8-alpha" => vp8AlphaBytes(id, size)
            case "webp-anim" => webpAnimBytes(id, size, 2)
            case "br" => brotliBytes(id, size)
            case "pdf" => pdfBytes(id, size)
            case "wav-ulaw" => ulawBytes(id)
            case "wav-ima" => imaBytes(id)
            case "wav-ms" => msBytes(id)
            case _ => wavBytes(id)
          }
        }.toDF("p").persist()
      val totalBytes = payloads.select(sum(length(col("p")))).head().getLong(0)
      def timeDecode(): Double = {
        val t0 = System.nanoTime()
        val d =
          if (fmt == "br")
            payloads.select(graft.multimodal.Multimodal
              .decompress(col("p"), "br").as("d"))
              .select(sum(length(col("d.data"))), lit(0)).head()
          else if (fmt == "pdf")
            payloads.select(graft.multimodal.Multimodal.pdfText(col("p"))
              .as("t")).select(sum(length(col("t"))), lit(0)).head()
          else if (fmt.startsWith("wav"))
            payloads.select(graft.multimodal.Multimodal.decodeAudio(col("p"))
              .as("d")).select(sum(element_at(col("d.samples"), 1))).head()
          else if (fmt == "webp-anim") // both frames: walk + 2 decodes
            payloads.select(
              graft.multimodal.Multimodal.videoFrame(col("p"), lit(0)).as("a"),
              graft.multimodal.Multimodal.videoFrame(col("p"), lit(1)).as("b"))
              .select(sum(element_at(col("a.pixels"), 1) +
                element_at(col("b.pixels"), 1)), lit(0)).head()
          else
            payloads.select(graft.multimodal.Multimodal.decodeImage(col("p"))
              .as("d")).select(sum(element_at(col("d.pixels"), 1)),
                sum(col("d.width"))).head()
        require(!d.isNullAt(0), s"$fmt/$size decode produced nulls")
        (System.nanoTime() - t0) / 1e9
      }
      timeDecode() // warm
      val dt = math.min(timeDecode(), timeDecode())
      payloads.unpersist()
      val mb = totalBytes / 1e6
      val mpx =
        if (fmt == "pdf") n.toDouble * size * 40 * 61 / 1e6 // extracted chars
        else if (fmt == "br") n.toDouble * size / 1e6 // decoded MB
        else if (fmt == "webp-anim") n.toDouble * 2 * size * size / 1e6
        else if (fmt == "wav-ima") n * (22.0 * 2041) / 1e6 // decoded frames
        else if (fmt == "wav-ms") n * (44.0 * 1012) / 1e6
        else if (fmt.startsWith("wav")) n * 44100.0 / 1e6
        else n.toDouble * size * size / 1e6
      val label =
        if (fmt == "pdf") s"pdf ${size}p x$n"
        else if (fmt == "br") s"br ${size}B x$n"
        else if (fmt.startsWith("wav")) s"$fmt 1s" else s"$fmt ${size}x$size"
      (label, n, mb, dt, mb / dt, mb / dt / cpus, mpx / dt)
    }
    println("| payload | rows | MB | sec | MB/s | MB/s/core | Mpx/s |")
    println("|---|---|---|---|---|---|---|")
    rows.foreach { case (l, n, mb, dt, r, rc, mp) =>
      println(f"| $l | $n | $mb%.1f | $dt%.2f | $r%.0f | $rc%.1f | $mp%.0f |")
    }
    spark.stop()
  }
}
