package graft.multimodal

/** The Standard security handler of ISO 32000 §7.6 — the decryption
  * half of the PDF route. The dominant real-corpus case is an
  * "owner-password-only" document: restrictions are declared but the
  * USER password is empty, so any conformant reader (and any crawler)
  * can decrypt. This implements exactly that case:
  *
  *  - R2 (40-bit RC4), R3 (40..128-bit RC4), R4 with crypt filters
  *    (/CFM /V2 = RC4, /AESV2 = AES-128-CBC with the per-object key
  *    salt "sAlT"), R6 (PDF 2.0 AES-256 with the §7.6.4.3.4 iterated
  *    hash and the /UE-wrapped file key);
  *  - the empty user password is authenticated against /U before any
  *    key is handed out (algorithm 6 for R≤4; the validation-salt
  *    hash for R6) — a document locked with a REAL user password
  *    yields None and stays NULL downstream, never garbage;
  *  - per-object keys (MD5(fileKey + objnum/gen LE bytes [+ sAlT]))
  *    for R≤4; R6 uses the file key directly; AES payloads carry
  *    their IV in the first 16 ciphertext bytes, PKCS#7 padding
  *    stripped tolerantly (truncated crawl payloads must not throw).
  *
  * RC4 is implemented inline (16 lines — no JCE provider dependence);
  * MD5/SHA-2 and AES-CBC come from the JDK. Fixture parity is pinned
  * against the INDEPENDENT python `cryptography` encryptors in
  * tools/make_pdf_crypt_fixtures.py across all four revisions. */
private[multimodal] object PdfCrypt {

  private val Pad: Array[Byte] = Array(
    0x28, 0xbf, 0x4e, 0x5e, 0x4e, 0x75, 0x8a, 0x41,
    0x64, 0x00, 0x4e, 0x56, 0xff, 0xfa, 0x01, 0x08,
    0x2e, 0x2e, 0x00, 0xb6, 0xd0, 0x68, 0x3e, 0x80,
    0x2f, 0x0c, 0xa9, 0xfe, 0x64, 0x53, 0x69, 0x7a).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def aesCbc(mode: Int, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** AES payload: IV(16) + CBC ciphertext + PKCS#7 pad. Tolerant of
    * truncation/misalignment: returns empty rather than throwing. */
  private def aesDecryptPayload(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || (data.length - 16) % 16 != 0)
      return Array.empty[Byte]
    val iv = java.util.Arrays.copyOfRange(data, 0, 16)
    val out = aesCbc(javax.crypto.Cipher.DECRYPT_MODE, key, iv,
      java.util.Arrays.copyOfRange(data, 16, data.length))
    val pad = out(out.length - 1) & 0xff
    if (pad >= 1 && pad <= 16 && pad <= out.length)
      java.util.Arrays.copyOfRange(out, 0, out.length - pad)
    else out
  }

  sealed trait Method
  case object MRc4 extends Method
  case object MAes128 extends Method
  case object MAes256 extends Method
  case object MIdentity extends Method

  final class Decryptor(fileKey: Array[Byte],
      stmMethod: Method, strMethod: Method) {

    private def objKey(num: Int, gen: Int, aes: Boolean): Array[Byte] = {
      val ext = new java.io.ByteArrayOutputStream(9)
      ext.write(num & 0xff); ext.write((num >> 8) & 0xff); ext.write((num >> 16) & 0xff)
      ext.write(gen & 0xff); ext.write((gen >> 8) & 0xff)
      if (aes) { ext.write(0x73); ext.write(0x41); ext.write(0x6c); ext.write(0x54) }
      val k = md5(fileKey, ext.toByteArray)
      java.util.Arrays.copyOf(k, math.min(fileKey.length + 5, 16))
    }

    private def apply(m: Method, data: Array[Byte], num: Int, gen: Int): Array[Byte] =
      m match {
        case MIdentity => data
        case MRc4 => rc4(objKey(num, gen, aes = false), data)
        case MAes128 => aesDecryptPayload(objKey(num, gen, aes = true), data)
        case MAes256 => aesDecryptPayload(fileKey, data)
      }

    def stream(data: Array[Byte], num: Int, gen: Int): Array[Byte] =
      try apply(stmMethod, data, num, gen)
      catch { case _: Exception => Array.empty[Byte] }

    def string(data: Array[Byte], num: Int, gen: Int): Array[Byte] =
      try apply(strMethod, data, num, gen)
      catch { case _: Exception => Array.empty[Byte] }
  }

  /** §7.6.4.3.4 (R6) password hash: SHA-256 seed, then the 64+ round
    * AES-CBC / modulo-3 SHA-256/384/512 loop. */
  private def hash2B(pwd: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", pwd, salt, udata)
    var round = 0
    var done = false
    while (!done) {
      val block = new Array[Byte](pwd.length + k.length + udata.length)
      System.arraycopy(pwd, 0, block, 0, pwd.length)
      System.arraycopy(k, 0, block, pwd.length, k.length)
      System.arraycopy(udata, 0, block, pwd.length + k.length, udata.length)
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length)
        i += 1
      }
      val e = aesCbc(javax.crypto.Cipher.ENCRYPT_MODE,
        java.util.Arrays.copyOf(k, 16),
        java.util.Arrays.copyOfRange(k, 16, 32), k1)
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xff; i += 1 }
      k = (sum % 3) match {
        case 0 => sha("SHA-256", e)
        case 1 => sha("SHA-384", e)
        case _ => sha("SHA-512", e)
      }
      round += 1
      if (round >= 64 && (e(e.length - 1) & 0xff) <= round - 32) done = true
      if (round > 1024) done = true // malformed-input bound
    }
    java.util.Arrays.copyOf(k, 32)
  }

  /** Build a decryptor for the empty user password, or None when the
    * handler/revision is unsupported or the document is truly
    * user-password-locked. `resolve` dereferences /Encrypt members. */
  def build(enc: Pdf.PDict, id0: Array[Byte],
      resolve: Pdf.Obj => Pdf.Obj): Option[Decryptor] = {
    def num(k: String, dflt: Int): Int = resolve(enc.get(k).getOrElse(Pdf.PNull)) match {
      case Pdf.PNum(v) => v.toInt
      case _ => dflt
    }
    def str(k: String): Array[Byte] = resolve(enc.get(k).getOrElse(Pdf.PNull)) match {
      case Pdf.PStr(b) => b
      case _ => Array.empty[Byte]
    }
    def name(k: String): String = resolve(enc.get(k).getOrElse(Pdf.PNull)) match {
      case Pdf.PName(v) => v
      case _ => null
    }
    if (name("Filter") != "Standard") return None
    val v = num("V", 0)
    val r = num("R", 0)
    val o = str("O")
    val u = str("U")
    val p = num("P", -1)

    if (r >= 2 && r <= 4) {
      if (o.length < 32 || u.length < 32) return None
      // crypt-filter resolution (V4): /CF /StmF /StrF
      var stmM: Method = MRc4
      var strM: Method = MRc4
      var cfLenBytes = -1
      if (v == 4) {
        val cf = resolve(enc.get("CF").getOrElse(Pdf.PNull)) match {
          case d: Pdf.PDict => d
          case _ => Pdf.PDict(Map.empty)
        }
        def filterOf(k: String): Method = {
          val fname = resolve(enc.get(k).getOrElse(Pdf.PNull)) match {
            case Pdf.PName(n) => n
            case _ => "Identity"
          }
          if (fname == "Identity") MIdentity
          else resolve(cf.get(fname).getOrElse(Pdf.PNull)) match {
            case d: Pdf.PDict =>
              resolve(d.get("CFM").getOrElse(Pdf.PNull)) match {
                case Pdf.PName("AESV2") =>
                  resolve(d.get("Length").getOrElse(Pdf.PNull)) match {
                    case Pdf.PNum(l) =>
                      cfLenBytes = if (l >= 40) l.toInt / 8 else l.toInt
                    case _ =>
                  }
                  MAes128
                case Pdf.PName("V2") =>
                  resolve(d.get("Length").getOrElse(Pdf.PNull)) match {
                    case Pdf.PNum(l) =>
                      cfLenBytes = if (l >= 40) l.toInt / 8 else l.toInt
                    case _ =>
                  }
                  MRc4
                case _ => MIdentity
              }
            case _ => MIdentity
          }
        }
        stmM = filterOf("StmF")
        strM = filterOf("StrF")
      }
      val lenBits = num("Length", 40)
      val n = if (cfLenBytes > 0) cfLenBytes
        else if (r == 2) 5 else math.max(5, math.min(16, lenBits / 8))
      val encryptMetadata = resolve(enc.get("EncryptMetadata").getOrElse(
        Pdf.PBool(true))) match {
        case Pdf.PBool(b) => b
        case _ => true
      }
      // algorithm 2, empty user password
      val pLe = Array[Byte](p.toByte, (p >> 8).toByte, (p >> 16).toByte,
        (p >> 24).toByte)
      val extra = if (r >= 4 && !encryptMetadata)
        Array[Byte](-1, -1, -1, -1) else Array.empty[Byte]
      var key = md5(Pad, java.util.Arrays.copyOf(o, 32), pLe, id0, extra)
      key = java.util.Arrays.copyOf(key, n)
      if (r >= 3) {
        var i = 0
        while (i < 50) { key = java.util.Arrays.copyOf(md5(key), n); i += 1 }
      }
      // authenticate against /U (algorithms 4/5)
      val ok =
        if (r == 2) java.util.Arrays.equals(rc4(key, Pad),
          java.util.Arrays.copyOf(u, 32))
        else {
          var t = rc4(key, md5(Pad, id0))
          var i = 1
          while (i <= 19) {
            val ki = key.map(b => (b ^ i).toByte)
            t = rc4(ki, t)
            i += 1
          }
          // R3/4 store 16 significant bytes + 16 of padding
          java.util.Arrays.equals(java.util.Arrays.copyOf(t, 16),
            java.util.Arrays.copyOf(u, 16))
        }
      if (!ok) return None
      if (v == 4) Some(new Decryptor(key, stmM, strM))
      else Some(new Decryptor(key, MRc4, MRc4))
    } else if (r == 6 || r == 5) {
      if (u.length < 48) return None
      val uHash = java.util.Arrays.copyOf(u, 32)
      val vSalt = java.util.Arrays.copyOfRange(u, 32, 40)
      val kSalt = java.util.Arrays.copyOfRange(u, 40, 48)
      val empty = Array.empty[Byte]
      val check =
        if (r == 6) hash2B(empty, vSalt, empty)
        else sha("SHA-256", vSalt) // R5: single SHA-256(pwd+salt)
      if (!java.util.Arrays.equals(check, uHash)) return None
      val ue = str("UE")
      if (ue.length < 32) return None
      val inter =
        if (r == 6) hash2B(empty, kSalt, empty)
        else sha("SHA-256", kSalt)
      val fileKey = aesCbc(javax.crypto.Cipher.DECRYPT_MODE, inter,
        new Array[Byte](16), java.util.Arrays.copyOf(ue, 32))
      Some(new Decryptor(fileKey, MAes256, MAes256))
    } else None
  }
}
