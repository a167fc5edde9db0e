package graft.multimodal

/** The simple-font byte encodings of ISO 32000-1 Annex D plus the
  * Adobe-Glyph-List subset that /Differences arrays name in practice.
  * Tables are 256 slots of replacement strings; null = no glyph (the
  * extractor skips the byte rather than inventing a character).
  *
  * WinAnsiEncoding is windows-1252 (built from the JDK decoder, with
  * cp1252's five undefined slots nulled); MacRomanEncoding comes from
  * the JDK's x-MacRoman table when the module ships it (fallback:
  * Annex D's Latin-1-overlap subset); StandardEncoding is Adobe's own
  * arrangement — ASCII except quoteright/quoteleft at 0x27/0x60, plus
  * the octal-200..373 ligature/accent block spelled out below. */
private[multimodal] object Encodings {

  private def singleByte(cs: java.nio.charset.Charset,
      undefined: Set[Int]): Array[String] = {
    val t = new Array[String](256)
    val dec = cs.newDecoder()
    var i = 32
    while (i < 256) {
      if (!undefined.contains(i)) {
        try {
          val cb = dec.decode(java.nio.ByteBuffer.wrap(Array(i.toByte)))
          val s = cb.toString
          if (s.nonEmpty && s.charAt(0) != '�') t(i) = s
        } catch { case _: Exception => }
        dec.reset()
      }
      i += 1
    }
    t
  }

  val winAnsi: Array[String] = {
    val t = singleByte(java.nio.charset.Charset.forName("windows-1252"),
      Set(0x81, 0x8d, 0x8f, 0x90, 0x9d, 0xad)) // 0xAD: soft hyphen -> none
    t
  }

  val macRoman: Array[String] =
    try singleByte(java.nio.charset.Charset.forName("x-MacRoman"), Set.empty)
    catch {
      case _: Exception =>
        // jdk.charsets absent: the ASCII core still decodes right
        val t = new Array[String](256)
        var i = 32
        while (i < 127) { t(i) = i.toChar.toString; i += 1 }
        t
    }

  val standard: Array[String] = {
    val t = new Array[String](256)
    var i = 32
    while (i < 127) { t(i) = i.toChar.toString; i += 1 }
    t(0x27) = "’" // quoteright
    t(0x60) = "‘" // quoteleft
    val high: Seq[(Int, String)] = Seq(
      0xa1 -> "¡", 0xa2 -> "¢", 0xa3 -> "£", 0xa4 -> "⁄",
      0xa5 -> "¥", 0xa6 -> "ƒ", 0xa7 -> "§", 0xa8 -> "¤",
      0xa9 -> "'", 0xaa -> "“", 0xab -> "«", 0xac -> "‹",
      0xad -> "›", 0xae -> "ﬁ", 0xaf -> "ﬂ", 0xb1 -> "–",
      0xb2 -> "†", 0xb3 -> "‡", 0xb4 -> "·", 0xb6 -> "¶",
      0xb7 -> "•", 0xb8 -> "‚", 0xb9 -> "„", 0xba -> "”",
      0xbb -> "»", 0xbc -> "…", 0xbd -> "‰", 0xbf -> "¿",
      0xc1 -> "`", 0xc2 -> "´", 0xc3 -> "ˆ", 0xc4 -> "˜",
      0xc5 -> "¯", 0xc6 -> "˘", 0xc7 -> "˙", 0xc8 -> "¨",
      0xca -> "˚", 0xcb -> "¸", 0xcd -> "˝", 0xce -> "˛",
      0xcf -> "ˇ", 0xd0 -> "—", 0xe1 -> "Æ", 0xe3 -> "ª",
      0xe8 -> "Ł", 0xe9 -> "Ø", 0xea -> "Œ", 0xeb -> "º",
      0xf1 -> "æ", 0xf5 -> "ı", 0xf8 -> "ł", 0xf9 -> "ø",
      0xfa -> "œ", 0xfb -> "ß")
    high.foreach { case (c, s) => t(c) = s }
    t
  }

  def byName(n: String): Array[String] = n match {
    case "WinAnsiEncoding" => winAnsi
    case "MacRomanEncoding" => macRoman
    case "MacExpertEncoding" => standard // expert sets are symbol fonts; best effort
    case _ => standard
  }

  /** AGL subset: every name the three Annex D tables use plus the
    * Latin-1 accented set — what real /Differences arrays contain. */
  private val glyphs: Map[String, String] = {
    val ascii = Seq(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
      "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
      "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
      "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
      "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
      "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
      "braceright" -> "}", "asciitilde" -> "~")
    val letters = (('A' to 'Z') ++ ('a' to 'z')).map(c => c.toString -> c.toString)
    val latin1 = Seq(
      "exclamdown" -> "¡", "cent" -> "¢", "sterling" -> "£",
      "currency" -> "¤", "yen" -> "¥", "brokenbar" -> "¦",
      "section" -> "§", "dieresis" -> "¨", "copyright" -> "©",
      "ordfeminine" -> "ª", "guillemotleft" -> "«",
      "logicalnot" -> "¬", "registered" -> "®", "macron" -> "¯",
      "degree" -> "°", "plusminus" -> "±", "twosuperior" -> "²",
      "threesuperior" -> "³", "acute" -> "´", "mu" -> "µ",
      "paragraph" -> "¶", "periodcentered" -> "·", "cedilla" -> "¸",
      "onesuperior" -> "¹", "ordmasculine" -> "º",
      "guillemotright" -> "»", "onequarter" -> "¼", "onehalf" -> "½",
      "threequarters" -> "¾", "questiondown" -> "¿",
      "Agrave" -> "À", "Aacute" -> "Á", "Acircumflex" -> "Â",
      "Atilde" -> "Ã", "Adieresis" -> "Ä", "Aring" -> "Å",
      "AE" -> "Æ", "Ccedilla" -> "Ç", "Egrave" -> "È",
      "Eacute" -> "É", "Ecircumflex" -> "Ê", "Edieresis" -> "Ë",
      "Igrave" -> "Ì", "Iacute" -> "Í", "Icircumflex" -> "Î",
      "Idieresis" -> "Ï", "Eth" -> "Ð", "Ntilde" -> "Ñ",
      "Ograve" -> "Ò", "Oacute" -> "Ó", "Ocircumflex" -> "Ô",
      "Otilde" -> "Õ", "Odieresis" -> "Ö", "multiply" -> "×",
      "Oslash" -> "Ø", "Ugrave" -> "Ù", "Uacute" -> "Ú",
      "Ucircumflex" -> "Û", "Udieresis" -> "Ü", "Yacute" -> "Ý",
      "Thorn" -> "Þ", "germandbls" -> "ß", "agrave" -> "à",
      "aacute" -> "á", "acircumflex" -> "â", "atilde" -> "ã",
      "adieresis" -> "ä", "aring" -> "å", "ae" -> "æ",
      "ccedilla" -> "ç", "egrave" -> "è", "eacute" -> "é",
      "ecircumflex" -> "ê", "edieresis" -> "ë", "igrave" -> "ì",
      "iacute" -> "í", "icircumflex" -> "î", "idieresis" -> "ï",
      "eth" -> "ð", "ntilde" -> "ñ", "ograve" -> "ò",
      "oacute" -> "ó", "ocircumflex" -> "ô", "otilde" -> "õ",
      "odieresis" -> "ö", "divide" -> "÷", "oslash" -> "ø",
      "ugrave" -> "ù", "uacute" -> "ú", "ucircumflex" -> "û",
      "udieresis" -> "ü", "yacute" -> "ý", "thorn" -> "þ",
      "ydieresis" -> "ÿ")
    val punct = Seq(
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "quotesinglbase" -> "‚", "quotedblbase" -> "„",
      "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
      "dagger" -> "†", "daggerdbl" -> "‡", "ellipsis" -> "…",
      "perthousand" -> "‰", "guilsinglleft" -> "‹",
      "guilsinglright" -> "›", "fraction" -> "⁄", "florin" -> "ƒ",
      "fi" -> "ﬁ", "fl" -> "ﬂ", "trademark" -> "™",
      "Euro" -> "€", "euro" -> "€", "minus" -> "−",
      "Lslash" -> "Ł", "lslash" -> "ł", "Scaron" -> "Š",
      "scaron" -> "š", "Zcaron" -> "Ž", "zcaron" -> "ž",
      "OE" -> "Œ", "oe" -> "œ", "Ydieresis" -> "Ÿ",
      "circumflex" -> "ˆ", "tilde" -> "˜", "caron" -> "ˇ",
      "breve" -> "˘", "dotaccent" -> "˙", "ring" -> "˚",
      "ogonek" -> "˛", "hungarumlaut" -> "˝", "dotlessi" -> "ı",
      "nbspace" -> " ", "sfthyphen" -> "­", "middot" -> "·",
      "degreesign" -> "°")
    (ascii ++ letters ++ latin1 ++ punct).toMap
  }

  /** A /Differences glyph name → its text, or null when unmappable
    * (gNN subset ids, ornaments). */
  def glyphToUnicode(name: String): String = {
    glyphs.get(name) match {
      case Some(s) => s
      case None =>
        // uniXXXX[XXXX...] and uXXXX..uXXXXXX hex forms
        if (name.startsWith("uni") && name.length >= 7 &&
            (name.length - 3) % 4 == 0) {
          try {
            val sb = new java.lang.StringBuilder((name.length - 3) / 4)
            var i = 3
            while (i < name.length) {
              sb.append(Integer.parseInt(name.substring(i, i + 4), 16).toChar)
              i += 4
            }
            sb.toString
          } catch { case _: NumberFormatException => null }
        } else if (name.length >= 5 && name.length <= 7 && name.charAt(0) == 'u') {
          try new String(Character.toChars(Integer.parseInt(name.substring(1), 16)))
          catch { case _: Exception => null }
        } else null
    }
  }
}
