package graft.multimodal

/** Shared CRLF/LF-tolerant line framing used by [[WarcRecordsExpr]]
  * and [[HttpResponseExpr]] — one framing rule for the two protocols
  * that share it (ISO 28500 blocks carry RFC 9112 messages). */
private[multimodal] object TextFraming {

  /** ASCII line starting at `i` up to (not incl.) the CR/LF; returns
    * (line, next index past the terminator) or null at EOF /
    * unterminated (truncated) input. */
  def line(b: Array[Byte], i: Int): (String, Int) = {
    if (i >= b.length) return null
    var j = i
    while (j < b.length && b(j) != '\n') j += 1
    if (j >= b.length) return null
    val end = if (j > i && b(j - 1) == '\r') j - 1 else j
    (new String(b, i, end - i, "ISO-8859-1"), j + 1)
  }
}
