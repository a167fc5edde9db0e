package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WORDPIECE_TOKENS(text) — WordPiece tokenizer INFERENCE (Wu et al.
  * 2016, the BERT tokenizer): per whitespace word, greedy
  * longest-match-first against a piece vocabulary; continuation pieces
  * (match at position > 0) carry the "##" prefix; a word with no match
  * at some position becomes the single [UNK] token. The vocabulary is
  * plain model state baked into the expression (like the BPE merge
  * list in operators.BpeTrainer.tokenize) — a zero-shuffle projection,
  * embarrassingly parallel at 100 TB.
  *
  * Pieces are capped at `maxPiece` characters, which bounds the inner
  * loop at maxPiece set probes per emitted token — O(len * maxPiece)
  * per word, no backtracking (greedy, not Viterbi).
  */
case class WordPieceTokens(child: Expression, init: Seq[String],
    cont: Seq[String], maxPiece: Int)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val initSet: Set[String] = init.toSet
  @transient private lazy val contSet: Set[String] = cont.toSet

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_tokens"

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var wi = 0
    while (wi < words.length) {
      if (words(wi).nonEmpty) tokenizeWord(words(wi), out)
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def tokenizeWord(
      w: String, out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    val start = out.length
    var pos = 0
    var failed = false
    while (pos < w.length && !failed) {
      var n = math.min(maxPiece, w.length - pos)
      var matched: String = null
      while (n >= 1 && matched == null) {
        val p = w.substring(pos, pos + n)
        if (pos == 0) { if (initSet.contains(p)) matched = p }
        else if (contSet.contains(p)) matched = "##" + p
        n -= 1
      }
      if (matched == null) failed = true
      else {
        out += UTF8String.fromString(matched)
        pos += (if (pos == 0) matched.length else matched.length - 2)
      }
    }
    if (failed) {
      out.dropRightInPlace(out.length - start)
      out += UTF8String.fromString(WordPieceTokens.Unk)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceTokens {
  /** Pieces are <= maxPiece (4) chars, so the 5-char marker can never
    * collide with a real vocabulary entry. */
  val Unk = "[UNK]"
}
