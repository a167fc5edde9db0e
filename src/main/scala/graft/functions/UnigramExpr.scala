package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UNIGRAM_SEGMENT(text) — unigram-LM tokenizer INFERENCE in the
  * SentencePiece family (Kudo 2018): per whitespace word, the Viterbi
  * segmentation over a weighted piece vocabulary. Where SentencePiece
  * maximizes Σ log p(piece) with EM-trained floats, this uses the
  * EXACT-ARITHMETIC objective (lexicographic): (1) fewest pieces,
  * (2) largest total piece weight (corpus frequencies, integers),
  * (3) longest final piece at each DP cell — a total order with no
  * transcendental ops, so the DP replays bit-identically in any engine
  * (log would not: libm vs StrictMath differ in final ulps). Fewest-
  * pieces-then-heaviest tracks the unigram-LM preference for long,
  * frequent pieces while keeping every comparison integer-exact.
  *
  * The vocabulary (pieces + weights) is driver-collected model state
  * baked into the expression, like the BPE merge list — tokenization
  * is a zero-shuffle projection. DP is O(len * maxPiece) per word.
  * Words longer than `maxWord` become a single [UNK] with weight 0
  * (mirrors the oracle's recursion-depth cap). Single characters must
  * all be present in the vocabulary (the builder guarantees it), so
  * the DP always has a feasible path.
  *
  * Returns STRUCT(toks ARRAY<STRING>, wt BIGINT) — token stream plus
  * the summed weight of chosen pieces (the DP objective's second
  * component, a strong fingerprint for the oracle).
  */
case class UnigramSegment(child: Expression, pieces: Seq[String],
    weights: Seq[Long], maxPiece: Int, maxWord: Int)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val vocab: Map[String, Long] =
    pieces.zip(weights).toMap

  override def dataType: DataType = StructType(Seq(
    StructField("toks", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("wt", LongType, nullable = false)))
  override def prettyName: String = "unigram_segment"

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var totalWt = 0L
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        if (w.length > maxWord) out += UTF8String.fromString(UnigramSegment.Unk)
        else totalWt += segmentWord(w, out)
      }
      wi += 1
    }
    InternalRow(new GenericArrayData(out.toArray), totalWt)
  }

  /** Viterbi DP; appends chosen pieces to `out`, returns their summed
    * weight. cell(i) = best (cnt, wt, backpointer-j) for prefix
    * w[0,i). Candidates are scanned j = maxPiece..1 with STRICT
    * improvement, so the longer piece wins (cnt, wt) ties — the same
    * order the oracle's (cnt, -wt, -j) struct sort realizes. */
  private def segmentWord(
      w: String, out: scala.collection.mutable.ArrayBuffer[Any]): Long = {
    val n = w.length
    val cnt = new Array[Int](n + 1)
    val wt = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1) // chosen piece length at cell i
    var i = 1
    while (i <= n) {
      var bestCnt = Int.MaxValue
      var bestWt = Long.MinValue
      var bestJ = 0
      var j = math.min(maxPiece, i)
      while (j >= 1) {
        val p = w.substring(i - j, i)
        vocab.get(p) match {
          case Some(pw) =>
            val c = cnt(i - j) + 1
            val s = wt(i - j) + pw
            if (c < bestCnt || (c == bestCnt && s > bestWt)) {
              bestCnt = c; bestWt = s; bestJ = j
            }
          case None =>
        }
        j -= 1
      }
      cnt(i) = bestCnt; wt(i) = bestWt; bp(i) = bestJ
      i += 1
    }
    // reconstruct pieces from backpointers
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      rev += w.substring(pos - bp(pos), pos)
      pos -= bp(pos)
    }
    var k = rev.length - 1
    while (k >= 0) {
      out += UTF8String.fromString(rev(k))
      k -= 1
    }
    wt(n)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSegment {
  /** Pieces are <= maxPiece (4) chars — the 5-char marker can't collide. */
  val Unk = "[UNK]"
}
