package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.UnigramSegment

/** Unigram-LM tokenizer (SentencePiece family) with a corpus-derived
  * weighted piece vocabulary — completes the tokenizer trio next to
  * [[BpeTrainer]] (BPE training + inference) and [[WordPiece]] (greedy
  * longest-match inference). The vocabulary build is deterministic
  * distributed computation: all character n-grams (n <= [[MaxPiece]])
  * at word positions 1..[[MaxPos]], weighted by word frequency; the
  * top `k` by (weight desc, piece asc) join the full single-character
  * alphabet (guaranteed DP feasibility). No EM, no randomness — a SQL
  * oracle rebuilds the identical vocabulary and replays the Viterbi
  * DP (graft.functions.UnigramSegment) cell by cell.
  *
  * Scale shape: ONE corpus shuffle (the word-frequency table, shared
  * with BPE/WordPiece) + a vocab-sized top-K aggregation; the
  * collected vocabulary is bounded driver-side model state (k pieces +
  * alphabet); segmentation is a zero-shuffle projection.
  */
object Unigram {

  val MaxPiece = 4
  val MaxPos = 40
  /** Recursion-depth cap shared with the oracle: longer words become
    * one [UNK]. */
  val MaxWord = 40

  /** Weighted piece vocabulary from a (word, freq) table: top-k
    * n-grams by (summed weight desc, piece asc) plus every single
    * character (with its weight), deduplicated. */
  def buildVocab(wc: DataFrame, k: Int): Seq[(String, Long)] = {
    val grams = wc
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, least(length(word), $MaxPos)),
              p -> transform(sequence(1, least($MaxPiece, length(word) - p + 1)),
                n -> substring(word, p, n))))"""))
        .as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("w"))
    val top = grams.orderBy(col("w").desc, col("piece")).limit(k)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val chars = grams.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    (top ++ chars).distinct.toSeq
  }

  /** Viterbi segmentation of `text`:
    * STRUCT(toks ARRAY<STRING>, wt BIGINT). */
  def segment(text: Column, vocab: Seq[(String, Long)]): Column =
    ColumnBridge.column(UnigramSegment(ColumnBridge.expression(text),
      vocab.map(_._1), vocab.map(_._2), MaxPiece, MaxWord))
}
