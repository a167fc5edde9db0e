package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.WordPieceTokens

/** WordPiece tokenization over a CORPUS-DERIVED piece vocabulary — the
  * inference-side companion to [[BpeTrainer]] (training). The
  * vocabulary build is itself a deterministic distributed computation:
  * word-initial pieces are the top-`initK` character n-grams
  * (n <= [[MaxPiece]]) at word start, continuation pieces the
  * top-`contK` n-grams at positions 2..[[MaxPos]], both weighted by
  * word frequency with ties broken by piece string — total order, no
  * randomness, so a SQL oracle can rebuild the identical vocabulary and
  * replay the greedy matcher (recursive CTE) to the same tokens.
  *
  * Scale shape: ONE corpus-sized shuffle (the word-frequency table,
  * shared with BPE training) + two vocab-sized top-K aggregations; the
  * collected vocabulary is bounded driver-side model state (initK +
  * contK strings), and tokenization is a zero-shuffle projection.
  */
object WordPiece {

  val MaxPiece = 4
  val MaxPos = 40

  /** Top-K piece vocabularies from a (word, freq) table:
    * (word-initial pieces, continuation pieces — WITHOUT "##"). */
  def buildVocab(wc: DataFrame, initK: Int, contK: Int): (Seq[String], Seq[String]) = {
    val init = wc
      .select(col("freq"), explode(expr(
        s"transform(sequence(1, least($MaxPiece, length(word))), n -> substring(word, 1, n))"))
        .as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("w"))
      .orderBy(col("w").desc, col("piece")).limit(initK)
      .collect().map(_.getString(0)).toSeq
    val cont = wc.filter(length(col("word")) >= 2)
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(2, least(length(word), $MaxPos)),
              p -> transform(sequence(1, least($MaxPiece, length(word) - p + 1)),
                n -> substring(word, p, n))))"""))
        .as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("w"))
      .orderBy(col("w").desc, col("piece")).limit(contK)
      .collect().map(_.getString(0)).toSeq
    (init, cont)
  }

  /** Greedy longest-match tokens of `text` (flat across its words). */
  def tokenize(text: Column, init: Seq[String], cont: Seq[String]): Column =
    ColumnBridge.column(WordPieceTokens(ColumnBridge.expression(text), init, cont, MaxPiece))
}
