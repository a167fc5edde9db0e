package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  private def toks(text: String, init: Seq[String], cont: Seq[String]): Seq[String] =
    Seq(text).toDF("t")
      .select(WordPiece.tokenize(col("t"), init, cont).as("toks"))
      .head.getSeq[String](0)

  test("greedy longest-match with continuation pieces (hand-computed)") {
    val init = Seq("un", "b", "abcd")
    val cont = Seq("able", "a")
    assert(toks("unable", init, cont) == Seq("un", "##able"))
    assert(toks("abcd", init, cont) == Seq("abcd"))
    assert(toks("ba", init, cont) == Seq("b", "##a"))
    // no initial match -> whole word is one [UNK]
    assert(toks("xyz", init, cont) == Seq("[UNK]"))
    // matches 'abcd' then dies at 'e' -> the PARTIAL tokens are discarded
    assert(toks("abcde", init, cont) == Seq("[UNK]"))
    // multiple words, flat output, whitespace runs collapse
    assert(toks("unable  ba", init, cont) ==
      Seq("un", "##able", "b", "##a"))
    assert(toks("", init, cont) == Seq.empty)
  }

  test("longest match wins over an earlier shorter match") {
    // both "a" and "ab" initial: greedy must take "ab"
    val init = Seq("a", "ab")
    val cont = Seq("c", "bc")
    assert(toks("abc", init, cont) == Seq("ab", "##c"))
    // and from a continuation position: "a" + "##bc" beats "##b","##c"
    assert(toks("abc", Seq("a"), Seq("b", "c", "bc")) == Seq("a", "##bc"))
  }

  test("buildVocab is the frequency-weighted top-K with piece tie-break") {
    // words: aa x3, ab x1. initial pieces: a (w=4), aa (3), ab (1).
    val wc = Seq(("aa", 3L), ("ab", 1L)).toDF("word", "freq")
    val (init, cont) = WordPiece.buildVocab(wc, initK = 2, contK = 1)
    assert(init.toSet == Set("a", "aa"))
    // continuation position 2: a (3), b (1) -> top1 = a
    assert(cont == Seq("a"))
  }

  test("vocabulary build is deterministic across runs and partitionings") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val wc = BpeTrainer.wordCounts(docs, "text")
    val a = WordPiece.buildVocab(wc, 30, 60)
    val b = WordPiece.buildVocab(wc.repartition(7), 30, 60)
    assert(a == b)
  }
}
