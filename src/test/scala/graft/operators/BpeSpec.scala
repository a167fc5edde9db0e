package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training vs the hand-computed Sennrich et al. (2016) example:
  * vocabulary {low:5, lower:2, newest:6, widest:3}. */
class BpeSpec extends SparkSpec {

  import spark.implicits._
  import BpeTrainer.MergeStep

  private def words() = {
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
  }

  test("learns the classic merge sequence with deterministic tie-breaks") {
    val (merges, vocab) = BpeTrainer.train(words(), numMerges = 5)
    // pair counts at step 1: (e,s)=(s,t)=(t,</w>)=9 → lexicographic
    // tie-break picks (e,s); then est, est</w>; then (l,o)=(o,w)=7 → lo, low
    assert(merges == Seq(
      MergeStep(1, "e", "s", "es", 9),
      MergeStep(2, "es", "t", "est", 9),
      MergeStep(3, "est", "</w>", "est</w>", 9),
      MergeStep(4, "l", "o", "lo", 7),
      MergeStep(5, "lo", "w", "low", 7)))
    val sym = vocab.filter(col("word") === "newest")
      .select(col("symbols")).collect().head.getSeq[String](0)
    assert(sym == Seq("n", "e", "w", "est</w>"))
    vocab.unpersist()
  }

  test("tokenize replays merges greedily, left to right") {
    val (merges, vocab) = BpeTrainer.train(words(), numMerges = 5)
    vocab.unpersist()
    val toks = spark.range(1)
      .select(BpeTrainer.tokenize(lit("newest widest  lowly"), merges).as("t"))
      .collect().head.getSeq[String](0)
    assert(toks == Seq("n", "e", "w", "est</w>",
      "w", "i", "d", "est</w>",
      "low", "l", "y", "</w>"))
  }

  test("training stops when no pair repeats") {
    val (merges, vocab) =
      BpeTrainer.train(Seq(("ab", 1L), ("cd", 1L)).toDF("word", "freq"), 10)
    assert(merges.isEmpty)
    vocab.unpersist()
  }

  test("greedy fold handles overlapping pairs (aaa with merge a+a)") {
    val (merges, vocab) =
      BpeTrainer.train(Seq(("aaa", 4L)).toDF("word", "freq"), 1)
    assert(merges.head.left == "a" && merges.head.right == "a")
    val sym = vocab.select(col("symbols")).collect().head.getSeq[String](0)
    // left-to-right: [a,a,a,</w>] → [aa,a,</w>], never [a,aa,</w>]
    assert(sym == Seq("aa", "a", "</w>"))
    vocab.unpersist()
  }

  test("wordCounts aggregates the corpus once with whitespace splitting") {
    val corpus = Seq("to be or not to be", "be  quick").toDF("text")
    val wc = BpeTrainer.wordCounts(corpus, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wc == Map("to" -> 2L, "be" -> 3L, "or" -> 1L, "not" -> 1L,
      "quick" -> 1L))
  }
}
