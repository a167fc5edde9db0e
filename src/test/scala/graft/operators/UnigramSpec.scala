package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def seg(text: String, vocab: Seq[(String, Long)]): (Seq[String], Long) = {
    val r = Seq(text).toDF("t")
      .select(Unigram.segment(col("t"), vocab).as("s"))
      .select(col("s.toks"), col("s.wt"))
      .as[(Seq[String], Long)].collect().head
    r
  }

  test("fewest pieces wins regardless of weight") {
    val v = Seq("ab" -> 10L, "abc" -> 5L, "a" -> 3L, "b" -> 2L, "c" -> 1L)
    assert(seg("abc", v) == (Seq("abc"), 5L))
    assert(seg("abab", v) == (Seq("ab", "ab"), 20L))
  }

  test("weight breaks piece-count ties") {
    val v = Seq("ab" -> 5L, "cd" -> 5L, "abc" -> 2L, "d" -> 7L,
      "a" -> 1L, "b" -> 1L, "c" -> 1L)
    // "abc"+"d" = (2, 9) vs "ab"+"cd" = (2, 10) -> heavier wins
    assert(seg("abcd", v) == (Seq("ab", "cd"), 10L))
  }

  test("longer final piece breaks exact (cnt, wt) ties") {
    val v = Seq("a" -> 5L, "b" -> 3L, "c" -> 4L, "bc" -> 7L, "ab" -> 8L)
    // cell 3 of "abc": "ab"+"c" = (2, 12) vs "a"+"bc" = (2, 12) -> j=2
    assert(seg("abc", v) == (Seq("a", "bc"), 12L))
  }

  test("multi-word text concatenates tokens and sums weights") {
    val v = Seq("ab" -> 5L, "a" -> 2L, "b" -> 1L)
    assert(seg("ab a  b", v) == (Seq("ab", "a", "b"), 8L))
  }

  test("overlong words collapse to [UNK] with weight 0") {
    val v = Seq("a" -> 1L)
    val w = "a" * 41
    assert(seg(s"$w a", v) == (Seq("[UNK]", "a"), 1L))
  }

  test("buildVocab includes the full alphabet and is deterministic") {
    val wc = Seq(("hello", 10L), ("help", 5L), ("world", 3L))
      .toDF("word", "freq")
    val v1 = Unigram.buildVocab(wc, 10)
    val v2 = Unigram.buildVocab(wc.repartition(7), 10)
    assert(v1.toSet == v2.toSet)
    val pieces = v1.map(_._1).toSet
    "helpworld".foreach(c => assert(pieces.contains(c.toString), c))
    // every corpus word segments with zero [UNK]
    val toks = seg("hello help world", v1)._1
    assert(!toks.contains("[UNK]"))
  }
}
