package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySignalsSpec extends SparkSpec {
  import spark.implicits._

  test("wordEntropy: uniform text has zero entropy, diverse text ln(n)") {
    val docs = Seq(
      (1L, "spam spam spam spam"),
      (2L, "alpha beta gamma delta"),
      (3L, "  \t  "), // whitespace-only: dropped
      (4L, "x x y y")).toDF("doc_id", "text")
    val r = TextAnalysis.wordEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(!r.contains(3L))
    assert(r(1L)._4 == 0.0 && r(1L)._5 == 0.25)
    // all-distinct: H = quantized ln(4), ttr = 1
    assert(r(2L)._4 == math.floor(math.log(4) * 1024) / 1024 &&
      r(2L)._5 == 1.0)
    // two symbols twice each: H = qln(4) - 2*floor(2 ln 2 * 1024)/1024 / 4
    val expected = math.floor(math.log(4) * 1024) / 1024 -
      2 * (math.floor(2 * math.log(2) * 1024) / 1024) / 4
    assert(r(4L)._4 == expected)
    assert(r(1L)._4 < r(4L)._4 && r(4L)._4 < r(2L)._4)
  }

  test("wordEntropy is exact under repartitioning") {
    val docs = (0 until 50)
      .map(i => (i.toLong, s"w${i % 3} w${i % 7} w${i % 7} common text"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.wordEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    val b = TextAnalysis.wordEntropy(docs.repartition(7), "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("skew report: buckets, hot keys, and the skew factor") {
    // key 1 -> 8 rows, key 2 -> 4, keys 3..6 -> 1 each
    val rows = Seq.fill(8)(1L) ++ Seq.fill(4)(2L) ++ Seq(3L, 4L, 5L, 6L)
    val r = SkewReport.report(rows.toDF("k"), "k", 3)
      .as[(String, Long, Long, Double)].collect()
    val total = r.find(_._1 == "total").get
    assert(total._2 == 6 && total._3 == 16)
    // max 8 vs mean 16/6
    assert(total._4 == 8.0 / (16.0 / 6.0))
    val hot = r.filter(_._1 == "hotkey").sortBy(-_._3)
    assert(hot.map(x => (x._2, x._3)).toSeq ==
      Seq((1L, 8L), (2L, 4L), (3L, 1L))) // tie on cnt=1 -> smallest key
    val buckets = r.filter(_._1 == "bucket").map(x => x._2 -> x._3).toMap
    assert(buckets == Map(3L -> 1L, 2L -> 1L, 0L -> 4L))
    // shares of row mass per bucket
    val shares = r.filter(_._1 == "bucket").map(x => x._2 -> x._4).toMap
    assert(shares(3L) == 8.0 / 16 && shares(0L) == 4.0 / 16)
  }
}
