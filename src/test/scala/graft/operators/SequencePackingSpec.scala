package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SequencePackingSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: fold over rows in id order. */
  private def model(rows: Seq[(Long, Long)], ctx: Long)
      : Map[Long, (Long, Long, Long, Long)] = {
    var off = 0L
    rows.sortBy(_._1).map { case (id, tok) =>
      val r = (id, (off, off / ctx, (off + tok - 1) / ctx, off % ctx))
      off += tok
      r
    }.toMap
  }

  private def run(rows: Seq[(Long, Long)], ctx: Long, parts: Int) =
    SequencePacking.pack(rows.toDF("id", "tok"), "id", "tok", ctx, parts)
      .select($"id", $"tok_offset", $"seq_first", $"seq_last", $"pos_in_seq")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  test("distributed prefix sum equals the sequential definition") {
    val rnd = new Random(7)
    val rows = (0L until 500L).map(i => (i, 1L + rnd.nextInt(400).toLong))
    val want = model(rows, 2048)
    assert(run(rows, 2048, 8) == want)
    // partition count must not matter
    assert(run(rows, 2048, 1) == want)
    assert(run(rows, 2048, 32) == want)
  }

  test("documents spanning context boundaries get correct seq ranges") {
    // ctx=100; doc sizes chosen to straddle: 60, 60 (spans 0-1), 100, ...
    val rows = Seq((1L, 60L), (2L, 60L), (3L, 100L), (4L, 30L))
    val got = run(rows, 100, 2)
    assert(got(1L) == (0L, 0L, 0L, 0L))     // [0,60)
    assert(got(2L) == (60L, 0L, 1L, 60L))   // [60,120) spans seq 0 and 1
    assert(got(3L) == (120L, 1L, 2L, 20L))  // [120,220)
    assert(got(4L) == (220L, 2L, 2L, 20L))  // [220,250)
  }

  test("non-contiguous, unordered ids pack in id order") {
    val rows = Seq((50L, 10L), (3L, 5L), (900L, 7L), (20L, 2L))
    val got = run(rows, 16, 4)
    assert(got(3L)._1 == 0L)
    assert(got(20L)._1 == 5L)
    assert(got(50L)._1 == 7L)
    assert(got(900L)._1 == 17L)
  }

  test("no global single-partition window in the plan") {
    val rows = (0L until 100L).map(i => (i, 10L))
    val df = SequencePacking.pack(rows.toDF("id", "tok"), "id", "tok", 64, 4)
    val plan = df.queryExecution.executedPlan.toString
    // the window must be partitioned (by __pid), never Window [global]
    assert(!plan.contains("SinglePartition"), plan)
  }
}
