package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GlobalRank must equal the sequential row_number over the same total
  * order — including duplicate sort keys that straddle range-partition
  * boundaries (the tiebreak column carries the order there). */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("distributed rank equals sequential row_number with heavy ties") {
    // many duplicate keys → range boundaries land inside tie runs
    val rows = (0 until 5000).map(i => (i.toLong, (i % 7).toLong))
    val df = rows.toDF("id", "k").repartition(13)
    val got = GlobalRank.withRank(df, "r", col("k"), col("id"))
      .select(col("id"), col("r")).as[(Long, Long)].collect().toMap
    val expect = rows.sortBy { case (id, k) => (k, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == expect)
  }

  test("rank is dense 1..N and total") {
    val df = spark.range(1000).select(
      col("id"), (col("id") % 10).as("k"))
    val r = GlobalRank.withRank(df, "r", col("k"), col("id"))
      .select(col("r")).as[Long].collect().sorted
    assert(r.toSeq == (1L to 1000L))
  }
}
