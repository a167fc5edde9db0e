package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewedJoinSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed fact: 80% of rows share key 0
  private def fact = (0L until 5000L)
    .map(i => (if (i % 5 != 0) 0L else i % 97, i)).toDF("k", "fv")
  private def build = (0L until 97L).map(i => (i, s"d$i")).toDF("k", "bv")

  test("saltedJoin equals the plain join under skew") {
    val plain = fact.join(build, Seq("k"))
      .select("k", "fv", "bv").as[(Long, Long, String)].collect().sorted.toSeq
    for (buckets <- Seq(1, 4, 16)) {
      val salted = SkewedJoin.saltedJoin(fact, build, "k", buckets)
        .select("k", "fv", "bv").as[(Long, Long, String)].collect().sorted.toSeq
      assert(salted == plain, s"buckets=$buckets")
    }
  }

  test("saltedJoinHotKeys equals the plain join, salting only key 0") {
    val plain = fact.join(build, Seq("k"))
      .select("k", "fv", "bv").as[(Long, Long, String)].collect().sorted.toSeq
    val mixed = SkewedJoin.saltedJoinHotKeys(fact, build, "k", Seq(0L), 8)
      .select("k", "fv", "bv").as[(Long, Long, String)].collect().sorted.toSeq
    assert(mixed == plain)
  }

  test("the salted key spreads the hot key across buckets") {
    val dist = fact.filter(col("k") === 0L)
      .withColumn("__salt",
        pmod(hash(spark_partition_id(), monotonically_increasing_id()), lit(8)))
      .groupBy("__salt").count().as[(Int, Long)].collect().toMap
    assert(dist.size == 8) // every bucket populated
    val (mn, mx) = (dist.values.min, dist.values.max)
    assert(mx < 2 * mn, s"imbalanced: $dist") // roughly even spread
  }
}
