package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Scale-technique demonstrations: salted aggregation and bucketed
  * co-located joins (SURVEY §4: hash partitioning / bucketing). */
class ScaleOpsSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val salted = SkewedAgg.saltedSumCount(li, Seq("l_returnflag"),
        col("l_quantity").cast("long"), saltBuckets = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("long")), count(lit(1)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("dynamic partition pruning fires on partitioned fact joins") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val o = Tables.load(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    o.write.partitionBy("o_year").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim filter NOT on the join key → static constant propagation can't
    // prune; only runtime (dynamic) pruning can
    val dim = o.filter(col("o_totalprice") > 400000)
      .select(col("o_year").as("d_year")).distinct()
    val joined = fact.join(dim, col("o_year") === col("d_year"))
    val plan = joined.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning in:\n$plan")
    val wantYears = dim.collect().map(_.getInt(0)).toSet
    assert(joined.count() ==
      o.filter(col("o_year").isInCollection(wantYears)).count())
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf — use the default; clear any
    // leftover managed-table locations from previous runs first
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    Seq("b_orders", "b_lineitem").foreach { t =>
      s2.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val o = Tables.load(s2.sqlContext.sparkSession, sfDir, "orders")
    val l = Tables.load(s2.sqlContext.sparkSession, sfDir, "lineitem")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    l.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val joined = s2.table("b_lineitem").join(s2.table("b_orders"),
      col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() ==
      l.join(o, col("l_orderkey") === col("o_orderkey")).count())
  }
}
