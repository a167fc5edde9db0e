package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation: two-stage salted aggregate. At 100 TB a
  * handful of hot keys (empty doc hash, null-ish user, a viral item)
  * can pin one reducer; salting fans each key across `saltBuckets`
  * partial groups, aggregates, then merges — the classic mitigation
  * when AQE's skew handling can't apply (skewed AGGREGATES rather than
  * joins). Works for any associative aggregate; exposed for sum/count.
  */
object SkewedAgg {

  /** Salted sum+count of `valueCol` grouped by `keys`. Results are
    * identical to a direct groupBy (associativity), but the first
    * shuffle distributes each key over `saltBuckets` reducers. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
      saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).as("n"))
  }
}
