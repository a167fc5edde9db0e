package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators — reference: StreamExecDeduplicate.java +
  * DeduplicateFunctionHelper.java:29 (keep FIRST/LAST row per key), and
  * the exact-dedup patterns a training-data pipeline needs.
  *
  * Scale: row_number-over-key is one shuffle on the dedup key; Catalyst
  * plans a partial TopK (WindowGroupLimit) before the shuffle in Spark 4,
  * so only one row per (partition, key) crosses the wire.
  */
object Dedup {

  /** Keep the first row per key by the given order (reference: dedup
    * keep-first, recognized from ROW_NUMBER()=1 in Flink's planner). */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Keep the last row per key: same operator, reversed order. */
  def keepLast(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    keepFirst(df, keys, order.map(_.desc))

  /** Exact duplicate removal on a set of columns (hash group-by). */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)
}
