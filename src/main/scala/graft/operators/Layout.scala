package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.ZOrder64

/** Multi-dimensional data layout for scan pruning — the write-side
  * optimization that makes a 100 TB table cheap to READ: cluster rows by
  * the Z-order (Morton) interleave of the filter columns, so every file
  * / parquet row group covers a small hyper-rectangle of the key space
  * and min/max statistics prune most of the table for a selective filter
  * on any subset of the layout dimensions.
  *
  * A single-column sort clusters only its leading column (a filter on
  * the second column still scans everything); Z-order spreads locality
  * across all dimensions at a modest per-dimension cost — the standard
  * trade (public: Morton 1966, Databricks OPTIMIZE ZORDER BY, Iceberg
  * sort orders).
  *
  * Scale shape: `cluster` is one range-repartition (sampling pass for
  * the range bounds + one shuffle on the z key — exactly what a global
  * sort costs) followed by an in-partition sort; no driver state.
  */
object Layout {

  /** Z-order value of the given (long-castable) columns; inputs are
    * masked to the low `bits` bits — normalize the domain first. */
  def zorder(bits: Int, cols: Column*): Column =
    ColumnBridge.column(ZOrder64(
      cols.map(c => ColumnBridge.expression(c.cast("long"))), bits))

  /** Returns `df` re-clustered so that writes produce z-locality:
    * range-partitioned into `numPartitions` by the z value of `cols`,
    * rows sorted by z within each partition. Write the result with
    * any file sink to get the pruning benefit. */
  def cluster(df: DataFrame, numPartitions: Int, bits: Int,
      cols: String*): DataFrame = {
    val z = zorder(bits, cols.map(col): _*)
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }
}
