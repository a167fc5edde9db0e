package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row_number: the exact 1-based rank of every row
  * under a total order, without the single-partition WindowExec that
  * `row_number().over(Window.orderBy(…))` plans (Spark warns, and at
  * 100 TB that window funnels the whole table through ONE task — the
  * canonical scale-killer, same failure mode SequencePacking avoids
  * for running sums).
  *
  * Two-phase prefix-sum discipline (SequencePacking.pack's, lifted to
  * arbitrary multi-column orders):
  *
  *   1. range-repartition by the sort columns — ranges are contiguous
  *      and ordered across partition ids — and materialize ONCE so the
  *      counting pass and the ranking pass see identical boundaries
  *      (range sampling is re-run per action otherwise);
  *   2. count rows per partition (numPartitions rows → driver cumsum,
  *      bounded model state) and broadcast the exclusive prefix as a
  *      map literal;
  *   3. per-partition row_number (parallel, no cross-partition motion)
  *      plus the partition's base offset.
  *
  * The caller must pass a TOTAL order (include a unique tiebreak column
  * last) — equal sort keys on a range boundary would otherwise make the
  * rank depend on partition placement.
  */
object GlobalRank {

  /** Adds `rankName` = global 1-based row number of the total order
    * given by `sortCols`. */
  def withRank(df: DataFrame, rankName: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy(col("__pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val baseOf = typedlit(counts.map(_._1).zip(
      counts.scanLeft(0L) { case (acc, (_, c)) => acc + c }).toMap)
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    ranged
      .withColumn(rankName,
        row_number().over(w).cast("long") + element_at(baseOf, col("__pid")))
      .drop("__pid")
  }
}
