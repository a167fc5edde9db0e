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
  * Two-phase prefix-sum discipline, shared with [[SequencePacking]]
  * via [[withBaseOffsets]]:
  *
  *   1. range-repartition by the sort columns — ranges are contiguous
  *      and ordered across partition ids — and materialize ONCE so the
  *      counting pass and the ranking pass see identical boundaries
  *      (range sampling is re-run per action otherwise);
  *   2. aggregate a per-partition weight total (numPartitions rows →
  *      driver cumsum, bounded model state) and broadcast the
  *      exclusive prefix as a map literal;
  *   3. per-partition window (parallel, no cross-partition motion)
  *      plus the partition's base offset.
  *
  * The caller must pass a TOTAL order (include a unique tiebreak column
  * last) — equal sort keys on a range boundary would otherwise make the
  * rank depend on partition placement.
  */
object GlobalRank {

  /** The shared two-phase machinery: range-repartition `df` by
    * `sortCols` (materialized once), compute per-partition totals of
    * `weight`, and return the rows with `__pid` (their partition id)
    * and `__base` (the exclusive prefix sum of earlier partitions'
    * totals — a broadcast map literal). Partitions emptied by range
    * sampling simply contribute 0 to later prefixes. Callers drop
    * both columns when done.
    *
    * RETENTION: the output lazily depends on an eager localCheckpoint
    * (the two passes must see identical range boundaries), so its
    * blocks stay persisted until the returned release() is called or
    * the ContextCleaner eventually notices — they can NOT be freed
    * before the caller has materialized everything derived from the
    * frame. Long-lived sessions issuing many ranks should call
    * release() after their terminal action ([[withRankTracked]]);
    * one-shot jobs can ignore it. */
  private[operators] def withBaseOffsets(df: DataFrame, weight: Column,
      numPartitions: Int, sortCols: Seq[Column]): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val (ranged, release) = Checkpoints.tracked(
      df.repartitionByRange(n, sortCols: _*)
        .withColumn("__pid", spark_partition_id()))
    val totals = ranged.groupBy(col("__pid"))
      .agg(sum(weight).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val baseOf = typedlit(totals.map(_._1).zip(
      totals.scanLeft(0L) { case (acc, (_, t)) => acc + t }).toMap)
    (ranged.withColumn("__base", element_at(baseOf, col("__pid"))), release)
  }

  /** Adds `rankName` = global 1-based row number of the total order
    * given by `sortCols`. The result retains its internal checkpoint's
    * blocks until driver GC — see [[withRankTracked]] for long-lived
    * sessions that need deterministic release. */
  def withRank(df: DataFrame, rankName: String, sortCols: Column*): DataFrame =
    withRank(df, rankName, 0, sortCols: _*)

  /** As above with an explicit partition count (0 = the session's
    * shuffle parallelism). */
  def withRank(df: DataFrame, rankName: String, numPartitions: Int,
      sortCols: Column*): DataFrame =
    withRankTracked(df, rankName, numPartitions, sortCols: _*)._1

  /** [[withRank]] plus a release() handle that unpersists the internal
    * range-partitioned checkpoint. Call it only AFTER materializing
    * every action derived from the returned frame (write, collect) —
    * the rank output recomputes from the checkpoint, not the input. */
  def withRankTracked(df: DataFrame, rankName: String, numPartitions: Int,
      sortCols: Column*): (DataFrame, () => Unit) = {
    val (based, release) =
      withBaseOffsets(df, lit(1L), numPartitions, sortCols)
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val out = based
      .withColumn(rankName,
        row_number().over(w).cast("long") + col("__base"))
      .drop("__pid", "__base")
    (out, release)
  }
}
