package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style sequence packing for pretraining: concatenate the corpus in
  * a stable order and chunk it into fixed-length context windows. Each
  * document needs its global token offset; from it follow the sequence
  * ids the document spans and its position inside its first sequence.
  *
  * The semantics are a GLOBAL running sum — the naive formulation,
  * `sum(tokens).over(Window.orderBy(id))`, collapses the whole corpus
  * into ONE partition (Spark warns exactly this) and is the canonical
  * 100 TB scale-killer. This operator computes the same result as a
  * distributed two-phase prefix sum:
  *
  *   1. range-repartition by the order key (ranges are contiguous and
  *      sorted across partition ids) and materialize ONCE;
  *   2. aggregate per-partition token totals — a few hundred rows —
  *      and turn them into per-partition base offsets on the driver;
  *   3. per-partition window cumsum (parallel, no cross-partition data
  *      motion) plus the broadcast base offset.
  *
  * Equality with the sequential definition is oracle-checked against
  * DuckDB's global window cumsum (q_seq_pack) and property-checked
  * against a 1-partition run (SequencePackingSpec).
  */
object SequencePacking {

  /** Adds `tok_offset` (global running sum of `tokCol` before this row,
    * ordered by `idCol`), `seq_first`/`seq_last` (ids of the context
    * windows this document spans) and `pos_in_seq` (offset within
    * seq_first). `idCol` must be globally unique.
    */
  def pack(df: DataFrame, idCol: String, tokCol: String, ctxLen: Long,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    // Materialize the range partitioning once: the totals pass and the
    // final pass must see the SAME partition boundaries (range sampling
    // is re-run per action otherwise), and the shuffle shouldn't execute
    // twice either.
    val ranged = df.repartitionByRange(n, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // Phase 1: per-partition totals — n rows, driver-side cumsum.
    val totals = ranged.groupBy(col("__pid"))
      .agg(sum(col(tokCol)).as("__t"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    // base of partition i = sum of totals of partitions before i
    // (exclusive prefix of the sorted totals), shipped as a map literal.
    val baseOf = typedlit(totals.map(_._1).zip(
      totals.scanLeft(0L) { case (acc, (_, t)) => acc + t }).toMap)
    // Phase 2: parallel per-partition cumsum + broadcast base.
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("tok_offset",
        coalesce(sum(col(tokCol)).over(w), lit(0L)) +
          element_at(baseOf, col("__pid")))
      .withColumn("seq_first", floor(col("tok_offset") / ctxLen))
      .withColumn("seq_last",
        floor((col("tok_offset") + col(tokCol) - 1) / ctxLen))
      .withColumn("pos_in_seq", col("tok_offset") % ctxLen)
      .drop("__pid")
  }
}
