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
    // Phase 1 (shared machinery, GlobalRank.withBaseOffsets): range
    // partitioning materialized ONCE + per-partition token totals →
    // broadcast exclusive-prefix base offsets.
    val (based, _) = GlobalRank.withBaseOffsets(df, col(tokCol),
      numPartitions, Seq(col(idCol)))
    // Phase 2: parallel per-partition cumsum + broadcast base.
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    based
      .withColumn("tok_offset",
        coalesce(sum(col(tokCol)).over(w), lit(0L)) + col("__base"))
      .withColumn("seq_first", floor(col("tok_offset") / ctxLen))
      .withColumn("seq_last",
        floor((col("tok_offset") + col(tokCol) - 1) / ctxLen))
      .withColumn("pos_in_seq", col("tok_offset") % ctxLen)
      .drop("__pid", "__base")
  }
}
