package graft.operators

import org.apache.spark.sql.DataFrame

/** Deterministic release for iterative localCheckpoints.
  *
  * `Dataset.localCheckpoint(eager)` persists the materialized blocks
  * but exposes no unpersist handle; a Pregel-style loop therefore
  * accumulates one checkpointed copy of its working set PER ROUND
  * until the ContextCleaner notices the unreferenced RDDs at some
  * future driver GC — nondeterministic, and in practice far too late:
  * the round-6 100× k-core measurement spent 352s vs 216s thrashing R
  * rounds of retained edge-list blocks. Iterative operators instead
  * take a tracked checkpoint and release round t−1 deterministically
  * once round t has materialized.
  *
  * The handle is the checkpointed frame's OWN backing RDD (the
  * LogicalRDD leaf the checkpoint plan consists of, via the
  * graftbridge) — exact even under concurrent checkpointing elsewhere
  * on the SparkContext (e.g. gateway statements), unlike a
  * getPersistentRDDs before/after diff which would capture and later
  * destroy a concurrent computation's unrecomputable blocks.
  */
private[graft] object Checkpoints {

  /** Eager localCheckpoint plus a release() handle that unpersists
    * exactly this checkpoint's blocks. release() must only be called
    * once nothing will read the frame again (the next iterate is
    * itself checkpointed — not merely derived). */
  def tracked(df: DataFrame): (DataFrame, () => Unit) = {
    val out = df.localCheckpoint(true)
    val rdd = org.apache.spark.sql.graftbridge.ColumnBridge.backingRdd(out)
    (out, () => rdd.foreach(_.unpersist(blocking = false)))
  }

  /** [[tracked]] that ALSO returns the row count, in ONE action: the
    * checkpoint is taken lazily and the count job is what materializes
    * (and persists) it. Convergence-checked loops (k-core's per-round
    * live-edge count) previously paid two jobs per round — eager
    * checkpoint materialization, then a separate count over the fresh
    * blocks; at 100 TB that second pass re-reads the whole round's
    * working set. */
  def trackedCounted(df: DataFrame): (DataFrame, Long, () => Unit) = {
    val out = df.localCheckpoint(false)
    val rdd = org.apache.spark.sql.graftbridge.ColumnBridge.backingRdd(out)
    val n = out.count() // first action over the marked RDD: computes,
                        // persists the blocks, and counts in one pass
    (out, n, () => rdd.foreach(_.unpersist(blocking = false)))
  }
}
