package graft.operators

import org.apache.spark.sql.DataFrame

/** Deterministic release for iterative localCheckpoints.
  *
  * `Dataset.localCheckpoint(eager)` persists the materialized blocks
  * but exposes no unpersist handle; a Pregel-style loop therefore
  * accumulates one checkpointed copy of its working set PER ROUND
  * until the ContextCleaner notices the unreferenced RDDs at some
  * future driver GC — nondeterministic, and in practice far too late:
  * the round-6 100× k-core measurement spent most of its 352s
  * thrashing R rounds of retained edge-list blocks. Iterative
  * operators instead take a tracked checkpoint and release round t−1
  * deterministically once round t has materialized.
  *
  * The id-diff capture assumes no CONCURRENT checkpointing in other
  * threads of the same session (true for the single-threaded operator
  * loops using this).
  */
private[graft] object Checkpoints {

  /** Eager localCheckpoint plus a release() handle that unpersists
    * exactly the blocks this checkpoint materialized. release() must
    * only be called once nothing will read the frame again (the next
    * iterate is itself checkpointed — not merely derived). */
  def tracked(df: DataFrame): (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint(true)
    val added = (sc.getPersistentRDDs.keySet -- before).toSeq
    (out, () => added.foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    })
  }
}
