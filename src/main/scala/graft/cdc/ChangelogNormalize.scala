package graft.cdc

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Upsert-source normalization — reference: ChangelogNormalize
  * (flink-table-planner/.../nodes/exec/stream/
  * StreamExecChangelogNormalize.java:77): turns an upsert stream (latest
  * row per primary key, tombstones for deletes) into a complete
  * changelog with correct -U/+U transitions by materializing the last
  * image per key in state.
  */
object ChangelogNormalize {

  /** @param isTombstone marks deletion rows
    * @return (__row_kind, row) pairs: +I first image, (-U old, +U new)
    *         on change, -D on tombstone. O(1) state per key. */
  def normalize[K, T](ds: Dataset[T], keyFn: T => K, isTombstone: T => Boolean)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T],
      outEnc: Encoder[(String, T)]): Dataset[(String, T)] = {
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[T]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, T)]
          rows.foreach { r =>
            val prev = state.getOption
            if (isTombstone(r)) {
              prev.foreach(p => out += (("-D", p)))
              state.remove()
            } else {
              prev match {
                case None => out += (("+I", r))
                case Some(p) if p != r =>
                  out += (("-U", p)); out += (("+U", r))
                case _ => // unchanged image: no emission
              }
              state.update(r)
            }
          }
          out.iterator
      }
  }
}
