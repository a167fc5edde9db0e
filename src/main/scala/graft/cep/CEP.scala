package graft.cep

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP execution — reference: CepOperator.java:82 (keyed NFA over
  * event-time-ordered input) and MATCH_RECOGNIZE
  * (StreamExecMatch.java:51).
  *
  * Batch: groupByKey + flatMapGroups, sort each key's events by time,
  * run the matcher — exact semantics, greediness fully resolved.
  *
  * Streaming: flatMapGroupsWithState buffers events per key; a match
  * anchored at time t0 is finalized (emitted or discarded) once the
  * watermark passes t0 + within — at that point every event that could
  * participate is present, so the decision is exact. Event-time timeouts
  * stand in for Flink's timer service: a key with no new input still
  * finalizes pending matches when the watermark advances. A pattern
  * whose last step is unbounded-greedy never closes without `within` —
  * same as Flink — so streaming requires it.
  */
object CEP {

  /** Batch CEP over a keyed dataset. Emits (key, matchIdx, bindings)
    * where bindings maps step name -> matched events. `tieFn` breaks
    * ordering ties among equal timestamps deterministically (e.g. an
    * event id); `tsFn` units also define the `within` units. */
  def matchPattern[K, T](ds: Dataset[T], keyFn: T => K, tsFn: T => Long,
      pattern: Pattern[T], tieFn: T => Long = (_: T) => 0L)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T],
      outEnc: Encoder[(K, Long, Map[String, Seq[T]])]): Dataset[(K, Long, Map[String, Seq[T]])] = {
    ds.groupByKey(keyFn).flatMapGroups { (key: K, rows: Iterator[T]) =>
      val sorted = rows.toIndexedSeq.sortBy(e => (tsFn(e), tieFn(e)))
      Matcher.findMatches(sorted, tsFn, pattern).iterator.zipWithIndex
        .map { case (m, i) => (key, i.toLong, m) }
    }
  }

  /** Streaming CEP (requires `pattern.within` and a watermarked input).
    * Emits (key, matchIdx, bindings) in append mode. */
  def matchPatternStream[K, T](ds: Dataset[T], keyFn: T => K, tsFn: T => Long,
      pattern: Pattern[T])(
      implicit kEnc: Encoder[K], tEnc: Encoder[T], seqEnc: Encoder[Seq[T]],
      outEnc: Encoder[(K, Long, Map[String, Seq[T]])]): Dataset[(K, Long, Map[String, Seq[T]])] = {
    require(pattern.withinMs != Long.MaxValue,
      "streaming CEP requires pattern.within(...)")
    implicit val stateEnc: Encoder[(Seq[T], Long)] =
      Encoders.tuple(seqEnc, Encoders.scalaLong)
    val withinMs = pattern.withinMs

    ds.groupByKey(keyFn).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: K, rows: Iterator[T], state: GroupState[(Seq[T], Long)]) =>
        val (buffered, emittedSoFar) =
          state.getOption.getOrElse((Seq.empty[T], 0L))
        val all = (buffered ++ rows).sortBy(tsFn).toIndexedSeq
        val wm = state.getCurrentWatermarkMs()

        val out = scala.collection.mutable.ArrayBuffer
          .empty[(K, Long, Map[String, Seq[T]])]
        var emitted = emittedSoFar
        var i = 0
        // a start at index i is decidable iff its whole window is mature
        while (i < all.length && tsFn(all(i)) + withinMs <= wm) {
          Matcher.tryFrom(all, i, tsFn, pattern) match {
            case Some((endExclusive, bindings)) =>
              out += ((key, emitted, bindings))
              emitted += 1
              i = math.max(endExclusive, i + 1)
            case None => i += 1
          }
        }
        val remaining = all.drop(i)
        if (remaining.isEmpty && out.isEmpty && buffered.isEmpty) {
          state.remove()
        } else {
          state.update((remaining, emitted))
          // wake up when the earliest pending start becomes decidable
          if (remaining.nonEmpty)
            state.setTimeoutTimestamp(tsFn(remaining.head) + withinMs + 1)
        }
        out.iterator
    }
  }
}
