package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUMULATE in APPEND mode — reference: the cumulative slice
  * assigner (SliceAssigners.java cumulative) + WindowAggOperator.java:95,
  * which fire each growing slice when the watermark passes its end.
  *
  * Spark's built-in aggregation can't append-fire on the DERIVED
  * window_end column (it isn't the watermarked attribute), which is why
  * the batch TVF form emits in update mode when streamed. This operator
  * closes that delta with keyed state: events land in per-STEP buckets
  * (state is O(maxMs/stepMs) per active window, the slice-sharing idea
  * of the reference's assigner — each event is stored once, not once per
  * slice), and an event-time timeout fires every slice whose end the
  * watermark has passed, emitting the cumulative (count, sum) prefix —
  * exactly once per (key, window_start, window_end), in append mode.
  */
object CumulateOps {

  /** Emits (key, windowStartMs, windowEndMs, cnt, sum) once the
    * watermark passes windowEnd. `maxMs` must be a multiple of
    * `stepMs`. Input must be watermarked; tsFn in epoch millis. */
  def cumulateAppendSum[K, T](ds: Dataset[T], keyFn: T => K, tsFn: T => Long,
      valFn: T => Double, stepMs: Long, maxMs: Long)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T],
      outEnc: Encoder[(K, Long, Long, Long, Double)])
      : Dataset[(K, Long, Long, Long, Double)] = {
    require(maxMs % stepMs == 0, "maxSize must be a multiple of step")
    // state: windowStart -> (lastEmittedEnd, bucketIdx -> (cnt, sum))
    implicit val stEnc: Encoder[Map[Long, (Long, Map[Long, (Long, Double)])]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Map[Long, (Long, Map[Long, (Long, Double)])]]()
    type WinState = Map[Long, (Long, Map[Long, (Long, Double)])]

    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: K, rows: Iterator[T], state: GroupState[WinState]) =>
          var wins: WinState = state.getOption.getOrElse(Map.empty)
          val wm = state.getCurrentWatermarkMs()

          rows.foreach { t =>
            val ts = tsFn(t)
            val winStart = math.floorDiv(ts, maxMs) * maxMs
            val bucket = math.floorDiv(ts - winStart, stepMs)
            val (lastEnd, buckets) =
              wins.getOrElse(winStart, (winStart, Map.empty[Long, (Long, Double)]))
            // a row older than the last fired slice is late beyond the
            // watermark contract; fold it into the next slice's bucket
            val (c0, s0) = buckets.getOrElse(bucket, (0L, 0.0))
            wins += winStart ->
              (lastEnd, buckets + (bucket -> (c0 + 1, s0 + valFn(t))))
          }

          // fire every mature slice: window_end <= watermark
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(K, Long, Long, Long, Double)]
          wins = wins.flatMap { case (winStart, (lastEnd, buckets)) =>
            var end = lastEnd + stepMs
            var fired = lastEnd
            while (end <= winStart + maxMs && end <= wm) {
              // cumulative prefix over buckets strictly below `end`
              val nb = (end - winStart) / stepMs
              val (cnt, sum) = buckets.filter(_._1 < nb).values
                .foldLeft((0L, 0.0)) { case ((c, s), (c2, s2)) => (c + c2, s + s2) }
              if (cnt > 0) out += ((key, winStart, end, cnt, sum))
              fired = end
              end += stepMs
            }
            if (fired >= winStart + maxMs) None // window complete
            else Some(winStart -> (fired, buckets))
          }

          if (wins.isEmpty) state.remove()
          else {
            state.update(wins)
            // wake at the earliest unfired slice end
            val nextFire = wins.valuesIterator.map(_._1 + stepMs).min
            state.setTimeoutTimestamp(nextFire + 1)
          }
          out.iterator
      }
  }
}
