package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, StreamingQuery}

/** CURRENT_WATERMARK() surface — reference: FlinkSqlOperatorTable's
  * CURRENT_WATERMARK function (returns the operator's current event-time
  * watermark). Spark exposes the watermark through two channels, both
  * wrapped here: the query progress (driver-side observability) and
  * GroupState.getCurrentWatermarkMs inside stateful operators (in-query
  * per-row annotation). */
object Watermarks {

  /** The running query's current global watermark in epoch millis, from
    * StreamingQueryProgress (None before the first progress event or for
    * queries without event-time). */
  def currentWatermarkMs(q: StreamingQuery): Option[Long] =
    Option(q.lastProgress)
      .flatMap(p => Option(p.eventTime.get("watermark")))
      .map(ts => java.time.Instant.parse(ts).toEpochMilli)

  /** Idle-source watermark policy — reference:
    * WatermarkStrategy.withIdleness (flink-core/.../eventtime/
    * WatermarkStrategy.java) and WatermarksWithIdleness.java: a source
    * that stops emitting is marked idle so it no longer holds back the
    * combined watermark of a multi-input operator.
    *
    * Spark computes one global watermark across all sources of a query;
    * by default it is the MINIMUM over per-source watermarks, so one
    * idle source stalls every window — precisely the problem withIdleness
    * solves. Spark's engine-level switch is the session conf
    * `spark.sql.streaming.multipleWatermarkPolicy=max`: the combined
    * watermark follows the fastest source, so idle inputs are ignored —
    * the same effect as marking them idle. (Per-source idleness timeouts
    * are a finer grain than Spark exposes; with micro-batch unions the
    * max policy is the faithful equivalent, documented here rather than
    * simulated with synthetic keep-alive rows.) */
  def advanceWatermarkPastIdleSources(
      spark: org.apache.spark.sql.SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "max")

  /** Watermark ALIGNMENT (reference: FLIP-182,
    * WatermarkStrategy.withWatermarkAlignment /
    * WatermarkAlignmentParams.java): bound how far any source may run
    * ahead of the group watermark. The reference THROTTLES the fast
    * source's reads; Spark's micro-batch model has no in-flight
    * bounding, so this operator delivers the alignment guarantee the
    * only honest way available: rows whose event time exceeds
    * `currentWatermark + maxDriftMs` are HELD in keyed state and
    * released once the group watermark catches up (an event-time
    * timeout wakes the key even if its source goes quiet). Apply it to
    * the UNION of per-source watermarked streams keyed by a source tag
    * — the group watermark is Spark's MIN over the member watermarks,
    * exactly the reference's combined watermark.
    *
    * Documented delta vs the reference: alignment-by-buffering bounds
    * what DOWNSTREAM sees (windows, joins and aggregates never observe
    * a drift beyond the bound) but the buffered rows live in the
    * aligner's state, whereas source throttling keeps them unread —
    * state here grows with the fast source's excess rate × drift
    * window. Until the first watermark is computed (Spark initializes
    * it to 0) everything buffers for one micro-batch — the same
    * cold-start stall FLIP-182 alignment imposes on unaligned starts.
    *
    * Composing with downstream stateful operators: the aligner emits in
    * APPEND mode (the only mode Spark permits upstream of aggregations).
    * Do NOT re-`withWatermark` after it — Spark's global watermark is
    * the MIN over every watermark node in the query, a post-aligner
    * node sees no rows until the aligner releases, so its watermark
    * pins the global MIN at 0 and the aligner deadlocks (holds
    * forever). Run downstream aggregations in UPDATE mode off the
    * upstream (pre-aligner) watermarks; Spark's chained-stateful
    * correctness checker flags the pattern (released rows can sit
    * below a jumped watermark — the buffering-vs-throttling delta), so
    * composing requires
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=
    * false`, as AlignedBufferSpec demonstrates. */
  def alignedBuffer[K, T](ds: Dataset[T], keyFn: T => K, tsFn: T => Long,
      maxDriftMs: Long)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T],
      seqEnc: Encoder[Seq[T]]): Dataset[T] = {
    require(maxDriftMs > 0, "maxDriftMs must be positive")
    // Append mode: the only flatMapGroupsWithState mode Spark allows
    // UPSTREAM of aggregations — which is where an aligner lives
    // (Update mode here would AnalysisException any downstream
    // window/agg and defeat the operator's purpose)
    ds.groupByKey(keyFn).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (_: K, rows: Iterator[T],
          state: org.apache.spark.sql.streaming.GroupState[Seq[T]]) =>
        val wm = state.getCurrentWatermarkMs()
        val limit = wm + maxDriftMs
        val all = state.getOption.getOrElse(Seq.empty) ++ rows
        val (release, hold) = all.partition(t => tsFn(t) <= limit)
        if (hold.isEmpty) {
          if (state.exists) state.remove()
        } else {
          state.update(hold)
          // wake when the watermark reaches minHeld - drift (strictly
          // ahead of the current watermark by the hold invariant)
          state.setTimeoutTimestamp(
            math.max(hold.map(tsFn).min - maxDriftMs, wm + 1))
        }
        release.iterator
    }
  }

  /** Annotate each row with the watermark the stateful operator observed
    * when processing it — the in-query CURRENT_WATERMARK() analogue
    * (e.g. to measure lateness or route near-late rows). Keyed so state
    * machinery engages; emits (row, watermarkMs) in update mode. */
  def withCurrentWatermark[K, T](ds: Dataset[T], keyFn: T => K)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T],
      outEnc: Encoder[(T, Long)]): Dataset[(T, Long)] = {
    implicit val stEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[T],
            state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val wm = state.getCurrentWatermarkMs()
          state.update(wm)
          rows.map(r => (r, wm))
      }
  }
}
