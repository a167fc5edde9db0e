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
