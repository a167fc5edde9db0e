package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Flink-style window firing machinery — triggers, evictors, allowed
  * lateness and late-data side output — over `flatMapGroupsWithState`.
  *
  * Reference: Trigger.java / EventTimeTrigger / CountTrigger /
  * ContinuousEventTimeTrigger (flink-streaming-java/.../windowing/
  * triggers/), CountEvictor / TimeEvictor (.../windowing/evictors/),
  * WindowOperator.java (allowed lateness + side output of dropped-late
  * elements, flink-streaming-java/.../runtime/operators/windowing/
  * WindowOperator.java:383).
  *
  * Spark-first split: the BUILT-IN window aggregations (window(),
  * session_window, the TVFs in WindowTvfQueries) remain the scale path —
  * incremental, codegen'd, no row buffers. This operator exists for the
  * semantics the built-ins cannot express: early firing on count,
  * continuous event-time re-firing, evictors, and per-element late
  * re-firing within an allowed-lateness horizon. Those semantics
  * inherently require the window's element buffer (Flink buffers
  * exactly the same way whenever an evictor or non-incremental firing
  * is configured), so state is O(elements in open windows) per key —
  * bounded by watermark-driven cleanup at `end + allowedLateness`,
  * identical to the reference's cleanup timer.
  *
  * Firing labels mirror the reference's window-emission causes:
  *  - "early"       trigger fired before the watermark reached the end
  *  - "onTime"      event-time fire at window end
  *  - "late"        re-fire caused by allowed-lateness arrivals
  *  - "droppedLate" element beyond end+allowedLateness — the side
  *                  output; filter on it for the Flink
  *                  sideOutputLateData stream
  *
  * Streaming-only event-time semantics: in batch mode the watermark is
  * 0, so only count triggers fire (matching the reference, where a
  * bounded job with count triggers fires on count and discards open
  * windows at end of input).
  */
object WindowMachinery {

  sealed trait Trigger extends Serializable
  object Trigger {
    /** Fire once when the watermark passes the window end (the default
      * EventTimeTrigger), then once per micro-batch containing allowed
      * late arrivals. */
    case object EventTime extends Trigger
    /** Fire every `n` elements (CountTrigger); never fires on event
      * time. `purge` clears the buffer on fire (PurgingTrigger). */
    final case class Count(n: Int, purge: Boolean = false) extends Trigger
    /** Fire each time the watermark passes another `intervalMs` within
      * the window, and finally at the window end. */
    final case class ContinuousEventTime(intervalMs: Long) extends Trigger
  }

  sealed trait Evictor extends Serializable
  object Evictor {
    /** Keep only the last `keep` elements at fire time (CountEvictor);
      * evicted elements are removed from state, as in the reference's
      * evictBefore. */
    final case class Count(keep: Int) extends Evictor
    /** Keep only elements within `keepMs` of the newest buffered
      * element's timestamp (TimeEvictor). */
    final case class Time(keepMs: Long) extends Evictor
  }

  /** (key, windowStart, windowEnd, firing, elements) */
  type Fire[K, T] = (K, Long, Long, String, Seq[T])

  /** Tumbling event-time window with configurable trigger/evictor/
    * allowed lateness. State entry per open window:
    * (start, buffer, firedOnTime, aux) where aux is the count-to-fire
    * (count trigger) or next continuous fire time.
    *
    * `watermarkLagMs` reconciles Spark's and Flink's late-data models.
    * Spark DROPS rows older than the watermark before any stateful
    * operator sees them, so with `withWatermark(ts, oooD)` an
    * allowed-late element can never arrive. The composition that
    * restores Flink's semantics: declare
    * `withWatermark(ts, oooD + sizeMs + allowedLatenessMs)` on the
    * input and pass `watermarkLagMs = sizeMs + allowedLatenessMs`
    * here. The operator adds the lag back, so windows still FIRE at
    * the true watermark `maxEventTime - oooD` (no added latency), while
    * the engine's filter is pushed out far enough that in-lateness
    * elements reach the operator (re-fires) and just-beyond-horizon
    * elements surface in the "droppedLate" side output instead of
    * vanishing. With the default 0 the operator behaves like a plain
    * Spark window: anything older than the watermark is engine-dropped. */
  def tumbling[K, T](ds: Dataset[T], keyFn: T => K, tsFn: T => Long,
      sizeMs: Long, trigger: Trigger = Trigger.EventTime,
      evictor: Option[Evictor] = None, allowedLatenessMs: Long = 0L,
      watermarkLagMs: Long = 0L)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T],
      stateEnc: Encoder[Seq[(Long, Seq[T], Boolean, Long)]],
      outEnc: Encoder[(K, Long, Long, String, Seq[T])]): Dataset[Fire[K, T]] = {

    def evict(buf: Seq[T]): Seq[T] = evictor match {
      case Some(Evictor.Count(keep)) => buf.takeRight(keep)
      case Some(Evictor.Time(keepMs)) if buf.nonEmpty =>
        val mx = buf.map(tsFn).max
        buf.filter(t => tsFn(t) >= mx - keepMs)
      case _ => buf
    }

    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: K, rows: Iterator[T],
            state: GroupState[Seq[(Long, Seq[T], Boolean, Long)]]) =>
          // the true (Flink) firing watermark: Spark's engine watermark
          // is held back by watermarkLagMs to keep late rows flowing
          val wm = state.getCurrentWatermarkMs() + watermarkLagMs
          val wins = scala.collection.mutable.LinkedHashMap.empty[
            Long, (Seq[T], Boolean, Long)]
          state.getOption.getOrElse(Seq.empty).foreach { case (s, b, f, a) =>
            wins(s) = (b, f, a)
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[Fire[K, T]]
          // windows that received allowed-late elements this invocation
          val lateTouched = scala.collection.mutable.Set.empty[Long]

          rows.foreach { r =>
            val ts = tsFn(r)
            val ws = math.floorDiv(ts, sizeMs) * sizeMs
            val we = ws + sizeMs
            if (we + allowedLatenessMs <= wm) {
              // beyond the lateness horizon: side output, never state
              out += ((key, ws, we, "droppedLate", Seq(r)))
            } else {
              val (buf0, fired0, aux0) = wins.getOrElse(ws,
                (Seq.empty[T], false,
                  trigger match {
                    case Trigger.ContinuousEventTime(i) => ws + i
                    case _ => 0L
                  }))
              var buf = buf0 :+ r
              var aux = aux0
              trigger match {
                case Trigger.Count(n, purge) =>
                  aux += 1
                  if (aux >= n) {
                    buf = evict(buf)
                    out += ((key, ws, we, "early", buf))
                    if (purge) buf = Seq.empty
                    aux = 0
                  }
                case _ => ()
              }
              if (fired0 && we <= wm) lateTouched += ws
              wins(ws) = (buf, fired0, aux)
            }
          }

          // event-time driven fires (data-triggered or timeout-triggered)
          trigger match {
            case Trigger.EventTime =>
              wins.foreach { case (ws, (buf0, fired, _)) =>
                val we = ws + sizeMs
                if (!fired && we <= wm) {
                  val buf = evict(buf0)
                  out += ((key, ws, we, "onTime", buf))
                  wins(ws) = (buf, true, 0L)
                } else if (fired && lateTouched(ws)) {
                  val buf = evict(buf0)
                  out += ((key, ws, we, "late", buf))
                  wins(ws) = (buf, fired, 0L)
                }
              }
            case Trigger.ContinuousEventTime(interval) =>
              wins.foreach { case (ws, (buf0, fired, aux0)) =>
                val we = ws + sizeMs
                var buf = buf0
                var aux = aux0
                while (aux <= math.min(wm, we - 1)) { // periodic early fires
                  buf = evict(buf)
                  out += ((key, ws, we, "early", buf))
                  aux += interval
                }
                var f = fired
                if (!f && we <= wm) {
                  buf = evict(buf)
                  out += ((key, ws, we, "onTime", buf))
                  f = true
                } else if (f && lateTouched(ws)) {
                  buf = evict(buf)
                  out += ((key, ws, we, "late", buf))
                }
                wins(ws) = (buf, f, aux)
              }
            case Trigger.Count(_, _) => () // count-only: no event-time fire
          }

          // cleanup past the lateness horizon (the reference's cleanup
          // timer at window.maxTimestamp + allowedLateness)
          val live = wins.filter { case (ws, _) =>
            ws + sizeMs + allowedLatenessMs > wm
          }

          if (live.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(live.map { case (s, (b, f, a)) => (s, b, f, a) }.toSeq)
            // wake up at the earliest event-time boundary still ahead:
            // unfired window ends, continuous-fire points, cleanup times
            val nexts = live.flatMap { case (ws, (_, fired, aux)) =>
              val we = ws + sizeMs
              val ends = trigger match {
                case Trigger.Count(_, _) => Seq(we + allowedLatenessMs)
                case Trigger.ContinuousEventTime(_) =>
                  (if (fired) Seq.empty else Seq(aux, we)) :+
                    (we + allowedLatenessMs)
                case Trigger.EventTime =>
                  (if (fired) Seq.empty else Seq(we)) :+
                    (we + allowedLatenessMs)
              }
              ends
            }
            // timeouts run on the engine-watermark timeline: shift the
            // firing-time target back by the lag
            state.setTimeoutTimestamp(
              math.max(wm - watermarkLagMs + 1, nexts.min - watermarkLagMs))
          }
          out.iterator
      }
  }

  /** (key, windowStart, windowEnd, firing, accumulator) */
  type AggFire[K, A] = (K, Long, Long, String, A)

  /** Tumbling variant of [[slidingAgg]] (slide == size). */
  def tumblingAgg[K, T, A](ds: Dataset[T], keyFn: T => K, tsFn: T => Long,
      sizeMs: Long, zero: A, add: (A, T) => A,
      trigger: Trigger = Trigger.EventTime, allowedLatenessMs: Long = 0L,
      watermarkLagMs: Long = 0L)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T],
      stateEnc: Encoder[Seq[(Long, A, Boolean, Long)]],
      outEnc: Encoder[(K, Long, Long, String, A)]): Dataset[AggFire[K, A]] =
    slidingAgg(ds, keyFn, tsFn, sizeMs, sizeMs, zero, add, trigger,
      allowedLatenessMs, watermarkLagMs)

  /** The SCALE PATH for triggers/lateness on tumble and hop windows —
    * the reference's incremental-accumulator window operator
    * (AggregateWindowOperator: WindowOperator.java specialized to an
    * internal AggregatingState instead of ListState). [[tumbling]]
    * buffers whole panes because evictors and arbitrary user functions
    * need the elements; when the window function is an incremental
    * aggregate (the overwhelmingly common case), state per open
    * (key, window) is ONE accumulator of constant size — a wide pane
    * costs the same bytes as an empty one. Same firing surface as
    * [[tumbling]]: count/continuous "early" fires, "onTime" at the
    * watermark, "late" re-fires within the allowed-lateness horizon
    * (the accumulator keeps absorbing late elements — the reference's
    * fire-by-accumulator re-emission), "droppedLate" side output (the
    * dropped element aggregated alone), cleanup at end+lateness.
    * Evictors are deliberately ABSENT: evict-at-fire needs the element
    * buffer by definition — that semantics stays on [[tumbling]].
    *
    * Hop windows: each element lands in every window whose
    * `start ≡ 0 (mod slideMs)` and `start <= ts < start+sizeMs` —
    * the accumulator replaces the reference's per-pane ListState
    * slices. `watermarkLagMs` composes exactly as on [[tumbling]]. */
  def slidingAgg[K, T, A](ds: Dataset[T], keyFn: T => K, tsFn: T => Long,
      sizeMs: Long, slideMs: Long, zero: A, add: (A, T) => A,
      trigger: Trigger = Trigger.EventTime, allowedLatenessMs: Long = 0L,
      watermarkLagMs: Long = 0L)(
      implicit kEnc: Encoder[K], tEnc: Encoder[T],
      stateEnc: Encoder[Seq[(Long, A, Boolean, Long)]],
      outEnc: Encoder[(K, Long, Long, String, A)]): Dataset[AggFire[K, A]] = {
    require(sizeMs > 0 && slideMs > 0 && slideMs <= sizeMs,
      s"need 0 < slideMs <= sizeMs, got size=$sizeMs slide=$slideMs")

    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: K, rows: Iterator[T],
            state: GroupState[Seq[(Long, A, Boolean, Long)]]) =>
          val wm = state.getCurrentWatermarkMs() + watermarkLagMs
          val wins = scala.collection.mutable.LinkedHashMap.empty[
            Long, (A, Boolean, Long)]
          state.getOption.getOrElse(Seq.empty).foreach { case (s, a, f, x) =>
            wins(s) = (a, f, x)
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[AggFire[K, A]]
          val lateTouched = scala.collection.mutable.Set.empty[Long]

          rows.foreach { r =>
            val ts = tsFn(r)
            // all hop windows containing ts, newest start first
            var ws = math.floorDiv(ts, slideMs) * slideMs
            while (ws + sizeMs > ts) {
              val we = ws + sizeMs
              if (we + allowedLatenessMs <= wm) {
                out += ((key, ws, we, "droppedLate", add(zero, r)))
              } else {
                val (acc0, fired0, aux0) = wins.getOrElse(ws,
                  (zero, false,
                    trigger match {
                      case Trigger.ContinuousEventTime(i) => ws + i
                      case _ => 0L
                    }))
                var acc = add(acc0, r)
                var aux = aux0
                trigger match {
                  case Trigger.Count(n, purge) =>
                    aux += 1
                    if (aux >= n) {
                      out += ((key, ws, we, "early", acc))
                      if (purge) acc = zero
                      aux = 0
                    }
                  case _ => ()
                }
                if (fired0 && we <= wm) lateTouched += ws
                wins(ws) = (acc, fired0, aux)
              }
              ws -= slideMs
            }
          }

          trigger match {
            case Trigger.EventTime =>
              wins.foreach { case (ws, (acc, fired, _)) =>
                val we = ws + sizeMs
                if (!fired && we <= wm) {
                  out += ((key, ws, we, "onTime", acc))
                  wins(ws) = (acc, true, 0L)
                } else if (fired && lateTouched(ws)) {
                  out += ((key, ws, we, "late", acc))
                }
              }
            case Trigger.ContinuousEventTime(interval) =>
              wins.foreach { case (ws, (acc, fired, aux0)) =>
                val we = ws + sizeMs
                var aux = aux0
                while (aux <= math.min(wm, we - 1)) {
                  out += ((key, ws, we, "early", acc))
                  aux += interval
                }
                var f = fired
                if (!f && we <= wm) {
                  out += ((key, ws, we, "onTime", acc))
                  f = true
                } else if (f && lateTouched(ws)) {
                  out += ((key, ws, we, "late", acc))
                }
                wins(ws) = (acc, f, aux)
              }
            case Trigger.Count(_, _) => ()
          }

          val live = wins.filter { case (ws, _) =>
            ws + sizeMs + allowedLatenessMs > wm
          }
          if (live.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(live.map { case (s, (a, f, x)) => (s, a, f, x) }.toSeq)
            val nexts = live.flatMap { case (ws, (_, fired, aux)) =>
              val we = ws + sizeMs
              trigger match {
                case Trigger.Count(_, _) => Seq(we + allowedLatenessMs)
                case Trigger.ContinuousEventTime(_) =>
                  (if (fired) Seq.empty else Seq(aux, we)) :+
                    (we + allowedLatenessMs)
                case Trigger.EventTime =>
                  (if (fired) Seq.empty else Seq(we)) :+
                    (we + allowedLatenessMs)
              }
            }
            state.setTimeoutTimestamp(
              math.max(wm - watermarkLagMs + 1, nexts.min - watermarkLagMs))
          }
          out.iterator
      }
  }
}
