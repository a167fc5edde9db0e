package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming temporal (as-of) join — reference:
  * TemporalRowTimeJoinOperator.java:78: buffer probe rows and versioned
  * dimension rows per key; when the watermark passes a probe's
  * timestamp, every version <= that timestamp has arrived, so the
  * "latest version at probe time" is decidable and emitted exactly once.
  *
  * Spark has no two-input stateful operator; the standard encoding is a
  * tagged union of both sides into one keyed stream. State per key:
  * version history (pruned to the latest version <= watermark plus all
  * newer ones — exactly what future probes can still need, the same
  * cleanup rule the reference operator applies) and pending probes.
  * Event-time timeouts finalize keys that receive no further input.
  */
object StreamingAsOf {

  /** Tagged union row: exactly one of `probe` / `version` is set.
    * `ets` duplicates `ts` as a Timestamp so `withWatermark` can be
    * applied AFTER tagging (a typed map drops watermark metadata). */
  case class Tagged[L, R](key: String, ts: Long, probe: Option[L],
      version: Option[R], ets: java.sql.Timestamp)

  def probeRow[L, R](key: String, ts: Long, l: L): Tagged[L, R] =
    Tagged(key, ts, Some(l), None, new java.sql.Timestamp(ts))
  def versionRow[L, R](key: String, ts: Long, r: R): Tagged[L, R] =
    Tagged(key, ts, None, Some(r), new java.sql.Timestamp(ts))

  /** @param left   watermarked probe stream, mapped to Tagged(probe)
    * @param right  watermarked version stream, mapped to Tagged(version)
    * @return (key, probeTs, probe, matchedVersion) in append mode
    */
  def asOfJoin[L, R](left: Dataset[Tagged[L, R]], right: Dataset[Tagged[L, R]])(
      implicit lEnc: Encoder[L], rEnc: Encoder[R],
      tEnc: Encoder[Tagged[L, R]],
      stateEnc: Encoder[(Seq[Tagged[L, R]], Seq[Tagged[L, R]])],
      outEnc: Encoder[(String, Long, L, Option[R])]): Dataset[(String, Long, L, Option[R])] = {
    implicit val strEnc: Encoder[String] = Encoders.STRING
    left.union(right)
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[Tagged[L, R]],
            state: GroupState[(Seq[Tagged[L, R]], Seq[Tagged[L, R]])]) =>
          val (oldVersions, oldProbes) =
            state.getOption.getOrElse((Seq.empty, Seq.empty))
          val incoming = rows.toSeq
          val versions = (oldVersions ++ incoming.filter(_.version.isDefined))
            .sortBy(_.ts)
          val probes = (oldProbes ++ incoming.filter(_.probe.isDefined))
            .sortBy(_.ts)
          val wm = state.getCurrentWatermarkMs()

          val (mature, pending) = probes.partition(_.ts <= wm)
          val out = mature.map { p =>
            val v = versions.filter(_.ts <= p.ts).lastOption
            (key, p.ts, p.probe.get, v.flatMap(_.version))
          }
          // prune versions: future probes have ts > wm, so they can only
          // need the latest version <= wm plus everything newer
          val latestLeqWm = versions.filter(_.ts <= wm).lastOption
          val keptVersions =
            (latestLeqWm.toSeq ++ versions.filter(_.ts > wm)).distinct
          if (pending.isEmpty && keptVersions.isEmpty) state.remove()
          else {
            state.update((keptVersions, pending))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(pending.head.ts + 1)
          }
          out.iterator
      }
  }
}
