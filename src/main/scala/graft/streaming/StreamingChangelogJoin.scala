package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Unbounded stream-stream equi-join whose inputs are CHANGELOGS —
  * every input row carries a row kind (+I/-U/+U/-D), both sides may
  * update, and the operator emits the joined change stream with outer
  * null-padding driven by association counting. This is the streaming
  * twin of [[graft.cdc.ChangelogJoin]]'s batch replay (same reference:
  * StreamingJoinOperator.java:37 + OuterJoinRecordStateViews.java:336);
  * the batch operator replays arrival order from sequence columns,
  * this one processes arrival order as it happens.
  *
  * Semantics per arriving change (weight w = ±1 by kind):
  *   - emit one joined row per LIVE matching row of the other side's
  *     state (live = net count > 0, multiplicity-many emissions),
  *     carrying the arriving change's kind;
  *   - outer variants: no live match → the null-padded row in the
  *     arriving kind; and when this change crosses its key's
  *     association count through zero (0→1 insert / 1→0 retraction),
  *     the OTHER side's live rows get their padding retracted (-U) or
  *     restored (+U) — retract-before-add order within the event;
  *   - finally the change applies to its own side's multiset.
  *
  * Scale: state is the two signed multisets per key — identical to the
  * reference's JoinRecordStateView (count per distinct row content),
  * hash-distributed on the join key; one shuffle per side. State never
  * stores dead contents (net 0 entries are dropped).
  *
  * Ordering: every input row carries an explicit SEQUENCE number, and
  * a key's buffered rows are applied in (seq, side) order (left wins
  * ties) inside each trigger — flatMapGroupsWithState gives no
  * intra-micro-batch ordering guarantee, so when several changes for
  * one key (possibly from both sides) land in a single trigger, the
  * group iterator would otherwise apply them in arbitrary shuffle
  * order. The (seq, side) rule is exactly the batch twin's global
  * processing order, so the two operators stay emission-equivalent at
  * ANY micro-batch granularity, not just one-event-per-trigger.
  */
object StreamingChangelogJoin {

  /** Changelog emission: (rowKind, left, right). */
  type Out[L, R] = (String, Option[L], Option[R])

  private def weight(kind: String): Int =
    if (kind == "+I" || kind == "+U") 1 else -1

  /** `joinType`: inner | left | right | full. Input rows are
    * (payload, rowKind, seq) — `seq` totally orders each side's
    * changes and is comparable across sides (the batch twin's
    * contract, [[graft.cdc.ChangelogJoin.updateStream]]).
    *
    * `stateTtlMs`: idle state retention — the reference's
    * table.exec.state.ttl applied to the regular streaming join
    * (StreamingJoinOperator's StateTtlConfig): a key whose state sees
    * no change for the TTL (processing time) is DROPPED, so unbounded
    * two-sided state stays bounded by key churn instead of key
    * cardinality. As in the reference, this deliberately trades
    * correctness for boundedness: a change arriving after its key
    * expired joins against EMPTY state (documented Flink behavior).
    * Default Long.MaxValue = keep state forever.
    * Spark runs batches continuously while processing-time timeouts
    * are registered (shouldRunAnotherBatch) — pair a TTL with a
    * processing-time trigger to bound the idle batch rate. */
  def join[K, L, R](left: Dataset[(L, String, Long)],
      right: Dataset[(R, String, Long)],
      lKey: L => K, rKey: R => K, joinType: String,
      stateTtlMs: Long = Long.MaxValue)(
      implicit kEnc: Encoder[K],
      inEnc: Encoder[(Option[(L, String, Long)], Option[(R, String, Long)])],
      stEnc: Encoder[(Seq[(L, Int)], Seq[(R, Int)])],
      outEnc: Encoder[Out[L, R]]): Dataset[Out[L, R]] = {
    require(Set("inner", "left", "right", "full")(joinType),
      s"unsupported join type: $joinType")
    val padsLeft = joinType == "left" || joinType == "full"
    val padsRight = joinType == "right" || joinType == "full"
    val tagged = left
      .map(l => (Option(l), Option.empty[(R, String, Long)]))
      .unionByName(right.map(r => (Option.empty[(L, String, Long)], Option(r))))
    val timeoutConf =
      if (stateTtlMs == Long.MaxValue) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    tagged.groupByKey {
      case (Some((l, _, _)), _) => lKey(l)
      case (_, Some((r, _, _))) => rKey(r)
      case _ => throw new IllegalStateException("empty tagged row")
    }.flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
      (_: K, rows0: Iterator[(Option[(L, String, Long)], Option[(R, String, Long)])],
          state: GroupState[(Seq[(L, Int)], Seq[(R, Int)])]) =>
        if (state.hasTimedOut) { // TTL expiry: drop silently (reference
          state.remove()         // StateTtlConfig semantics — no
          Iterator.empty         // retractions for expired state)
        } else {
        var (ls0, rs0) = state.getOption
          .getOrElse((Seq.empty[(L, Int)], Seq.empty[(R, Int)]))
        val ls = scala.collection.mutable.LinkedHashMap(ls0: _*)
        val rs = scala.collection.mutable.LinkedHashMap(rs0: _*)
        val out = scala.collection.mutable.ArrayBuffer.empty[Out[L, R]]
        def bump[T](m: scala.collection.mutable.LinkedHashMap[T, Int],
            c: T, w: Int): Unit = {
          val n = m.getOrElse(c, 0) + w
          if (n == 0) m.remove(c) else m(c) = n
        }
        // apply in the global (seq, side) order — left wins seq ties —
        // regardless of how the shuffle interleaved this trigger's rows
        val rows = rows0.toSeq.sortBy {
          case (Some((_, _, s)), _) => (s, 0)
          case (_, Some((_, _, s))) => (s, 1)
          case _ => (Long.MaxValue, 2)
        }
        rows.foreach { row =>
          // one arriving change, on either side
          val (kind, w) = row match {
            case (Some((_, k, _)), _) => (k, weight(k))
            case (_, Some((_, k, _))) => (k, weight(k))
            case _ => ("+I", 1)
          }
          row match {
            case (Some((l, _, _)), _) =>
              val live = rs.toSeq.filter(_._2 > 0)
              val cb = ls.valuesIterator.sum
              // retract-before-add: a left insert that creates the
              // key's first left association first retracts the
              // (null, r) paddings, then emits its joined rows
              if (padsRight && cb == 0 && w > 0)
                live.foreach { case (r, cnt) =>
                  (1 to cnt).foreach(_ => out += (("-U", None, Some(r)))) }
              if (live.nonEmpty)
                live.foreach { case (r, cnt) =>
                  (1 to cnt).foreach(_ => out += ((kind, Some(l), Some(r)))) }
              else if (padsLeft) out += ((kind, Some(l), None))
              if (padsRight && cb + w == 0 && w < 0)
                live.foreach { case (r, cnt) =>
                  (1 to cnt).foreach(_ => out += (("+U", None, Some(r)))) }
              bump(ls, l, w)
            case (_, Some((r, _, _))) =>
              val live = ls.toSeq.filter(_._2 > 0)
              val cb = rs.valuesIterator.sum
              if (padsLeft && cb == 0 && w > 0)
                live.foreach { case (l, cnt) =>
                  (1 to cnt).foreach(_ => out += (("-U", Some(l), None))) }
              if (live.nonEmpty)
                live.foreach { case (l, cnt) =>
                  (1 to cnt).foreach(_ => out += ((kind, Some(l), Some(r)))) }
              else if (padsRight) out += ((kind, None, Some(r)))
              if (padsLeft && cb + w == 0 && w < 0)
                live.foreach { case (l, cnt) =>
                  (1 to cnt).foreach(_ => out += (("+U", Some(l), None))) }
              bump(rs, r, w)
            case _ => ()
          }
        }
        if (ls.isEmpty && rs.isEmpty) state.remove()
        else {
          state.update((ls.toSeq, rs.toSeq))
          if (stateTtlMs != Long.MaxValue)
            state.setTimeoutDuration(stateTtlMs)
        }
        out.iterator
        }
    }
  }
}
