package graft.cep

import scala.collection.mutable

/** Backtracking pattern matcher — the execution core of the CEP
  * operator, equivalent in expressive power to the reference's NFA
  * (flink-libraries/flink-cep/.../nfa/NFA.java) for the Pattern subset
  * we support: the compiled NFA and a backtracking scan accept the same
  * language; the NFA is an optimization for one-pass streaming, while we
  * re-scan the (watermark-bounded) buffer per key — simpler, and the
  * per-key buffers are small because `within` prunes them.
  */
object Matcher {

  /** All matches over an event sequence (must be time-ordered), using
    * after-match SKIP PAST LAST ROW: the scan resumes after the last
    * event of each match. Leftmost-first; quantifier greediness follows
    * each step's flag. */
  def findMatches[T](events: IndexedSeq[T], tsOf: T => Long,
      pattern: Pattern[T]): Seq[Map[String, Seq[T]]] = {
    val out = mutable.ArrayBuffer.empty[Map[String, Seq[T]]]
    var i = 0
    while (i < events.length) {
      tryFrom(events, i, tsOf, pattern) match {
        case Some((endExclusive, bindings)) =>
          out += bindings
          i = math.max(endExclusive, i + 1)
        case None => i += 1
      }
    }
    out.toSeq
  }

  /** Attempt one match starting exactly at `start` (the first step's
    * first event must be events(start) unless the first step is
    * optional). Returns (end index exclusive, bindings). */
  def tryFrom[T](events: IndexedSeq[T], start: Int, tsOf: T => Long,
      pattern: Pattern[T]): Option[(Int, Map[String, Seq[T]])] = {
    // fold negated steps into the FOLLOWING positive step as a
    // forbidden-gap predicate (reference: notFollowedBy NFA edges)
    require(!pattern.steps.last.negated,
      "notFollowedBy cannot be the last pattern step")
    case class ExecStep(step: Step[T],
        forbidden: Option[(T, Map[String, Seq[T]]) => Boolean])
    val steps: Vector[ExecStep] = {
      val out = Vector.newBuilder[ExecStep]
      var pendingNeg: Option[(T, Map[String, Seq[T]]) => Boolean] = None
      pattern.steps.foreach { s =>
        if (s.negated) pendingNeg = Some(s.predicate)
        else { out += ExecStep(s, pendingNeg); pendingNeg = None }
      }
      out.result()
    }
    val withinMs = pattern.withinMs

    def go(stepIdx: Int, pos: Int, firstTs: Long,
        acc: Map[String, Seq[T]]): Option[(Int, Map[String, Seq[T]])] = {
      if (stepIdx == steps.length)
        return if (acc.valuesIterator.exists(_.nonEmpty)) Some((pos, acc))
          else None
      val es = steps(stepIdx)
      val step = es.step
      val isFirstStep = stepIdx == 0
      // where may this step's run begin?
      val startPositions: Iterator[Int] =
        if (isFirstStep || step.strict) Iterator.single(pos)
        else Iterator.range(pos, events.length + 1) // +1 allows empty-at-end
      for (sp <- startPositions) {
        // notFollowedBy: the gap skipped over may not contain a
        // forbidden event; once one appears, no later start can work
        es.forbidden.foreach { f =>
          if ((pos until sp).exists(i => f(events(i), acc))) return None
        }
        // longest consecutive run of matching events from sp
        var maxRun = 0
        while (sp + maxRun < events.length && maxRun < step.maxRepeat && {
          val e = events(sp + maxRun)
          step.predicate(e, acc) &&
            (firstTs == Long.MinValue || tsOf(e) - firstTs <= withinMs)
        }) maxRun += 1
        if (maxRun >= step.minRepeat || step.minRepeat == 0) {
          val lo = math.max(step.minRepeat, 0)
          val hi = math.min(maxRun, step.maxRepeat)
          val counts: Seq[Int] =
            if (hi < lo) Seq.empty
            else if (step.greedy) hi to lo by -1 else lo to hi
          val candidateCounts =
            if (step.minRepeat == 0 && !counts.contains(0)) counts :+ 0
            else counts
          for (c <- candidateCounts) {
            val taken = events.slice(sp, sp + c).toSeq
            val f2 =
              if (firstTs != Long.MinValue) firstTs
              else if (c > 0) tsOf(taken.head)
              else Long.MinValue
            go(stepIdx + 1, if (c > 0) sp + c else sp, f2,
                acc + (step.name -> taken)) match {
              case s @ Some(_) => return s
              case None =>
            }
          }
        }
        // a strict step (or the anchored first step) may not slide
        if (isFirstStep || step.strict) return None
      }
      None
    }
    go(0, start, Long.MinValue, Map.empty)
  }
}
