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

  /** AFTER MATCH skip strategies (reference: AfterMatchSkipStrategy,
    * flink-cep/.../nfa/aftermatch/). */
  sealed trait Skip extends Serializable
  object Skip {
    case object PastLastRow extends Skip
    case object ToNextRow extends Skip
    /** Resume at the first row bound to `v` (exclusive of the match
      * start — a non-advancing target raises, as the reference does). */
    final case class ToFirst(v: String) extends Skip
    /** Resume at the last row bound to `v`. */
    final case class ToLast(v: String) extends Skip
  }

  /** All matches over an event sequence (must be time-ordered), using
    * after-match SKIP PAST LAST ROW: the scan resumes after the last
    * event of each match. Leftmost-first; quantifier greediness follows
    * each step's flag. */
  def findMatches[T](events: IndexedSeq[T], tsOf: T => Long,
      pattern: Pattern[T]): Seq[Map[String, Seq[T]]] =
    findMatchesAlt(events, tsOf, Seq(pattern))

  /** Alternation (SQL `PATTERN (A B | A C)`): at each start position the
    * branches are tried in order — leftmost branch priority, as in the
    * standard — and the first that matches wins; the scan then resumes
    * per the skip strategy (SKIP PAST LAST ROW default). */
  def findMatchesAlt[T](events: IndexedSeq[T], tsOf: T => Long,
      patterns: Seq[Pattern[T]],
      skipToNextRow: Boolean = false): Seq[Map[String, Seq[T]]] =
    findMatchesSkip(events, tsOf, patterns,
      if (skipToNextRow) Skip.ToNextRow else Skip.PastLastRow).map(_._1)

  /** Core scan with a full skip strategy. Each match yields its
    * per-symbol bindings plus the ordered (symbol, eventIndex) trace —
    * the trace drives SKIP TO FIRST/LAST and RUNNING measure
    * semantics. */
  def findMatchesSkip[T](events: IndexedSeq[T], tsOf: T => Long,
      patterns: Seq[Pattern[T]], skip: Skip)
      : Seq[(Map[String, Seq[T]], Seq[(String, Int)])] = {
    def fail(msg: String): Nothing = throw new IllegalStateException(
      s"AFTER MATCH $msg")
    val out = mutable.ArrayBuffer.empty[(Map[String, Seq[T]], Seq[(String, Int)])]
    var i = 0
    while (i < events.length) {
      val hit = patterns.iterator
        .map(p => tryFromIdx(events, i, tsOf, p))
        .collectFirst { case Some(m) => m }
      hit match {
        case Some((endExclusive, bindings, idxs)) =>
          val trace = idxs.toSeq
            .flatMap { case (name, is) => is.map(j => (name, j)) }
            .sortBy(_._2)
          out += ((bindings, trace))
          i = skip match {
            case Skip.PastLastRow => math.max(endExclusive, i + 1)
            case Skip.ToNextRow => i + 1
            case Skip.ToFirst(v) =>
              val j = idxs.getOrElse(v, Seq.empty).headOption.getOrElse(
                fail(s"SKIP TO FIRST $v: variable bound no rows in match"))
              if (j <= i) fail(s"SKIP TO FIRST $v would not advance " +
                "(infinite loop)")
              j
            case Skip.ToLast(v) =>
              val j = idxs.getOrElse(v, Seq.empty).lastOption.getOrElse(
                fail(s"SKIP TO LAST $v: variable bound no rows in match"))
              if (j <= i) fail(s"SKIP TO LAST $v would not advance " +
                "(infinite loop)")
              j
          }
        case None => i += 1
      }
    }
    out.toSeq
  }

  /** Attempt one match starting exactly at `start` (the first step's
    * first event must be events(start) unless the first step is
    * optional). Returns (end index exclusive, bindings). */
  def tryFrom[T](events: IndexedSeq[T], start: Int, tsOf: T => Long,
      pattern: Pattern[T]): Option[(Int, Map[String, Seq[T]])] =
    tryFromIdx(events, start, tsOf, pattern).map { case (e, b, _) => (e, b) }

  /** As tryFrom, also returning the bound event INDICES per symbol. */
  def tryFromIdx[T](events: IndexedSeq[T], start: Int, tsOf: T => Long,
      pattern: Pattern[T])
      : Option[(Int, Map[String, Seq[T]], Map[String, Seq[Int]])] = {
    // fold negated steps into the FOLLOWING positive step as a
    // forbidden-gap predicate (reference: notFollowedBy / notNext NFA
    // edges; strict = notNext checks only the immediately-next event)
    require(!pattern.steps.last.negated,
      "notFollowedBy/notNext cannot be the last pattern step")
    case class ExecStep(step: Step[T],
        forbidden: Option[(T, Map[String, Seq[T]]) => Boolean],
        forbiddenStrict: Boolean)
    val steps: Vector[ExecStep] = {
      val out = Vector.newBuilder[ExecStep]
      var pendingNeg: Option[(T, Map[String, Seq[T]]) => Boolean] = None
      var pendingNegStrict = false
      pattern.steps.foreach { s =>
        if (s.negated) { pendingNeg = Some(s.predicate); pendingNegStrict = s.strict }
        else {
          out += ExecStep(s, pendingNeg, pendingNegStrict)
          pendingNeg = None; pendingNegStrict = false
        }
      }
      out.result()
    }
    val withinMs = pattern.withinMs

    def go(stepIdx: Int, pos: Int, firstTs: Long,
        acc: Map[String, Seq[T]], accIdx: Map[String, Seq[Int]])
        : Option[(Int, Map[String, Seq[T]], Map[String, Seq[Int]])] = {
      if (stepIdx == steps.length)
        return if (acc.valuesIterator.exists(_.nonEmpty))
          Some((pos, acc, accIdx))
        else None
      val es = steps(stepIdx)
      val step = es.step
      val isFirstStep = stepIdx == 0
      def withinOk(e: T): Boolean =
        firstTs == Long.MinValue || tsOf(e) - firstTs <= withinMs
      def untilHit(e: T): Boolean = step.until.exists(_(e, acc))
      // notNext: the event immediately after the previous step may not
      // match the forbidden condition (regardless of where this step
      // eventually matches)
      if (es.forbiddenStrict) {
        es.forbidden.foreach { f =>
          if (pos < events.length && f(events(pos), acc)) return None
        }
      }
      // where may this step's run begin?
      val startPositions: Iterator[Int] =
        if (isFirstStep || step.strict) Iterator.single(pos)
        else Iterator.range(pos, events.length + 1) // +1 allows empty-at-end
      for (sp <- startPositions) {
        // notFollowedBy: the gap skipped over may not contain a
        // forbidden event; once one appears, no later start can work
        if (!es.forbiddenStrict) es.forbidden.foreach { f =>
          if ((pos until sp).exists(i => f(events(i), acc))) return None
        }
        // candidate repeat positions from sp: consecutive by default;
        // with relaxedRepeat, non-matching events in between are skipped
        // (Flink's skip-till-next inside loops); `until` ends the run
        val runIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
        if (step.relaxedRepeat && !step.strict) {
          var j = sp
          var stop = false
          while (!stop && j < events.length && runIdx.length < step.maxRepeat) {
            val e = events(j)
            if (!withinOk(e) || untilHit(e)) stop = true
            else {
              if (step.predicate(e, acc)) runIdx += j
              // an anchored first step must take events(start) itself;
              // only LATER repeat elements may skip over non-matches
              else if (isFirstStep && runIdx.isEmpty) stop = true
              j += 1
            }
          }
        } else {
          var j = sp
          while (j < events.length && runIdx.length < step.maxRepeat && {
            val e = events(j)
            step.predicate(e, acc) && withinOk(e) && !untilHit(e)
          }) { runIdx += j; j += 1 }
        }
        val maxRun = runIdx.length
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
            val takenIdx = runIdx.take(c).toSeq
            val taken = takenIdx.map(events)
            val f2 =
              if (firstTs != Long.MinValue) firstTs
              else if (c > 0) tsOf(taken.head)
              else Long.MinValue
            // APPEND to any earlier binding of the same name — a symbol
            // can repeat across unrolled group-quantifier copies
            go(stepIdx + 1, if (c > 0) runIdx(c - 1) + 1 else sp, f2,
                acc.updated(step.name,
                  acc.getOrElse(step.name, Seq.empty) ++ taken),
                accIdx.updated(step.name,
                  accIdx.getOrElse(step.name, Seq.empty) ++ takenIdx)) match {
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
    go(0, start, Long.MinValue, Map.empty, Map.empty)
  }
}
