package graft.cep

/** CEP pattern DSL — reference: flink-libraries/flink-cep/src/main/java/
  * org/apache/flink/cep/pattern/Pattern.java:138-586 (begin / where /
  * next / followedBy / times / timesOrMore / oneOrMore / optional /
  * greedy / within), GroupPattern.java (pattern groups — `begin(p)`,
  * `followedBy(p)`, `next(p)` with quantifiers, giving `(A B)+`) and the
  * MATCH_RECOGNIZE planner bridge (StreamExecMatch.java:51).
  *
  * Semantics implemented (a practical subset, documented deltas):
  *  - contiguity: `next` (strict) vs `followedBy` (relaxed,
  *    skip-till-next-match); repeats within a quantified step consume
  *    consecutively matching events
  *  - quantifiers: times(n), times(min,max), timesOrMore(n), oneOrMore,
  *    optional; greedy by default, `.reluctant` flips to lazy —
  *    applicable to single steps AND groups (unbounded group repetition
  *    loops over the group state in the matcher, not via unrolling)
  *  - `within(ms)`: bound from first to last matched event
  *  - after-match skip: PAST LAST ROW (Flink's default for
  *    MATCH_RECOGNIZE is SKIP PAST LAST ROW too)
  *  - conditions see the bindings so far (iterative conditions —
  *    Pattern.where(IterativeCondition) in the reference)
  */
sealed trait PElem[T] extends Serializable

final case class Step[T](
    name: String,
    predicate: (T, Map[String, Seq[T]]) => Boolean,
    minRepeat: Int = 1,
    maxRepeat: Int = 1,
    strict: Boolean = false,
    greedy: Boolean = true,
    negated: Boolean = false,
    // loop stop condition (reference Pattern.until)
    until: Option[(T, Map[String, Seq[T]]) => Boolean] = None,
    // relaxed internal contiguity for quantified steps (Flink's default
    // for followedBy loops; our default is consecutive)
    relaxedRepeat: Boolean = false) extends PElem[T]

/** A quantified pattern group (reference GroupPattern.java): the whole
  * sub-sequence repeats min..max times as one NFA loop state. `strict`
  * is the group's ENTRY contiguity (`next(group)`) — it anchors the
  * first copy; `consecutiveCopies` overrides the copy-to-copy
  * contiguity (reference consecutive()/allowCombinations on loops) and
  * defaults to the entry contiguity. Inner steps keep their own
  * contiguity within each copy. */
final case class GroupStep[T](
    sub: Vector[PElem[T]],
    minRepeat: Int = 1,
    maxRepeat: Int = 1,
    strict: Boolean = false,
    greedy: Boolean = true,
    consecutiveCopies: Option[Boolean] = None) extends PElem[T] {
  def copiesStrict: Boolean = consecutiveCopies.getOrElse(strict)
}

final class Pattern[T] private (val steps: Vector[PElem[T]], val withinMs: Long)
    extends Serializable {

  private def updLastStep(what: String)(f: Step[T] => Step[T]): Pattern[T] =
    steps.last match {
      case s: Step[T] => new Pattern(steps.init :+ f(s), withinMs)
      case _: GroupStep[T] => throw new IllegalArgumentException(
        s"$what applies to a single step, not a pattern group " +
          "(set conditions on the group's inner steps)")
    }

  private def updLast(f: PElem[T] => PElem[T]): Pattern[T] =
    new Pattern(steps.init :+ f(steps.last), withinMs)

  /** Simple condition on the current event. */
  def where(p: T => Boolean): Pattern[T] =
    updLastStep("where")(s => s.copy(predicate = (t, _) => p(t)))

  /** Iterative condition: sees the events bound so far. */
  def whereCtx(p: (T, Map[String, Seq[T]]) => Boolean): Pattern[T] =
    updLastStep("whereCtx")(_.copy(predicate = p))

  /** Strict contiguity: the next step must match the immediately
    * following event. */
  def next(name: String): Pattern[T] =
    new Pattern(steps :+ Step[T](name, (_, _) => true, strict = true), withinMs)

  /** Relaxed contiguity (skip till next match). */
  def followedBy(name: String): Pattern[T] =
    new Pattern(steps :+ Step[T](name, (_, _) => true), withinMs)

  /** Strict-contiguity pattern GROUP (reference Pattern.next(Pattern)):
    * the group's first copy starts immediately; apply `.oneOrMore` /
    * `.times(...)` to quantify the whole group. */
  def next(sub: Pattern[T]): Pattern[T] =
    new Pattern(steps :+ GroupStep[T](sub.steps, strict = true), withinMs)

  /** Relaxed-contiguity pattern GROUP (reference
    * Pattern.followedBy(Pattern)) — enables `(A B)+` via
    * `.followedBy(group).oneOrMore`. */
  def followedBy(sub: Pattern[T]): Pattern[T] =
    new Pattern(steps :+ GroupStep[T](sub.steps), withinMs)

  /** Absence constraint (reference Pattern.notFollowedBy): no event
    * matching this step's condition may occur between the previous step
    * and the next one. Must be followed by a positive step. */
  def notFollowedBy(name: String): Pattern[T] =
    new Pattern(steps :+ Step[T](name, (_, _) => true, negated = true),
      withinMs)

  /** Strict absence (reference Pattern.notNext): the event immediately
    * following the previous step must not match this condition. Must be
    * followed by a positive step. */
  def notNext(name: String): Pattern[T] =
    new Pattern(steps :+ Step[T](name, (_, _) => true, negated = true,
      strict = true), withinMs)

  /** Disjunctive condition on the current step (reference
    * Pattern.or(SimpleCondition)). */
  def or(p: T => Boolean): Pattern[T] =
    updLastStep("or") { s =>
      val old = s.predicate
      s.copy(predicate = (t, ctx) => old(t, ctx) || p(t))
    }

  /** Loop stop condition (reference Pattern.until): a quantified step
    * stops accepting once an event matches `p` (the event itself is not
    * consumed by the loop). */
  def until(p: T => Boolean): Pattern[T] =
    updLastStep("until")(_.copy(until = Some((t, _) => p(t))))

  /** Relaxed internal contiguity for the (quantified) step or group:
    * repeat elements/copies may be separated by non-matching events
    * (Flink's default for followedBy loops — skip-till-next within the
    * loop; on a group, Pattern.allowCombinations-style relaxation). */
  def allowGaps: Pattern[T] = updLast {
    case s: Step[T] => s.copy(relaxedRepeat = true)
    case g: GroupStep[T] => g.copy(consecutiveCopies = Some(false))
  }

  /** Strict internal contiguity (reference Pattern.consecutive) — the
    * step default here; on a quantified GROUP it makes the copies
    * consecutive (each copy starts right after the previous one; entry
    * contiguity is unchanged). */
  def consecutive: Pattern[T] = updLast {
    case s: Step[T] => s.copy(relaxedRepeat = false)
    case g: GroupStep[T] => g.copy(consecutiveCopies = Some(true))
  }

  def times(n: Int): Pattern[T] = updLast {
    case s: Step[T] => s.copy(minRepeat = n, maxRepeat = n)
    case g: GroupStep[T] => g.copy(minRepeat = n, maxRepeat = n)
  }
  def times(min: Int, max: Int): Pattern[T] = updLast {
    case s: Step[T] => s.copy(minRepeat = min, maxRepeat = max)
    case g: GroupStep[T] => g.copy(minRepeat = min, maxRepeat = max)
  }
  def timesOrMore(n: Int): Pattern[T] = updLast {
    case s: Step[T] => s.copy(minRepeat = n, maxRepeat = Int.MaxValue)
    case g: GroupStep[T] => g.copy(minRepeat = n, maxRepeat = Int.MaxValue)
  }
  def oneOrMore: Pattern[T] = timesOrMore(1)
  def optional: Pattern[T] = updLast {
    case s: Step[T] => s.copy(minRepeat = 0)
    case g: GroupStep[T] => g.copy(minRepeat = 0)
  }
  def reluctant: Pattern[T] = updLast {
    case s: Step[T] => s.copy(greedy = false)
    case g: GroupStep[T] => g.copy(greedy = false)
  }

  /** Max time window from first to last matched event, in millis. */
  def within(ms: Long): Pattern[T] = new Pattern(steps, ms)
}

object Pattern {
  def begin[T](name: String): Pattern[T] =
    new Pattern(Vector(Step[T](name, (_, _) => true)), Long.MaxValue)

  /** Pattern GROUP at the start (reference Pattern.begin(Pattern)):
    * `Pattern.begin(sub).oneOrMore` matches `(A B)+` — the first copy
    * anchors at the scan position; later copies follow with relaxed
    * contiguity (Flink's loop default; `next(sub)` gives consecutive
    * copies). The sub-pattern's `within` is ignored — set it on the
    * outer pattern. */
  def begin[T](sub: Pattern[T]): Pattern[T] =
    new Pattern(Vector(GroupStep[T](sub.steps)), Long.MaxValue)
}
