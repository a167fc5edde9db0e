package graft.cep

/** CEP pattern DSL — reference: flink-libraries/flink-cep/src/main/java/
  * org/apache/flink/cep/pattern/Pattern.java:138-586 (begin / where /
  * next / followedBy / times / timesOrMore / oneOrMore / optional /
  * greedy / within) and the MATCH_RECOGNIZE planner bridge
  * (StreamExecMatch.java:51).
  *
  * Semantics implemented (a practical subset, documented deltas):
  *  - contiguity: `next` (strict) vs `followedBy` (relaxed,
  *    skip-till-next-match); repeats within a quantified step consume
  *    consecutively matching events
  *  - quantifiers: times(n), times(min,max), timesOrMore(n), oneOrMore,
  *    optional; greedy by default, `.reluctant` flips to lazy
  *  - `within(ms)`: bound from first to last matched event
  *  - after-match skip: PAST LAST ROW (Flink's default for
  *    MATCH_RECOGNIZE is SKIP PAST LAST ROW too)
  *  - conditions see the bindings so far (iterative conditions —
  *    Pattern.where(IterativeCondition) in the reference)
  */
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
    relaxedRepeat: Boolean = false)

final class Pattern[T] private (val steps: Vector[Step[T]], val withinMs: Long)
    extends Serializable {

  private def updLast(f: Step[T] => Step[T]): Pattern[T] =
    new Pattern(steps.init :+ f(steps.last), withinMs)

  /** Simple condition on the current event. */
  def where(p: T => Boolean): Pattern[T] =
    updLast(s => s.copy(predicate = (t, _) => p(t)))

  /** Iterative condition: sees the events bound so far. */
  def whereCtx(p: (T, Map[String, Seq[T]]) => Boolean): Pattern[T] =
    updLast(_.copy(predicate = p))

  /** Strict contiguity: the next step must match the immediately
    * following event. */
  def next(name: String): Pattern[T] =
    new Pattern(steps :+ Step[T](name, (_, _) => true, strict = true), withinMs)

  /** Relaxed contiguity (skip till next match). */
  def followedBy(name: String): Pattern[T] =
    new Pattern(steps :+ Step[T](name, (_, _) => true), withinMs)

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
    updLast { s =>
      val old = s.predicate
      s.copy(predicate = (t, ctx) => old(t, ctx) || p(t))
    }

  /** Loop stop condition (reference Pattern.until): a quantified step
    * stops accepting once an event matches `p` (the event itself is not
    * consumed by the loop). */
  def until(p: T => Boolean): Pattern[T] =
    updLast(_.copy(until = Some((t, _) => p(t))))

  /** Relaxed internal contiguity for the (quantified) step: repeat
    * elements may be separated by non-matching events (Flink's default
    * for followedBy loops — skip-till-next within the loop). */
  def allowGaps: Pattern[T] = updLast(_.copy(relaxedRepeat = true))

  /** Strict internal contiguity (reference Pattern.consecutive) — the
    * default here; provided for parity. */
  def consecutive: Pattern[T] = updLast(_.copy(relaxedRepeat = false))

  def times(n: Int): Pattern[T] =
    updLast(_.copy(minRepeat = n, maxRepeat = n))
  def times(min: Int, max: Int): Pattern[T] =
    updLast(_.copy(minRepeat = min, maxRepeat = max))
  def timesOrMore(n: Int): Pattern[T] =
    updLast(_.copy(minRepeat = n, maxRepeat = Int.MaxValue))
  def oneOrMore: Pattern[T] =
    updLast(_.copy(minRepeat = 1, maxRepeat = Int.MaxValue))
  def optional: Pattern[T] = updLast(_.copy(minRepeat = 0))
  def reluctant: Pattern[T] = updLast(_.copy(greedy = false))

  /** Max time window from first to last matched event, in millis. */
  def within(ms: Long): Pattern[T] = new Pattern(steps, ms)
}

object Pattern {
  def begin[T](name: String): Pattern[T] =
    new Pattern(Vector(Step[T](name, (_, _) => true)), Long.MaxValue)
}
