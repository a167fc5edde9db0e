package graft.cep

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property check: for strict-contiguity patterns over single-character
  * event types, the CEP matcher must agree exactly with Java's regex
  * engine — both implement leftmost-first search with greedy/reluctant
  * backtracking, and SKIP PAST LAST ROW corresponds to resuming
  * find() after each match. An independent, well-tested model of the
  * same language keeps the NFA-equivalent matcher honest across the
  * whole quantifier surface.
  */
class CepPropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 500): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  case class Ev(idx: Int, typ: Char)

  case class QStep(typ: Char, min: Int, max: Int, greedy: Boolean)

  private val stepGen: Gen[QStep] = for {
    t <- Gen.oneOf('a', 'b', 'c')
    q <- Gen.oneOf((1, 1), (0, Int.MaxValue), (1, Int.MaxValue), (0, 1),
      (2, 2), (1, 2))
    g <- Gen.oneOf(true, false)
  } yield QStep(t, q._1, q._2, g)

  // at least one step must consume a row (the matcher rejects
  // fully-empty matches; the regex model would find empties everywhere)
  private val patternGen: Gen[List[QStep]] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, stepGen))
      .retryUntil(_.exists(_.min >= 1))

  private val eventsGen: Gen[String] =
    Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'x')).map(_.mkString))

  private def toCep(steps: List[QStep]): Pattern[Ev] = {
    var p: Pattern[Ev] = null
    steps.zipWithIndex.foreach { case (s, i) =>
      val name = s"s$i"
      p = if (i == 0) Pattern.begin[Ev](name) else p.next(name)
      p = p.where((e: Ev) => e.typ == s.typ)
      if (!(s.min == 1 && s.max == 1)) p = p.times(s.min,
        if (s.max == Int.MaxValue) Int.MaxValue else s.max)
      if (!s.greedy) p = p.reluctant
    }
    p
  }

  private def toRegex(steps: List[QStep]): String =
    steps.map { s =>
      val q = (s.min, s.max) match {
        case (1, 1) => ""
        case (0, Int.MaxValue) => "*"
        case (1, Int.MaxValue) => "+"
        case (0, 1) => "?"
        case (mn, Int.MaxValue) => s"{$mn,}"
        case (mn, mx) => s"{$mn,$mx}"
      }
      s.typ.toString + q + (if (s.greedy || q.isEmpty) "" else "?")
    }.mkString

  /** Regex model: leftmost find, resume past each (non-empty) match —
    * SKIP PAST LAST ROW. Returns consumed index ranges. */
  private def regexSpans(input: String, regex: String): List[(Int, Int)] = {
    val m = java.util.regex.Pattern.compile(regex).matcher(input)
    var out = List.empty[(Int, Int)]
    var from = 0
    while (from <= input.length && m.find(from)) {
      if (m.end > m.start) {
        out :+= ((m.start, m.end))
        from = m.end
      } else from = m.start + 1
    }
    out
  }

  test("matcher agrees with the regex engine on strict patterns") {
    check(Prop.forAll(eventsGen, patternGen) { (input: String, steps: List[QStep]) =>
      val events = input.zipWithIndex
        .map { case (c, i) => Ev(i, c) }.toIndexedSeq
      val got = Matcher
        .findMatches[Ev](events, (e: Ev) => e.idx.toLong, toCep(steps))
        .map { bindings =>
          val idxs = bindings.valuesIterator.flatten.map(_.idx).toSeq.sorted
          (idxs.head, idxs.last + 1)
        }
      val want = regexSpans(input, toRegex(steps))
      if (got != want) println(
        s"MISMATCH input=$input regex=${toRegex(steps)} got=$got want=$want")
      got == want
    })
  }

  test("group loops agree with regex non-capturing group quantifiers") {
    // (?:t0 t1 ...){m,M}[?] — strict inner contiguity, consecutive
    // copies: the fully-regex-expressible slice of GroupPattern loops
    val groupGen = for {
      types <- Gen.choose(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      q <- Gen.oneOf((1, Int.MaxValue), (1, 2), (2, 2), (2, Int.MaxValue),
        (1, 3))
      g <- Gen.oneOf(true, false)
    } yield (types, q, g)
    check(Prop.forAll(eventsGen, groupGen) {
      case (input: String, (types: List[Char], (mn: Int, mx: Int), greedy: Boolean)) =>
        val events = input.zipWithIndex
          .map { case (c, i) => Ev(i, c) }.toIndexedSeq
        var sub: Pattern[Ev] = null
        types.zipWithIndex.foreach { case (t, i) =>
          sub = if (i == 0) Pattern.begin[Ev](s"g$i") else sub.next(s"g$i")
          sub = sub.where((e: Ev) => e.typ == t)
        }
        var cep = Pattern.begin(sub)
          .times(mn, if (mx == Int.MaxValue) Int.MaxValue else mx)
          .consecutive
        if (!greedy) cep = cep.reluctant
        val got = Matcher
          .findMatches[Ev](events, (e: Ev) => e.idx.toLong, cep)
          .map { bindings =>
            val idxs = bindings.valuesIterator.flatten.map(_.idx).toSeq.sorted
            (idxs.head, idxs.last + 1)
          }
        val q = (mn, mx) match {
          case (1, Int.MaxValue) => "+"
          case (m, Int.MaxValue) => s"{$m,}"
          case (m, x) => s"{$m,$x}"
        }
        val rx = s"(?:${types.mkString})$q" + (if (greedy) "" else "?")
        val want = regexSpans(input, rx)
        if (got != want) println(
          s"GROUP MISMATCH input=$input regex=$rx got=$got want=$want")
        got == want
    })
  }

  test("alternation agrees with regex alternative-priority semantics") {
    val branchesGen = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, patternGen))
    check(Prop.forAll(eventsGen, branchesGen) {
      (input: String, branches: List[List[QStep]]) =>
        val events = input.zipWithIndex
          .map { case (c, i) => Ev(i, c) }.toIndexedSeq
        val got = Matcher.findMatchesAlt[Ev](events, (e: Ev) => e.idx.toLong,
            branches.map(toCep))
          .map { bindings =>
            val idxs = bindings.valuesIterator.flatten.map(_.idx).toSeq.sorted
            (idxs.head, idxs.last + 1)
          }
        // non-capturing groups keep alternative priority order
        val rx = branches.map(b => s"(?:${toRegex(b)})").mkString("|")
        val want = regexSpans(input, rx)
        if (got != want) println(
          s"ALT MISMATCH input=$input regex=$rx got=$got want=$want")
        got == want
    }, n = 500)
  }
}
