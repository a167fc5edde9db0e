package graft.multimodal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots_check(robots_txt, user_agent, path): RFC 9309 (Robots
  * Exclusion Protocol) evaluation — the crawl-compliance gate a
  * respectful corpus pipeline runs before ingesting a fetched page,
  * and the re-filter applied when a crawl dump is reprocessed under
  * newer robots rules. Returns struct<allowed: boolean,
  * matched_rule: string, crawl_delay: int>.
  *
  * Group selection (RFC 9309 §2.2.1): the crawler's PRODUCT TOKEN
  * (its name up to the first '/' or space) must equal a group's
  * user-agent token case-insensitively — a prefix is NOT a match
  * ("fish" does not govern "fishbot"); `*` groups apply when no
  * specific group matches; multiple user-agent lines stack onto one
  * group; groups with the same agent merge.
  *
  * Rule evaluation (§2.2.2): longest-match wins across allow and
  * disallow octet-wise; on a length tie allow wins (the
  * least-restrictive tiebreak); `*` matches any octet sequence, `$`
  * anchors the end; an empty disallow value allows everything; no
  * matching group or no matching rule means allowed. `crawl-delay`
  * (the de-facto extension) is reported from the selected group
  * (-1 when absent). A payload with no parseable lines is NOT an
  * error — an empty robots.txt allows everything (the RFC's
  * unavailable-file rule maps there too).
  *
  * Scale shape: per-row map-side evaluation, zero shuffle
  * (PlanSpec-pinned via q_robots_check). For a fixed site the
  * robots.txt column is dictionary-encoded by parquet, so the parse
  * cost amortizes across the site's pages at scan time. */
case class RobotsCheckExpr(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("allowed", BooleanType, nullable = false),
    StructField("matched_rule", StringType, nullable = true),
    StructField("crawl_delay", IntegerType, nullable = false)))
  override def prettyName: String = "robots_check"

  override protected def nullSafeEval(robots: Any, agent: Any,
      path: Any): Any = {
    try evalRobots(robots.asInstanceOf[UTF8String].toString,
      agent.asInstanceOf[UTF8String].toString,
      path.asInstanceOf[UTF8String].toString)
    catch { case _: Exception =>
      InternalRow(true, null, -1) // unreadable rules never block
    }
  }

  private final case class Rule(allow: Boolean, pattern: String)

  private def evalRobots(txt: String, agent: String,
      path: String): InternalRow = {
    val agentLower = agent.toLowerCase
    // parse into groups: (agent tokens, rules, crawlDelay)
    var groups = List.empty[(List[String], List[Rule], Int)]
    var curAgents = List.empty[String]
    var curRules = List.empty[Rule]
    var curDelay = -1
    var inAgents = true // user-agent lines stack until a rule appears
    def flush(): Unit = {
      if (curAgents.nonEmpty)
        groups ::= ((curAgents, curRules.reverse, curDelay))
      curAgents = Nil; curRules = Nil; curDelay = -1
    }
    for (raw <- txt.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            curAgents ::= value.toLowerCase
            inAgents = true
          case "allow" =>
            inAgents = false
            curRules ::= Rule(allow = true, value)
          case "disallow" =>
            inAgents = false
            curRules ::= Rule(allow = false, value)
          case "crawl-delay" =>
            inAgents = false
            curDelay = try value.toInt catch {
              case _: NumberFormatException => curDelay
            }
          case _ => inAgents = false // sitemap etc: ends the agent run
        }
      }
    }
    flush()
    // group selection (RFC 9309 §2.2.1): the crawler's product token
    // — its name up to the first '/' or space — must EQUAL a group
    // token case-insensitively (prefix matching would let a 'fish'
    // group govern 'fishbot'); '*' as fallback; all groups carrying
    // the selected token MERGE
    val product = agentLower.takeWhile(c => c != '/' && c != ' ')
    var bestTok: String = null
    var hasStar = false
    for (g <- groups; a <- g._1) {
      if (a == "*") hasStar = true
      else if (a == product) bestTok = a
    }
    val tok = if (bestTok != null) bestTok else if (hasStar) "*" else null
    if (tok == null) return InternalRow(true, null, -1)
    var mergedRules = List.empty[Rule]
    var mergedDelay = -1
    // groups accumulated by prepending — reverse to DOCUMENT order so
    // the first declared crawl-delay wins when several groups carry
    // the selected token (and merged rules keep their file order)
    for (g <- groups.reverse if g._1.contains(tok)) {
      mergedRules = mergedRules ++ g._2
      if (mergedDelay < 0) mergedDelay = g._3
    }
    val sel = (List(tok), mergedRules, mergedDelay)
    // rule evaluation: longest pattern match wins; ties go to allow
    var winLen = -1
    var winAllow = true
    var winRule: String = null
    for (r <- sel._2) {
      if (r.pattern.isEmpty) {
        // empty value: matches nothing (an empty Disallow allows all)
      } else if (matches(path, r.pattern)) {
        val l = r.pattern.length
        if (l > winLen || (l == winLen && r.allow && !winAllow)) {
          winLen = l; winAllow = r.allow; winRule = r.pattern
        }
      }
    }
    InternalRow(if (winLen < 0) true else winAllow,
      if (winRule == null) null else UTF8String.fromString(winRule),
      sel._3)
  }

  /** RFC 9309 pattern match: anchored at the path start, `*` matches
    * any octets, trailing `$` anchors the end. Iterative
    * backtracking over star positions (patterns are short). */
  private def matches(path: String, pattern: String): Boolean = {
    val endAnchor = pattern.endsWith("$")
    val p = if (endAnchor) pattern.dropRight(1) else pattern
    // segments split by '*': first must match at 0, middles anywhere
    // in order, last must (if anchored) end the path
    val segs = p.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return false
        pos = seg.length
      } else if (i == segs.length - 1 && endAnchor) {
        if (seg.isEmpty) return true // pattern ends with '*$'
        return path.length - pos >= seg.length && path.endsWith(seg)
      } else {
        val at = path.indexOf(seg, pos)
        if (at < 0) return false
        pos = at + seg.length
      }
      i += 1
    }
    if (endAnchor) pos == path.length else true
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
