package graft.cep

import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MATCH_RECOGNIZE SQL surface — reference: the FMPP/Calcite grammar in
  * flink-table/flink-sql-parser/src/main/codegen/ and the planner bridge
  * StreamExecMatch.java:51 (NFA execution in flink-cep/.../nfa/).
  *
  * Supported subset (Flink's common usage): PARTITION BY, ORDER BY,
  * MEASURES with FIRST/LAST/COUNT/SUM/MIN/MAX/AVG over step variables
  * (RUNNING and FINAL semantics — RUNNING compiles against the ordered
  * per-match trace prefix), ONE ROW PER MATCH, PATTERN with
  * quantifiers (* + ? {n} {n,} {n,m}, reluctant '?' suffix), WITHIN,
  * DEFINE with current-row conditions and PREV/NEXT(col[, n])
  * navigation (compiled to precomputed lag/lead columns), ALL ROWS PER
  * MATCH (with CLASSIFIER() and MATCH_NUMBER()), top-level PATTERN
  * alternation (A B | A C — leftmost branch priority), bounded group
  * quantifiers ((B C){m,n}, unrolled into branches), AFTER MATCH SKIP
  * PAST LAST ROW / SKIP TO NEXT ROW / SKIP TO FIRST|LAST var (with the
  * reference's fail-on-non-advancing loop guard). Not supported
  * (raises): unbounded group quantifiers. Bare (unprefixed) measures in
  * ALL ROWS mode keep FINAL semantics — a documented delta from the
  * standard's RUNNING default.
  *
  * Execution is Spark-first, not an interpreter bolted on:
  *  1. every DEFINE condition becomes a precomputed BOOLEAN column
  *     (`__def_X`) — arbitrary Spark SQL, codegen'd, evaluated scan-side
  *     before any shuffle;
  *  2. one hash-partition by PARTITION BY keys, per-key time sort, and
  *     the graft.cep.Matcher (NFA-equivalent) binds rows to steps; its
  *     per-row predicate is just a boolean-column read;
  *  3. each match emits the per-step row ARRAYS; MEASURES compile to
  *     array expressions (try_element_at / size / aggregate) evaluated
  *     declaratively — again codegen'd, no per-measure interpreter.
  * At 100 TB this is one shuffle on the partition key plus a per-key
  * sort — the same cost shape as the reference's keyed CEP operator.
  */
object MatchRecognize {

  final case class PatSym(name: String, minRepeat: Int, maxRepeat: Int,
      greedy: Boolean)

  final case class Spec(
      inputTable: String,
      outerSelect: String,
      partitionBy: Seq[String],
      orderBy: Seq[String],
      measures: Seq[(String, String)], // (measure SQL, output alias)
      branches: Seq[Seq[PatSym]],      // PATTERN alternation branches
      withinMs: Option[Long],
      defines: Map[String, String],    // UPPER(symbol) -> condition SQL
      allRows: Boolean = false,
      skipToNextRow: Boolean = false,
      // AFTER MATCH SKIP TO FIRST|LAST <var>: (isFirst, varName)
      skipTo: Option[(Boolean, String)] = None)

  def matches(sql: String): Boolean =
    sql.toUpperCase.contains("MATCH_RECOGNIZE")

  // ---------------------------------------------------------------- parse

  private val OuterP: Regex =
    """(?is)^\s*SELECT\s+(.*?)\s+FROM\s+([\w.]+)\s+MATCH_RECOGNIZE\s*\(""".r

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"MATCH_RECOGNIZE: $msg")

  /** Split on top-level commas (not inside parens or quotes). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote = false
    s.foreach {
      case '\'' => quote = !quote; cur += '\''
      case '(' if !quote => depth += 1; cur += '('
      case ')' if !quote => depth -= 1; cur += ')'
      case ',' if !quote && depth == 0 => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  def parse(sql: String): Spec = {
    val m = OuterP.findFirstMatchIn(sql).getOrElse(
      fail("expected SELECT ... FROM <table> MATCH_RECOGNIZE (...)"))
    val outerSelect = m.group(1).trim
    val inputTable = m.group(2)
    // balanced-paren scan for the MATCH_RECOGNIZE body
    val openAt = m.end - 1
    var depth = 0
    var i = openAt
    var closeAt = -1
    var quote = false
    while (i < sql.length && closeAt < 0) {
      sql.charAt(i) match {
        case '\'' => quote = !quote
        case '(' if !quote => depth += 1
        case ')' if !quote => depth -= 1; if (depth == 0) closeAt = i
        case _ =>
      }
      i += 1
    }
    if (closeAt < 0) fail("unbalanced parentheses")
    val body = sql.substring(openAt + 1, closeAt)
    val tail = sql.substring(closeAt + 1).trim
    if (!tail.isEmpty && !tail.matches("(?is)AS\\s+\\w+\\s*;?\\s*") &&
        !tail.matches("(?is)\\w+\\s*;?\\s*"))
      fail(s"unsupported trailing clause: $tail")

    // locate clause keywords in the body
    val kws = Seq(
      "PARTITION_BY" -> """(?is)\bPARTITION\s+BY\b""".r,
      "ORDER_BY" -> """(?is)\bORDER\s+BY\b""".r,
      "MEASURES" -> """(?is)\bMEASURES\b""".r,
      "ROWS_PER_MATCH" -> """(?is)\b(ONE\s+ROW|ALL\s+ROWS)\s+PER\s+MATCH\b""".r,
      "AFTER_MATCH" -> """(?is)\bAFTER\s+MATCH\b""".r,
      "PATTERN" -> """(?is)\bPATTERN\b""".r,
      "WITHIN" -> """(?is)\bWITHIN\b""".r,
      "DEFINE" -> """(?is)\bDEFINE\b""".r)
    val hits = kws.flatMap { case (name, r) =>
      r.findFirstMatchIn(body).map(mm => (name, mm.start, mm.end))
    }.sortBy(_._2)
    val sections: Map[String, String] = hits.zipWithIndex.map {
      case ((name, _, e), idx) =>
        val end = if (idx + 1 < hits.length) hits(idx + 1)._2 else body.length
        name -> body.substring(e, end).trim
    }.toMap

    val partitionBy = sections.get("PARTITION_BY")
      .map(splitTopLevel(_).map(_.trim)).getOrElse(Nil)
    val orderBy = sections.get("ORDER_BY")
      .map(splitTopLevel(_).map(_.trim)).getOrElse(fail("ORDER BY required"))
    val allRows = hits.find(_._1 == "ROWS_PER_MATCH")
      .exists(h => body.substring(h._2, h._3).toUpperCase.contains("ALL"))
    val skipToVarP = """(?is)SKIP\s+TO\s+(FIRST|LAST)\s+(\w+)\s*""".r
    var skipTo: Option[(Boolean, String)] = None
    val skipToNextRow = sections.get("AFTER_MATCH").exists { s =>
      if (s.matches("(?is)SKIP\\s+PAST\\s+LAST\\s+ROW\\s*")) false
      else if (s.matches("(?is)SKIP\\s+TO\\s+NEXT\\s+ROW\\s*")) true
      else s match {
        case skipToVarP(fl, v) =>
          skipTo = Some((fl.equalsIgnoreCase("FIRST"), v))
          false
        case _ => fail(s"unsupported AFTER MATCH mode: $s " +
          "(SKIP PAST LAST ROW / SKIP TO NEXT ROW / SKIP TO FIRST|LAST var)")
      }
    }
    val measures = sections.get("MEASURES").map(splitTopLevel(_).map { e =>
      val mm = """(?is)^(.*\S)\s+AS\s+(\w+)\s*$""".r
      e match {
        case mm(ex, alias) => (ex.trim, alias)
        case _ => fail(s"measure needs 'expr AS alias': $e")
      }
    }).getOrElse(fail("MEASURES required"))

    val patBody0 = sections.getOrElse("PATTERN", fail("PATTERN required"))
    val patP = """(?s)^\s*\((.*?)\)\s*$""".r
    val patBody = patBody0 match {
      case patP(b) => b.trim
      case _ => fail(s"PATTERN needs (...): $patBody0")
    }
    val symP = """(\w+)(\*\?|\+\?|\*|\+|\?|\{\d+(?:,\d*)?\}\??)?""".r
    def parseBranch(branchBody: String): Vector[PatSym] =
      symP.findAllMatchIn(branchBody).map { sm =>
      val name = sm.group(1)
      val (mn, mx, greedy) = Option(sm.group(2)) match {
        case None => (1, 1, true)
        case Some("*") => (0, Int.MaxValue, true)
        case Some("*?") => (0, Int.MaxValue, false)
        case Some("+") => (1, Int.MaxValue, true)
        case Some("+?") => (1, Int.MaxValue, false)
        case Some("?") => (0, 1, true)
        case Some(q) =>
          val braceP = """\{(\d+)(?:,(\d*))?\}(\?)?""".r
          q match {
            case braceP(n, null, rel) => (n.toInt, n.toInt, rel == null)
            case braceP(n, "", rel) => (n.toInt, Int.MaxValue, rel == null)
            case braceP(n, x, rel) => (n.toInt, x.toInt, rel == null)
            case _ => fail(s"quantifier $q")
          }
      }
      PatSym(name, mn, mx, greedy)
    }.toVector
    // bounded group quantifiers — (B C){m,n} / (B C)? — unroll into
    // alternation branches (the reference compiles groups into NFA
    // sub-automata; with bounded repetition the expansion is finite and
    // the branch-priority order encodes greediness). Symbols repeated by
    // unrolling merge their bindings (Matcher appends per name).
    val tokenP = ("""\(\s*([^()|]*?)\s*\)(\{\d+(?:,\d+)?\}\??|\?\??)?""" +
      """|(\w+)((?:\*|\+|\?|\{\d+(?:,\d*)?\})\??)?""").r
    def expandBranch(branchBody: String): Seq[Vector[PatSym]] = {
      if (!branchBody.contains("(")) return Seq(parseBranch(branchBody))
      var expansions: Seq[Vector[PatSym]] = Seq(Vector.empty)
      // every non-space character must belong to a token — otherwise a
      // construct like (A B)+ would silently drop its quantifier
      val covered = Array.fill(branchBody.length)(false)
      tokenP.findAllMatchIn(branchBody).foreach { m =>
        (m.start until m.end).foreach(covered(_) = true)
      }
      branchBody.zipWithIndex.foreach { case (c, i) =>
        if (!c.isWhitespace && !covered(i))
          fail(s"unsupported PATTERN syntax near '$c' in: $branchBody " +
            "(unbounded group quantifiers are not supported)")
      }
      tokenP.findAllMatchIn(branchBody).foreach { m =>
        if (m.group(3) != null) {
          expansions = expansions.map(_ ++ parseBranch(m.matched))
        } else {
          val inner = parseBranch(m.group(1))
          if (inner.isEmpty) fail("empty group in PATTERN")
          val braceP = """\{(\d+)(?:,(\d+))?\}(\?)?""".r
          val (mn, mx, greedy) = Option(m.group(2)) match {
            case None => (1, 1, true)
            case Some("?") => (0, 1, true)
            case Some("??") => (0, 1, false)
            case Some(braceP(n, null, rel)) => (n.toInt, n.toInt, rel == null)
            case Some(braceP(n, x, rel)) => (n.toInt, x.toInt, rel == null)
            case Some(q) => fail(s"group quantifier $q " +
              "(unbounded group quantifiers are not supported)")
          }
          val counts = if (greedy) mx to mn by -1 else mn to mx
          expansions = expansions.flatMap(e =>
            counts.map(k => e ++ Vector.fill(k)(inner).flatten))
          if (expansions.length > 64)
            fail("group quantifier expansion exceeds 64 branches")
        }
      }
      expansions
    }
    def splitAlt(body: String): Seq[String] = {
      val out = Vector.newBuilder[String]
      val cur = new StringBuilder
      var d = 0
      body.foreach {
        case '(' => d += 1; cur += '('
        case ')' => d -= 1; cur += ')'
        case '|' if d == 0 => out += cur.toString; cur.clear()
        case c => cur += c
      }
      out += cur.toString
      out.result().map(_.trim)
    }
    val branches = splitAlt(patBody).flatMap(expandBranch)
    if (branches.exists(_.isEmpty)) fail("empty PATTERN branch")

    val withinMs = sections.get("WITHIN").map { s =>
      val ip = """(?is)INTERVAL\s+'(\d+)'\s+(\w+)""".r
      s match {
        case ip(n, u) =>
          val mult = u.toUpperCase match {
            case "SECOND" | "SECONDS" => 1000L
            case "MINUTE" | "MINUTES" => 60000L
            case "HOUR" | "HOURS" => 3600000L
            case "DAY" | "DAYS" => 86400000L
            case other => fail(s"WITHIN unit $other")
          }
          n.toLong * mult
        case _ => fail(s"WITHIN needs INTERVAL 'n' UNIT: $s")
      }
    }

    val defines = sections.get("DEFINE").map(splitTopLevel(_).map { d =>
      val dm = """(?is)^(\w+)\s+AS\s+(.*)$""".r
      d match {
        case dm(name, cond) => name.toUpperCase -> cond.trim
        case _ => fail(s"DEFINE needs 'SYM AS condition': $d")
      }
    }.toMap).getOrElse(Map.empty)

    Spec(inputTable, outerSelect, partitionBy, orderBy, measures,
      branches, withinMs, defines, allRows, skipToNextRow, skipTo)
  }

  // -------------------------------------------------------------- execute

  /** Run a full MATCH_RECOGNIZE SELECT against the session catalog. */
  def execute(spark: SparkSession, sql: String): DataFrame = {
    val spec = parse(sql)
    val out = apply(spark.table(spec.inputTable), spec)
    if (spec.outerSelect == "*") out
    else {
      val v = s"__mr_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      out.createOrReplaceTempView(v)
      spark.sql(s"SELECT ${spec.outerSelect} FROM $v")
    }
  }

  /** Strip `SYM.` prefixes in DEFINE conditions — they refer to the
    * current row's columns. */
  private def stripSymbolPrefixes(cond: String, symbols: Seq[String]): String = {
    val sym = symbols.map(Regex.quote).mkString("|")
    cond.replaceAll(s"(?i)\\b($sym)\\.(\\w+)", "$2")
  }

  private val PrevP: Regex =
    """(?i)\bPREV\s*\(\s*(?:\w+\.)?(\w+)\s*(?:,\s*(\d+))?\s*\)""".r
  private val NextP: Regex =
    """(?i)\bNEXT\s*\(\s*(?:\w+\.)?(\w+)\s*(?:,\s*(\d+))?\s*\)""".r

  /** PREV(col[, n]) references in DEFINE — collected so they can be
    * precomputed as lag columns (the Spark-first compilation: row
    * navigation becomes a window projection before matching). */
  private[cep] def prevRefs(cond: String): Seq[(String, Int)] =
    PrevP.findAllMatchIn(cond)
      .map(m => (m.group(1), Option(m.group(2)).map(_.toInt).getOrElse(1)))
      .toSeq.distinct

  /** NEXT(col[, n]) — the symmetric lookahead, precomputed as lead
    * columns (reference: logical-offset NEXT navigation in DEFINE). */
  private[cep] def nextRefs(cond: String): Seq[(String, Int)] =
    NextP.findAllMatchIn(cond)
      .map(m => (m.group(1), Option(m.group(2)).map(_.toInt).getOrElse(1)))
      .toSeq.distinct

  private[cep] def rewritePrev(cond: String): String = {
    val p = PrevP.replaceAllIn(cond, m => {
      val n = Option(m.group(2)).map(_.toInt).getOrElse(1)
      Regex.quoteReplacement(s"__prev_${n}_${m.group(1)}")
    })
    NextP.replaceAllIn(p, m => {
      val n = Option(m.group(2)).map(_.toInt).getOrElse(1)
      Regex.quoteReplacement(s"__next_${n}_${m.group(1)}")
    })
  }

  /** Compile a MEASURES expression to Spark SQL over the per-step match
    * arrays (`__m_X`). Bare `X.col` follows the standard's FINAL LAST
    * semantics. */
  private[cep] def rewriteMeasure(m: String, symbols: Seq[String]): String = {
    val sym = symbols.map(Regex.quote).mkString("|")
    var s = m
    s = s.replaceAll(s"(?i)\\bFIRST\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      "try_element_at(__m_$1, 1).$2")
    s = s.replaceAll(s"(?i)\\bLAST\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      "try_element_at(__m_$1, -1).$2")
    s = s.replaceAll(s"(?i)\\bCOUNT\\s*\\(\\s*($sym)\\.\\*\\s*\\)",
      "CAST(size(__m_$1) AS BIGINT)")
    s = s.replaceAll(s"(?i)\\bCOUNT\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      "CAST(size(filter(__m_$1, x -> x.$2 IS NOT NULL)) AS BIGINT)")
    // SQL aggregate semantics: NULL elements are ignored, not
    // propagated — SUM over all-NULL is NULL, AVG divides by the
    // non-null count (reference MATCH_RECOGNIZE measures do the same)
    val nnCount = "size(filter(__m_$1, x -> x.$2 IS NOT NULL))"
    val nnSum = "aggregate(__m_$1, CAST(0.0 AS DOUBLE), " +
      "(acc, x) -> acc + coalesce(CAST(x.$2 AS DOUBLE), 0.0))"
    s = s.replaceAll(s"(?i)\\bSUM\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      s"(CASE WHEN $nnCount = 0 THEN NULL ELSE $nnSum END)")
    s = s.replaceAll(s"(?i)\\bAVG\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      s"(CASE WHEN $nnCount = 0 THEN NULL ELSE $nnSum / $nnCount END)")
    s = s.replaceAll(s"(?i)\\bMIN\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      "array_min(transform(__m_$1, x -> x.$2))")
    s = s.replaceAll(s"(?i)\\bMAX\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      "array_max(transform(__m_$1, x -> x.$2))")
    s = s.replaceAll("(?i)\\bMATCH_NUMBER\\s*\\(\\s*\\)", "__match_num")
    s = s.replaceAll(s"(?i)\\b($sym)\\.(\\w+)", "try_element_at(__m_$1, -1).$2")
    s
  }

  /** RUNNING semantics (ALL ROWS PER MATCH): the aggregate/navigation
    * sees only match rows up to and including the CURRENT output row.
    * Compiled against the ordered trace array `__m_all`
    * (struct(classifier, r)) and the 0-based output position `__p`:
    * `slice(__m_all, 1, __p + 1)` is exactly the running prefix. Bare
    * (unprefixed) measures keep FINAL semantics, matching the
    * SKIP-PAST-LAST-ROW convention documented in the scaladoc; the
    * explicit FINAL keyword is stripped and routed to rewriteMeasure. */
  private[cep] def rewriteRunning(m: String, symbols: Seq[String]): String = {
    val sym = symbols.map(Regex.quote).mkString("|")
    var s = m
    val prefix = "filter(slice(__m_all, 1, __p + 1), x -> x.classifier = '$1')"
    val nn = "filter(slice(__m_all, 1, __p + 1), " +
      "x -> x.classifier = '$1' AND x.r.$2 IS NOT NULL)"
    val nnSum = s"aggregate($nn, CAST(0.0 AS DOUBLE), " +
      "(acc, x) -> acc + CAST(x.r.$2 AS DOUBLE))"
    s = s.replaceAll(s"(?i)\\bRUNNING\\s+FIRST\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      s"try_element_at($prefix, 1).r.$$2")
    s = s.replaceAll(s"(?i)\\bRUNNING\\s+LAST\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      s"try_element_at($prefix, -1).r.$$2")
    s = s.replaceAll(s"(?i)\\bRUNNING\\s+COUNT\\s*\\(\\s*($sym)\\.\\*\\s*\\)",
      s"CAST(size($prefix) AS BIGINT)")
    s = s.replaceAll(s"(?i)\\bRUNNING\\s+COUNT\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      s"CAST(size($nn) AS BIGINT)")
    s = s.replaceAll(s"(?i)\\bRUNNING\\s+SUM\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      s"(CASE WHEN size($nn) = 0 THEN NULL ELSE $nnSum END)")
    s = s.replaceAll(s"(?i)\\bRUNNING\\s+AVG\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      s"(CASE WHEN size($nn) = 0 THEN NULL ELSE $nnSum / size($nn) END)")
    s = s.replaceAll(s"(?i)\\bRUNNING\\s+MIN\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      s"array_min(transform($nn, x -> x.r.$$2))")
    s = s.replaceAll(s"(?i)\\bRUNNING\\s+MAX\\s*\\(\\s*($sym)\\.(\\w+)\\s*\\)",
      s"array_max(transform($nn, x -> x.r.$$2))")
    s
  }

  /** Apply a parsed spec to a DataFrame. */
  def apply(df: DataFrame, spec: Spec): DataFrame = {
    val symbols = spec.branches.flatten.map(_.name).distinct
    val inputCols = df.columns.toSeq

    // 0. PREV/NEXT(col, n) navigation in DEFINE -> precomputed lag/lead
    // columns (a window projection before matching — no per-row
    // navigation in the matcher itself)
    var pre = df
    val prevNeeded = spec.defines.values.flatMap(prevRefs).toSeq.distinct
    val nextNeeded = spec.defines.values.flatMap(nextRefs).toSeq.distinct
    if (prevNeeded.nonEmpty || nextNeeded.nonEmpty) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(spec.partitionBy.map(col): _*)
        .orderBy(spec.orderBy.map(col): _*)
      prevNeeded.foreach { case (c, n) =>
        pre = pre.withColumn(s"__prev_${n}_$c", lag(col(c), n).over(w))
      }
      nextNeeded.foreach { case (c, n) =>
        pre = pre.withColumn(s"__next_${n}_$c", lead(col(c), n).over(w))
      }
    }

    // 1. DEFINE conditions as precomputed boolean columns (scan-side)
    symbols.foreach { s =>
      val cond = spec.defines.get(s.toUpperCase)
        .map(c => stripSymbolPrefixes(rewritePrev(c), symbols))
        .getOrElse("true")
      pre = pre.withColumn(s"__def_$s", expr(cond))
    }
    val preSchema = pre.schema
    val partIdx = spec.partitionBy.map(preSchema.fieldIndex).toArray
    val orderIdx = spec.orderBy.map(preSchema.fieldIndex).toArray
    val defIdx = symbols.map(s => s -> preSchema.fieldIndex(s"__def_$s")).toMap
    val tsIdx = orderIdx.head
    spec.withinMs.foreach { _ =>
      val t = preSchema(tsIdx).dataType
      if (t != TimestampType && t != LongType && t != IntegerType)
        fail(s"WITHIN requires a time-ordered first ORDER BY column, got $t")
    }

    // 2. one cep pattern per alternation branch: predicates read the
    // boolean columns; SQL MATCH_RECOGNIZE contiguity is strict
    // (quantified steps consume the in-between rows)
    def branchPattern(branch: Seq[PatSym]): Pattern[Row] = {
      var pat: Pattern[Row] = null
      branch.zipWithIndex.foreach { case (ps, i) =>
        val di = defIdx(ps.name)
        val pred: Row => Boolean = r => !r.isNullAt(di) && r.getBoolean(di)
        pat = if (i == 0) Pattern.begin[Row](ps.name).where(pred)
          else pat.next(ps.name).where(pred)
        if (!(ps.minRepeat == 1 && ps.maxRepeat == 1))
          pat = pat.times(ps.minRepeat, ps.maxRepeat)
        if (!ps.greedy) pat = pat.reluctant
      }
      spec.withinMs.foreach(ms => pat = pat.within(ms))
      pat
    }
    val pats = spec.branches.map(branchPattern)

    val tsOf: Row => Long = r => r.get(tsIdx) match {
      case null => Long.MinValue
      case t: java.sql.Timestamp => t.getTime
      case t: java.time.Instant => t.toEpochMilli
      case l: Long => l
      case n: Int => n.toLong
      case o => fail(s"unsupported ORDER BY value $o")
    }
    val rowOrd: Ordering[Row] = (a: Row, b: Row) => {
      var c = 0
      var i = 0
      while (c == 0 && i < orderIdx.length) {
        val x = a.get(orderIdx(i))
        val y = b.get(orderIdx(i))
        c = if (x == null && y == null) 0
          else if (x == null) -1
          else if (y == null) 1
          else x.asInstanceOf[Comparable[Any]].compareTo(y)
        i += 1
      }
      c
    }

    val keySchema = StructType(partIdx.map(preSchema.apply).toSeq)
    val stepArr = ArrayType(preSchema, containsNull = false)
    val traceArr = ArrayType(StructType(Seq(
      StructField("classifier", StringType, nullable = false),
      StructField("r", preSchema, nullable = false))), containsNull = false)
    val outSchema = StructType(keySchema.fields.toSeq ++
      Seq(StructField("__match_num", LongType, nullable = false)) ++
      symbols.map(s => StructField(s"__m_$s", stepArr)) :+
      StructField("__m_all", traceArr, nullable = false))
    val patB = pats
    val skip: Matcher.Skip = spec.skipTo match {
      case Some((first, v)) =>
        val s = symbols.find(_.equalsIgnoreCase(v)).getOrElse(
          fail(s"AFTER MATCH SKIP TO references unknown variable $v"))
        if (first) Matcher.Skip.ToFirst(s) else Matcher.Skip.ToLast(s)
      case None =>
        if (spec.skipToNextRow) Matcher.Skip.ToNextRow
        else Matcher.Skip.PastLastRow
    }

    val matched = pre
      .groupByKey((r: Row) => Row.fromSeq(partIdx.map(r.get).toSeq))(
        Encoders.row(keySchema))
      .flatMapGroups { (key: Row, rows: Iterator[Row]) =>
        val sorted = rows.toIndexedSeq.sorted(rowOrd)
        Matcher.findMatchesSkip(sorted, tsOf, patB, skip)
          .iterator.zipWithIndex
          .map { case ((bindings, trace), i) =>
            Row.fromSeq(key.toSeq ++ Seq(i.toLong + 1) ++
              symbols.map(s => bindings.getOrElse(s, Seq.empty[Row])) :+
              trace.map { case (cls, j) => Row(cls, sorted(j)) })
          }
      }(Encoders.row(outSchema))

    // 3. MEASURES as declarative array expressions. ONE ROW PER MATCH
    // evaluates at the final row, where RUNNING == FINAL — both
    // keywords reduce to the plain rewrite. ALL ROWS PER MATCH
    // compiles RUNNING against the per-output-row prefix of the
    // ordered trace; unprefixed/FINAL measures see the whole match.
    def stripKeywords(e: String): String =
      e.replaceAll("(?i)\\b(RUNNING|FINAL)\\s+", "")
    val measureCols = spec.measures.map { case (e, alias) =>
      if (!spec.allRows) expr(rewriteMeasure(stripKeywords(e), symbols)).as(alias)
      else expr(rewriteMeasure(
        stripKeywords(rewriteRunning(e, symbols)), symbols)).as(alias)
    }
    if (!spec.allRows) {
      matched.select(spec.partitionBy.map(col) ++ measureCols: _*)
    } else {
      // ALL ROWS PER MATCH: one output row per matched event, in match
      // order, via posexplode of the ordered trace — the position __p
      // also drives RUNNING measures
      val exploded = matched
        .selectExpr("*", "posexplode(__m_all) AS (__p, __e)")
      val rowCols = inputCols.map(c => exploded(s"__e.r.$c").as(c))
      exploded.select(rowCols ++
        Seq(col("__e.classifier").as("classifier"),
          col("__match_num").as("match_num")) ++ measureCols: _*)
    }
  }
}
