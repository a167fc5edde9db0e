package graft.api

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions.col

/** SQL-text binding for `CURRENT_WATERMARK(rowtime)` — reference:
  * BuiltInFunctionDefinitions.CURRENT_WATERMARK (flink-table-common)
  * and the docs' systemFunctions.md entry. The reference evaluates it
  * per row inside the operator that processes the row; the Spark
  * materialization is [[graft.streaming.Watermarks.withCurrentWatermarkTws]]
  * (a zero-state `transformWithState` pass-through whose TimerValues
  * expose the operator-held watermark per micro-batch).
  *
  * Rewrite shape: the FROM table's streaming read is annotated with a
  * `__wm_ms` column by the pass-through operator and registered as a
  * temp view; `CURRENT_WATERMARK(rowtime)` becomes a CASE over that
  * column (watermark 0 — Spark's "not yet advanced" — maps to NULL,
  * the reference's no-watermark-yet value), and the rest of the query
  * runs unchanged through the dialect translator against the view.
  *
  * Boundaries, enforced with pointed errors exactly like the
  * reference's validator: the argument must be the table's declared
  * WATERMARK column (the reference requires a rowtime attribute), and
  * the table must be a registered streaming table — batch tables have
  * no watermark to observe. Requires the RocksDB state store provider
  * (as all transformWithState operators do); the single-table FROM is
  * the supported scope (joins would need one annotation per input,
  * which the reference also materializes per-operator).
  */
object CurrentWatermarkSql {

  private val Fn = """(?i)\bCURRENT_WATERMARK\s*\(\s*([\w.]+)\s*\)""".r
  private val From = """(?is)\bFROM\s+([A-Za-z_]\w*)""".r

  def matches(sql: String): Boolean = Fn.findFirstIn(sql).isDefined

  /** Blank out string literals ('…' with '' escapes) and comments
    * (-- … EOL, bracketed) so keyword scans don't fire inside them —
    * a literal like 'copied from x' is not a FROM clause. Lengths are
    * preserved so match positions stay valid against the original. */
  private def maskLiterals(sql: String): String = {
    val out = sql.toCharArray
    var i = 0
    while (i < out.length) {
      out(i) match {
        case '\'' =>
          out(i) = ' '; i += 1
          var done = false
          while (!done && i < out.length) {
            if (out(i) == '\'') {
              if (i + 1 < out.length && out(i + 1) == '\'') {
                out(i) = ' '; out(i + 1) = ' '; i += 2 // '' escape
              } else { out(i) = ' '; i += 1; done = true }
            } else { out(i) = ' '; i += 1 }
          }
        case '-' if i + 1 < out.length && out(i + 1) == '-' =>
          while (i < out.length && out(i) != '\n') { out(i) = ' '; i += 1 }
        case '/' if i + 1 < out.length && out(i + 1) == '*' =>
          out(i) = ' '; out(i + 1) = ' '; i += 2
          var done = false
          while (!done && i < out.length) {
            if (out(i) == '*' && i + 1 < out.length &&
                out(i + 1) == '/') { out(i) = ' '; out(i + 1) = ' '
              i += 2; done = true }
            else { out(i) = ' '; i += 1 }
          }
        case _ => i += 1
      }
    }
    new String(out)
  }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Positions of CLAUSE-level FROM keywords in the masked text. A
    * FROM whose innermost enclosing paren is a function call —
    * SUBSTRING(x FROM 1 FOR 2), EXTRACT(HOUR FROM ts),
    * TRIM(BOTH ' ' FROM x) — is expression syntax, not a table
    * clause, and must not trip the single-input gate; a paren whose
    * first token is SELECT opens a subquery, whose FROM IS a clause
    * (scalar subqueries and derived tables still count and reject). */
  private def clauseFromPositions(masked: String): List[Int] = {
    val out = scala.collection.mutable.ListBuffer[Int]()
    var stack = List.empty[Boolean] // true = function-call paren
    var i = 0
    val n = masked.length
    while (i < n) {
      val c = masked(i)
      if (c == '(') {
        var j = i + 1
        while (j < n && masked(j).isWhitespace) j += 1
        val subquery = masked.regionMatches(true, j, "select", 0, 6) &&
          (j + 6 >= n || !isWordChar(masked(j + 6)))
        stack = !subquery :: stack
        i += 1
      } else if (c == ')') {
        if (stack.nonEmpty) stack = stack.tail
        i += 1
      } else if ((c == 'f' || c == 'F') &&
          masked.regionMatches(true, i, "from", 0, 4) &&
          (i == 0 || !isWordChar(masked(i - 1))) &&
          (i + 4 >= n || !isWordChar(masked(i + 4)))) {
        if (stack.isEmpty || !stack.head) out += i
        i += 4
      } else i += 1
    }
    out.toList
  }

  def execute(env: TableEnv, sql: String): DataFrame = {
    val argsRaw = Fn.findAllMatchIn(sql).map(_.group(1)).toList
    // single-table scope, enforced POINTEDLY: a query with several
    // FROM clauses (scalar subquery, derived table) or a JOIN would
    // otherwise have its first textual FROM picked by accident — the
    // reference materializes the watermark per-operator, and this
    // binding supports exactly one streaming input. Keywords are
    // counted over the literal/comment-masked text so 'copied from
    // legacy' or -- join notes don't trip the validator, and only
    // clause-level FROMs count (scalar-function FROM syntax passes).
    val masked = maskLiterals(sql)
    val fromPositions = clauseFromPositions(masked)
    if (fromPositions.size > 1)
      throw new IllegalArgumentException(
        "CURRENT_WATERMARK: the SQL binding supports a single-table " +
          s"FROM, but the query has ${fromPositions.size} FROM clauses " +
          "(subquery/derived table) — materialize the watermark on " +
          "the one streaming input and join afterwards")
    if ("""(?i)\bJOIN\b""".r.findFirstIn(masked).isDefined)
      throw new IllegalArgumentException(
        "CURRENT_WATERMARK: the SQL binding supports a single-table " +
          "FROM — JOIN inputs each hold their own operator watermark; " +
          "annotate the streaming side first, then join the views")
    val table = fromPositions.headOption.flatMap { p =>
      From.findPrefixMatchOf(masked.substring(p)).map(_.group(1))
    }.getOrElse(
      throw new IllegalArgumentException(
        "CURRENT_WATERMARK: no FROM <table> found — the function " +
          "observes a streaming table's operator watermark"))
    val spec = env.tableSpec(table).getOrElse(
      throw new IllegalArgumentException(
        s"CURRENT_WATERMARK: $table is not a registered table (batch " +
          "views carry no watermark; reference requires a rowtime " +
          "attribute)"))
    val wmCol = spec.watermark.map(_._1).getOrElse(
      throw new IllegalArgumentException(
        s"CURRENT_WATERMARK: table $table declares no WATERMARK — " +
          "the argument must be a rowtime attribute (reference " +
          "CurrentWatermarkTypeStrategy)"))
    // EVERY occurrence must name the watermark column (Spark
    // identifiers resolve case-insensitively, so the check does too) —
    // a second call on a different column would otherwise be silently
    // rewritten to the same annotation
    for (argRaw <- argsRaw) {
      val arg = argRaw.substring(argRaw.lastIndexOf('.') + 1)
      if (!arg.equalsIgnoreCase(wmCol))
        throw new IllegalArgumentException(
          s"CURRENT_WATERMARK($argRaw): the argument must be $table's " +
            s"declared watermark column $wmCol")
    }

    val base = env.fromStreaming(table)
    val schema = base.schema
    implicit val rowEnc: Encoder[Row] = Encoders.row(schema)
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[(Row, Long)] =
      Encoders.tuple(rowEnc, Encoders.scalaLong)
    val idx = schema.fieldIndex(wmCol)
    // key by event time: semantically any key works (the annotation is
    // operator-global), event time spreads the shuffle at scale
    val annotated = graft.streaming.Watermarks
      .withCurrentWatermarkTws[Long, Row](base, { r =>
        val ts = r.getAs[java.sql.Timestamp](idx)
        if (ts == null) 0L else ts.getTime
      })
    val view = s"${table}__current_wm"
    annotated.toDF("value", "__wm_ms")
      .select(col("value.*"), col("__wm_ms"))
      .createOrReplaceTempView(view)
    val wmExpr = "(CASE WHEN __wm_ms <= 0 THEN CAST(NULL AS TIMESTAMP) " +
      "ELSE timestamp_millis(__wm_ms) END)"
    val rewritten = Fn
      .replaceAllIn(sql, scala.util.matching.Regex.quoteReplacement(wmExpr))
      .replaceAll(s"(?i)\\bFROM\\s+$table\\b", s"FROM $view")
    env.spark.sql(FlinkSqlDialect.translate(rewritten))
  }
}
