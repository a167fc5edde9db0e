package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.TableEnv

/** Minimal interactive SQL client over [[graft.api.TableEnv.executeSql]]
  * — the embedded counterpart of the reference's sql-client
  * (flink-table/flink-sql-client: read statements terminated by `;`,
  * execute, render an ASCII result table). This is the surface most
  * reference users touch first; everything it runs is the library's
  * existing statement set (DDL WITH connectors, INSERT, statement sets,
  * SET/RESET, SHOW/DESCRIBE/EXPLAIN, MATCH_RECOGNIZE, lookup/temporal
  * joins, ...).
  *
  * Usage:
  *   sbt "runMain graft.SqlShell"            # REPL on stdin (embedded)
  *   sbt "runMain graft.SqlShell -f q.sql"   # run a script file
  *   sbt "runMain graft.SqlShell --endpoint host:port [-f q.sql]"
  *     # GATEWAY MODE: the reference sql-client's second mode — a thin
  *     # client of a running graft.api.SqlGateway (no local
  *     # SparkSession at all; statements run in a remote session,
  *     # results page back over the REST protocol)
  *
  * Statement grammar mirrors sql-client: a statement ends at a `;`
  * outside quotes; `EXECUTE STATEMENT SET BEGIN ... END;` is one
  * statement (the inner `;` do not terminate). `QUIT;`/`EXIT;` leave
  * the shell; `HELP;` lists the statement families.
  */
object SqlShell {

  /** Max rows rendered per result (the full DataFrame still executes);
    * overridable per session via SET 'sql-client.display.max-rows'. */
  val DefaultMaxRows = 100

  def main(args: Array[String]): Unit = {
    // flags mirror the reference client: --endpoint (gateway mode),
    // -i init-file (runs first, session continues), -f script
    var endpoint: Option[String] = None
    var initFile: Option[String] = None
    var script: Option[String] = None
    val usage = "usage: SqlShell [--endpoint host[:port]] [-i init.sql] [-f script.sql]"
    var a = args.toList
    while (a.nonEmpty) a = a match {
      case "--endpoint" :: ep :: t => endpoint = Some(ep); t
      case "-i" :: p :: t => initFile = Some(p); t
      case flag @ ("--endpoint" | "-i" | "-f") :: Nil =>
        throw new IllegalArgumentException(
          s"missing value for ${flag.head}\n$usage")
      case "-f" :: p :: t => script = Some(p); t
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown argument: $other\n$usage")
      case Nil => Nil
    }
    val tail = script match {
      case Some(path) => new java.io.FileReader(path)
      case None => new InputStreamReader(System.in)
    }
    // init statements simply prefix the input stream — same statement
    // grammar, same error recovery, then the session continues
    val in = new BufferedReader(initFile match {
      case Some(p) =>
        val init = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
        new SeqReader(Seq(new java.io.StringReader(init + "\n"), tail))
      case None => tail
    })
    val out = new PrintWriter(System.out, true)
    val interactive = script.isEmpty && System.console() != null
    endpoint match {
      case Some(ep) =>
        val (host, port) = ep.split(":", 2) match {
          case Array(h, p) =>
            (h, try p.toInt catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"bad port in --endpoint '$ep'\n$usage")
            })
          case Array(h) => (h, 8083)
        }
        try runGateway(host, port, in, out, prompt = interactive)
        finally in.close()
      case None =>
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
          .appName("graft-sql-shell")
          .config("spark.sql.shuffle.partitions", 8)
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        try run(spark, in, out, prompt = interactive)
        finally { in.close(); spark.stop() }
    }
  }

  /** Gateway mode: one remote session, statements over the REST
    * protocol, rows rendered from the gateway's JSON. Factored for
    * tests. */
  def runGateway(host: String, port: Int, in: BufferedReader,
      out: PrintWriter, prompt: Boolean = false): Unit = {
    val client = new graft.jdbc.GatewayClient(host, port)
    val session = client.openSession(Map.empty)
    // keep-alive: the gateway reaps idle sessions; an interactive
    // shell must survive user think-time
    val stopHeartbeat = client.startHeartbeat(session)
    if (prompt) out.println(
      s"graft SQL shell (gateway $host:$port) — statements end with ';'")
    try loop(in, out, prompt) { stmt =>
      val t0 = System.nanoTime()
      val fetch = client.execute(session, stmt)
      renderRemote(fetch, out, ((System.nanoTime() - t0) / 1e6).round)
    } finally {
      stopHeartbeat()
      try client.closeSession(session)
      catch { case NonFatal(_) => () }
    }
  }

  /** ASCII table over the gateway's (columns, JSON rows); DDL results
    * (no columns) print OK. A changelog result (any row kind other
    * than INSERT) gets a leading `op` column with the +I/-U/+U/-D
    * shorthand, like the reference client's changelog display. */
  private def renderRemote(fetch: graft.jdbc.GwFetch,
      out: PrintWriter, ms: Long): Unit = {
    val cols = fetch.columns
    if (cols.isEmpty) { out.println(s"[INFO] OK (${ms} ms)"); return }
    val shown = fetch.rows.take(DefaultMaxRows)
    val displayTruncated = fetch.rows.length > DefaultMaxRows
    val kinds = shown.map(r =>
      Option(r.get("kind")).map(_.asText()).getOrElse("INSERT"))
    val showKind = kinds.exists(_ != "INSERT")
    val shorthand = Map("INSERT" -> "+I", "UPDATE_BEFORE" -> "-U",
      "UPDATE_AFTER" -> "+U", "DELETE" -> "-D")
    val headers =
      (if (showKind) Seq("op") else Nil) ++ cols.map(_._1)
    val cells = shown.zip(kinds).map { case (r, k) =>
      val fields = (0 until cols.length).map { i =>
        val n = r.get("fields").get(i)
        if (n == null || n.isNull) "NULL"
        else if (n.isTextual) n.asText()
        else n.toString
      }
      (if (showKind) Seq(shorthand.getOrElse(k, k)) else Nil) ++ fields
    }
    printTable(headers, cells, out)
    val label =
      if (fetch.truncated)
        s"first ${shown.length} rows (result truncated at the gateway's fetch cap)"
      else if (displayTruncated) s"first ${shown.length} rows"
      else s"${shown.length} rows"
    out.println(s"[INFO] $label (${ms} ms)")
  }

  /** Shared statement-reading loop (embedded and gateway modes). */
  private def loop(in: BufferedReader, out: PrintWriter, prompt: Boolean)(
      execStmt: String => Unit): Unit = {
    val buf = new StringBuilder
    var done = false
    def exec(stmt: String): Unit = stmt.trim.toUpperCase match {
      case "" => ()
      case "QUIT" | "EXIT" => done = true
      case "HELP" => out.println(help)
      case _ =>
        try execStmt(stmt.trim)
        catch {
          case NonFatal(e) =>
            out.println(s"[ERROR] ${e.getClass.getSimpleName}: " +
              s"${Option(e.getMessage).getOrElse("").linesIterator
                .take(4).mkString(" / ")}")
        }
    }
    while (!done) {
      if (prompt && buf.isEmpty) { out.print("graft> "); out.flush() }
      val line = in.readLine()
      if (line == null) {
        if (buf.toString.trim.nonEmpty) exec(buf.toString)
        done = true
      } else {
        buf.append(line).append('\n')
        val (stmts, leftover) = splitStatements(buf.toString)
        buf.clear(); buf.append(leftover)
        stmts.foreach(st => if (!done) exec(st))
      }
    }
  }

  /** Drive a full session: read statements, execute, render. Factored
    * for tests — feed any reader/writer. */
  def run(spark: SparkSession, in: BufferedReader, out: PrintWriter,
      prompt: Boolean = false): Unit = {
    val env = TableEnv(spark)
    if (prompt) out.println(
      "graft SQL shell — statements end with ';', QUIT; exits, HELP; helps")
    loop(in, out, prompt) { stmt =>
      val t0 = System.nanoTime()
      val df = env.executeSql(stmt)
      render(env, df, out, ((System.nanoTime() - t0) / 1e6).round)
    }
  }

  /** Split buffered input into complete `;`-terminated statements plus
    * the unterminated leftover. Quote-aware (single AND double quotes,
    * backslash escapes), `--` line comments ignored, and a statement
    * set — bare or wrapped in COMPILE [AND EXECUTE] PLAN ... FOR — only
    * terminates at the `;` following its END, so inner `;` never split
    * it. Multiple statements on one line split correctly. */
  private[graft] def splitStatements(input: String): (Seq[String], String) = {
    def noComments(t: String): String = t.replaceAll("(?m)--[^\n]*", "")
    def isSetStart(from: Int): Boolean =
      ("""(?is)^\s*(COMPILE\s+(AND\s+EXECUTE\s+)?PLAN\s+""" +
        """(IF\s+NOT\s+EXISTS\s+)?'[^']*'\s+FOR\s+)?""" +
        """EXECUTE\s+STATEMENT\s+SET\b""").r
        .findFirstIn(noComments(input.substring(from))).isDefined
    val stmts = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    var quote: Char = 0
    var inSet = isSetStart(0)
    while (i < input.length) {
      val c = input.charAt(i)
      if (quote != 0) {
        if (c == '\\') i += 1 // escaped char inside a literal
        else if (c == quote) quote = 0
        i += 1
      } else if (c == '\'' || c == '"') { quote = c; i += 1 }
      else if (c == '-' && i + 1 < input.length && input.charAt(i + 1) == '-') {
        while (i < input.length && input.charAt(i) != '\n') i += 1
      } else if (c == ';') {
        val body = input.substring(start, i)
        val terminates = !inSet ||
          "(?is).*\\bEND\\s*$".r.pattern
            .matcher(noComments(body)).matches()
        if (terminates) {
          if (body.trim.nonEmpty) stmts += body
          start = i + 1
          inSet = isSetStart(start)
        }
        i += 1
      } else i += 1
    }
    (stmts.toSeq, input.substring(start))
  }

  private def maxRows(df: DataFrame): Int =
    df.sparkSession.conf.getOption("sql-client.display.max-rows")
      .flatMap(v => scala.util.Try(v.toInt).toOption)
      .getOrElse(DefaultMaxRows)

  /** Flink-style ASCII table; empty-schema results print OK (DDL). */
  private def render(env: TableEnv, df: DataFrame, out: PrintWriter,
      ms: Long): Unit = {
    if (df.schema.isEmpty) { out.println(s"[INFO] OK (${ms} ms)"); return }
    val cap = maxRows(df)
    val rows = df.limit(cap + 1).collect()
    val truncated = rows.length > cap
    val shown = rows.take(cap)
    val headers = df.schema.fieldNames.toSeq
    val cells = shown.map(_.toSeq.map {
      case null => "NULL"
      case a: Array[_] => a.mkString("[", ", ", "]")
      case s: Seq[_] => s.mkString("[", ", ", "]")
      case v => v.toString
    })
    printTable(headers, cells, out)
    val n = if (truncated) s"first $cap rows" else s"${shown.length} rows"
    out.println(s"[INFO] $n (${ms} ms)")
  }

  /** Concatenates readers (init file + interactive/script input). */
  private final class SeqReader(readers: Seq[java.io.Reader])
      extends java.io.Reader {
    private val it = readers.iterator
    private var cur: java.io.Reader = if (it.hasNext) it.next() else null
    override def read(cbuf: Array[Char], off: Int, len: Int): Int = {
      while (cur != null) {
        val n = cur.read(cbuf, off, len)
        if (n >= 0) return n
        cur.close()
        cur = if (it.hasNext) it.next() else null
      }
      -1
    }
    override def close(): Unit = readers.foreach(r =>
      try r.close() catch { case _: java.io.IOException => () })
  }

  private def printTable(headers: Seq[String], cells0: Seq[Seq[String]],
      out: PrintWriter): Unit = {
    val cells = cells0.map(_.map(c =>
      if (c.length > 64) c.take(61) + "..." else c))
    val widths = headers.indices.map { i =>
      (headers(i).length +: cells.map(_(i).length)).max
    }
    def line(ch: String) =
      widths.map(w => ch * (w + 2)).mkString("+", "+", "+")
    def fmt(vals: Seq[String]) =
      vals.zip(widths).map { case (v, w) => " " + v.padTo(w, ' ') + " " }
        .mkString("|", "|", "|")
    out.println(line("-"))
    out.println(fmt(headers))
    out.println(line("-"))
    cells.foreach(r => out.println(fmt(r)))
    out.println(line("-"))
  }

  private val help: String =
    """Statements (executed via TableEnv.executeSql):
      |  CREATE TABLE t (...) WITH ('connector'='filesystem','path'=...,'format'='parquet');
      |  CREATE VIEW v AS SELECT ...;   DROP TABLE t;   SHOW TABLES;
      |  DESCRIBE t;   SHOW CREATE TABLE t;   EXPLAIN SELECT ...;
      |  SELECT ... ;                        -- any query the library supports
      |  INSERT INTO t SELECT ...;           -- batch sink write
      |  EXECUTE STATEMENT SET BEGIN INSERT ...; INSERT ...; END;
      |  SET 'key' = 'value';   RESET 'key';   SET;
      |  ANALYZE TABLE t COMPUTE STATISTICS;  SHOW JOBS;  QUIT;""".stripMargin
}
