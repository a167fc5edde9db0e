package graft.api

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicReference

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.cdc.ChangelogFormats

/** Embedded SQL gateway — the REST service surface of the reference's
  * flink-sql-gateway (docs/content/docs/dev/table/sql-gateway/rest.md:
  * open session → submit statement → poll operation → page results),
  * re-expressed over [[TableEnv.executeSql]] with zero dependencies
  * beyond the JDK HTTP server and the Jackson already on Spark's
  * classpath. Together with [[graft.SqlShell]] this closes the
  * service-layer surface: shell for humans, gateway for programs
  * (the reference's JDBC driver and sql-client gateway mode are both
  * thin clients of exactly this protocol).
  *
  * Protocol (v2 paths, the subset every client needs):
  *   - `GET  /api_versions`                       → {"versions":["V2"]}
  *   - `GET  /v2/info`                            → product/version
  *   - `POST /v2/sessions` {"properties":{..}}    → {"sessionHandle"}
  *   - `GET  /v2/sessions/{s}`                    → {"properties"}
  *   - `POST /v2/sessions/{s}/heartbeat`          → {}
  *   - `DELETE /v2/sessions/{s}`                  → {"status":"CLOSED"}
  *   - `POST /v2/sessions/{s}/statements` {"statement"} → {"operationHandle"}
  *   - `GET  /v2/sessions/{s}/operations/{o}/status`    → {"status"}
  *   - `GET  /v2/sessions/{s}/operations/{o}/result/{token}`
  *         → {"resultType","results":{"columns","data"},"nextResultUri"?}
  *   - `POST /v2/sessions/{s}/operations/{o}/cancel`
  *   - `DELETE /v2/sessions/{s}/operations/{o}/close`
  *
  * Semantics kept from the reference:
  *   - Sessions are ISOLATED catalogs: each runs on `spark.newSession()`
  *     (own temp views / conf, shared executors+cache), so DDL in one
  *     session is invisible to another — the gateway's whole point.
  *   - Statements run asynchronously; `status` walks RUNNING →
  *     FINISHED | ERROR | CANCELED, and an ERROR operation's result
  *     carries the message.
  *   - Results page by token; `nextResultUri` is present while more
  *     pages may come and absent at EOS (resultType "EOS").
  *   - Rows carry a changelog `kind`: a result with the library's
  *     `__row_kind` column surfaces it as the row kind (INSERT /
  *     UPDATE_BEFORE / UPDATE_AFTER / DELETE) instead of a payload
  *     column — the REST mirror of the reference's RowData kinds.
  *
  * Scale note: the gateway is a control-plane shim — result fetch is
  * explicitly BOUNDED (`sql-gateway.max-fetch-rows`, default 10k, a
  * session property) because an interactive protocol that pages an
  * unbounded 100 TB result through the driver is a broken design;
  * bulk output belongs to INSERT INTO a sink table, which streams
  * executor→storage and returns only a job acknowledgement here.
  */
final class SqlGateway(spark: SparkSession, port: Int = 0) {

  import SqlGateway._

  private val mapper = new ObjectMapper
  private val sessions = new ConcurrentHashMap[String, GwSession]()
  private val exec = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "sql-gateway-op"); t.setDaemon(true); t
  })
  private var server: HttpServer = _
  private var reaper: java.util.concurrent.ScheduledExecutorService = _

  def start(): SqlGateway = synchronized {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.setExecutor(Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "sql-gateway-http"); t.setDaemon(true); t
    }))
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.start()
    // idle-session reaper — the reference gateway's
    // sql-gateway.session.idle-timeout: a session untouched (no
    // statement, heartbeat or any other call) for longer than its
    // timeout is closed so abandoned clients can't pin temp views and
    // result buffers forever. Per-session override via the
    // SessionIdleTimeoutKey property; 0 disables for that session.
    reaper = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "sql-gateway-reaper"); t.setDaemon(true); t
    })
    reaper.scheduleWithFixedDelay(() => reapIdleSessions(),
      ReapPeriodMs, ReapPeriodMs, TimeUnit.MILLISECONDS)
    this
  }

  private[api] def reapIdleSessions(): Unit = {
    val now = System.nanoTime()
    sessions.forEach { (handle, s) =>
      val timeoutMs = s.properties.get(SessionIdleTimeoutKey)
        .flatMap(v => scala.util.Try(v.toLong).toOption)
        .getOrElse(DefaultSessionIdleTimeoutMs)
      if (timeoutMs > 0 && (now - s.lastAccess) / 1000000L > timeoutMs) {
        sessions.remove(handle)
        // reclaim in-flight work too: an abandoned session's running
        // statements must not keep burning cluster resources
        s.operations.forEach { (oh, op) =>
          if (op.status.compareAndSet("RUNNING", "CANCELED"))
            spark.sparkContext.cancelJobGroup(oh)
        }
      }
    }
  }

  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = synchronized {
    if (server != null) server.stop(0)
    if (reaper != null) reaper.shutdownNow()
    exec.shutdownNow()
    exec.awaitTermination(5, TimeUnit.SECONDS)
    sessions.clear()
  }

  // ---- routing ----

  private def handle(ex: HttpExchange): Unit =
    try {
      val segs = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
      val method = ex.getRequestMethod
      (method, segs) match {
        case ("GET", List("api_versions")) =>
          reply(ex, 200, obj(o => o.putArray("versions").add("V2")))
        case ("GET", List("v2", "info")) =>
          reply(ex, 200, obj { o =>
            o.put("productName", "graft-sql-gateway")
            o.put("version", spark.version)
          })
        case ("POST", List("v2", "sessions")) => openSession(ex)
        case (_, "v2" :: "sessions" :: sh :: rest) =>
          sessions.get(sh) match {
            case null => error(ex, 404, s"unknown session handle: $sh")
            case s =>
              s.lastAccess = System.nanoTime()
              (method, rest) match {
                case ("GET", Nil) =>
                  reply(ex, 200, obj { o =>
                    val p = o.putObject("properties")
                    s.properties.foreach { case (k, v) => p.put(k, v) }
                  })
                case ("DELETE", Nil) =>
                  sessions.remove(sh)
                  reply(ex, 200, obj(_.put("status", "CLOSED")))
                case ("POST", List("heartbeat")) => reply(ex, 200, obj(_ => ()))
                case ("POST", List("statements")) => submit(ex, s)
                case (_, "operations" :: oh :: opRest) =>
                  s.operations.get(oh) match {
                    case null => error(ex, 404, s"unknown operation handle: $oh")
                    case op => operation(ex, method, s, op, sh, oh, opRest)
                  }
                case _ => error(ex, 404, "no such endpoint")
              }
          }
        case _ => error(ex, 404, "no such endpoint")
      }
    } catch {
      case NonFatal(e) =>
        try error(ex, 500, s"${e.getClass.getSimpleName}: ${e.getMessage}")
        catch { case NonFatal(_) => () }
    } finally ex.close()

  private def openSession(ex: HttpExchange): Unit = {
    val body = readJson(ex)
    val props = Option(body.get("properties")).map { p =>
      p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty)
    val handle = UUID.randomUUID().toString
    val env = TableEnv(spark.newSession())
    props.foreach { case (k, v) => env.spark.conf.set(k, v) }
    sessions.put(handle, new GwSession(env, props))
    reply(ex, 200, obj(_.put("sessionHandle", handle)))
  }

  private def submit(ex: HttpExchange, s: GwSession): Unit = {
    val body = readJson(ex)
    Option(body.get("statement")).map(_.asText()) match {
      case None => error(ex, 400, "missing field: statement")
      case Some(stmt) => submitStatement(ex, s, stmt)
    }
  }

  private def submitStatement(ex: HttpExchange, s: GwSession,
      stmt: String): Unit = {
    val oh = UUID.randomUUID().toString
    val op = new GwOperation
    s.operations.put(oh, op)
    exec.submit(new Runnable {
      def run(): Unit =
        try {
          // per-operation job group: cancel/reap can abort the Spark
          // jobs, not just flip the status flag
          s.env.spark.sparkContext.setJobGroup(oh,
            s"sql-gateway operation $oh", interruptOnCancel = true)
          val df = s.env.executeSql(stmt)
          op.result = collectBounded(df, s)
          // only flip RUNNING → FINISHED; a concurrent cancel wins
          op.status.compareAndSet("RUNNING", "FINISHED")
        } catch {
          case NonFatal(e) =>
            op.errorMessage =
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
            op.status.compareAndSet("RUNNING", "ERROR")
        } finally s.env.spark.sparkContext.clearJobGroup()
    })
    reply(ex, 200, obj(_.put("operationHandle", oh)))
  }

  private def operation(ex: HttpExchange, method: String, s: GwSession,
      op: GwOperation, sh: String, oh: String, rest: List[String]): Unit =
    (method, rest) match {
      case ("GET", List("status")) =>
        reply(ex, 200, obj(_.put("status", op.status.get())))
      case ("POST", List("cancel")) =>
        if (op.status.compareAndSet("RUNNING", "CANCELED"))
          spark.sparkContext.cancelJobGroup(oh) // abort the running jobs
        reply(ex, 200, obj(_.put("status", op.status.get())))
      case ("DELETE", List("close")) =>
        // use the session already resolved in handle() — re-looking it
        // up raced the idle reaper (or a concurrent DELETE), turning an
        // idempotent close into a 500 NPE; close must stay CLOSED even
        // if the session vanished in between
        s.operations.remove(oh)
        reply(ex, 200, obj(_.put("status", "CLOSED")))
      case ("GET", List("result", tokenStr)) =>
        val token = try tokenStr.toInt catch {
          case _: NumberFormatException =>
            return error(ex, 400, s"bad result token: $tokenStr")
        }
        op.status.get() match {
          case "RUNNING" =>
            // not ready yet: NOT_READY + retry-at-same-token, the
            // reference's long-poll contract
            reply(ex, 200, obj { o =>
              o.put("resultType", "NOT_READY")
              o.put("nextResultUri", resultUri(sh, oh, token))
            })
          case "ERROR" =>
            reply(ex, 200, obj { o =>
              o.put("resultType", "EOS")
              o.put("resultKind", "ERROR")
              o.putArray("errors").add(op.errorMessage)
            })
          case "CANCELED" => error(ex, 400, "operation was canceled")
          case _ => resultPage(ex, op, sh, oh, token)
        }
      case _ => error(ex, 404, "no such endpoint")
    }

  private def resultPage(ex: HttpExchange, op: GwOperation, sh: String,
      oh: String, token: Int): Unit = {
    val res = op.result
    if (token < 0) return error(ex, 400, s"bad result token: $token")
    val from = token.toLong * res.pageSize
    // any token at-or-past the end is EOS (the last data page links one
    // token forward, so the terminal fetch always lands here)
    val eos = from >= res.rows.length
    val page =
      if (eos) Array.empty[(String, Array[Any])]
      else res.rows.slice(from.toInt, (from + res.pageSize).toInt)
    reply(ex, 200, obj { o =>
      o.put("resultType", if (eos) "EOS" else "PAYLOAD")
      o.put("resultKind",
        if (res.columns.isEmpty) "SUCCESS" else "SUCCESS_WITH_CONTENT")
      o.put("isQueryResult", res.columns.nonEmpty)
      o.put("truncated", res.truncated)
      val results = o.putObject("results")
      val cols = results.putArray("columns")
      res.columns.foreach { case (n, t) =>
        val c = cols.addObject(); c.put("name", n); c.put("logicalType", t)
      }
      val data = results.putArray("data")
      page.foreach { case (kind, fields) =>
        val r = data.addObject()
        r.put("kind", kind)
        val f = r.putArray("fields")
        fields.foreach(v => f.add(toNode(v)))
      }
      // the last data page still links forward; the follow-up fetch
      // returns EOS — matches the reference's fetch-until-EOS loop
      if (!eos) o.put("nextResultUri", resultUri(sh, oh, token + 1))
    })
  }

  private def resultUri(sh: String, oh: String, token: Int): String =
    s"/v2/sessions/$sh/operations/$oh/result/$token"

  // ---- result materialization (bounded by contract, see scaladoc) ----

  private def collectBounded(df: DataFrame, s: GwSession): GwResult = {
    def intProp(key: String, dflt: Int): Int =
      s.env.spark.conf.getOption(key)
        .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(dflt)
    val maxRows = intProp(MaxFetchRowsKey, DefaultMaxFetchRows)
    val pageSize = math.max(1, intProp(PageSizeKey, DefaultPageSize))
    if (df.schema.isEmpty)
      return GwResult(Nil, Array.empty, pageSize, truncated = false)
    val kindIdx = df.schema.fieldNames.indexOf(ChangelogFormats.RowKindCol)
    val cols = df.schema.fields.zipWithIndex
      .filter(_._2 != kindIdx)
      .map { case (f, _) => f.name -> f.dataType.sql }.toSeq
    val raw = df.limit(maxRows + 1).collect()
    val rows = raw.take(maxRows).map { row =>
      val kind =
        if (kindIdx < 0) "INSERT"
        else row.getString(kindIdx) match {
          case "+I" => "INSERT"
          case "-U" => "UPDATE_BEFORE"
          case "+U" => "UPDATE_AFTER"
          case "-D" => "DELETE"
          case other => other
        }
      val fields = row.toSeq.zipWithIndex
        .filter(_._2 != kindIdx).map(_._1).toArray
      (kind, fields)
    }
    GwResult(cols, rows, pageSize, truncated = raw.length > maxRows)
  }

  /** Spark values → JSON nodes (arrays/structs/maps recurse; temporal
    * and binary values go through their canonical string forms; map
    * keys stringify because JSON object keys must be strings). */
  private def toNode(v: Any): JsonNode = {
    val nf = mapper.getNodeFactory
    v match {
      case null => nf.nullNode()
      case b: Boolean => nf.booleanNode(b)
      case i: Int => nf.numberNode(i)
      case l: Long => nf.numberNode(l)
      case d: Double => nf.numberNode(d)
      case f: Float => nf.numberNode(f.toDouble)
      case s: Short => nf.numberNode(s.toInt)
      case b: Byte => nf.numberNode(b.toInt)
      case d: java.math.BigDecimal => nf.numberNode(d)
      case d: BigDecimal => nf.numberNode(d.bigDecimal)
      case b: Array[Byte] =>
        nf.textNode(java.util.Base64.getEncoder.encodeToString(b))
      case a: Array[_] =>
        val n = nf.arrayNode(); a.foreach(x => n.add(toNode(x))); n
      case s: Seq[_] =>
        val n = nf.arrayNode(); s.foreach(x => n.add(toNode(x))); n
      case m: Map[_, _] =>
        val n = nf.objectNode()
        m.foreach { case (k, mv) => n.set[JsonNode](String.valueOf(k), toNode(mv)) }
        n
      case r: Row =>
        val n = nf.arrayNode(); r.toSeq.foreach(x => n.add(toNode(x))); n
      case other => nf.textNode(String.valueOf(other))
    }
  }

  // ---- plumbing ----

  private def readJson(ex: HttpExchange): JsonNode = {
    val bytes = ex.getRequestBody.readAllBytes()
    if (bytes.isEmpty) mapper.createObjectNode()
    else mapper.readTree(bytes)
  }

  private def obj(fill: ObjectNode => Unit): ObjectNode = {
    val o = mapper.createObjectNode(); fill(o); o
  }

  private def reply(ex: HttpExchange, code: Int, body: ObjectNode): Unit = {
    val bytes = mapper.writeValueAsBytes(body)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os: OutputStream = ex.getResponseBody
    os.write(bytes); os.close()
  }

  private def error(ex: HttpExchange, code: Int, msg: String): Unit =
    reply(ex, code, obj(_.putArray("errors").add(msg)))
}

object SqlGateway {

  /** Session property: hard cap on rows materialized per statement. */
  val MaxFetchRowsKey = "sql-gateway.max-fetch-rows"
  val DefaultMaxFetchRows = 10000

  /** Session property: rows per result page. */
  val PageSizeKey = "sql-gateway.page-size"
  val DefaultPageSize = 1000

  /** Session property: close the session after this many ms without
    * any call (statement, heartbeat, …). 0 disables. */
  val SessionIdleTimeoutKey = "sql-gateway.session.idle-timeout-ms"
  val DefaultSessionIdleTimeoutMs: Long = 10L * 60 * 1000
  private[api] val ReapPeriodMs: Long = 10000

  private[api] final class GwSession(
      val env: TableEnv,
      val properties: Map[String, String]) {
    val operations = new ConcurrentHashMap[String, GwOperation]()
    @volatile var lastAccess: Long = System.nanoTime()
  }

  private[api] final class GwOperation {
    val status = new AtomicReference[String]("RUNNING")
    @volatile var result: GwResult = _
    @volatile var errorMessage: String = _
  }

  private[api] final case class GwResult(
      columns: Seq[(String, String)],
      rows: Array[(String, Array[Any])],
      pageSize: Int,
      truncated: Boolean)

  /** Standalone entry point: `sbt "runMain graft.api.SqlGateway 8083"`. */
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8083)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-sql-gateway")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gw = new SqlGateway(spark, port).start()
    println(s"graft SQL gateway listening on port ${gw.boundPort}")
    Thread.currentThread().join()
  }
}
