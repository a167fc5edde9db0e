package graft.jdbc

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.sql.SQLException

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Minimal REST client for the graft SQL gateway (the same v2 protocol
  * the reference's JDBC driver speaks to flink-sql-gateway:
  * flink-sql-jdbc-driver/.../FlinkConnection.java). JDK HTTP only — a
  * thin client must not drag the engine onto the classpath.
  *
  * One instance per JDBC connection; not thread-safe (JDBC objects are
  * confined to one thread by contract).
  *
  * Results are [[GwFetch]] values. */
/** One driven-to-completion statement's result: schema, all fetched
  * rows (bounded by the gateway's max-fetch-rows), whether it was a
  * query, and whether the gateway truncated the result at its cap. */
private[graft] final case class GwFetch(
    columns: Seq[(String, String)],
    rows: Vector[JsonNode],
    isQueryResult: Boolean,
    truncated: Boolean)

private[graft] final class GatewayClient(host: String, port: Int) {

  private val mapper = new ObjectMapper
  private val base = s"http://$host:$port"

  // ---- protocol calls ----

  def info(): JsonNode = http("GET", "/v2/info", null)

  def openSession(properties: Map[String, String]): String = {
    val body = mapper.createObjectNode()
    val p = body.putObject("properties")
    properties.foreach { case (k, v) => p.put(k, v) }
    http("POST", "/v2/sessions", body).get("sessionHandle").asText()
  }

  def closeSession(session: String): Unit =
    http("DELETE", s"/v2/sessions/$session", null)

  def submit(session: String, statement: String): String = {
    val body = mapper.createObjectNode()
    body.put("statement", statement)
    http("POST", s"/v2/sessions/$session/statements", body)
      .get("operationHandle").asText()
  }

  def status(session: String, op: String): String =
    http("GET", s"/v2/sessions/$session/operations/$op/status", null)
      .get("status").asText()

  def cancel(session: String, op: String): Unit =
    http("POST", s"/v2/sessions/$session/operations/$op/cancel",
      mapper.createObjectNode())

  def closeOperation(session: String, op: String): Unit =
    http("DELETE", s"/v2/sessions/$session/operations/$op/close", null)

  def heartbeat(session: String): Unit = {
    http("POST", s"/v2/sessions/$session/heartbeat",
      mapper.createObjectNode()); ()
  }

  /** Daemon keep-alive against the gateway's idle-session reaper — an
    * interactive client (JDBC connection, shell session) must outlive
    * user think-time. Returns a canceller. */
  def startHeartbeat(session: String, periodMs: Long = 60000L): () => Unit = {
    val t = new java.util.Timer("gateway-heartbeat", true)
    t.scheduleAtFixedRate(new java.util.TimerTask {
      def run(): Unit =
        try heartbeat(session) catch { case _: SQLException => () }
    }, periodMs, periodMs)
    () => t.cancel()
  }

  def fetch(session: String, op: String, token: Int): JsonNode =
    http("GET", s"/v2/sessions/$session/operations/$op/result/$token", null)

  /** Submit and drive to completion: poll status, then page results
    * until EOS. Throws SQLException carrying the gateway's error text
    * on ERROR, and SQLTimeoutException after `timeoutMs`
    * (0 = unbounded), cancelling the server-side operation first. The
    * operation is closed on every path — an errored statement must not
    * leak server-side state. */
  def execute(session: String, statement: String, timeoutMs: Long = 0L)
      : GwFetch = {
    val deadline =
      if (timeoutMs > 0) System.nanoTime() + timeoutMs * 1000000L
      else Long.MaxValue
    def checkDeadline(op: String): Unit =
      if (System.nanoTime() > deadline) {
        try cancel(session, op) catch { case _: SQLException => () }
        throw new java.sql.SQLTimeoutException(
          s"statement exceeded the query timeout (${timeoutMs}ms)")
      }
    val op = submit(session, statement)
    try {
      var st = status(session, op)
      while (st == "RUNNING") {
        checkDeadline(op)
        Thread.sleep(10)
        st = status(session, op)
      }
      if (st == "CANCELED")
        throw new SQLException("statement was canceled")
      var token = 0
      var columns = Seq.empty[(String, String)]
      var rows = Vector.empty[JsonNode]
      var isQuery = false
      var truncated = false
      var done = false
      // schema/flags appear on EVERY result page, including a bare EOS:
      // a zero-row SELECT gets EOS as its FIRST fetch, and dropping the
      // metadata there would misclassify the query as an update
      // (executeQuery() would then throw on a perfectly valid empty
      // result set). Parse them on both branches.
      def absorbMeta(page: JsonNode): Unit = {
        val res = if (page.has("results")) page.get("results") else null
        if (columns.isEmpty && res != null && res.has("columns")) {
          val it = res.get("columns").elements()
          val b = Seq.newBuilder[(String, String)]
          while (it.hasNext) {
            val c = it.next()
            b += c.get("name").asText() -> c.get("logicalType").asText()
          }
          columns = b.result()
        }
        if (page.has("isQueryResult"))
          isQuery = page.get("isQueryResult").asBoolean()
        if (page.has("truncated") && page.get("truncated").asBoolean())
          truncated = true
      }
      while (!done) {
        checkDeadline(op)
        val page = fetch(session, op, token)
        page.get("resultType").asText() match {
          case "NOT_READY" => Thread.sleep(10)
          case "EOS" =>
            if (page.has("errors") && page.get("errors").size() > 0)
              throw new SQLException(page.get("errors").get(0).asText())
            absorbMeta(page)
            done = true
          case _ => // PAYLOAD
            absorbMeta(page)
            val it = page.get("results").get("data").elements()
            while (it.hasNext) rows :+= it.next()
            if (!page.has("nextResultUri")) done = true else token += 1
        }
      }
      GwFetch(columns, rows, isQuery, truncated)
    } finally {
      try closeOperation(session, op) catch { case _: SQLException => () }
    }
  }

  // ---- plumbing ----

  /** All transport failures surface as SQLException — the JDBC
    * contract (Connection.isValid and friends catch SQLException; a
    * raw ConnectException escaping would break every standard tool's
    * error handling). */
  private def http(method: String, path: String, body: JsonNode): JsonNode =
    try http0(method, path, body)
    catch {
      case e: SQLException => throw e
      case scala.util.control.NonFatal(e) =>
        throw new SQLException(
          s"gateway transport failure ($method $path): ${e.getMessage}", e)
    }

  private def http0(method: String, path: String, body: JsonNode): JsonNode = {
    val conn = new URI(base + path).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(60000)
      if (body != null) {
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/json")
        val bytes = mapper.writeValueAsBytes(body)
        val os = conn.getOutputStream
        os.write(bytes); os.close()
      }
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val text =
        if (stream == null) "{}"
        else new String(stream.readAllBytes(), StandardCharsets.UTF_8)
      val node = mapper.readTree(text)
      if (code >= 400) {
        val msg =
          if (node.has("errors") && node.get("errors").size() > 0)
            node.get("errors").get(0).asText()
          else s"HTTP $code"
        throw new SQLException(s"gateway error: $msg")
      }
      node
    } finally conn.disconnect()
  }
}
