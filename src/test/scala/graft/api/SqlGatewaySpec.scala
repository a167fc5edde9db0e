package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.SparkSpec

/** Drives [[SqlGateway]] end-to-end over real HTTP on an ephemeral
  * port: version/info discovery, session open with properties, DDL +
  * query + paged fetch-until-EOS, changelog row kinds, error
  * operations, session isolation (the gateway's defining property),
  * and close semantics. */
class SqlGatewaySpec extends SparkSpec {

  private val mapper = new ObjectMapper
  private lazy val gw = new SqlGateway(spark).start()
  private lazy val base = s"http://127.0.0.1:${gw.boundPort}"
  private val client = HttpClient.newHttpClient()

  private def get(path: String): JsonNode = send("GET", path, null)
  private def delete(path: String): JsonNode = send("DELETE", path, null)
  private def post(path: String, body: String = ""): JsonNode =
    send("POST", path, body)

  private def send(method: String, path: String, body: String): JsonNode = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
    val req = (method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case _ => b.method(method,
        HttpRequest.BodyPublishers.ofString(Option(body).getOrElse("")))
    }).build()
    val resp = client.send(req,
      HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    val node = mapper.readTree(resp.body())
    assert(resp.statusCode() < 500, s"$method $path -> ${resp.body()}")
    node
  }

  /** Submit a statement and poll to a terminal status; returns
    * (operationHandle, status). */
  private def run(sh: String, stmt: String): (String, String) = {
    val body = mapper.createObjectNode()
    body.put("statement", stmt)
    val oh = post(s"/v2/sessions/$sh/statements",
      mapper.writeValueAsString(body)).get("operationHandle").asText()
    var status = "RUNNING"
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (status == "RUNNING" && System.nanoTime() < deadline) {
      status = get(s"/v2/sessions/$sh/operations/$oh/status")
        .get("status").asText()
      if (status == "RUNNING") Thread.sleep(20)
    }
    (oh, status)
  }

  /** Fetch all pages until EOS; returns (columnNames, rows as
    * (kind, fields-as-text)). */
  private def fetchAll(sh: String, oh: String)
      : (Seq[String], Seq[(String, Seq[String])], Int) = {
    var uri = s"/v2/sessions/$sh/operations/$oh/result/0"
    var cols = Seq.empty[String]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    var pages = 0
    var done = false
    while (!done) {
      val r = get(uri)
      r.get("resultType").asText() match {
        case "NOT_READY" => Thread.sleep(20); uri = r.get("nextResultUri").asText()
        case "EOS" => done = true
        case "PAYLOAD" =>
          pages += 1
          val res = r.get("results")
          cols = iter(res.get("columns")).map(_.get("name").asText())
          iter(res.get("data")).foreach { row =>
            rows += ((row.get("kind").asText(),
              iter(row.get("fields")).map(_.asText())))
          }
          uri = r.get("nextResultUri").asText()
      }
    }
    (cols, rows.toSeq, pages)
  }

  private def iter(n: JsonNode): Seq[JsonNode] = {
    val b = Seq.newBuilder[JsonNode]
    n.forEach(x => b += x)
    b.result()
  }

  private def openSession(props: (String, String)*): String = {
    val body = mapper.createObjectNode()
    val p = body.putObject("properties")
    props.foreach { case (k, v) => p.put(k, v) }
    post("/v2/sessions", mapper.writeValueAsString(body))
      .get("sessionHandle").asText()
  }

  test("api_versions and info discovery") {
    assert(iter(get("/api_versions").get("versions")).map(_.asText()) ==
      Seq("V2"))
    assert(get("/v2/info").get("productName").asText() == "graft-sql-gateway")
  }

  test("session lifecycle: open with properties, read back, heartbeat, close") {
    val sh = openSession("sql-gateway.page-size" -> "7")
    assert(get(s"/v2/sessions/$sh").get("properties")
      .get("sql-gateway.page-size").asText() == "7")
    post(s"/v2/sessions/$sh/heartbeat")
    assert(delete(s"/v2/sessions/$sh").get("status").asText() == "CLOSED")
    // closed session is gone
    val r = get(s"/v2/sessions/$sh")
    assert(r.has("errors"))
  }

  test("DDL + query + paged fetch until EOS") {
    val sh = openSession("sql-gateway.page-size" -> "4")
    val (_, st1) = run(sh,
      "CREATE VIEW nums AS SELECT id, id * id AS sq FROM range(10)")
    assert(st1 == "FINISHED")
    val (oh, st2) = run(sh, "SELECT id, sq FROM nums ORDER BY id")
    assert(st2 == "FINISHED")
    val (cols, rows, pages) = fetchAll(sh, oh)
    assert(cols == Seq("id", "sq"))
    assert(pages == 3) // 10 rows / page-size 4
    assert(rows.map(_._2) == (0 until 10).map(i => Seq(s"$i", s"${i * i}")))
    assert(rows.forall(_._1 == "INSERT"))
    delete(s"/v2/sessions/$sh")
  }

  test("DDL result is SUCCESS with no content; max-fetch-rows truncates") {
    val sh = openSession(SqlGateway.MaxFetchRowsKey -> "5")
    val (oh, st) = run(sh, "CREATE VIEW v1 AS SELECT 1 AS one")
    assert(st == "FINISHED")
    val first = get(s"/v2/sessions/$sh/operations/$oh/result/0")
    assert(first.get("resultType").asText() == "EOS")
    assert(first.get("resultKind").asText() == "SUCCESS")
    assert(!first.get("isQueryResult").asBoolean())
    val (oh2, _) = run(sh, "SELECT id FROM range(100)")
    val r = get(s"/v2/sessions/$sh/operations/$oh2/result/0")
    assert(r.get("truncated").asBoolean())
    assert(iter(r.get("results").get("data")).size == 5)
    delete(s"/v2/sessions/$sh")
  }

  test("changelog __row_kind surfaces as REST row kinds") {
    val sh = openSession()
    val (oh, st) = run(sh,
      """SELECT * FROM VALUES
        |  ('+I', 1), ('-U', 1), ('+U', 2), ('-D', 2)
        |  AS t(__row_kind, v)""".stripMargin)
    assert(st == "FINISHED")
    val (cols, rows, _) = fetchAll(sh, oh)
    assert(cols == Seq("v")) // kind column lifted out of the payload
    assert(rows == Seq("INSERT" -> Seq("1"), "UPDATE_BEFORE" -> Seq("1"),
      "UPDATE_AFTER" -> Seq("2"), "DELETE" -> Seq("2")))
    delete(s"/v2/sessions/$sh")
  }

  test("error statement: ERROR status and message in result") {
    val sh = openSession()
    val (oh, st) = run(sh, "SELECT * FROM does_not_exist_42")
    assert(st == "ERROR")
    val r = get(s"/v2/sessions/$sh/operations/$oh/result/0")
    assert(r.get("resultKind").asText() == "ERROR")
    assert(iter(r.get("errors")).nonEmpty)
    delete(s"/v2/sessions/$sh")
  }

  test("sessions are isolated catalogs") {
    val a = openSession()
    val b = openSession()
    val (_, st) = run(a, "CREATE VIEW only_in_a AS SELECT 42 AS x")
    assert(st == "FINISHED")
    val (_, stA) = run(a, "SELECT x FROM only_in_a")
    assert(stA == "FINISHED")
    val (_, stB) = run(b, "SELECT x FROM only_in_a")
    assert(stB == "ERROR") // invisible across sessions
    delete(s"/v2/sessions/$a"); delete(s"/v2/sessions/$b")
  }

  test("idle sessions are reaped per their timeout; heartbeat keeps alive") {
    val dying = openSession(SqlGateway.SessionIdleTimeoutKey -> "1")
    val immortal = openSession(SqlGateway.SessionIdleTimeoutKey -> "0")
    val living = openSession() // default 10 min — untouched by the reap
    Thread.sleep(10) // > the 1ms timeout
    post(s"/v2/sessions/$living/heartbeat")
    gw.reapIdleSessions() // deterministic direct tick (no 10s wait)
    assert(get(s"/v2/sessions/$dying").has("errors"), "idle session kept")
    assert(!get(s"/v2/sessions/$immortal").has("errors"), "0 must disable")
    assert(!get(s"/v2/sessions/$living").has("errors"))
    delete(s"/v2/sessions/$immortal"); delete(s"/v2/sessions/$living")
  }

  test("operation close removes the handle; unknown handles 404") {
    val sh = openSession()
    val (oh, _) = run(sh, "SELECT 1 AS c")
    assert(delete(s"/v2/sessions/$sh/operations/$oh/close")
      .get("status").asText() == "CLOSED")
    assert(get(s"/v2/sessions/$sh/operations/$oh/status").has("errors"))
    assert(get(s"/v2/sessions/$sh/operations/nope/status").has("errors"))
    assert(get(s"/v2/sessions/nope/operations/x/status").has("errors"))
    delete(s"/v2/sessions/$sh")
  }

  test("N parallel sessions: interleaved DDL + paged fetches stay isolated under load") {
    // the reference gateway is a multi-session service
    // (flink-sql-gateway): drive 8 concurrent sessions over real HTTP,
    // each creating session-local views, paging multi-page results
    // (page-size 7 forces pagination), heartbeating, and probing the
    // OTHER sessions' views — every cross-session probe must ERROR and
    // every own-view read must return the session's private value.
    val n = 8
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val handles = new java.util.concurrent.CopyOnWriteArrayList[String]
    val ready = new java.util.concurrent.CountDownLatch(n)
    val go = new java.util.concurrent.CountDownLatch(1)
    def check(cond: Boolean, msg: => String): Unit =
      if (!cond) errors.add(msg)
    val threads = (0 until n).map { i =>
      new Thread(() => {
        try {
          val sh = openSession(SqlGateway.PageSizeKey -> "7")
          handles.add(sh)
          ready.countDown()
          go.await() // maximize interleaving: all sessions start together
          val (_, stDdl) = run(sh,
            s"CREATE VIEW secret_$i AS SELECT ${i * 1000} AS v")
          check(stDdl == "FINISHED", s"[$i] DDL: $stDdl")
          // multi-page fetch: 30 rows / page-size 7 -> 5 pages
          val (ohR, stR) = run(sh,
            s"SELECT id + ${i * 100} AS x FROM range(30) ORDER BY id")
          check(stR == "FINISHED", s"[$i] range: $stR")
          val (cols, rows, pages) = fetchAll(sh, ohR)
          check(cols == Seq("x"), s"[$i] cols: $cols")
          check(pages >= 5, s"[$i] expected >=5 pages, got $pages")
          check(rows.map(_._2.head.toInt) == (0 until 30).map(_ + i * 100),
            s"[$i] paged rows wrong/interleaved")
          post(s"/v2/sessions/$sh/heartbeat")
          // own view: private value; every OTHER session's view: ERROR
          val (ohV, stV) = run(sh, s"SELECT v FROM secret_$i")
          check(stV == "FINISHED", s"[$i] own view: $stV")
          check(fetchAll(sh, ohV)._2.map(_._2.head) == Seq(s"${i * 1000}"),
            s"[$i] own view value")
          for (j <- 0 until n if j != i) {
            val (_, stX) = run(sh, s"SELECT v FROM secret_$j")
            check(stX == "ERROR", s"[$i] sees session $j's view")
          }
          check(delete(s"/v2/sessions/$sh").get("status").asText()
            == "CLOSED", s"[$i] close")
        } catch {
          case t: Throwable => errors.add(s"[$i] threw: $t")
        }
      })
    }
    threads.foreach(_.start())
    ready.await()
    go.countDown()
    threads.foreach(_.join(120000))
    check(threads.forall(!_.isAlive), "worker threads hung")
    assert(errors.isEmpty, errors.toArray.mkString("\n"))
  }
}
