package graft.core

import java.net.{HttpURLConnection, InetSocketAddress, URI}
import java.nio.charset.StandardCharsets

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Confluent-style schema-registry REST surface — the subset the
  * avro-confluent wire format needs (reference:
  * flink-formats/flink-avro-confluent-registry,
  * RegistryAvroDeserializationSchema + ConfluentSchemaRegistryCoder):
  * register a schema under a subject and resolve a schema by global id.
  * JDK HTTP + jackson only (the [[graft.jdbc.GatewayClient]] pattern) —
  * a payload codec must not drag an SDK onto the executor classpath.
  *
  * Endpoints spoken (public Confluent REST API):
  *  - POST /subjects/{subject}/versions  {"schema": "..."} -> {"id": N}
  *  - GET  /schemas/ids/{id}             -> {"schema": "..."}
  */
final class SchemaRegistryClient(baseUrl: String) extends Serializable {
  import SchemaRegistryClient._

  /** Register (idempotent: the registry dedupes identical schemas per
    * subject) and return the GLOBAL schema id. Cached per (url,
    * subject, schema) in this JVM — executors register once, not once
    * per task. */
  def register(subject: String, schemaJson: String): Int =
    // lock, don't getOrElseUpdate: TrieMap may evaluate a racing update
    // function more than once, and concurrent partition starts would
    // each fire the HTTP call; registry traffic is rare enough that a
    // coarse lock is the right trade
    idCache.synchronized {
      if (idCache.size >= MaxCacheEntries) idCache.clear()
      idCache.getOrElseUpdate((baseUrl, subject, schemaJson), {
        val mapper = new ObjectMapper
        val body = mapper.createObjectNode()
        body.put("schema", schemaJson)
        val resp = http("POST", s"/subjects/$subject/versions",
          mapper.writeValueAsBytes(body))
        mapper.readTree(resp).get("id").asInt()
      })
    }

  /** Resolve a writer schema by global id. Cached per (url, id) in
    * this JVM — the confluent deserializer's cache discipline: one
    * fetch per schema per executor, NOT per record. */
  def schemaById(id: Int): String =
    schemaCache.synchronized {
      if (schemaCache.size >= MaxCacheEntries) schemaCache.clear()
      schemaCache.getOrElseUpdate((baseUrl, id), {
        val mapper = new ObjectMapper
        val resp = http("GET", s"/schemas/ids/$id", null)
        mapper.readTree(resp).get("schema").asText()
      })
    }

  private def http(method: String, path: String, body: Array[Byte]): String = {
    val conn = new URI(baseUrl + path).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      if (body != null) {
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type",
          "application/vnd.schemaregistry.v1+json")
        val os = conn.getOutputStream
        os.write(body); os.close()
      }
      val code = conn.getResponseCode
      val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val text = if (stream == null) ""
        else new String(stream.readAllBytes(), StandardCharsets.UTF_8)
      if (code >= 400) throw new java.io.IOException(
        s"schema registry $method $path failed: HTTP $code $text")
      text
    } finally conn.disconnect()
  }
}

object SchemaRegistryClient {
  // JVM-wide caches (shared by all tasks in an executor). Bounded with
  // a cap-and-clear (entries are small strings but the registry key
  // space is open-ended — a long-lived executor over many topics must
  // not grow them without limit; a clear just re-fetches once).
  private val MaxCacheEntries = 10000
  private val idCache = TrieMap.empty[(String, String, String), Int]
  private val schemaCache = TrieMap.empty[(String, Int), String]
  /** Test hook: drop caches so a spec observes real HTTP traffic. */
  private[graft] def clearCaches(): Unit = { idCache.clear(); schemaCache.clear() }
}

/** In-process schema registry speaking the same two endpoints — the
  * stub-server test double (the reference's registry tests run against
  * a MockSchemaRegistryClient the same way) and a lightweight local
  * registry for single-node pipelines. Global ids are assigned
  * incrementally; re-registering an identical schema (any subject)
  * returns its existing id, like the real registry. */
final class EmbeddedSchemaRegistry {
  private val mapper = new ObjectMapper
  private var server: HttpServer = _
  private val byId = TrieMap.empty[Int, String]
  private val bySchema = TrieMap.empty[String, Int]
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Observability for cache tests. */
  val gets = new java.util.concurrent.atomic.AtomicInteger(0)
  val posts = new java.util.concurrent.atomic.AtomicInteger(0)

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    // the JDK server's HTTP-Dispatcher thread inherits daemon status
    // from the STARTING thread — start from a daemon thread so a
    // shared registry never pins JVM shutdown (a non-daemon dispatcher
    // left a completed driver main hanging in DestroyJavaVM)
    val starter = new Thread(() => server.start(), "registry-starter")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    server.getAddress.getPort
  }

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = if (server != null) server.stop(0)

  private val IdPath = "/schemas/ids/(\\d+)".r
  private val SubjectPath = "/subjects/([^/]+)/versions".r

  private def handle(ex: HttpExchange): Unit = {
    val (code, resp) = (ex.getRequestMethod, ex.getRequestURI.getPath) match {
      case ("GET", IdPath(id)) =>
        gets.incrementAndGet()
        byId.get(id.toInt) match {
          case Some(s) =>
            val node = mapper.createObjectNode(); node.put("schema", s)
            (200, mapper.writeValueAsString(node))
          case None =>
            (404, s"""{"error_code":40403,"message":"Schema $id not found"}""")
        }
      case ("POST", SubjectPath(_)) =>
        posts.incrementAndGet()
        val schema = mapper
          .readTree(ex.getRequestBody.readAllBytes()).get("schema").asText()
        val id = bySchema.getOrElseUpdate(schema, {
          val n = nextId.incrementAndGet(); byId(n) = schema; n
        })
        (200, s"""{"id":$id}""")
      case (m, p) =>
        (404, s"""{"error_code":404,"message":"no route $m $p"}""")
    }
    val bytes = resp.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type",
      "application/vnd.schemaregistry.v1+json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }
}

object EmbeddedSchemaRegistry {
  /** JVM-lifetime shared instance for registry-format queries (started
    * on first use; the daemon HTTP thread dies with the JVM). */
  lazy val shared: EmbeddedSchemaRegistry = {
    val r = new EmbeddedSchemaRegistry
    r.start()
    r
  }
}
