package graft.jdbc

import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo, SQLException, SQLFeatureNotSupportedException}
import java.util.Properties
import java.util.logging.Logger

/** JDBC driver for the graft SQL gateway — the thin client the
  * reference ships as flink-sql-jdbc-driver
  * (flink-table/flink-sql-jdbc-driver/.../FlinkDriver.java): a
  * `java.sql.Driver` whose Connection/Statement/ResultSet delegate to
  * the gateway's REST v2 protocol, so any JDBC tool can run SQL against
  * a running [[graft.api.SqlGateway]].
  *
  * URL: `jdbc:graft://host:port[?key=value&...]` — query parameters
  * become gateway session properties (e.g.
  * `?sql-gateway.max-fetch-rows=500`).
  *
  * Registration: the ServiceLoader entry in
  * META-INF/services/java.sql.Driver (DriverManager instantiates the
  * provider, whose constructor registers), or programmatically
  * `new GraftDriver` / `GraftDriver.ensureRegistered()`. NOTE: bare
  * `Class.forName("graft.jdbc.GraftDriver")` does NOT register —
  * Scala places companion initialization in `GraftDriver$`, not a
  * static initializer of this class, so class-loading alone runs no
  * code (relevant only for shaded jars that strip META-INF/services).
  * Then `DriverManager.getConnection("jdbc:graft://127.0.0.1:8083")`.
  */
final class GraftDriver extends Driver {
  GraftDriver.ensureRegistered()

  private val Prefix = "jdbc:graft://"

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(Prefix)

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null // JDBC contract: not ours
    val rest = url.stripPrefix(Prefix)
    val (hostPort, query) = rest.indexOf('?') match {
      case -1 => (rest, "")
      case i => (rest.take(i), rest.drop(i + 1))
    }
    val (host, port) = hostPort.split(":", 2) match {
      case Array(h, p) =>
        (h, try p.toInt catch {
          case _: NumberFormatException =>
            throw new SQLException(s"bad port in JDBC URL: $url")
        })
      case Array(h) => (h, 8083)
      case _ => throw new SQLException(s"bad JDBC URL: $url")
    }
    val urlProps = query.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      java.net.URLDecoder.decode(k, "UTF-8") ->
        java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap
    val infoProps =
      if (info == null) Map.empty[String, String]
      else {
        import scala.jdk.CollectionConverters._
        info.asScala.map { case (k, v) =>
          String.valueOf(k) -> String.valueOf(v) }.toMap
      }
    new GraftConnection(host, port, infoProps ++ urlProps)
  }

  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: Logger =
    throw new SQLFeatureNotSupportedException("java.util.logging not used")
}

object GraftDriver {
  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)
  /** Idempotent DriverManager registration (invoked from the class
    * constructor, so Class.forName and ServiceLoader both land here; the
    * CAS also breaks the constructor↔registration recursion). */
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true))
      DriverManager.registerDriver(new GraftDriver)
}
