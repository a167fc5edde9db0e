package graft.jdbc

import java.sql.{DriverManager, SQLException, Types}

import graft.SparkSpec
import graft.api.SqlGateway

/** End-to-end JDBC: DriverManager URL → gateway session → DDL + query
  * through plain java.sql interfaces — the reference's
  * flink-sql-jdbc-driver usage shape (connect, statement, result set,
  * metadata), against a live [[SqlGateway]] on an ephemeral port. */
class JdbcDriverSpec extends SparkSpec {

  private lazy val gw = new SqlGateway(spark).start()
  private lazy val url = s"jdbc:graft://127.0.0.1:${gw.boundPort}"

  private def connect() = {
    GraftDriver.ensureRegistered()
    DriverManager.getConnection(url)
  }

  test("DriverManager resolves the URL and runs a query end-to-end") {
    val conn = connect()
    try {
      val st = conn.createStatement()
      assert(!st.execute(
        s"CREATE TABLE jt (n_nationkey BIGINT, n_name STRING, " +
          s"n_regionkey BIGINT, n_comment STRING) WITH (" +
          s"'connector'='filesystem', 'path'='$sfDir/nation.parquet', " +
          "'format'='parquet')"))
      val rs = st.executeQuery(
        "SELECT n_nationkey, n_name FROM jt ORDER BY n_nationkey LIMIT 3")
      val md = rs.getMetaData
      assert(md.getColumnCount == 2)
      assert(md.getColumnName(1) == "n_nationkey")
      assert(md.getColumnType(1) == Types.BIGINT)
      assert(md.getColumnType(2) == Types.VARCHAR)
      val got = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getLong(1), r.getString("n_name")))
        .toList
      assert(got == List((0L, "NATION_0"), (1L, "NATION_1"), (2L, "NATION_2")))
      assert(!rs.next())
      rs.close(); st.close()
    } finally conn.close()
  }

  test("prepared statement substitutes parameters safely") {
    val conn = connect()
    try {
      conn.createStatement().execute(
        s"CREATE TABLE jn (n_nationkey BIGINT, n_name STRING, " +
          s"n_regionkey BIGINT, n_comment STRING) WITH ('connector'='filesystem', " +
          s"'path'='$sfDir/nation.parquet', 'format'='parquet')")
      val ps = conn.prepareStatement(
        "SELECT n_name FROM jn WHERE n_nationkey = ? AND n_name <> ? " +
          "AND '?' = '?'")
      ps.setLong(1, 3L)
      ps.setString(2, "it's") // embedded quote must escape
      val rs = ps.executeQuery()
      assert(rs.next() && rs.getString(1) == "NATION_3")
      assert(!rs.next())
      ps.close()
    } finally conn.close()
  }

  test("zero-row SELECT is still a query: empty result set with schema") {
    // regression: the gateway answers a zero-row SELECT with EOS as the
    // FIRST fetch; the client must still absorb the schema/isQueryResult
    // flags from that page or executeQuery() misclassifies the
    // statement as an update and throws on a perfectly valid result
    val conn = connect()
    try {
      conn.createStatement().execute(
        s"CREATE TABLE jz (n_nationkey BIGINT, n_name STRING, " +
          s"n_regionkey BIGINT, n_comment STRING) WITH ('connector'='filesystem', " +
          s"'path'='$sfDir/nation.parquet', 'format'='parquet')")
      val rs = conn.createStatement().executeQuery(
        "SELECT n_nationkey, n_name FROM jz WHERE false")
      val md = rs.getMetaData
      assert(md.getColumnCount == 2)
      assert(md.getColumnName(1) == "n_nationkey")
      assert(md.getColumnType(1) == Types.BIGINT)
      assert(!rs.next())
      rs.close()
    } finally conn.close()
  }

  test("prepared statement: ? in comments and quoted identifiers is literal") {
    val conn = connect()
    try {
      conn.createStatement().execute(
        s"CREATE TABLE jc (n_nationkey BIGINT, n_name STRING, " +
          s"n_regionkey BIGINT, n_comment STRING) WITH ('connector'='filesystem', " +
          s"'path'='$sfDir/nation.parquet', 'format'='parquet')")
      // the '?' and the apostrophe inside the -- comment must not count
      // as a placeholder / string-open; the backtick-quoted identifier
      // likewise; only the two bare ? are parameters
      val ps = conn.prepareStatement(
        "SELECT n_name -- what's this ? not a param\n" +
          "FROM jc WHERE `n_nationkey` = ? AND n_name <> ?")
      ps.setLong(1, 4L)
      ps.setString(2, "nope")
      val rs = ps.executeQuery()
      assert(rs.next() && rs.getString(1) == "NATION_4")
      assert(!rs.next())
      ps.close()
      // bracketed comments (nesting included) are not placeholders
      val ps2 = conn.prepareStatement(
        "SELECT n_name /* really? /* nested? */ still a comment */ " +
          "FROM jc WHERE n_nationkey = ?")
      ps2.setLong(1, 5L)
      val rs2 = ps2.executeQuery()
      assert(rs2.next() && rs2.getString(1) == "NATION_5")
      assert(!rs2.next())
      ps2.close()
    } finally conn.close()
  }

  test("statement errors surface as SQLException with the gateway message") {
    val conn = connect()
    try {
      val e = intercept[SQLException](
        conn.createStatement().executeQuery("SELECT * FROM no_such_table_xyz"))
      assert(e.getMessage.contains("no_such_table_xyz")
        || e.getMessage.nonEmpty)
    } finally conn.close()
  }

  test("database metadata: catalogs, tables, columns via real statements") {
    val conn = connect()
    try {
      conn.createStatement().execute(
        s"CREATE TABLE jm (r_regionkey BIGINT, r_name STRING, " +
          s"r_comment STRING) WITH ('connector'='filesystem', " +
          s"'path'='$sfDir/region.parquet', 'format'='parquet')")
      val md = conn.getMetaData
      assert(md.getDatabaseProductName == "graft")
      val cats = md.getCatalogs
      assert(cats.next() && cats.getString("TABLE_CAT") == "default_catalog")
      val tabs = md.getTables(null, null, "jm", null)
      assert(tabs.next() && tabs.getString("TABLE_NAME") == "jm"
        && tabs.getString("TABLE_TYPE") == "TABLE")
      assert(!tabs.next())
      val cols = md.getColumns(null, null, "jm", null)
      val names = Iterator.continually(cols).takeWhile(_.next())
        .map(_.getString("COLUMN_NAME")).toList
      assert(names.contains("r_regionkey") && names.contains("r_name"))
    } finally conn.close()
  }

  test("sessions are isolated between connections") {
    val c1 = connect(); val c2 = connect()
    try {
      c1.createStatement().execute(
        s"CREATE TABLE iso1 (r_regionkey BIGINT, r_name STRING, " +
          s"r_comment STRING) WITH ('connector'='filesystem', " +
          s"'path'='$sfDir/region.parquet', 'format'='parquet')")
      // visible in c1
      assert(c1.createStatement().executeQuery(
        "SELECT COUNT(*) c FROM iso1").next())
      // invisible in c2
      intercept[SQLException](
        c2.createStatement().executeQuery("SELECT COUNT(*) c FROM iso1"))
    } finally { c1.close(); c2.close() }
  }

  test("changelog statement end-to-end: row kinds page through the gateway") {
    // the streaming half of the service layer: a changelog-bearing
    // result (its __row_kind column) must survive the whole stack —
    // gateway kind mapping, multi-page fetch (page size 2 forces three
    // PAYLOAD pages + EOS), JDBC result set — with the kinds exposed
    // through the vendor unwrap and the payload column list EXCLUDING
    // the kind column, exactly the reference's RowKind-over-REST shape
    val props = new java.util.Properties()
    props.setProperty("sql-gateway.page-size", "2")
    GraftDriver.ensureRegistered()
    val conn = java.sql.DriverManager.getConnection(url, props)
    val dir = java.nio.file.Files.createTempDirectory("jdbc_chg").toString
    try {
      val st = conn.createStatement()
      st.execute(
        s"CREATE TABLE chg (k STRING, v BIGINT, seq BIGINT, " +
          s"__row_kind STRING) WITH ('connector'='filesystem', " +
          s"'path'='$dir/chg', 'format'='parquet')")
      st.execute(
        "INSERT INTO chg SELECT * FROM VALUES " +
          "('a', 10, 1, '+I'), ('b', 7, 2, '+I'), ('a', 10, 3, '-U'), " +
          "('a', 15, 4, '+U'), ('b', 7, 5, '-D') AS t(k, v, seq, __row_kind)")
      val rs = st.executeQuery(
        "SELECT k, v, seq, __row_kind FROM chg ORDER BY seq")
      // the kind column is NOT payload — it rides on the row itself
      assert(rs.getMetaData.getColumnCount == 3)
      val graftRs = rs.unwrap(classOf[GraftResultSet])
      val got = Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getString("k"), r.getLong("v"), graftRs.getRowKind))
        .toList
      assert(got == List(
        ("a", 10L, "INSERT"), ("b", 7L, "INSERT"),
        ("a", 10L, "UPDATE_BEFORE"), ("a", 15L, "UPDATE_AFTER"),
        ("b", 7L, "DELETE")))
      rs.close()
      // and the net state computed over the same changelog via SQL
      val agg = st.executeQuery(
        "SELECT k, SUM(CASE WHEN __row_kind IN ('+I','+U') THEN v " +
          "ELSE -v END) AS net FROM chg GROUP BY k " +
          "HAVING SUM(CASE WHEN __row_kind IN ('+I','+U') THEN 1 " +
          "ELSE -1 END) > 0 ORDER BY k")
      assert(agg.next() && agg.getString(1) == "a" && agg.getLong(2) == 15L)
      // a plain batch aggregate's rows are all INSERT kind
      assert(agg.unwrap(classOf[GraftResultSet]).getRowKind == "INSERT")
      assert(!agg.next())
      st.close()
    } finally {
      conn.close()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("connection lifecycle: isValid, close, post-close raises") {
    val conn = connect()
    assert(conn.isValid(1))
    assert(conn.getAutoCommit)
    conn.close()
    assert(conn.isClosed)
    intercept[SQLException](conn.createStatement())
  }
}
