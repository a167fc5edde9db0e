package graft.jdbc

import java.io.{InputStream, Reader}
import java.sql.{Array => SqlArray, _}
import java.util.Calendar

import com.fasterxml.jackson.databind.JsonNode

/** Forward-only, fully-fetched JDBC ResultSet over gateway JSON rows
  * (reference: flink-sql-jdbc-driver/.../FlinkResultSet.java). Values
  * arrive as JSON; getters convert from the node, `wasNull` reflects
  * the last read. Arrays/structs/maps surface through getString /
  * getObject as their JSON text — a thin client does not reinvent the
  * type system. */
final class GraftResultSet(stmt: Statement, cols: Seq[(String, String)],
    rows: Vector[JsonNode]) extends ResultSet {

  // first-wins on duplicate labels (the JDBC findColumn contract)
  private val byName = cols.map(_._1.toLowerCase).zipWithIndex.reverse.toMap
  private var cursor = -1
  private var nullFlag = false
  @volatile private var closed = false

  private def no: Nothing = throw new SQLFeatureNotSupportedException
  private def checkOpen(): Unit =
    if (closed) throw new SQLException("result set is closed")

  private def node(i: Int): JsonNode = {
    checkOpen()
    if (cursor < 0 || cursor >= rows.length)
      throw new SQLException("cursor is not on a row")
    if (i < 1 || i > cols.length)
      throw new SQLException(s"column index out of range: $i")
    val n = rows(cursor).get("fields").get(i - 1)
    nullFlag = n == null || n.isNull
    n
  }

  override def next(): Boolean = {
    checkOpen()
    if (cursor + 1 < rows.length) { cursor += 1; true }
    else { cursor = rows.length; false }
  }

  /** Vendor extension (reach it via `unwrap(classOf[GraftResultSet])`):
    * the changelog kind of the current row — INSERT / UPDATE_BEFORE /
    * UPDATE_AFTER / DELETE. java.sql has no row-kind concept, so a
    * streaming/changelog statement's kinds surface out-of-band here
    * (the gateway sends them on every row; plain batch results are all
    * INSERT). */
  def getRowKind: String = {
    checkOpen()
    if (cursor < 0 || cursor >= rows.length)
      throw new SQLException("cursor is not on a row")
    Option(rows(cursor).get("kind")).map(_.asText()).getOrElse("INSERT")
  }

  override def close(): Unit = closed = true
  override def isClosed: Boolean = closed
  override def wasNull(): Boolean = nullFlag

  override def findColumn(label: String): Int =
    byName.get(label.toLowerCase) match {
      case Some(i) => i + 1
      case None => throw new SQLException(s"no such column: $label")
    }

  // ---- typed getters by index ----
  override def getString(i: Int): String = {
    val n = node(i)
    if (nullFlag) null
    else if (n.isTextual) n.asText()
    else n.toString
  }
  override def getBoolean(i: Int): Boolean = { val n = node(i); !nullFlag && n.asBoolean() }
  override def getByte(i: Int): Byte = { val n = node(i); if (nullFlag) 0 else n.asInt().toByte }
  override def getShort(i: Int): Short = { val n = node(i); if (nullFlag) 0 else n.asInt().toShort }
  override def getInt(i: Int): Int = { val n = node(i); if (nullFlag) 0 else n.asInt() }
  override def getLong(i: Int): Long = { val n = node(i); if (nullFlag) 0L else n.asLong() }
  override def getFloat(i: Int): Float = { val n = node(i); if (nullFlag) 0f else n.asDouble().toFloat }
  override def getDouble(i: Int): Double = { val n = node(i); if (nullFlag) 0d else n.asDouble() }
  override def getBigDecimal(i: Int): java.math.BigDecimal = {
    val n = node(i)
    if (nullFlag) null else new java.math.BigDecimal(n.asText())
  }
  override def getBigDecimal(i: Int, scale: Int): java.math.BigDecimal = {
    val v = getBigDecimal(i)
    if (v == null) null else v.setScale(scale, java.math.RoundingMode.HALF_UP)
  }
  override def getBytes(i: Int): scala.Array[Byte] = {
    val n = node(i)
    if (nullFlag) null else java.util.Base64.getDecoder.decode(n.asText())
  }
  override def getDate(i: Int): Date = {
    val s = getString(i); if (s == null) null else Date.valueOf(s)
  }
  override def getTime(i: Int): Time = {
    val s = getString(i); if (s == null) null else Time.valueOf(s)
  }
  override def getTimestamp(i: Int): Timestamp = {
    val s = getString(i); if (s == null) null else Timestamp.valueOf(s)
  }
  override def getObject(i: Int): AnyRef = {
    val n = node(i)
    if (nullFlag) null
    else if (n.isBoolean) java.lang.Boolean.valueOf(n.asBoolean())
    else if (n.isIntegralNumber) java.lang.Long.valueOf(n.asLong())
    else if (n.isNumber) java.lang.Double.valueOf(n.asDouble())
    else if (n.isTextual) n.asText()
    else n.toString
  }
  override def getObject[T](i: Int, t: Class[T]): T = t.cast(getObject(i))
  override def getObject(i: Int, map: java.util.Map[String, Class[_]]): AnyRef = getObject(i)

  // ---- by label: delegate ----
  override def getString(l: String): String = getString(findColumn(l))
  override def getBoolean(l: String): Boolean = getBoolean(findColumn(l))
  override def getByte(l: String): Byte = getByte(findColumn(l))
  override def getShort(l: String): Short = getShort(findColumn(l))
  override def getInt(l: String): Int = getInt(findColumn(l))
  override def getLong(l: String): Long = getLong(findColumn(l))
  override def getFloat(l: String): Float = getFloat(findColumn(l))
  override def getDouble(l: String): Double = getDouble(findColumn(l))
  override def getBigDecimal(l: String): java.math.BigDecimal = getBigDecimal(findColumn(l))
  override def getBigDecimal(l: String, scale: Int): java.math.BigDecimal =
    getBigDecimal(findColumn(l), scale)
  override def getBytes(l: String): scala.Array[Byte] = getBytes(findColumn(l))
  override def getDate(l: String): Date = getDate(findColumn(l))
  override def getTime(l: String): Time = getTime(findColumn(l))
  override def getTimestamp(l: String): Timestamp = getTimestamp(findColumn(l))
  override def getObject(l: String): AnyRef = getObject(findColumn(l))
  override def getObject[T](l: String, t: Class[T]): T = getObject(findColumn(l), t)
  override def getObject(l: String, map: java.util.Map[String, Class[_]]): AnyRef =
    getObject(findColumn(l))

  // ---- cursor state ----
  override def isBeforeFirst: Boolean = { checkOpen(); cursor < 0 && rows.nonEmpty }
  override def isAfterLast: Boolean = { checkOpen(); cursor >= rows.length && rows.nonEmpty }
  override def isFirst: Boolean = { checkOpen(); cursor == 0 }
  override def isLast: Boolean = { checkOpen(); rows.nonEmpty && cursor == rows.length - 1 }
  override def getRow: Int = { checkOpen(); if (cursor < 0 || cursor >= rows.length) 0 else cursor + 1 }

  override def getMetaData: ResultSetMetaData = new GraftResultSetMetaData(cols)
  override def getStatement: Statement = stmt
  override def getType: Int = ResultSet.TYPE_FORWARD_ONLY
  override def getConcurrency: Int = ResultSet.CONCUR_READ_ONLY
  override def getHoldability: Int = ResultSet.CLOSE_CURSORS_AT_COMMIT
  override def getFetchDirection: Int = ResultSet.FETCH_FORWARD
  override def setFetchDirection(direction: Int): Unit = ()
  override def getFetchSize: Int = 0
  override def setFetchSize(n: Int): Unit = ()
  override def getWarnings: SQLWarning = null
  override def clearWarnings(): Unit = ()
  override def getCursorName: String = no

  // forward-only: scrolling unsupported
  override def beforeFirst(): Unit = no
  override def afterLast(): Unit = no
  override def first(): Boolean = no
  override def last(): Boolean = no
  override def absolute(row: Int): Boolean = no
  override def relative(n: Int): Boolean = no
  override def previous(): Boolean = no

  // read-only: updates unsupported
  override def rowUpdated(): Boolean = false
  override def rowInserted(): Boolean = false
  override def rowDeleted(): Boolean = false
  override def insertRow(): Unit = no
  override def updateRow(): Unit = no
  override def deleteRow(): Unit = no
  override def refreshRow(): Unit = no
  override def cancelRowUpdates(): Unit = no
  override def moveToInsertRow(): Unit = no
  override def moveToCurrentRow(): Unit = no
  override def updateNull(i: Int): Unit = no
  override def updateNull(l: String): Unit = no
  override def updateBoolean(i: Int, v: Boolean): Unit = no
  override def updateBoolean(l: String, v: Boolean): Unit = no
  override def updateByte(i: Int, v: Byte): Unit = no
  override def updateByte(l: String, v: Byte): Unit = no
  override def updateShort(i: Int, v: Short): Unit = no
  override def updateShort(l: String, v: Short): Unit = no
  override def updateInt(i: Int, v: Int): Unit = no
  override def updateInt(l: String, v: Int): Unit = no
  override def updateLong(i: Int, v: Long): Unit = no
  override def updateLong(l: String, v: Long): Unit = no
  override def updateFloat(i: Int, v: Float): Unit = no
  override def updateFloat(l: String, v: Float): Unit = no
  override def updateDouble(i: Int, v: Double): Unit = no
  override def updateDouble(l: String, v: Double): Unit = no
  override def updateBigDecimal(i: Int, v: java.math.BigDecimal): Unit = no
  override def updateBigDecimal(l: String, v: java.math.BigDecimal): Unit = no
  override def updateString(i: Int, v: String): Unit = no
  override def updateString(l: String, v: String): Unit = no
  override def updateBytes(i: Int, v: scala.Array[Byte]): Unit = no
  override def updateBytes(l: String, v: scala.Array[Byte]): Unit = no
  override def updateDate(i: Int, v: Date): Unit = no
  override def updateDate(l: String, v: Date): Unit = no
  override def updateTime(i: Int, v: Time): Unit = no
  override def updateTime(l: String, v: Time): Unit = no
  override def updateTimestamp(i: Int, v: Timestamp): Unit = no
  override def updateTimestamp(l: String, v: Timestamp): Unit = no
  override def updateAsciiStream(i: Int, s: InputStream, l: Int): Unit = no
  override def updateAsciiStream(lbl: String, s: InputStream, l: Int): Unit = no
  override def updateAsciiStream(i: Int, s: InputStream, l: Long): Unit = no
  override def updateAsciiStream(lbl: String, s: InputStream, l: Long): Unit = no
  override def updateAsciiStream(i: Int, s: InputStream): Unit = no
  override def updateAsciiStream(lbl: String, s: InputStream): Unit = no
  override def updateBinaryStream(i: Int, s: InputStream, l: Int): Unit = no
  override def updateBinaryStream(lbl: String, s: InputStream, l: Int): Unit = no
  override def updateBinaryStream(i: Int, s: InputStream, l: Long): Unit = no
  override def updateBinaryStream(lbl: String, s: InputStream, l: Long): Unit = no
  override def updateBinaryStream(i: Int, s: InputStream): Unit = no
  override def updateBinaryStream(lbl: String, s: InputStream): Unit = no
  override def updateCharacterStream(i: Int, r: Reader, l: Int): Unit = no
  override def updateCharacterStream(lbl: String, r: Reader, l: Int): Unit = no
  override def updateCharacterStream(i: Int, r: Reader, l: Long): Unit = no
  override def updateCharacterStream(lbl: String, r: Reader, l: Long): Unit = no
  override def updateCharacterStream(i: Int, r: Reader): Unit = no
  override def updateCharacterStream(lbl: String, r: Reader): Unit = no
  override def updateObject(i: Int, v: AnyRef, scale: Int): Unit = no
  override def updateObject(i: Int, v: AnyRef): Unit = no
  override def updateObject(l: String, v: AnyRef, scale: Int): Unit = no
  override def updateObject(l: String, v: AnyRef): Unit = no
  override def updateRef(i: Int, v: Ref): Unit = no
  override def updateRef(l: String, v: Ref): Unit = no
  override def updateBlob(i: Int, v: Blob): Unit = no
  override def updateBlob(l: String, v: Blob): Unit = no
  override def updateBlob(i: Int, s: InputStream, l: Long): Unit = no
  override def updateBlob(lbl: String, s: InputStream, l: Long): Unit = no
  override def updateBlob(i: Int, s: InputStream): Unit = no
  override def updateBlob(lbl: String, s: InputStream): Unit = no
  override def updateClob(i: Int, v: Clob): Unit = no
  override def updateClob(l: String, v: Clob): Unit = no
  override def updateClob(i: Int, r: Reader, l: Long): Unit = no
  override def updateClob(lbl: String, r: Reader, l: Long): Unit = no
  override def updateClob(i: Int, r: Reader): Unit = no
  override def updateClob(lbl: String, r: Reader): Unit = no
  override def updateArray(i: Int, v: SqlArray): Unit = no
  override def updateArray(l: String, v: SqlArray): Unit = no
  override def updateRowId(i: Int, v: RowId): Unit = no
  override def updateRowId(l: String, v: RowId): Unit = no
  override def updateNString(i: Int, v: String): Unit = no
  override def updateNString(l: String, v: String): Unit = no
  override def updateNClob(i: Int, v: NClob): Unit = no
  override def updateNClob(l: String, v: NClob): Unit = no
  override def updateNClob(i: Int, r: Reader, l: Long): Unit = no
  override def updateNClob(lbl: String, r: Reader, l: Long): Unit = no
  override def updateNClob(i: Int, r: Reader): Unit = no
  override def updateNClob(lbl: String, r: Reader): Unit = no
  override def updateNCharacterStream(i: Int, r: Reader, l: Long): Unit = no
  override def updateNCharacterStream(lbl: String, r: Reader, l: Long): Unit = no
  override def updateNCharacterStream(i: Int, r: Reader): Unit = no
  override def updateNCharacterStream(lbl: String, r: Reader): Unit = no
  override def updateSQLXML(i: Int, v: SQLXML): Unit = no
  override def updateSQLXML(l: String, v: SQLXML): Unit = no

  // exotic reads
  override def getAsciiStream(i: Int): InputStream = no
  override def getAsciiStream(l: String): InputStream = no
  override def getUnicodeStream(i: Int): InputStream = no
  override def getUnicodeStream(l: String): InputStream = no
  override def getBinaryStream(i: Int): InputStream = no
  override def getBinaryStream(l: String): InputStream = no
  override def getCharacterStream(i: Int): Reader = {
    val s = getString(i); if (s == null) null else new java.io.StringReader(s)
  }
  override def getCharacterStream(l: String): Reader = getCharacterStream(findColumn(l))
  override def getNCharacterStream(i: Int): Reader = getCharacterStream(i)
  override def getNCharacterStream(l: String): Reader = getCharacterStream(l)
  override def getNString(i: Int): String = getString(i)
  override def getNString(l: String): String = getString(l)
  override def getRef(i: Int): Ref = no
  override def getRef(l: String): Ref = no
  override def getBlob(i: Int): Blob = no
  override def getBlob(l: String): Blob = no
  override def getClob(i: Int): Clob = no
  override def getClob(l: String): Clob = no
  override def getNClob(i: Int): NClob = no
  override def getNClob(l: String): NClob = no
  override def getArray(i: Int): SqlArray = no
  override def getArray(l: String): SqlArray = no
  override def getURL(i: Int): java.net.URL = no
  override def getURL(l: String): java.net.URL = no
  override def getRowId(i: Int): RowId = no
  override def getRowId(l: String): RowId = no
  override def getSQLXML(i: Int): SQLXML = no
  override def getSQLXML(l: String): SQLXML = no
  override def getDate(i: Int, cal: Calendar): Date = getDate(i)
  override def getDate(l: String, cal: Calendar): Date = getDate(l)
  override def getTime(i: Int, cal: Calendar): Time = getTime(i)
  override def getTime(l: String, cal: Calendar): Time = getTime(l)
  override def getTimestamp(i: Int, cal: Calendar): Timestamp = getTimestamp(i)
  override def getTimestamp(l: String, cal: Calendar): Timestamp = getTimestamp(l)

  override def unwrap[T](iface: Class[T]): T =
    if (iface.isInstance(this)) iface.cast(this)
    else throw new SQLException(s"cannot unwrap to ${iface.getName}")
  override def isWrapperFor(iface: Class[_]): Boolean = iface.isInstance(this)
}

object GraftResultSet {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  /** Driver-side result set from local values (metadata calls that
    * need no gateway round-trip). */
  private[jdbc] def local(cols: Seq[(String, String)],
      data: Seq[Seq[Any]]): GraftResultSet = {
    val rows = data.map { r =>
      val o = mapper.createObjectNode()
      val f = o.putArray("fields")
      r.foreach {
        case null => f.addNull()
        case s: String => f.add(s)
        case i: Int => f.add(i)
        case l: Long => f.add(l)
        case b: Boolean => f.add(b)
        case d: Double => f.add(d)
        case other => f.add(String.valueOf(other))
      }
      o: JsonNode
    }.toVector
    new GraftResultSet(null, cols, rows)
  }
}

/** Column metadata from the gateway's (name, logicalType) pairs —
  * logicalType is the engine's SQL type string (BIGINT, STRING,
  * DECIMAL(38,0), ARRAY<DOUBLE>, …). */
final class GraftResultSetMetaData(cols: Seq[(String, String)])
    extends ResultSetMetaData {

  private def check(i: Int): (String, String) = {
    if (i < 1 || i > cols.length)
      throw new SQLException(s"column index out of range: $i")
    cols(i - 1)
  }

  override def getColumnCount: Int = cols.length
  override def getColumnName(i: Int): String = check(i)._1
  override def getColumnLabel(i: Int): String = check(i)._1
  override def getColumnTypeName(i: Int): String = check(i)._2

  override def getColumnType(i: Int): Int = {
    val t = check(i)._2.toUpperCase
    val base = t.takeWhile(c => c.isLetter || c == '_')
    base match {
      case "BOOLEAN" => Types.BOOLEAN
      case "TINYINT" => Types.TINYINT
      case "SMALLINT" => Types.SMALLINT
      case "INT" | "INTEGER" => Types.INTEGER
      case "BIGINT" => Types.BIGINT
      case "FLOAT" | "REAL" => Types.FLOAT
      case "DOUBLE" => Types.DOUBLE
      case "DECIMAL" | "NUMERIC" => Types.DECIMAL
      case "STRING" | "VARCHAR" | "CHAR" => Types.VARCHAR
      case "BINARY" | "VARBINARY" => Types.VARBINARY
      case "DATE" => Types.DATE
      case "TIMESTAMP" | "TIMESTAMP_NTZ" => Types.TIMESTAMP
      case "ARRAY" => Types.ARRAY
      case "MAP" | "STRUCT" => Types.JAVA_OBJECT
      case _ => Types.OTHER
    }
  }

  override def getColumnClassName(i: Int): String = getColumnType(i) match {
    case Types.BOOLEAN => "java.lang.Boolean"
    case Types.TINYINT | Types.SMALLINT | Types.INTEGER => "java.lang.Integer"
    case Types.BIGINT => "java.lang.Long"
    case Types.FLOAT | Types.DOUBLE => "java.lang.Double"
    case Types.DECIMAL => "java.math.BigDecimal"
    case Types.DATE => "java.sql.Date"
    case Types.TIMESTAMP => "java.sql.Timestamp"
    case Types.VARBINARY => "[B"
    case _ => "java.lang.String"
  }

  override def getPrecision(i: Int): Int = {
    val t = check(i)._2
    if (t.startsWith("DECIMAL(")) {
      t.stripPrefix("DECIMAL(").stripSuffix(")").split(",")(0).trim.toInt
    } else 0
  }
  override def getScale(i: Int): Int = {
    val t = check(i)._2
    if (t.startsWith("DECIMAL(")) {
      t.stripPrefix("DECIMAL(").stripSuffix(")").split(",")(1).trim.toInt
    } else 0
  }

  override def isNullable(i: Int): Int = ResultSetMetaData.columnNullable
  override def isAutoIncrement(i: Int): Boolean = false
  override def isCaseSensitive(i: Int): Boolean = true
  override def isSearchable(i: Int): Boolean = true
  override def isCurrency(i: Int): Boolean = false
  override def isSigned(i: Int): Boolean = {
    val t = getColumnType(i)
    t == Types.TINYINT || t == Types.SMALLINT || t == Types.INTEGER ||
      t == Types.BIGINT || t == Types.FLOAT || t == Types.DOUBLE ||
      t == Types.DECIMAL
  }
  override def getColumnDisplaySize(i: Int): Int = 0
  override def getSchemaName(i: Int): String = ""
  override def getTableName(i: Int): String = ""
  override def getCatalogName(i: Int): String = ""
  override def isReadOnly(i: Int): Boolean = true
  override def isWritable(i: Int): Boolean = false
  override def isDefinitelyWritable(i: Int): Boolean = false

  override def unwrap[T](iface: Class[T]): T =
    if (iface.isInstance(this)) iface.cast(this)
    else throw new SQLException(s"cannot unwrap to ${iface.getName}")
  override def isWrapperFor(iface: Class[_]): Boolean = iface.isInstance(this)
}
