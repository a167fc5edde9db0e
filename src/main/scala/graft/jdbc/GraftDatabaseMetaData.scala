package graft.jdbc

import java.sql.{Array => SqlArray, _}

/** DatabaseMetaData over the gateway (reference:
  * flink-sql-jdbc-driver/.../FlinkDatabaseMetaData.java): catalogs,
  * schemas, tables and columns come from real SHOW/DESCRIBE statements
  * in the connection's session; capability flags describe the engine
  * honestly (read-only, no transactions, subqueries/joins/unions
  * supported). */
final class GraftDatabaseMetaData(conn: GraftConnection, url: String)
    extends DatabaseMetaData {

  private def no: Nothing = throw new SQLFeatureNotSupportedException

  private def rowsOf(stmt: String): Vector[String] =
    try conn.client.execute(conn.session, stmt).rows
      .map(_.get("fields").get(0).asText())
    catch { case _: SQLException => Vector.empty }

  /** JDBC search pattern ('%' any run, '_' any char; null/"" = all) →
    * anchored case-insensitive regex. */
  private def patternRx(pat: String): scala.util.matching.Regex = {
    val p = Option(pat).filter(_.nonEmpty).getOrElse("%")
    ("(?i)^" + java.util.regex.Pattern.quote(p)
      .replace("%", "\\E.*\\Q").replace("_", "\\E.\\Q") + "$").r
  }

  // ---- identity ----
  override def getURL: String = url
  override def getUserName: String = ""
  override def getDatabaseProductName: String = "graft"
  override def getDatabaseProductVersion: String =
    try conn.client.info().get("version").asText()
    catch { case _: SQLException => "unknown" }
  override def getDriverName: String = "graft-jdbc"
  override def getDriverVersion: String = "1.0"
  override def getDriverMajorVersion: Int = 1
  override def getDriverMinorVersion: Int = 0
  override def getDatabaseMajorVersion: Int = 1
  override def getDatabaseMinorVersion: Int = 0
  override def getJDBCMajorVersion: Int = 4
  override def getJDBCMinorVersion: Int = 2
  override def getConnection: Connection = conn

  // ---- catalog browsing: real statements ----
  override def getCatalogs: ResultSet =
    GraftResultSet.local(Seq("TABLE_CAT" -> "STRING"),
      rowsOf("SHOW CATALOGS").sorted.map(Seq(_)))

  override def getSchemas: ResultSet = {
    val cat = conn.getCatalog
    GraftResultSet.local(
      Seq("TABLE_SCHEM" -> "STRING", "TABLE_CATALOG" -> "STRING"),
      rowsOf("SHOW DATABASES").sorted.map(db => Seq(db, cat)))
  }
  override def getSchemas(catalog: String, schemaPattern: String): ResultSet =
    getSchemas

  override def getTables(catalog: String, schemaPattern: String,
      tableNamePattern: String, types: scala.Array[String]): ResultSet = {
    val rx = patternRx(tableNamePattern)
    val views = rowsOf("SHOW VIEWS").toSet
    val wantTables = types == null || types.contains("TABLE")
    val wantViews = types == null || types.contains("VIEW")
    val rows = rowsOf("SHOW TABLES")
      .filter(t => rx.findFirstIn(t).isDefined)
      .sorted.flatMap { t =>
        val isView = views.contains(t)
        if ((isView && wantViews) || (!isView && wantTables))
          Some(Seq(null, null, t, if (isView) "VIEW" else "TABLE", null,
            null, null, null, null, null))
        else None
      }
    GraftResultSet.local(
      Seq("TABLE_CAT" -> "STRING", "TABLE_SCHEM" -> "STRING",
        "TABLE_NAME" -> "STRING", "TABLE_TYPE" -> "STRING",
        "REMARKS" -> "STRING", "TYPE_CAT" -> "STRING",
        "TYPE_SCHEM" -> "STRING", "TYPE_NAME" -> "STRING",
        "SELF_REFERENCING_COL_NAME" -> "STRING", "REF_GENERATION" -> "STRING"),
      rows)
  }

  override def getColumns(catalog: String, schemaPattern: String,
      tableNamePattern: String, columnNamePattern: String): ResultSet = {
    // JDBC patterns ('%'/'_'): enumerate matching tables via SHOW
    // TABLES, DESCRIBE each, filter columns by the column pattern —
    // the standard all-tables call getColumns(null,null,"%","%") must
    // work (BI tools browse schemas exactly this way)
    val tableRx = patternRx(tableNamePattern)
    val colRx = patternRx(columnNamePattern)
    val tables = rowsOf("SHOW TABLES")
      .filter(t => tableRx.findFirstIn(t).isDefined).sorted
    val cols = tables.flatMap { table =>
      val described =
        try conn.client.execute(conn.session, s"DESCRIBE `$table`").rows
        catch { case _: SQLException => Vector.empty }
      described.zipWithIndex.collect {
        case (row, i)
            if colRx.findFirstIn(row.get("fields").get(0).asText()).isDefined =>
          val f = row.get("fields")
          val name = f.get(0).asText()
          val typ = f.get(1).asText()
          Seq[Any](null, null, table, name,
            new GraftResultSetMetaData(Seq(name -> typ)).getColumnType(1),
            typ, 0, 0, 0, 10, DatabaseMetaData.columnNullable, null, null,
            0, 0, 0, i + 1, "YES")
      }
    }
    GraftResultSet.local(
      Seq("TABLE_CAT" -> "STRING", "TABLE_SCHEM" -> "STRING",
        "TABLE_NAME" -> "STRING", "COLUMN_NAME" -> "STRING",
        "DATA_TYPE" -> "INT", "TYPE_NAME" -> "STRING",
        "COLUMN_SIZE" -> "INT", "BUFFER_LENGTH" -> "INT",
        "DECIMAL_DIGITS" -> "INT", "NUM_PREC_RADIX" -> "INT",
        "NULLABLE" -> "INT", "REMARKS" -> "STRING",
        "COLUMN_DEF" -> "STRING", "SQL_DATA_TYPE" -> "INT",
        "SQL_DATETIME_SUB" -> "INT", "CHAR_OCTET_LENGTH" -> "INT",
        "ORDINAL_POSITION" -> "INT", "IS_NULLABLE" -> "STRING"),
      cols)
  }

  override def getTableTypes: ResultSet =
    GraftResultSet.local(Seq("TABLE_TYPE" -> "STRING"),
      Seq(Seq("TABLE"), Seq("VIEW")))

  private def empty(colNames: String*): ResultSet =
    GraftResultSet.local(colNames.map(_ -> "STRING"), Nil)

  override def getPrimaryKeys(c: String, s: String, t: String): ResultSet =
    empty("TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME", "COLUMN_NAME",
      "KEY_SEQ", "PK_NAME")
  override def getImportedKeys(c: String, s: String, t: String): ResultSet =
    empty("PKTABLE_CAT")
  override def getExportedKeys(c: String, s: String, t: String): ResultSet =
    empty("PKTABLE_CAT")
  override def getCrossReference(pc: String, ps: String, pt: String,
      fc: String, fs: String, ft: String): ResultSet = empty("PKTABLE_CAT")
  override def getTypeInfo: ResultSet = empty("TYPE_NAME")
  override def getIndexInfo(c: String, s: String, t: String,
      unique: Boolean, approximate: Boolean): ResultSet = empty("TABLE_CAT")
  override def getProcedures(c: String, s: String, p: String): ResultSet =
    empty("PROCEDURE_CAT")
  override def getProcedureColumns(c: String, s: String, p: String,
      col: String): ResultSet = empty("PROCEDURE_CAT")
  override def getColumnPrivileges(c: String, s: String, t: String,
      col: String): ResultSet = empty("TABLE_CAT")
  override def getTablePrivileges(c: String, s: String, t: String): ResultSet =
    empty("TABLE_CAT")
  override def getBestRowIdentifier(c: String, s: String, t: String,
      scope: Int, nullable: Boolean): ResultSet = empty("SCOPE")
  override def getVersionColumns(c: String, s: String, t: String): ResultSet =
    empty("SCOPE")
  override def getUDTs(c: String, s: String, t: String,
      types: scala.Array[Int]): ResultSet = empty("TYPE_CAT")
  override def getSuperTypes(c: String, s: String, t: String): ResultSet =
    empty("TYPE_CAT")
  override def getSuperTables(c: String, s: String, t: String): ResultSet =
    empty("TABLE_CAT")
  override def getAttributes(c: String, s: String, t: String,
      a: String): ResultSet = empty("TYPE_CAT")
  override def getClientInfoProperties: ResultSet = empty("NAME")
  override def getFunctions(c: String, s: String, f: String): ResultSet = {
    val rows = rowsOf("SHOW FUNCTIONS").sorted.map(fn =>
      Seq[Any](null, null, fn, null,
        DatabaseMetaData.functionResultUnknown, fn))
    GraftResultSet.local(
      Seq("FUNCTION_CAT" -> "STRING", "FUNCTION_SCHEM" -> "STRING",
        "FUNCTION_NAME" -> "STRING", "REMARKS" -> "STRING",
        "FUNCTION_TYPE" -> "INT", "SPECIFIC_NAME" -> "STRING"), rows)
  }
  override def getFunctionColumns(c: String, s: String, f: String,
      col: String): ResultSet = empty("FUNCTION_CAT")
  override def getPseudoColumns(c: String, s: String, t: String,
      col: String): ResultSet = empty("TABLE_CAT")

  // ---- capabilities: honest constants ----
  override def allProceduresAreCallable(): Boolean = false
  override def allTablesAreSelectable(): Boolean = true
  override def isReadOnly: Boolean = false
  override def nullsAreSortedHigh(): Boolean = false
  override def nullsAreSortedLow(): Boolean = true
  override def nullsAreSortedAtStart(): Boolean = false
  override def nullsAreSortedAtEnd(): Boolean = false
  override def usesLocalFiles(): Boolean = false
  override def usesLocalFilePerTable(): Boolean = false
  override def supportsMixedCaseIdentifiers(): Boolean = false
  override def storesUpperCaseIdentifiers(): Boolean = false
  override def storesLowerCaseIdentifiers(): Boolean = true
  override def storesMixedCaseIdentifiers(): Boolean = false
  override def supportsMixedCaseQuotedIdentifiers(): Boolean = true
  override def storesUpperCaseQuotedIdentifiers(): Boolean = false
  override def storesLowerCaseQuotedIdentifiers(): Boolean = false
  override def storesMixedCaseQuotedIdentifiers(): Boolean = true
  override def getIdentifierQuoteString: String = "`"
  override def getSQLKeywords: String = ""
  override def getNumericFunctions: String = ""
  override def getStringFunctions: String = ""
  override def getSystemFunctions: String = ""
  override def getTimeDateFunctions: String = ""
  override def getSearchStringEscape: String = "\\"
  override def getExtraNameCharacters: String = ""
  override def supportsAlterTableWithAddColumn(): Boolean = true
  override def supportsAlterTableWithDropColumn(): Boolean = false
  override def supportsColumnAliasing(): Boolean = true
  override def nullPlusNonNullIsNull(): Boolean = true
  override def supportsConvert(): Boolean = true
  override def supportsConvert(fromType: Int, toType: Int): Boolean = true
  override def supportsTableCorrelationNames(): Boolean = true
  override def supportsDifferentTableCorrelationNames(): Boolean = false
  override def supportsExpressionsInOrderBy(): Boolean = true
  override def supportsOrderByUnrelated(): Boolean = true
  override def supportsGroupBy(): Boolean = true
  override def supportsGroupByUnrelated(): Boolean = true
  override def supportsGroupByBeyondSelect(): Boolean = true
  override def supportsLikeEscapeClause(): Boolean = true
  override def supportsMultipleResultSets(): Boolean = false
  override def supportsMultipleTransactions(): Boolean = false
  override def supportsNonNullableColumns(): Boolean = true
  override def supportsMinimumSQLGrammar(): Boolean = true
  override def supportsCoreSQLGrammar(): Boolean = true
  override def supportsExtendedSQLGrammar(): Boolean = false
  override def supportsANSI92EntryLevelSQL(): Boolean = true
  override def supportsANSI92IntermediateSQL(): Boolean = false
  override def supportsANSI92FullSQL(): Boolean = false
  override def supportsIntegrityEnhancementFacility(): Boolean = false
  override def supportsOuterJoins(): Boolean = true
  override def supportsFullOuterJoins(): Boolean = true
  override def supportsLimitedOuterJoins(): Boolean = true
  override def getSchemaTerm: String = "database"
  override def getProcedureTerm: String = "procedure"
  override def getCatalogTerm: String = "catalog"
  override def isCatalogAtStart: Boolean = true
  override def getCatalogSeparator: String = "."
  override def supportsSchemasInDataManipulation(): Boolean = true
  override def supportsSchemasInProcedureCalls(): Boolean = false
  override def supportsSchemasInTableDefinitions(): Boolean = true
  override def supportsSchemasInIndexDefinitions(): Boolean = false
  override def supportsSchemasInPrivilegeDefinitions(): Boolean = false
  override def supportsCatalogsInDataManipulation(): Boolean = false
  override def supportsCatalogsInProcedureCalls(): Boolean = false
  override def supportsCatalogsInTableDefinitions(): Boolean = false
  override def supportsCatalogsInIndexDefinitions(): Boolean = false
  override def supportsCatalogsInPrivilegeDefinitions(): Boolean = false
  override def supportsPositionedDelete(): Boolean = false
  override def supportsPositionedUpdate(): Boolean = false
  override def supportsSelectForUpdate(): Boolean = false
  override def supportsStoredProcedures(): Boolean = false
  override def supportsSubqueriesInComparisons(): Boolean = true
  override def supportsSubqueriesInExists(): Boolean = true
  override def supportsSubqueriesInIns(): Boolean = true
  override def supportsSubqueriesInQuantifieds(): Boolean = false
  override def supportsCorrelatedSubqueries(): Boolean = true
  override def supportsUnion(): Boolean = true
  override def supportsUnionAll(): Boolean = true
  override def supportsOpenCursorsAcrossCommit(): Boolean = false
  override def supportsOpenCursorsAcrossRollback(): Boolean = false
  override def supportsOpenStatementsAcrossCommit(): Boolean = true
  override def supportsOpenStatementsAcrossRollback(): Boolean = true
  override def getMaxBinaryLiteralLength: Int = 0
  override def getMaxCharLiteralLength: Int = 0
  override def getMaxColumnNameLength: Int = 0
  override def getMaxColumnsInGroupBy: Int = 0
  override def getMaxColumnsInIndex: Int = 0
  override def getMaxColumnsInOrderBy: Int = 0
  override def getMaxColumnsInSelect: Int = 0
  override def getMaxColumnsInTable: Int = 0
  override def getMaxConnections: Int = 0
  override def getMaxCursorNameLength: Int = 0
  override def getMaxIndexLength: Int = 0
  override def getMaxSchemaNameLength: Int = 0
  override def getMaxProcedureNameLength: Int = 0
  override def getMaxCatalogNameLength: Int = 0
  override def getMaxRowSize: Int = 0
  override def doesMaxRowSizeIncludeBlobs(): Boolean = false
  override def getMaxStatementLength: Int = 0
  override def getMaxStatements: Int = 0
  override def getMaxTableNameLength: Int = 0
  override def getMaxTablesInSelect: Int = 0
  override def getMaxUserNameLength: Int = 0
  override def getDefaultTransactionIsolation: Int = Connection.TRANSACTION_NONE
  override def supportsTransactions(): Boolean = false
  override def supportsTransactionIsolationLevel(level: Int): Boolean =
    level == Connection.TRANSACTION_NONE
  override def supportsDataDefinitionAndDataManipulationTransactions(): Boolean = false
  override def supportsDataManipulationTransactionsOnly(): Boolean = false
  override def dataDefinitionCausesTransactionCommit(): Boolean = false
  override def dataDefinitionIgnoredInTransactions(): Boolean = false
  override def supportsResultSetType(t: Int): Boolean =
    t == ResultSet.TYPE_FORWARD_ONLY
  override def supportsResultSetConcurrency(t: Int, c: Int): Boolean =
    t == ResultSet.TYPE_FORWARD_ONLY && c == ResultSet.CONCUR_READ_ONLY
  override def ownUpdatesAreVisible(t: Int): Boolean = false
  override def ownDeletesAreVisible(t: Int): Boolean = false
  override def ownInsertsAreVisible(t: Int): Boolean = false
  override def othersUpdatesAreVisible(t: Int): Boolean = false
  override def othersDeletesAreVisible(t: Int): Boolean = false
  override def othersInsertsAreVisible(t: Int): Boolean = false
  override def updatesAreDetected(t: Int): Boolean = false
  override def deletesAreDetected(t: Int): Boolean = false
  override def insertsAreDetected(t: Int): Boolean = false
  override def supportsBatchUpdates(): Boolean = false
  override def supportsSavepoints(): Boolean = false
  override def supportsNamedParameters(): Boolean = false
  override def supportsMultipleOpenResults(): Boolean = false
  override def supportsGetGeneratedKeys(): Boolean = false
  override def supportsResultSetHoldability(h: Int): Boolean =
    h == ResultSet.CLOSE_CURSORS_AT_COMMIT
  override def getResultSetHoldability: Int = ResultSet.CLOSE_CURSORS_AT_COMMIT
  override def getSQLStateType: Int = DatabaseMetaData.sqlStateSQL
  override def locatorsUpdateCopy(): Boolean = false
  override def supportsStatementPooling(): Boolean = false
  override def getRowIdLifetime: RowIdLifetime = RowIdLifetime.ROWID_UNSUPPORTED
  override def supportsStoredFunctionsUsingCallSyntax(): Boolean = false
  override def autoCommitFailureClosesAllResultSets(): Boolean = false
  override def generatedKeyAlwaysReturned(): Boolean = false

  override def unwrap[T](iface: Class[T]): T =
    if (iface.isInstance(this)) iface.cast(this)
    else throw new SQLException(s"cannot unwrap to ${iface.getName}")
  override def isWrapperFor(iface: Class[_]): Boolean = iface.isInstance(this)
}
