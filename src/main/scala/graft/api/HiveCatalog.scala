package graft.api

import org.apache.spark.sql.SparkSession

/** Hive catalog support — reference: flink-connectors/flink-connector-hive
  * HiveCatalog.java (persistent table metadata in a Hive metastore) and
  * the `CREATE CATALOG ... WITH ('type'='hive')` DDL
  * (docs/content/docs/connectors/table/hive/hive_catalog.md).
  *
  * Spark ships its own Hive metastore client (hive-metastore + derby in
  * /opt/spark/jars), so the wiring is Spark-native: a session built with
  * `enableHiveSupport()` against a derby-backed local metastore persists
  * table metadata across sessions — the property that distinguishes a
  * catalog from the session-scoped temp-view registry. [[TableEnv]]
  * activates persistence via `CREATE CATALOG` + `USE CATALOG`; tables
  * registered while a hive catalog is active are ALSO written to the
  * metastore as external tables (schema + format + location), so a new
  * session sees them without re-running DDL.
  *
  * Caveat (documented, not faked): the catalog implementation is fixed
  * per JVM at first-session creation — `CREATE CATALOG ... ('type' =
  * 'hive')` therefore requires a session built via [[session]] (or any
  * enableHiveSupport builder) and raises otherwise, rather than
  * pretending an in-memory catalog persists.
  */
object HiveCatalog {

  /** Are the Hive metastore classes on the classpath? */
  def available: Boolean =
    try { Class.forName("org.apache.hadoop.hive.conf.HiveConf"); true }
    catch { case _: Throwable => false }

  /** A Hive-metastore-backed session: derby metastore at `metastoreDir`,
    * managed-table warehouse at `warehouseDir`. */
  def session(warehouseDir: String, metastoreDir: String,
      cpus: Int = 4): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastoreDir;create=true")
      .enableHiveSupport()
      .getOrCreate()

  /** Is this session backed by a persistent (hive) catalog? */
  def isHiveSession(spark: SparkSession): Boolean =
    spark.conf.get("spark.sql.catalogImplementation", "in-memory") == "hive"

  /** Persist a filesystem table into the metastore as an EXTERNAL table
    * (schema + format + location) — the reference HiveCatalog's
    * createTable. Virtual columns (proctime, computed, metadata) are
    * excluded: computed on read, never stored. (The metastore entry
    * carries the PHYSICAL table only — virtual-column definitions are
    * session state; re-declare them via DDL or a compiled plan in a new
    * session, as the reference's catalog-stored computed columns do via
    * their own DDL replay.) */
  def persist(spark: SparkSession, name: String, spec: TableSpec): Unit = {
    val schema = spec.schema.getOrElse(
      spark.read.format(spec.format).load(spec.path).schema)
    val virtual = TableEnv.virtualCols(spec)
    val physical = org.apache.spark.sql.types.StructType(
      schema.filterNot(f => virtual.contains(f.name)))
    val part = if (spec.partitions.nonEmpty)
      s" PARTITIONED BY (${spec.partitions.mkString(", ")})" else ""
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$name` (${physical.toDDL}) " +
      s"USING ${spec.format}$part LOCATION '${spec.path}'")
  }

  /** Remove a table's metastore entry (keeps the external data). */
  def unpersist(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
}
