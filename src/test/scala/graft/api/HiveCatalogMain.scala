package graft.api

import org.apache.spark.sql.SparkSession

/** Child-JVM driver for HiveCatalogSpec: the catalog implementation is
  * fixed per JVM at first-session creation, so the hive-enabled session
  * cannot share the suite JVM's in-memory-catalog session. Exercises
  * CREATE CATALOG / USE CATALOG / DDL persistence, then restarts the
  * session against the same derby metastore and proves the table
  * metadata survived. */
object HiveCatalogMain {
  def main(args: Array[String]): Unit = {
    val base = args(0)
    val (wh, ms) = (s"$base/warehouse", s"$base/metastore")

    val s1 = HiveCatalog.session(wh, ms)
    s1.sparkContext.setLogLevel("WARN")
    val env = TableEnv(s1)
    env.executeSql("CREATE CATALOG myhive WITH ('type' = 'hive')")
    env.executeSql("USE CATALOG myhive")
    assert(env.executeSql("SHOW CATALOGS").collect()
      .map(_.getString(0)).toSet == Set("default_catalog", "myhive"))
    env.executeSql(s"""
      CREATE TABLE hive_t (k BIGINT, v STRING)
      WITH ('connector' = 'filesystem', 'path' = '$base/data/hive_t',
            'format' = 'parquet')""")
    env.executeSql("INSERT INTO hive_t VALUES (1, 'a'), (2, 'b')")
    assert(s1.sql("SELECT COUNT(*) FROM hive_t").head().getLong(0) == 2)
    s1.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // a FRESH session over the same metastore: the table resolves from
    // the catalog, no DDL re-run — persistence is the whole point
    val s2 = HiveCatalog.session(wh, ms)
    s2.sparkContext.setLogLevel("WARN")
    val rows = s2.sql("SELECT k, v FROM hive_t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b")), s"got $rows")
    // and the schema came from the metastore entry
    assert(s2.table("hive_t").schema.fieldNames.toSeq == Seq("k", "v"))
    s2.stop()
    println("HIVE_CATALOG_OK")
  }
}
