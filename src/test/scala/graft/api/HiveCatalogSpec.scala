package graft.api

import scala.jdk.CollectionConverters._
import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Hive catalog: persistent table metadata across sessions. Runs in a
  * CHILD JVM because the catalog implementation (in-memory vs hive) is
  * fixed per JVM at first-session creation and every other suite shares
  * the in-memory-catalog session. */
class HiveCatalogSpec extends AnyFunSuite {

  test("hive metastore classes ship with the Spark jars") {
    assert(HiveCatalog.available)
  }

  test("CREATE CATALOG requires a hive-enabled session, with a pointer") {
    val env = TableEnv(graft.SparkSpec.session)
    val e = intercept[IllegalArgumentException](
      env.executeSql("CREATE CATALOG h WITH ('type' = 'hive')"))
    assert(e.getMessage.contains("HiveCatalog.session"))
    val e2 = intercept[IllegalArgumentException](
      env.executeSql("CREATE CATALOG x WITH ('type' = 'bogus')"))
    assert(e2.getMessage.contains("supported: hive"))
  }

  test("DDL tables persist in the metastore across sessions (child JVM)") {
    val base = java.nio.file.Files.createTempDirectory("hivecat").toString
    val javaBin = System.getProperty("java.home") + "/bin/java"
    // propagate this JVM's --add-opens flags (Spark-on-17 requirement);
    // they may arrive as "--add-opens=x" single tokens or as two tokens
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
    val opens = jvmArgs.filter(_.startsWith("--add-opens=")) ++
      (jvmArgs :+ "").sliding(2).collect {
        case List("--add-opens", v) => List("--add-opens", v)
      }.flatten
    val cmd = Seq(javaBin) ++ opens ++ Seq(
      "-Xmx2g",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      s"-Dderby.system.home=$base",
      "-cp", System.getProperty("java.class.path"),
      "graft.api.HiveCatalogMain", base)
    val out = new StringBuilder
    val code = Process(cmd, new java.io.File(base))
      .!(ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(code == 0, s"child JVM failed:\n${out.toString.takeRight(4000)}")
    assert(out.toString.contains("HIVE_CATALOG_OK"))
  }
}
