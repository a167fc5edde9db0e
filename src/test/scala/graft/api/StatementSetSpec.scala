package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatementSetSpec extends SparkSpec {

  private def mkSink(env: TableEnv, name: String, cols: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"stmtset_$name").toString + "/t"
    env.executeSql(s"""
      CREATE TABLE $name ($cols) WITH (
        'connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    dir
  }

  test("EXECUTE STATEMENT SET runs every INSERT; both sinks land") {
    val env = TableEnv(spark)
    env.createTemporaryView("ss_lineitem",
      spark.read.parquet(s"$sfDir/lineitem.parquet"))
    mkSink(env, "ss_sink_a", "l_returnflag STRING, n BIGINT")
    mkSink(env, "ss_sink_b", "l_linestatus STRING, q DOUBLE")
    env.executeSql("""
      EXECUTE STATEMENT SET
      BEGIN
        INSERT INTO ss_sink_a
          SELECT l_returnflag, COUNT(*) AS n FROM ss_lineitem GROUP BY l_returnflag;
        INSERT INTO ss_sink_b
          SELECT l_linestatus, CAST(SUM(l_quantity) AS DOUBLE) AS q
          FROM ss_lineitem GROUP BY l_linestatus;
      END""")
    assert(env.from("ss_sink_a").count() == 3) // A/N/R
    assert(env.from("ss_sink_b").count() == 2) // F/O
    // the shared source view is restored to its un-cached read
    assert(env.from("ss_lineitem").count() > 0)
  }

  test("a source referenced by two statements is scanned via one cached plan") {
    val env = TableEnv(spark)
    val src = mkSink(env, "ss_shared_src", "k BIGINT, v DOUBLE")
    spark.range(100).select(col("id").as("k"), rand(7).as("v"))
      .write.mode("overwrite").parquet(src)
    env.refreshTable("ss_shared_src") // private[api]; spec shares the package
    mkSink(env, "ss_out1", "k BIGINT, v DOUBLE")
    mkSink(env, "ss_out2", "n BIGINT")
    val set = env.createStatementSet()
      .addInsertSql("INSERT INTO ss_out1 SELECT k, v FROM ss_shared_src WHERE v > 0.5")
      .addInsertSql("INSERT INTO ss_out2 SELECT COUNT(*) AS n FROM ss_shared_src")
    set.execute()
    val n1 = env.from("ss_out1").count()
    val n2 = env.from("ss_out2").collect().head.getLong(0)
    assert(n2 == 100 && n1 > 0 && n1 < 100)
  }

  test("addInsert writes a DataFrame to a registered sink") {
    val env = TableEnv(spark)
    mkSink(env, "ss_api_sink", "r STRING, n BIGINT")
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .withColumnRenamed("l_returnflag", "r")
    env.createStatementSet().addInsert("ss_api_sink", df).execute()
    assert(env.from("ss_api_sink").count() == 3)
  }

  test("addInsertSql rejects non-INSERT statements") {
    val env = TableEnv(spark)
    intercept[IllegalArgumentException] {
      env.createStatementSet().addInsertSql("SELECT 1")
    }
  }

  test("EXPLAIN PLAN FOR translates to Spark EXPLAIN") {
    val env = TableEnv(spark)
    env.createTemporaryView("ss_exp",
      spark.read.parquet(s"$sfDir/nation.parquet"))
    val rows = env.executeSql(
      "EXPLAIN PLAN FOR SELECT n_name FROM ss_exp WHERE n_nationkey > 3")
      .collect()
    assert(rows.nonEmpty && rows.head.getString(0).contains("Physical Plan"))
  }
}
