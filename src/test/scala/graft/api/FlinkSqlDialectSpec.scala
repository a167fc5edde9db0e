package graft.api

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class FlinkSqlDialectSpec extends SparkSpec {

  private lazy val env = {
    Tables.registerAll(spark, sfDir)
    TableEnv(spark)
  }

  test("TUMBLE TVF translates and matches window() aggregation") {
    val flink = """
      SELECT window_start, event_type, COUNT(*) AS n
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
      GROUP BY window_start, event_type"""
    val got = env.executeSql(FlinkSqlDialect.translate(flink))
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour")("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("HOP TVF emits each row into size/slide windows") {
    val flink = """
      SELECT COUNT(*) AS n
      FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
        INTERVAL '30' MINUTE, INTERVAL '1' HOUR))"""
    val n = env.executeSql(FlinkSqlDialect.translate(flink))
      .collect().head.getLong(0)
    val events = Tables.load(spark, sfDir, "events").count()
    assert(n == 2 * events) // every row in exactly 2 hop windows
  }

  test("CUMULATE TVF matches the operator implementation") {
    val flink = """
      SELECT window_start, window_end, COUNT(*) AS n
      FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts),
        INTERVAL '15' MINUTE, INTERVAL '1' HOUR))
      GROUP BY window_start, window_end"""
    val got = env.executeSql(FlinkSqlDialect.translate(flink))
    val want = graft.operators.TimeWindows
      .cumulate(Tables.load(spark, sfDir, "events"), "ts", 900L, 3600L)
      .groupBy(col("window_start"), col("window_end"))
      .agg(count(lit(1)).as("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("SESSION TVF matches session_window aggregation") {
    val flink = """
      SELECT window_start AS session_start, user_id, COUNT(*) AS n
      FROM TABLE(SESSION(TABLE events PARTITION BY user_id,
        DESCRIPTOR(ts), INTERVAL '10' MINUTE))
      GROUP BY window_start, user_id"""
    val got = env.executeSql(FlinkSqlDialect.translate(flink))
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(session_window(col("ts"), "10 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("session_start"), col("user_id"), col("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("SESSION TVF window_end is last event plus gap") {
    val flink = """
      SELECT window_start, window_end, user_id, COUNT(*) AS n
      FROM TABLE(SESSION(TABLE events PARTITION BY user_id,
        DESCRIPTOR(ts), INTERVAL '10' MINUTE))
      GROUP BY window_start, window_end, user_id"""
    val got = env.executeSql(FlinkSqlDialect.translate(flink))
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(session_window(col("ts"), "10 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("user_id"), col("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("PROCTIME and LISTAGG rewrite") {
    val t = FlinkSqlDialect.translate(
      "SELECT PROCTIME() AS p, LISTAGG(n_name) AS names FROM nation")
    assert(t.contains("current_timestamp()"))
    assert(t.contains("concat_ws(',', collect_list(n_name))"))
    assert(env.executeSql(t).count() == 1)
  }

  test("unsupported constructs point at the operator API") {
    intercept[IllegalArgumentException] {
      FlinkSqlDialect.translate("SELECT * FROM t MATCH_RECOGNIZE (..)")
    }
    intercept[IllegalArgumentException] {
      FlinkSqlDialect.translate(
        "SELECT * FROM a JOIN b FOR SYSTEM_TIME AS OF a.ts ON a.k = b.k")
    }
  }
}
