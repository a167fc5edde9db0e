package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** `CURRENT_WATERMARK(rowtime)` bound into SQL text
  * ([[CurrentWatermarkSql]]): a DDL streaming table's rows are
  * annotated with the operator-held watermark, NULL before the first
  * advancement — and the validator rejects the same shapes the
  * reference rejects (non-rowtime argument, unregistered table). */
class CurrentWatermarkSqlSpec extends SparkSpec {
  import spark.implicits._

  test("SELECT CURRENT_WATERMARK(ets) annotates each batch with the prior batch's watermark") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val env = TableEnv(spark)
      val dir = java.nio.file.Files.createTempDirectory("cw_sql").toString
      Seq((1L, 1000L)).toDF("id", "epoch")
        .write.mode("append").parquet(s"$dir/t")
      env.executeSql(s"""
        CREATE TABLE cw_t (
          id BIGINT,
          epoch BIGINT,
          ets AS timestamp_millis(epoch),
          WATERMARK FOR ets AS ets - INTERVAL '0' SECOND
        ) WITH ('connector' = 'filesystem', 'path' = '$dir/t',
                'format' = 'parquet')""")
      val df = env.executeSql(
        "SELECT id, CURRENT_WATERMARK(ets) AS wm FROM cw_t")
      assert(df.isStreaming)
      val q = df.writeStream.format("memory").queryName("cw_sql_q")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // batch 2: a later file — its rows see watermark = batch-1 max
        Seq((2L, 5000L)).toDF("id", "epoch")
          .write.mode("append").parquet(s"$dir/t")
        q.processAllAvailable()
        Seq((3L, 9000L)).toDF("id", "epoch")
          .write.mode("append").parquet(s"$dir/t")
        q.processAllAvailable()
        val rows = spark.table("cw_sql_q")
          .select(col("id"), col("wm")).collect()
          .map(r => r.getLong(0) ->
            Option(r.getAs[Timestamp](1)).map(_.getTime)).toMap
        assert(rows(1L).isEmpty) // watermark not yet advanced -> NULL
        assert(rows(2L).contains(1000L))
        assert(rows(3L).contains(5000L))
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("validator: non-rowtime argument and unknown table raise pointed errors") {
    val env = TableEnv(spark)
    val dir = java.nio.file.Files.createTempDirectory("cw_err").toString
    Seq((1L, 1000L)).toDF("id", "epoch")
      .write.mode("append").parquet(s"$dir/t")
    env.executeSql(s"""
      CREATE TABLE cw_e (
        id BIGINT,
        epoch BIGINT,
        ets AS timestamp_millis(epoch),
        WATERMARK FOR ets AS ets - INTERVAL '0' SECOND
      ) WITH ('connector' = 'filesystem', 'path' = '$dir/t',
              'format' = 'parquet')""")
    val e1 = intercept[IllegalArgumentException](
      env.executeSql("SELECT CURRENT_WATERMARK(epoch) FROM cw_e"))
    assert(e1.getMessage.contains("watermark column"))
    val e2 = intercept[IllegalArgumentException](
      env.executeSql("SELECT CURRENT_WATERMARK(ts) FROM nope"))
    assert(e2.getMessage.contains("not a registered table"))
    // case-insensitive identifiers resolve like everywhere in Spark
    assert(env.executeSql(
      "SELECT id, CURRENT_WATERMARK(ETS) AS wm FROM cw_e").isStreaming)
    // EVERY occurrence is validated, not just the first
    val e3 = intercept[IllegalArgumentException](env.executeSql(
      "SELECT CURRENT_WATERMARK(ets) AS a, CURRENT_WATERMARK(epoch) AS b" +
        " FROM cw_e"))
    assert(e3.getMessage.contains("watermark column"))
  }

  test("validator: multi-FROM and JOIN shapes are rejected pointedly; aliases work") {
    val env = TableEnv(spark)
    val dir = java.nio.file.Files.createTempDirectory("cw_scope").toString
    Seq((1L, 1000L)).toDF("id", "epoch")
      .write.mode("append").parquet(s"$dir/t")
    env.executeSql(s"""
      CREATE TABLE cw_s (
        id BIGINT,
        epoch BIGINT,
        ets AS timestamp_millis(epoch),
        WATERMARK FOR ets AS ets - INTERVAL '0' SECOND
      ) WITH ('connector' = 'filesystem', 'path' = '$dir/t',
              'format' = 'parquet')""")
    // a scalar subquery whose FROM comes FIRST textually: without the
    // multi-FROM gate the rewrite would target the inner table
    val e1 = intercept[IllegalArgumentException](env.executeSql(
      "SELECT (SELECT max(id) FROM cw_s), CURRENT_WATERMARK(ets) FROM cw_s"))
    assert(e1.getMessage.contains("FROM clauses"))
    // a derived-table FROM
    val e2 = intercept[IllegalArgumentException](env.executeSql(
      "SELECT CURRENT_WATERMARK(ets) FROM (SELECT * FROM cw_s)"))
    assert(e2.getMessage.contains("FROM clauses"))
    // JOIN inputs each hold their own watermark: rejected, not guessed
    val e3 = intercept[IllegalArgumentException](env.executeSql(
      "SELECT CURRENT_WATERMARK(ets) FROM cw_s JOIN cw_s ON 1=1"))
    assert(e3.getMessage.contains("JOIN"))
    // FROM t AS alias: supported — the rewrite keeps the alias intact
    assert(env.executeSql(
      "SELECT a.id, CURRENT_WATERMARK(a.ets) AS wm FROM cw_s AS a")
      .isStreaming)
    assert(env.executeSql(
      "SELECT b.id, CURRENT_WATERMARK(ets) AS wm FROM cw_s b")
      .isStreaming)
    // keywords INSIDE string literals and comments are not clauses:
    // these are single-input queries and must pass the validator
    assert(env.executeSql(
      "SELECT id, 'copied from legacy join' AS src, " +
        "CURRENT_WATERMARK(ets) AS wm FROM cw_s").isStreaming)
    assert(env.executeSql(
      "SELECT id, CURRENT_WATERMARK(ets) AS wm -- join notes from ops\n" +
        "FROM cw_s").isStreaming)
    assert(env.executeSql(
      "SELECT id, /* from a review */ CURRENT_WATERMARK(ets) AS wm " +
        "FROM cw_s").isStreaming)
    // an escaped quote inside the literal does not unbalance the mask
    assert(env.executeSql(
      "SELECT id, 'it''s from x' AS n, CURRENT_WATERMARK(ets) AS wm " +
        "FROM cw_s").isStreaming)
    // scalar-function FROM syntax is expression syntax, not a table
    // clause: SUBSTRING(x FROM n FOR m), EXTRACT(unit FROM ts) and
    // TRIM(... FROM x) are all single-input queries and must pass
    assert(env.executeSql(
      "SELECT SUBSTRING(CAST(id AS STRING) FROM 1 FOR 2) AS s, " +
        "CURRENT_WATERMARK(ets) AS wm FROM cw_s").isStreaming)
    assert(env.executeSql(
      "SELECT EXTRACT(HOUR FROM ets) AS hh, " +
        "CURRENT_WATERMARK(ets) AS wm FROM cw_s").isStreaming)
    assert(env.executeSql(
      "SELECT TRIM(BOTH 'x' FROM CAST(id AS STRING)) AS t, " +
        "CURRENT_WATERMARK(ets) AS wm FROM cw_s").isStreaming)
    // ...but a scalar subquery INSIDE a function call is still a
    // second FROM clause and still rejects
    val e4 = intercept[IllegalArgumentException](env.executeSql(
      "SELECT COALESCE((SELECT max(id) FROM cw_s), 0) AS m, " +
        "CURRENT_WATERMARK(ets) AS wm FROM cw_s"))
    assert(e4.getMessage.contains("FROM clauses"))
    // a function FROM appearing BEFORE the clause FROM must not be
    // picked as the table name by the rewriter
    assert(env.executeSql(
      "SELECT EXTRACT(HOUR FROM ets) AS hh, CURRENT_WATERMARK(ets) AS wm " +
        "FROM cw_s WHERE id > 0").isStreaming)
  }
}
