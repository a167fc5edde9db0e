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

  test("TUMBLE/HOP TVF offset argument shifts window alignment") {
    val flink = """
      SELECT window_start, event_type, COUNT(*) AS n
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR,
                        INTERVAL '15' MINUTE))
      GROUP BY window_start, event_type"""
    val got = env.executeSql(FlinkSqlDialect.translate(flink))
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour", "1 hour", "15 minutes")("start")
        .as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // every window_start sits 15 min past the hour
    assert(got.selectExpr("minute(window_start)").distinct()
      .collect().map(_.getInt(0)).toSet == Set(15))
    // HOP keeps its per-row window multiplicity with an offset present
    val hop = """
      SELECT COUNT(*) AS n
      FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
        INTERVAL '30' MINUTE, INTERVAL '1' HOUR, INTERVAL '10' MINUTE))"""
    val n = env.executeSql(FlinkSqlDialect.translate(hop))
      .collect().head.getLong(0)
    assert(n == 2 * Tables.load(spark, sfDir, "events").count())
  }

  test("COLLECT rewrites to the collect_multiset UDAGG (MULTISET as count-map)") {
    val got = env.executeSql(FlinkSqlDialect.translate("""
      SELECT o_orderpriority, COLLECT(o_orderstatus) AS ms
      FROM orders GROUP BY o_orderpriority"""))
    val row = got.filter(col("o_orderpriority").isNotNull).collect().head
    val ms = row.getMap[String, Int](1)
    assert(ms.nonEmpty && ms.values.forall(_ > 0))
    // counts add up to the group's row count
    val prio = row.getString(0)
    val total = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === prio).count()
    assert(ms.values.sum == total)
    // collect_list / collect_set are untouched by the rewrite
    assert(FlinkSqlDialect.translate("SELECT collect_list(x) FROM t")
      .contains("collect_list(x)"))
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

  test("SUM0, RAND_INTEGER, SIMILAR TO rewrite and evaluate") {
    val t1 = FlinkSqlDialect.translate(
      "SELECT SUM0(n_regionkey) AS s FROM nation WHERE n_nationkey < 0")
    assert(t1.contains("coalesce(sum(n_regionkey), 0)"))
    assert(env.executeSql(t1).collect().head.getLong(0) == 0L)

    val t2 = FlinkSqlDialect.translate("SELECT RAND_INTEGER(10) AS r FROM nation")
    val rs = env.executeSql(t2).collect().map(_.getInt(0))
    assert(rs.forall(r => r >= 0 && r < 10))

    val t3 = FlinkSqlDialect.translate(
      "SELECT COUNT(*) AS n FROM nation WHERE n_name SIMILAR TO 'N%'")
    assert(t3.contains("rlike '^N.*$'"))
    val direct = env.executeSql(
      "SELECT COUNT(*) AS n FROM nation WHERE n_name LIKE 'N%'")
      .collect().head.getLong(0)
    assert(env.executeSql(t3).collect().head.getLong(0) == direct)

    // _ wildcard + passthrough character class: NATION_<single digit>
    val t4 = FlinkSqlDialect.translate(
      "SELECT COUNT(*) AS n FROM nation WHERE n_name SIMILAR TO 'NATION_[0-9]'")
    val eightChars = env.executeSql(
      "SELECT COUNT(*) AS n FROM nation WHERE length(n_name) = 8")
      .collect().head.getLong(0)
    assert(env.executeSql(t4).collect().head.getLong(0) == eightChars)
  }

  test("SIMILAR TO wildcards are not substituted inside bracket classes") {
    // '_' and '%' inside [...] are class members, not wildcards
    assert(FlinkSqlDialect.similarToRegex("[a_b]x_%") == "[a_b]x..*")
    assert(FlinkSqlDialect.similarToRegex("[.%]_") == "[.%].")
    // outside a class, '.' is literal and must be escaped
    assert(FlinkSqlDialect.similarToRegex("a.b%") == "a\\.b.*")
    // escaped characters pass through untouched
    assert(FlinkSqlDialect.similarToRegex("""a\%b%""") == """a\%b.*""")
    val spark2 = spark
    import spark2.implicits._
    Seq("a_b", "axb", "aXb").toDF("s").createOrReplaceTempView("sim_t")
    val t = FlinkSqlDialect.translate(
      "SELECT COUNT(*) AS n FROM sim_t WHERE s SIMILAR TO 'a[x_]b'")
    // class matches only literal 'x' or '_' in the middle — not 'X'
    assert(env.executeSql(t).collect().head.getLong(0) == 2L)
  }

  test("JSON constructors and aggregates rewrite") {
    val t1 = FlinkSqlDialect.translate(
      "SELECT JSON_OBJECT(KEY 'name' VALUE n_name) AS j FROM nation WHERE n_nationkey = 0")
    assert(env.executeSql(t1).collect().head.getString(0).contains("\"name\""))
    val t2 = FlinkSqlDialect.translate(
      "SELECT JSON_ARRAYAGG(n_nationkey) AS j FROM nation")
    val arr = env.executeSql(t2).collect().head.getString(0)
    assert(arr.startsWith("[") && arr.contains("0"))
    val t3 = FlinkSqlDialect.translate(
      "SELECT JSON_OBJECTAGG(KEY n_name VALUE n_nationkey) AS j " +
        "FROM nation WHERE n_nationkey < 2")
    val obj = env.executeSql(t3).collect().head.getString(0)
    assert(obj.contains("\"NATION_0\":0") && obj.contains("\"NATION_1\":1"))
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

  test("legacy GROUP BY TUMBLE + TUMBLE_START/END matches window()") {
    val flink = """
      SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws,
             TUMBLE_END(ts, INTERVAL '1' HOUR) AS we,
             event_type, COUNT(*) AS n
      FROM events
      GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type"""
    val got = env.executeSql(flink)
    val w = window(col("ts"), "1 hour")
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(w.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("event_type"), col("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("legacy GROUP BY HOP maps slide/size to window(size, slide)") {
    val flink = """
      SELECT HOP_START(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) AS ws,
             COUNT(*) AS n
      FROM events
      GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)"""
    val got = env.executeSql(flink)
    val w = window(col("ts"), "1 hour", "30 minutes")
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(w.as("w")).agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("legacy GROUP BY SESSION maps to session_window()") {
    val flink = """
      SELECT SESSION_START(ts, INTERVAL '30' MINUTE) AS ws,
             user_id, COUNT(*) AS n
      FROM events
      GROUP BY SESSION(ts, INTERVAL '30' MINUTE), user_id"""
    val got = env.executeSql(flink)
    val w = session_window(col("ts"), "30 minutes")
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(w.as("w"), col("user_id")).agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("user_id"), col("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("CROSS JOIN UNNEST rewrites to LATERAL VIEW explode/inline") {
    spark.sql("""SELECT 1L AS id, array('a', 'b') AS tags,
        array(named_struct('k', 'x', 'v', 1),
              named_struct('k', 'y', 'v', 2)) AS kvs""")
      .createOrReplaceTempView("unnest_t")
    // single column -> explode
    val tags = env.executeSql("""
      SELECT id, tag FROM unnest_t
      CROSS JOIN UNNEST(tags) AS u(tag)""")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(tags == Set((1L, "a"), (1L, "b")))
    // array-of-row, n columns -> inline
    val kvs = env.executeSql("""
      SELECT id, k, v FROM unnest_t
      CROSS JOIN UNNEST(kvs) AS u(k, v)""")
      .collect().map(r => (r.getString(1), r.getInt(2))).toSet
    assert(kvs == Set(("x", 1), ("y", 2)))
    // WITH ORDINALITY -> inline over the 1-based-index zip: value
    // column first, 1-BASED ordinal last (reference semantics)
    val ord = env.executeSql("""
      SELECT id, tag, o FROM unnest_t
      CROSS JOIN UNNEST(tags) WITH ORDINALITY AS u(tag, o)""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(ord == Set((1L, "a", 1), (1L, "b", 2)))
    // empty and NULL arrays yield zero rows (CROSS JOIN semantics) —
    // the sequence floor must not leak a padded row
    spark.sql("""SELECT * FROM VALUES
        (1L, array('x')), (2L, array()), (3L, CAST(NULL AS ARRAY<STRING>))
        AS t(id, tags)""").createOrReplaceTempView("unnest_edge")
    val edge = env.executeSql("""
      SELECT id, tag, o FROM unnest_edge
      CROSS JOIN UNNEST(tags) WITH ORDINALITY AS u(tag, o)""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(edge == Set((1L, "x", 1)))
    // ordinality over array-of-row raises with a pointer (no posinline)
    val eOrd = intercept[IllegalArgumentException] {
      FlinkSqlDialect.translate("""
        SELECT id, k, v, o FROM unnest_t
        CROSS JOIN UNNEST(kvs) WITH ORDINALITY AS u(k, v, o)""")
    }
    assert(eOrd.getMessage.contains("single-column"))
    // ordinality without a column list raises, not silent pass-through
    val eOrd2 = intercept[IllegalArgumentException] {
      FlinkSqlDialect.translate(
        "SELECT id FROM unnest_t CROSS JOIN UNNEST(tags) WITH ORDINALITY AS u")
    }
    assert(eOrd2.getMessage.contains("column list"))
    // ...but only when attached to an UNNEST clause — a string literal
    // containing the words is fine
    assert(env.executeSql(
      "SELECT 'WITH ORDINALITY' AS s FROM unnest_t").count() == 1)
    // a JOIN after the UNNEST clause would put LATERAL VIEW before a
    // join relation, which Spark can't parse — raise with guidance
    val e1 = intercept[IllegalArgumentException] {
      FlinkSqlDialect.translate("""
        SELECT id, tag FROM unnest_t
        CROSS JOIN UNNEST(tags) AS u(tag)
        JOIN other_t o ON o.id = unnest_t.id""")
    }
    assert(e1.getMessage.contains("after all join relations"))
    // alias without a column list cannot be rewritten — raise, don't
    // pass through silently
    val e2 = intercept[IllegalArgumentException] {
      FlinkSqlDialect.translate(
        "SELECT id FROM unnest_t CROSS JOIN UNNEST(tags) AS u")
    }
    assert(e2.getMessage.contains("column list"))
  }

  test("EXPLAIN detail modes map to Spark's; unmappable ones raise") {
    val cost = env.executeSql(FlinkSqlDialect.translate(
      "EXPLAIN ESTIMATED_COST SELECT COUNT(*) FROM region"))
      .collect().head.getString(0)
    assert(cost.contains("Statistics") || cost.contains("sizeInBytes"))
    val fmt = env.executeSql(FlinkSqlDialect.translate(
      "EXPLAIN JSON_EXECUTION_PLAN SELECT COUNT(*) FROM region"))
      .collect().head.getString(0)
    assert(fmt.contains("(1)") || fmt.contains("HashAggregate"))
    val e = intercept[IllegalArgumentException](FlinkSqlDialect.translate(
      "EXPLAIN CHANGELOG_MODE SELECT * FROM region"))
    assert(e.getMessage.contains("row_kind"))
  }

  test("Flink join hints map to Spark strategies; runtime hints raise") {
    // SHUFFLE_MERGE -> MERGE (sort-merge join)
    val smj = env.executeSql("""
      SELECT /*+ SHUFFLE_MERGE(o) */ o.o_orderkey
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""")
    assert(smj.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
    // NEST_LOOP -> SHUFFLE_REPLICATE_NL (cartesian)
    val nl = env.executeSql("""
      SELECT /*+ NEST_LOOP(n) */ n.n_name, r.r_name
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey""")
    assert(nl.queryExecution.executedPlan.toString
      .contains("CartesianProduct"))
    // BROADCAST passes through with Spark's own name
    val bc = env.executeSql("""
      SELECT /*+ BROADCAST(r) */ n.n_name
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey""")
    assert(bc.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    // streaming-runtime hints raise with a pointer, never silently drop
    intercept[IllegalArgumentException] {
      env.executeSql(
        "SELECT /*+ OPTIONS('a'='b') */ * FROM nation")
    }
    intercept[IllegalArgumentException] {
      env.executeSql(
        "SELECT /*+ LOOKUP('table'='d') */ * FROM nation")
    }
    // ... including when combined after another hint in the same block
    intercept[IllegalArgumentException] {
      env.executeSql(
        "SELECT /*+ BROADCAST(r), OPTIONS('a'='b') */ n.n_name " +
          "FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey")
    }
    // hint names inside string literals are data, not hints
    val lit = env.executeSql("SELECT 'NEST_LOOP(a)' AS tag FROM region")
      .collect().head.getString(0)
    assert(lit == "NEST_LOOP(a)")
  }

  test("long-tail names: TRANSLATE3, MAP_UNION, CURRENT_ROW_TIMESTAMP, JSON_QUOTE/UNQUOTE") {
    val t1 = FlinkSqlDialect.translate(
      "SELECT TRANSLATE3(n_name, 'AEIOU', 'aeiou') AS x FROM nation")
    assert(t1.contains("translate(n_name"))
    assert(env.executeSql(t1).collect().forall(r =>
      !r.getString(0).exists("AEIOU".contains(_))))

    val t2 = FlinkSqlDialect.translate(
      "SELECT MAP_UNION(map('a', 1), map('b', 2)) AS m FROM region LIMIT 1")
    assert(t2.contains("map_concat("))
    assert(env.executeSql(t2).collect().head
      .getMap[String, Int](0).size == 2)

    val t3 = FlinkSqlDialect.translate(
      "SELECT CURRENT_ROW_TIMESTAMP() AS ts FROM region LIMIT 1")
    assert(t3.contains("current_timestamp()"))
    assert(env.executeSql(t3).count() == 1)

    // quote escapes the quote char; unquote round-trips
    val t4 = FlinkSqlDialect.translate(
      "SELECT JSON_QUOTE(n_name) AS q FROM nation WHERE n_nationkey = 0")
    val q = env.executeSql(t4).collect().head.getString(0)
    assert(q.startsWith("\"") && q.endsWith("\""))
    val t5 = FlinkSqlDialect.translate(
      "SELECT JSON_UNQUOTE(j) AS u FROM (SELECT '\"abc\"' AS j)")
    assert(env.executeSql(t5).collect().head.getString(0) == "abc")
  }
}
