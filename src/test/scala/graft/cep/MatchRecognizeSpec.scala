package graft.cep

import graft.SparkSpec
import graft.api.TableEnv
import graft.core.Tables
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class MatchRecognizeSpec extends SparkSpec {

  private def mkEvents(rows: Seq[(Long, Long, String, Long, Double)]): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("t", LongType),
      StructField("value", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3, r._4, r._5))),
      schema).createOrReplaceTempView("mr_events")
  }

  test("parse extracts all clauses") {
    val spec = MatchRecognize.parse("""
      SELECT * FROM t MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts, event_id
        MEASURES FIRST(A.ts) AS start_ts, COUNT(B.*) AS n_b
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B*? C{1,3})
        WITHIN INTERVAL '10' MINUTE
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b'
      ) AS m""")
    assert(spec.inputTable == "t")
    assert(spec.partitionBy == Seq("user_id"))
    assert(spec.orderBy == Seq("ts", "event_id"))
    assert(spec.measures == Seq(("FIRST(A.ts)", "start_ts"),
      ("COUNT(B.*)", "n_b")))
    assert(spec.branches == Seq(Seq(
      MatchRecognize.PatSym("A", 1, 1, greedy = true),
      MatchRecognize.PatSym("B", 0, Int.MaxValue, greedy = false),
      MatchRecognize.PatSym("C", 1, 3, greedy = true))))
    assert(spec.withinMs.contains(600000L))
    assert(spec.defines("A") == "A.event_type = 'a'")
  }

  test("measure rewrite compiles step references to array exprs") {
    val syms = Seq("A", "B")
    assert(MatchRecognize.rewriteMeasure("FIRST(A.ts)", syms) ==
      "try_element_at(__m_A, 1).ts")
    assert(MatchRecognize.rewriteMeasure("LAST(B.v)", syms) ==
      "try_element_at(__m_B, -1).v")
    assert(MatchRecognize.rewriteMeasure("COUNT(B.*)", syms) ==
      "CAST(size(__m_B) AS BIGINT)")
    assert(MatchRecognize.rewriteMeasure("A.v", syms) ==
      "try_element_at(__m_A, -1).v")
  }

  test("quantified funnel pattern binds and measures correctly") {
    mkEvents(Seq(
      // user 1: signup, 3 clicks, purchase -> one match, greedy clicks
      (1L, 1L, "signup", 100L, 1.0), (2L, 1L, "click", 200L, 2.0),
      (3L, 1L, "click", 300L, 3.0), (4L, 1L, "click", 400L, 4.0),
      (5L, 1L, "purchase", 500L, 50.0),
      // user 2: signup then purchase with no clicks -> B* matches empty
      (6L, 2L, "signup", 100L, 1.0), (7L, 2L, "purchase", 200L, 20.0),
      // user 3: clicks interrupted by a view -> strict contiguity fails
      (8L, 3L, "signup", 100L, 1.0), (9L, 3L, "click", 200L, 2.0),
      (10L, 3L, "view", 300L, 0.0), (11L, 3L, "purchase", 400L, 40.0)))
    val env = TableEnv(spark)
    val out = env.executeSql("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t, event_id
        MEASURES FIRST(S.t) AS start_t, COUNT(C.*) AS n_clicks,
                 SUM(C.value) AS click_sum, LAST(P.value) AS buy_value
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (S C* P)
        DEFINE S AS S.event_type = 'signup',
               C AS C.event_type = 'click',
               P AS P.event_type = 'purchase'
      )""").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    // SQL aggregate semantics: SUM over an empty match set is NULL
    assert(out.toSeq == Seq(
      (1L, 100L, 3L, 9.0, 50.0),
      (2L, 100L, 0L, null, 20.0)))
  }

  test("WITHIN bounds the match window") {
    mkEvents(Seq(
      (1L, 1L, "a", 0L, 0.0), (2L, 1L, "b", 500L, 0.0),       // inside
      (3L, 2L, "a", 0L, 0.0), (4L, 2L, "b", 5000L, 0.0)))     // outside
    val env = TableEnv(spark)
    // long ORDER BY column: WITHIN interval converts to ms units
    val out = env.executeSql("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES LAST(B.t) AS end_t
        PATTERN (A B)
        WITHIN INTERVAL '1' SECOND
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b'
      )""").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("SKIP PAST LAST ROW does not overlap matches") {
    mkEvents(Seq(
      (1L, 1L, "a", 100L, 0.0), (2L, 1L, "a", 200L, 0.0),
      (3L, 1L, "a", 300L, 0.0)))
    val env = TableEnv(spark)
    val out = env.executeSql("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES FIRST(A.t) AS t0, LAST(B.t) AS t1
        PATTERN (A B)
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'a'
      )""").collect()
    // rows 1+2 match; row 3 has no partner -> exactly one match
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((100L, 200L)))
  }

  test("unsupported clauses raise") {
    intercept[IllegalArgumentException] {
      MatchRecognize.parse("""SELECT * FROM t MATCH_RECOGNIZE (
        ORDER BY ts MEASURES A.x AS x AFTER MATCH SKIP HALFWAY
        PATTERN (A) DEFINE A AS true)""")
    }
    // SKIP TO FIRST|LAST var now parses
    val st = MatchRecognize.parse("""SELECT * FROM t MATCH_RECOGNIZE (
      ORDER BY ts MEASURES A.x AS x AFTER MATCH SKIP TO FIRST A
      PATTERN (A B) DEFINE A AS true)""")
    assert(st.skipTo.contains((true, "A")))
    // a group without a quantifier is plain sequencing - supported
    val grouped = MatchRecognize.parse("""SELECT * FROM t MATCH_RECOGNIZE (
      ORDER BY ts MEASURES A.x AS x PATTERN ((A B) C) DEFINE A AS true)""")
    assert(grouped.branches == Seq(Seq(
      MatchRecognize.PatSym("A", 1, 1, greedy = true),
      MatchRecognize.PatSym("B", 1, 1, greedy = true),
      MatchRecognize.PatSym("C", 1, 1, greedy = true))))
  }

  test("PATTERN alternation picks the leftmost matching branch") {
    mkEvents(Seq(
      (1L, 1L, "a", 100L, 1.0), (2L, 1L, "b", 200L, 2.0),
      (3L, 1L, "a", 300L, 3.0), (4L, 1L, "c", 400L, 4.0)))
    val env = TableEnv(spark)
    val out = env.executeSql("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES LAST(B.t) AS b_t, LAST(C.t) AS c_t, FIRST(A.t) AS a_t
        PATTERN (A B | A C)
        DEFINE A AS A.event_type = 'a',
               B AS B.event_type = 'b',
               C AS C.event_type = 'c'
      )""").collect()
      .map(r => (r.getLong(3), Option(r.get(1)), Option(r.get(2))))
      .sortBy(_._1)
    // first match takes branch A B; second takes branch A C
    assert(out.length == 2)
    assert(out(0) == ((100L, Some(200L), None)))
    assert(out(1) == ((300L, None, Some(400L))))
  }

  test("events-table funnel matches the Pattern-DSL CEP result") {
    Tables.registerAll(spark, sfDir)
    val env = TableEnv(spark)
    val sqlOut = env.executeSql("""
      SELECT * FROM events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY ts, event_id
        MEASURES COUNT(P.*) AS n
        PATTERN (C P)
        DEFINE C AS C.event_type = 'click', P AS P.event_type = 'purchase'
      )""")
    import org.apache.spark.sql.functions._
    val viaDsl = graft.Registry.byName("q_cep_strict")
      .run(spark, sfDir)
    val got = sqlOut.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_matches"))
    assert(got.exceptAll(viaDsl).isEmpty && viaDsl.exceptAll(got).isEmpty)
  }

  test("PREV in DEFINE compiles to lag columns") {
    mkEvents(Seq(
      (1L, 1L, "t", 100L, 1.0), (2L, 1L, "t", 200L, 2.0),
      (3L, 1L, "t", 300L, 3.0), (4L, 1L, "t", 400L, 2.5),
      (5L, 1L, "t", 500L, 4.0)))
    val env = TableEnv(spark)
    // strictly-ascending runs of length >= 3 (B rises vs previous row)
    val out = env.executeSql("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES FIRST(B.t) AS t0, LAST(B.t) AS t1, COUNT(B.*) AS len
        PATTERN (B{3})
        DEFINE B AS B.value > PREV(B.value)
      )""").collect()
    // rising rows: t=200,300 (vs prior), then 400 breaks (2.5 < 3.0),
    // 500 rises again -> no run of 3 consecutive rising rows... except
    // rows 200,300 rise and 500 rises: longest consecutive rising run
    // is 2 -> no match
    assert(out.isEmpty)
    mkEvents(Seq(
      (1L, 1L, "t", 100L, 1.0), (2L, 1L, "t", 200L, 2.0),
      (3L, 1L, "t", 300L, 3.0), (4L, 1L, "t", 400L, 4.0)))
    val out2 = env.executeSql("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES FIRST(B.t) AS t0, LAST(B.t) AS t1, COUNT(B.*) AS len
        PATTERN (B{3})
        DEFINE B AS B.value > PREV(B.value)
      )""").collect()
    assert(out2.length == 1)
    assert(out2.head.getLong(1) == 200L && out2.head.getLong(2) == 400L)
  }

  test("ALL ROWS PER MATCH emits classifier and match number") {
    mkEvents(Seq(
      (1L, 1L, "a", 100L, 1.0), (2L, 1L, "b", 200L, 2.0),
      (3L, 1L, "a", 300L, 3.0), (4L, 1L, "b", 400L, 4.0)))
    val env = TableEnv(spark)
    val out = env.executeSql("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES FIRST(A.t) AS start_t
        ALL ROWS PER MATCH
        PATTERN (A B)
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b'
      )""").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("classifier"),
        r.getAs[Long]("match_num"), r.getAs[Long]("start_t")))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "A", 1L, 100L), (2L, "B", 1L, 100L),
      (3L, "A", 2L, 300L), (4L, "B", 2L, 300L)))
  }

  test("MATCH_NUMBER() in measures") {
    mkEvents(Seq(
      (1L, 1L, "a", 100L, 1.0), (2L, 1L, "a", 200L, 2.0)))
    val env = TableEnv(spark)
    val out = env.executeSql("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES MATCH_NUMBER() AS mn, A.t AS at
        PATTERN (A)
        DEFINE A AS A.event_type = 'a'
      )""").collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 100L), (2L, 200L)))
  }

  test("SKIP TO NEXT ROW yields overlapping matches") {
    mkEvents(Seq(
      (1L, 1L, "a", 100L, 0.0), (2L, 1L, "a", 200L, 0.0),
      (3L, 1L, "a", 300L, 0.0)))
    val env = TableEnv(spark)
    def run(mode: String) = env.executeSql(s"""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES FIRST(A.t) AS t0, LAST(B.t) AS t1
        AFTER MATCH $mode
        PATTERN (A B)
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'a'
      )""").collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(run("SKIP PAST LAST ROW").toSeq == Seq((100L, 200L)))
    assert(run("SKIP TO NEXT ROW").toSeq ==
      Seq((100L, 200L), (200L, 300L)))
  }

  test("bounded group quantifier unrolls and merges bindings") {
    mkEvents(Seq(
      (1L, 1L, "b", 100L, 1.0), (2L, 1L, "c", 200L, 2.0),
      (3L, 1L, "b", 300L, 3.0), (4L, 1L, "c", 400L, 4.0),
      (5L, 1L, "d", 500L, 5.0)))
    val env = TableEnv(spark)
    val out = env.executeSql("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES COUNT(B.*) AS n_b, COUNT(C.*) AS n_c, FIRST(D.t) AS d_t
        PATTERN ((B C){1,2} D)
        DEFINE B AS B.event_type = 'b',
               C AS C.event_type = 'c',
               D AS D.event_type = 'd'
      )""").collect()
    // greedy: two (B C) copies bound, bindings merged per symbol
    assert(out.length == 1)
    assert(out.head.getLong(1) == 2L && out.head.getLong(2) == 2L)
    assert(out.head.getLong(3) == 500L)
  }

  test("optional group matches zero or one copies") {
    mkEvents(Seq(
      (1L, 1L, "a", 100L, 0.0), (2L, 1L, "d", 200L, 0.0),
      (3L, 2L, "a", 100L, 0.0), (4L, 2L, "b", 200L, 0.0),
      (5L, 2L, "c", 300L, 0.0), (6L, 2L, "d", 400L, 0.0)))
    val env = TableEnv(spark)
    val out = env.executeSql("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES COUNT(B.*) AS n_b, FIRST(D.t) AS d_t
        PATTERN (A (B C)? D)
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b',
               C AS C.event_type = 'c', D AS D.event_type = 'd'
      )""").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, 0L, 200L), (2L, 1L, 400L)))
  }

  test("unbounded group quantifier raises") {
    intercept[IllegalArgumentException] {
      MatchRecognize.parse("""SELECT * FROM t MATCH_RECOGNIZE (
        ORDER BY ts MEASURES A.x AS x PATTERN ((A B)+) DEFINE A AS true)""")
    }
  }

  test("AFTER MATCH SKIP TO FIRST re-scans from the first bound row (overlap)") {
    // x b b b end with PATTERN (A B+ E): SKIP TO FIRST B restarts at
    // each match's first b, producing telescoping overlapping matches
    mkEvents(Seq(
      (1L, 1L, "x", 1L, 0.0), (2L, 1L, "b", 2L, 1.0),
      (3L, 1L, "b", 3L, 2.0), (4L, 1L, "b", 4L, 3.0),
      (5L, 1L, "end", 5L, 0.0)))
    val env = TableEnv(spark)
    def run(skip: String) = env.executeSql(s"""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES FIRST(B.value) AS first_b, COUNT(B.*) AS n_b
        AFTER MATCH $skip
        PATTERN (A B+ E)
        DEFINE B AS B.event_type = 'b', E AS E.event_type = 'end'
      )""").collect().map(r => (r.getDouble(1), r.getLong(2)))
    // default: one greedy match consuming everything
    assert(run("SKIP PAST LAST ROW").toSeq == Seq((1.0, 3L)))
    // SKIP TO FIRST B: resume at b1 (A rebinds there), then b2, then b3
    // (whose match fails B+) -> three telescoping matches
    assert(run("SKIP TO FIRST B").toSeq ==
      Seq((1.0, 3L), (2.0, 2L), (3.0, 1L)))
  }

  test("SKIP TO FIRST of the match start raises the loop guard") {
    mkEvents(Seq((1L, 1L, "a", 1L, 1.0), (2L, 1L, "b", 2L, 2.0),
      (3L, 1L, "a", 3L, 1.0), (4L, 1L, "b", 4L, 2.0)))
    val env = TableEnv(spark)
    val e = intercept[Exception] {
      env.executeSql("""
        SELECT * FROM mr_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY t
          MEASURES COUNT(A.*) AS n
          AFTER MATCH SKIP TO FIRST A
          PATTERN (A B)
          DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b'
        )""").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("would not advance")))
  }

  test("NEXT navigation in DEFINE compiles to lead columns") {
    // B = a row whose NEXT value doubles it (lookahead)
    mkEvents(Seq(
      (1L, 1L, "x", 1L, 2.0), (2L, 1L, "x", 2L, 4.0), (3L, 1L, "x", 3L, 1.0),
      (4L, 1L, "x", 4L, 9.0)))
    val env = TableEnv(spark)
    val out = env.executeSql("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES FIRST(B.value) AS v, NEXT_STEP.value AS nv
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (B NEXT_STEP)
        DEFINE B AS NEXT(value) = 2 * B.value
      )""").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq == Seq((2.0, 4.0)))
  }

  test("RUNNING vs FINAL measures in ALL ROWS PER MATCH") {
    mkEvents(Seq(
      (1L, 1L, "b", 1L, 10.0), (2L, 1L, "b", 2L, 20.0),
      (3L, 1L, "end", 3L, 5.0)))
    val env = TableEnv(spark)
    val out = env.executeSql("""
      SELECT * FROM mr_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES RUNNING COUNT(B.*) AS rc, RUNNING SUM(B.value) AS rs,
                 RUNNING LAST(B.value) AS rl, COUNT(B.*) AS fc
        ALL ROWS PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (B+ E)
        DEFINE B AS B.event_type = 'b', E AS E.event_type = 'end'
      )""").collect()
      .map(r => (r.getLong(r.fieldIndex("t")),
        r.getLong(r.fieldIndex("rc")),
        if (r.isNullAt(r.fieldIndex("rs"))) -1.0 else r.getDouble(r.fieldIndex("rs")),
        if (r.isNullAt(r.fieldIndex("rl"))) -1.0 else r.getDouble(r.fieldIndex("rl")),
        r.getLong(r.fieldIndex("fc"))))
      .sortBy(_._1)
    // per output row: running count/sum/last grow with the prefix while
    // the FINAL count is 2 everywhere
    assert(out.toSeq == Seq(
      (1L, 1L, 10.0, 10.0, 2L),
      (2L, 2L, 30.0, 20.0, 2L),
      (3L, 2L, 30.0, 20.0, 2L)))
  }

  test("SUM and AVG measures ignore NULL elements (SQL aggregate semantics)") {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("t", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        // user 1: values 10, NULL, 2 -> SUM 12, AVG 6 (NULL ignored)
        Row(1L, 1L, "b", 10.0), Row(1L, 2L, "b", null),
        Row(1L, 3L, "b", 2.0), Row(1L, 4L, "end", 0.0),
        // user 2: all-NULL -> SUM NULL, AVG NULL (not 0)
        Row(2L, 1L, "b", null), Row(2L, 2L, "end", 0.0))),
      schema).createOrReplaceTempView("mr_null_events")
    val env = TableEnv(spark)
    val out = env.executeSql("""
      SELECT * FROM mr_null_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY t
        MEASURES SUM(B.value) AS s, AVG(B.value) AS a
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (B+ E)
        DEFINE B AS B.event_type = 'b', E AS E.event_type = 'end'
      )""").collect()
    val byUser = out.map(r => r.getLong(r.fieldIndex("user_id")) -> r).toMap
    assert(byUser(1L).getDouble(byUser(1L).fieldIndex("s")) == 12.0)
    assert(byUser(1L).getDouble(byUser(1L).fieldIndex("a")) == 6.0)
    assert(byUser(2L).isNullAt(byUser(2L).fieldIndex("s")))
    assert(byUser(2L).isNullAt(byUser(2L).fieldIndex("a")))
  }
}
