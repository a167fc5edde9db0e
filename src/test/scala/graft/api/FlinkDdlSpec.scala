package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FlinkDdlSpec extends SparkSpec {

  test("parse extracts schema, watermark, primary key, options") {
    val ddl = FlinkDdl.parse("""
      CREATE TABLE IF NOT EXISTS my_orders (
        o_orderkey BIGINT,
        o_totalprice DOUBLE,
        o_flag VARCHAR(1),
        o_dec DECIMAL(12, 2),
        ts TIMESTAMP(3),
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND,
        PRIMARY KEY (o_orderkey) NOT ENFORCED
      ) WITH (
        'connector' = 'filesystem',
        'path' = '/tmp/orders',
        'format' = 'parquet'
      )""")
    assert(ddl.name == "my_orders" && ddl.ifNotExists)
    assert(ddl.spec.path == "/tmp/orders" && ddl.spec.format == "parquet")
    assert(ddl.spec.schema.get == StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("o_flag", StringType),
      StructField("o_dec", DecimalType(12, 2)),
      StructField("ts", TimestampType))))
    assert(ddl.spec.watermark.contains(("ts", "5 seconds")))
    assert(ddl.spec.primaryKey == Seq("o_orderkey"))
  }

  test("executeSql DDL registers a readable table with the declared watermark") {
    val env = TableEnv(spark)
    env.executeSql(s"""
      CREATE TABLE ddl_events (
        event_id BIGINT,
        ts BIGINT,
        user_id BIGINT,
        event_type STRING,
        value DOUBLE,
        props STRING,
        WATERMARK FOR ts AS ts - INTERVAL '10' SECOND
      ) WITH ('connector' = 'filesystem',
              'path' = '$sfDir/events.parquet',
              'format' = 'parquet')""")
    val n = env.from("ddl_events").count()
    assert(n > 0)
    assert(env.tableSpec("ddl_events").exists(_.watermark
      .contains(("ts", "10 seconds"))))
    // batch SQL over the registered view works
    val c = env.executeSql(
      "SELECT COUNT(*) AS n FROM ddl_events WHERE event_type = 'click'")
      .collect().head.getLong(0)
    assert(c > 0 && c < n)
  }

  test("unknown connector raises with a clear message") {
    val e = intercept[IllegalArgumentException] {
      FlinkDdl.parse("""CREATE TABLE t (a INT) WITH (
        'connector' = 'kafka', 'topic' = 'x')""")
    }
    assert(e.getMessage.contains("kafka"))
  }

  test("INSERT INTO appends and INSERT OVERWRITE replaces") {
    val env = TableEnv(spark)
    graft.core.Tables.registerAll(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("ddl_sink").toString
    env.executeSql(s"""
      CREATE TABLE nation_sink (
        n_nationkey BIGINT,
        n_name STRING
      ) WITH ('connector' = 'filesystem', 'path' = '$dir/nation_sink',
              'format' = 'parquet')""")
    env.executeSql(
      "INSERT INTO nation_sink SELECT n_nationkey, n_name FROM nation")
    val n1 = env.from("nation_sink").count()
    assert(n1 > 0)
    env.executeSql(
      "INSERT INTO nation_sink SELECT n_nationkey, n_name FROM nation")
    assert(env.from("nation_sink").count() == 2 * n1)
    env.executeSql(
      "INSERT OVERWRITE nation_sink SELECT n_nationkey, n_name FROM nation " +
        "WHERE n_nationkey < 5")
    assert(env.from("nation_sink").count() == 5)
  }

  test("upsert sink (primary key) drops -U rows on INSERT - changelog inference") {
    val env = TableEnv(spark)
    import spark.implicits._
    Seq((1L, "a", "+I"), (1L, "a", "-U"), (1L, "b", "+U"), (2L, "c", "+I"))
      .toDF("pk", "v", graft.cdc.ChangelogFormats.RowKindCol)
      .createOrReplaceTempView("cl_src")
    val dir = java.nio.file.Files.createTempDirectory("upsert_sink").toString
    env.executeSql(s"""
      CREATE TABLE upsert_sink (
        pk BIGINT, v STRING, __row_kind STRING,
        PRIMARY KEY (pk) NOT ENFORCED
      ) WITH ('connector' = 'filesystem', 'path' = '$dir/t',
              'format' = 'parquet')""")
    env.executeSql("INSERT INTO upsert_sink SELECT * FROM cl_src")
    val kinds = env.from("upsert_sink")
      .select(graft.cdc.ChangelogFormats.RowKindCol).collect()
      .map(_.getString(0)).sorted.toSeq
    assert(kinds == Seq("+I", "+I", "+U"))  // -U inferred away

    // a sink WITHOUT a primary key keeps the full changelog
    env.executeSql(s"""
      CREATE TABLE retract_sink (
        pk BIGINT, v STRING, __row_kind STRING
      ) WITH ('connector' = 'filesystem', 'path' = '$dir/t2',
              'format' = 'parquet')""")
    env.executeSql("INSERT INTO retract_sink SELECT * FROM cl_src")
    assert(env.from("retract_sink").count() == 4)
  }

  test("upsert sink without __row_kind in schema materializes latest per PK") {
    val env = TableEnv(spark)
    import spark.implicits._
    val kind = graft.cdc.ChangelogFormats.RowKindCol
    Seq((1L, "a", "+I"), (1L, "a", "-U"), (1L, "b", "+U"),
        (2L, "c", "+I"), (3L, "d", "+I"))
      .toDF("pk", "v", kind).coalesce(1).createOrReplaceTempView("up_src1")
    val dir = java.nio.file.Files.createTempDirectory("upsert_mat").toString
    env.executeSql(s"""
      CREATE TABLE upsert_mat (
        pk BIGINT, v STRING,
        PRIMARY KEY (pk) NOT ENFORCED
      ) WITH ('connector' = 'filesystem', 'path' = '$dir/t',
              'format' = 'parquet')""")
    env.executeSql("INSERT INTO upsert_mat SELECT * FROM up_src1")
    // second batch: update pk=2, delete pk=3
    Seq((2L, "c2", "+U"), (3L, "d", "-D"))
      .toDF("pk", "v", kind).coalesce(1).createOrReplaceTempView("up_src2")
    env.executeSql("INSERT INTO upsert_mat SELECT * FROM up_src2")
    // read-back is the materialized table: declared schema (no internal
    // columns), latest value per PK, deleted key gone
    assert(env.from("upsert_mat").columns.toSeq == Seq("pk", "v"))
    val rows = env.from("upsert_mat").as[(Long, String)].collect().sorted.toSeq
    assert(rows == Seq((1L, "b"), (2L, "c2")))
  }

  test("PARTITIONED BY writes hive-style dirs and reads prune partitions") {
    val env = TableEnv(spark)
    val dir = java.nio.file.Files.createTempDirectory("ddl_part").toString
    env.executeSql(s"""
      CREATE TABLE part_docs (
        doc_id BIGINT, text STRING, lang STRING
      ) PARTITIONED BY (lang)
      WITH ('connector' = 'filesystem', 'path' = '$dir/t',
            'format' = 'parquet')""")
    assert(env.tableSpec("part_docs").get.partitions == Seq("lang"))
    env.createTemporaryView("part_src",
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text", "lang"))
    env.executeSql("INSERT INTO part_docs SELECT * FROM part_src")
    // hive-style partition directories exist
    val dirs = new java.io.File(s"$dir/t").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")), dirs.toString)
    // read-back matches and a lang filter prunes whole directories
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(env.from("part_docs").count() == total)
    val pruned = env.from("part_docs").filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan)
  }

  test("CTAS creates, writes and registers a table from a query") {
    val env = TableEnv(spark)
    val dir = java.nio.file.Files.createTempDirectory("ddl_ctas").toString
    env.createTemporaryView("ctas_src",
      spark.read.parquet(s"$sfDir/nation.parquet"))
    env.executeSql(s"""
      CREATE TABLE ctas_regions
      WITH ('connector' = 'filesystem', 'path' = '$dir/t', 'format' = 'parquet')
      AS SELECT n_regionkey, COUNT(*) AS n_nations
         FROM ctas_src GROUP BY n_regionkey""")
    assert(env.from("ctas_regions").count() == 5)
    assert(env.from("ctas_regions").columns.toSeq ==
      Seq("n_regionkey", "n_nations"))
    // IF NOT EXISTS on an existing table is a no-op (does not rewrite)
    env.executeSql(s"""
      CREATE TABLE IF NOT EXISTS ctas_regions
      WITH ('connector' = 'filesystem', 'path' = '$dir/t', 'format' = 'parquet')
      AS SELECT 1 AS x""")
    assert(env.from("ctas_regions").count() == 5)
  }

  test("CTAS with PARTITIONED BY lays out partition directories") {
    val env = TableEnv(spark)
    val dir = java.nio.file.Files.createTempDirectory("ddl_ctasp").toString
    env.createTemporaryView("ctasp_src",
      spark.read.parquet(s"$sfDir/documents.parquet"))
    env.executeSql(s"""
      CREATE TABLE ctas_by_lang
      PARTITIONED BY (lang)
      WITH ('connector' = 'filesystem', 'path' = '$dir/t', 'format' = 'parquet')
      AS SELECT doc_id, lang FROM ctasp_src""")
    val dirs = new java.io.File(s"$dir/t").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("lang=")), dirs.toString)
    assert(env.from("ctas_by_lang").count() ==
      spark.read.parquet(s"$sfDir/documents.parquet").count())
  }

  test("SHOW CREATE TABLE round-trips the DDL; DROP TABLE unregisters") {
    val env = TableEnv(spark)
    val dir = java.nio.file.Files.createTempDirectory("ddl_show").toString
    env.executeSql(s"""
      CREATE TABLE show_t (
        k BIGINT, v STRING, ts TIMESTAMP(3),
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND,
        PRIMARY KEY (k) NOT ENFORCED
      ) PARTITIONED BY (v)
      WITH ('connector' = 'filesystem', 'path' = '$dir/t',
            'format' = 'parquet')""")
    val ddl = env.executeSql("SHOW CREATE TABLE show_t")
      .collect().head.getString(0)
    // the emitted DDL parses back to the same spec
    val re = FlinkDdl.parse(ddl)
    assert(re.name == "show_t")
    assert(re.spec.primaryKey == Seq("k"))
    assert(re.spec.watermark.contains(("ts", "5 seconds")))
    assert(re.spec.partitions == Seq("v"))
    assert(re.spec.path == s"$dir/t")
    env.executeSql("DROP TABLE show_t")
    intercept[Exception] { env.from("show_t").collect() }
    // DROP of a missing table: IF EXISTS is a no-op, plain form raises
    env.executeSql("DROP TABLE IF EXISTS show_t")
    intercept[IllegalArgumentException] { env.executeSql("DROP TABLE show_t") }
  }

  test("SHOW TABLES lists registered tables; DESCRIBE reports schema + pk + watermark") {
    val env = TableEnv(spark)
    val dir = java.nio.file.Files.createTempDirectory("ddl_show").toString
    spark.range(3).select(col("id").as("k"), col("id").cast("double").as("v"),
        current_timestamp().as("ts"))
      .write.mode("overwrite").parquet(s"$dir/t")
    env.executeSql(s"""
      CREATE TABLE desc_t (
        k BIGINT,
        v DOUBLE,
        ts TIMESTAMP(3),
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND,
        PRIMARY KEY (k) NOT ENFORCED
      ) WITH ('connector' = 'filesystem', 'path' = '$dir/t',
              'format' = 'parquet')""")
    val tables = env.executeSql("SHOW TABLES")
      .collect().map(_.getString(0))
    assert(tables.contains("desc_t"))
    val desc = env.executeSql("DESCRIBE desc_t").collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getBoolean(2), r.getString(3), r.getString(4)))
      .toMap
    assert(desc("k")._1 == "BIGINT")
    assert(desc("k")._3 == "PRI NOT ENFORCED")
    assert(desc("v") == (("DOUBLE", true, null, null)))
    assert(desc("ts")._4 != null && desc("ts")._4.contains("ts"))
    // DESC shorthand routes the same way
    assert(env.executeSql("DESC desc_t").count() == 3)
    env.executeSql("DROP TABLE desc_t")
  }

  test("CREATE VIEW registers a queryable view; CREATE TABLE LIKE clones the spec") {
    val env = TableEnv(spark)
    val dir = java.nio.file.Files.createTempDirectory("ddl_like").toString
    spark.range(5).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.mode("overwrite").parquet(s"$dir/base")
    env.executeSql(s"""
      CREATE TABLE like_base (
        k BIGINT,
        v BIGINT,
        PRIMARY KEY (k) NOT ENFORCED
      ) WITH ('connector' = 'filesystem', 'path' = '$dir/base',
              'format' = 'parquet')""")
    // view over dialect SQL
    env.executeSql(
      "CREATE TEMPORARY VIEW like_v AS SELECT k, v FROM like_base WHERE k >= 2")
    assert(env.from("like_v").count() == 3)
    // LIKE with a path override: clones schema + pk, points elsewhere
    env.executeSql(s"""
      CREATE TABLE like_clone WITH ('path' = '$dir/clone') LIKE like_base""")
    val clone = env.tableSpec("like_clone").get
    assert(clone.path == s"$dir/clone")
    assert(clone.format == "parquet")
    assert(clone.primaryKey == Seq("k"))
    assert(clone.schema.get.fieldNames.toSeq == Seq("k", "v"))
    // the clone starts empty (new path) and accepts INSERT
    assert(env.from("like_clone").count() == 0)
    env.executeSql("INSERT INTO like_clone SELECT k, v FROM like_base")
    assert(env.from("like_clone").count() == 5)
    // plain LIKE with no WITH shares the base path
    env.executeSql("CREATE TABLE like_alias LIKE like_base")
    assert(env.tableSpec("like_alias").get.path == s"$dir/base")
    assert(env.from("like_alias").count() == 5)
    // unknown base fails loudly
    intercept[IllegalArgumentException] {
      env.executeSql("CREATE TABLE nope LIKE no_such_base")
    }
    Seq("like_clone", "like_alias", "like_base").foreach(t =>
      env.executeSql(s"DROP TABLE $t"))
  }

  test("INSERT INTO ... VALUES writes literal rows") {
    val env = TableEnv(spark)
    val dir = java.nio.file.Files.createTempDirectory("ddl_vals").toString
    env.executeSql(s"""
      CREATE TABLE vals_t (
        k BIGINT,
        v STRING
      ) WITH ('connector' = 'filesystem', 'path' = '$dir/t',
              'format' = 'parquet')""")
    env.executeSql("INSERT INTO vals_t VALUES (1, 'a'), (2, 'b')")
    env.executeSql("INSERT INTO vals_t VALUES (3, 'c')")
    val got = env.from("vals_t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
    // positional binding REJECTS arity mismatches (Flink's validator
    // does too) instead of silently falling back to name-based binding
    val e = intercept[IllegalArgumentException] {
      env.executeSql("INSERT INTO vals_t VALUES (4, 'd', 'extra')")
    }
    assert(e.getMessage.contains("arity") ||
      e.getMessage.contains("column"))
    env.executeSql("DROP TABLE vals_t")
  }

  test("SHOW VIEWS / SHOW FUNCTIONS / SET / RESET / ALTER / TRUNCATE") {
    val env = TableEnv(spark)
    val dir = java.nio.file.Files.createTempDirectory("ddl_misc").toString
    env.executeSql(s"""
      CREATE TABLE misc_t (k BIGINT, v STRING)
      WITH ('connector' = 'filesystem', 'path' = '$dir/t',
            'format' = 'parquet')""")
    env.executeSql("INSERT INTO misc_t VALUES (1, 'a'), (2, 'b')")
    env.executeSql("CREATE TEMPORARY VIEW misc_v AS SELECT k FROM misc_t")
    // SHOW VIEWS lists views, not DDL tables
    val views = env.executeSql("SHOW VIEWS").collect().map(_.getString(0))
    assert(views.contains("misc_v") && !views.contains("misc_t"))
    // SHOW FUNCTIONS includes the registered graft UDFs
    val fns = env.executeSql("SHOW FUNCTIONS").collect().map(_.getString(0))
    assert(fns.contains("collect_multiset") && fns.contains("split_index"))
    // SET writes session conf; bare SET lists it; RESET unsets
    env.executeSql("SET 'graft.test.flag' = 'on'")
    assert(spark.conf.get("graft.test.flag") == "on")
    val listed = env.executeSql("SET").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(listed.get("graft.test.flag").contains("on"))
    env.executeSql("RESET 'graft.test.flag'")
    assert(spark.conf.getOption("graft.test.flag").isEmpty)
    // ALTER TABLE RENAME moves the spec and the view
    env.executeSql("ALTER TABLE misc_t RENAME TO misc_t2")
    assert(env.tableSpec("misc_t").isEmpty &&
      env.tableSpec("misc_t2").isDefined)
    assert(env.from("misc_t2").count() == 2)
    // unsupported ALTER forms raise with a pointer
    val e = intercept[IllegalArgumentException](
      env.executeSql("ALTER TABLE misc_t2 ADD c INT"))
    assert(e.getMessage.contains("RENAME"))
    // TRUNCATE deletes rows, keeps the table
    env.executeSql("TRUNCATE TABLE misc_t2")
    assert(env.from("misc_t2").count() == 0)
    assert(env.tableSpec("misc_t2").isDefined)
    env.executeSql("DROP TABLE misc_t2")
  }

  test("ANALYZE TABLE computes row and column statistics") {
    val env = TableEnv(spark)
    env.executeSql(s"""
      CREATE TABLE an_t (r_regionkey BIGINT, r_name STRING, r_comment STRING)
      WITH ('connector' = 'filesystem', 'path' = '$sfDir/region.parquet',
            'format' = 'parquet')""")
    env.executeSql("ANALYZE TABLE an_t COMPUTE STATISTICS")
    assert(env.tableStats("an_t").exists(s =>
      s.rowCount == 5 && s.columns.isEmpty))
    env.executeSql("ANALYZE TABLE an_t COMPUTE STATISTICS FOR COLUMNS r_name")
    val st = env.tableStats("an_t").get
    assert(st.columns("r_name") == ((0L, 5L))) // no nulls, 5 distinct
    env.executeSql("ANALYZE TABLE an_t COMPUTE STATISTICS FOR ALL COLUMNS")
    assert(env.tableStats("an_t").get.columns.size == 3)
    intercept[IllegalArgumentException](
      env.executeSql("ANALYZE TABLE nope_t COMPUTE STATISTICS"))
    env.executeSql("DROP TABLE an_t")
  }

  test("SHOW JOBS / DESCRIBE JOB / STOP JOB manage streaming queries") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val env = TableEnv(spark)
    val ms = MemoryStream[Long]
    ms.addData(1L, 2L, 3L)
    val q = ms.toDF().writeStream.queryName("graft_job_q")
      .format("memory").start()
    try {
      q.processAllAvailable()
      val jobs = env.executeSql("SHOW JOBS").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(jobs.exists(j => j._2 == "graft_job_q" && j._3 == "RUNNING"))
      val d = env.executeSql("DESCRIBE JOB 'graft_job_q'").collect().head
      assert(d.getString(2) == "RUNNING")
      env.executeSql("STOP JOB 'graft_job_q'")
      assert(!spark.streams.active.exists(x =>
        Option(x.name).contains("graft_job_q")))
      val e = intercept[IllegalArgumentException](
        env.executeSql("DESCRIBE JOB 'graft_job_q'"))
      assert(e.getMessage.contains("no active job"))
    } finally if (q.isActive) q.stop()
  }

  test("createTable falls back to an empty view only on path-not-found") {
    val env = TableEnv(spark)
    // path-not-found with declared schema -> empty view (sink table)
    val schema = StructType(Seq(StructField("a", LongType)))
    env.createTable("no_such_path_t", TableSpec(
      path = "/definitely/not/here", schema = Some(schema)))
    assert(env.from("no_such_path_t").count() == 0)
    // any other analysis error must propagate, not register empty
    assert(env.isPathNotFound(new org.apache.spark.sql.AnalysisException(
      "PATH_NOT_FOUND", Map("path" -> "x"))))
    assert(!env.isPathNotFound(new org.apache.spark.sql.AnalysisException(
      "UNABLE_TO_INFER_SCHEMA", Map("format" -> "json"))))
  }
}
