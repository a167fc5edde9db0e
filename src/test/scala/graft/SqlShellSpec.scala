package graft

import java.io.{BufferedReader, PrintWriter, StringReader, StringWriter}

/** Scripted session through the SQL shell: DDL, query, SHOW/DESCRIBE,
  * SET, error recovery, QUIT — the sql-client surface end-to-end. */
class SqlShellSpec extends SparkSpec {

  private def runScript(script: String): String = {
    val sw = new StringWriter()
    SqlShell.run(spark, new BufferedReader(new StringReader(script)),
      new PrintWriter(sw, true))
    sw.toString
  }

  test("scripted session: DDL, select, shows, error recovery, quit") {
    val out = runScript(s"""
      |CREATE TABLE sh_nation (
      |  n_nationkey BIGINT,
      |  n_name STRING,
      |  n_regionkey BIGINT,
      |  n_comment STRING
      |) WITH ('connector' = 'filesystem',
      |        'path' = '$sfDir/nation.parquet',
      |        'format' = 'parquet');
      |SET 'sql-client.display.max-rows' = '1000';
      |SHOW TABLES;
      |DESCRIBE sh_nation;
      |SET 'sql-client.display.max-rows' = '5';
      |SELECT n_nationkey, n_name FROM sh_nation
      |ORDER BY n_nationkey;
      |SELECT COUNT(*) AS n FROM sh_nation;
      |SELECT broken FROM nowhere;
      |SELECT 1 AS still_alive;
      |QUIT;
      |SELECT 9 AS after_quit;
      |""".stripMargin)
    // ASCII table with the capped first 5 rows
    assert(out.contains("| n_nationkey | n_name"))
    assert(out.contains("first 5 rows"))
    // aggregate result renders
    assert(out.contains("| n |") || out.contains("| n "))
    assert(out.contains("| 25"))
    // SHOW TABLES / DESCRIBE flow through
    assert(out.contains("sh_nation"))
    assert(out.contains("n_regionkey"))
    // a failing statement reports and the session continues
    assert(out.contains("[ERROR]"))
    assert(out.contains("still_alive"))
    // QUIT stops the session before later statements
    assert(!out.contains("after_quit"))
    spark.conf.unset("sql-client.display.max-rows")
  }

  test("CREATE FUNCTION round-trips through a shell session") {
    val out = runScript("""
      |CREATE TEMPORARY FUNCTION shell_split AS 'split_index';
      |SELECT shell_split('x-y-z', '-', 2) AS piece;
      |DROP FUNCTION shell_split;
      |SELECT 1 AS done;
      |""".stripMargin)
    assert(out.contains("| z"))
    assert(out.contains("done"))
    assert(!out.contains("[ERROR]"))
  }

  test("statement splitting: quotes, comments, sets, multi-per-line") {
    def split(s: String) = SqlShell.splitStatements(s)
    assert(split("SELECT 1,\n") == (Seq(), "SELECT 1,\n"))
    assert(split("SELECT 1,\n2;\n") == (Seq("SELECT 1,\n2"), "\n"))
    // quoted semicolons (single AND double quotes) don't terminate
    assert(split("SELECT ';' AS x\n")._1.isEmpty)
    assert(split("SELECT ';' AS x;\n")._1 == Seq("SELECT ';' AS x"))
    assert(split("SELECT \"a;b\" AS s;\n")._1 == Seq("SELECT \"a;b\" AS s"))
    // backslash-escaped quote doesn't flip the quote state
    assert(split("SELECT 'don\\'t; really';\n")._1
      == Seq("SELECT 'don\\'t; really'"))
    // statement set: inner ; don't split, END; does — even behind a
    // leading comment or a COMPILE PLAN wrapper
    assert(split("EXECUTE STATEMENT SET BEGIN INSERT INTO a SELECT 1;\n")
      ._1.isEmpty)
    assert(split(
      "EXECUTE STATEMENT SET BEGIN INSERT INTO a SELECT 1; END;\n")._1.size == 1)
    assert(split(
      "-- load both\nEXECUTE STATEMENT SET BEGIN\nINSERT INTO a SELECT 1;\nINSERT INTO b SELECT 2;\nEND;\n")
      ._1.size == 1)
    assert(split(
      "COMPILE PLAN '/tmp/p.json' FOR EXECUTE STATEMENT SET BEGIN INSERT INTO a SELECT 1; END;\n")
      ._1.size == 1)
    // trailing comments don't mask/create terminators
    assert(split("SELECT 1; -- done\n")._1 == Seq("SELECT 1"))
    assert(split("SELECT 1 -- not yet;\n")._1.isEmpty)
    assert(split("SELECT '--' AS dash;\n")._1 == Seq("SELECT '--' AS dash"))
    // multiple statements on one line each execute
    assert(split("SELECT 1; SELECT 2;\n")._1 == Seq("SELECT 1", " SELECT 2"))
  }

  test("two statements pasted on one line both execute") {
    val out = runScript("SELECT 1 AS one; SELECT 2 AS two;\nQUIT;\n")
    assert(out.contains("| one |") || out.contains("| one "))
    assert(out.contains("| two |") || out.contains("| two "))
  }

  test("statement set executes as one statement") {
    val tmp = java.nio.file.Files.createTempDirectory("shellset").toString
    val out = runScript(s"""
      |CREATE TABLE sh_src (
      |  r_regionkey BIGINT, r_name STRING, r_comment STRING
      |) WITH ('connector' = 'filesystem',
      |        'path' = '$sfDir/region.parquet',
      |        'format' = 'parquet');
      |CREATE TABLE sh_out1 (r_regionkey BIGINT)
      |WITH ('connector' = 'filesystem', 'path' = '$tmp/o1',
      |      'format' = 'parquet');
      |CREATE TABLE sh_out2 (r_name STRING)
      |WITH ('connector' = 'filesystem', 'path' = '$tmp/o2',
      |      'format' = 'parquet');
      |EXECUTE STATEMENT SET BEGIN
      |INSERT INTO sh_out1 SELECT r_regionkey FROM sh_src;
      |INSERT INTO sh_out2 SELECT r_name FROM sh_src;
      |END;
      |QUIT;
      |""".stripMargin)
    assert(!out.contains("[ERROR]"), out)
    assert(spark.read.parquet(s"$tmp/o1").count() == 5)
    assert(spark.read.parquet(s"$tmp/o2").count() == 5)
  }

  test("gateway mode: thin client of a live SqlGateway, remote rendering") {
    val gw = new graft.api.SqlGateway(spark).start()
    try {
      val sw = new StringWriter()
      val script = s"""
        |CREATE TABLE gwsh (r_regionkey BIGINT, r_name STRING,
        |  r_comment STRING) WITH ('connector' = 'filesystem',
        |  'path' = '$sfDir/region.parquet', 'format' = 'parquet');
        |SELECT r_regionkey, r_name FROM gwsh ORDER BY r_regionkey;
        |SELECT broken FROM nowhere;
        |SELECT 1 AS still_alive;
        |QUIT;
        |""".stripMargin
      SqlShell.runGateway("127.0.0.1", gw.boundPort,
        new BufferedReader(new StringReader(script)),
        new PrintWriter(sw, true))
      val out = sw.toString
      assert(out.contains("[INFO] OK"), out)           // DDL ack
      assert(out.contains("| r_regionkey | r_name"), out)
      assert(out.contains("AFRICA"), out)
      assert(out.contains("[INFO] 5 rows"), out)
      assert(out.contains("[ERROR]"), out)             // error recovery
      assert(out.contains("still_alive"), out)
    } finally gw.stop()
  }
}
