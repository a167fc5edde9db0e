package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import Q._

/** Scalar function surface — reference: BuiltInFunctionDefinitions.java
  * (2,908 LoC) / FlinkSqlOperatorTable.java; SURVEY.md §2.7 maps ~95% to
  * Spark built-ins. Each query exercises a function family against the
  * DuckDB oracle, with cross-engine semantic traps avoided or bridged
  * (regexp_replace needs 'g' in DuckDB; DuckDB casts double→int by
  * rounding while Spark truncates — never compared; extraction functions
  * return BIGINT in DuckDB so Spark results are cast to long).
  */
object FuncQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_func_string", (s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 5).as("sub5"),
          length(col("p_name")).cast("long").as("len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("cat"),
          lpad(col("p_brand"), 12, "*").as("pad"),
          reverse(col("p_name")).as("rev"),
          regexp_replace(col("p_type"), " ", "_").as("underscored"),
          trim(lit("  x  ")).as("trimmed"),
          instr(col("p_name"), "a").cast("long").as("a_pos"),
          repeat(col("p_brand"), 2).as("twice"))
    }, Some("""
      SELECT p_partkey,
        UPPER(p_name) AS up, LOWER(p_brand) AS lo,
        SUBSTR(p_name, 1, 5) AS sub5,
        LENGTH(p_name) AS len,
        CONCAT_WS('-', p_brand, p_type) AS cat,
        LPAD(p_brand, 12, '*') AS pad,
        REVERSE(p_name) AS rev,
        REPLACE(p_type, ' ', '_') AS underscored,
        TRIM('  x  ') AS trimmed,
        INSTR(p_name, 'a') AS a_pos,
        REPEAT(p_brand, 2) AS twice
      FROM part WHERE p_partkey <= 500""")),

    // Custom Catalyst expression SPLIT_INDEX (graft.functions.SplitIndex)
    // — codegen'd, registered in the session function registry.
    QueryDef("q_func_split_index", (s, dir) => {
      graft.functions.register(s)
      t(s, dir, "documents")
        .select(col("doc_id"),
          expr("split_index(text, ' ', 0)").as("w0"),
          expr("split_index(text, ' ', 2)").as("w2"),
          expr("split_index(text, ' ', 9999)").as("w_out"))
    }, Some("""
      SELECT doc_id,
        string_split(text, ' ')[1] AS w0,
        string_split(text, ' ')[3] AS w2,
        string_split(text, ' ')[10000] AS w_out
      FROM documents""")),

    QueryDef("q_func_regexp", (s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(col("text"), "^([a-zA-Z0-9_]+)", 1).as("first_word"),
          regexp_replace(col("text"), "[aeiou]", "*").as("starred"))
        .filter(col("text").rlike("data.*join|join.*data"))
    }, Some("""
      SELECT doc_id,
        regexp_extract(text, '^([a-zA-Z0-9_]+)', 1) AS first_word,
        regexp_replace(text, '[aeiou]', '*', 'g') AS starred
      FROM documents
      WHERE regexp_matches(text, 'data.*join|join.*data')""")),

    QueryDef("q_func_hash", (s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"),
          md5(col("text")).as("h_md5"),
          sha2(col("text"), 256).as("h_sha256"))
    }, Some("""
      SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
      FROM documents WHERE doc_id < 50""")),

    QueryDef("q_func_date", (s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") <= 3000)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due"))
    }, Some("""
      SELECT o_orderkey,
        YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m,
        DAY(o_orderdate) AS d, QUARTER(o_orderdate) AS q,
        DATE_TRUNC('month', o_orderdate) AS month_start,
        o_orderdate + INTERVAL 30 DAY AS due
      FROM orders WHERE o_orderkey <= 3000""")),

    QueryDef("q_func_timestamp", (s, dir) => {
      t(s, dir, "events").filter(col("event_id") < 2000)
        .select(col("event_id"),
          hour(col("ts")).cast("long").as("h"),
          minute(col("ts")).cast("long").as("mi"),
          second(col("ts")).cast("long").as("sec"),
          unix_timestamp(col("ts")).as("epoch_sec"),
          date_trunc("hour", col("ts")).as("hour_start"),
          to_date(col("ts")).as("dt"))
    }, Some("""
      SELECT event_id,
        HOUR(ts) AS h, MINUTE(ts) AS mi,
        CAST(FLOOR(EXTRACT(SECOND FROM ts)) AS BIGINT) AS sec,
        CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS epoch_sec,
        DATE_TRUNC('hour', ts) AS hour_start,
        CAST(ts AS DATE) AS dt
      FROM events WHERE event_id < 2000""")),

    QueryDef("q_func_math", (s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(-col("l_quantity")).as("abs_q"),
          ceil(col("l_quantity") / 7).cast("long").as("ceil_q"),
          floor(col("l_quantity") / 7).cast("long").as("floor_q"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_p"),
          round(log(col("l_extendedprice")), 6).as("ln_p"),
          round(log10(col("l_extendedprice")), 6).as("log10_p"),
          pow(lit(2), col("l_linenumber")).as("pow2"),
          (col("l_orderkey") % 7).as("mod7"),
          signum(col("l_discount") - 0.05).as("sgn"))
    }, Some("""
      SELECT l_orderkey, l_linenumber,
        ABS(-l_quantity) AS abs_q,
        CAST(CEIL(l_quantity / 7) AS BIGINT) AS ceil_q,
        CAST(FLOOR(l_quantity / 7) AS BIGINT) AS floor_q,
        ROUND(SQRT(l_extendedprice), 6) AS sqrt_p,
        ROUND(LN(l_extendedprice), 6) AS ln_p,
        ROUND(LOG10(l_extendedprice), 6) AS log10_p,
        POW(2, l_linenumber) AS pow2,
        l_orderkey % 7 AS mod7,
        CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sgn
      FROM lineitem WHERE l_orderkey <= 2000""")),

    QueryDef("q_func_array", (s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("words")).cast("long").as("n_words"),
          array_contains(col("words"), "data").as("has_data"),
          element_at(col("words"), 1).as("w1"),
          size(array_distinct(col("words"))).cast("long").as("n_uniq"),
          array_join(slice(col("words"), 1, 3), "_").as("first3"),
          array_max(col("words")).as("max_word"),
          array_min(col("words")).as("min_word"))
    }, Some("""
      SELECT doc_id,
        LEN(words) AS n_words,
        LIST_CONTAINS(words, 'data') AS has_data,
        words[1] AS w1,
        LEN(LIST_DISTINCT(words)) AS n_uniq,
        ARRAY_TO_STRING(words[1:3], '_') AS first3,
        LIST_MAX(words) AS max_word,
        LIST_MIN(words) AS min_word
      FROM (SELECT doc_id, string_split(text, ' ') AS words
            FROM documents WHERE doc_id < 100)""")),

    QueryDef("q_func_json", (s, dir) => {
      t(s, dir, "events").filter(col("event_id") < 3000)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_num"),
          get_json_object(col("props"), "$.missing").as("absent"))
    }, Some("""
      SELECT event_id,
        json_extract_string(props, '$.k') AS k_str,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        json_extract_string(props, '$.missing') AS absent
      FROM events WHERE event_id < 3000""")),

    QueryDef("q_func_conditional", (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("c_name"), lit("UNKNOWN")).as("cust"),
          nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
          greatest(col("o_totalprice"), col("c_acctbal")).as("gr"),
          least(col("o_totalprice"), col("c_acctbal")).as("le"),
          col("c_acctbal").isNull.as("no_rich_cust"))
    }, Some("""
      SELECT o_orderkey,
        COALESCE(c_name, 'UNKNOWN') AS cust,
        NULLIF(o_orderstatus, 'O') AS status_or_null,
        GREATEST(o_totalprice, c_acctbal) AS gr,
        LEAST(o_totalprice, c_acctbal) AS le,
        c_acctbal IS NULL AS no_rich_cust
      FROM orders LEFT JOIN (
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_acctbal > 5000) c ON o_custkey = c_custkey"""))
  )
}
