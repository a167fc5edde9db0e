package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import Q._

/** Second tranche of the §2.7 scalar surface: string manipulation
  * (overlay/translate/elt/left/right/position/ascii/chr), base64/hex
  * encodings, trigonometry, bitwise ops, TRY_CAST, unix-time
  * conversions. Functions whose DuckDB counterpart has different
  * semantics are bridged in the oracle SQL, not fudged in Spark.
  */
object FuncQueries2 {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_func_string2", (s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") <= 300)
        .select(col("p_partkey"),
          expr("overlay(p_brand placing 'XX' from 2)").as("ov"),
          translate(col("p_type"), "aeiou", "AEIOU").as("tr"),
          expr("elt(p_size % 3 + 1, 'one', 'two', 'three')").as("pick"),
          expr("left(p_name, 4)").as("l4"),
          expr("right(p_name, 4)").as("r4"),
          ascii(col("p_brand")).cast("long").as("asc"),
          expr("chr(65 + p_size % 26)").as("ch"),
          expr("position('a' in p_name)").cast("long").as("pos_a"),
          format_string("%s/%d", col("p_brand"), col("p_size")).as("fmt"))
    }, Some("""
      SELECT p_partkey,
        substr(p_brand, 1, 1) || 'XX' || substr(p_brand, 4) AS ov,
        translate(p_type, 'aeiou', 'AEIOU') AS tr,
        ['one','two','three'][CAST(p_size % 3 AS INT) + 1] AS pick,
        left(p_name, 4) AS l4,
        right(p_name, 4) AS r4,
        ascii(p_brand) AS asc,
        chr(65 + CAST(p_size % 26 AS INT)) AS ch,
        position('a' IN p_name) AS pos_a,
        format('{}/{}', p_brand, p_size) AS fmt
      FROM part WHERE p_partkey <= 300""")),

    QueryDef("q_func_encode", (s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"),
          base64(encode(col("source"), "UTF-8")).as("b64"),
          lower(hex(encode(col("source"), "UTF-8"))).as("hx"),
          unbase64(base64(encode(col("source"), "UTF-8"))).cast("string")
            .as("roundtrip"))
    }, Some("""
      SELECT doc_id,
        to_base64(encode(source)) AS b64,
        lower(hex(encode(source))) AS hx,
        source AS roundtrip
      FROM documents WHERE doc_id < 40""")),

    QueryDef("q_func_trig", (s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") <= 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(sin(col("l_discount")), 6).as("sin_d"),
          round(cos(col("l_discount")), 6).as("cos_d"),
          round(tan(col("l_discount")), 6).as("tan_d"),
          round(atan2(col("l_quantity"), col("l_extendedprice")), 6)
            .as("at2"),
          round(degrees(col("l_discount")), 6).as("deg"),
          round(radians(col("l_quantity")), 6).as("rad"),
          round(asin(col("l_discount")), 6).as("asin_d"),
          round(exp(col("l_discount")), 6).as("exp_d"))
    }, Some("""
      SELECT l_orderkey, l_linenumber,
        round(sin(l_discount), 6) AS sin_d,
        round(cos(l_discount), 6) AS cos_d,
        round(tan(l_discount), 6) AS tan_d,
        round(atan2(l_quantity, l_extendedprice), 6) AS at2,
        round(degrees(l_discount), 6) AS deg,
        round(radians(l_quantity), 6) AS rad,
        round(asin(l_discount), 6) AS asin_d,
        round(exp(l_discount), 6) AS exp_d
      FROM lineitem WHERE l_orderkey <= 1000""")),

    QueryDef("q_func_bitwise", (s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") <= 500)
        .select(col("p_partkey"),
          (col("p_size").bitwiseAND(15)).as("band"),
          (col("p_size").bitwiseOR(64)).as("bor"),
          (col("p_size").bitwiseXOR(21)).as("bxor"),
          shiftleft(col("p_size"), 2).as("shl"),
          shiftright(col("p_size"), 1).as("shr"),
          bit_count(col("p_size").cast("long")).as("bc"))
    }, Some("""
      SELECT p_partkey,
        p_size & 15 AS band,
        p_size | 64 AS bor,
        xor(p_size, 21) AS bxor,
        p_size << 2 AS shl,
        p_size >> 1 AS shr,
        bit_count(CAST(p_size AS BIGINT)) AS bc
      FROM part WHERE p_partkey <= 500""")),

    QueryDef("q_func_trycast", (s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"),
          try_element_at(split(col("text"), " "), lit(1)).as("w1"),
          expr("try_cast(split_part(text, ' ', 1) AS INT)").as("as_int"),
          expr("try_cast(n_chars AS SMALLINT)").as("as_small"),
          expr("try_divide(n_chars, doc_id)").as("div"))
    }, Some("""
      SELECT doc_id,
        string_split(text, ' ')[1] AS w1,
        TRY_CAST(string_split(text, ' ')[1] AS INT) AS as_int,
        TRY_CAST(n_chars AS SMALLINT) AS as_small,
        CASE WHEN doc_id = 0 THEN NULL
             ELSE CAST(n_chars AS DOUBLE) / doc_id END AS div
      FROM documents WHERE doc_id < 60""")),

    QueryDef("q_func_unixtime", (s, dir) => {
      t(s, dir, "events").filter(col("event_id") < 2000)
        .select(col("event_id"),
          unix_micros(col("ts")).as("us"),
          timestamp_micros(unix_micros(col("ts"))).as("roundtrip"),
          from_unixtime(unix_timestamp(col("ts")),
            "yyyy-MM-dd HH:mm:ss").as("fmt"))
    }, Some("""
      SELECT event_id,
        epoch_us(ts) AS us,
        make_timestamp(epoch_us(ts)) AS roundtrip,
        strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS fmt
      FROM events WHERE event_id < 2000""")),

    // SQL/JSON path functions (custom expressions, SURVEY §2.7 gap):
    // JSON_VALUE / JSON_EXISTS over the events props column.
    QueryDef("q_func_json_path", (s, dir) => {
      graft.functions.register(s)
      t(s, dir, "events").filter(col("event_id") < 2500)
        .select(col("event_id"),
          expr("json_value(props, '$.k')").as("k_val"),
          expr("json_exists(props, '$.k')").as("has_k"),
          expr("json_exists(props, '$.absent')").as("has_absent"))
    }, Some("""
      SELECT event_id,
        json_extract_string(props, '$.k') AS k_val,
        json_extract(props, '$.k') IS NOT NULL AS has_k,
        json_extract(props, '$.absent') IS NOT NULL AS has_absent
      FROM events WHERE event_id < 2500""")),

    // TEMPORAL_OVERLAPS (reference BuiltInFunctionDefinitions): expanded
    // to the boolean range-intersection expression per SURVEY §2.7.
    QueryDef("q_func_temporal_overlaps", (s, dir) => {
      val e = t(s, dir, "events")
      e.select(col("event_id"), col("ts"),
          graft.functions.temporalOverlaps(
            col("ts"), col("ts") + expr("INTERVAL 10 MINUTES"),
            lit("2024-01-05 00:00:00").cast("timestamp"),
            lit("2024-01-06 00:00:00").cast("timestamp")).as("in_window"))
        .groupBy(col("in_window")).agg(count(lit(1)).as("n"))
    }, Some("""
      SELECT (ts < TIMESTAMP '2024-01-06 00:00:00'
          AND TIMESTAMP '2024-01-05 00:00:00' < ts + INTERVAL 10 MINUTE)
          AS in_window,
        COUNT(*) AS n
      FROM events GROUP BY 1""")),

    // Edit distance (reference: not in Flink's builtin list but standard
    // in dedup pipelines; both engines implement classic Levenshtein).
    QueryDef("q_func_levenshtein", (s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") <= 300)
        .select(col("p_partkey"),
          levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev"),
          levenshtein(col("p_name"), col("p_name")).cast("long").as("lev0"))
    }, Some("""
      SELECT p_partkey,
        levenshtein(p_brand, p_type) AS lev,
        levenshtein(p_name, p_name) AS lev0
      FROM part WHERE p_partkey <= 300""")),

    // PARSE_URL (Flink builtin; DuckDB lacks it, but the synthesized
    // URLs make the expected components directly constructible, so the
    // oracle checks the extraction exactly).
    QueryDef("q_func_parse_url", (s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 30)
        .withColumn("url", concat(lit("https://example.com/"),
          col("source"), lit("?id="), col("doc_id")))
        .select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("id")).as("qid"))
    }, Some("""
      SELECT doc_id, 'example.com' AS host,
        '/' || source AS path,
        CAST(doc_id AS VARCHAR) AS qid
      FROM documents WHERE doc_id < 30""")),

    // Approximate distinct (HLL++) — the sketch VALUE is engine-specific
    // (DuckDB's HLL differs), but Spark's estimate is deterministic, so
    // the query emits the exact count plus an error-band boolean: the
    // oracle recomputes the exact count and asserts the band held,
    // hash-checking both — a real gate instead of rows-only. The rsd is
    // requested explicitly (0.02) and the gate sits at ~3 sigma of it:
    // a 1-sigma band over the DEFAULT rsd would make a probabilistic
    // bound a flaky correctness failure at other scale factors.
    QueryDef("q_agg_approx", (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double")
            / col("exact_parts") <= 0.06).as("within_band"))
    }, Some("""
      SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS exact_parts,
        true AS within_band
      FROM lineitem GROUP BY l_returnflag""")),

    QueryDef("q_func_map", (s, dir) => {
      t(s, dir, "events").filter(col("event_id") < 1500)
        .withColumn("m", map(lit("type"), col("event_type"),
          lit("user"), col("user_id").cast("string")))
        .select(col("event_id"),
          element_at(col("m"), "type").as("mtype"),
          // string, not array — the driver's comparator can't sort arrays
          concat_ws(",", map_keys(col("m"))).as("ks"),
          size(col("m")).cast("long").as("n"),
          expr("str_to_map(concat('a:1,b:', event_type), ',', ':')['b']")
            .as("from_str"))
    }, Some("""
      SELECT event_id,
        event_type AS mtype,
        'type,user' AS ks,
        CAST(2 AS BIGINT) AS n,
        event_type AS from_str
      FROM events WHERE event_id < 1500"""))
  )
}
