package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import Q._

/** Projection / filter / row-compute / lateral / subqueries — reference:
  * Calc (StreamExecCalc.java:49 + CalcCodeGenerator.scala), Correlate /
  * UNNEST (StreamExecCorrelate.java, LogicalUnnestRule), subquery
  * decorrelation (FlinkRewriteSubQueryRule / FlinkSubQueryRemoveRule).
  * Catalyst fuses project+filter into whole-stage codegen and performs
  * the same subquery-to-join rewrites.
  */
object CalcQueries {

  val defs: Seq[QueryDef] = Seq(

    // Fused project+filter with arithmetic + CASE (Calc).
    QueryDef("q_calc", (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 30 && col("l_discount") < 0.05)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
            .cast("double").as("net_price"),
          when(col("l_returnflag") === "R", lit("returned"))
            .when(col("l_returnflag") === "A", lit("accepted"))
            .otherwise(lit("neither")).as("flag_desc"),
          (col("l_quantity") * 2 + 1).as("qx"))
    }, Some(s"""
      SELECT l_orderkey, l_linenumber,
        CAST(${revenueSql("l_extendedprice", "l_discount")} AS DOUBLE)
          AS net_price,
        CASE WHEN l_returnflag = 'R' THEN 'returned'
             WHEN l_returnflag = 'A' THEN 'accepted'
             ELSE 'neither' END AS flag_desc,
        l_quantity * 2 + 1 AS qx
      FROM lineitem WHERE l_quantity > 30 AND l_discount < 0.05""")),

    // Scan pushdown shape: projection + selective filter reach parquet.
    QueryDef("q_scan_pushdown", (s, dir) => {
      t(s, dir, "part")
        .filter(col("p_size") >= 40 && col("p_brand") === "Brand#1")
        .select(col("p_partkey"), col("p_name"), col("p_size"))
    }, Some("""
      SELECT p_partkey, p_name, p_size FROM part
      WHERE p_size >= 40 AND p_brand = 'Brand#1'""")),

    // Avro payload format roundtrip (graft.core.AvroFormat — reference
    // flink-avro (de)serialization schemas): encode an orders projection
    // to avro binary, decode, aggregate; the oracle aggregates the raw
    // table, so any codec defect breaks the hash.
    QueryDef("q_format_avro", (s, dir) => {
      val schema = """{"type":"record","name":"ord","fields":[
        {"name":"o_orderkey","type":"long"},
        {"name":"o_orderpriority","type":["null","string"]},
        {"name":"o_totalprice","type":"double"}]}"""
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      val decoded = graft.core.AvroFormat.fromAvro(
        graft.core.AvroFormat.toAvro(o, schema), "value", schema)
      decoded.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"),
          sum(col("o_orderkey")).as("sum_key"))
    }, Some(s"""
      SELECT o_orderpriority, COUNT(*) AS n,
        ${dsumSql("o_totalprice")} AS sum_price,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
      FROM orders GROUP BY o_orderpriority""")),

    // avro-confluent wire format against a LIVE (embedded) schema
    // registry over real HTTP (graft.core.AvroRegistryFormat; reference
    // flink-avro-confluent-registry): rows are encoded under TWO
    // registered schema generations — v1 without o_totalprice, v2 with
    // it (defaulted) — and decoded under the v2 reader, so the hash
    // only matches if the magic+id framing, the per-id registry
    // resolution, AND avro writer->reader schema evolution (default
    // fill) all work. The oracle replays the default arithmetic on the
    // raw table.
    QueryDef("q_format_avro_registry", (s, dir) => {
      val reg = graft.core.EmbeddedSchemaRegistry.shared
      val v1 = """{"type":"record","name":"ord","fields":[
        {"name":"o_orderkey","type":"long"},
        {"name":"o_orderpriority","type":["null","string"]}]}"""
      val v2 = """{"type":"record","name":"ord","fields":[
        {"name":"o_orderkey","type":"long"},
        {"name":"o_orderpriority","type":["null","string"]},
        {"name":"o_totalprice","type":"double","default":-1.0}]}"""
      val o = t(s, dir, "orders")
      val oldGen = graft.core.AvroRegistryFormat.toAvro(
        o.filter(col("o_orderkey") % 3 =!= 0)
          .select(col("o_orderkey"), col("o_orderpriority")),
        v1, reg.url, "graft-orders-value")
      val newGen = graft.core.AvroRegistryFormat.toAvro(
        o.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice")),
        v2, reg.url, "graft-orders-value")
      graft.core.AvroRegistryFormat.fromAvro(
          oldGen.unionByName(newGen), "value", v2, reg.url)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_key"),
          dsum(col("o_totalprice")).as("sum_price"))
    }, Some(s"""
      SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
        ${dsumSql(
          "CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice ELSE -1.0 END")}
          AS sum_price
      FROM orders GROUP BY o_orderpriority""")),

    // Hadoop SequenceFile format + block-gzip compression
    // (graft.core.SequenceFiles; reference flink-sequence-file +
    // flink-compress): an orders projection is written as
    // SequenceFile<LongWritable, Text> with the gzip codec, read back
    // with header-sniffed types, and aggregated — the hash only matches
    // if the writable mapping, the codec, and the sniffing all work.
    // The write is an eager filesystem round-trip by nature (the one
    // format query that must touch disk; CTAS queries already do).
    QueryDef("q_format_sequence_file", (s, dir) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_seqfile_${Integer.toHexString(dir.hashCode)}"
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      graft.core.SequenceFiles.write(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
        path, codec = "gzip")
      graft.core.SequenceFiles.read(s, path)
        .groupBy(col("value"))
        .agg(count(lit(1)).as("n"), sum(col("key")).as("sum_key"))
    }, Some("""
      SELECT o_orderpriority AS value, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
      FROM orders GROUP BY 1""")),

    // Protobuf payload format roundtrip (graft.core.ProtoFormat — pure
    // wire-format codec; reference flink-protobuf Pb(De|Se)rializationSchema):
    // encode an orders projection to proto binary, decode, aggregate; the
    // oracle aggregates the raw table, so any codec defect breaks the hash.
    QueryDef("q_format_proto", (s, dir) => {
      val proto = """message Ord {
        int64 o_orderkey = 1;
        optional string o_orderpriority = 2;
        double o_totalprice = 3;
        sint64 neg_key = 4;
      }"""
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          (-col("o_orderkey")).as("neg_key"))
      val decoded = graft.core.ProtoFormat.fromProto(
        graft.core.ProtoFormat.toProto(o, proto), "value", proto)
      decoded.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"),
          sum(col("o_orderkey") + col("neg_key") + col("o_orderkey")).as("sum_key"))
    }, Some(s"""
      SELECT o_orderpriority, COUNT(*) AS n,
        ${dsumSql("o_totalprice")} AS sum_price,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
      FROM orders GROUP BY o_orderpriority""")),

    // Lateral explode / UNNEST (Correlate): word explosion over docs.
    QueryDef("q_explode", (s, dir) => {
      t(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
    }, Some("""
      SELECT word, COUNT(*) AS n FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
        FROM documents WHERE doc_id < 100)
      GROUP BY word""")),

    // posexplode — generator with ordinality.
    QueryDef("q_posexplode", (s, dir) => {
      t(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .filter(col("pos") < 3)
    }, Some("""
      SELECT doc_id, CAST(i - 1 AS INT) AS pos,
        string_split(text, ' ')[i] AS word
      FROM documents, generate_series(1, 3) t(i)
      WHERE doc_id < 20 AND i <= len(string_split(text, ' '))""")),

    // UNNEST WITH ORDINALITY via the SQL dialect rewrite (reference
    // docs .../sql/queries/joins.md "Array Expansion"): value column
    // first, 1-BASED ordinal last — rewritten by FlinkSqlDialect into
    // inline over a 1-based-index zip.
    QueryDef("q_unnest_ordinality", (s, dir) => {
      t(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .createOrReplaceTempView("unnest_ord_docs")
      s.sql(graft.api.FlinkSqlDialect.translate("""
        SELECT doc_id, word, CAST(ord AS BIGINT) AS ord
        FROM unnest_ord_docs
        CROSS JOIN UNNEST(words) WITH ORDINALITY AS u(word, ord)"""))
        .filter(col("ord") <= 5)
    }, Some("""
      SELECT doc_id, words[i] AS word, CAST(i AS BIGINT) AS ord
      FROM (SELECT doc_id, string_split(text, ' ') AS words
            FROM documents WHERE doc_id < 20),
           generate_series(1, 5) g(i)
      WHERE i <= len(words)""")),

    // Pivot-style conditional aggregation.
    QueryDef("q_pivot", (s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "view", 1)).as("n_view"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type") === "error", 1)).as("n_error"))
    }, Some("""
      SELECT user_id,
        COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
        COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
        COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        COUNT(*) FILTER (WHERE event_type = 'error') AS n_error
      FROM events GROUP BY user_id""")),

    // Correlated scalar subquery (decorrelated to join by Catalyst —
    // reference FlinkDecorrelateProgram).
    QueryDef("q_subquery_scalar", (s, dir) => sql(s, dir, """
      SELECT p_partkey, p_retailprice, (
        SELECT COUNT(*) FROM lineitem WHERE l_partkey = p_partkey) AS n_li
      FROM part WHERE p_size > 45"""),
      Some("""
      SELECT p_partkey, p_retailprice, (
        SELECT COUNT(*) FROM lineitem WHERE l_partkey = p_partkey) AS n_li
      FROM part WHERE p_size > 45""")),

    // IN subquery → semi join (reference SEMI_JOIN_RULES).
    QueryDef("q_subquery_in", (s, dir) => sql(s, dir, """
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000)"""),
      Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""")),

    // SELECT DISTINCT projection.
    QueryDef("q_distinct", (s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
    }, Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem""")),

    // DDL-declared complex types (reference SqlCreateTable grammar over
    // the LogicalTypeRoot lattice; FlinkDdl ARRAY/MAP/ROW support) plus
    // computed columns (SqlComputedColumn): the embeddings table is
    // declared with ARRAY<FLOAT> and two computed columns, read through
    // TableEnv SQL, and aggregated. FLOOR-quantized per row before the
    // sum so float->double totals stay order-independent.
    QueryDef("q_ddl_complex_types", (s, dir) => {
      val env = graft.api.TableEnv(s)
      env.executeSql(s"""
        CREATE TABLE emb_ddl (
          vec_id BIGINT,
          embedding ARRAY<FLOAT>,
          label INT,
          dim AS size(embedding),
          e0q AS CAST(FLOOR(CAST(element_at(embedding, 1) AS DOUBLE)
            * 100) AS BIGINT)
        ) WITH ('connector' = 'filesystem',
                'path' = '$dir/embeddings.parquet',
                'format' = 'parquet')""")
      env.executeSql("""
        SELECT label, COUNT(*) AS n,
          CAST(SUM(dim) AS BIGINT) AS sum_dim,
          CAST(SUM(e0q) AS BIGINT) AS sum_e0q
        FROM emb_ddl GROUP BY label""")
    }, Some("""
      SELECT label, COUNT(*) AS n,
        CAST(SUM(len(embedding)) AS BIGINT) AS sum_dim,
        CAST(SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 100) AS BIGINT))
          AS BIGINT) AS sum_e0q
      FROM embeddings GROUP BY label"""))
  )
}
