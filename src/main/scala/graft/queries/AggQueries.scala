package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import Q._

/** Aggregation surface — reference: streaming/batch group aggregates
  * (flink-table-planner/.../exec/stream/StreamExecGroupAggregate.java,
  * BatchExecHashAggregate.java), grouping sets / Expand
  * (StreamExecExpand.java), distinct-agg split (SplitAggregateRule), and
  * the built-in aggregate functions in BuiltInFunctionDefinitions.java.
  *
  * All are declarative `groupBy().agg()` so Catalyst plans partial (map-
  * side) + final aggregation with whole-stage codegen — the shape that
  * scales: one shuffle on the group key, combiner before it.
  */
object AggQueries {

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape: wide multi-aggregate scan, the canonical hash-agg.
    QueryDef("q1_agg", (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(revenue(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("sum_disc_price"),
          sum(revenue(col("l_extendedprice"), col("l_discount"))
            * (lit(1) + rate(col("l_tax")))).cast("double").as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
    }, Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${dsumSql("l_quantity")} AS sum_qty,
        ${dsumSql("l_extendedprice")} AS sum_base_price,
        CAST(SUM(${revenueSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(${revenueSql("l_extendedprice", "l_discount")} * (1 + ${rateSql("l_tax")})) AS DOUBLE) AS sum_charge,
        ${davgSql("l_quantity")} AS avg_qty,
        ${davgSql("l_extendedprice")} AS avg_price,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus""")),

    // COUNT(DISTINCT) — Catalyst plans the distinct-aggregate expansion
    // natively (the reference needs SplitAggregateRule for the same).
    QueryDef("q_agg_distinct", (s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"))
    }, Some("""
      SELECT l_returnflag,
        COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(DISTINCT l_partkey) AS n_part,
        COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag""")),

    // Statistical aggregates (STDDEV_SAMP/VAR_SAMP/MIN/MAX —
    // BuiltInFunctionDefinitions.java).
    QueryDef("q_agg_stats", (s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"),
          davg(col("c_acctbal")).as("avg_bal"),
          round(stddev_samp(col("c_acctbal")), 2).as("sd_bal"),
          round(var_samp(col("c_acctbal")), 2).as("var_bal"))
    }, Some(s"""
      SELECT c_mktsegment,
        COUNT(*) AS n,
        MIN(c_acctbal) AS min_bal,
        MAX(c_acctbal) AS max_bal,
        ${davgSql("c_acctbal")} AS avg_bal,
        ROUND(STDDEV_SAMP(c_acctbal), 2) AS sd_bal,
        ROUND(VAR_SAMP(c_acctbal), 2) AS var_bal
      FROM customer GROUP BY c_mktsegment""")),

    // ROLLUP → Catalyst Expand (reference: StreamExecExpand.java via
    // DecomposeGroupingSetsRule).
    QueryDef("q_agg_rollup", (s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    }, Some(s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        ${dsumSql("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    QueryDef("q_agg_cube", (s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    }, Some(s"""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        ${dsumSql("o_totalprice")} AS sum_price
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    QueryDef("q_agg_groupingsets", (s, dir) => sql(s, dir, s"""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""),
      Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")),

    // HAVING (post-aggregate filter).
    QueryDef("q_agg_having", (s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_spent"))
        .filter(col("n_orders") >= 5)
    }, Some(s"""
      SELECT o_custkey, COUNT(*) AS n_orders,
        ${dsumSql("o_totalprice")} AS total_spent
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5""")),

    // LISTAGG (reference BuiltInFunctionDefinitions LISTAGG) — expressed
    // as sorted collect_list + concat_ws; deterministic via sort.
    QueryDef("q_agg_listagg", (s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("c_name"))))
          .as("names"),
          count(lit(1)).as("n"))
    }, Some("""
      SELECT c_nationkey,
        STRING_AGG(c_name, ',' ORDER BY c_name) AS names,
        COUNT(*) AS n
      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey""")),

    // MIN_BY / MAX_BY (reference FIRST_VALUE/LAST_VALUE by order) —
    // deterministic because o_orderkey is unique.
    QueryDef("q_agg_minmax_by", (s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          min_by(col("o_custkey"), col("o_orderkey")).as("first_cust"),
          max_by(col("o_custkey"), col("o_orderkey")).as("last_cust"),
          max(col("o_orderkey")).as("max_key"))
    }, Some("""
      SELECT o_orderpriority,
        ARG_MIN(o_custkey, o_orderkey) AS first_cust,
        ARG_MAX(o_custkey, o_orderkey) AS last_cust,
        MAX(o_orderkey) AS max_key
      FROM orders GROUP BY o_orderpriority""")),

    // Exact percentiles (reference PERCENTILE) — linear interpolation in
    // both engines.
    // SCALE BOUND: Spark's exact `percentile` buffers a value -> count
    // map PER GROUP, so its memory is O(distinct values per group).
    // Fine for bounded value domains (prices quantized to cents, char
    // counts, degrees); for unbounded/continuous domains at 100 TB use
    // approx_percentile (fixed-size sketch) or the deterministic
    // sampled ranking already shipped (Sketches.sampleRank) to cap the
    // state first. Same bound applies to q_winsorize and the k-core
    // degree percentile.
    QueryDef("q_agg_percentile", (s, dir) => {
      // One percentile(…, array(…)) buffer per group, not three: exact
      // percentile materializes a value->count map per aggregate, so the
      // fused form is 3x lighter in both memory and sort work.
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")
          .as("__p"))
        .select(col("l_returnflag"),
          round(col("__p").getItem(0), 4).as("p25"),
          round(col("__p").getItem(1), 4).as("p50"),
          round(col("__p").getItem(2), 4).as("p75"))
    }, Some("""
      SELECT l_returnflag,
        ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25,
        ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS p50,
        ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 4) AS p75
      FROM lineitem GROUP BY l_returnflag""")),

    // Collection aggregates: COLLECT/ARRAY_AGG as sorted array. Emitted as
    // a joined string (not a raw array column) so the driver's comparator —
    // which sorts pandas object columns — can hash it.
    QueryDef("q_agg_array", (s, dir) => {
      t(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(concat_ws(",",
            sort_array(collect_list(col("s_suppkey")))).as("supp_keys"),
          count(lit(1)).as("n"))
    }, Some("""
      SELECT s_nationkey,
        ARRAY_TO_STRING(LIST_SORT(LIST(s_suppkey)), ',') AS supp_keys,
        COUNT(*) AS n
      FROM supplier GROUP BY s_nationkey"""))
  )
}
