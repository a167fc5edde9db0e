package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.QueryDef
import Q._

/** TPC-DS channel/measure twins, part 2 (q60-q99) — see
  * [[TpcdsTwinQueries]] for the twin-axis rationale and channel
  * convention (o_orderstatus F=store, O=web, P=catalog).
  */
object TpcdsTwinQueries2 {

  private val d184 = DecimalType(18, 4)

  val defs: Seq[QueryDef] = Seq(

    // ---- q60: category-filter twin of s33/q56 (tpcds query60 filters
    // the multi-channel union template by category instead of the q56
    // size list; the report grain stays per item). ----
    QueryDef("q_tpcds_q60", (s, dir) => {
      val p = t(s, dir, "part").filter(col("p_type") === "STANDARD")
        .select(col("p_partkey"))
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      def channel(st: String) =
        l.join(o.filter(col("o_orderstatus") === st),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_partkey"))
          .agg(sum(money(col("l_extendedprice"))).as("sales_dec"))
      channel("F").unionByName(channel("O")).unionByName(channel("P"))
        .groupBy(col("p_partkey"))
        .agg(sum(col("sales_dec")).cast("double").as("total_sales"))
        .orderBy(col("total_sales").desc, col("p_partkey"))
        .limit(10)
    }, Some(s"""
      WITH pr AS (
        SELECT p_partkey FROM part WHERE p_type = 'STANDARD'),
      ch AS (
        SELECT pr.p_partkey, SUM(${moneySql("l_extendedprice")}) AS sales_dec
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN pr ON l_partkey = pr.p_partkey
        WHERE o_orderstatus = 'F' GROUP BY 1
        UNION ALL
        SELECT pr.p_partkey, SUM(${moneySql("l_extendedprice")})
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN pr ON l_partkey = pr.p_partkey
        WHERE o_orderstatus = 'O' GROUP BY 1
        UNION ALL
        SELECT pr.p_partkey, SUM(${moneySql("l_extendedprice")})
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN pr ON l_partkey = pr.p_partkey
        WHERE o_orderstatus = 'P' GROUP BY 1)
      SELECT p_partkey, CAST(SUM(sales_dec) AS DOUBLE) AS total_sales
      FROM ch GROUP BY p_partkey
      ORDER BY total_sales DESC, p_partkey LIMIT 10""")),

    // ---- q63: net-measure twin of s89/q53 (tpcds query63 is the same
    // monthly deviation template over a different manager slice; here
    // the measure changes to discount-net revenue and the deviation
    // band tightens to 5%). ----
    QueryDef("q_tpcds_q63", (s, dir) => {
      val monthly = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").select(col("p_partkey"),
          col("p_brand"))), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), year(col("l_shipdate")).as("y"),
          month(col("l_shipdate")).as("m"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))
          .cast(d184)).as("sales_dec"))
      val w = Window.partitionBy(col("p_brand"), col("y"))
      monthly
        .withColumn("avg_sales",
          (sum(col("sales_dec")).over(w).cast("double") /
            count(lit(1)).over(w)))
        .withColumn("sales", col("sales_dec").cast("double"))
        .filter(abs(col("sales") - col("avg_sales")) >
          col("avg_sales") * 0.05)
        .select(col("p_brand"), col("y"), col("m"), col("sales"),
          col("avg_sales"))
        .orderBy(col("p_brand"), col("y"), col("m"))
    }, Some(s"""
      WITH monthly AS (
        SELECT p_brand, year(l_shipdate) AS y, month(l_shipdate) AS m,
          SUM(CAST(${revenueSql("l_extendedprice", "l_discount")}
            AS DECIMAL(18,4))) AS sales_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2, 3),
      win AS (
        SELECT p_brand, y, m, CAST(sales_dec AS DOUBLE) AS sales,
          CAST(SUM(sales_dec) OVER (PARTITION BY p_brand, y) AS DOUBLE)
            / COUNT(*) OVER (PARTITION BY p_brand, y) AS avg_sales
        FROM monthly)
      SELECT p_brand, y, m, sales, avg_sales FROM win
      WHERE abs(sales - avg_sales) > avg_sales * 0.05
      ORDER BY p_brand, y, m""")),

    // ---- q68: two-measure ticket twin of s34/s73 (tpcds query68
    // extends the query34 trip template with per-ticket sum measures).
    // The fact aggregates BEFORE the dimension joins (partial-agg
    // shrinks the shuffle), exactly like s73. ----
    QueryDef("q_tpcds_q68", (s, dir) => {
      val tickets = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(money(col("l_extendedprice"))).as("price_dec"),
          sum((money(col("l_extendedprice")) * rate(col("l_tax")))
            .cast(d184)).as("tax_dec"))
        .filter(col("n_items").between(3, 6))
      tickets
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          col("price_dec").cast("double").as("sum_price"),
          col("tax_dec").cast("double").as("sum_tax"))
        .orderBy(col("c_name"), col("o_orderkey"))
        .limit(200)
    }, Some(s"""
      SELECT c_name, o_orderkey,
        CAST(price_dec AS DOUBLE) AS sum_price,
        CAST(tax_dec AS DOUBLE) AS sum_tax
      FROM (
        SELECT l_orderkey, COUNT(*) AS n_items,
          SUM(${moneySql("l_extendedprice")}) AS price_dec,
          SUM(CAST(${moneySql("l_extendedprice")} * ${rateSql("l_tax")}
            AS DECIMAL(18,4))) AS tax_dec
        FROM lineitem GROUP BY 1 HAVING COUNT(*) BETWEEN 3 AND 6)
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY c_name, o_orderkey LIMIT 200""")),

    // ---- q79: day-gated ticket twin of s34/s73 (tpcds query79 reports
    // per-ticket revenue for Monday trips). Spark dayofweek Monday=2,
    // DuckDB dayofweek Monday=1. ----
    QueryDef("q_tpcds_q79", (s, dir) => {
      val mondays = t(s, dir, "orders")
        .filter(dayofweek(col("o_orderdate")) === 2 &&
          col("o_orderpriority") === "3-MEDIUM")
      val perTicket = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(revenue(col("l_extendedprice"), col("l_discount"))
            .cast(d184)).as("rev_dec"))
      perTicket
        .join(mondays, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("n_items"),
          col("rev_dec").cast("double").as("ticket_rev"))
        .orderBy(col("c_name"), col("o_orderkey"))
        .limit(200)
    }, Some(s"""
      SELECT c_name, o_orderkey, n_items,
        CAST(rev_dec AS DOUBLE) AS ticket_rev
      FROM (
        SELECT l_orderkey, COUNT(*) AS n_items,
          SUM(CAST(${revenueSql("l_extendedprice", "l_discount")}
            AS DECIMAL(18,4))) AS rev_dec
        FROM lineitem GROUP BY 1)
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE dayofweek(o_orderdate) = 1 AND o_orderpriority = '3-MEDIUM'
      ORDER BY c_name, o_orderkey LIMIT 200""")),

    // ---- q69: channel-absence twin of s10/s35 (tpcds query69 keeps
    // customers ACTIVE in the store channel but ABSENT from web and
    // catalog, then reports demographic stats). Semi + two anti joins
    // feeding the s35 stats block. ----
    QueryDef("q_tpcds_q69", (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(year(col("o_orderdate")).between(1997, 1998))
      def ch(st: String) = o.filter(col("o_orderstatus") === st)
        .select(col("o_custkey"))
      t(s, dir, "customer")
        .join(ch("F"), col("c_custkey") === col("o_custkey"), "left_semi")
        .join(ch("O"), col("c_custkey") === col("o_custkey"), "left_anti")
        .join(ch("P"), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"),
          davg(col("c_acctbal")).as("avg_bal"))
        .orderBy(col("c_mktsegment"))
    }, Some(s"""
      SELECT c_mktsegment, COUNT(*) AS n_cust,
        MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
        ${davgSql("c_acctbal")} AS avg_bal
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
            AND year(o_orderdate) BETWEEN 1997 AND 1998)
        AND NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
            AND year(o_orderdate) BETWEEN 1997 AND 1998)
        AND NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
            AND year(o_orderdate) BETWEEN 1997 AND 1998)
      GROUP BY 1
      ORDER BY 1""")),

    // ---- q74: week-grain twin of s11/s4 (tpcds query74 is the
    // query11 growth template at the week grain) — the YoY ratio runs
    // over each customer's PEAK WEEKLY spend per channel, so the
    // weekly aggregation genuinely changes the answer. Two-level
    // aggregate: (cust, channel, year, week) sums, then conditional
    // MAX pivot. weekofyear is ISO in both engines. ----
    QueryDef("q_tpcds_q74", (s, dir) => {
      val zero = lit(0).cast(DecimalType(22, 2))
      val weekly = t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "O") &&
          year(col("o_orderdate")).isin(1997, 1998))
        .groupBy(col("o_custkey"), col("o_orderstatus"),
          year(col("o_orderdate")).as("y"),
          weekofyear(col("o_orderdate")).as("wk"))
        .agg(sum(money(col("o_totalprice"))).as("wk_dec"))
      val peak = (st: String, yr: Int) => coalesce(
        max(when(col("o_orderstatus") === st && col("y") === yr,
          col("wk_dec"))), zero)
      weekly
        .groupBy(col("o_custkey"))
        .agg(peak("F", 1997).as("f97"), peak("F", 1998).as("f98"),
          peak("O", 1997).as("o97"), peak("O", 1998).as("o98"))
        .filter(col("f97").cast("double") > 0 && col("o97").cast("double") > 0)
        .filter(col("o98").cast("double") / col("o97").cast("double") >
          col("f98").cast("double") / col("f97").cast("double"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"),
          (col("o98").cast("double") / col("o97").cast("double"))
            .as("web_growth"),
          (col("f98").cast("double") / col("f97").cast("double"))
            .as("store_growth"))
        .orderBy(col("c_name")).limit(100)
    }, Some(s"""
      WITH weekly AS (
        SELECT o_custkey, o_orderstatus, year(o_orderdate) AS y,
          weekofyear(o_orderdate) AS wk,
          SUM(${moneySql("o_totalprice")}) AS wk_dec
        FROM orders
        WHERE o_orderstatus IN ('F', 'O')
          AND year(o_orderdate) IN (1997, 1998)
        GROUP BY 1, 2, 3, 4),
      pk AS (
        SELECT o_custkey,
          COALESCE(MAX(CASE WHEN o_orderstatus = 'F' AND y = 1997
            THEN wk_dec END), CAST(0 AS DECIMAL(22,2))) AS f97,
          COALESCE(MAX(CASE WHEN o_orderstatus = 'F' AND y = 1998
            THEN wk_dec END), CAST(0 AS DECIMAL(22,2))) AS f98,
          COALESCE(MAX(CASE WHEN o_orderstatus = 'O' AND y = 1997
            THEN wk_dec END), CAST(0 AS DECIMAL(22,2))) AS o97,
          COALESCE(MAX(CASE WHEN o_orderstatus = 'O' AND y = 1998
            THEN wk_dec END), CAST(0 AS DECIMAL(22,2))) AS o98
        FROM weekly GROUP BY 1)
      SELECT c_name,
        CAST(o98 AS DOUBLE) / CAST(o97 AS DOUBLE) AS web_growth,
        CAST(f98 AS DOUBLE) / CAST(f97 AS DOUBLE) AS store_growth
      FROM pk JOIN customer ON o_custkey = c_custkey
      WHERE CAST(f97 AS DOUBLE) > 0 AND CAST(o97 AS DOUBLE) > 0
        AND CAST(o98 AS DOUBLE) / CAST(o97 AS DOUBLE)
          > CAST(f98 AS DOUBLE) / CAST(f97 AS DOUBLE)
      ORDER BY c_name LIMIT 100""")),

    // ---- q80: item-hierarchy P&L twin of s5/s77 (tpcds query80 rolls
    // the three-channel sales/returns report over the item hierarchy
    // and adds a profit measure net of tax). s5 discipline: ONE fact
    // scan reduced to (status, brand) partials with conditional
    // measures, then the channel map + ROLLUP over ~|status x brand|
    // rows — rollup-of-sums is exact by decimal associativity. ----
    QueryDef("q_tpcds_q80", (s, dir) => {
      val rev = revenue(col("l_extendedprice"), col("l_discount")).cast(d184)
      val tax = (money(col("l_extendedprice")) * rate(col("l_tax")))
        .cast(d184)
      val zero = lit(0).cast(d184)
      val perKey = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "part").select(col("p_partkey"),
          col("p_brand"))), col("l_partkey") === col("p_partkey"))
        .select(col("o_orderstatus"), col("p_brand"),
          col("l_returnflag"), rev.as("rev"), tax.as("tax"))
        .groupBy(col("o_orderstatus"), col("p_brand"))
        .agg(
          sum(when(col("l_returnflag") =!= "R", col("rev")).otherwise(zero))
            .as("sales_part"),
          sum(when(col("l_returnflag") === "R", col("rev")).otherwise(zero))
            .as("return_part"),
          sum(when(col("l_returnflag") =!= "R", col("tax")).otherwise(zero))
            .as("tax_part"))
      perKey
        .withColumn("channel",
          when(col("o_orderstatus") === "F", "store channel")
            .when(col("o_orderstatus") === "O", "web channel")
            .otherwise("catalog channel"))
        .rollup(col("channel"), col("p_brand"))
        .agg(sum(col("sales_part")).cast("double").as("sales"),
          sum(col("return_part")).cast("double").as("returns"),
          (sum(col("sales_part")) - sum(col("return_part")) -
            sum(col("tax_part"))).cast("double").as("profit"))
        .orderBy(col("channel").asc_nulls_first,
          col("p_brand").asc_nulls_first)
    }, Some(s"""
      WITH base AS (
        SELECT CASE o_orderstatus WHEN 'F' THEN 'store channel'
                 WHEN 'O' THEN 'web channel'
                 ELSE 'catalog channel' END AS channel,
          p_brand, l_returnflag,
          CAST(${revenueSql("l_extendedprice", "l_discount")}
            AS DECIMAL(18,4)) AS rev,
          CAST(${moneySql("l_extendedprice")} * ${rateSql("l_tax")}
            AS DECIMAL(18,4)) AS tax
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey)
      SELECT channel, p_brand,
        CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN rev
          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS sales,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN rev
          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS returns,
        CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN rev
            ELSE CAST(0 AS DECIMAL(18,4)) END)
          - SUM(CASE WHEN l_returnflag = 'R' THEN rev
            ELSE CAST(0 AS DECIMAL(18,4)) END)
          - SUM(CASE WHEN l_returnflag <> 'R' THEN tax
            ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS profit
      FROM base
      GROUP BY ROLLUP(channel, p_brand)
      ORDER BY channel ASC NULLS FIRST, p_brand ASC NULLS FIRST""")),

    // ---- q81: catalog twin of s1/q30 (tpcds query81 = query30 over
    // catalog_returns, reporting the account balance alongside). ----
    QueryDef("q_tpcds_q81", (s, dir) => {
      val ctr = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_nationkey"))
        .agg(sum(money(col("l_extendedprice"))).as("total_dec"))
      val avgs = ctr.groupBy(col("c_nationkey").as("avg_nkey"))
        .agg((sum(col("total_dec")).cast("double") / count(lit(1)))
          .as("avg_ret"))
      ctr.join(broadcast(avgs), col("c_nationkey") === col("avg_nkey"))
        .filter(col("total_dec").cast("double") > col("avg_ret") * 1.2)
        .join(t(s, dir, "customer").select(col("c_custkey"), col("c_name"),
          col("c_acctbal")), "c_custkey")
        .select(col("c_name"), col("c_acctbal"),
          col("total_dec").cast("double").as("total_return"))
        .orderBy(col("c_name")).limit(100)
    }, Some(s"""
      WITH ctr AS (
        SELECT c_custkey, c_nationkey,
          SUM(${moneySql("l_extendedprice")}) AS total_dec
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R' AND o_orderstatus = 'P'
        GROUP BY 1, 2),
      av AS (
        SELECT c_nationkey, CAST(SUM(total_dec) AS DOUBLE) / COUNT(*) AS avg_ret
        FROM ctr GROUP BY 1)
      SELECT c.c_name, c.c_acctbal,
        CAST(ctr.total_dec AS DOUBLE) AS total_return
      FROM ctr
      JOIN av ON av.c_nationkey = ctr.c_nationkey
      JOIN customer c ON c.c_custkey = ctr.c_custkey
      WHERE CAST(ctr.total_dec AS DOUBLE) > av.avg_ret * 1.2
      ORDER BY c.c_name LIMIT 100""")),

    // ---- q85: banded-average returns twin of s13/s48 (tpcds query85
    // reports averages per reason over OR'd demographic bundles of
    // RETURNED lines; the priority column stands in for the reason
    // dim). ----
    QueryDef("q_tpcds_q85", (s, dir) => {
      val j = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      val b1 = col("c_mktsegment") === "BUILDING" &&
        col("l_quantity") >= 1 && col("l_quantity") <= 15
      val b2 = col("c_mktsegment") === "AUTOMOBILE" &&
        col("l_quantity") >= 16 && col("l_quantity") <= 30
      val b3 = col("c_mktsegment") === "MACHINERY" &&
        col("l_quantity") >= 31 && col("l_quantity") <= 50
      j.filter(b1 || b2 || b3)
        .groupBy(col("o_orderpriority"))
        .agg(round(davg(col("l_quantity")), 6).as("avg_qty"),
          round(davg(col("l_extendedprice")), 6).as("avg_refund"),
          round(davg(col("l_discount")), 6).as("avg_disc"))
        .orderBy(col("o_orderpriority"))
    }, Some(s"""
      SELECT o_orderpriority,
        ROUND(${davgSql("l_quantity")}, 6) AS avg_qty,
        ROUND(${davgSql("l_extendedprice")}, 6) AS avg_refund,
        ROUND(${davgSql("l_discount")}, 6) AS avg_disc
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
        AND ((c_mktsegment = 'BUILDING' AND l_quantity BETWEEN 1 AND 15)
          OR (c_mktsegment = 'AUTOMOBILE' AND l_quantity BETWEEN 16 AND 30)
          OR (c_mktsegment = 'MACHINERY' AND l_quantity BETWEEN 31 AND 50))
      GROUP BY 1 ORDER BY 1""")),

    // ---- q86: web twin of s70 (tpcds query86 is query70's
    // rank-within-parent rollup over web_sales WITHOUT the windowed
    // store pre-filter). Same hierarchy discipline: the fact
    // aggregates once at (region, nation), Expand and the rank windows
    // run over dimension-sized partials. ----
    QueryDef("q_tpcds_q86", (s, dir) => {
      val base = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(money(col("o_totalprice"))).as("s1"))
      val rolled = base
        .rollup(col("r_name"), col("n_name"))
        .agg(sum(col("s1")).as("total_dec"),
          grouping(col("r_name")).cast("int").as("gr"),
          grouping(col("n_name")).cast("int").as("gn"))
        .withColumn("lochierarchy", (col("gr") + col("gn")).cast("int"))
      val w = Window.partitionBy(col("lochierarchy"),
          when(col("gn") === 0, col("r_name")))
        .orderBy(col("total_dec").desc)
      rolled.withColumn("rank_within_parent", rank().over(w).cast("long"))
        .select(col("r_name"), col("n_name"),
          col("total_dec").cast("double").as("total_sum"),
          col("lochierarchy"), col("rank_within_parent"))
        .orderBy(col("lochierarchy").desc, col("r_name").asc_nulls_first,
          col("rank_within_parent"), col("n_name").asc_nulls_first)
    }, Some(s"""
      WITH base AS (
        SELECT r_name, n_name, SUM(${moneySql("o_totalprice")}) AS s1
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE o_orderstatus = 'O'
        GROUP BY 1, 2),
      rolled AS (
        SELECT r_name, n_name, SUM(s1) AS total_dec,
          CAST(GROUPING(r_name) AS INTEGER) AS gr,
          CAST(GROUPING(n_name) AS INTEGER) AS gn,
          CAST(GROUPING(r_name) + GROUPING(n_name) AS INTEGER)
            AS lochierarchy
        FROM base
        GROUP BY ROLLUP(r_name, n_name))
      SELECT r_name, n_name, CAST(total_dec AS DOUBLE) AS total_sum,
        lochierarchy,
        RANK() OVER (PARTITION BY lochierarchy,
          CASE WHEN gn = 0 THEN r_name END
          ORDER BY total_dec DESC) AS rank_within_parent
      FROM rolled
      ORDER BY lochierarchy DESC, r_name ASC NULLS FIRST,
        rank_within_parent, n_name ASC NULLS FIRST""")),

    // ---- q91: monthly loss report twin of s13+s61 (tpcds query91
    // reports returned currency per month gated by OR'd demographic
    // bundles — account-balance bands stand in for the credit-rating
    // buckets). ----
    QueryDef("q_tpcds_q91", (s, dir) => {
      val j = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      val b1 = col("c_mktsegment") === "BUILDING" && col("c_acctbal") < 1000
      val b2 = col("c_mktsegment") === "MACHINERY" && col("c_acctbal") >= 5000
      j.filter(b1 || b2)
        .groupBy(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n_returns"),
          dsum(col("l_extendedprice")).as("returns_loss"))
        .orderBy(col("y"), col("m"))
    }, Some(s"""
      SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        COUNT(*) AS n_returns,
        ${dsumSql("l_extendedprice")} AS returns_loss
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
        AND ((c_mktsegment = 'BUILDING' AND c_acctbal < 1000)
          OR (c_mktsegment = 'MACHINERY' AND c_acctbal >= 5000))
      GROUP BY 1, 2
      ORDER BY 1, 2""")),

    // ---- q92: web twin of s32 (tpcds query92 = query32's excess-
    // discount scalar over web_sales with a date window). Both the
    // per-part average and the probe run over the SAME restricted
    // web-1997 slice, as in the original's correlated subquery. ----
    QueryDef("q_tpcds_q92", (s, dir) => {
      val web = t(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1997)
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
      val avgs = web.groupBy(col("l_partkey").as("a_part"))
        .agg((sum(rate(col("l_discount"))).cast("double") /
          count(lit(1))).as("avg_disc"))
      web.join(avgs, col("l_partkey") === col("a_part"))
        .filter(rate(col("l_discount")).cast("double") >
          col("avg_disc") * 1.3)
        .agg(sum(money(col("l_extendedprice"))).cast("double")
          .as("excess_revenue"))
    }, Some(s"""
      WITH web AS (
        SELECT l_partkey, l_discount, l_extendedprice
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE year(l_shipdate) = 1997 AND o_orderstatus = 'O'),
      avgs AS (
        SELECT l_partkey AS a_part,
          CAST(SUM(${rateSql("l_discount")}) AS DOUBLE) / COUNT(*)
            AS avg_disc
        FROM web GROUP BY 1)
      SELECT CAST(SUM(${moneySql("l_extendedprice")}) AS DOUBLE)
        AS excess_revenue
      FROM web JOIN avgs ON l_partkey = a_part
      WHERE CAST(${rateSql("l_discount")} AS DOUBLE) > avg_disc * 1.3""")),

    // ---- q94: web ship-report twin of s16/s95 (tpcds query94 = the
    // query16 multi-warehouse template over web_sales with a date
    // window): 1998 web orders shipped by >= 2 distinct suppliers with
    // no returned line. ----
    QueryDef("q_tpcds_q94", (s, dir) => {
      val li = t(s, dir, "lineitem")
      val multiSupp = li.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"))
        .filter(col("n_supp") >= 2).select(col("l_orderkey"))
      val returned = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("rk"))
      t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O" &&
          year(col("o_orderdate")) === 1998)
        .join(multiSupp, col("o_orderkey") === multiSupp("l_orderkey"),
          "left_semi")
        .join(returned, col("o_orderkey") === col("rk"), "left_anti")
        .agg(count(lit(1)).as("order_count"),
          dsum(col("o_totalprice")).as("total_price"))
    }, Some(s"""
      WITH multi AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY 1 HAVING COUNT(DISTINCT l_suppkey) >= 2)
      SELECT COUNT(*) AS order_count,
        ${dsumSql("o_totalprice")} AS total_price
      FROM orders
      WHERE o_orderstatus = 'O' AND year(o_orderdate) = 1998
        AND o_orderkey IN (SELECT l_orderkey FROM multi)
        AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
                               WHERE l_returnflag = 'R')""")),

    // ---- q99: catalog latency twin of s50/s62 (tpcds query99 = the
    // query62 latency matrix over catalog_sales with wider bands):
    // 45-day buckets, catalog channel only. ----
    QueryDef("q_tpcds_q99", (s, dir) => {
      val lat = datediff(col("l_shipdate"), col("o_orderdate"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(lat <= 45, 1).otherwise(0)).as("d45"),
          sum(when(lat > 45 && lat <= 90, 1).otherwise(0)).as("d90"),
          sum(when(lat > 90 && lat <= 135, 1).otherwise(0)).as("d135"),
          sum(when(lat > 135, 1).otherwise(0)).as("dmore"))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      SELECT o_orderpriority,
        CAST(SUM(CASE WHEN lat <= 45 THEN 1 ELSE 0 END) AS BIGINT) AS d45,
        CAST(SUM(CASE WHEN lat > 45 AND lat <= 90 THEN 1 ELSE 0 END)
          AS BIGINT) AS d90,
        CAST(SUM(CASE WHEN lat > 90 AND lat <= 135 THEN 1 ELSE 0 END)
          AS BIGINT) AS d135,
        CAST(SUM(CASE WHEN lat > 135 THEN 1 ELSE 0 END) AS BIGINT) AS dmore
      FROM (
        SELECT o_orderpriority,
          datediff('day', o_orderdate, l_shipdate) AS lat
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'P')
      GROUP BY 1 ORDER BY 1""")),
  )
}
