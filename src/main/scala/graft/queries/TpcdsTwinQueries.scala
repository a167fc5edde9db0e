package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.QueryDef
import Q._

/** TPC-DS channel/measure twins, part 1 (q12-q56).
  *
  * COVERAGE.md's "TPC-DS 99/99 accounting" documented 28 query numbers
  * as template twins of an implemented structural family (TPC-DS reuses
  * its query templates across the store/web/catalog channels — reference
  * gate: flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/).
  * This file and [[TpcdsTwinQueries2]] EXECUTE those twins instead of
  * arguing them: each query is its parent's template with the twin axis
  * (channel filter, measure, or grouping column) actually changed, and
  * each is hash-oracled vs DuckDB like every other board query.
  *
  * Channel convention (as in TpcdsQueries s4/s5/s11): o_orderstatus
  * F=store, O=web, P=catalog. Same scale discipline as the parents:
  * fixed-cardinality dims broadcast, one shuffle per fact aggregation,
  * exact-decimal money math, total ORDER BY under every LIMIT.
  */
object TpcdsTwinQueries {

  private val d184 = DecimalType(18, 4)

  val defs: Seq[QueryDef] = Seq(

    // ---- q12: web twin of s98 (tpcds query12 = query98 over web_sales)
    // — ratio-to-class revenue share, fact restricted to the web channel,
    // 1997 ship year. ----
    QueryDef("q_tpcds_q12", (s, dir) => {
      val base = t(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1997)
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), col("p_brand"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))
          .cast(d184)).as("rev_dec"))
      val w = Window.partitionBy(col("p_type"))
      base
        .withColumn("class_total", sum(col("rev_dec")).over(w))
        .select(col("p_type"), col("p_brand"),
          col("rev_dec").cast("double").as("itemrevenue"),
          (col("rev_dec").cast("double") * 100 /
            col("class_total").cast("double")).as("revenueratio"))
        .orderBy(col("p_type"), col("revenueratio"), col("p_brand"))
    }, Some(s"""
      WITH base AS (
        SELECT p_type, p_brand,
          SUM(CAST(${revenueSql("l_extendedprice", "l_discount")}
            AS DECIMAL(18,4))) AS rev_dec
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE year(l_shipdate) = 1997 AND o_orderstatus = 'O'
        GROUP BY 1, 2)
      SELECT p_type, p_brand,
        CAST(rev_dec AS DOUBLE) AS itemrevenue,
        CAST(rev_dec AS DOUBLE) * 100 /
          CAST(SUM(rev_dec) OVER (PARTITION BY p_type) AS DOUBLE)
          AS revenueratio
      FROM base
      ORDER BY p_type, revenueratio, p_brand""")),

    // ---- q20: catalog twin of s98/q12 (tpcds query20 = the same
    // template over catalog_sales) — catalog channel, 1998. ----
    QueryDef("q_tpcds_q20", (s, dir) => {
      val base = t(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1998)
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), col("p_brand"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))
          .cast(d184)).as("rev_dec"))
      val w = Window.partitionBy(col("p_type"))
      base
        .withColumn("class_total", sum(col("rev_dec")).over(w))
        .select(col("p_type"), col("p_brand"),
          col("rev_dec").cast("double").as("itemrevenue"),
          (col("rev_dec").cast("double") * 100 /
            col("class_total").cast("double")).as("revenueratio"))
        .orderBy(col("p_type"), col("revenueratio"), col("p_brand"))
    }, Some(s"""
      WITH base AS (
        SELECT p_type, p_brand,
          SUM(CAST(${revenueSql("l_extendedprice", "l_discount")}
            AS DECIMAL(18,4))) AS rev_dec
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE year(l_shipdate) = 1998 AND o_orderstatus = 'P'
        GROUP BY 1, 2)
      SELECT p_type, p_brand,
        CAST(rev_dec AS DOUBLE) AS itemrevenue,
        CAST(rev_dec AS DOUBLE) * 100 /
          CAST(SUM(rev_dec) OVER (PARTITION BY p_type) AS DOUBLE)
          AS revenueratio
      FROM base
      ORDER BY p_type, revenueratio, p_brand""")),

    // ---- q19: brand-grain twin of s46 — the cross-role dimension
    // mismatch (supplier nation <> customer nation) reported at the
    // BRAND grain instead of per customer (tpcds query19's
    // brand-report-over-zip-mismatch shape). ----
    QueryDef("q_tpcds_q19", (s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "supplier").select(col("s_suppkey"),
          col("s_nationkey")), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select(col("c_custkey"),
          col("c_nationkey")), col("o_custkey") === col("c_custkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey"))
        .join(broadcast(t(s, dir, "part").select(col("p_partkey"),
          col("p_brand"))), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_cross"),
          sum(money(col("l_extendedprice"))).as("rev_dec"))
        .select(col("p_brand"), col("n_cross"),
          col("rev_dec").cast("double").as("cross_rev"))
        .orderBy(col("cross_rev").desc, col("p_brand")).limit(100)
    }, Some(s"""
      SELECT p_brand, COUNT(*) AS n_cross,
        CAST(SUM(${moneySql("l_extendedprice")}) AS DOUBLE) AS cross_rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part ON l_partkey = p_partkey
      WHERE s_nationkey <> c_nationkey
      GROUP BY p_brand
      ORDER BY cross_rev DESC, p_brand LIMIT 100""")),

    // ---- q26: catalog twin of s7 (tpcds query26 = query7 over
    // catalog_sales) — the four-average demographic item report with
    // the catalog channel + a different segment gate. ----
    QueryDef("q_tpcds_q26", (s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
            .filter(col("o_orderstatus") === "P"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer")
            .filter(col("c_mktsegment") === "AUTOMOBILE"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(davg(col("l_quantity")), 6).as("agg1"),
          round(davg(col("l_extendedprice")), 6).as("agg2"),
          round(davg(col("l_discount")), 6).as("agg3"),
          round(davg(col("l_tax")), 6).as("agg4"))
        .orderBy(col("p_brand")).limit(100)
    }, Some(s"""
      SELECT p_brand,
        ROUND(${davgSql("l_quantity")}, 6) AS agg1,
        ROUND(${davgSql("l_extendedprice")}, 6) AS agg2,
        ROUND(${davgSql("l_discount")}, 6) AS agg3,
        ROUND(${davgSql("l_tax")}, 6) AS agg4
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part ON l_partkey = p_partkey
      WHERE o_orderstatus = 'P' AND c_mktsegment = 'AUTOMOBILE'
      GROUP BY 1 ORDER BY p_brand LIMIT 100""")),

    // ---- q27: store twin of s7 under a ROLLUP (tpcds query27 =
    // query26's template over store_sales with ROLLUP over the state
    // hierarchy — here nation -> brand). s18/s22 discipline: the fact
    // aggregates ONCE at the finest grain (sums + per-measure counts),
    // Expand runs over the ~|nation x brand| partials, avg = sum/count
    // re-derived per rollup level (exact decimal, one double division).
    // ----
    QueryDef("q_tpcds_q27", (s, dir) => {
      val fine = t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
            .filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer")
            .filter(col("c_mktsegment") === "HOUSEHOLD"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "part").select(col("p_partkey"),
          col("p_brand"))), col("l_partkey") === col("p_partkey"))
        .groupBy(col("n_name"), col("p_brand"))
        .agg(sum(col("l_quantity").cast(d184)).as("sq"),
          count(col("l_quantity")).as("nq"),
          sum(col("l_extendedprice").cast(d184)).as("sp"),
          count(col("l_extendedprice")).as("np"),
          sum(col("l_discount").cast(d184)).as("sd"),
          count(col("l_discount")).as("nd"),
          sum(col("l_tax").cast(d184)).as("st"),
          count(col("l_tax")).as("nt"))
      fine.rollup(col("n_name"), col("p_brand"))
        .agg(grouping_id().as("gid"),
          round(sum(col("sq")).cast("double") / sum(col("nq")), 6)
            .as("agg1"),
          round(sum(col("sp")).cast("double") / sum(col("np")), 6)
            .as("agg2"),
          round(sum(col("sd")).cast("double") / sum(col("nd")), 6)
            .as("agg3"),
          round(sum(col("st")).cast("double") / sum(col("nt")), 6)
            .as("agg4"))
        .orderBy(col("n_name").asc_nulls_first,
          col("p_brand").asc_nulls_first)
    }, Some(s"""
      SELECT CAST(GROUPING(n_name, p_brand) AS BIGINT) AS gid,
        n_name, p_brand,
        ROUND(${davgSql("l_quantity")}, 6) AS agg1,
        ROUND(${davgSql("l_extendedprice")}, 6) AS agg2,
        ROUND(${davgSql("l_discount")}, 6) AS agg3,
        ROUND(${davgSql("l_tax")}, 6) AS agg4
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN part ON l_partkey = p_partkey
      WHERE o_orderstatus = 'F' AND c_mktsegment = 'HOUSEHOLD'
      GROUP BY ROLLUP(n_name, p_brand)
      ORDER BY n_name ASC NULLS FIRST, p_brand ASC NULLS FIRST""")),

    // ---- q29: quantity-measure twin of s25 (tpcds query29 = query25
    // with quantity instead of profit measures) — the sales/returns
    // grain report in units, not currency. ----
    QueryDef("q_tpcds_q29", (s, dir) => {
      val z = lit(0).cast(DecimalType(12, 2))
      t(s, dir, "lineitem")
        .join(t(s, dir, "supplier").select(col("s_suppkey"),
          col("s_nationkey")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("n_name"), col("p_brand"))
        .agg(
          sum(when(col("l_returnflag") =!= "R",
            money(col("l_quantity"))).otherwise(z)).as("sold_dec"),
          sum(when(col("l_returnflag") === "R",
            money(col("l_quantity"))).otherwise(z)).as("ret_dec"))
        .select(col("n_name"), col("p_brand"),
          col("sold_dec").cast("double").as("sold_qty"),
          col("ret_dec").cast("double").as("ret_qty"),
          (col("sold_dec") - col("ret_dec")).cast("double").as("net_qty"))
        .orderBy(col("n_name"), col("p_brand"))
    }, Some(s"""
      SELECT n_name, p_brand,
        CAST(SUM(CASE WHEN l_returnflag <> 'R'
          THEN ${moneySql("l_quantity")}
          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS sold_qty,
        CAST(SUM(CASE WHEN l_returnflag = 'R'
          THEN ${moneySql("l_quantity")}
          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS ret_qty,
        CAST(SUM(CASE WHEN l_returnflag <> 'R'
          THEN ${moneySql("l_quantity")}
          ELSE CAST(0 AS DECIMAL(12,2)) END) -
          SUM(CASE WHEN l_returnflag = 'R'
          THEN ${moneySql("l_quantity")}
          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS net_qty
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY n_name, p_brand
      ORDER BY n_name, p_brand""")),

    // ---- q30: web twin of s1 (tpcds query30 = query1 over
    // web_returns) — customers whose WEB-channel returned revenue
    // exceeds 1.2x their nation's average. ----
    QueryDef("q_tpcds_q30", (s, dir) => {
      val ctr = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_nationkey"))
        .agg(sum(money(col("l_extendedprice"))).as("total_dec"))
      val avgs = ctr.groupBy(col("c_nationkey").as("avg_nkey"))
        .agg((sum(col("total_dec")).cast("double") / count(lit(1)))
          .as("avg_ret"))
      ctr.join(broadcast(avgs), col("c_nationkey") === col("avg_nkey"))
        .filter(col("total_dec").cast("double") > col("avg_ret") * 1.2)
        .join(t(s, dir, "customer").select(col("c_custkey"), col("c_name")),
          "c_custkey")
        .select(col("c_name"),
          col("total_dec").cast("double").as("total_return"))
        .orderBy(col("c_name")).limit(100)
    }, Some(s"""
      WITH ctr AS (
        SELECT c_custkey, c_nationkey,
          SUM(${moneySql("l_extendedprice")}) AS total_dec
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R' AND o_orderstatus = 'O'
        GROUP BY 1, 2),
      av AS (
        SELECT c_nationkey, CAST(SUM(total_dec) AS DOUBLE) / COUNT(*) AS avg_ret
        FROM ctr GROUP BY 1)
      SELECT c.c_name, CAST(ctr.total_dec AS DOUBLE) AS total_return
      FROM ctr
      JOIN av ON av.c_nationkey = ctr.c_nationkey
      JOIN customer c ON c.c_custkey = ctr.c_custkey
      WHERE CAST(ctr.total_dec AS DOUBLE) > av.avg_ret * 1.2
      ORDER BY c.c_name LIMIT 100""")),

    // ---- q37: catalog twin of s82 (tpcds query37 = query82 over
    // catalog_sales) — price-band + date-window item report gated to
    // the catalog channel, bands fitted to the data's [900,1000]
    // retail-price domain. ----
    QueryDef("q_tpcds_q37", (s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_retailprice") >= 920 && col("p_retailprice") <= 960)
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_date(lit("1997-06-01")) &&
          col("l_shipdate") < to_date(lit("1997-08-01")))
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "P"),
          col("l_orderkey") === col("o_orderkey"))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .agg(sum(money(col("l_quantity"))).as("qty_dec"))
        .filter(col("qty_dec") >= 10 && col("qty_dec") <= 500)
        .select(col("p_partkey").as("partkey"), col("p_name"),
          col("p_retailprice"),
          col("qty_dec").cast("double").as("window_qty"))
        .orderBy(col("partkey"))
    }, Some(s"""
      SELECT p_partkey AS partkey, p_name, p_retailprice,
        CAST(SUM(${moneySql("l_quantity")}) AS DOUBLE) AS window_qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE p_retailprice BETWEEN 920 AND 960
        AND l_shipdate >= DATE '1997-06-01'
        AND l_shipdate < DATE '1997-08-01'
        AND o_orderstatus = 'P'
      GROUP BY 1, 2, 3
      HAVING SUM(${moneySql("l_quantity")}) >= 10
         AND SUM(${moneySql("l_quantity")}) <= 500
      ORDER BY partkey""")),

    // ---- q42: category-grouping twin of s3 (tpcds query42 groups the
    // query3 template by category instead of brand) — (year, p_type)
    // revenue over small parts. ----
    QueryDef("q_tpcds_q42", (s, dir) => {
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_size") <= 5)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("l_shipdate")).as("d_year"), col("p_type"))
        .agg(dsum(revenue(col("l_extendedprice"), col("l_discount")))
          .as("sum_agg"))
        .orderBy(col("d_year"), col("sum_agg").desc, col("p_type"))
        .limit(100)
    }, Some(s"""
      SELECT year(l_shipdate) AS d_year, p_type,
        ${dsumSql(revenueSql("l_extendedprice", "l_discount"))} AS sum_agg
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size <= 5
      GROUP BY 1, 2
      ORDER BY d_year, sum_agg DESC, p_type LIMIT 100""")),

    // ---- q52: month-gated twin of s3 (tpcds query52 is query3's brand
    // report restricted to one sales month). ----
    QueryDef("q_tpcds_q52", (s, dir) => {
      t(s, dir, "lineitem")
        .filter(month(col("l_shipdate")) === 11)
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("l_shipdate")).as("d_year"), col("p_brand"))
        .agg(dsum(revenue(col("l_extendedprice"), col("l_discount")))
          .as("sum_agg"))
        .orderBy(col("d_year"), col("sum_agg").desc, col("p_brand"))
        .limit(100)
    }, Some(s"""
      SELECT year(l_shipdate) AS d_year, p_brand,
        ${dsumSql(revenueSql("l_extendedprice", "l_discount"))} AS sum_agg
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE month(l_shipdate) = 11
      GROUP BY 1, 2
      ORDER BY d_year, sum_agg DESC, p_brand LIMIT 100""")),

    // ---- q55: manager-gate twin of s3 (tpcds query55 gates query3's
    // brand report on one manager id — mapped to one part size). ----
    QueryDef("q_tpcds_q55", (s, dir) => {
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_size") === 7)),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(revenue(col("l_extendedprice"), col("l_discount")))
          .as("sum_agg"))
        .orderBy(col("sum_agg").desc, col("p_brand"))
        .limit(100)
    }, Some(s"""
      SELECT p_brand,
        ${dsumSql(revenueSql("l_extendedprice", "l_discount"))} AS sum_agg
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size = 7
      GROUP BY 1
      ORDER BY sum_agg DESC, p_brand LIMIT 100""")),

    // ---- q43: day-of-week twin of s66 (tpcds query43 pivots by day of
    // week where query66 pivots by month). Spark's dayofweek is
    // 1=Sunday..7; DuckDB's is 0=Sunday..6, so the oracle shifts by
    // one. ----
    QueryDef("q_tpcds_q43", (s, dir) => {
      def dSum(d: Int) = sum(when(dayofweek(col("o_orderdate")) === d,
        money(col("o_totalprice"))).otherwise(lit(0).cast(DecimalType(12, 2))))
        .cast("double").as(s"dow${d}_sales")
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dSum(1), (2 to 7).map(dSum): _*)
        .orderBy(col("n_name"))
    }, Some {
      val cols = (1 to 7).map(d =>
        s"""CAST(SUM(CASE WHEN dayofweek(o_orderdate) + 1 = $d
           THEN ${moneySql("o_totalprice")}
           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           AS dow${d}_sales""").mkString(", ")
      s"""
      SELECT n_name, $cols
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name"""
    }),

    // ---- q53: manufacturer twin of s89 (tpcds query53 = query89's
    // monthly average-deviation report at the manufacturer grain —
    // mapped to p_type). ----
    QueryDef("q_tpcds_q53", (s, dir) => {
      val monthly = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").select(col("p_partkey"),
          col("p_type"))), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), year(col("l_shipdate")).as("y"),
          month(col("l_shipdate")).as("m"))
        .agg(sum(money(col("l_extendedprice"))).as("sales_dec"))
      val w = Window.partitionBy(col("p_type"), col("y"))
      monthly
        .withColumn("avg_sales",
          (sum(col("sales_dec")).over(w).cast("double") /
            count(lit(1)).over(w)))
        .withColumn("sales", col("sales_dec").cast("double"))
        .filter(abs(col("sales") - col("avg_sales")) >
          col("avg_sales") * 0.1)
        .select(col("p_type"), col("y"), col("m"), col("sales"),
          col("avg_sales"))
        .orderBy(col("p_type"), col("y"), col("m"))
    }, Some(s"""
      WITH monthly AS (
        SELECT p_type, year(l_shipdate) AS y, month(l_shipdate) AS m,
          SUM(${moneySql("l_extendedprice")}) AS sales_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2, 3),
      win AS (
        SELECT p_type, y, m, CAST(sales_dec AS DOUBLE) AS sales,
          CAST(SUM(sales_dec) OVER (PARTITION BY p_type, y) AS DOUBLE)
            / COUNT(*) OVER (PARTITION BY p_type, y) AS avg_sales
        FROM monthly)
      SELECT p_type, y, m, sales, avg_sales FROM win
      WHERE abs(sales - avg_sales) > avg_sales * 0.1
      ORDER BY p_type, y, m""")),

    // ---- q56: item-id-grain twin of s33 (tpcds query56 is the
    // query33 template filtered by a size list, grouped per item). ----
    QueryDef("q_tpcds_q56", (s, dir) => {
      val p = t(s, dir, "part").filter(col("p_size").isin(1, 5, 9))
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
        SELECT p_partkey FROM part WHERE p_size IN (1, 5, 9)),
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
  )
}
