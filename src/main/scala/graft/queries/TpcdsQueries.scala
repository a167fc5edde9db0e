package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.QueryDef
import Q._

/** TPC-DS-derived query shapes — the reference's single quantitative
  * end-to-end gate is the 103-query TPC-DS answer-set run
  * (flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/,
  * test_tpcds.sh). The driver's schema is TPC-H-ish, so this file ports
  * the DISTINCT STRUCTURAL SHAPES of that suite onto the existing
  * tables (adaptation noted per query): CTE + correlated-average
  * filters, multi-channel UNION ALL with zero-padded measures under
  * ROLLUP, EXISTS/OR/NOT-EXISTS chains, cross-channel INTERSECT,
  * frequent-item × best-customer CTE composition, year-over-year
  * growth ratios, rollup-over-join with GROUPING()-ranked hierarchies,
  * windowed cumulative comparisons, and wide scalar-subquery rows.
  *
  * Scale discipline matches [[TpchQueries]]: fixed-cardinality dims
  * broadcast, fact-fact joins shuffle once on the join key, AQE decides
  * the growing-dimension joins, and every money aggregate uses the
  * exact-decimal discipline from [[Q]] so the DuckDB replay is
  * bit-identical at any parallelism.
  */
object TpcdsQueries {

  private val d184 = DecimalType(18, 4)

  val defs: Seq[QueryDef] = Seq(

    // ---- TPC-DS query1 shape: CTE total-returns + per-group average
    // correlated subquery (decorrelated to a broadcast per-nation avg
    // join) + dimension filter + LIMIT. Customers whose returned
    // revenue exceeds 1.2x their nation's average. ----
    QueryDef("q_tpcds_s1", (s, dir) => {
      val ctr = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_nationkey"))
        .agg(sum(money(col("l_extendedprice"))).as("total_dec"))
      // nation-level averages: <= 25 rows, always broadcastable
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
        WHERE l_returnflag = 'R'
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

    // ---- TPC-DS query5 shape: per-channel UNION ALL of sales rows and
    // return rows with ZERO-PADDED opposite measures, then a ROLLUP
    // report over (channel, nation) with a grand-total row. Channels
    // are mapped onto o_orderstatus (F=store, O=web, P=catalog). ----
    QueryDef("q_tpcds_s5", (s, dir) => {
      val rev = revenue(col("l_extendedprice"), col("l_discount")).cast(d184)
      val zero = lit(0).cast(d184)
      // ONE scan with conditional measures (the s77/s9 pattern): every
      // base row is sales XOR returns, so a union of two filtered
      // branches computes the identical multiset while duplicating the
      // whole 3-way join subtree in the physical plan (Spark does not
      // materialize shared subtrees) — 2× the join work at any scale.
      // Round-11 profile (BENCH_NOTES): with all dims broadcast the
      // remaining cost was per-fact-row work, so everything that does
      // not NEED fact rows moved past the aggregate — the fact side is
      // reduced by (o_orderstatus, c_nationkey) with `rev` materialized
      // once per row, then the nation name join, the channel mapping
      // and the ROLLUP run over ~|status|x|nation| rows. Rollup re-
      // groups by the mapped channel, so the status->channel CASE being
      // many-to-one is still correct; rollup-of-sums == sum by decimal
      // associativity. The irreducible per-row floor is the exact
      // decimal multiply the oracle contract requires.
      val perKey = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderstatus"), col("c_nationkey"),
          col("l_returnflag"), rev.as("rev"))
        .groupBy(col("o_orderstatus"), col("c_nationkey"))
        .agg(
          sum(when(col("l_returnflag") =!= "R", col("rev")).otherwise(zero))
            .as("sales_part"),
          sum(when(col("l_returnflag") === "R", col("rev")).otherwise(zero))
            .as("return_part"))
      perKey
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .withColumn("channel",
          when(col("o_orderstatus") === "F", "store channel")
            .when(col("o_orderstatus") === "O", "web channel")
            .otherwise("catalog channel"))
        .rollup(col("channel"), col("n_name"))
        .agg(sum(col("sales_part")).cast("double").as("sales"),
          sum(col("return_part")).cast("double").as("returns"))
        .orderBy(col("channel").asc_nulls_first, col("n_name").asc_nulls_first)
    }, Some(s"""
      WITH base AS (
        SELECT CASE o_orderstatus WHEN 'F' THEN 'store channel'
                 WHEN 'O' THEN 'web channel'
                 ELSE 'catalog channel' END AS channel,
          n_name, l_returnflag,
          CAST(${revenueSql("l_extendedprice", "l_discount")}
            AS DECIMAL(18,4)) AS rev
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey),
      u AS (
        SELECT channel, n_name, rev AS sales_amt,
          CAST(0 AS DECIMAL(18,4)) AS return_amt
        FROM base WHERE l_returnflag <> 'R'
        UNION ALL
        SELECT channel, n_name, CAST(0 AS DECIMAL(18,4)), rev
        FROM base WHERE l_returnflag = 'R')
      SELECT channel, n_name,
        CAST(SUM(sales_amt) AS DOUBLE) AS sales,
        CAST(SUM(return_amt) AS DOUBLE) AS returns
      FROM u
      GROUP BY ROLLUP(channel, n_name)
      ORDER BY channel ASC NULLS FIRST, n_name ASC NULLS FIRST""")),

    // ---- TPC-DS query10/35 shape: EXISTS + (EXISTS OR EXISTS) +
    // NOT EXISTS chain over a customer demographic report. Customers
    // with a 1997 order, AND a returned or high-quantity line, AND no
    // pending ('P') order — counted per market segment. ----
    QueryDef("q_tpcds_s10", (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val o97 = o.filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey").as("k1"))
      val lr = l.filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("k2"))
      val lq = l.filter(col("l_quantity") > 45)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("k2"))
      val pend = o.filter(col("o_orderstatus") === "P")
        .select(col("o_custkey").as("k3"))
      c.join(o97, col("c_custkey") === col("k1"), "left_semi")
        .join(lr.unionByName(lq), col("c_custkey") === col("k2"), "left_semi")
        .join(pend, col("c_custkey") === col("k3"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("c_mktsegment"))
    }, Some("""
      SELECT c_mktsegment, COUNT(*) AS cnt
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND year(o.o_orderdate) = 1997)
        AND (EXISTS (SELECT 1 FROM lineitem l JOIN orders o2
                ON l.l_orderkey = o2.o_orderkey
                WHERE o2.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
          OR EXISTS (SELECT 1 FROM lineitem l JOIN orders o3
                ON l.l_orderkey = o3.o_orderkey
                WHERE o3.o_custkey = c.c_custkey AND l.l_quantity > 45))
        AND NOT EXISTS (SELECT 1 FROM orders o4
              WHERE o4.o_custkey = c.c_custkey AND o4.o_orderstatus = 'P')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""")),

    // ---- TPC-DS query4/11 shape: year-over-year growth compared
    // ACROSS channels — customers whose 1998/1997 spend ratio in the
    // 'O' channel exceeds their ratio in the 'F' channel (both years
    // active in both channels). One conditional-aggregate pass. ----
    QueryDef("q_tpcds_s11", (s, dir) => {
      val spend = (st: String, y: Int) => sum(when(
        col("o_orderstatus") === st && year(col("o_orderdate")) === y,
        money(col("o_totalprice"))).otherwise(lit(0).cast(DecimalType(12, 2))))
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(spend("F", 1997).as("f97"), spend("F", 1998).as("f98"),
          spend("O", 1997).as("o97"), spend("O", 1998).as("o98"))
        .filter(col("f97").cast("double") > 0 && col("o97").cast("double") > 0)
        .filter(col("o98").cast("double") / col("o97").cast("double") >
          col("f98").cast("double") / col("f97").cast("double"))
        .select(col("c_name"),
          (col("o98").cast("double") / col("o97").cast("double"))
            .as("web_growth"),
          (col("f98").cast("double") / col("f97").cast("double"))
            .as("store_growth"))
        .orderBy(col("c_name")).limit(100)
    }, Some(s"""
      WITH y AS (
        SELECT c_custkey, c_name,
          SUM(CASE WHEN o_orderstatus = 'F' AND year(o_orderdate) = 1997
            THEN ${moneySql("o_totalprice")} ELSE CAST(0 AS DECIMAL(12,2)) END) AS f97,
          SUM(CASE WHEN o_orderstatus = 'F' AND year(o_orderdate) = 1998
            THEN ${moneySql("o_totalprice")} ELSE CAST(0 AS DECIMAL(12,2)) END) AS f98,
          SUM(CASE WHEN o_orderstatus = 'O' AND year(o_orderdate) = 1997
            THEN ${moneySql("o_totalprice")} ELSE CAST(0 AS DECIMAL(12,2)) END) AS o97,
          SUM(CASE WHEN o_orderstatus = 'O' AND year(o_orderdate) = 1998
            THEN ${moneySql("o_totalprice")} ELSE CAST(0 AS DECIMAL(12,2)) END) AS o98
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2)
      SELECT c_name,
        CAST(o98 AS DOUBLE) / CAST(o97 AS DOUBLE) AS web_growth,
        CAST(f98 AS DOUBLE) / CAST(f97 AS DOUBLE) AS store_growth
      FROM y
      WHERE CAST(f97 AS DOUBLE) > 0 AND CAST(o97 AS DOUBLE) > 0
        AND CAST(o98 AS DOUBLE) / CAST(o97 AS DOUBLE)
          > CAST(f98 AS DOUBLE) / CAST(f97 AS DOUBLE)
      ORDER BY c_name LIMIT 100""")),

    // ---- TPC-DS query14 shape: cross-channel INTERSECT of item sets
    // (parts sold in ALL THREE order-status channels), then an
    // aggregate restricted to that intersection. ----
    QueryDef("q_tpcds_s14", (s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      def soldIn(st: String) =
        l.join(o.filter(col("o_orderstatus") === st),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_partkey"))
      val crossItems = soldIn("F").intersect(soldIn("O")).intersect(soldIn("P"))
      l.join(crossItems, Seq("l_partkey"), "left_semi")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_extendedprice")).as("total_sales"),
          count(lit(1)).as("n_sales"))
        .orderBy(col("p_brand"))
    }, Some(s"""
      WITH cross_items AS (
        SELECT l_partkey FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT l_partkey FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT l_partkey FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey WHERE o_orderstatus = 'P')
      SELECT p_brand, ${dsumSql("l_extendedprice")} AS total_sales,
        COUNT(*) AS n_sales
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_partkey IN (SELECT l_partkey FROM cross_items)
      GROUP BY p_brand
      ORDER BY p_brand""")),

    // ---- TPC-DS query16/94 shape: orders shipped by at least two
    // DISTINCT suppliers (EXISTS self-join on a different supplier)
    // with NO returned line (NOT EXISTS), counted with total revenue.
    // The TPC-H q21 cousin, but aggregate-report-shaped. ----
    QueryDef("q_tpcds_s16", (s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").filter(year(col("o_orderdate")) === 1997)
      val multi = l.as("l1").join(
        l.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2")),
        col("l1.l_orderkey") === col("ok2") &&
          col("l1.l_suppkey") =!= col("sk2"), "left_semi")
      val ret = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("rk"))
      multi.join(o, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(ret, col("l_orderkey") === col("rk"), "left_anti")
        .agg(countDistinct(col("l_orderkey")).as("order_count"),
          dsum(col("l_extendedprice")).as("total_price"))
    }, Some(s"""
      SELECT COUNT(DISTINCT l1.l_orderkey) AS order_count,
        ${dsumSql("l1.l_extendedprice")} AS total_price
      FROM lineitem l1
      WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
        AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l1.l_orderkey
                AND year(o.o_orderdate) = 1997)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_returnflag = 'R')""")),

    // ---- TPC-DS query18 shape: ROLLUP over a five-table join with
    // exact averages per hierarchy level (region → nation → total).
    // Two-level aggregation: the fact rows aggregate ONCE at the
    // finest grain (nation) — so Expand never sees the fact table —
    // and the ROLLUP runs over the ~|nations| partial sums (decimal
    // sums + counts re-aggregate exactly; avg = Σsum/Σcount is the
    // identical double division). A naive rollup pushes 3× the fact
    // rows through the Expand+partial-agg; this was the worst
    // round-6 10× slope (6.5×) before the rewrite. ----
    QueryDef("q_tpcds_s18", (s, dir) => {
      val fine = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        // per-measure NON-NULL counts — davg (and the oracle's
        // davgSql) divide by COUNT(x), not COUNT(*)
        .agg(sum(col("l_quantity").cast(d184)).as("sq"),
          count(col("l_quantity")).as("nq"),
          sum(col("l_extendedprice").cast(d184)).as("sp"),
          count(col("l_extendedprice")).as("np"),
          sum(col("c_acctbal").cast(d184)).as("sb"),
          count(col("c_acctbal")).as("nb"))
      fine.rollup(col("r_name"), col("n_name"))
        .agg((sum(col("sq")).cast("double") / sum(col("nq"))).as("avg_qty"),
          (sum(col("sp")).cast("double") / sum(col("np"))).as("avg_price"),
          (sum(col("sb")).cast("double") / sum(col("nb"))).as("avg_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }, Some(s"""
      SELECT r_name, n_name,
        ${davgSql("l_quantity")} AS avg_qty,
        ${davgSql("l_extendedprice")} AS avg_price,
        ${davgSql("c_acctbal")} AS avg_bal
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")),

    // ---- TPC-DS query23 shape: frequent-items CTE × best-customers
    // CTE (spend above a fraction of the MAX spend — a scalar
    // subquery) composed into one restricted total. ----
    QueryDef("q_tpcds_s23", (s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val freq = l.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 40)
        .select(col("l_partkey").as("fpk"))
      val spend = o.groupBy(col("o_custkey"))
        .agg(sum(money(col("o_totalprice"))).as("spend_dec"))
      val maxSpend = spend.agg(max(col("spend_dec")).as("max_dec"))
      val best = spend.crossJoin(broadcast(maxSpend))
        .filter(col("spend_dec").cast("double") >
          col("max_dec").cast("double") * 0.5)
        .select(col("o_custkey").as("bck"))
      l.join(o.filter(year(col("o_orderdate")) === 1998),
          col("l_orderkey") === col("o_orderkey"))
        .join(freq, col("l_partkey") === col("fpk"), "left_semi")
        .join(best, col("o_custkey") === col("bck"), "left_semi")
        .agg(dsum(col("l_extendedprice")).as("total_sales"))
    }, Some(s"""
      WITH freq AS (
        SELECT l_partkey FROM lineitem GROUP BY 1 HAVING COUNT(*) > 40),
      spend AS (
        SELECT o_custkey, SUM(${moneySql("o_totalprice")}) AS spend_dec
        FROM orders GROUP BY 1),
      best AS (
        SELECT o_custkey FROM spend
        WHERE CAST(spend_dec AS DOUBLE) >
          (SELECT CAST(MAX(spend_dec) AS DOUBLE) FROM spend) * 0.5)
      SELECT ${dsumSql("l_extendedprice")} AS total_sales
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE year(o_orderdate) = 1998
        AND l_partkey IN (SELECT l_partkey FROM freq)
        AND o_custkey IN (SELECT o_custkey FROM best)""")),

    // ---- TPC-DS query33/56/60 shape: the same aggregate computed per
    // channel over one item subset, UNION ALL'd, then re-aggregated
    // into a cross-channel total by brand. ----
    QueryDef("q_tpcds_s33", (s, dir) => {
      val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey"), col("p_brand"))
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      def channel(st: String) =
        l.join(o.filter(col("o_orderstatus") === st),
            col("l_orderkey") === col("o_orderkey"))
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(sum(money(col("l_extendedprice"))).as("sales_dec"))
      channel("F").unionByName(channel("O")).unionByName(channel("P"))
        .groupBy(col("p_brand"))
        .agg(sum(col("sales_dec")).cast("double").as("total_sales"))
        .orderBy(col("total_sales").desc, col("p_brand"))
        .limit(10)
    }, Some(s"""
      WITH pr AS (
        SELECT p_partkey, p_brand FROM part WHERE p_type = 'PROMO'),
      ch AS (
        SELECT p_brand, SUM(${moneySql("l_extendedprice")}) AS sales_dec
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN pr ON l_partkey = p_partkey
        WHERE o_orderstatus = 'F' GROUP BY 1
        UNION ALL
        SELECT p_brand, SUM(${moneySql("l_extendedprice")})
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN pr ON l_partkey = p_partkey
        WHERE o_orderstatus = 'O' GROUP BY 1
        UNION ALL
        SELECT p_brand, SUM(${moneySql("l_extendedprice")})
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN pr ON l_partkey = p_partkey
        WHERE o_orderstatus = 'P' GROUP BY 1)
      SELECT p_brand, CAST(SUM(sales_dec) AS DOUBLE) AS total_sales
      FROM ch GROUP BY p_brand
      ORDER BY total_sales DESC, p_brand LIMIT 10""")),

    // ---- TPC-DS query36 shape: hierarchy report — ROLLUP(region,
    // nation), lochierarchy = GROUPING()+GROUPING(), and a RANK within
    // each (level, parent) frame by the discount-ratio measure. ----
    QueryDef("q_tpcds_s36", (s, dir) => {
      // two-level aggregation, same discipline as q_tpcds_s18: the
      // fact rows aggregate once per nation; the ROLLUP re-aggregates
      // the exact decimal partials (ratio = Σnum/Σden is the same
      // single double division)
      val fine = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(money(col("l_extendedprice")) * rate(col("l_discount")))
            .as("num"),
          sum(money(col("l_extendedprice"))).as("den"))
      val agg = fine.rollup(col("r_name"), col("n_name"))
        .agg((sum(col("num")).cast("double") /
            sum(col("den")).cast("double")).as("disc_ratio"),
          (grouping(col("r_name")) + grouping(col("n_name")))
            .as("lochierarchy"),
          grouping(col("n_name")).as("gn"))
      agg.withColumn("rank_within_parent",
          rank().over(Window
            .partitionBy(col("lochierarchy"),
              when(col("gn") === 0, col("r_name")))
            .orderBy(col("disc_ratio").asc, col("n_name").asc_nulls_first)))
        .select(col("r_name"), col("n_name"), col("lochierarchy"),
          col("disc_ratio"), col("rank_within_parent"))
        .orderBy(col("lochierarchy").desc, col("r_name").asc_nulls_first,
          col("rank_within_parent"), col("n_name").asc_nulls_first)
    }, Some(s"""
      WITH agg AS (
        SELECT r_name, n_name,
          CAST(SUM(${moneySql("l_extendedprice")} * ${rateSql("l_discount")})
            AS DOUBLE)
            / CAST(SUM(${moneySql("l_extendedprice")}) AS DOUBLE) AS disc_ratio,
          GROUPING(r_name) + GROUPING(n_name) AS lochierarchy,
          GROUPING(n_name) AS gn
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name))
      SELECT r_name, n_name, lochierarchy, disc_ratio,
        RANK() OVER (PARTITION BY lochierarchy,
            CASE WHEN gn = 0 THEN r_name END
          ORDER BY disc_ratio ASC, n_name ASC NULLS FIRST)
          AS rank_within_parent
      FROM agg
      ORDER BY lochierarchy DESC, r_name ASC NULLS FIRST,
        rank_within_parent, n_name ASC NULLS FIRST""")),

    // ---- TPC-DS query51 shape: two channels' monthly revenue
    // cumulated by window within each year, compared month-by-month
    // (web overtakes store). One conditional pass + per-year window
    // (never a single-partition cumsum). ----
    QueryDef("q_tpcds_s51", (s, dir) => {
      val z = lit(0).cast(DecimalType(12, 2))
      val monthly = t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(
          sum(when(col("o_orderstatus") === "F", money(col("o_totalprice")))
            .otherwise(z)).as("store_dec"),
          sum(when(col("o_orderstatus") === "O", money(col("o_totalprice")))
            .otherwise(z)).as("web_dec"))
      val w = Window.partitionBy(col("y")).orderBy(col("m"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly
        .withColumn("store_cum", sum(col("store_dec")).over(w).cast("double"))
        .withColumn("web_cum", sum(col("web_dec")).over(w).cast("double"))
        .filter(col("web_cum") > col("store_cum"))
        .select(col("y"), col("m"), col("store_cum"), col("web_cum"))
        .orderBy(col("y"), col("m"))
    }, Some(s"""
      WITH monthly AS (
        SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
          SUM(CASE WHEN o_orderstatus = 'F' THEN ${moneySql("o_totalprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS store_dec,
          SUM(CASE WHEN o_orderstatus = 'O' THEN ${moneySql("o_totalprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS web_dec
        FROM orders GROUP BY 1, 2),
      cum AS (
        SELECT y, m,
          CAST(SUM(store_dec) OVER (PARTITION BY y ORDER BY m
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS store_cum,
          CAST(SUM(web_dec) OVER (PARTITION BY y ORDER BY m
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS web_cum
        FROM monthly)
      SELECT y, m, store_cum, web_cum FROM cum
      WHERE web_cum > store_cum
      ORDER BY y, m""")),

    // ---- TPC-DS query97 shape: channel-overlap report — the
    // (customer, part) pairs seen in the store channel FULL OUTER
    // JOINed with those seen in the web channel, counted into
    // store-only / web-only / both. ----
    QueryDef("q_tpcds_s97", (s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      def pairs(st: String, a: String, b: String) =
        l.join(o.filter(col("o_orderstatus") === st),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as(a), col("l_partkey").as(b))
          .distinct()
      pairs("F", "sc", "sp").join(pairs("O", "wc", "wp"),
          col("sc") === col("wc") && col("sp") === col("wp"), "full_outer")
        .agg(
          count(when(col("sc").isNotNull && col("wc").isNull, 1))
            .as("store_only"),
          count(when(col("sc").isNull && col("wc").isNotNull, 1))
            .as("web_only"),
          count(when(col("sc").isNotNull && col("wc").isNotNull, 1))
            .as("both_channels"))
    }, Some("""
      WITH st AS (
        SELECT DISTINCT o_custkey AS c, l_partkey AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'),
      wb AS (
        SELECT DISTINCT o_custkey AS c, l_partkey AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'O')
      SELECT
        COUNT(*) FILTER (WHERE st.c IS NOT NULL AND wb.c IS NULL)
          AS store_only,
        COUNT(*) FILTER (WHERE st.c IS NULL AND wb.c IS NOT NULL)
          AS web_only,
        COUNT(*) FILTER (WHERE st.c IS NOT NULL AND wb.c IS NOT NULL)
          AS both_channels
      FROM st FULL OUTER JOIN wb ON st.c = wb.c AND st.p = wb.p""")),

    // ---- TPC-DS query34/73 shape: frequency-band detail — customers
    // whose pending-order count lands in [2,4], joined back to the
    // dimension for per-customer detail rows. ----
    QueryDef("q_tpcds_s34", (s, dir) => {
      val band = t(s, dir, "orders").filter(col("o_orderstatus") === "P")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt").between(2, 4))
      band.join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_mktsegment"), col("cnt"))
        .orderBy(col("cnt").desc, col("c_name"))
    }, Some("""
      SELECT c_name, c_mktsegment, cnt
      FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders
            WHERE o_orderstatus = 'P'
            GROUP BY o_custkey HAVING COUNT(*) BETWEEN 2 AND 4) b
      JOIN customer ON o_custkey = c_custkey
      ORDER BY cnt DESC, c_name""")),

    // ---- TPC-DS query89 shape: deviation from the windowed average —
    // monthly brand revenue vs that brand's average month, keeping
    // months deviating by more than 10%. ----
    QueryDef("q_tpcds_s89", (s, dir) => {
      val monthly = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), year(col("l_shipdate")).as("y"),
          month(col("l_shipdate")).as("m"))
        .agg(sum(money(col("l_extendedprice"))).as("sales_dec"))
      val w = Window.partitionBy(col("p_brand"), col("y"))
      monthly
        .withColumn("avg_sales",
          (sum(col("sales_dec")).over(w).cast("double") /
            count(lit(1)).over(w)))
        .withColumn("sales", col("sales_dec").cast("double"))
        .filter(abs(col("sales") - col("avg_sales")) >
          col("avg_sales") * 0.1)
        .select(col("p_brand"), col("y"), col("m"), col("sales"),
          col("avg_sales"))
        .orderBy(col("p_brand"), col("y"), col("m"))
    }, Some(s"""
      WITH monthly AS (
        SELECT p_brand, year(l_shipdate) AS y, month(l_shipdate) AS m,
          SUM(${moneySql("l_extendedprice")}) AS sales_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2, 3),
      win AS (
        SELECT p_brand, y, m, CAST(sales_dec AS DOUBLE) AS sales,
          CAST(SUM(sales_dec) OVER (PARTITION BY p_brand, y) AS DOUBLE)
            / COUNT(*) OVER (PARTITION BY p_brand, y) AS avg_sales
        FROM monthly)
      SELECT p_brand, y, m, sales, avg_sales FROM win
      WHERE abs(sales - avg_sales) > avg_sales * 0.1
      ORDER BY p_brand, y, m""")),

    // ---- TPC-DS query44 shape: best and worst performers joined on
    // rank — parts ranked by total revenue ascending AND descending,
    // the two top-5 lists zipped into (rank, best, worst) rows. ----
    QueryDef("q_tpcds_s44", (s, dir) => {
      val byPart = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(money(col("l_extendedprice"))).as("rev_dec"))
      // item-dimension ranks via the distributed two-phase GlobalRank —
      // a bare row_number().over(orderBy) would single-task the whole
      // item dimension, which GROWS with SF
      val best = graft.operators.GlobalRank.withRank(byPart, "rk",
          col("rev_dec").desc, col("l_partkey"))
        .filter(col("rk") <= 5).select(col("rk"), col("l_partkey").as("best"))
      val worst = graft.operators.GlobalRank.withRank(byPart, "rk",
          col("rev_dec").asc, col("l_partkey"))
        .filter(col("rk") <= 5).select(col("rk"), col("l_partkey").as("worst"))
      best.join(worst, "rk")
        .join(t(s, dir, "part").select(col("p_partkey"), col("p_name").as("best_name")),
          col("best") === col("p_partkey"))
        .drop("p_partkey")
        .join(t(s, dir, "part").select(col("p_partkey"), col("p_name").as("worst_name")),
          col("worst") === col("p_partkey"))
        .select(col("rk"), col("best_name"), col("worst_name"))
        .orderBy(col("rk"))
    }, Some(s"""
      WITH byp AS (
        SELECT l_partkey, SUM(${moneySql("l_extendedprice")}) AS rev_dec
        FROM lineitem GROUP BY 1),
      best AS (
        SELECT l_partkey AS best, row_number()
          OVER (ORDER BY rev_dec DESC, l_partkey) AS rk FROM byp
        QUALIFY rk <= 5),
      worst AS (
        SELECT l_partkey AS worst, row_number()
          OVER (ORDER BY rev_dec ASC, l_partkey) AS rk FROM byp
        QUALIFY rk <= 5)
      SELECT b.rk, pb.p_name AS best_name, pw.p_name AS worst_name
      FROM best b JOIN worst w ON b.rk = w.rk
      JOIN part pb ON b.best = pb.p_partkey
      JOIN part pw ON w.worst = pw.p_partkey
      ORDER BY b.rk""")),

    // ---- TPC-DS query66 shape: the wide month-pivot report — one
    // conditional-aggregate pass producing 12 monthly revenue columns
    // per nation. ----
    QueryDef("q_tpcds_s66", (s, dir) => {
      def mSum(m: Int) = sum(when(month(col("o_orderdate")) === m,
        money(col("o_totalprice"))).otherwise(lit(0).cast(DecimalType(12, 2))))
        .cast("double").as(f"m$m%02d_sales")
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(mSum(1), (2 to 12).map(mSum): _*)
        .orderBy(col("n_name"))
    }, Some {
      val cols = (1 to 12).map(m =>
        s"""CAST(SUM(CASE WHEN month(o_orderdate) = $m
           THEN ${moneySql("o_totalprice")}
           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           AS m${f"$m%02d"}_sales""").mkString(", ")
      s"""
      SELECT n_name, $cols
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name"""
    }),

    // ---- TPC-DS query88 shape: one wide row of independent band
    // counts. The literal form is eight scalar subqueries CROSS
    // JOINed; the scale-correct decorrelation (used here, noted in the
    // oracle) is ONE conditional-aggregate scan. ----
    QueryDef("q_tpcds_s88", (s, dir) => {
      def band(i: Int) = count(when(
        col("l_quantity") > i * 6 && col("l_quantity") <= (i + 1) * 6,
        lit(1))).as(s"h$i")
      t(s, dir, "lineitem")
        .agg(band(0), band(1), band(2), band(3),
          band(4), band(5), band(6), band(7))
    }, Some("""
      SELECT * FROM
        (SELECT COUNT(*) AS h0 FROM lineitem
          WHERE l_quantity > 0 AND l_quantity <= 6) s0,
        (SELECT COUNT(*) AS h1 FROM lineitem
          WHERE l_quantity > 6 AND l_quantity <= 12) s1,
        (SELECT COUNT(*) AS h2 FROM lineitem
          WHERE l_quantity > 12 AND l_quantity <= 18) s2,
        (SELECT COUNT(*) AS h3 FROM lineitem
          WHERE l_quantity > 18 AND l_quantity <= 24) s3,
        (SELECT COUNT(*) AS h4 FROM lineitem
          WHERE l_quantity > 24 AND l_quantity <= 30) s4,
        (SELECT COUNT(*) AS h5 FROM lineitem
          WHERE l_quantity > 30 AND l_quantity <= 36) s5,
        (SELECT COUNT(*) AS h6 FROM lineitem
          WHERE l_quantity > 36 AND l_quantity <= 42) s6,
        (SELECT COUNT(*) AS h7 FROM lineitem
          WHERE l_quantity > 42 AND l_quantity <= 48) s7""")),

    // ---- TPC-DS query47 shape: monthly brand sales with (1) the
    // yearly average over a (brand, year) window, (2) the time-ordered
    // rank, and (3) the PREVIOUS/NEXT month's sales — the original's
    // v1_lag/v1_lead rank self-joins expressed as LAG/LEAD over the
    // same (brand) partition ordered by time (identical semantics:
    // the inner self-join's boundary-dropping behavior is mirrored by
    // filtering the null lag/lead rows). Deviating months of 1998,
    // ordered by deviation. ----
    QueryDef("q_tpcds_s47", (s, dir) => {
      val monthly = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), year(col("l_shipdate")).as("y"),
          month(col("l_shipdate")).as("m"))
        .agg(sum(money(col("l_extendedprice"))).as("sales_dec"))
      val wYear = Window.partitionBy(col("p_brand"), col("y"))
      val wTime = Window.partitionBy(col("p_brand"))
        .orderBy(col("y"), col("m"))
      val win = monthly
        .withColumn("avg_monthly_sales",
          (sum(col("sales_dec")).over(wYear).cast("double") /
            count(lit(1)).over(wYear)))
        .withColumn("rn", rank().over(wTime).cast("long"))
        .withColumn("psum", lag(col("sales_dec"), 1).over(wTime)
          .cast("double"))
        .withColumn("nsum", lead(col("sales_dec"), 1).over(wTime)
          .cast("double"))
        .withColumn("sum_sales", col("sales_dec").cast("double"))
      win.filter(col("y") === 1998 && col("avg_monthly_sales") > 0 &&
          abs(col("sum_sales") - col("avg_monthly_sales")) /
            col("avg_monthly_sales") > 0.1 &&
          col("psum").isNotNull && col("nsum").isNotNull)
        .select(col("p_brand"), col("y"), col("m"), col("sum_sales"),
          col("avg_monthly_sales"), col("rn"), col("psum"), col("nsum"))
        .orderBy((col("sum_sales") - col("avg_monthly_sales")).asc,
          col("p_brand"), col("y"), col("m"))
        .limit(100)
    }, Some(s"""
      WITH monthly AS (
        SELECT p_brand, year(l_shipdate) AS y, month(l_shipdate) AS m,
          SUM(${moneySql("l_extendedprice")}) AS sales_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2, 3),
      win AS (
        SELECT p_brand, y, m,
          CAST(sales_dec AS DOUBLE) AS sum_sales,
          CAST(SUM(sales_dec) OVER (PARTITION BY p_brand, y) AS DOUBLE)
            / COUNT(*) OVER (PARTITION BY p_brand, y) AS avg_monthly_sales,
          RANK() OVER (PARTITION BY p_brand ORDER BY y, m) AS rn,
          CAST(LAG(sales_dec, 1) OVER (PARTITION BY p_brand ORDER BY y, m)
            AS DOUBLE) AS psum,
          CAST(LEAD(sales_dec, 1) OVER (PARTITION BY p_brand ORDER BY y, m)
            AS DOUBLE) AS nsum
        FROM monthly)
      SELECT p_brand, y, m, sum_sales, avg_monthly_sales, rn, psum, nsum
      FROM win
      WHERE y = 1998 AND avg_monthly_sales > 0
        AND abs(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.1
        AND psum IS NOT NULL AND nsum IS NOT NULL
      ORDER BY sum_sales - avg_monthly_sales ASC, p_brand, y, m
      LIMIT 100""")),

    // ---- TPC-DS query57 shape: the q47 family over a TWO-LEVEL
    // hierarchy (type, brand) with a QUANTITY measure — moving context
    // (yearly average + prev/next month) per (p_type, p_brand). ----
    QueryDef("q_tpcds_s57", (s, dir) => {
      val monthly = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), col("p_brand"),
          year(col("l_shipdate")).as("y"), month(col("l_shipdate")).as("m"))
        .agg(sum(money(col("l_quantity"))).as("qty_dec"))
      val wYear = Window.partitionBy(col("p_type"), col("p_brand"), col("y"))
      val wTime = Window.partitionBy(col("p_type"), col("p_brand"))
        .orderBy(col("y"), col("m"))
      monthly
        .withColumn("avg_monthly_qty",
          (sum(col("qty_dec")).over(wYear).cast("double") /
            count(lit(1)).over(wYear)))
        .withColumn("pqty", lag(col("qty_dec"), 1).over(wTime).cast("double"))
        .withColumn("nqty", lead(col("qty_dec"), 1).over(wTime).cast("double"))
        .withColumn("sum_qty", col("qty_dec").cast("double"))
        .filter(col("y") === 1997 && col("avg_monthly_qty") > 0 &&
          abs(col("sum_qty") - col("avg_monthly_qty")) /
            col("avg_monthly_qty") > 0.1 &&
          col("pqty").isNotNull && col("nqty").isNotNull)
        .select(col("p_type"), col("p_brand"), col("y"), col("m"),
          col("sum_qty"), col("avg_monthly_qty"), col("pqty"), col("nqty"))
        .orderBy((col("sum_qty") - col("avg_monthly_qty")).asc,
          col("p_type"), col("p_brand"), col("m"))
        .limit(100)
    }, Some(s"""
      WITH monthly AS (
        SELECT p_type, p_brand, year(l_shipdate) AS y,
          month(l_shipdate) AS m,
          SUM(${moneySql("l_quantity")}) AS qty_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2, 3, 4),
      win AS (
        SELECT p_type, p_brand, y, m,
          CAST(qty_dec AS DOUBLE) AS sum_qty,
          CAST(SUM(qty_dec) OVER (PARTITION BY p_type, p_brand, y)
            AS DOUBLE) / COUNT(*) OVER (PARTITION BY p_type, p_brand, y)
            AS avg_monthly_qty,
          CAST(LAG(qty_dec, 1) OVER (PARTITION BY p_type, p_brand
            ORDER BY y, m) AS DOUBLE) AS pqty,
          CAST(LEAD(qty_dec, 1) OVER (PARTITION BY p_type, p_brand
            ORDER BY y, m) AS DOUBLE) AS nqty
        FROM monthly)
      SELECT p_type, p_brand, y, m, sum_qty, avg_monthly_qty, pqty, nqty
      FROM win
      WHERE y = 1997 AND avg_monthly_qty > 0
        AND abs(sum_qty - avg_monthly_qty) / avg_monthly_qty > 0.1
        AND pqty IS NOT NULL AND nqty IS NOT NULL
      ORDER BY sum_qty - avg_monthly_qty ASC, p_type, p_brand, m
      LIMIT 100""")),

    // ---- TPC-DS query67 shape: rank WITHIN a rollup hierarchy —
    // rollup(type, brand, year) sales ranked per type partition (the
    // rollup's null type forms its own grand-total partition), top 10
    // per partition. Two-level discipline as s18/s36: the fact table is
    // aggregated at the finest grain FIRST, Expand only ever sees
    // |type × brand × year| partials, and the rank window partitions on
    // p_type — never a global sort. ----
    QueryDef("q_tpcds_s67", (s, dir) => {
      val base = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), col("p_brand"),
          year(col("l_shipdate")).as("y"))
        .agg(sum(money(col("l_extendedprice"))).as("s1"))
      val rolled = base.rollup(col("p_type"), col("p_brand"), col("y"))
        .agg(sum(col("s1")).as("sumsales_dec"))
      val w = Window.partitionBy(col("p_type"))
        .orderBy(col("sumsales_dec").desc)
      rolled.withColumn("rk", rank().over(w).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("p_type"), col("p_brand"), col("y"),
          col("sumsales_dec").cast("double").as("sumsales"), col("rk"))
        .orderBy(col("p_type").asc_nulls_first, col("rk"),
          col("p_brand").asc_nulls_first, col("y").asc_nulls_first)
    }, Some(s"""
      WITH base AS (
        SELECT p_type, p_brand, year(l_shipdate) AS y,
          SUM(${moneySql("l_extendedprice")}) AS s1
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2, 3),
      rolled AS (
        SELECT p_type, p_brand, y, SUM(s1) AS sumsales_dec
        FROM base GROUP BY ROLLUP(p_type, p_brand, y)),
      ranked AS (
        SELECT p_type, p_brand, y,
          CAST(sumsales_dec AS DOUBLE) AS sumsales,
          RANK() OVER (PARTITION BY p_type ORDER BY sumsales_dec DESC)
            AS rk
        FROM rolled)
      SELECT p_type, p_brand, y, sumsales, rk FROM ranked
      WHERE rk <= 10
      ORDER BY p_type ASC NULLS FIRST, rk, p_brand ASC NULLS FIRST,
        y ASC NULLS FIRST""")),

    // ---- TPC-DS query70 shape: rank within the PARENT level of a
    // (region, nation) rollup — lochierarchy = grouping(region) +
    // grouping(nation), rank partitioned by (lochierarchy, parent
    // region) — plus the original's windowed pre-filter subquery:
    // only regions whose total revenue ranks in the top 3. ----
    QueryDef("q_tpcds_s70", (s, dir) => {
      val base = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(money(col("o_totalprice"))).as("s1"))
      // windowed pre-filter: top-3 regions by total revenue (the
      // region dimension is fixed-size — 5 rows — so the unpartitioned
      // rank window is a constant-cardinality driver-side decision,
      // not a data-sized sort)
      val topRegions = base.groupBy(col("r_name").as("tr_name"))
        .agg(sum(col("s1")).as("rrev"))
        .withColumn("rrk", rank().over(
          Window.orderBy(col("rrev").desc, col("tr_name"))))
        .filter(col("rrk") <= 3).select(col("tr_name"))
      val rolled = base
        .join(broadcast(topRegions), col("r_name") === col("tr_name"))
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
        GROUP BY 1, 2),
      top_regions AS (
        SELECT r_name FROM (
          SELECT r_name, RANK() OVER (ORDER BY SUM(s1) DESC, r_name)
            AS rrk
          FROM base GROUP BY r_name)
        WHERE rrk <= 3),
      rolled AS (
        SELECT r_name, n_name, SUM(s1) AS total_dec,
          CAST(GROUPING(r_name) AS INTEGER) AS gr,
          CAST(GROUPING(n_name) AS INTEGER) AS gn,
          CAST(GROUPING(r_name) + GROUPING(n_name) AS INTEGER)
            AS lochierarchy
        FROM base WHERE r_name IN (SELECT r_name FROM top_regions)
        GROUP BY ROLLUP(r_name, n_name))
      SELECT r_name, n_name, CAST(total_dec AS DOUBLE) AS total_sum,
        lochierarchy,
        RANK() OVER (PARTITION BY lochierarchy,
          CASE WHEN gn = 0 THEN r_name END
          ORDER BY total_dec DESC) AS rank_within_parent
      FROM rolled
      ORDER BY lochierarchy DESC, r_name ASC NULLS FIRST,
        rank_within_parent, n_name ASC NULLS FIRST""")),

    // ---- TPC-DS query49 shape: per-channel worst return ratios with
    // DUAL rankings (quantity ratio + currency ratio), the three
    // channel subqueries unioned and filtered to either top list. The
    // original scans three channel tables; the driver schema has one
    // fact table, so the channels partition one scan (noted) — the
    // ranking-over-union semantics are identical. ----
    QueryDef("q_tpcds_s49", (s, dir) => {
      val base = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .withColumn("channel",
          when(col("o_orderstatus") === "F", "store")
            .when(col("o_orderstatus") === "O", "web")
            .otherwise("catalog"))
        .groupBy(col("channel"), col("l_partkey"))
        .agg(
          sum(when(col("l_returnflag") === "R", money(col("l_quantity")))
            .otherwise(lit(0).cast(DecimalType(12, 2)))).as("ret_qty"),
          sum(money(col("l_quantity"))).as("tot_qty"),
          sum(when(col("l_returnflag") === "R",
            money(col("l_extendedprice")))
            .otherwise(lit(0).cast(DecimalType(12, 2)))).as("ret_amt"),
          sum(money(col("l_extendedprice"))).as("tot_amt"))
        .filter(col("ret_qty") > 0 && col("tot_qty") > 0)
        .withColumn("return_ratio",
          col("ret_qty").cast("double") / col("tot_qty").cast("double"))
        .withColumn("currency_ratio",
          col("ret_amt").cast("double") / col("tot_amt").cast("double"))
      val wr = Window.partitionBy(col("channel"))
        .orderBy(col("return_ratio").desc, col("l_partkey"))
      val wc = Window.partitionBy(col("channel"))
        .orderBy(col("currency_ratio").desc, col("l_partkey"))
      base
        .withColumn("return_rank", rank().over(wr).cast("long"))
        .withColumn("currency_rank", rank().over(wc).cast("long"))
        .filter(col("return_rank") <= 10 || col("currency_rank") <= 10)
        .select(col("channel"), col("l_partkey").as("item"),
          col("return_ratio"), col("currency_ratio"),
          col("return_rank"), col("currency_rank"))
        .orderBy(col("channel"), col("return_rank"), col("currency_rank"),
          col("item"))
    }, Some(s"""
      WITH base AS (
        SELECT CASE o_orderstatus WHEN 'F' THEN 'store'
                 WHEN 'O' THEN 'web' ELSE 'catalog' END AS channel,
          l_partkey,
          SUM(CASE WHEN l_returnflag = 'R' THEN ${moneySql("l_quantity")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS ret_qty,
          SUM(${moneySql("l_quantity")}) AS tot_qty,
          SUM(CASE WHEN l_returnflag = 'R'
            THEN ${moneySql("l_extendedprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS ret_amt,
          SUM(${moneySql("l_extendedprice")}) AS tot_amt
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
        HAVING ret_qty > 0 AND tot_qty > 0),
      ratios AS (
        SELECT channel, l_partkey AS item,
          CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE)
            AS return_ratio,
          CAST(ret_amt AS DOUBLE) / CAST(tot_amt AS DOUBLE)
            AS currency_ratio
        FROM base),
      ranked AS (
        SELECT channel, item, return_ratio, currency_ratio,
          RANK() OVER (PARTITION BY channel
            ORDER BY return_ratio DESC, item) AS return_rank,
          RANK() OVER (PARTITION BY channel
            ORDER BY currency_ratio DESC, item) AS currency_rank
        FROM ratios)
      SELECT channel, item, return_ratio, currency_ratio,
        return_rank, currency_rank
      FROM ranked
      WHERE return_rank <= 10 OR currency_rank <= 10
      ORDER BY channel, return_rank, currency_rank, item""")),

    // ---- TPC-DS query31 shape: year-over-year growth compared ACROSS
    // channels per geography — nations where the web channel's 1997→98
    // growth ratio beats the store channel's. One conditional-aggregate
    // scan pivots (channel × year); the ratio-of-ratios filter needs
    // all four cells non-zero. ----
    QueryDef("q_tpcds_s31", (s, dir) => {
      val z = lit(0).cast(DecimalType(12, 2))
      def cell(status: String, y: Int) =
        sum(when(col("o_orderstatus") === status &&
          year(col("o_orderdate")) === y, money(col("o_totalprice")))
          .otherwise(z))
      val base = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(cell("O", 1997).as("web97_dec"), cell("O", 1998).as("web98_dec"),
          cell("F", 1997).as("store97_dec"),
          cell("F", 1998).as("store98_dec"))
      base
        .filter(col("web97_dec") > 0 && col("store97_dec") > 0)
        .withColumn("web_growth",
          col("web98_dec").cast("double") / col("web97_dec").cast("double"))
        .withColumn("store_growth",
          col("store98_dec").cast("double") /
            col("store97_dec").cast("double"))
        .filter(col("web_growth") > col("store_growth"))
        .select(col("n_name"),
          col("web97_dec").cast("double").as("web97"),
          col("web98_dec").cast("double").as("web98"),
          col("store97_dec").cast("double").as("store97"),
          col("store98_dec").cast("double").as("store98"),
          col("web_growth"), col("store_growth"))
        .orderBy(col("n_name"))
    }, Some(s"""
      WITH base AS (
        SELECT n_name,
          SUM(CASE WHEN o_orderstatus = 'O' AND year(o_orderdate) = 1997
            THEN ${moneySql("o_totalprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS web97_dec,
          SUM(CASE WHEN o_orderstatus = 'O' AND year(o_orderdate) = 1998
            THEN ${moneySql("o_totalprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS web98_dec,
          SUM(CASE WHEN o_orderstatus = 'F' AND year(o_orderdate) = 1997
            THEN ${moneySql("o_totalprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS store97_dec,
          SUM(CASE WHEN o_orderstatus = 'F' AND year(o_orderdate) = 1998
            THEN ${moneySql("o_totalprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS store98_dec
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name)
      SELECT n_name,
        CAST(web97_dec AS DOUBLE) AS web97,
        CAST(web98_dec AS DOUBLE) AS web98,
        CAST(store97_dec AS DOUBLE) AS store97,
        CAST(store98_dec AS DOUBLE) AS store98,
        CAST(web98_dec AS DOUBLE) / CAST(web97_dec AS DOUBLE)
          AS web_growth,
        CAST(store98_dec AS DOUBLE) / CAST(store97_dec AS DOUBLE)
          AS store_growth
      FROM base
      WHERE web97_dec > 0 AND store97_dec > 0
        AND CAST(web98_dec AS DOUBLE) / CAST(web97_dec AS DOUBLE) >
            CAST(store98_dec AS DOUBLE) / CAST(store97_dec AS DOUBLE)
      ORDER BY n_name""")),

    // ---- TPC-DS query93 shape: returns-adjusted revenue — the fact
    // table LEFT JOINs its returns (here: the R-flagged lines keyed by
    // (orderkey, linenumber), with a deterministic returned quantity of
    // half the line) and the measure swaps to (qty − returned) × price
    // on matched rows. Top customers by adjusted revenue. ----
    QueryDef("q_tpcds_s93", (s, dir) => {
      val l = t(s, dir, "lineitem")
      val returns = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r_okey"),
          col("l_linenumber").as("r_lnum"),
          floor(col("l_quantity") / 2).as("ret_qty"))
      val adjusted = l
        .join(returns, col("l_orderkey") === col("r_okey") &&
          col("l_linenumber") === col("r_lnum"), "left")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .withColumn("act_qty",
          when(col("ret_qty").isNotNull,
            col("l_quantity") - col("ret_qty"))
            .otherwise(col("l_quantity")))
        // price × surviving quantity, all-decimal (division would round
        // differently across engines; the product is exact: scale 4,
        // magnitude ≤ 1e7 ≪ the (18,4) range)
        .withColumn("adj_dec",
          (money(col("l_extendedprice")) * money(col("act_qty")))
            .cast(DecimalType(18, 4)))
      adjusted.groupBy(col("o_custkey"))
        .agg(sum(col("adj_dec")).as("rev_dec"))
        .select(col("o_custkey"), col("rev_dec").cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_custkey")).limit(100)
    }, Some(s"""
      WITH returns AS (
        SELECT l_orderkey AS r_okey, l_linenumber AS r_lnum,
          FLOOR(l_quantity / 2) AS ret_qty
        FROM lineitem WHERE l_returnflag = 'R'),
      adjusted AS (
        SELECT o_custkey,
          CAST(${moneySql("l_extendedprice")} *
            ${moneySql("CASE WHEN ret_qty IS NOT NULL THEN l_quantity - ret_qty ELSE l_quantity END")}
            AS DECIMAL(18,4)) AS adj_dec
        FROM lineitem
        LEFT JOIN returns ON l_orderkey = r_okey AND l_linenumber = r_lnum
        JOIN orders ON l_orderkey = o_orderkey)
      SELECT o_custkey, CAST(SUM(adj_dec) AS DOUBLE) AS revenue
      FROM adjusted GROUP BY o_custkey
      ORDER BY revenue DESC, o_custkey LIMIT 100""")),

    // ---- TPC-DS query78 shape: per-(customer, year) channel sales
    // EXCLUDING returned lines (anti-join against the returns subset),
    // the two channels FULL OUTER merged, web/store ratio ranked. ----
    QueryDef("q_tpcds_s78", (s, dir) => {
      val clean = t(s, dir, "lineitem")
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
            .select(col("l_orderkey").as("r_okey"),
              col("l_linenumber").as("r_lnum")),
          col("l_orderkey") === col("r_okey") &&
            col("l_linenumber") === col("r_lnum"), "left_anti")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .withColumn("y", year(col("o_orderdate")))
      def channel(status: String, out: String) = clean
        .filter(col("o_orderstatus") === status)
        .groupBy(col("o_custkey").as(s"${out}_cust"), col("y").as(s"${out}_y"))
        .agg(sum(money(col("l_extendedprice"))).as(s"${out}_dec"))
      val web = channel("O", "w")
      val store = channel("F", "s")
      web.join(store, col("w_cust") === col("s_cust") &&
          col("w_y") === col("s_y"), "full")
        .select(
          coalesce(col("w_cust"), col("s_cust")).as("custkey"),
          coalesce(col("w_y"), col("s_y")).as("y"),
          coalesce(col("w_dec"), lit(0).cast(DecimalType(12, 2)))
            .cast("double").as("web_sales"),
          coalesce(col("s_dec"), lit(0).cast(DecimalType(12, 2)))
            .cast("double").as("store_sales"))
        .filter(col("store_sales") > 0)
        .withColumn("ratio", col("web_sales") / col("store_sales"))
        .orderBy(col("ratio").desc, col("custkey"), col("y")).limit(100)
    }, Some(s"""
      WITH returns AS (
        SELECT l_orderkey AS r_okey, l_linenumber AS r_lnum
        FROM lineitem WHERE l_returnflag = 'R'),
      clean AS (
        SELECT l.*, o.o_custkey, o.o_orderstatus,
          year(o.o_orderdate) AS y
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE NOT EXISTS (SELECT 1 FROM returns r
          WHERE l.l_orderkey = r.r_okey AND l.l_linenumber = r.r_lnum)),
      web AS (
        SELECT o_custkey AS cust, y,
          SUM(${moneySql("l_extendedprice")}) AS dec_
        FROM clean WHERE o_orderstatus = 'O' GROUP BY 1, 2),
      store AS (
        SELECT o_custkey AS cust, y,
          SUM(${moneySql("l_extendedprice")}) AS dec_
        FROM clean WHERE o_orderstatus = 'F' GROUP BY 1, 2)
      SELECT COALESCE(w.cust, s.cust) AS custkey,
        COALESCE(w.y, s.y) AS y,
        CAST(COALESCE(w.dec_, CAST(0 AS DECIMAL(12,2))) AS DOUBLE)
          AS web_sales,
        CAST(COALESCE(s.dec_, CAST(0 AS DECIMAL(12,2))) AS DOUBLE)
          AS store_sales,
        CAST(COALESCE(w.dec_, CAST(0 AS DECIMAL(12,2))) AS DOUBLE) /
          CAST(s.dec_ AS DOUBLE) AS ratio
      FROM web w
      FULL OUTER JOIN store s ON w.cust = s.cust AND w.y = s.y
      WHERE CAST(COALESCE(s.dec_, CAST(0 AS DECIMAL(12,2))) AS DOUBLE) > 0
      ORDER BY ratio DESC, custkey, y LIMIT 100""")),

    // ---- TPC-DS query83 shape: three-channel return-share equality —
    // per part, each channel's returned quantity as a share of the
    // three-channel average, parts where every share sits in a band.
    // Three per-channel aggregates joined on the item. ----
    QueryDef("q_tpcds_s83", (s, dir) => {
      val base = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      def ch(status: String, out: String) = base
        .filter(col("o_orderstatus") === status)
        .groupBy(col("l_partkey").as(s"${out}_part"))
        .agg(sum(money(col("l_quantity"))).as(s"${out}_qty"))
      val st = ch("F", "st"); val wb = ch("O", "wb"); val ct = ch("P", "ct")
      st.join(wb, col("st_part") === col("wb_part"))
        .join(ct, col("st_part") === col("ct_part"))
        .withColumn("total",
          col("st_qty") + col("wb_qty") + col("ct_qty"))
        .withColumn("st_share",
          col("st_qty").cast("double") / col("total").cast("double"))
        .withColumn("wb_share",
          col("wb_qty").cast("double") / col("total").cast("double"))
        .withColumn("ct_share",
          col("ct_qty").cast("double") / col("total").cast("double"))
        .filter(col("st_share").between(0.2, 0.45) &&
          col("wb_share").between(0.2, 0.45) &&
          col("ct_share").between(0.2, 0.45))
        .select(col("st_part").as("item"),
          col("st_qty").cast("double").as("store_qty"),
          col("wb_qty").cast("double").as("web_qty"),
          col("ct_qty").cast("double").as("catalog_qty"),
          col("st_share"), col("wb_share"), col("ct_share"))
        .orderBy(col("item"))
    }, Some(s"""
      WITH base AS (
        SELECT l_partkey, o_orderstatus, ${moneySql("l_quantity")} AS q
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'),
      st AS (SELECT l_partkey, SUM(q) AS qty FROM base
        WHERE o_orderstatus = 'F' GROUP BY 1),
      wb AS (SELECT l_partkey, SUM(q) AS qty FROM base
        WHERE o_orderstatus = 'O' GROUP BY 1),
      ct AS (SELECT l_partkey, SUM(q) AS qty FROM base
        WHERE o_orderstatus = 'P' GROUP BY 1),
      j AS (
        SELECT st.l_partkey AS item, st.qty AS st_qty, wb.qty AS wb_qty,
          ct.qty AS ct_qty, st.qty + wb.qty + ct.qty AS total
        FROM st JOIN wb ON st.l_partkey = wb.l_partkey
        JOIN ct ON st.l_partkey = ct.l_partkey)
      SELECT item,
        CAST(st_qty AS DOUBLE) AS store_qty,
        CAST(wb_qty AS DOUBLE) AS web_qty,
        CAST(ct_qty AS DOUBLE) AS catalog_qty,
        CAST(st_qty AS DOUBLE) / CAST(total AS DOUBLE) AS st_share,
        CAST(wb_qty AS DOUBLE) / CAST(total AS DOUBLE) AS wb_share,
        CAST(ct_qty AS DOUBLE) / CAST(total AS DOUBLE) AS ct_share
      FROM j
      WHERE CAST(st_qty AS DOUBLE) / CAST(total AS DOUBLE)
              BETWEEN 0.2 AND 0.45
        AND CAST(wb_qty AS DOUBLE) / CAST(total AS DOUBLE)
              BETWEEN 0.2 AND 0.45
        AND CAST(ct_qty AS DOUBLE) / CAST(total AS DOUBLE)
              BETWEEN 0.2 AND 0.45
      ORDER BY item""")),

    // ---- TPC-DS query98 (also 12/20) shape: revenue share WITHIN the
    // parent class — each brand's 1997 revenue as a percentage of its
    // type's total, via a sum-over-partition window on the aggregated
    // frame (the window input is |type × brand|, never the fact
    // table). ----
    QueryDef("q_tpcds_s98", (s, dir) => {
      val base = t(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1997)
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
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
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE year(l_shipdate) = 1997
        GROUP BY 1, 2)
      SELECT p_type, p_brand,
        CAST(rev_dec AS DOUBLE) AS itemrevenue,
        CAST(rev_dec AS DOUBLE) * 100 /
          CAST(SUM(rev_dec) OVER (PARTITION BY p_type) AS DOUBLE)
          AS revenueratio
      FROM base
      ORDER BY p_type, revenueratio, p_brand""")),

    // ---- TPC-DS query50 (also 62/99) shape: fulfillment-latency
    // bucketing — days between order and ship date banded into 30-day
    // buckets, counted per order priority. One conditional-aggregate
    // pass over the join. ----
    QueryDef("q_tpcds_s50", (s, dir) => {
      val lat = datediff(col("l_shipdate"), col("o_orderdate"))
      def band(name: String, cond: org.apache.spark.sql.Column) =
        count(when(cond, 1)).as(name)
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          band("d30", lat <= 30),
          band("d60", lat > 30 && lat <= 60),
          band("d90", lat > 60 && lat <= 90),
          band("d120", lat > 90 && lat <= 120),
          band("dmore", lat > 120))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      SELECT o_orderpriority,
        COUNT(CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) <= 30
          THEN 1 END) AS d30,
        COUNT(CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) > 30
          AND DATE_DIFF('day', o_orderdate, l_shipdate) <= 60
          THEN 1 END) AS d60,
        COUNT(CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) > 60
          AND DATE_DIFF('day', o_orderdate, l_shipdate) <= 90
          THEN 1 END) AS d90,
        COUNT(CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) > 90
          AND DATE_DIFF('day', o_orderdate, l_shipdate) <= 120
          THEN 1 END) AS d120,
        COUNT(CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) > 120
          THEN 1 END) AS dmore
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")),

    // ---- TPC-DS query59 shape: week-over-year comparison — weekly
    // revenue pivoted by day-of-week for 1997 SELF-JOINed with the
    // same pivot for 1998 on the week number, emitting the per-day
    // YoY ratios. ----
    QueryDef("q_tpcds_s59", (s, dir) => {
      val z = lit(0).cast(DecimalType(12, 2))
      def daySum(d: Int, out: String) =
        sum(when(dayofweek(col("o_orderdate")) === d,
          money(col("o_totalprice"))).otherwise(z)).as(out)
      def weekly(y: Int, p: String) = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === y)
        .groupBy(weekofyear(col("o_orderdate")).as(s"${p}_wk"))
        .agg(daySum(1, s"${p}_sun"), daySum(2, s"${p}_mon"),
          daySum(3, s"${p}_tue"), daySum(4, s"${p}_wed"))
      val a = weekly(1997, "a"); val b = weekly(1998, "b")
      def ratio(d: String) =
        when(col(s"a_$d") > 0,
          col(s"b_$d").cast("double") / col(s"a_$d").cast("double"))
          .as(s"${d}_ratio")
      a.join(b, col("a_wk") === col("b_wk"))
        .select(col("a_wk").as("wk"), ratio("sun"), ratio("mon"),
          ratio("tue"), ratio("wed"))
        .orderBy(col("wk"))
    }, Some(s"""
      WITH weekly AS (
        SELECT year(o_orderdate) AS y, weekofyear(o_orderdate) AS wk,
          SUM(CASE WHEN dayofweek(o_orderdate) + 1 = 1
            THEN ${moneySql("o_totalprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS sun,
          SUM(CASE WHEN dayofweek(o_orderdate) + 1 = 2
            THEN ${moneySql("o_totalprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS mon,
          SUM(CASE WHEN dayofweek(o_orderdate) + 1 = 3
            THEN ${moneySql("o_totalprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS tue,
          SUM(CASE WHEN dayofweek(o_orderdate) + 1 = 4
            THEN ${moneySql("o_totalprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS wed
        FROM orders GROUP BY 1, 2)
      SELECT a.wk AS wk,
        CASE WHEN a.sun > 0
          THEN CAST(b.sun AS DOUBLE) / CAST(a.sun AS DOUBLE) END
          AS sun_ratio,
        CASE WHEN a.mon > 0
          THEN CAST(b.mon AS DOUBLE) / CAST(a.mon AS DOUBLE) END
          AS mon_ratio,
        CASE WHEN a.tue > 0
          THEN CAST(b.tue AS DOUBLE) / CAST(a.tue AS DOUBLE) END
          AS tue_ratio,
        CASE WHEN a.wed > 0
          THEN CAST(b.wed AS DOUBLE) / CAST(a.wed AS DOUBLE) END
          AS wed_ratio
      FROM (SELECT * FROM weekly WHERE y = 1997) a
      JOIN (SELECT * FROM weekly WHERE y = 1998) b ON a.wk = b.wk
      ORDER BY wk""")),

    // ---- TPC-DS query17 shape: cross-channel quantity dispersion —
    // per brand, mean / sample-stdev / coefficient-of-variation of the
    // quantities in each channel, brands where every channel's cov
    // clears a floor. The moments are computed as EXACT decimal sums
    // (Σx, Σx², n — qty is 2-decimal) and only the final stdev/mean
    // arithmetic is double, so the replay is bit-identical at any
    // parallelism (a naive stddev_samp aggregates doubles in
    // nondeterministic order). ----
    QueryDef("q_tpcds_s17", (s, dir) => {
      val d186 = DecimalType(18, 6)
      def cell(status: String, p: String) = Seq(
        count(when(col("o_orderstatus") === status, 1)).as(s"${p}_n"),
        sum(when(col("o_orderstatus") === status, money(col("l_quantity")))
          .otherwise(lit(0).cast(DecimalType(12, 2)))).as(s"${p}_s"),
        sum(when(col("o_orderstatus") === status,
          (money(col("l_quantity")) * money(col("l_quantity"))).cast(d186))
          .otherwise(lit(0).cast(d186))).as(s"${p}_ss"))
      val base = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(cell("F", "st").head,
          (cell("F", "st").tail ++ cell("O", "wb") ++ cell("P", "ct")): _*)
      def stats(p: String) = {
        val n = col(s"${p}_n").cast("double")
        val mean = col(s"${p}_s").cast("double") / n
        val variance = (col(s"${p}_ss").cast("double") -
          col(s"${p}_s").cast("double") *
            col(s"${p}_s").cast("double") / n) / (n - 1)
        Seq(mean.as(s"${p}_mean"), sqrt(variance).as(s"${p}_std"),
          (sqrt(variance) / mean).as(s"${p}_cov"))
      }
      base.filter(col("st_n") > 1 && col("wb_n") > 1 && col("ct_n") > 1)
        .select((col("p_brand") +: (stats("st") ++ stats("wb") ++
          stats("ct"))): _*)
        .filter(col("st_cov") > 0.4 && col("wb_cov") > 0.4 &&
          col("ct_cov") > 0.4)
        .orderBy(col("p_brand"))
    }, Some {
      def cellSql(status: String, p: String) = s"""
        COUNT(CASE WHEN o_orderstatus = '$status' THEN 1 END) AS ${p}_n,
        SUM(CASE WHEN o_orderstatus = '$status'
          THEN ${moneySql("l_quantity")}
          ELSE CAST(0 AS DECIMAL(12,2)) END) AS ${p}_s,
        SUM(CASE WHEN o_orderstatus = '$status'
          THEN CAST(${moneySql("l_quantity")} * ${moneySql("l_quantity")}
            AS DECIMAL(18,6))
          ELSE CAST(0 AS DECIMAL(18,6)) END) AS ${p}_ss"""
      def statsSql(p: String) = s"""
        CAST(${p}_s AS DOUBLE) / ${p}_n AS ${p}_mean,
        SQRT((CAST(${p}_ss AS DOUBLE) - CAST(${p}_s AS DOUBLE) *
          CAST(${p}_s AS DOUBLE) / ${p}_n) / (${p}_n - 1)) AS ${p}_std,
        SQRT((CAST(${p}_ss AS DOUBLE) - CAST(${p}_s AS DOUBLE) *
          CAST(${p}_s AS DOUBLE) / ${p}_n) / (${p}_n - 1)) /
          (CAST(${p}_s AS DOUBLE) / ${p}_n) AS ${p}_cov"""
      s"""
      WITH base AS (
        SELECT p_brand, ${cellSql("F", "st")}, ${cellSql("O", "wb")},
          ${cellSql("P", "ct")}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand),
      st AS (
        SELECT p_brand, ${statsSql("st")}, ${statsSql("wb")},
          ${statsSql("ct")}
        FROM base WHERE st_n > 1 AND wb_n > 1 AND ct_n > 1)
      SELECT * FROM st
      WHERE st_cov > 0.4 AND wb_cov > 0.4 AND ct_cov > 0.4
      ORDER BY p_brand"""
    }),

    // ---- TPC-DS query90 shape: the am/pm traffic ratio — morning-band
    // vs evening-band event counts per event type, one conditional
    // aggregate over the events table (the original's two scalar
    // subqueries cross-joined, decorrelated to one scan). ----
    QueryDef("q_tpcds_s90", (s, dir) => {
      val h = hour(col("ts"))
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(when(h >= 8 && h <= 11, 1)).as("am_count"),
          count(when(h >= 19 && h <= 22, 1)).as("pm_count"))
        .filter(col("pm_count") > 0)
        .withColumn("am_pm_ratio",
          col("am_count").cast("double") / col("pm_count").cast("double"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type,
        COUNT(CASE WHEN hour(ts) BETWEEN 8 AND 11 THEN 1 END)
          AS am_count,
        COUNT(CASE WHEN hour(ts) BETWEEN 19 AND 22 THEN 1 END)
          AS pm_count,
        CAST(COUNT(CASE WHEN hour(ts) BETWEEN 8 AND 11 THEN 1 END)
          AS DOUBLE) /
        CAST(COUNT(CASE WHEN hour(ts) BETWEEN 19 AND 22 THEN 1 END)
          AS DOUBLE) AS am_pm_ratio
      FROM events
      GROUP BY event_type
      HAVING COUNT(CASE WHEN hour(ts) BETWEEN 19 AND 22 THEN 1 END) > 0
      ORDER BY event_type""")),

    // ---- TPC-DS query46/68 shape: cross-role dimension mismatch —
    // order lines whose SUPPLIER nation differs from the CUSTOMER
    // nation (the original's current-vs-sales-address city change),
    // counted and summed per customer, top by mismatched revenue. ----
    QueryDef("q_tpcds_s46", (s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "supplier").select(col("s_suppkey"),
          col("s_nationkey")), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select(col("c_custkey"),
          col("c_nationkey")), col("o_custkey") === col("c_custkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_cross"),
          sum(money(col("l_extendedprice"))).as("rev_dec"))
        .select(col("c_custkey"), col("n_cross"),
          col("rev_dec").cast("double").as("cross_rev"))
        .orderBy(col("cross_rev").desc, col("c_custkey")).limit(100)
    }, Some(s"""
      SELECT o_custkey AS c_custkey, COUNT(*) AS n_cross,
        CAST(SUM(${moneySql("l_extendedprice")}) AS DOUBLE) AS cross_rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE s_nationkey <> c_nationkey
      GROUP BY o_custkey
      ORDER BY cross_rev DESC, c_custkey LIMIT 100""")),

    // ---- TPC-DS query32/92 shape: the "excess discount" correlated
    // filter — lines whose discount exceeds 1.3× their part's average
    // discount, summed into ONE scalar (decorrelated to a broadcast
    // per-part average join). ----
    QueryDef("q_tpcds_s32", (s, dir) => {
      val l = t(s, dir, "lineitem")
      val avgs = l.groupBy(col("l_partkey").as("a_part"))
        .agg((sum(rate(col("l_discount"))).cast("double") /
          count(lit(1))).as("avg_disc"))
      l.join(avgs, col("l_partkey") === col("a_part"))
        .filter(rate(col("l_discount")).cast("double") >
          col("avg_disc") * 1.3)
        .agg(sum(money(col("l_extendedprice"))).cast("double")
          .as("excess_revenue"))
    }, Some(s"""
      WITH avgs AS (
        SELECT l_partkey AS a_part,
          CAST(SUM(${rateSql("l_discount")}) AS DOUBLE) / COUNT(*)
            AS avg_disc
        FROM lineitem GROUP BY 1)
      SELECT CAST(SUM(${moneySql("l_extendedprice")}) AS DOUBLE)
        AS excess_revenue
      FROM lineitem JOIN avgs ON l_partkey = a_part
      WHERE CAST(${rateSql("l_discount")} AS DOUBLE) > avg_disc * 1.3""")),

    // ---- TPC-DS query65 shape: under-performing (store, item) pairs —
    // per (nation, part) revenue joined against that nation's average
    // part revenue, pairs at most 20% of the average. Two aggregate
    // levels; the per-nation averages are fixed-cardinality and
    // broadcast. ----
    QueryDef("q_tpcds_s65", (s, dir) => {
      val byPair = t(s, dir, "lineitem")
        .join(t(s, dir, "supplier").select(col("s_suppkey"),
          col("s_nationkey")), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"), col("l_partkey"))
        .agg(sum(money(col("l_extendedprice"))).as("rev_dec"))
      val avgs = byPair.groupBy(col("s_nationkey").as("a_nkey"))
        .agg((sum(col("rev_dec")).cast("double") / count(lit(1)))
          .as("avg_rev"))
      byPair.join(broadcast(avgs), col("s_nationkey") === col("a_nkey"))
        .filter(col("rev_dec").cast("double") <= col("avg_rev") * 0.2)
        .select(col("s_nationkey").cast("int").as("nationkey"),
          col("l_partkey"), col("rev_dec").cast("double").as("revenue"),
          col("avg_rev"))
        .orderBy(col("nationkey"), col("l_partkey"))
    }, Some(s"""
      WITH by_pair AS (
        SELECT s_nationkey, l_partkey,
          SUM(${moneySql("l_extendedprice")}) AS rev_dec
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY 1, 2),
      avgs AS (
        SELECT s_nationkey, CAST(SUM(rev_dec) AS DOUBLE) / COUNT(*)
          AS avg_rev
        FROM by_pair GROUP BY 1)
      SELECT CAST(b.s_nationkey AS INTEGER) AS nationkey, b.l_partkey,
        CAST(b.rev_dec AS DOUBLE) AS revenue, a.avg_rev
      FROM by_pair b JOIN avgs a ON b.s_nationkey = a.s_nationkey
      WHERE CAST(b.rev_dec AS DOUBLE) <= a.avg_rev * 0.2
      ORDER BY nationkey, b.l_partkey""")),

    // ---- TPC-DS query41 shape: dimension self-EXISTS — distinct part
    // names that have a SIBLING part (same type, different brand,
    // size within ±2), the original's manufacturer attribute-combo
    // existence check as a dimension-only semi join. ----
    QueryDef("q_tpcds_s41", (s, dir) => {
      val p = t(s, dir, "part")
      val sib = p.select(col("p_type").as("s_type"),
        col("p_brand").as("s_brand"), col("p_size").as("s_size"))
      p.join(sib,
          col("p_type") === col("s_type") &&
            col("p_brand") =!= col("s_brand") &&
            col("s_size").between(col("p_size") - 2, col("p_size") + 2),
          "left_semi")
        .select(col("p_name")).distinct()
        .orderBy(col("p_name")).limit(100)
    }, Some("""
      SELECT DISTINCT p_name FROM part p
      WHERE EXISTS (
        SELECT 1 FROM part s
        WHERE s.p_type = p.p_type AND s.p_brand <> p.p_brand
          AND s.p_size BETWEEN p.p_size - 2 AND p.p_size + 2)
      ORDER BY p_name LIMIT 100""")),

    // ---- TPC-DS query87/38 shape: customer-set EXCEPT across
    // channels — how many customers bought in the store channel but
    // never in the web channel, and the reverse, as one two-column
    // row. The set difference is the EXCEPT operator itself, not an
    // anti-join rewrite. ----
    QueryDef("q_tpcds_s87", (s, dir) => {
      val o = t(s, dir, "orders")
      def custs(status: String) =
        o.filter(col("o_orderstatus") === status)
          .select(col("o_custkey")).distinct()
      // one distributed plan: both EXCEPT branches tagged and pivoted
      // into the single report row (no driver-side counts)
      val storeOnly = custs("F").except(custs("O"))
        .select(lit("s").as("side"))
      val webOnly = custs("O").except(custs("F"))
        .select(lit("w").as("side"))
      storeOnly.unionByName(webOnly)
        .agg(count(when(col("side") === "s", 1)).as("store_only"),
          count(when(col("side") === "w", 1)).as("web_only"))
    }, Some("""
      SELECT
        (SELECT COUNT(*) FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
          EXCEPT
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'))
          AS store_only,
        (SELECT COUNT(*) FROM (
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
          EXCEPT
          SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'))
          AS web_only""")),

    // ---- TPC-DS query54 shape: customer revenue-band histogram —
    // per-customer revenue bucketed into fixed-width bands, customers
    // counted per band (the original's `segment = revenue/50` count
    // report). ----
    QueryDef("q_tpcds_s54", (s, dir) => {
      val perCust = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(money(col("o_totalprice"))).as("rev_dec"))
      perCust
        .withColumn("band",
          floor(col("rev_dec").cast("double") / 50000).cast("long"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("band"))
    }, Some(s"""
      WITH per_cust AS (
        SELECT o_custkey, SUM(${moneySql("o_totalprice")}) AS rev_dec
        FROM orders GROUP BY 1)
      SELECT CAST(FLOOR(CAST(rev_dec AS DOUBLE) / 50000) AS BIGINT)
        AS band, COUNT(*) AS n_customers
      FROM per_cust
      GROUP BY 1 ORDER BY band""")),

    // ---- TPC-DS query8 shape: prefix-list dimension filter — revenue
    // per nation restricted to customers whose name carries one of a
    // literal list of prefixes (the original's 400-zip substr IN
    // list). ----
    QueryDef("q_tpcds_s8", (s, dir) => {
      val prefixes = Seq("Customer#0000000", "Customer#0000001",
        "Customer#0000002")
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .filter(substring(col("c_name"), 1, 16).isin(prefixes: _*))
        .groupBy(col("n_name"))
        .agg(sum(money(col("o_totalprice"))).cast("double").as("net_profit"))
        .orderBy(col("n_name"))
    }, Some(s"""
      SELECT n_name,
        CAST(SUM(${moneySql("o_totalprice")}) AS DOUBLE) AS net_profit
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE substr(c_name, 1, 16) IN ('Customer#0000000',
        'Customer#0000001', 'Customer#0000002')
      GROUP BY n_name
      ORDER BY n_name""")),

    // ---- TPC-DS query38 shape: customers present in ALL THREE
    // channels — a chained INTERSECT of the per-channel distinct
    // customer sets, counted into one row. ----
    QueryDef("q_tpcds_s38", (s, dir) => {
      val o = t(s, dir, "orders")
      def custs(status: String) =
        o.filter(col("o_orderstatus") === status)
          .select(col("o_custkey")).distinct()
      custs("F").intersect(custs("O")).intersect(custs("P"))
        .agg(count(lit(1)).as("n_all_three"))
    }, Some("""
      SELECT COUNT(*) AS n_all_three FROM (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P')""")),

    // ---- TPC-DS query40 shape: before/after pivot around an event
    // date — per brand, net quantity (sales minus returns) shipped
    // before vs after the pivot, one conditional-aggregate pass. ----
    QueryDef("q_tpcds_s40", (s, dir) => {
      val z = lit(0).cast(DecimalType(12, 2))
      val pivot = lit("1998-01-01").cast("date")
      val before = col("l_shipdate").cast("date") < pivot
      def cell(cond: org.apache.spark.sql.Column, ret: Boolean) =
        sum(when(cond && (if (ret) col("l_returnflag") === "R"
          else col("l_returnflag") =!= "R"),
          money(col("l_quantity"))).otherwise(z))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          (cell(before, ret = false) - cell(before, ret = true))
            .cast("double").as("net_before"),
          (cell(!before, ret = false) - cell(!before, ret = true))
            .cast("double").as("net_after"))
        .orderBy(col("p_brand"))
    }, Some(s"""
      SELECT p_brand,
        CAST(SUM(CASE WHEN l_shipdate < DATE '1998-01-01'
            AND l_returnflag <> 'R' THEN ${moneySql("l_quantity")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) -
          SUM(CASE WHEN l_shipdate < DATE '1998-01-01'
            AND l_returnflag = 'R' THEN ${moneySql("l_quantity")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS net_before,
        CAST(SUM(CASE WHEN l_shipdate >= DATE '1998-01-01'
            AND l_returnflag <> 'R' THEN ${moneySql("l_quantity")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) -
          SUM(CASE WHEN l_shipdate >= DATE '1998-01-01'
            AND l_returnflag = 'R' THEN ${moneySql("l_quantity")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS net_after
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand""")),

    // ---- TPC-DS query61 shape: promotional-revenue ratio — one row
    // comparing promotional (discounted ≥ 5%) revenue to total
    // revenue. The literal form is two scalar subqueries cross-joined;
    // decorrelated (as s88) to ONE conditional-aggregate scan. ----
    QueryDef("q_tpcds_s61", (s, dir) => {
      val z = lit(0).cast(DecimalType(12, 2))
      t(s, dir, "lineitem")
        .agg(
          sum(when(rate(col("l_discount")) >= 0.05,
            money(col("l_extendedprice"))).otherwise(z)).as("promo_dec"),
          sum(money(col("l_extendedprice"))).as("total_dec"))
        .select(
          col("promo_dec").cast("double").as("promotions"),
          col("total_dec").cast("double").as("total"),
          (col("promo_dec").cast("double") * 100 /
            col("total_dec").cast("double")).as("promo_pct"))
    }, Some(s"""
      SELECT CAST(promo_dec AS DOUBLE) AS promotions,
        CAST(total_dec AS DOUBLE) AS total,
        CAST(promo_dec AS DOUBLE) * 100 / CAST(total_dec AS DOUBLE)
          AS promo_pct
      FROM (
        SELECT
          SUM(CASE WHEN ${rateSql("l_discount")} >= 0.05
            THEN ${moneySql("l_extendedprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS promo_dec,
          SUM(${moneySql("l_extendedprice")}) AS total_dec
        FROM lineitem)""")),

    // ---- TPC-DS query25/29 shape: the sales-and-returns grain
    // report — per (supplier nation, part brand): sales revenue,
    // returned revenue and net, from one fact pass over the two
    // dimension joins. ----
    QueryDef("q_tpcds_s25", (s, dir) => {
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
            money(col("l_extendedprice"))).otherwise(z)).as("sales_dec"),
          sum(when(col("l_returnflag") === "R",
            money(col("l_extendedprice"))).otherwise(z)).as("ret_dec"))
        .select(col("n_name"), col("p_brand"),
          col("sales_dec").cast("double").as("sales"),
          col("ret_dec").cast("double").as("returns"),
          (col("sales_dec") - col("ret_dec")).cast("double").as("net"))
        .orderBy(col("n_name"), col("p_brand"))
    }, Some(s"""
      SELECT n_name, p_brand,
        CAST(SUM(CASE WHEN l_returnflag <> 'R'
          THEN ${moneySql("l_extendedprice")}
          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS sales,
        CAST(SUM(CASE WHEN l_returnflag = 'R'
          THEN ${moneySql("l_extendedprice")}
          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS returns,
        CAST(SUM(CASE WHEN l_returnflag <> 'R'
          THEN ${moneySql("l_extendedprice")}
          ELSE CAST(0 AS DECIMAL(12,2)) END) -
          SUM(CASE WHEN l_returnflag = 'R'
          THEN ${moneySql("l_extendedprice")}
          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS net
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY n_name, p_brand
      ORDER BY n_name, p_brand""")),

    // ---- TPC-DS query96 shape: the banded COUNT — how many
    // high-value click events land in the evening rush window, a
    // single filtered scalar over the events stream table. ----
    QueryDef("q_tpcds_s96", (s, dir) => {
      val h = hour(col("ts"))
      t(s, dir, "events")
        .filter(h >= 16 && h <= 18 && col("event_type") === "click" &&
          col("value") > 10.0)
        .agg(count(lit(1)).as("n_rush"))
    }, Some("""
      SELECT COUNT(*) AS n_rush
      FROM events
      WHERE hour(ts) BETWEEN 16 AND 18 AND event_type = 'click'
        AND value > 10.0""")),

    // ---- TPC-DS query64 shape: one composed CTE instantiated TWICE
    // and self-joined across years — per (part, year) a composition of
    // revenue, distinct-supplier count and average price, year y
    // joined against year y+1 on the part, parts whose revenue GREW.
    // The CTE materializes once per instantiation in both engines. ----
    QueryDef("q_tpcds_s64", (s, dir) => {
      // Spark-first: the consecutive-year self-join is a LAG over one
      // aggregate partitioned by the part — ONE fact scan and one
      // aggregation instead of two (no ReusedExchange fires across the
      // broadcast/shuffle boundary of the literal self-join form); the
      // oracle keeps the literal CTE-self-join SQL, so the rewrite is
      // hash-verified equivalent
      val comp = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), year(col("l_shipdate")).as("y"))
        .agg(sum(money(col("l_extendedprice"))).as("rev_dec"),
          countDistinct(col("l_suppkey")).as("n_supp"),
          (sum(money(col("l_extendedprice"))).cast("double") /
            count(lit(1))).as("avg_price"))
      val w = Window.partitionBy(col("l_partkey")).orderBy(col("y"))
      comp
        .withColumn("py", lag(col("y"), 1).over(w))
        .withColumn("a_rev", lag(col("rev_dec"), 1).over(w))
        .withColumn("a_supp", lag(col("n_supp"), 1).over(w))
        .withColumn("a_avg", lag(col("avg_price"), 1).over(w))
        .filter(col("y") === 1998 && col("py") === 1997 &&
          col("rev_dec") > col("a_rev"))
        .select(col("l_partkey").as("partkey"),
          col("a_rev").cast("double").as("rev_1997"),
          col("rev_dec").cast("double").as("rev_1998"),
          col("a_supp").as("supp_1997"), col("n_supp").as("supp_1998"),
          col("a_avg").as("avg_1997"), col("avg_price").as("avg_1998"))
        .orderBy(col("partkey"))
    }, Some(s"""
      WITH comp AS (
        SELECT l_partkey, year(l_shipdate) AS y,
          SUM(${moneySql("l_extendedprice")}) AS rev_dec,
          COUNT(DISTINCT l_suppkey) AS n_supp,
          CAST(SUM(${moneySql("l_extendedprice")}) AS DOUBLE) / COUNT(*)
            AS avg_price
        FROM lineitem GROUP BY 1, 2)
      SELECT a.l_partkey AS partkey,
        CAST(a.rev_dec AS DOUBLE) AS rev_1997,
        CAST(b.rev_dec AS DOUBLE) AS rev_1998,
        a.n_supp AS supp_1997, b.n_supp AS supp_1998,
        a.avg_price AS avg_1997, b.avg_price AS avg_1998
      FROM comp a JOIN comp b
        ON a.l_partkey = b.l_partkey AND b.y = a.y + 1
          AND b.rev_dec > a.rev_dec
      WHERE a.y = 1997
      ORDER BY partkey""")),

    // ---- TPC-DS query75 shape: year-over-year DECLINE report with
    // returns netted — per (brand, year) net quantity and net revenue
    // (sales minus returned), the two years joined on the brand, brands
    // whose net quantity fell below 90% of the prior year. ----
    QueryDef("q_tpcds_s75", (s, dir) => {
      val z = lit(0).cast(DecimalType(12, 2))
      def net(m: org.apache.spark.sql.Column) =
        sum(when(col("l_returnflag") =!= "R", m).otherwise(z)) -
          sum(when(col("l_returnflag") === "R", m).otherwise(z))
      // same single-scan LAG discipline as s64 (the oracle stays the
      // literal self-join)
      val byYear = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), year(col("l_shipdate")).as("y"))
        .agg(net(money(col("l_quantity"))).as("qty_dec"),
          net(money(col("l_extendedprice"))).as("rev_dec"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("y"))
      byYear
        .withColumn("py", lag(col("y"), 1).over(w))
        .withColumn("prev_qty", lag(col("qty_dec"), 1).over(w))
        .withColumn("prev_rev", lag(col("rev_dec"), 1).over(w))
        .filter(col("y") === 1998 && col("py") === 1997 &&
          col("prev_qty") > 0 &&
          col("qty_dec").cast("double") <
            col("prev_qty").cast("double") * 0.9)
        .select(col("p_brand"), col("y"),
          col("prev_qty").cast("double").as("prev_year_qty"),
          col("qty_dec").cast("double").as("curr_year_qty"),
          col("prev_rev").cast("double").as("prev_year_rev"),
          col("rev_dec").cast("double").as("curr_year_rev"))
        .orderBy(col("p_brand"))
    }, Some(s"""
      WITH by_year AS (
        SELECT p_brand, year(l_shipdate) AS y,
          SUM(CASE WHEN l_returnflag <> 'R' THEN ${moneySql("l_quantity")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) -
          SUM(CASE WHEN l_returnflag = 'R' THEN ${moneySql("l_quantity")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS qty_dec,
          SUM(CASE WHEN l_returnflag <> 'R'
            THEN ${moneySql("l_extendedprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) -
          SUM(CASE WHEN l_returnflag = 'R'
            THEN ${moneySql("l_extendedprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS rev_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2)
      SELECT c.p_brand, c.y,
        CAST(p.qty_dec AS DOUBLE) AS prev_year_qty,
        CAST(c.qty_dec AS DOUBLE) AS curr_year_qty,
        CAST(p.rev_dec AS DOUBLE) AS prev_year_rev,
        CAST(c.rev_dec AS DOUBLE) AS curr_year_rev
      FROM by_year c JOIN by_year p
        ON c.p_brand = p.p_brand AND c.y = p.y + 1
      WHERE c.y = 1998 AND p.qty_dec > 0
        AND CAST(c.qty_dec AS DOUBLE) < CAST(p.qty_dec AS DOUBLE) * 0.9
      ORDER BY c.p_brand""")),

    // ---- TPC-DS query9 shape: the wide CASE-over-scalar-subquery
    // report — five quantity bands, each picking between two averages
    // depending on the band's row count. TPC-DS evaluates 15 separate
    // scans; the Spark-first plan is ONE conditional aggregation over a
    // single fact scan (each band's count/avg as a filtered aggregate),
    // the CASE then a projection of the single aggregate row. The
    // oracle keeps the literal 15-subquery form. ----
    QueryDef("q_tpcds_s9", (s, dir) => {
      val bands = Seq((1, 8, 9500L), (9, 16, 9700L), (17, 24, 9500L),
        (25, 30, 8000L), (31, 50, 20000L))
      val li = t(s, dir, "lineitem")
      val aggs = bands.zipWithIndex.flatMap { case ((lo, hi, _), i) =>
        val in = col("l_quantity") >= lo && col("l_quantity") <= hi
        Seq(
          count(when(in, 1)).as(s"n_$i"),
          (sum(when(in, money(col("l_extendedprice")))).cast("double") /
            count(when(in, 1))).as(s"avg_price_$i"),
          (sum(when(in, rate(col("l_tax")))).cast("double") /
            count(when(in, 1))).as(s"avg_tax_$i"))
      }
      val one = li.agg(aggs.head, aggs.tail: _*)
      val out = bands.zipWithIndex.map { case ((_, _, thr), i) =>
        when(col(s"n_$i") > thr, col(s"avg_price_$i"))
          .otherwise(col(s"avg_tax_$i")).as(s"bucket${i + 1}")
      }
      one.select(out: _*)
    }, Some {
      val bands = Seq((1, 8, 9500L), (9, 16, 9700L), (17, 24, 9500L),
        (25, 30, 8000L), (31, 50, 20000L))
      val cases = bands.zipWithIndex.map { case ((lo, hi, thr), i) =>
        val in = s"l_quantity BETWEEN $lo AND $hi"
        s"""CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE $in) > $thr
           THEN (SELECT CAST(SUM(${moneySql("l_extendedprice")}) AS DOUBLE)
                   / COUNT(*) FROM lineitem WHERE $in)
           ELSE (SELECT CAST(SUM(${rateSql("l_tax")}) AS DOUBLE)
                   / COUNT(*) FROM lineitem WHERE $in)
           END AS bucket${i + 1}"""
      }
      s"SELECT ${cases.mkString(",\n        ")}"
    }),

    // ---- TPC-DS query13 shape: one aggregate under an OR-of-AND
    // predicate bundle spanning three joined tables (each disjunct
    // constrains segment x status x quantity band differently).
    // Catalyst can't split the disjunction, so the filter sits above
    // the join — the scale question is join order, and the plan keeps
    // dims broadcast so the fact never shuffles. ----
    QueryDef("q_tpcds_s13", (s, dir) => {
      val li = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      val p1 = col("c_mktsegment") === "BUILDING" &&
        col("o_orderstatus") === "F" &&
        col("l_quantity") >= 1 && col("l_quantity") <= 15
      val p2 = col("c_mktsegment") === "AUTOMOBILE" &&
        col("o_orderstatus") === "O" &&
        col("l_quantity") >= 16 && col("l_quantity") <= 30
      val p3 = col("c_mktsegment") === "MACHINERY" &&
        col("l_quantity") >= 31 && col("l_quantity") <= 50
      li.filter(p1 || p2 || p3)
        .agg(davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          dsum(revenue(col("l_extendedprice"), col("l_discount")))
            .as("net_revenue"))
    }, Some(s"""
      SELECT ${davgSql("l_quantity")} AS avg_qty,
        ${davgSql("l_extendedprice")} AS avg_price,
        ${dsumSql(revenueSql("l_extendedprice", "l_discount"))}
          AS net_revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE (c_mktsegment = 'BUILDING' AND o_orderstatus = 'F'
               AND l_quantity BETWEEN 1 AND 15)
         OR (c_mktsegment = 'AUTOMOBILE' AND o_orderstatus = 'O'
               AND l_quantity BETWEEN 16 AND 30)
         OR (c_mktsegment = 'MACHINERY'
               AND l_quantity BETWEEN 31 AND 50)""")),

    // ---- TPC-DS query21 shape: before/after pivot-event ratio — per
    // supplier the quantity shipped in the 30 days before vs after a
    // pivot date, keeping suppliers whose after/before ratio lies in
    // [2/3, 3/2]. The ratio bound is evaluated in EXACT decimal
    // cross-multiplied form (3*after >= 2*before), so no float
    // boundary can disagree between engines. One conditional aggregate
    // over the 60-day slice; supplier dim broadcast. ----
    QueryDef("q_tpcds_s21", (s, dir) => {
      val z = lit(0).cast(DecimalType(12, 2))
      val pivot = to_date(lit("1998-06-01"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= date_sub(pivot, 30) &&
          col("l_shipdate") <= date_add(pivot, 30))
        .groupBy(col("l_suppkey"))
        .agg(
          sum(when(col("l_shipdate") < pivot, money(col("l_quantity")))
            .otherwise(z)).as("qty_before"),
          sum(when(col("l_shipdate") >= pivot, money(col("l_quantity")))
            .otherwise(z)).as("qty_after"))
      li.filter(col("qty_before") > 0 &&
          col("qty_after") * 3 >= col("qty_before") * 2 &&
          col("qty_after") * 2 <= col("qty_before") * 3)
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"),
          col("qty_before").cast("double").as("qty_before"),
          col("qty_after").cast("double").as("qty_after"))
        .orderBy(col("s_name"))
    }, Some(s"""
      WITH w AS (
        SELECT l_suppkey,
          SUM(CASE WHEN l_shipdate < DATE '1998-06-01'
            THEN ${moneySql("l_quantity")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS qty_before,
          SUM(CASE WHEN l_shipdate >= DATE '1998-06-01'
            THEN ${moneySql("l_quantity")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS qty_after
        FROM lineitem
        WHERE l_shipdate >= DATE '1998-06-01' - INTERVAL 30 DAY
          AND l_shipdate <= DATE '1998-06-01' + INTERVAL 30 DAY
        GROUP BY 1)
      SELECT s_name, CAST(qty_before AS DOUBLE) AS qty_before,
        CAST(qty_after AS DOUBLE) AS qty_after
      FROM w JOIN supplier ON l_suppkey = s_suppkey
      WHERE qty_before > 0 AND qty_after * 3 >= qty_before * 2
        AND qty_after * 2 <= qty_before * 3
      ORDER BY s_name""")),

    // ---- TPC-DS query28 shape: six quantity buckets, each with its
    // own OR-of-bands side predicate, reporting (avg list price, row
    // count, distinct price count) per bucket as ONE wide row. TPC-DS
    // cross-joins six scalar subqueries (six scans); the Spark-first
    // plan filters once to rows matching their own bucket's predicate,
    // aggregates by bucket id (ONE scan, one partial-agg shuffle of 6
    // rows), then folds the 6-row frame into the wide row with
    // conditional MAX aggregates. ----
    QueryDef("q_tpcds_s28", (s, dir) => {
      val buckets = Seq(
        (1, 5, 0.00, 0.02, 900.0, 30000.0),
        (6, 10, 0.02, 0.04, 20000.0, 50000.0),
        (11, 15, 0.04, 0.06, 40000.0, 70000.0),
        (16, 20, 0.06, 0.08, 60000.0, 90000.0),
        (21, 25, 0.08, 0.10, 80000.0, 105000.0),
        (26, 30, 0.01, 0.03, 10000.0, 40000.0))
      def pred(b: (Int, Int, Double, Double, Double, Double)) =
        col("l_quantity") >= b._1 && col("l_quantity") <= b._2 &&
          (col("l_discount") >= b._3 && col("l_discount") <= b._4 ||
            col("l_extendedprice") >= b._5 && col("l_extendedprice") <= b._6)
      val tagged = t(s, dir, "lineitem")
        .withColumn("bkt",
          buckets.zipWithIndex.foldLeft(lit(-1)) { case (acc, (b, i)) =>
            when(pred(b), lit(i)).otherwise(acc)
          })
        .filter(col("bkt") >= 0)
      // NOTE bucket quantity ranges are disjoint, so the fold's
      // last-match-wins is actually exclusive; per-bucket aggregates
      // in one scan
      val per = tagged.groupBy(col("bkt"))
        .agg((sum(money(col("l_extendedprice"))).cast("double") /
          count(lit(1))).as("avg_price"),
          count(lit(1)).as("cnt"),
          countDistinct(col("l_extendedprice")).as("cnt_distinct"))
      val wide = buckets.indices.flatMap { i =>
        Seq(max(when(col("bkt") === i, col("avg_price")))
          .as(s"b${i + 1}_avg"),
          coalesce(max(when(col("bkt") === i, col("cnt"))), lit(0L))
            .as(s"b${i + 1}_cnt"),
          coalesce(max(when(col("bkt") === i, col("cnt_distinct"))),
            lit(0L)).as(s"b${i + 1}_cntd"))
      }
      per.agg(wide.head, wide.tail: _*)
    }, Some {
      val buckets = Seq(
        (1, 5, 0.00, 0.02, 900.0, 30000.0),
        (6, 10, 0.02, 0.04, 20000.0, 50000.0),
        (11, 15, 0.04, 0.06, 40000.0, 70000.0),
        (16, 20, 0.06, 0.08, 60000.0, 90000.0),
        (21, 25, 0.08, 0.10, 80000.0, 105000.0),
        (26, 30, 0.01, 0.03, 10000.0, 40000.0))
      val cols = buckets.zipWithIndex.map { case ((lo, hi, d1, d2, p1, p2), i) =>
        val in = s"""l_quantity BETWEEN $lo AND $hi
          AND (l_discount BETWEEN $d1 AND $d2
            OR l_extendedprice BETWEEN $p1 AND $p2)"""
        s"""(SELECT CAST(SUM(${moneySql("l_extendedprice")}) AS DOUBLE)
             / COUNT(*) FROM lineitem WHERE $in) AS b${i + 1}_avg,
           (SELECT COUNT(*) FROM lineitem WHERE $in) AS b${i + 1}_cnt,
           (SELECT COUNT(DISTINCT l_extendedprice) FROM lineitem
             WHERE $in) AS b${i + 1}_cntd"""
      }
      s"SELECT ${cols.mkString(",\n        ")}"
    }),

    // ---- TPC-DS query39 shape: coefficient-of-variation pairs — per
    // (supplier, month) the mean and stdev of shipped quantity from
    // EXACT integer moments (n, decimal sum, decimal sum-of-squares:
    // the s17 discipline), cov computed in ONE identical double
    // expression in both engines, then consecutive months paired with
    // a partitioned LAG (not a self-join) keeping pairs where both
    // months' cov exceeds the bound. ----
    QueryDef("q_tpcds_s39", (s, dir) => {
      val d186 = DecimalType(18, 6)
      val m = t(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1998)
        .groupBy(col("l_suppkey"), month(col("l_shipdate")).as("m"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("l_quantity"))).as("s_dec"),
          sum((money(col("l_quantity")) * money(col("l_quantity")))
            .cast(d186)).as("ss_dec"))
        .filter(col("n") > 1)
      val cov = m.withColumn("mean",
          col("s_dec").cast("double") / col("n"))
        .withColumn("cov",
          sqrt((col("ss_dec").cast("double") -
            col("s_dec").cast("double") * col("s_dec").cast("double") /
              col("n")) / (col("n") - 1)) / col("mean"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("m"))
      cov.withColumn("pm", lag(col("m"), 1).over(w))
        .withColumn("pcov", lag(col("cov"), 1).over(w))
        .filter(col("m") === col("pm") + 1 &&
          col("cov") > 0.55 && col("pcov") > 0.55)
        .select(col("l_suppkey").as("suppkey"), col("pm").as("m1"),
          col("pcov").as("cov1"), col("m").as("m2"), col("cov").as("cov2"))
        .orderBy(col("suppkey"), col("m1"))
    }, Some(s"""
      WITH m AS (
        SELECT l_suppkey, month(l_shipdate) AS m, COUNT(*) AS n,
          SUM(${moneySql("l_quantity")}) AS s_dec,
          SUM(CAST(${moneySql("l_quantity")} * ${moneySql("l_quantity")}
            AS DECIMAL(18,6))) AS ss_dec
        FROM lineitem WHERE year(l_shipdate) = 1998
        GROUP BY 1, 2 HAVING COUNT(*) > 1),
      cov AS (
        SELECT l_suppkey, m,
          sqrt((CAST(ss_dec AS DOUBLE) - CAST(s_dec AS DOUBLE)
              * CAST(s_dec AS DOUBLE) / n) / (n - 1))
            / (CAST(s_dec AS DOUBLE) / n) AS cov
        FROM m)
      SELECT a.l_suppkey AS suppkey, a.m AS m1, a.cov AS cov1,
        b.m AS m2, b.cov AS cov2
      FROM cov a JOIN cov b
        ON a.l_suppkey = b.l_suppkey AND b.m = a.m + 1
      WHERE a.cov > 0.55 AND b.cov > 0.55
      ORDER BY suppkey, m1""")),

    // ---- TPC-DS query58 shape: equal-share items across the three
    // channels — per part the 1998 revenue in each o_orderstatus
    // channel (F/O/P), keeping parts where EVERY channel's revenue
    // lies within ±10% of the three-channel average. TPC-DS builds
    // three per-channel CTEs and joins them; the Spark-first plan is
    // ONE conditional aggregate per part (one fact scan, one shuffle),
    // and the ±10% band is evaluated in exact cross-multiplied decimal
    // (30*rev vs 9*total / 11*total) so no float boundary flips. ----
    QueryDef("q_tpcds_s58", (s, dir) => {
      val z = lit(0).cast(DecimalType(12, 2))
      def chan(st: String) =
        sum(when(col("o_orderstatus") === st,
          money(col("l_extendedprice"))).otherwise(z))
      val per = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(year(col("l_shipdate")) === 1998)
        .groupBy(col("l_partkey"))
        .agg(chan("F").as("rev_f"), chan("O").as("rev_o"),
          chan("P").as("rev_p"))
      val total = col("rev_f") + col("rev_o") + col("rev_p")
      def inBand(c: org.apache.spark.sql.Column) =
        c * 30 >= total * 9 && c * 30 <= total * 11
      per.filter(total > 0 && inBand(col("rev_f")) &&
          inBand(col("rev_o")) && inBand(col("rev_p")))
        .select(col("l_partkey").as("partkey"),
          col("rev_f").cast("double").as("rev_f"),
          col("rev_o").cast("double").as("rev_o"),
          col("rev_p").cast("double").as("rev_p"))
        .orderBy(col("partkey"))
    }, Some(s"""
      WITH per AS (
        SELECT l_partkey,
          SUM(CASE WHEN o_orderstatus = 'F'
            THEN ${moneySql("l_extendedprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS rev_f,
          SUM(CASE WHEN o_orderstatus = 'O'
            THEN ${moneySql("l_extendedprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS rev_o,
          SUM(CASE WHEN o_orderstatus = 'P'
            THEN ${moneySql("l_extendedprice")}
            ELSE CAST(0 AS DECIMAL(12,2)) END) AS rev_p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE year(l_shipdate) = 1998
        GROUP BY 1)
      SELECT l_partkey AS partkey, CAST(rev_f AS DOUBLE) AS rev_f,
        CAST(rev_o AS DOUBLE) AS rev_o, CAST(rev_p AS DOUBLE) AS rev_p
      FROM per
      WHERE rev_f + rev_o + rev_p > 0
        AND rev_f * 30 >= (rev_f + rev_o + rev_p) * 9
        AND rev_f * 30 <= (rev_f + rev_o + rev_p) * 11
        AND rev_o * 30 >= (rev_f + rev_o + rev_p) * 9
        AND rev_o * 30 <= (rev_f + rev_o + rev_p) * 11
        AND rev_p * 30 >= (rev_f + rev_o + rev_p) * 9
        AND rev_p * 30 <= (rev_f + rev_o + rev_p) * 11
      ORDER BY partkey""")),

    // ---- TPC-DS query77 shape: per-channel profit-and-loss — a sales
    // aggregate and a RETURNS aggregate built separately per (channel,
    // nation), FULL OUTER joined on the group key (a channel+nation can
    // have returns but no sales or vice versa), then a ROLLUP report of
    // sales / returns / net profit with coalesced zeros. Both
    // aggregates come off one fact scan each; the outer join is
    // nation-sized (tiny) and the rollup runs on the JOINED partials,
    // never the fact table. ----
    QueryDef("q_tpcds_s77", (s, dir) => {
      // Spark-first: the sales-agg FULL OUTER returns-agg of the
      // literal shape is ONE conditional aggregate over one fact scan
      // — a (chan, nat) group with only returns coalesces its sales to
      // zero exactly as the outer join would (the oracle keeps the
      // literal two-CTE FULL OUTER form, so the rewrite is
      // hash-verified equivalent); halves the 100 TB fact I/O
      val z = lit(0).cast(DecimalType(12, 2))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select(col("c_custkey"),
          col("c_nationkey")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderstatus").as("channel"),
          col("c_nationkey").as("nationkey"))
        .agg(sum(when(col("l_returnflag") =!= "R",
            money(col("l_extendedprice"))).otherwise(z)).as("sales_dec"),
          sum(when(col("l_returnflag") === "R",
            money(col("l_extendedprice"))).otherwise(z)).as("ret_dec"))
        .rollup(col("channel"), col("nationkey"))
        .agg(sum(col("sales_dec")).cast("double").as("sales"),
          sum(col("ret_dec")).cast("double").as("returns"),
          (sum(col("sales_dec")) - sum(col("ret_dec"))).cast("double")
            .as("profit"))
        .orderBy(col("channel").asc_nulls_first,
          col("nationkey").asc_nulls_first)
    }, Some(s"""
      WITH base AS (
        SELECT o_orderstatus, c_nationkey, l_returnflag,
          ${moneySql("l_extendedprice")} AS price_dec
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey),
      sales AS (
        SELECT o_orderstatus AS chan, c_nationkey AS nat,
          SUM(price_dec) AS sales_dec
        FROM base WHERE l_returnflag <> 'R' GROUP BY 1, 2),
      rets AS (
        SELECT o_orderstatus AS chan, c_nationkey AS nat,
          SUM(price_dec) AS ret_dec
        FROM base WHERE l_returnflag = 'R' GROUP BY 1, 2),
      joined AS (
        SELECT COALESCE(s.chan, r.chan) AS channel,
          COALESCE(s.nat, r.nat) AS nationkey,
          COALESCE(s.sales_dec, CAST(0 AS DECIMAL(12,2))) AS sales_dec,
          COALESCE(r.ret_dec, CAST(0 AS DECIMAL(12,2))) AS ret_dec
        FROM sales s FULL OUTER JOIN rets r
          ON s.chan = r.chan AND s.nat = r.nat)
      SELECT channel, nationkey,
        CAST(SUM(sales_dec) AS DOUBLE) AS sales,
        CAST(SUM(ret_dec) AS DOUBLE) AS returns,
        CAST(SUM(sales_dec) - SUM(ret_dec) AS DOUBLE) AS profit
      FROM joined
      GROUP BY ROLLUP(channel, nationkey)
      ORDER BY channel NULLS FIRST, nationkey NULLS FIRST""")),

    // ---- TPC-DS query95 shape: DISTINCT-entity semi-join chain — the
    // CTE of orders whose lineitems came from AT LEAST TWO distinct
    // suppliers (TPC-DS: shipped from two warehouses, as a self-join
    // with inequality; here as a countDistinct HAVING — same set, one
    // scan instead of a quadratic self-join), then urgent orders
    // SEMI-joined against that set AND against the set with a returned
    // line, reporting distinct-order count and total revenue. ----
    QueryDef("q_tpcds_s95", (s, dir) => {
      val li = t(s, dir, "lineitem")
      val multiSupp = li.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"))
        .filter(col("n_supp") >= 2).select(col("l_orderkey"))
      val returned = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey")).distinct()
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .join(multiSupp, col("o_orderkey") === multiSupp("l_orderkey"),
          "left_semi")
        .join(returned, col("o_orderkey") === returned("l_orderkey"),
          "left_semi")
      ord.agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"))
    }, Some(s"""
      WITH multi AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY 1 HAVING COUNT(DISTINCT l_suppkey) >= 2)
      SELECT COUNT(*) AS n_orders,
        ${dsumSql("o_totalprice")} AS total_price
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND o_orderkey IN (SELECT l_orderkey FROM multi)
        AND o_orderkey IN (SELECT l_orderkey FROM lineitem
                           WHERE l_returnflag = 'R')""")),

    // ---- TPC-DS query35 shape: EXISTS-gated demographic statistics —
    // customers with at least one open 1998+ order (any channel), then
    // per (nation, segment) the count and min/max/avg account-balance
    // stats. The EXISTS is a LEFT SEMI join on the customer key; stats
    // use the exact-decimal average discipline. ----
    QueryDef("q_tpcds_s35", (s, dir) => {
      val active = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O" &&
          year(col("o_orderdate")) >= 1998)
        .select(col("o_custkey")).distinct()
      t(s, dir, "customer")
        .join(active, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"),
          davg(col("c_acctbal")).as("avg_bal"))
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    }, Some(s"""
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_cust,
        MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
        ${davgSql("c_acctbal")} AS avg_bal
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
          AND year(o_orderdate) >= 1998)
      GROUP BY 1, 2
      ORDER BY 1, 2""")),

    // ---- TPC-DS query82 shape: dimension band filter + date-window
    // fact + HAVING quantity range — parts in a retail-price band whose
    // total quantity shipped inside a 60-day window lands in a target
    // range, listing the part attributes. The filtered part dim is
    // small → broadcast; the fact is pre-filtered by the date window
    // before the join, so the shuffle carries only the window slice. ----
    QueryDef("q_tpcds_s82", (s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_retailprice") >= 1200 && col("p_retailprice") <= 1600)
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_date(lit("1998-03-01")) &&
          col("l_shipdate") < to_date(lit("1998-05-01")))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_retailprice"))
        .agg(sum(money(col("l_quantity"))).as("qty_dec"))
        .filter(col("qty_dec") >= 40 && col("qty_dec") <= 500)
        .select(col("p_partkey").as("partkey"), col("p_name"),
          col("p_brand"), col("p_retailprice"),
          col("qty_dec").cast("double").as("window_qty"))
        .orderBy(col("partkey"))
    }, Some(s"""
      SELECT p_partkey AS partkey, p_name, p_brand, p_retailprice,
        CAST(SUM(${moneySql("l_quantity")}) AS DOUBLE) AS window_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_retailprice BETWEEN 1200 AND 1600
        AND l_shipdate >= DATE '1998-03-01'
        AND l_shipdate < DATE '1998-05-01'
      GROUP BY 1, 2, 3, 4
      HAVING SUM(${moneySql("l_quantity")}) >= 40
         AND SUM(${moneySql("l_quantity")}) <= 500
      ORDER BY partkey""")),

    // ---- TPC-DS query45 shape: disjunction of a LOCAL predicate and
    // an IN-subquery — customers in a named nation set OR who bought a
    // part from a designated item list. Catalyst can't turn an OR'd
    // IN-subquery into a semi join, so the Spark side decorrelates by
    // hand: LEFT join against the (distinct, broadcast) item-buyer set
    // and filter (local OR marker IS NOT NULL) — the same plan a
    // native engine's decorrelator would emit. ----
    QueryDef("q_tpcds_s45", (s, dir) => {
      val itemBuyers = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 500 === 0)
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("buyer_key")).distinct()
      t(s, dir, "customer")
        .join(broadcast(itemBuyers),
          col("c_custkey") === col("buyer_key"), "left")
        .filter(col("c_nationkey").isin(1, 3, 7) ||
          col("buyer_key").isNotNull)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          dsum(col("c_acctbal")).as("total_bal"))
        .orderBy(col("c_mktsegment"))
    }, Some(s"""
      SELECT c_mktsegment, COUNT(*) AS n_cust,
        ${dsumSql("c_acctbal")} AS total_bal
      FROM customer
      WHERE c_nationkey IN (1, 3, 7)
         OR c_custkey IN (
           SELECT o_custkey FROM orders JOIN lineitem
             ON l_orderkey = o_orderkey
           WHERE l_partkey % 500 = 0)
      GROUP BY 1 ORDER BY 1""")),

    // ---- TPC-DS query72 shape: equi-join with a residual DATE-OFFSET
    // inequality — lines shipped more than 90 days after their order
    // date ("promise missed"), counted per order priority and year.
    // The date arithmetic is a residual predicate on the single
    // orderkey shuffle join (never a join condition that would force a
    // nested loop); both sides prune to the two join+date columns. ----
    QueryDef("q_tpcds_s72", (s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("o_orderpriority"),
          year(col("o_orderdate")).as("y"))
        .agg(count(lit(1)).as("n_late"))
        .orderBy(col("o_orderpriority"), col("y"))
    }, Some("""
      SELECT o_orderpriority, year(o_orderdate) AS y,
        COUNT(*) AS n_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- TPC-DS query2 shape: day-of-week PIVOT of weekly revenue,
    // then a cross-year self-join of consecutive years' same-numbered
    // weeks producing per-day ratios. Week/day are derived with
    // engine-neutral arithmetic (days since 1992-01-01) instead of ISO
    // week functions, whose year-boundary semantics differ across
    // engines. One scan builds the weekly pivot; the self-join is
    // week-keyed (52 rows/year side — AQE broadcasts it). ----
    QueryDef("q_tpcds_s2", (s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("dsince",
          datediff(col("o_orderdate"), lit("1992-01-01").cast("date")))
        .withColumn("wk", (col("dsince") / 7).cast("long"))
        .withColumn("dow", pmod(col("dsince"), lit(7)))
      val weekly = o.groupBy(col("wk"))
        .agg(
          dsum(when(col("dow") === 0, col("o_totalprice"))).as("d0"),
          dsum(when(col("dow") === 3, col("o_totalprice"))).as("d3"),
          dsum(when(col("dow") === 6, col("o_totalprice"))).as("d6"))
      val y1 = weekly.select(col("wk").as("wk1"), col("d0").as("a0"),
        col("d3").as("a3"), col("d6").as("a6"))
      val y2 = weekly.select((col("wk") - 52).as("wk2"), col("d0").as("b0"),
        col("d3").as("b3"), col("d6").as("b6"))
      y1.join(y2, col("wk1") === col("wk2"))
        .filter(col("wk1") < 52) // first year vs second year
        .select(col("wk1").as("wk"),
          round(col("a0") / col("b0"), 4).as("r0"),
          round(col("a3") / col("b3"), 4).as("r3"),
          round(col("a6") / col("b6"), 4).as("r6"))
        .orderBy(col("wk"))
    }, Some(s"""
      WITH weekly AS (
        SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate) / 7
            AS BIGINT) AS wk,
          ${dsumSql("CASE WHEN datediff('day', DATE '1992-01-01', o_orderdate) % 7 = 0 THEN o_totalprice END")} AS d0,
          ${dsumSql("CASE WHEN datediff('day', DATE '1992-01-01', o_orderdate) % 7 = 3 THEN o_totalprice END")} AS d3,
          ${dsumSql("CASE WHEN datediff('day', DATE '1992-01-01', o_orderdate) % 7 = 6 THEN o_totalprice END")} AS d6
        FROM orders GROUP BY 1)
      SELECT y1.wk AS wk,
        ROUND(y1.d0 / y2.d0, 4) AS r0,
        ROUND(y1.d3 / y2.d3, 4) AS r3,
        ROUND(y1.d6 / y2.d6, 4) AS r6
      FROM weekly y1 JOIN weekly y2 ON y2.wk = y1.wk + 52
      WHERE y1.wk < 52
      ORDER BY wk""")),

    // ---- TPC-DS query6 shape: an UNCORRELATED scalar subquery anchors
    // the reporting month, a correlated per-class average prices the
    // comparison, and a HAVING floors the group size — nations whose
    // customers placed >= 10 anchored-month orders priced above 1.2x
    // their priority class's average. Both subqueries decorrelate to
    // broadcast joins (5-row class averages, 1-row anchor). ----
    QueryDef("q_tpcds_s6", (s, dir) => {
      val o = t(s, dir, "orders")
      // anchor: the first month with orders in 1995 (scalar, uncorrelated)
      val anchor = o.filter(year(col("o_orderdate")) === 1995)
        .agg(min(trunc(col("o_orderdate"), "month")).as("m"))
      val classAvg = o.groupBy(col("o_orderpriority").as("cp"))
        .agg(davg(col("o_totalprice")).as("class_avg"))
      o.join(broadcast(anchor),
          trunc(col("o_orderdate"), "month") === col("m"))
        .join(broadcast(classAvg), col("o_orderpriority") === col("cp"))
        .filter(col("o_totalprice") > col("class_avg") * 1.2)
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("int").as("nationkey"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 10)
        .orderBy(col("cnt"), col("nationkey"))
    }, Some(s"""
      WITH anchor AS (
        SELECT MIN(date_trunc('month', o_orderdate)) AS m FROM orders
        WHERE year(o_orderdate) = 1995),
      class_avg AS (
        SELECT o_orderpriority AS cp, ${davgSql("o_totalprice")} AS class_avg
        FROM orders GROUP BY 1)
      SELECT CAST(c_nationkey AS INTEGER) AS nationkey, COUNT(*) AS cnt
      FROM orders
      JOIN anchor ON date_trunc('month', o_orderdate) = anchor.m
      JOIN class_avg ON o_orderpriority = cp
      JOIN customer ON o_custkey = c_custkey
      WHERE o_totalprice > class_avg * 1.2
      GROUP BY 1 HAVING COUNT(*) >= 10
      ORDER BY cnt, nationkey""")),

    // ---- TPC-DS query24 shape: one CTE consumed TWICE — once as the
    // report's base rows, once inside an uncorrelated scalar average —
    // with a HAVING comparing each group's sum against 0.05x that
    // scalar. Per-(supplier, returnflag) revenue; suppliers whose flag
    // bucket exceeds 5% of the average supplier total. ----
    QueryDef("q_tpcds_s24", (s, dir) => {
      val cte = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"), col("l_returnflag"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount")))
          .as("rev_dec"))
      val avgTotal = cte.groupBy(col("l_suppkey"))
        .agg(sum(col("rev_dec")).as("tot"))
        .agg(davg(col("tot").cast("double")).as("avg_tot"))
      cte.join(broadcast(avgTotal))
        .filter(col("rev_dec").cast("double") > col("avg_tot") * 0.05)
        .select(col("l_suppkey"), col("l_returnflag"),
          col("rev_dec").cast("double").as("revenue"))
        .orderBy(col("l_suppkey"), col("l_returnflag"))
    }, Some(s"""
      WITH cte AS MATERIALIZED (
        SELECT l_suppkey, l_returnflag,
          SUM(${revenueSql("l_extendedprice", "l_discount")}) AS rev_dec
        FROM lineitem GROUP BY 1, 2),
      avg_tot AS (
        SELECT ${davgSql("CAST(tot AS DOUBLE)")} AS avg_tot FROM (
          SELECT l_suppkey, SUM(rev_dec) AS tot FROM cte GROUP BY 1))
      SELECT l_suppkey, l_returnflag, CAST(rev_dec AS DOUBLE) AS revenue
      FROM cte, avg_tot
      WHERE CAST(rev_dec AS DOUBLE) > avg_tot * 0.05
      ORDER BY l_suppkey, l_returnflag""")),

    // ---- TPC-DS query48 shape: a single SUM guarded by DISJUNCTIVE
    // band predicates (OR of AND-groups pairing a category with a
    // value band and a geography band) — the optimizer must keep the
    // whole disjunction as one scan filter, not three scans. ----
    QueryDef("q_tpcds_s48", (s, dir) => {
      val j = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      j.filter(
          (col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice").between(50000, 150000) &&
            col("c_nationkey").between(0, 9)) ||
          (col("o_orderpriority") === "2-HIGH" &&
            col("o_totalprice").between(100000, 250000) &&
            col("c_nationkey").between(5, 19)) ||
          (col("o_orderpriority") === "5-LOW" &&
            col("o_totalprice").between(150000, 400000) &&
            col("c_nationkey").between(10, 24)))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
    }, Some(s"""
      SELECT COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE (o_orderpriority = '1-URGENT'
             AND o_totalprice BETWEEN 50000 AND 150000
             AND c_nationkey BETWEEN 0 AND 9)
         OR (o_orderpriority = '2-HIGH'
             AND o_totalprice BETWEEN 100000 AND 250000
             AND c_nationkey BETWEEN 5 AND 19)
         OR (o_orderpriority = '5-LOW'
             AND o_totalprice BETWEEN 150000 AND 400000
             AND c_nationkey BETWEEN 10 AND 24)""")),

    // ---- TPC-DS query62/99 shape: a CASE-bucket LATENCY MATRIX — one
    // scan counting shipments into 30/60/90/120+-day buckets of
    // (l_shipdate - o_orderdate), grouped by priority (the suite's
    // warehouse x ship-mode matrix adapted to the TPC-H schema). All
    // buckets come from ONE conditional aggregation pass. ----
    QueryDef("q_tpcds_s62", (s, dir) => {
      val lat = datediff(col("l_shipdate"), col("o_orderdate"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(lat <= 30, 1).otherwise(0)).as("d30"),
          sum(when(lat > 30 && lat <= 60, 1).otherwise(0)).as("d60"),
          sum(when(lat > 60 && lat <= 90, 1).otherwise(0)).as("d90"),
          sum(when(lat > 90, 1).otherwise(0)).as("d120"))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      SELECT o_orderpriority,
        CAST(SUM(CASE WHEN lat <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
        CAST(SUM(CASE WHEN lat > 30 AND lat <= 60 THEN 1 ELSE 0 END)
          AS BIGINT) AS d60,
        CAST(SUM(CASE WHEN lat > 60 AND lat <= 90 THEN 1 ELSE 0 END)
          AS BIGINT) AS d90,
        CAST(SUM(CASE WHEN lat > 90 THEN 1 ELSE 0 END) AS BIGINT) AS d120
      FROM (
        SELECT o_orderpriority,
          datediff('day', o_orderdate, l_shipdate) AS lat
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      GROUP BY 1 ORDER BY 1""")),

    // ---- TPC-DS query73 shape: per-ticket (order) item counts with a
    // HAVING band, then a join back to the customer for the report —
    // customers holding orders of 5-7 line items. The grouped fact
    // aggregates BEFORE joining the dimension (partial-agg shrinks the
    // shuffle), and the count band prunes pre-join. ----
    QueryDef("q_tpcds_s73", (s, dir) => {
      val counts = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"))
        .filter(col("n_items").between(5, 7))
      counts
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("n_items"))
        .orderBy(col("n_items").desc, col("c_name"), col("o_orderkey"))
        .limit(200)
    }, Some("""
      SELECT c_name, o_orderkey, n_items FROM (
        SELECT l_orderkey, COUNT(*) AS n_items
        FROM lineitem GROUP BY 1 HAVING COUNT(*) BETWEEN 5 AND 7)
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY n_items DESC, c_name, o_orderkey LIMIT 200""")),

    // ---- TPC-DS query22 shape: AVERAGE (not sum) under a multi-level
    // ROLLUP hierarchy, reported with grouping_id so every subtotal
    // level is distinguishable. Inventory avg-quantity-on-hand adapted
    // to avg line quantity over the (brand, type, size-band) part
    // hierarchy. davg keeps the division the single inexact op. ----
    QueryDef("q_tpcds_s22", (s, dir) => {
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .withColumn("size_band", floor(col("p_size") / 10).cast("int"))
        .rollup(col("p_brand"), col("p_type"), col("size_band"))
        .agg(grouping_id().as("gid"), davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("n"))
        .select(col("gid"), col("p_brand"), col("p_type"),
          col("size_band"), round(col("avg_qty"), 6).as("avg_qty"),
          col("n"))
    }, Some(s"""
      SELECT CAST(GROUPING(p_brand, p_type, size_band) AS BIGINT) AS gid,
        p_brand, p_type, size_band,
        ROUND(${dsumSql("l_quantity")} / COUNT(l_quantity), 6) AS avg_qty,
        COUNT(*) AS n
      FROM (
        SELECT l_quantity, p_brand, p_type,
          CAST(FLOOR(p_size / 10) AS INTEGER) AS size_band
        FROM lineitem JOIN part ON l_partkey = p_partkey)
      GROUP BY ROLLUP(p_brand, p_type, size_band)""")),

    // ---- TPC-DS query76 shape: UNION ALL of per-channel branches each
    // selecting the rows whose channel-specific attribute is NULL,
    // counted per (channel, year) — the suite's "sales with a missing
    // dimension key" report. NULLs are derived with NULLIF on the
    // TPC-H columns (the schema has no nullable FKs). ----
    QueryDef("q_tpcds_s76", (s, dir) => {
      val o = t(s, dir, "orders")
      val b1 = o.filter(expr("nullif(o_orderpriority, '3-MEDIUM')").isNull)
        .select(lit("store").as("channel"),
          year(col("o_orderdate")).as("y"), col("o_totalprice").as("amt"))
      val b2 = o.filter(expr("nullif(o_orderstatus, 'O')").isNull)
        .select(lit("web").as("channel"),
          year(col("o_orderdate")).as("y"), col("o_totalprice").as("amt"))
      val b3 = t(s, dir, "lineitem")
        .filter(expr("nullif(l_returnflag, 'N')").isNull)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(lit("catalog").as("channel"),
          year(col("o_orderdate")).as("y"),
          col("l_extendedprice").as("amt"))
      b1.unionByName(b2).unionByName(b3)
        .groupBy(col("channel"), col("y"))
        .agg(count(lit(1)).as("n"), dsum(col("amt")).as("total"))
    }, Some(s"""
      SELECT channel, y, COUNT(*) AS n, ${dsumSql("amt")} AS total
      FROM (
        SELECT 'store' AS channel, year(o_orderdate) AS y,
          o_totalprice AS amt
        FROM orders WHERE NULLIF(o_orderpriority, '3-MEDIUM') IS NULL
        UNION ALL
        SELECT 'web', year(o_orderdate), o_totalprice
        FROM orders WHERE NULLIF(o_orderstatus, 'O') IS NULL
        UNION ALL
        SELECT 'catalog', year(o_orderdate), l_extendedprice
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE NULLIF(l_returnflag, 'N') IS NULL)
      GROUP BY 1, 2"""))
  )
}
