package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.QueryDef
import Q._

/** TPC-DS structural shapes, round-9 batch — closes the 99-query board
  * (reference gate: flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/
  * query/, test_tpcds.sh). With these six, every TPC-DS query number
  * maps to an implemented structural family; the remaining numbers are
  * channel/measure twins of an implemented shape, documented
  * query-by-query in COVERAGE.md ("TPC-DS 99/99 accounting").
  *
  * Same discipline as [[TpcdsQueries]]: fixed-cardinality dims
  * broadcast, one shuffle per fact aggregation, exact-decimal money
  * math so the DuckDB replay is bit-identical at any parallelism, and
  * every ORDER BY ... LIMIT is a total order (no tie at the cut line
  * can select different rows across engines).
  */
object TpcdsQueries2 {

  private val d184 = DecimalType(18, 4)

  val defs: Seq[QueryDef] = Seq(

    // ---- TPC-DS query3 shape (the suite's most-reused template —
    // q42/q52/q55 are the same text with a different grouping column):
    // fact x filtered dim, (year, brand) revenue report, ORDER BY year,
    // revenue DESC with the dimension as the deterministic tie-break,
    // LIMIT 100. ----
    QueryDef("q_tpcds_s3", (s, dir) => {
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_type") === "PROMO")),
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
      WHERE p_type = 'PROMO'
      GROUP BY 1, 2
      ORDER BY d_year, sum_agg DESC, p_brand LIMIT 100""")),

    // ---- TPC-DS query4 shape: THREE-channel two-year spending pivot
    // with TWO simultaneous growth-ratio predicates (web > store AND
    // catalog > store), q74 is the week-grain twin. Extends s11's
    // two-channel pivot: the six (channel, year) totals come from ONE
    // fact scan as conditional aggregates, and the ratio comparisons
    // are EXACT cross-multiplied decimals — a float division cannot
    // flip a customer in or out on the boundary. Channels are
    // o_orderstatus (F=store, O=web, P=catalog). ----
    QueryDef("q_tpcds_s4", (s, dir) => {
      val zero = lit(0).cast(d184)
      // The sum is cast back to DECIMAL(18,4) so the cross-multiplied
      // ratio compare below stays EXACT: 18+18+1 = 37 digits fits
      // DECIMAL(38,8) on both engines, whereas sum-typed DECIMAL(28,4)
      // products overflow 38 digits (Spark rounds to (38,6), DuckDB
      // promotes to DOUBLE — boundary customers could flip). Range
      // bound: a single customer's per-channel-year revenue must be
      // < 10^14; TPC-H order totals are bounded in the low 10^5, so
      // this holds with ~9 digits of headroom at any SF.
      val spend = (st: String, y: Int) => sum(when(
        col("o_orderstatus") === st && year(col("o_orderdate")) === y,
        revenue(col("l_extendedprice"), col("l_discount")).cast(d184))
        .otherwise(zero)).cast(d184)
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(spend("F", 1996).as("f96"), spend("F", 1997).as("f97"),
          spend("O", 1996).as("o96"), spend("O", 1997).as("o97"),
          spend("P", 1996).as("p96"), spend("P", 1997).as("p97"))
        .filter(col("f96") > zero && col("o96") > zero && col("p96") > zero)
        // web growth > store growth AND catalog growth > store growth,
        // compared as o97*f96 > f97*o96 (exact decimal, no division)
        .filter(col("o97") * col("f96") > col("f97") * col("o96") &&
          col("p97") * col("f96") > col("f97") * col("p96"))
        .select(col("c_name"),
          (col("o97").cast("double") / col("o96").cast("double"))
            .as("web_growth"),
          (col("p97").cast("double") / col("p96").cast("double"))
            .as("catalog_growth"),
          (col("f97").cast("double") / col("f96").cast("double"))
            .as("store_growth"))
        .orderBy(col("c_name")).limit(100)
    }, Some(s"""
      WITH y AS (
        SELECT c_custkey, c_name,
          ${Seq("F" -> "f", "O" -> "o", "P" -> "p").flatMap {
            case (st, pre) => Seq(1996, 1997).map { yr =>
              // CAST(SUM(...) AS DECIMAL(18,4)) mirrors the engine-side
              // narrowing so the cross-multiply below is exact decimal
              // on both engines (see the Spark-side comment).
              s"""CAST(SUM(CASE WHEN o_orderstatus = '$st'
                AND year(o_orderdate) = $yr
                THEN CAST(${revenueSql("l_extendedprice", "l_discount")}
                AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
                AS DECIMAL(18,4)) AS $pre${yr - 1900}"""
            }
          }.mkString(",\n          ")}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2)
      SELECT c_name,
        CAST(o97 AS DOUBLE) / CAST(o96 AS DOUBLE) AS web_growth,
        CAST(p97 AS DOUBLE) / CAST(p96 AS DOUBLE) AS catalog_growth,
        CAST(f97 AS DOUBLE) / CAST(f96 AS DOUBLE) AS store_growth
      FROM y
      WHERE f96 > 0 AND o96 > 0 AND p96 > 0
        -- one operand widened to DECIMAL(19,4): DuckDB executes an
        -- int64 x int64 decimal multiply in int64 (raising on overflow);
        -- a hugeint-backed operand forces exact int128 math, matching
        -- Spark's exact DECIMAL(37,8) product
        AND CAST(o97 AS DECIMAL(19,4)) * f96 > CAST(f97 AS DECIMAL(19,4)) * o96
        AND CAST(p97 AS DECIMAL(19,4)) * f96 > CAST(f97 AS DECIMAL(19,4)) * p96
      ORDER BY c_name LIMIT 100""")),

    // ---- TPC-DS query7 shape (q26 is the catalog twin): four exact
    // AVERAGES per item over a demographic + promotion slice —
    // c_mktsegment stands in for customer_demographics,
    // o_orderpriority for the promotion flag. ----
    QueryDef("q_tpcds_s7", (s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer")
            .filter(col("c_mktsegment") === "BUILDING"),
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
      WHERE o_orderpriority = '1-URGENT' AND c_mktsegment = 'BUILDING'
      GROUP BY 1 ORDER BY p_brand LIMIT 100""")),

    // ---- TPC-DS query15 shape: a disjunction that SPANS the join —
    // (customer "zip" prefix IN list) OR (nation IN list) OR (fact
    // price over threshold) — so no branch can push to any single
    // scan; the filter must run above the joins. "Zip" is the last
    // three digits of c_name (the schema has no address), quarter gate
    // on the ship date. ----
    QueryDef("q_tpcds_s15", (s, dir) => {
      t(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1996 &&
          quarter(col("l_shipdate")) === 1)
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .withColumn("ca_zip", substring(col("c_name"), 16, 3))
        .filter(col("ca_zip").isin("005", "013", "042", "071", "106") ||
          col("n_name").isin("NATION_3", "NATION_11", "NATION_19") ||
          col("l_extendedprice") > 9000.0)
        .groupBy(col("ca_zip"))
        .agg(dsum(money(col("l_extendedprice"))).as("total_sales"))
        .orderBy(col("ca_zip"))
    }, Some(s"""
      SELECT substring(c_name, 16, 3) AS ca_zip,
        ${dsumSql(moneySql("l_extendedprice"))} AS total_sales
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE year(l_shipdate) = 1996 AND quarter(l_shipdate) = 1
        AND (substring(c_name, 16, 3) IN ('005','013','042','071','106')
          OR n_name IN ('NATION_3','NATION_11','NATION_19')
          OR l_extendedprice > 9000.0)
      GROUP BY 1 ORDER BY ca_zip""")),

    // ---- TPC-DS query71 shape: three channels UNIONed, joined to the
    // item dimension, reported per (brand, hour of day). The oracle
    // stays the literal per-channel UNION ALL; the Spark plan is ONE
    // scan of the events table with a channel predicate — hash-proving
    // the disjoint-branch union collapses to a single pass (q71's
    // channels partition the fact rows exactly like these event
    // types). The "brand" is the part dimension keyed by a fixed
    // 200-way hash of event_id (stable across SFs: part keys 0..199
    // exist at every SF), always broadcastable. ----
    QueryDef("q_tpcds_s71", (s, dir) => {
      val pt = broadcast(t(s, dir, "part").filter(col("p_partkey") < 200)
        .select(col("p_partkey"), col("p_brand")))
      t(s, dir, "events")
        .filter(col("event_type").isin("click", "view", "purchase"))
        .join(pt, pmod(col("event_id"), lit(200)) === col("p_partkey"))
        .groupBy(col("p_brand"), hour(col("ts")).as("t_hour"))
        .agg(dsum(money(col("value"))).as("ext_price"),
          count(lit(1)).as("n"))
        .orderBy(col("ext_price").desc, col("p_brand"), col("t_hour"))
    }, Some(s"""
      WITH u AS (
        SELECT event_id, ts, value FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, ts, value FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT event_id, ts, value FROM events WHERE event_type = 'purchase')
      SELECT p_brand, hour(ts) AS t_hour,
        ${dsumSql(moneySql("value"))} AS ext_price, COUNT(*) AS n
      FROM u JOIN part ON event_id % 200 = p_partkey
      GROUP BY 1, 2
      ORDER BY ext_price DESC, p_brand, t_hour""")),

    // ---- TPC-DS query84 shape: a pure DIMENSION-chain lookup report —
    // no fact table, no aggregation: customer -> nation -> region hops
    // with an income-band predicate (c_acctbal stands in for
    // household_demographics/income_band), concatenated display name,
    // ordered LIMIT. Every hop broadcasts; the plan has zero
    // shuffles besides the top-k. ----
    QueryDef("q_tpcds_s84", (s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_acctbal").between(1000.0, 5000.0))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("c_custkey").as("customer_id"),
          concat(col("c_name"), lit(", "), col("n_name"))
            .as("customername"))
        .orderBy(col("customer_id")).limit(100)
    }, Some("""
      SELECT c_custkey AS customer_id,
        c_name || ', ' || n_name AS customername
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE c_acctbal BETWEEN 1000.0 AND 5000.0 AND r_name = 'ASIA'
      ORDER BY customer_id LIMIT 100"""))
  )
}
