package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.operators.Dedup
import Q._

/** OVER aggregates / rank / dedup / sort-limit — reference: batch OVER
  * frames (BatchExecOverAggregate.java + operators/over/frame/), rank &
  * TopN (operators/rank/, RankProcessStrategy.java:68-110), deduplicate
  * (StreamExecDeduplicate.java, DeduplicateFunctionHelper.java:29),
  * sort/limit (SortLimitOperator.java, RankOperator.java).
  *
  * All window orderings include a unique key as tiebreaker so results are
  * deterministic and oracle-comparable. Scale: one shuffle+sort per
  * distinct (partitionBy, orderBy); Spark 4 inserts WindowGroupLimit
  * (partial top-k before the shuffle) for rank-filter patterns.
  */
object OverQueries {

  val defs: Seq[QueryDef] = Seq(

    // ROWS frame running aggregate.
    QueryDef("q_over_rows", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("running_spend",
          sum(money(col("o_totalprice"))).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("running_spend"))
    }, Some(s"""
      SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(SUM(${moneySql("o_totalprice")}) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_spend
      FROM orders""")),

    // Numeric RANGE frame (reference RangeSlidingOverFrame.java).
    QueryDef("q_over_range", (s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_orderkey"))
        .rangeBetween(-100L, 0L)
      t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1)
        .withColumn("nearby_qty",
          sum(col("l_quantity").cast("long")).over(w))
        .select(col("l_orderkey"), col("l_returnflag"), col("nearby_qty"))
    }, Some("""
      SELECT l_orderkey, l_returnflag,
        CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
          PARTITION BY l_returnflag ORDER BY l_orderkey
          RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS BIGINT) AS nearby_qty
      FROM lineitem WHERE l_linenumber = 1""")),

    // TopN per group via row_number (reference AppendOnlyTopNFunction).
    QueryDef("q_rank_topn", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn"))
    }, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 3""")),

    // RANK / DENSE_RANK (deterministic: ties share ranks).
    QueryDef("q_rank_dense", (s, dir) => {
      val w = Window.partitionBy(col("p_brand")).orderBy(col("p_size"))
      t(s, dir, "part")
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(w))
        .groupBy(col("p_brand"))
        .agg(max(col("rk")).as("max_rank"),
          max(col("drk")).as("n_distinct_sizes"),
          count(lit(1)).as("n"))
    }, Some("""
      SELECT p_brand, MAX(rk) AS max_rank, MAX(drk) AS n_distinct_sizes,
        COUNT(*) AS n
      FROM (SELECT p_brand,
              RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS rk,
              DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS drk
            FROM part)
      GROUP BY p_brand""")),

    // LAG / LEAD with default values.
    QueryDef("q_lag_lead", (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1, -1.0).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1, -1.0).over(w))
        .select(col("o_orderkey"), col("o_custkey"), col("prev_price"),
          col("next_price"))
    }, Some("""
      SELECT o_orderkey, o_custkey,
        LAG(o_totalprice, 1, -1.0) OVER w AS prev_price,
        LEAD(o_totalprice, 1, -1.0) OVER w AS next_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // NTILE + CUME_DIST / PERCENT_RANK (unique ordering → deterministic).
    //
    // NOTE — deliberate single-partition window: global NTILE/OVER (no
    // PARTITION BY) is the demonstrated SEMANTICS here, matching the
    // oracle SQL, and Spark necessarily funnels it through one
    // WindowExec partition (the "No Partition Defined" warnings in the
    // test log). Do NOT copy this shape into a pipeline query — at
    // scale, global ranks want partitioned two-pass tricks (range
    // repartition + per-partition offsets, as Layout.zorder does).
    QueryDef("q_ntile", (s, dir) => {
      val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("tile", ntile(4).over(w))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          round(max(col("pr")), 6).as("max_pr"))
    }, Some("""
      SELECT tile, COUNT(*) AS n, MIN(o_totalprice) AS min_price,
        ROUND(MAX(pr), 6) AS max_pr
      FROM (SELECT o_totalprice,
              NTILE(4) OVER w AS tile,
              ROUND(PERCENT_RANK() OVER w, 6) AS pr
            FROM orders
            WINDOW w AS (ORDER BY o_totalprice, o_orderkey))
      GROUP BY tile""")),

    // FIRST_VALUE / LAST_VALUE over frames.
    QueryDef("q_first_last_value", (s, dir) => {
      // l_linenumber is not unique per order in this dataset — extend the
      // ordering until deterministic so both engines pick the same rows.
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "lineitem")
        .withColumn("first_part", first(col("l_partkey")).over(w))
        .withColumn("last_part", last(col("l_partkey")).over(w))
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("first_part"), col("last_part"))
    }, Some("""
      SELECT l_orderkey, first_part, last_part FROM (
        SELECT l_orderkey, l_linenumber,
          FIRST_VALUE(l_partkey) OVER w AS first_part,
          LAST_VALUE(l_partkey) OVER w AS last_part
        FROM lineitem
        WINDOW w AS (PARTITION BY l_orderkey
          ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      WHERE l_linenumber = 1""")),

    // Dedup keep-first per key by event time (graft.operators.Dedup).
    QueryDef("q_dedup_first", (s, dir) => {
      Dedup.keepFirst(t(s, dir, "events"),
          Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"))
    }, Some("""
      SELECT user_id, event_type, event_id, ts FROM (
        SELECT user_id, event_type, event_id, ts,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS rn
        FROM events) WHERE rn = 1""")),

    // Dedup keep-last per key (reference: dedup keep-last needs state in
    // streaming; in batch it's the reversed row_number).
    QueryDef("q_dedup_last", (s, dir) => {
      Dedup.keepLast(t(s, dir, "events"),
          Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"))
    }, Some("""
      SELECT user_id, event_type, event_id, ts FROM (
        SELECT user_id, event_type, event_id, ts,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1""")),

    // Global sort + limit → TakeOrderedAndProject (reference
    // SortLimitOperator.java): top-k without a full global sort.
    QueryDef("q_sort_limit", (s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))
    }, Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // Windowed TopN (reference WindowRankProcessor.java): top-2 users by
    // spend within each tumbling hour.
    QueryDef("q_window_topn", (s, dir) => {
      val agg = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
        .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(14, 4)))
          .cast("double").as("spend"))
        .select(col("w.start").as("window_start"), col("user_id"), col("spend"))
      val w = Window.partitionBy(col("window_start"))
        .orderBy(col("spend").desc, col("user_id"))
      agg.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("window_start"), col("user_id"), col("spend"), col("rn"))
    }, Some("""
      SELECT window_start, user_id, spend, rn FROM (
        SELECT window_start, user_id, spend,
          ROW_NUMBER() OVER (PARTITION BY window_start
            ORDER BY spend DESC, user_id) AS rn
        FROM (SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                user_id,
                CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS spend
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2))
      WHERE rn <= 2"""))
  )
}
