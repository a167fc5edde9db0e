package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.QueryDef
import graft.operators.TimeWindows
import Q._

/** Window TVF aggregates in batch form — reference: TUMBLE/HOP/CUMULATE/
  * SESSION window table functions (SliceAssigners.java:46-700,
  * UnsliceAssigners.java:47, WindowAggOperator.java:95,
  * StreamExecWindowAggregate.java). Streaming variants of the same ops
  * are exercised in the ScalaTest streaming suite; the driver gate runs
  * them in batch where results are oracle-comparable.
  */
object WindowTvfQueries {

  private def dvsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(14, 4))).cast("double")

  val defs: Seq[QueryDef] = Seq(

    // TUMBLE (reference SliceAssigners tumble): epoch-aligned buckets.
    QueryDef("q_tumble", (s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dvsum(col("value")).as("total"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("total"))
    }, Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2""")),

    // TUMBLE TVF with the offset argument (SliceAssigners.java:46):
    // windows align 15 min past the hour. The dialect maps offset onto
    // Spark window()'s startTime; the oracle is DuckDB's 3-arg
    // time_bucket with the same offset.
    QueryDef("q_tumble_offset", (s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events")
      graft.api.TableEnv(s).executeSql("""
        SELECT window_start, window_end, event_type, COUNT(*) AS n
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR,
                          INTERVAL '15' MINUTE))
        GROUP BY window_start, window_end, event_type""")
    }, Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts, INTERVAL '15 minutes')
          AS window_start,
        time_bucket(INTERVAL '1 hour', ts, INTERVAL '15 minutes')
          + INTERVAL '1 hour' AS window_end,
        event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3""")),

    // Legacy (pre-TVF) group-window SQL through the dialect: GROUP BY
    // TUMBLE + TUMBLE_START/END selectors — the dominant syntax in
    // pre-1.13 Flink deployments (StreamExecGroupWindowAggregate;
    // auxiliary fns in FlinkSqlOperatorTable.java).
    QueryDef("q_group_window_sql", (s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events")
      graft.api.TableEnv(s).executeSql("""
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS window_start,
               TUMBLE_END(ts, INTERVAL '1' HOUR) AS window_end,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total
        FROM events
        GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type""")
    }, Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
          AS window_end,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2, 3""")),

    // HOP/sliding (reference SliceAssigners hop): 1h window, 30m slide —
    // each row lands in exactly 2 windows.
    QueryDef("q_hop", (s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dvsum(col("value")).as("total"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("total"))
    }, Some("""
      WITH hopped AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
               event_type, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts)
                 - INTERVAL '30 minutes' AS window_start,
               event_type, value FROM events)
      SELECT window_start, event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total
      FROM hopped GROUP BY 1, 2""")),

    // CUMULATE (no Spark built-in — graft.operators.TimeWindows):
    // 15-minute growing slices over a 1-hour max window.
    QueryDef("q_cumulate", (s, dir) => {
      TimeWindows.cumulate(t(s, dir, "events"), "ts", 900L, 3600L)
        .groupBy(col("window_start"), col("window_end"))
        .agg(count(lit(1)).as("n"), dvsum(col("value")).as("total"))
    }, Some("""
      WITH expanded AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
          UNNEST(generate_series(
            time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes',
            time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour',
            INTERVAL '15 minutes')) AS window_end,
          value
        FROM events)
      SELECT window_start, window_end, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total
      FROM expanded GROUP BY 1, 2""")),

    // SESSION windows with 10-minute gap (reference UnsliceAssigners /
    // session merging MergingWindowSet.java:255). Oracle = classic
    // gaps-and-islands.
    QueryDef("q_session", (s, dir) => {
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "10 minutes").as("w"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"), dvsum(col("value")).as("total"))
        .select(col("w.start").as("session_start"), col("user_id"),
          col("n_events"), col("total"))
    }, Some("""
      WITH flagged AS (
        SELECT user_id, ts, value,
          CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 <= INTERVAL '10 minutes' THEN 0 ELSE 1 END AS new_sess
        FROM events),
      numbered AS (
        SELECT user_id, ts, value,
          SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged)
      SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total
      FROM numbered GROUP BY user_id, sid"""))
  )
}
