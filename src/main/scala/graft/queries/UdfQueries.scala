package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import Q._

/** UDF-surface demonstrations (§2.9): typed Aggregator (UDAGG), custom
  * Generator (UDTF), table aggregate via flatMapGroups (UDTAGG), and
  * window deduplication (StreamExecWindowDeduplicate).
  */
object UdfQueries {

  case class PQ(l_returnflag: String, l_extendedprice: Double, l_quantity: Double)

  val defs: Seq[QueryDef] = Seq(

    // WeightedAvg UDAGG (exact decimal buffer → engine-independent).
    QueryDef("q_udagg_weighted_avg", (s, dir) => {
      graft.functions.register(s)
      Tables.registerOn(s, dir)
      s.sql("""
        SELECT l_returnflag,
          ROUND(weighted_avg(l_extendedprice, l_quantity), 6) AS wavg,
          COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag""")
    }, Some("""
      SELECT l_returnflag,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
               * CAST(l_quantity AS DECIMAL(8,4))) AS DOUBLE)
          / CAST(SUM(CAST(l_quantity AS DECIMAL(8,4))) AS DOUBLE), 6) AS wavg,
        COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag""")),

    // COLLECT → MULTISET (count-map convention, SURVEY §1.2): the
    // dialect rewrites COLLECT(x) to the collect_multiset UDAGG, and the
    // multiset is serialized sorted so the oracle (a per-element COUNT
    // histogram replay) compares exactly.
    QueryDef("q_agg_collect", (s, dir) => {
      graft.functions.register(s)
      Tables.registerOn(s, dir)
      s.sql(graft.api.FlinkSqlDialect.translate("""
        SELECT o_orderpriority,
          CAST(cardinality(ms) AS INT) AS n_distinct,
          concat_ws(',', transform(array_sort(map_keys(ms)),
            k -> concat(k, ':', CAST(ms[k] AS STRING)))) AS multiset
        FROM (SELECT o_orderpriority, COLLECT(o_orderstatus) AS ms
              FROM orders GROUP BY o_orderpriority)"""))
    }, Some("""
      SELECT o_orderpriority, CAST(COUNT(*) AS INT) AS n_distinct,
        string_agg(o_orderstatus || ':' || cnt, ',' ORDER BY o_orderstatus)
          AS multiset
      FROM (SELECT o_orderpriority, o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS cnt
            FROM orders GROUP BY 1, 2)
      GROUP BY 1""")),

    // Custom Generator UDTF in LATERAL VIEW position.
    QueryDef("q_udtf_ngrams", (s, dir) => {
      graft.functions.register(s)
      Tables.registerOn(s, dir)
      s.sql("""
        SELECT ngram, COUNT(*) AS n
        FROM documents LATERAL VIEW ngrams(text, 2) t AS ngram
        WHERE doc_id < 50
        GROUP BY ngram HAVING COUNT(*) >= 3""")
    }, Some("""
      SELECT ngram, COUNT(*) AS n FROM (
        SELECT UNNEST(list_transform(
          generate_series(1, len(string_split(text,' ')) - 1),
          i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]))
          AS ngram
        FROM documents WHERE doc_id < 50)
      GROUP BY ngram HAVING COUNT(*) >= 3""")),

    // Table aggregate (UDTAGG, reference GroupTableAggFunction): emit
    // the top-2 rows per group from a typed flatMapGroups.
    QueryDef("q_table_agg_top2", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_quantity"))
        .as[PQ]
        .groupByKey(_.l_returnflag)
        .flatMapGroups { (flag: String, rows: Iterator[PQ]) =>
          rows.toSeq.sortBy(r => (-r.l_extendedprice, -r.l_quantity))
            .take(2).zipWithIndex
            .map { case (r, i) => (flag, i + 1, r.l_extendedprice) }
        }
        .toDF("l_returnflag", "rnk", "price")
    }, Some("""
      SELECT l_returnflag, rnk, price FROM (
        SELECT l_returnflag,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice DESC, l_quantity DESC) AS rnk,
          l_extendedprice AS price
        FROM lineitem) WHERE rnk <= 2""")),

    // Window deduplication (reference StreamExecWindowDeduplicate):
    // first event per (user, tumbling hour).
    QueryDef("q_window_dedup", (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("window_start"), col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("window_start", window(col("ts"), "1 hour")("start"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("window_start"), col("user_id"), col("event_id"))
    }, Some("""
      SELECT window_start, user_id, event_id FROM (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, user_id,
          event_id,
          ROW_NUMBER() OVER (
            PARTITION BY time_bucket(INTERVAL '1 hour', ts), user_id
            ORDER BY ts, event_id) AS rn
        FROM events) WHERE rn = 1"""))
  )

  /** Local alias so SQL-based queries can register tables. */
  private object Tables {
    def registerOn(s: org.apache.spark.sql.SparkSession, dir: String): Unit =
      graft.core.Tables.registerAll(s, dir)
  }
}
