package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.cep.{CEP, Pattern}
import Q._

/** CEP / MATCH_RECOGNIZE demonstrations over the events table —
  * reference: flink-cep Pattern API + StreamExecMatch. The two-step
  * strict pattern is SQL-expressible (lag window), giving an oracle; the
  * richer pattern gets the rows-only check + ScalaTest coverage.
  */
object CepQueries {

  case class Ev(event_id: Long, user_id: Long, event_type: String, ts_us: Long, value: Double)

  val defs: Seq[QueryDef] = Seq(

    // click immediately followed by purchase (per user, event-time order,
    // SKIP PAST LAST ROW). Equivalent to a lag() test because the two
    // steps can never overlap — which is what makes it oracle-checkable.
    QueryDef("q_cep_strict", (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .as[Ev]
      val pattern = Pattern.begin[Ev]("click")
        .where(_.event_type == "click")
        .next("purchase").where(_.event_type == "purchase")
      CEP.matchPattern[Long, Ev](ev, _.user_id, _.ts_us, pattern,
          tieFn = _.event_id)
        .toDF("user_id", "match_idx", "bindings")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_matches"))
    }, Some("""
      SELECT user_id, COUNT(*) AS n_matches FROM (
        SELECT user_id, event_type,
          LAG(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev
        FROM events)
      WHERE event_type = 'purchase' AND prev = 'click'
      GROUP BY user_id""")),

    // Richer pattern: signup, then 1+ clicks (greedy), then a purchase
    // within 48 hours — rows-only check; semantics covered in CepSpec.
    QueryDef("q_cep_funnel", (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .as[Ev]
      val pattern = Pattern.begin[Ev]("signup")
        .where(_.event_type == "signup")
        .followedBy("clicks").where(_.event_type == "click").timesOrMore(1)
        .followedBy("buy").where(_.event_type == "purchase")
        .within(48L * 3600 * 1000000) // µs-scale timestamps
      CEP.matchPattern[Long, Ev](ev, _.user_id, _.ts_us, pattern)
        .map { case (user, idx, bindings) =>
          (user, idx, bindings("clicks").size,
            bindings("buy").head.value)
        }
        .toDF("user_id", "match_idx", "n_clicks", "buy_value")
    }, None, bench = true),

    // The same click->purchase pattern through the MATCH_RECOGNIZE SQL
    // surface (graft.cep.MatchRecognize): DEFINE becomes boolean columns,
    // the matcher binds steps, MEASURES compile to array expressions.
    // Mutually-exclusive step types make the lag() oracle exact.
    QueryDef("q_match_recognize", (s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events")
      val env = graft.api.TableEnv(s)
      val matches = env.executeSql("""
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(C.event_id) AS click_id, LAST(P.value) AS buy_value
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (C P)
          DEFINE C AS C.event_type = 'click',
                 P AS P.event_type = 'purchase'
        )""")
      matches.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_matches"),
          sum(col("click_id")).as("sum_click_id"),
          dsum(col("buy_value")).as("sum_buy"))
    }, Some(s"""
      SELECT user_id, COUNT(*) AS n_matches,
        CAST(SUM(click_id) AS BIGINT) AS sum_click_id,
        ${dsumSql("value")} AS sum_buy
      FROM (
        SELECT user_id, value, event_type,
          LAG(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev,
          LAG(event_id) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS click_id
        FROM events)
      WHERE event_type = 'purchase' AND prev = 'click'
      GROUP BY user_id"""), bench = true)
  )
}
