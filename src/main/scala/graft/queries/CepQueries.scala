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
    }, None, bench = true)
  )
}
