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

    // Richer pattern: signup, then 1+ CONSECUTIVE clicks (greedy, the
    // default strict-contiguity repeat), then a purchase within 48
    // hours, AFTER MATCH SKIP PAST LAST ROW. The NFA semantics resolve
    // to a closed form the oracle can replay: from each signup, the
    // matcher slides to the FIRST consecutive click-run whose in-window
    // prefix is followed by an in-window purchase (runs that no
    // purchase follows fail for every backtracked count, since shrinking
    // the run only re-offers click positions); n_clicks = that prefix
    // length (greedy takes the whole run), buy = first in-window
    // purchase after it. The sequential SKIP PAST LAST ROW walk is a
    // recursive CTE: earliest completing signup >= scan position wins,
    // failed signups never block later ones.
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
      CEP.matchPattern[Long, Ev](ev, _.user_id, _.ts_us, pattern,
          tieFn = _.event_id)
        .map { case (user, idx, bindings) =>
          (user, idx, bindings("clicks").size,
            bindings("buy").head.value)
        }
        .toDF("user_id", "match_idx", "n_clicks", "buy_value")
    }, Some("""
      WITH RECURSIVE
      ev AS (
        SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
          ROW_NUMBER() OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS idx
        FROM events),
      clicks AS (  -- consecutive click runs: gaps-and-islands on idx
        SELECT user_id, idx, ts_us,
          idx - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY idx)
            AS grp
        FROM ev WHERE event_type = 'click'),
      runs AS (
        SELECT user_id, grp, MIN(idx) AS run_start
        FROM clicks GROUP BY 1, 2),
      sig AS (
        SELECT user_id, idx AS s_idx,
          ts_us + CAST(48 AS BIGINT) * 3600 * 1000000 AS ts_end
        FROM ev WHERE event_type = 'signup'),
      srun AS (  -- per (signup, later run): in-window prefix of the run
        SELECT s.user_id, s.s_idx, s.ts_end, r.run_start,
          COUNT(*) AS n_clicks, MAX(c.idx) AS k_end
        FROM sig s
        JOIN runs r ON r.user_id = s.user_id AND r.run_start > s.s_idx
        JOIN clicks c ON c.user_id = r.user_id AND c.grp = r.grp
         AND c.ts_us <= s.ts_end
        GROUP BY 1, 2, 3, 4),
      cand0 AS (  -- buy = first in-window purchase after the run prefix
        SELECT sr.user_id, sr.s_idx, sr.run_start, sr.n_clicks,
          MIN(p.idx) AS buy_idx
        FROM srun sr JOIN ev p
          ON p.user_id = sr.user_id AND p.event_type = 'purchase'
         AND p.idx > sr.k_end AND p.ts_us <= sr.ts_end
        GROUP BY 1, 2, 3, 4),
      cand AS (  -- the matcher slides to the FIRST completing run
        SELECT user_id, s_idx, n_clicks, buy_idx FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, s_idx
            ORDER BY run_start) AS rn
          FROM cand0) WHERE rn = 1),
      rec AS (  -- SKIP PAST LAST ROW walk
        SELECT user_id, CAST(0 AS BIGINT) AS pos,
          CAST(-1 AS BIGINT) AS match_idx,
          CAST(NULL AS BIGINT) AS n_clicks, CAST(NULL AS BIGINT) AS buy_idx
        FROM (SELECT DISTINCT user_id FROM ev)
        UNION ALL
        SELECT r.user_id, c.buy_idx + 1, r.match_idx + 1,
          c.n_clicks, c.buy_idx
        FROM rec r JOIN LATERAL (
          SELECT c.s_idx, c.n_clicks, c.buy_idx
          FROM cand c
          WHERE c.user_id = r.user_id AND c.s_idx >= r.pos
          ORDER BY c.s_idx LIMIT 1) c ON true)
      SELECT r.user_id, r.match_idx,
        CAST(r.n_clicks AS INT) AS n_clicks, b.value AS buy_value
      FROM rec r JOIN ev b
        ON b.user_id = r.user_id AND b.idx = r.buy_idx
      WHERE r.match_idx >= 0"""), bench = true),

    // UNBOUNDED GROUP REPETITION `(A B)+` (reference GroupPattern.java:
    // Pattern.begin(sub).oneOrMore) at data scale: the group is a
    // strict click→purchase pair; copies repeat greedily with relaxed
    // copy contiguity. Closed form that makes it oracle-exact: adjacent
    // (click, purchase) pairs can never overlap (a pair's second event
    // is a purchase, so no pair starts there), so the greedy loop from
    // the FIRST pair binds EVERY pair of the user — one match per user
    // with n_copies = the lag-test pair count, and SKIP PAST LAST ROW
    // leaves nothing behind. purchase_id_sum (integral) pins exactly
    // WHICH events the loop bound, not just how many.
    QueryDef("q_cep_group_loop", (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .as[Ev]
      val pair = Pattern.begin[Ev]("c").where(_.event_type == "click")
        .next("p").where(_.event_type == "purchase")
      val pattern = Pattern.begin(pair).oneOrMore
      CEP.matchPattern[Long, Ev](ev, _.user_id, _.ts_us, pattern,
          tieFn = _.event_id)
        .map { case (user, idx, b) =>
          (user, idx, b("c").size, b("p").map(_.event_id).sum)
        }
        .toDF("user_id", "match_idx", "n_copies", "purchase_id_sum")
    }, Some("""
      SELECT user_id, CAST(0 AS BIGINT) AS match_idx,
        CAST(COUNT(*) AS INT) AS n_copies,
        CAST(SUM(p_id) AS BIGINT) AS purchase_id_sum
      FROM (
        SELECT user_id, event_id AS p_id,
          LAG(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev,
          event_type
        FROM events)
      WHERE event_type = 'purchase' AND prev = 'click'
      GROUP BY user_id""")),

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
