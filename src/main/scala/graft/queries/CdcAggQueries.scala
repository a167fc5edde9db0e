package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
import graft.QueryDef
import graft.cdc.{ChangelogAgg, ChangelogFormats, ChangelogInference}
import Q._

/** Retractable changelog aggregation chains — reference:
  * GroupAggFunction.java's retract path, the retractable accumulators,
  * and FlinkChangelogModeInferenceProgram's agg→agg / agg→join→agg
  * scenarios (see graft.cdc.ChangelogAgg / ChangelogInference). Shared
  * synthetic changelogs live in [[CdcData]].
  */
object CdcAggQueries {

  val defs: Seq[QueryDef] = Seq(


    // Retraction-aware aggregation (reference MinWithRetractAggFunction
    // et al. + GroupAggFunction retract path): a synthesized changelog
    // (inserts, -U/+U price doubling for key%10=0, -D for key%10=1) is
    // materialized per customer; the oracle computes the surviving net
    // state directly, so any retraction-handling defect breaks the hash.
    QueryDef("q_cdc_agg", (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"),
        col("o_orderkey"), money(col("o_totalprice")).as("v"))
      val k = ChangelogFormats.RowKindCol
      val changelog = o.select(col("o_custkey"), col("v"), lit("+I").as(k))
        .union(o.filter(pmod(col("o_orderkey"), lit(10)) === 0)
          .select(col("o_custkey"), col("v"), lit("-U").as(k)))
        .union(o.filter(pmod(col("o_orderkey"), lit(10)) === 0)
          .select(col("o_custkey"), (col("v") * 2).as("v"), lit("+U").as(k)))
        .union(o.filter(pmod(col("o_orderkey"), lit(10)) === 1)
          .select(col("o_custkey"), col("v"), lit("-D").as(k)))
      ChangelogAgg.materialize(changelog, Seq("o_custkey"), "v")
        .select(col("o_custkey"), col("cnt"),
          col("sum_val").cast("double").as("sum_val"),
          col("min_val").cast("double").as("min_val"),
          col("max_val").cast("double").as("max_val"))
    }, Some(s"""
      WITH live AS (
        SELECT o_custkey, CASE WHEN o_orderkey % 10 = 0
          THEN ${moneySql("o_totalprice")} * 2
          ELSE ${moneySql("o_totalprice")} END AS v
        FROM orders WHERE o_orderkey % 10 <> 1)
      SELECT o_custkey, COUNT(*) AS cnt,
        CAST(SUM(v) AS DOUBLE) AS sum_val,
        CAST(MIN(v) AS DOUBLE) AS min_val,
        CAST(MAX(v) AS DOUBLE) AS max_val
      FROM live GROUP BY o_custkey""")),


    // TWO-STAGE retraction propagation (reference
    // FlinkChangelogModeInferenceProgram.java's agg→agg scenario): the
    // per-customer running COUNT/SUM aggregate emits its UPDATE STREAM
    // (+I first, then -U(old)/+U(new) per change, bare -U on group
    // death — ChangelogAgg.updateStream), and a SECOND retraction-aware
    // aggregate consumes it, bucketing customers by their order count.
    // A customer walks through buckets 1,2,3,… as its orders arrive, so
    // every intermediate bucket sees a +U later cancelled by a -U; the
    // oracle computes the NET state directly (final per-customer count
    // → bucket histogram) — if stage 2 mishandles a single retraction,
    // the per-bucket customer counts and sum-of-sums hash-mismatch.
    // All values are DECIMAL(12,2), so both stages are exact.
    QueryDef("q_cdc_agg_chain", (s, dir) => {
      val k = ChangelogFormats.RowKindCol
      val updates = ChangelogAgg.updateStream(CdcData.orderChangelog(s, dir),
        Seq("o_custkey"), "v", Seq(col("seq"), col("stage")))
      // stage 2: bucket = the stage-1 running count, value = its sum
      ChangelogAgg.materialize(
          updates.select(col("cnt").as("n_orders"), col("sum_val").as("s"),
            col(k)),
          Seq("n_orders"), "s")
        .select(col("n_orders"), col("cnt").as("n_cust"),
          col("sum_val").cast("double").as("sum_sums"),
          col("min_val").cast("double").as("min_sum"),
          col("max_val").cast("double").as("max_sum"))
    }, Some(s"""
      WITH changes AS (
        SELECT o_custkey, ${moneySql("o_totalprice")} AS v, 1 AS w
        FROM orders
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")}, -1
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")} * 2, 1
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")}, -1
        FROM orders WHERE o_orderkey % 10 = 1),
      state AS (
        SELECT o_custkey, CAST(SUM(w) AS BIGINT) AS n_orders,
          SUM(w * v) AS s
        FROM changes GROUP BY o_custkey
        HAVING SUM(w) > 0)
      SELECT n_orders, COUNT(*) AS n_cust,
        CAST(SUM(s) AS DOUBLE) AS sum_sums,
        CAST(MIN(s) AS DOUBLE) AS min_sum,
        CAST(MAX(s) AS DOUBLE) AS max_sum
      FROM state GROUP BY n_orders""")),


    // THREE-STAGE retraction propagation with a JOIN in the middle —
    // the full FlinkChangelogModeInferenceProgram scenario the verdict
    // asked for (agg → join → agg): stage 1 emits the per-customer
    // running COUNT/SUM update stream; the stream is enriched by an
    // inner join against the STATIC customer dimension (a changelog ⋈
    // bounded-table join passes row kinds through unchanged — the
    // reference's CDC-enrichment join with an unchanging build side;
    // broadcast, so the update stream never shuffles for the join);
    // stage 2 re-aggregates the enriched update stream per nation. Every
    // intermediate per-customer state flows through the join as a
    // -U/+U pair, so a kind dropped or duplicated by the join breaks
    // the per-nation net counts/sums. The oracle computes the NET
    // result directly: final live per-customer sums joined to nation,
    // aggregated. cnt per nation = LIVE customers (each contributes
    // net +1 while alive), certifying group-death (-U with no +U)
    // propagation through the join.
    QueryDef("q_cdc_agg_join_chain", (s, dir) => {
      val k = ChangelogFormats.RowKindCol
      val updates = ChangelogAgg.updateStream(CdcData.orderChangelog(s, dir),
        Seq("o_custkey"), "v", Seq(col("seq"), col("stage")))
      val dim = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val enriched = updates
        .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
      ChangelogAgg.materialize(
          enriched.select(col("c_nationkey").as("nationkey"),
            col("sum_val").as("s"), col(k)),
          Seq("nationkey"), "s")
        .select(col("nationkey"), col("cnt").as("n_cust"),
          col("sum_val").cast("double").as("sum_sums"),
          col("min_val").cast("double").as("min_sum"),
          col("max_val").cast("double").as("max_sum"))
    }, Some(s"""
      WITH changes AS (
        SELECT o_custkey, ${moneySql("o_totalprice")} AS v, 1 AS w
        FROM orders
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")}, -1
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")} * 2, 1
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")}, -1
        FROM orders WHERE o_orderkey % 10 = 1),
      state AS (
        SELECT o_custkey, SUM(w * v) AS s
        FROM changes GROUP BY o_custkey
        HAVING SUM(w) > 0),
      enriched AS (
        SELECT c.c_nationkey AS nationkey, st.s
        FROM state st JOIN customer c ON st.o_custkey = c.c_custkey)
      SELECT nationkey, COUNT(*) AS n_cust,
        CAST(SUM(s) AS DOUBLE) AS sum_sums,
        CAST(MIN(s) AS DOUBLE) AS min_sum,
        CAST(MAX(s) AS DOUBLE) AS max_sum
      FROM enriched GROUP BY nationkey""")),


    // The agg→join→agg→sink scenario DERIVED instead of hand-composed:
    // ChangelogInference walks the plan tree and decides per stage —
    // inner agg must emit the full retract stream (-U/+U, its consumer
    // is another stateful aggregate), outer agg keyed on nationkey
    // feeds a PK sink on the SAME key, so its UPDATE_BEFORE rows are
    // dropped at the source (DropUpdateBefore) and the sink compacts
    // last-writer-wins. The oracle computes the net state directly, so
    // a wrong mode decision anywhere (dropped -U upstream, kept -U
    // downstream, mis-compaction) hash-mismatches.
    QueryDef("q_cdc_infer_chain", (s, dir) => {
      import ChangelogInference._
      val plan = Sink(
        GroupAgg(
          EnrichJoin(
            GroupAgg(
              Source(CdcData.orderChangelog(s, dir), seqCols = Seq("seq", "stage")),
              Seq("o_custkey"), "v"),
            t(s, dir, "customer")
              .select(col("c_custkey"), col("c_nationkey")),
            "o_custkey", "c_custkey"),
          Seq("c_nationkey"), "sum_val"),
        primaryKey = Some(Seq("c_nationkey")))
      val inf = infer(plan)
      require(inf.sinkMode == Upsert, "pk sink must accept upsert")
      ChangelogInference.execute(plan)
        .select(col("c_nationkey").cast("int").as("nationkey"),
          col("cnt").as("n_cust"),
          col("sum_val").cast("double").as("sum_sums"))
        .orderBy(col("nationkey"))
    }, Some(s"""
      WITH changes AS (
        SELECT o_custkey, ${moneySql("o_totalprice")} AS v, 1 AS w
        FROM orders
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")}, -1
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")} * 2, 1
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")}, -1
        FROM orders WHERE o_orderkey % 10 = 1),
      state AS (
        SELECT o_custkey, SUM(w * v) AS s
        FROM changes GROUP BY o_custkey
        HAVING SUM(w) > 0),
      enriched AS (
        SELECT c.c_nationkey AS nationkey, st.s
        FROM state st JOIN customer c ON st.o_custkey = c.c_custkey)
      SELECT nationkey, COUNT(*) AS n_cust,
        CAST(SUM(s) AS DOUBLE) AS sum_sums
      FROM enriched GROUP BY nationkey
      ORDER BY nationkey""")),


    // Single-stage DropUpdateBefore: agg keyed on o_custkey into a PK
    // sink on o_custkey — the inference decides the aggregate NEVER
    // produces -U (each change emits one +I/+U; a fully-retracted
    // customer emits -D) and the sink compaction yields exactly the
    // net per-customer state. Customers whose every order was deleted
    // (all keys ≡ 1 mod 10) must be ABSENT — a -D mishandled as an
    // update would leave them in the store.
    QueryDef("q_cdc_infer_upsert", (s, dir) => {
      import ChangelogInference._
      val plan = Sink(
        GroupAgg(
          Source(CdcData.orderChangelog(s, dir), seqCols = Seq("seq", "stage")),
          Seq("o_custkey"), "v"),
        primaryKey = Some(Seq("o_custkey")))
      ChangelogInference.execute(plan)
        .select(col("o_custkey"), col("cnt").as("n_orders"),
          col("sum_val").cast("double").as("total"))
        .orderBy(col("o_custkey"))
    }, Some(s"""
      WITH changes AS (
        SELECT o_custkey, ${moneySql("o_totalprice")} AS v, 1 AS w
        FROM orders
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")}, -1
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")} * 2, 1
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")}, -1
        FROM orders WHERE o_orderkey % 10 = 1)
      SELECT o_custkey, CAST(SUM(w) AS BIGINT) AS n_orders,
        CAST(SUM(w * v) AS DOUBLE) AS total
      FROM changes GROUP BY o_custkey
      HAVING SUM(w) > 0
      ORDER BY o_custkey""")),


    // Mid-chain LOCAL/GLOBAL aggregate (reference
    // StreamExecLocalGroupAggregate + StreamExecGlobalGroupAggregate,
    // mini-batch MiniBatchGlobalGroupAggFunction): the INNER aggregate
    // keys on the 25-value c_nationkey — exactly the low-cardinality
    // shape whose per-change replay caps parallelism at 25 — and runs
    // with localBuckets=64: parallel per-(nation, bucket) partial nets,
    // then a 64-events-per-key global replay. Its mini-batched update
    // stream feeds a SECOND aggregate whose compacted state is oracled:
    // the bucketed emissions must telescope to the same nets as the
    // per-change stream, or the hash breaks.
    QueryDef("q_cdc_agg_local_global", (s, dir) => {
      import ChangelogInference._
      val plan = Sink(
        GroupAgg(
          Calc(
            GroupAgg(
              Source(CdcData.customerChangelog(s, dir), seqCols = Seq("seq", "stage")),
              Seq("c_nationkey"), "c_custkey", localBuckets = Some(64)),
            df => df.withColumnRenamed("cnt", "n")
              .withColumnRenamed("sum_val", "s")),
          Seq("n"), "s"),
        primaryKey = Some(Seq("n")))
      ChangelogInference.execute(plan)
        .select(col("n").as("nation_size"), col("cnt").as("n_nations"),
          col("sum_val").cast("long").as("sum_custkeys"))
        .orderBy(col("nation_size"))
    }, Some("""
      WITH clive AS (
        SELECT c_custkey,
          CAST(CASE WHEN c_custkey % 7 = 0 THEN (c_nationkey + 1) % 25
               ELSE c_nationkey END AS INTEGER) AS nationkey
        FROM customer WHERE c_custkey % 7 <> 1),
      inner_net AS (
        SELECT nationkey, COUNT(*) AS n, SUM(c_custkey) AS s
        FROM clive GROUP BY nationkey)
      SELECT CAST(n AS BIGINT) AS nation_size,
        CAST(COUNT(*) AS BIGINT) AS n_nations,
        CAST(SUM(s) AS BIGINT) AS sum_custkeys
      FROM inner_net GROUP BY n
      ORDER BY nation_size"""))
  )
}
