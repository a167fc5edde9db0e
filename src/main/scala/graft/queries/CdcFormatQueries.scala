package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
import graft.QueryDef
import graft.cdc.{ChangelogAgg, ChangelogFormats, ChangelogInference}
import Q._

/** CDC ingestion formats — reference: debezium/canal/maxwell/ogg JSON
  * formats (flink-formats/flink-json/.../json/{debezium,canal,maxwell,
  * ogg}/) plus DropUpdateBefore (StreamExecDropUpdateBefore.java). The
  * queries synthesize change envelopes from the orders table (op
  * derived from the order key), decode them through
  * graft.cdc.ChangelogFormats, and aggregate per row kind — the decoded
  * payload sums are oracle-checkable because the oracle can derive the
  * same envelopes arithmetically.
  */
object CdcFormatQueries {

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
      GROUP BY row_kind"""))
  )
}
