package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
import graft.QueryDef
import graft.cdc.{ChangelogAgg, ChangelogFormats, ChangelogInference}
import Q._

/** Synthetic changelogs shared by the CDC query families. */
private[queries] object CdcData {
  /** The synthesized order changelog shared by the retraction-chain
    * queries: inserts for every order, -U/+U price doubling for
    * key%10=0, -D for key%10=1, with a deterministic per-key sequence
    * (orderkey, stage) where +I < -U < +U < -D. ONE scan: each order
    * conditionally explodes into its 1-3 change rows (vs a 4-way union
    * re-reading the table four times). */
  private[queries] def orderChangelog(s: org.apache.spark.sql.SparkSession,
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
  private[queries] def customerChangelog(s: org.apache.spark.sql.SparkSession,
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
