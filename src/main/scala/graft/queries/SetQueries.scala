package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import Q._

/** Set operations — reference: StreamExecUnion.java/BatchExecUnion.java;
  * INTERSECT/EXCEPT rewritten to semi/anti joins
  * (ReplaceIntersectWithSemiJoinRule, ReplaceMinusWithAntiJoinRule,
  * RewriteIntersectAllRule, RewriteMinusAllRule in
  * FlinkStreamRuleSets.scala). Catalyst performs the identical rewrites.
  */
object SetQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_union_all", (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_nationkey").cast("int").as("nationkey"),
          lit("customer").as("side"))
      val sup = t(s, dir, "supplier")
        .select(col("s_nationkey").cast("int").as("nationkey"),
          lit("supplier").as("side"))
      c.unionAll(sup).groupBy(col("nationkey"), col("side"))
        .agg(count(lit(1)).as("n"))
    }, Some("""
      SELECT nationkey, side, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier)
      GROUP BY nationkey, side""")),

    QueryDef("q_union_distinct", (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_nationkey").cast("int").as("nationkey"))
      val sup = t(s, dir, "supplier")
        .select(col("s_nationkey").cast("int").as("nationkey"))
      c.union(sup).distinct()
    }, Some("""
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier""")),

    QueryDef("q_intersect", (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_nationkey").cast("int").as("nationkey"))
      val sup = t(s, dir, "supplier")
        .select(col("s_nationkey").cast("int").as("nationkey"))
      c.intersect(sup)
    }, Some("""
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey AS nationkey FROM supplier""")),

    QueryDef("q_except", (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_nationkey").cast("int").as("nationkey"))
      val sup = t(s, dir, "supplier")
        .select(col("s_nationkey").cast("int").as("nationkey"))
      c.except(sup)
    }, Some("""
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey AS nationkey FROM supplier""")),

    // INTERSECT ALL / EXCEPT ALL (bag semantics — reference
    // RewriteIntersectAllRule/RewriteMinusAllRule).
    QueryDef("q_intersect_all", (s, dir) => {
      val a = t(s, dir, "lineitem").filter(col("l_quantity") <= 25)
        .select(col("l_suppkey"), col("l_returnflag"))
      val b = t(s, dir, "lineitem").filter(col("l_quantity") > 20)
        .select(col("l_suppkey"), col("l_returnflag"))
      a.intersectAll(b).groupBy(col("l_suppkey"), col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
    }, Some("""
      SELECT l_suppkey, l_returnflag, COUNT(*) AS n FROM (
        SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_quantity <= 25
        INTERSECT ALL
        SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_quantity > 20)
      GROUP BY l_suppkey, l_returnflag""")),

    QueryDef("q_except_all", (s, dir) => {
      val a = t(s, dir, "lineitem").filter(col("l_quantity") <= 25)
        .select(col("l_suppkey"), col("l_returnflag"))
      val b = t(s, dir, "lineitem").filter(col("l_quantity") > 20)
        .select(col("l_suppkey"), col("l_returnflag"))
      a.exceptAll(b).groupBy(col("l_suppkey"), col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
    }, Some("""
      SELECT l_suppkey, l_returnflag, COUNT(*) AS n FROM (
        SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_quantity <= 25
        EXCEPT ALL
        SELECT l_suppkey, l_returnflag FROM lineitem WHERE l_quantity > 20)
      GROUP BY l_suppkey, l_returnflag"""))
  )
}
