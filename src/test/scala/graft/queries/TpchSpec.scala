package graft.queries

import graft.{Registry, SparkSpec}

/** Plan-shape assertions for the TPC-H-derived suite — correctness is
  * covered by the DuckDB oracles; these tests pin the SCALE properties:
  * scan pushdown, semi/anti rewrites, partial top-k and partial
  * aggregation. (Broadcast-vs-shuffle choice for customer/supplier/part
  * is deliberately left to AQE — at sf0.01 they broadcast, at 100 TB
  * they wouldn't — so no test pins it.)
  */
class TpchSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sfDir)
      .queryExecution.executedPlan.toString

  // executedPlan.toString truncates long PushedFilters lists — use the
  // formatted explain (what a user sees from .explain("formatted")).
  private def formatted(name: String): String =
    Registry.byName(name).run(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q_tpch_q6 pushes every predicate to the parquet scan") {
    val p = formatted("q_tpch_q6")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("LessThan(l_quantity,24.0)"))
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"))
    // column pruning: only the 4 referenced columns are read
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp"))
  }

  test("q_tpch_q4 EXISTS becomes a left-semi join with the late residual") {
    val p = plan("q_tpch_q4")
    assert(p.contains("LeftSemi"))
  }

  test("q_tpch_q18 plans the HAVING subquery as a semi join, and the " +
    "top-100 as TakeOrderedAndProject (no global sort)") {
    val p = plan("q_tpch_q18")
    assert(p.contains("LeftSemi"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q_tpch_q3 top-10 is TakeOrderedAndProject over a partial agg") {
    val p = plan("q_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"))
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q_tpch_q22 plans an anti join for NOT EXISTS") {
    assert(plan("q_tpch_q22").contains("LeftAnti"))
  }

  test("q_tpch_q1x family: every query in the suite executes at sf0.001") {
    val names = Registry.all.map(_.name).filter(_.startsWith("q_tpch_"))
    assert(names.size == 21)
    names.foreach { n =>
      // schema resolves and the plan executes end-to-end
      Registry.byName(n).run(spark, sfDir).write
        .format("noop").mode("overwrite").save()
    }
  }
}
