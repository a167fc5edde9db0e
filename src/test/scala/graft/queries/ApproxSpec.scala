package graft.queries

import graft.SparkSpec

class ApproxSpec extends SparkSpec {

  test("approx_count_distinct stays inside the query's error band") {
    // q_agg_approx emits the band boolean itself (the oracle asserts it
    // as a truth table); the spec checks the flag is actually computed
    // and true on the test data. Band = ~3 sigma of the requested
    // rsd=0.02, so the probabilistic bound isn't a flaky gate.
    val rows = graft.Registry.byName("q_agg_approx").run(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_parts") > 0)
      assert(r.getAs[Boolean]("within_band"),
        s"HLL estimate outside band for ${r.getAs[String]("l_returnflag")}")
    }
  }

  test("parse_url extracts host/path/query") {
    val r = graft.Registry.byName("q_func_parse_url").run(spark, sfDir)
      .collect().head
    assert(r.getAs[String]("host") == "example.com")
    assert(r.getAs[String]("path").startsWith("/src"))
    assert(r.getAs[String]("qid") != null)
  }
}
