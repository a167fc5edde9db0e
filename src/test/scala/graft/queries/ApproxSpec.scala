package graft.queries

import graft.SparkSpec

class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 10% of exact on test data") {
    val rows = graft.Registry.byName("q_agg_approx").run(spark, sfDir)
      .collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.10,
        s"approx=$approx exact=$exact")
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
