package graft.functions

import graft.SparkSpec

class JsonPathSpec extends SparkSpec {
  import spark.implicits._

  private def one(expr: String): org.apache.spark.sql.Row = {
    graft.functions.register(spark)
    Seq("""{"a": {"b": [1, 2, 3], "s": "x"}, "arr": [{"k": 7}]}""")
      .toDF("j").selectExpr(expr).collect().head
  }

  test("json_value extracts scalars, null for containers/missing") {
    assert(one("json_value(j, '$.a.s') v").getString(0) == "x")
    assert(one("json_value(j, '$.a.b[1]') v").getString(0) == "2")
    assert(one("json_value(j, '$.a.missing') v").isNullAt(0))
    assert(one("json_value(j, '$.a.b') v").isNullAt(0)) // array → null
  }

  test("json_query returns fragments, null for scalars") {
    assert(one("json_query(j, '$.a.b') v").getString(0) == "[1,2,3]")
    assert(one("json_query(j, '$.arr[0]') v").getString(0) == """{"k":7}""")
    assert(one("json_query(j, '$.a.s') v").isNullAt(0)) // scalar → null
  }

  test("json_exists: true/false on resolution, false on bad json") {
    assert(one("json_exists(j, '$.a.b[2]') v").getBoolean(0))
    assert(!one("json_exists(j, '$.a.b[9]') v").getBoolean(0))
    assert(!one("json_exists(j, '$.nope') v").getBoolean(0))
    graft.functions.register(spark)
    val bad = Seq("not json").toDF("j")
      .selectExpr("json_exists(j, '$.a') v").collect().head
    assert(!bad.getBoolean(0))
  }

  test("lax unwraps single-element arrays; strict does not") {
    // arr is [{"k":7}]: lax $.arr.k unwraps, strict fails → null
    assert(one("json_value(j, 'lax $.arr.k') v").getString(0) == "7")
    assert(one("json_value(j, 'strict $.arr.k') v").isNullAt(0))
  }
}
