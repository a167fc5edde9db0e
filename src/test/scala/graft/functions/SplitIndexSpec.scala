package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitIndexSpec extends SparkSpec {
  import spark.implicits._

  test("split_index basic, out-of-range, null propagation") {
    graft.functions.register(spark)
    val df = Seq(("a,b,c"), (""), (null: String)).toDF("s")
      .select($"s",
        expr("split_index(s, ',', 0)").as("i0"),
        expr("split_index(s, ',', 2)").as("i2"),
        expr("split_index(s, ',', 5)").as("i5"))
    val rows = df.collect()
    val abc = rows.find(r => r.getString(0) == "a,b,c").get
    assert(abc.getString(1) == "a" && abc.getString(2) == "c" && abc.isNullAt(3))
    val empty = rows.find(r => "" == r.getString(0)).get
    assert(empty.getString(1) == "")
    val nul = rows.find(_.isNullAt(0)).get
    assert(nul.isNullAt(1) && nul.isNullAt(2) && nul.isNullAt(3))
  }

  test("split_index matches interpreted eval under codegen") {
    graft.functions.register(spark)
    // wholestage codegen path (project over a real scan)
    val n = spark.range(100).selectExpr("cast(id as string) as s")
      .selectExpr("split_index(concat(s, '-', s), '-', 1) as out", "s")
      .filter("out = s").count()
    assert(n == 100)
  }
}
