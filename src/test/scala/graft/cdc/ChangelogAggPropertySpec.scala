package graft.cdc

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Model-based check of the batch changelog materialization: random
  * +I/-U/+U/-D streams vs a naive signed-multiset model. */
class ChangelogAggPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val opGen = Gen.zip(
    Gen.oneOf("a", "b"),
    Gen.choose(1, 6).map(_.toDouble),
    Gen.oneOf("+I", "+U", "-U", "-D"))
  private val opsGen = Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, opGen))

  private def model(ops: Seq[(String, Double, String)])
      : Map[String, (Long, Double, Double, Double)] =
    ops.groupBy(_._1).flatMap { case (k, rows) =>
      def w(kind: String) = if (kind == "+I" || kind == "+U") 1L else -1L
      val cnt = rows.map(r => w(r._3)).sum
      if (cnt <= 0) None
      else {
        val sum = rows.map(r => w(r._3) * r._2).sum
        val survivors = rows.groupBy(_._2)
          .map { case (v, vs) => v -> vs.map(r => w(r._3)).sum }
          .collect { case (v, net) if net > 0 => v }
        Some(k -> (cnt, sum, survivors.min, survivors.max))
      }
    }

  test("materialize matches the signed-multiset model") {
    check(Prop.forAll(opsGen) { ops =>
      val df = ops.toDF("k", "v", ChangelogFormats.RowKindCol)
      val got = ChangelogAgg.materialize(df, Seq("k"), "v").collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      val want = model(ops)
      if (got != want) println(s"MISMATCH ops=$ops got=$got want=$want")
      got == want
    }, n = 15)
  }
}
