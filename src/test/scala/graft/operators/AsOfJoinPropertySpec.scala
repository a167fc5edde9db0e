package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Model-based check of BOTH as-of join implementations — the custom
  * physical operator (AsOfJoinExec) and the declarative union-window
  * formulation — against a straightforward Scala model, including null
  * keys and timestamps (which must never match, per SQL semantics). */
class AsOfJoinPropertySpec extends SparkSpec {

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val keyGen: Gen[java.lang.Long] =
    Gen.frequency(9 -> Gen.choose(1L, 4L).map(java.lang.Long.valueOf),
      1 -> Gen.const(null.asInstanceOf[java.lang.Long]))
  private val tsGen: Gen[java.lang.Long] =
    Gen.frequency(9 -> Gen.choose(0L, 20L).map(java.lang.Long.valueOf),
      1 -> Gen.const(null.asInstanceOf[java.lang.Long]))

  private val leftGen = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n,
    Gen.zip(Gen.choose(0L, 1000L), keyGen, tsGen)))
  private val rightGen = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n,
    Gen.zip(keyGen, tsGen, Gen.choose(0.0, 9.0))))

  private val leftSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("k", LongType, nullable = true),
    StructField("t", LongType, nullable = true)))
  private val rightSchema = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("t", LongType, nullable = true),
    StructField("v", DoubleType, nullable = false)))

  /** The ground truth: latest right row with equal (non-null) key and
    * right.t <= left.t; ties on t broken toward the larger v is avoided
    * by deduplicating (k, t) on the right. */
  private def model(left: Seq[(Long, java.lang.Long, java.lang.Long)],
      right: Seq[(java.lang.Long, java.lang.Long, Double)])
      : Map[Long, Option[Double]] =
    left.map { case (id, k, t) =>
      id -> (if (k == null || t == null) None
        else right.filter(r => r._1 != null && r._2 != null &&
            r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3))
    }.toMap

  test("AsOfJoinExec and the declarative backward join match the model") {
    check(Prop.forAll(leftGen, rightGen) { (l0, r0) =>
      // unique (k, t) on the right so "latest" is unambiguous
      val r = r0.groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
      val left = spark.createDataFrame(
        spark.sparkContext.parallelize(
          l0.map(x => Row(x._1, x._2, x._3)), 2), leftSchema)
      val right = spark.createDataFrame(
        spark.sparkContext.parallelize(
          r.map(x => Row(x._1, x._2, x._3)), 2), rightSchema)
      val want = model(l0, r)

      def collect(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
        df.collect().map(row => row.getLong(0) ->
          (if (row.isNullAt(3)) None else Some(row.getDouble(3)))).toMap

      val exec = collect(graft.plans.PlannedAsOfJoin.asOf(
        left, right, "k", "t", Seq("v")).select("id", "k", "t", "v"))
      val decl = collect(AsOfJoin.backward(
        left, right, "k", "t", Seq("v")).select("id", "k", "t", "v"))
      if (exec != want) println(s"EXEC MISMATCH l=$l0 r=$r got=$exec want=$want")
      if (decl != want) println(s"DECL MISMATCH l=$l0 r=$r got=$decl want=$want")
      exec == want && decl == want
    }, n = 15)
  }
}
