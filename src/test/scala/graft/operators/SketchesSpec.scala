package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64

  private def sketchOf(values: Seq[Long]): Seq[Long] =
    values.toDF("v")
      .select(Sketches.portableHash32(col("v")).as("h"))
      .groupBy().agg(udafCol(col("h"))).as[Seq[Long]].collect().head

  private def udafCol(h: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions
      .udaf(new Sketches.KmvSketch(K), org.apache.spark.sql.Encoders.scalaLong)
      .apply(h)

  test("exact below k, close above k") {
    val small = sketchOf(0L until 40L)
    assert(Sketches.estimateFrom(small, K) == 40.0)
    val big = sketchOf(0L until 5000L)
    val est = Sketches.estimateFrom(big, K)
    assert(math.abs(est - 5000) / 5000.0 < 0.25, s"est=$est")
  }

  test("sketch algebra: sketch(A ++ B) == union of sketches, exactly") {
    val a = 0L until 500L
    val b = 300L until 900L
    val sa = sketchOf(a)
    val sb = sketchOf(b)
    val sAB = sketchOf(a ++ b)
    assert(Sketches.estimateUnion(sa, sb, K) ==
      Sketches.estimateFrom(sAB, K))
  }

  test("intersection estimate tracks the true overlap") {
    val a = 0L until 2000L
    val b = 1000L until 3000L // true intersection 1000, union 3000
    val est = Sketches.estimateIntersection(sketchOf(a), sketchOf(b), K)
    assert(est > 300 && est < 2200, s"est=$est") // k=64 is coarse; sanity band
  }

  test("deterministic under repartitioning") {
    val df = (0L until 3000L).toDF("v")
    def run(p: Int): Double = df.repartition(p)
      .select(Sketches.portableHash32(col("v")).as("h"))
      .agg(Sketches.kmvDistinct(col("h"), K)).as[Double].collect().head
    assert(run(2) == run(17))
  }
}
