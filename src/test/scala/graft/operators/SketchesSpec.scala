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

  // --- bottom-k sampled quantiles -----------------------------------

  private def sampledQuantiles(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("__rn", Sketches.sampleRank(Seq(col("g")), col("id")))
      .filter(col("__rn") <= k)
      .groupBy(col("g"))
      .agg(sort_array(collect_list(col("v"))).as("s"))
      .select(col("g"),
        Sketches.interpolatedQuantile(col("s"), 0.5).as("p50"),
        Sketches.interpolatedQuantile(col("s"), 0.95).as("p95"))

  test("sampled quantile: deterministic across partitionings, near truth") {
    // g=a: v = id (uniform 0..9999) => true p50 ~ 5000, p95 ~ 9500
    val df = (0 until 10000).map(i => ("a", i.toString, i.toDouble)).toDF("g", "id", "v")
    def run(p: Int) = sampledQuantiles(df.repartition(p), 256).collect().head
    val r2 = run(2)
    val r31 = run(31)
    assert(r2 == r31) // bit-identical: pure function of data, not layout
    val (p50, p95) = (r2.getDouble(1), r2.getDouble(2))
    // rank error O(1/sqrt(k)): k=256 => sigma ~ 6% of the range around
    // the target rank; 4-sigma bands
    assert(math.abs(p50 - 5000) < 1250, s"p50=$p50")
    assert(math.abs(p95 - 9500) < 1250, s"p95=$p95")
  }

  test("sampled quantile: exact (interpolated) when group fits in k") {
    val df = (0 until 101).map(i => ("a", i.toString, i.toDouble)).toDF("g", "id", "v")
    val r = sampledQuantiles(df, 256).collect().head
    assert(r.getDouble(1) == 50.0) // (n-1)*0.5 = 50 exactly
    assert(r.getDouble(2) == 95.0)
  }
}
