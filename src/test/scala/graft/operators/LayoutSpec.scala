package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorder interleaves bits (hand-checked values)") {
    val got = Seq((201L, 101L)).toDF("x", "y")
      .select(Layout.zorder(16, $"x", $"y")).as[Long].head()
    assert(got == 30819L) // interleave of 11001001 and 1100101
    // one dimension zero -> even-bit spread of the other
    val x = Seq((5L, 0L)).toDF("x", "y")
      .select(Layout.zorder(16, $"x", $"y")).as[Long].head()
    assert(x == 17L) // bits 0,2 of 5 -> positions 0 and 4
  }

  test("zorder stays inside whole-stage codegen") {
    val plan = spark.range(10)
      .select(Layout.zorder(16, $"id", ($"id" * 3).as("y")).as("z"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // no codegen fallback break
  }

  test("cluster shrinks per-partition ranges in BOTH dimensions") {
    // 128x128 grid in random order
    val grid = spark.range(128L * 128L).select(
      (col("id") % 128).as("x"), (col("id") / 128).cast("long").as("y"),
      md5(col("id").cast("string")).as("shuffle_key"))
      .orderBy("shuffle_key").select("x", "y")

    def avgRanges(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.groupBy(spark_partition_id().as("p"))
        .agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
        .agg(avg("rx"), avg("ry")).as[(Double, Double)].head()
      r
    }

    val (rx0, ry0) = avgRanges(grid.repartition(16))          // random
    val (rx1, ry1) = avgRanges(Layout.cluster(grid, 16, 7, "x", "y"))
    // random layout: every partition spans ~the full 0..127 range
    assert(rx0 > 120 && ry0 > 120, s"random layout ($rx0, $ry0)")
    // z-order: 16 partitions of a 128x128 grid are ~32x32 to 64x64
    // blocks — BOTH dimensions shrink far below the full range
    assert(rx1 < 70 && ry1 < 70, s"z-order layout ($rx1, $ry1)")
    // a plain sort by x would leave y unclustered (~full range): prove
    // z-order beats it on the non-leading dimension
    val (_, rySort) = avgRanges(
      grid.repartitionByRange(16, $"x").sortWithinPartitions($"x"))
    assert(rySort > 120, s"sort-by-x y-range $rySort")
  }

  test("zorder is a bijection on the masked domain") {
    // 64x64 grid with 6-bit interleave: all 4096 z values distinct and
    // exactly covering [0, 4096)
    val n = spark.range(64L * 64L).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val zs = n.select(Layout.zorder(6, $"x", $"y").as("z"))
    assert(zs.distinct().count() == 4096L)
    val mm = zs.agg(min("z"), max("z")).as[(Long, Long)].head()
    assert(mm == ((0L, 4095L)))
  }

  test("z_order is callable from SQL") {
    graft.functions.register(spark)
    val got = spark.sql("SELECT z_order(4, 3, 5) AS z").as[Long].head()
    // x=3 -> bits 0,1 at even positions; y=5 -> bits 0,2 at odd: 1+2+4+32
    assert(got == 39L)
    val err = intercept[Exception] {
      spark.sql("SELECT z_order(7)").collect()
    }
    assert(err.getMessage.contains("z_order"))
    // bit-budget misuse is an analysis error, not an internal one
    val over = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT z_order(32, 1, 2, 3)").collect()
    }
    assert(over.getMessage.contains("63"))
  }

  test("zorder matches a model implementation on random 3-column input") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((rnd.nextInt(1 << 10).toLong,
      rnd.nextInt(1 << 10).toLong, rnd.nextInt(1 << 10).toLong))
    def model(x: Long, y: Long, z: Long, bits: Int): Long = {
      var out = 0L
      for (i <- 0 until bits; (v, c) <- Seq((x, 0), (y, 1), (z, 2)))
        out |= (((v & ((1L << bits) - 1)) >> i) & 1L) << (i * 3 + c)
      out
    }
    val got = rows.zipWithIndex
      .map { case ((x, y, z), i) => (i, x, y, z) }
      .toDF("i", "x", "y", "z")
      .select($"i", Layout.zorder(10, $"x", $"y", $"z").as("zv"))
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    assert(got.toSeq == rows.map { case (x, y, z) => model(x, y, z, 10) })
  }

  test("null inputs produce a null z value") {
    val got = Seq((Some(1L), Option.empty[Long]), (Some(1L), Some(1L)))
      .toDF("x", "y")
      .select(Layout.zorder(8, $"x", $"y").as("z"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.contains(None) && got.contains(Some(3L)))
  }
}
