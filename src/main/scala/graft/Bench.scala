package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry point (driver contract): times every benchable query
  * from the Registry at SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  * Results are forced through the noop sink so the full plan executes
  * (a bare count() would let Catalyst prune columns and skip work).
  *
  * Output discipline: the JSON line is kept short (3-decimal times, no
  * spaces) and printed as the LAST stdout line so a tail-capture can't
  * truncate it; the same JSON is also written to BENCH_QUERIES.json next
  * to the working directory as a durable copy. A query that throws is
  * recorded as -1 and listed under "failed" — a broken query must never
  * masquerade as a fast measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional args: bench only the named queries (local iteration aid)
    val benchable0 = Registry.all.filter(_.bench)
    val benchable = if (args.nonEmpty) benchable0.filter(q => args.contains(q.name))
      else benchable0
    // one warm-up pass of the catalog read path so first-query JIT /
    // file-listing cost doesn't pollute the first measurement
    graft.core.Tables.names.foreach { n =>
      graft.core.Tables.load(spark, sfDir, n).count()
    }
    // two timed runs, report the min — strips JIT/GC warm-up noise from
    // the per-query numbers without changing what is measured
    def time(q: QueryDef): Double = {
      val t0 = System.nanoTime()
      try {
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        -1.0
      }
    }
    val results = benchable.map { q =>
      val a = time(q)
      val b = time(q)
      q.name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // durable copy in case stdout capture truncates the tail
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_QUERIES.json"),
        line.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
    println(line)
  }
}
