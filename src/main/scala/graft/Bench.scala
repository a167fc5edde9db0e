package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry point (driver contract): times every benchable query
  * from the Registry at SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  * Results are forced through the noop sink so the full plan executes
  * (a bare count() would let Catalyst prune columns and skip work).
  *
  * Output discipline: rounds 1 and 2 both produced `parsed: null` in the
  * driver's BENCH_r{N}.json because the all-queries JSON line (~3 KB for
  * 100+ queries) overflowed the driver's captured stdout tail. So the
  * stdout line now carries only a HEADLINE subset (one representative
  * query per operator family, ~20 entries, well under the capture
  * window) plus the total; the complete per-query map is written to
  * BENCH_QUERIES.json as the durable full record. A query that throws is
  * recorded as -1 and listed under "failed" — a broken query must never
  * masquerade as a fast measurement.
  */
object Bench {

  /** Child-JVM re-exec at the pinned 8 GiB measurement heap: same
    * java binary, same classpath, the parent's JVM flags minus its
    * heap settings (keeps the JDK17 --add-opens module flags sbt
    * injected), stdio inherited so the JSON line still lands on the
    * caller's stdout. Marked with -Dgraft.bench.reexeced so a
    * misconfigured child can never recurse. */
  private def reexecAtReferenceHeap(args: Array[String]): Int = {
    import scala.jdk.CollectionConverters._
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val inherited = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala
      .filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms") ||
        a.startsWith("-Xss") || a.startsWith("-XX:MaxRAMPercentage"))
    val cmd = Seq(javaBin) ++ inherited ++ Seq(
      "-Xmx8g", "-Dgraft.bench.reexeced=true",
      "-cp", System.getProperty("java.class.path"),
      "graft.Bench") ++ args
    new ProcessBuilder(cmd.asJava).inheritIO().start().waitFor()
  }

  /** One representative per operator family — kept small on purpose so
    * the stdout JSON line survives tail capture. */
  val headline: Seq[String] = Seq(
    "q1_agg", "q_agg_percentile", "q_join_multi", "q_join_nonequi",
    "q_asof_join_planned", "q_interval_join", "q_window_join",
    "q_over_rows", "q_rank_topn", "q_tumble", "q_session",
    "q_union_all", "q_calc", "q_func_string", "q_cdc_debezium",
    "q_cep_strict", "q_match_recognize", "q_udagg_weighted_avg",
    "q_dedup_exact", "q_minhash_lsh", "q_ann_ivf", "q_embed_neardup_lsh",
    "q_text_stats", "q_multimodal", "q_tpch_q5", "q_tpch_q21", "q_kmeans",
    "q_cdc_join_infer", "q_tpcds_s67")
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // numeric-validated (toInt throws early): these values are
    // interpolated into the durable JSON record — a non-numeric env
    // override would silently corrupt the bench line
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").trim.toInt.toString
    // shuffle partitions default to the core count (the driver-record
    // setting); scale sweeps above sf0.1 override this the way a real
    // cluster sizes partitions with the data — the value is recorded
    // in the JSON line so no two runs are silently incomparable
    val shuffleParts =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus).trim.toInt.toString
    // Measurement-environment pinning (round-6/7 verdicts): heap size
    // alone moves the same query up to 7× at local[32] (GC geometry),
    // so a timing is only comparable to another timing AT THE SAME
    // HEAP — and the round-7 DRIVER record ran at 95.5 GiB
    // (heap_ok:false), putting a ~1.3× phantom inflation on every
    // cross-round comparison. So an off-heap run no longer just warns:
    // it RE-EXECS itself in a child JVM pinned to -Xmx8g (classpath and
    // module flags inherited), making the official record always
    // reference-heap without driver cooperation. SPARK_GRAFT_NO_REEXEC
    // opts out for deliberate off-heap measurements (scale sweeps).
    val refHeap = 8L << 30
    def heapWithin(bytes: Long): Boolean =
      bytes >= (refHeap * 3 / 4) && bytes <= (refHeap * 3 / 2)
    if (!heapWithin(Runtime.getRuntime.maxMemory) &&
        !sys.env.contains("SPARK_GRAFT_NO_REEXEC") &&
        !sys.props.contains("graft.bench.reexeced")) {
      System.err.println(
        s"[bench] heap ${Runtime.getRuntime.maxMemory >> 20} MiB is " +
          "outside the 8 GiB reference window — re-execing at -Xmx8g")
      sys.exit(reexecAtReferenceHeap(args))
    }
    val heapBytes = Runtime.getRuntime.maxMemory
    val heapOk = heapWithin(heapBytes)
    val jvm = System.getProperty("java.version", "?")
    if (!heapOk) System.err.println(
      s"[bench] WARNING: heap ${heapBytes >> 20} MiB is outside the 8 GiB " +
        "reference window — timings are NOT comparable to same-query runs " +
        "at the reference heap (set SPARK_DRIVER_MEM=8g)")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
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
    // Reset executor memory state between queries: iterative operators
    // (k-means, graph loops, Drift, BM25 …) localCheckpoint RDDs that
    // stay cached until GC; across a 400-execution single JVM they
    // evict later queries' working set and inflated the round-5 driver
    // record 3-8× on the heavy tail vs fresh-JVM runs. The warmed table
    // reads are plain parquet scans (never .cache()d), so clearing here
    // does not undo the warm-up above.
    def resetState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(
        _.unpersist(blocking = false))
    }
    val results = benchable.map { q =>
      val a = time(q); resetState()
      val b = time(q); resetState()
      q.name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def toJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val headlineSet = headline.toSet
    val shortQs = toJson(results.filter(r => headlineSet.contains(r._1)))
    val env =
      s""""heap_bytes":$heapBytes,"heap_ok":$heapOk,"jvm":"$jvm","cpus":$cpus,"shuffle_partitions":$shuffleParts"""
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},$env,"queries":$shortQs,"failed":$failed,"sf":"$sfDir","detail":"BENCH_QUERIES.json"}"""
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$env,"queries":${toJson(results)},"failed":$failed,"sf":"$sfDir"}"""
    // complete per-query record — stdout only gets the short line.
    // Arg-filtered iteration runs must NOT clobber the durable full
    // record with a subset snapshot.
    if (args.isEmpty) try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_QUERIES.json"),
        fullLine.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    else println(s"""{"subset":${toJson(results)}}""")
    spark.stop()
    println(line)
  }
}
