package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Measurement aid (optimization guide §1): per-query job/stage
  * breakdown for the bench queries. For each named query, runs the same
  * noop-sink action Bench times and reports, per Spark job: wall
  * duration, stage count, task count, shuffle read/write bytes — plus
  * the PRE-EXECUTION gap (analysis/optimization/codegen before the
  * first task launches). This is the empirical half of the guide's
  * measure-first loop in an environment with no Spark UI.
  *
  * Usage: runMain graft.Profile <sfDir> <query> [query ...]
  * Not part of the driver bench contract — a diagnostic main only.
  */
object Profile {

  private final class Agg extends SparkListener {
    final case class StageRow(id: Int, name: String, tasks: Int,
        var runMs: Long = 0L, var shufReadB: Long = 0L,
        var shufWriteB: Long = 0L, var inputB: Long = 0L,
        var spillB: Long = 0L, var submitted: Long = 0L,
        var completed: Long = 0L)
    val stages = mutable.Map.empty[Int, StageRow]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, Long, Seq[Int])]
    private val jobStart = mutable.Map.empty[Int, (Long, Seq[Int])]

    override def onJobStart(e: SparkListenerJobStart): Unit =
      jobStart(e.jobId) = (e.time, e.stageIds)
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobStart.remove(e.jobId).foreach { case (t0, sids) =>
        jobs += ((e.jobId, t0, e.time, sids))
      }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val r = stages.getOrElseUpdate(si.stageId,
        StageRow(si.stageId, si.name.takeWhile(_ != '\n'), si.numTasks))
      r.submitted = si.submissionTime.getOrElse(0L)
      r.completed = si.completionTime.getOrElse(0L)
      val m = si.taskMetrics
      if (m != null) {
        r.runMs = m.executorRunTime
        r.shufReadB = m.shuffleReadMetrics.totalBytesRead
        r.shufWriteB = m.shuffleWriteMetrics.bytesWritten
        r.inputB = m.inputMetrics.bytesRead
        r.spillB = m.diskBytesSpilled
      }
    }
    def reset(): Unit = { stages.clear(); jobs.clear(); jobStart.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: Profile <sfDir> <query> [query ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").trim.toInt.toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    graft.core.Tables.names.foreach(n =>
      graft.core.Tables.load(spark, sfDir, n).count())

    names.foreach { name =>
      val q = Registry.byName(name)
      def once(report: Boolean): Double = {
        agg.reset()
        spark.sparkContext.setJobDescription(s"profile:$name")
        val t0ms = System.currentTimeMillis()
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let the listener bus drain
        if (report) {
          println(f"\n===== $name%s  wall=${wall}%.3f s =====")
          val jobsSorted = agg.jobs.sortBy(_._2)
          val firstJob = jobsSorted.headOption.map(_._2).getOrElse(t0ms)
          println(f"  pre-first-job (plan/codegen): ${(firstJob - t0ms)}%d ms; jobs: ${jobsSorted.size}%d")
          jobsSorted.foreach { case (jid, s, e, sids) =>
            val rows = sids.flatMap(agg.stages.get)
            val tasks = rows.map(_.tasks).sum
            val sched = rows.map(r => r.completed - r.submitted).sum
            println(f"  job $jid%3d ${e - s}%6d ms  stages=${sids.size}%2d tasks=$tasks%4d " +
              f"stageWall=$sched%6d ms run=${rows.map(_.runMs).sum}%6d ms " +
              f"in=${rows.map(_.inputB).sum / 1024}%8d KiB " +
              f"sr=${rows.map(_.shufReadB).sum / 1024}%7d KiB " +
              f"sw=${rows.map(_.shufWriteB).sum / 1024}%7d KiB" +
              (if (rows.map(_.spillB).sum > 0) f" SPILL=${rows.map(_.spillB).sum / 1024} KiB" else ""))
          }
          // gaps between consecutive jobs = driver-side work between actions
          val gaps: Long = jobsSorted.toSeq.sliding(2).map {
            case Seq(a, b) => math.max(0L, b._2 - a._3)
            case _ => 0L
          }.sum
          println(f"  inter-job driver gaps: $gaps%d ms")
        }
        wall
      }
      once(report = false) // warm-up: codegen cache, JIT
      once(report = true)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(
        _.unpersist(blocking = false))
    }
    spark.stop()
  }
}
