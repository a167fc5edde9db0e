package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-benchmark for the two changelog-join formulations under
  * PER-KEY CHURN — the axis the SF-scaled sweeps cannot exercise (the
  * TPC-H-derived changelogs carry a handful of changes per key at any
  * SF). The relational formulation's per-key join intermediate is
  * O(E·S) in the sides' change counts; the per-key replay is linear.
  * Prints one JSON line per (churn, formulation) with min-of-2 wall
  * seconds and the emitted-row count (identical between formulations
  * by the byte-equality property, asserted here per level).
  *
  * Usage: runMain graft.ChurnBench [keys churn1 churn2 ...]
  * Defaults: 32 keys, churn 256 512 1024 per side per key.
  */
object ChurnBench {

  def main(args: Array[String]): Unit = {
    val keys = if (args.nonEmpty) args(0).toInt else 32
    val churns = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(256, 512, 1024)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").trim.toInt.toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-churn-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // one side's churn stream: per key, `churn` alternating +I/-D
    // changes over 8 rotating contents — live state stays tiny while
    // every change probes and most cross association boundaries
    def side(n: Int, churn: Int, tagBase: Int): DataFrame =
      spark.range(n.toLong * churn).select(
        concat(lit("k"), (col("id") % n).cast("string")).as("key"),
        ((col("id") / n) % 8 + tagBase).cast("int").as("tag"),
        when((col("id") / n / 8) % 2 === 0, "+I").otherwise("-D").as(
          graft.cdc.ChangelogFormats.RowKindCol),
        (col("id") / n).as("seq"))

    churns.foreach { c =>
      val l = side(keys, c, 0).withColumnRenamed("key", "lk")
        .withColumnRenamed("tag", "ltag").withColumnRenamed("seq", "lseq")
        .localCheckpoint(true)
      val r = side(keys, c, 100).withColumnRenamed("key", "rk")
        .withColumnRenamed("tag", "rtag").withColumnRenamed("seq", "rseq")
        .localCheckpoint(true)
      def run(f: () => DataFrame): (Double, Long) = {
        var rows = 0L
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          rows = f().count()
          (System.nanoTime() - t0) / 1e9
        }.min
        (t, rows)
      }
      val (tRel, nRel) = run(() => graft.cdc.ChangelogJoin.updateStream(
        l, r, "lk", "rk", "full", Seq("lseq"), Seq("rseq")))
      val (tRep, nRep) = run(() => graft.cdc.ChangelogJoin.updateStreamReplay(
        l, r, "lk", "rk", "full", Seq("lseq"), Seq("rseq")))
      require(nRel == nRep, s"row-count divergence: $nRel vs $nRep")
      println(f"""{"churn":$c,"keys":$keys,"relational_s":$tRel%.2f,""" +
        f""""replay_s":$tRep%.2f,"rows":$nRel}""")
    }
    spark.stop()
  }
}
