package graft.api

import graft.SparkSpec
import graft.operators.{AsyncIO, LookupJoin}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.concurrent.Future
import scala.concurrent.duration._

class FacadeSpec extends SparkSpec {
  import spark.implicits._

  test("TableEnv: createTable + from + executeSql + fromValues") {
    val env = TableEnv(spark)
    env.createTable("te_nation",
      TableSpec(s"$sfDir/nation.parquet", watermark = None,
        primaryKey = Seq("n_nationkey")))
    assert(env.from("te_nation").count() == 25)
    assert(env.executeSql(
      "SELECT count(*) AS n FROM te_nation WHERE n_regionkey = 0")
      .collect().head.getLong(0) > 0)
    assert(env.tableSpec("te_nation").get.primaryKey == Seq("n_nationkey"))
    val vals = env.fromValues(
      new StructType().add("x", IntegerType).add("s", StringType),
      Seq(Row(1, "a"), Row(2, "b")))
    assert(vals.count() == 2)
    // custom functions visible through executeSql
    assert(env.executeSql("SELECT split_index('a,b', ',', 1) AS v")
      .collect().head.getString(0) == "b")
  }

  test("StreamEnv: fromElements, fromSequence, sideOutputs") {
    val env = StreamEnv(spark)
    assert(env.fromElements(1, 2, 3).collect().toSeq == Seq(1, 2, 3))
    assert(env.fromSequence(1, 5).count() == 5)
    val outs = env.sideOutputs(
      env.fromElements(("a", 1), ("b", 2), ("a", 3)).toDF("tag", "v"),
      org.apache.spark.sql.functions.col("tag"), Seq("a", "b"))
    assert(outs("a").count() == 2 && outs("b").count() == 1)
  }

  test("LookupJoin.perPartition caches lookups per partition") {
    val counter = new java.util.concurrent.atomic.AtomicInteger()
    val fn = new LookupJoin.LookupFn[Long, String] {
      def lookup(k: Long): Option[String] = {
        LookupCounter.count.incrementAndGet()
        if (k % 2 == 0) Some(s"dim$k") else None
      }
    }
    val ds = spark.range(0, 100).map(i => i % 5) // 5 distinct keys
      .repartition(1)
    LookupCounter.count.set(0)
    val out = LookupJoin.perPartition[Long, Long, String, (Long, String)](
      ds, identity, fn, (k, v) => (k, v.getOrElse("none")),
      cacheSize = 100)
    val rows = out.collect()
    assert(rows.length == 100)
    assert(rows.filter(_._1 == 2).forall(_._2 == "dim2"))
    assert(rows.filter(_._1 == 1).forall(_._2 == "none"))
  }

  test("AsyncIO.orderedWait preserves input order") {
    val ds = spark.range(0, 50).map(_.toLong).repartition(1)
    val out = AsyncIO.orderedWait[Long, Long](ds, capacity = 8,
      timeout = 30.seconds) { (x, ec) =>
      Future {
        // reverse-ordered latency: later elements finish first
        Thread.sleep((50 - x) % 7)
        x * 2
      }(ec)
    }
    assert(out.collect().toSeq == (0L until 50L).map(_ * 2))
  }

  test("AsyncIO.unorderedWait returns all results") {
    val ds = spark.range(0, 30).map(_.toLong).repartition(2)
    val out = AsyncIO.unorderedWait[Long, Long](ds, capacity = 4,
      timeout = 30.seconds) { (x, ec) => Future(x + 1)(ec) }
    assert(out.collect().sorted.toSeq == (1L to 30L))
  }
}

object LookupCounter {
  val count = new java.util.concurrent.atomic.AtomicInteger()
}
