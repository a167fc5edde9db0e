package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DataSplitSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (0L until n.toLong).toDF("id")

  test("split is deterministic and invariant under repartitioning") {
    val a = DataSplit.assignSplit(docs(2000), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = DataSplit.assignSplit(docs(2000).repartition(7), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    val c = DataSplit.assignSplit(docs(2000), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == c)
  }

  test("split fractions approximate the requested weights") {
    val counts = DataSplit.assignSplit(docs(20000), "id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") / 20000.0 - 0.80) < 0.02)
    assert(math.abs(counts("val") / 20000.0 - 0.10) < 0.01)
    assert(math.abs(counts("test") / 20000.0 - 0.10) < 0.01)
  }

  test("incremental stability: a grown corpus keeps old assignments") {
    val small = DataSplit.assignSplit(docs(1000), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    val grown = DataSplit.assignSplit(docs(5000), "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    small.foreach { case (id, s) => assert(grown(id) == s) }
  }

  test("different seeds give independent assignments") {
    val a = DataSplit.assignSplit(docs(5000), "id", seed = "expA")
      .filter($"split" === "test").select("id").as[Long].collect().toSet
    val b = DataSplit.assignSplit(docs(5000), "id", seed = "expB")
      .filter($"split" === "test").select("id").as[Long].collect().toSet
    // ~10% each; under independence the overlap is ~1% of the corpus
    val overlap = (a intersect b).size / 5000.0
    assert(overlap < 0.03, s"overlap $overlap suggests correlated seeds")
    assert(a != b)
  }

  test("sampleByHash keeps the requested fraction, deterministically") {
    val s1 = DataSplit.sampleByHash(docs(20000), "id", 500)
      .as[Long].collect().toSet
    val s2 = DataSplit.sampleByHash(docs(20000).repartition(13), "id", 500)
      .as[Long].collect().toSet
    assert(s1 == s2)
    assert(math.abs(s1.size / 20000.0 - 0.05) < 0.01)
    // a wider sample with the same seed is a superset (bucket < pct)
    val s3 = DataSplit.sampleByHash(docs(20000), "id", 1000)
      .as[Long].collect().toSet
    assert(s1.subsetOf(s3))
  }

  test("split is a pure projection — no shuffle in the plan") {
    val plan = DataSplit.assignSplit(docs(100), "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("capPerKey keeps the first K per key and plans a group limit") {
    val df = (0L until 1000L).toDF("id")
      .withColumn("domain", concat(lit("d"), (col("id") % 7).cast("string")))
    val capped = DataSplit.capPerKey(df, "domain", "id", 10)
    val got = capped.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    assert(got.values.forall(_ == 10L))
    // kept rows are exactly the lowest ids of each domain
    val keptD0 = capped.filter($"domain" === "d0").select("id")
      .as[Long].collect().sorted
    assert(keptD0.sameElements((0L until 70L by 7).take(10)))
    // map-side partial limit before the shuffle (WindowGroupLimit)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("Partial"), plan)
    // a caller's own "__rn" column survives the internal window
    val withRn = df.withColumn("__rn", lit(42))
    val kept = DataSplit.capPerKey(withRn, "domain", "id", 3)
    assert(kept.columns.contains("__rn"))
    assert(kept.select("__rn").distinct().as[Int].collect().toSeq == Seq(42))
  }

  test("groupAwareSplit never splits a dedup group across splits") {
    val docs = (0L until 2000L).toDF("id")
      // 200 duplicate groups of 10 members each, varied whitespace/case
      .withColumn("text", concat(lit("Doc  body "), (col("id") % 200).cast("string")))
      .withColumn("gkey", TextDedup.normalizedHash(lower(col("text"))))
    val split = DataSplit.groupAwareSplit(docs, "gkey")
    val straddling = split.groupBy("gkey")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(straddling == 0)
    // all three splits are populated at this group count
    assert(split.select("split").distinct().count() == 3)
  }

  test("tokenBudgetSample: capped keep-all, proportional rates, drops unweighted") {
    val df = (0L until 9000L).toDF("id")
      .withColumn("src", concat(lit("s"), (col("id") % 3).cast("string")))
      .withColumn("tok", lit(10L)) // 30k tokens per source
    // budget 30k, weights 2:1 → s0 alloc 20k (rate 6666bp), s1 alloc 10k
    // (3333bp), s2 unweighted → dropped
    val got = DataSplit.tokenBudgetSample(df, "id", "src", "tok",
        budget = 30000L, weights = Map("s0" -> 2.0, "s1" -> 1.0))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!got.contains("s2"))
    assert(math.abs(got("s0") / 3000.0 - 0.6666) < 0.03)
    assert(math.abs(got("s1") / 3000.0 - 0.3333) < 0.03)
    // a budget above the domain total keeps everything (rate capped)
    val all = DataSplit.tokenBudgetSample(df, "id", "src", "tok",
        budget = 1000000L, weights = Map("s0" -> 1.0))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(all("s0") == 3000L)
  }

  test("mixtureSample hits per-source rates, deterministically") {
    val df = (0L until 30000L).toDF("id")
      .withColumn("src", concat(lit("s"), (col("id") % 3).cast("string")))
    val rates = Map("s0" -> 10000, "s1" -> 2500) // s2 absent -> dropped
    val got = DataSplit.mixtureSample(df, "id", "src", rates)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(got("s0") == 10000L)                       // keep-all is exact
    assert(math.abs(got("s1") / 10000.0 - 0.25) < 0.02)
    assert(!got.contains("s2"))
    val again = DataSplit.mixtureSample(df.repartition(11), "id", "src",
      rates).groupBy("src").count().as[(String, Long)].collect().toMap
    assert(again == got)
  }
}
