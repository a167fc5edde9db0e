package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixed-point ridge classifier (QualityClassifier): learns a
  * linearly-separable presence rule from planted docs, beats the
  * majority baseline on the real documents table, and the score is a
  * pure zero-shuffle projection. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("learns a planted separable rule (good-marker AND NOT bad-marker)") {
    // 40 docs over a tiny vocabulary; label = contains 'alpha' and not
    // 'omega'. Filler words vary so no feature is constant.
    val rng = new scala.util.Random(7)
    val fillers = Seq("foo", "bar", "baz", "qux", "zap")
    val docs = (0 until 40).map { i =>
      val hasAlpha = i % 2 == 0
      val hasOmega = i % 4 == 1 || i % 8 == 2
      val words = Seq.fill(6)(fillers(rng.nextInt(fillers.size))) ++
        (if (hasAlpha) Seq("alpha") else Nil) ++
        (if (hasOmega) Seq("omega") else Nil)
      val y = if (hasAlpha && !hasOmega) 1L else -1L
      (i.toLong, rng.shuffle(words).mkString(" "), y)
    }.toDF("doc_id", "text", "y")
    val m = QualityClassifier.fitExact(docs, "text", "y",
      dim = 32, iters = 160, etaShift = 4)
    val scored = docs.withColumn("s", QualityClassifier.score(col("text"), m))
    val wrong = scored.filter((col("s") > 0) =!= (col("y") === 1L)).count()
    assert(wrong === 0L, s"separable rule must be learned exactly; " +
      s"misclassified $wrong of 40")
  }

  test("beats the majority baseline on the documents table (distilled rule)") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .withColumn("words", split(col("text"), " "))
      .withColumn("y", when(array_contains(col("words"), "spark") &&
        !array_contains(col("words"), "slow"), 1L).otherwise(-1L))
    val n = docs.count().toDouble
    val pos = docs.filter(col("y") === 1L).count().toDouble
    val majority = math.max(pos, n - pos) / n
    val m = QualityClassifier.fitExact(docs, "text", "y",
      dim = 32, iters = 160, etaShift = 4)
    val acc = docs
      .withColumn("s", QualityClassifier.score(col("text"), m))
      .filter((col("s") > 0) === (col("y") === 1L)).count() / n
    assert(acc > majority + 0.05,
      s"accuracy $acc must beat majority $majority by > 5 points")
    assert(acc >= 0.9, s"accuracy $acc below the 0.9 floor")
  }

  test("scoring is a zero-shuffle projection (weights ride as literals)") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val m = QualityClassifier.Model(
      Array.fill(33)(1L), dim = 32, scale = 1L << 20)
    val plan = docs.select(QualityClassifier.score(col("text"), m))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("dim must be a power of two (signed/unsigned bucket parity)") {
    intercept[IllegalArgumentException] {
      QualityClassifier.featurize(col("text"), 24)
    }
  }
}
