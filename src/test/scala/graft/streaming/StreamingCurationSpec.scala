package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.{TextAnalysis, TextDedup}

case class StreamDoc(doc_id: Long, text: String)

/** The curation layer on a STREAM: the dedup/quality/decontamination
  * operators are pure projections (or keyed state for dedup), so the
  * same code that curates a 100 TB batch corpus runs incrementally over
  * a document firehose — this spec proves the composition end-to-end in
  * Structured Streaming (the reference's unbounded-pipeline story).
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("streaming curation: dedup keep-first + quality gate + bloom probe") {
    implicit val sq = spark.sqlContext

    // benchmark set known up front: build the bloom ONCE (driver-side
    // blob), probe it inside the streaming projection
    val benchDocs = Seq(
      "held out eval question about spark joins and shuffles today ok fine"
    ).toDF("text")

    val goodText = // passes the quality gate (>=10 words, sane ratios)
      "the quick brown fox jumps over the lazy dog near the river bank"
    val contaminatedText =
      "held out eval question about spark joins and shuffles today ok sure"
    val junkText = "x!! y!! z!!" // fails quality gate (3 words, punct-heavy)

    val in = MemoryStream[StreamDoc]

    // keep-first exact dedup on the normalized text hash (keyed state),
    // then zero-shuffle quality + decontamination projections
    val deduped = StatefulOps.keepFirst[String, StreamDoc](
      in.toDS(), d => TextDedup.normalizedHashString(d.text))
    val curated = deduped.toDF()
      .filter(TextAnalysis.qualityScore(col("text")) >= 0.66)
      .filter(!TextDedup.contaminatedProbe(
        benchDocs, "text", n = 5)(col("text")))

    val q = curated.writeStream.format("memory").queryName("cur")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(StreamDoc(1, goodText), StreamDoc(2, contaminatedText),
        StreamDoc(3, junkText))
      q.processAllAvailable()
      in.addData(StreamDoc(4, goodText), // exact dup of 1: dropped by state
        StreamDoc(5, goodText + " extra")) // new doc: kept
      q.processAllAvailable()
      val ids = spark.table("cur").as[StreamDoc].collect().map(_.doc_id).toSet
      assert(ids == Set(1L, 5L), s"got $ids")
    } finally q.stop()
  }

  test("keepFirst dedup state survives a checkpointed restart") {
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_curation_ckpt").toString
    val in = MemoryStream[StreamDoc]
    // memory sink can't recover from a checkpoint; foreachBatch can
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    def start() = StatefulOps.keepFirst[String, StreamDoc](
        in.toDS(), d => TextDedup.normalizedHashString(d.text))
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamDoc],
          _: Long) =>
        seen.synchronized { seen ++= batch.collect().map(_.doc_id) }; ()
      }.start()

    val q1 = start()
    try {
      in.addData(StreamDoc(1, "alpha beta"), StreamDoc(2, "gamma delta"))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart from the checkpoint: previously-seen texts must STAY
    // deduplicated (state recovered), new text must pass
    val q2 = start()
    try {
      in.addData(StreamDoc(3, "alpha beta"), StreamDoc(4, "epsilon zeta"))
      q2.processAllAvailable()
      val ids = seen.synchronized(seen.toSet)
      assert(ids.contains(4L) && !ids.contains(3L), s"got $ids")
      assert(ids.contains(1L) && ids.contains(2L), s"got $ids")
    } finally q2.stop()
  }

  test("resume-equals-continuous: interrupted curation equals the uninterrupted run") {
    implicit val sq = spark.sqlContext
    // the reference's restore-test claim (RestoreTestBase: plan + state
    // + resume) for a COMPOSED pipeline: run the same dedup → quality →
    // decontamination flow (a) uninterrupted and (b) hard-stopped after
    // every feed and restarted from its checkpoint — the curated output
    // must be identical, with duplicates dropped ACROSS the restart
    // boundary (proof the dedup state, not just the offsets, recovered)
    val benchDocs = Seq(
      "held out eval question about spark joins and shuffles today ok fine"
    ).toDF("text")
    val textA = "the quick brown fox jumps over the lazy dog near the river"
    val textB = "a completely different sentence with plenty of ordinary words inside it"
    val textC = "another fine document holding more than ten reasonable english words here"
    val textD = "final sample text that should sail through every quality gate easily"
    val junk = "x!! y!! z!!"
    val contaminated =
      "held out eval question about spark joins and shuffles today ok sure"
    val feeds = Seq(
      Seq(StreamDoc(1, textA), StreamDoc(2, junk), StreamDoc(3, textB)),
      Seq(StreamDoc(4, textA), // dup of 1 ACROSS the restart
        StreamDoc(5, textC), StreamDoc(8, contaminated)),
      Seq(StreamDoc(6, textB), // dup of 3 across the second restart
        StreamDoc(7, textD)))

    def run(interrupt: Boolean): Set[Long] = {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_resume_ckpt").toString
      val in = MemoryStream[StreamDoc]
      val seen = scala.collection.mutable.ArrayBuffer[Long]()
      def start() = {
        val deduped = StatefulOps.keepFirst[String, StreamDoc](
          in.toDS(), d => TextDedup.normalizedHashString(d.text))
        deduped.toDF()
          .filter(TextAnalysis.qualityScore(col("text")) >= 0.66)
          .filter(!TextDedup.contaminatedProbe(
            benchDocs, "text", n = 5)(col("text")))
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Update())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val ids = batch.select(col("doc_id")).collect().map(_.getLong(0))
            seen.synchronized { seen ++= ids }; ()
          }.start()
      }
      var q = start()
      feeds.foreach { docs =>
        in.addData(docs: _*)
        q.processAllAvailable()
        if (interrupt) { q.stop(); q = start() } // hard stop, cold resume
      }
      q.processAllAvailable(); q.stop()
      seen.synchronized(seen.toSet)
    }

    val continuous = run(interrupt = false)
    val resumed = run(interrupt = true)
    assert(continuous == resumed,
      s"continuous=$continuous resumed=$resumed")
    // and both equal the semantic expectation: junk/contaminated gated,
    // 4 and 6 deduplicated across restarts
    assert(continuous == Set(1L, 3L, 5L, 7L), s"got $continuous")
  }

  test("keepFirst seqFn overload picks the lowest-seq row within a batch") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val out = StatefulOps.keepFirst[String, StreamDoc](
      in.toDS(), d => TextDedup.normalizedHashString(d.text),
      (d: StreamDoc) => d.doc_id)
    val q = out.writeStream.format("memory").queryName("kf_det")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      // same normalized key, one micro-batch: doc 7 must win (min id),
      // regardless of shuffle order
      in.addData(StreamDoc(9, "A  b"), StreamDoc(7, "a B"),
        StreamDoc(8, "a b"))
      q.processAllAvailable()
      val ids = spark.table("kf_det").as[StreamDoc].collect().map(_.doc_id)
      assert(ids.toSeq == Seq(7L))
    } finally q.stop()
  }

  test("streaming gopher gate: the rule projection runs incrementally") {
    implicit val sq = spark.sqlContext
    val keeper = (("the of and that have with " * 10) +
      ("word " * 30)).trim
    val tooShort = "the of and that have with tiny"
    val in = MemoryStream[StreamDoc]
    // gopherRules is a pure per-row projection, so the SAME operator
    // that gates a 100 TB batch corpus drops into readStream unchanged
    val gated = TextAnalysis.gopherRules(in.toDS().toDF(), "doc_id", "text")
      .filter(col("keep"))
    val q = gated.writeStream.format("memory").queryName("gopher_s")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(StreamDoc(1, keeper), StreamDoc(2, tooShort))
      q.processAllAvailable()
      in.addData(StreamDoc(3, keeper))
      q.processAllAvailable()
      val ids = spark.table("gopher_s").select("doc_id").as[Long]
        .collect().toSet
      assert(ids === Set(1L, 3L))
    } finally q.stop()
  }

  test("streaming cluster routing: batch-trained k-means assigns a stream") {
    implicit val sq = spark.sqlContext
    import graft.operators.KMeans
    val corpus = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.1f, 0.1f)),
      (3L, Array(10.0f, 10.0f)), (4L, Array(10.1f, 9.9f))
    ).toDF("vec_id", "embedding")
    val m = KMeans.fit(corpus, "vec_id", "embedding", k = 2, iters = 2)
    val lowC = m.assignments.filter($"vec_id" === 1L).head.getInt(1)
    val highC = m.assignments.filter($"vec_id" === 3L).head.getInt(1)

    val in = MemoryStream[(Long, Array[Float])]
    // assignment is a pure projection (centroids inside the expression)
    // so the trained model routes an unbounded vector stream as-is
    val (cl, dist) = KMeans.assignCols(m, col("_2"))
    val routed = in.toDS().toDF()
      .select(col("_1").as("id"), cl.as("cluster"), dist.as("dist"))
    val q = routed.writeStream.format("memory").queryName("routed")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((100L, Array(0.2f, 0.2f)), (101L, Array(9.5f, 9.5f)))
      q.processAllAvailable()
      val rows = spark.table("routed").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(rows(100L) == lowC && rows(101L) == highC)
    } finally q.stop()
  }

  test("streaming drift monitor: per-batch PSI against a static reference") {
    implicit val sq = spark.sqlContext
    import graft.operators.Drift
    import scala.collection.mutable
    // reference mix: half "en", half "de"
    val ref = (1L to 20L).map(i =>
      (i, if (i <= 10) "en" else "de")).toDF("id", "lang")
    val in = MemoryStream[(Long, String)]
    val seen = mutable.ArrayBuffer.empty[Long] // max psi_term per batch
    // psiTable is a batch aggregate, so the monitor runs per micro-batch
    // via foreachBatch: union(batch, reference) tagged by side
    val q = in.toDS().toDF("id", "lang").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val tagged = batch.withColumn("ina", lit(true))
          .unionByName(ref.withColumn("ina", lit(false)))
        val psi = Drift.psiTable(tagged, col("lang"), col("ina"))
        seen += psi.agg(max(col("psi_term"))).head.getLong(0)
        ()
      }
      .start()
    try {
      // batch 0 matches the reference mix; batch 1 is all-"zh" drift
      in.addData((101L, "en"), (102L, "de"))
      q.processAllAvailable()
      in.addData((201L, "zh"), (202L, "zh"), (203L, "zh"))
      q.processAllAvailable()
      assert(seen.size == 2)
      // the drifted batch's worst bucket term dwarfs the in-mix batch's
      assert(seen(1) > seen(0))
    } finally q.stop()
  }

  test("streaming incremental NEAR-dup: the band index grows per batch, later fuzzy dups drop") {
    implicit val sq = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the " +
      "river bank while birds sing in the tall green trees every morning"
    val fresh = "completely different content about distributed query " +
      "engines shuffling partitioned data across executor nodes at scale"

    val in = MemoryStream[StreamDoc]
    // the corpus band index lives OUTSIDE the query (a table a real
    // pipeline would keep in storage); each micro-batch dedups against
    // it and appends its survivors' bands — the O(batch) incremental
    // contract, no corpus re-scan
    var index = TextDedup.nearDupIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text",
      n = 3, numHashes = 32, bands = 16).localCheckpoint(true)
    val survived = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = in.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamDoc],
          _: Long) =>
        val surv = TextDedup.incrementalNearDup(batch.toDF(), "doc_id",
          "text", index, n = 3, numHashes = 32, bands = 16,
          estThreshold = 0.5)
        survived.synchronized {
          survived ++= surv.select("doc_id").as[Long](
            org.apache.spark.sql.Encoders.scalaLong).collect().sorted }
        index = index.unionByName(TextDedup.nearDupIndex(
          surv.select("doc_id", "text"), "doc_id", "text",
          n = 3, numHashes = 32, bands = 16)).localCheckpoint(true)
        ()
      }.start()
    try {
      in.addData(StreamDoc(1, base), StreamDoc(2, fresh))
      q.processAllAvailable()
      // batch 2: a near-dup of batch-1's base (1-word edit) must drop
      // against the grown index; a new doc survives and is indexed
      in.addData(StreamDoc(3, base.replace("lazy", "sleepy")),
        StreamDoc(4, "tokenizer vocabularies byte pair merges and " +
          "unigram language model pruning for large corpora explained"))
      q.processAllAvailable()
      // batch 3: near-dup of batch-2's survivor also drops
      in.addData(StreamDoc(5, ("tokenizer vocabularies byte pair merges " +
        "and unigram language model pruning for huge corpora explained")))
      q.processAllAvailable()
      assert(survived.synchronized(survived.toSeq) === Seq(1L, 2L, 4L))
    } finally q.stop()
  }

  test("streaming incremental EMBED near-dup: SRP index grows per batch, later vector dups drop") {
    import graft.operators.Similarity
    implicit val sq = spark.sqlContext
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val rnd = new scala.util.Random(13)
    val v = unit(Array.fill(16)(rnd.nextGaussian().toFloat))
    val u = unit(Array.fill(16)(rnd.nextGaussian().toFloat))
    def near(x: Array[Float]) =
      unit(x.map(c => c + 0.01f * rnd.nextGaussian().toFloat))

    val in = MemoryStream[(Long, Array[Float])]
    var index = Similarity.embedNearDupIndex(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
      "embedding", dim = 16, planes = 4, tables = 8).localCheckpoint(true)
    val survived = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = in.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val surv = Similarity.incrementalEmbedNearDup(batch, "vec_id",
          "embedding", index, threshold = 0.95, dim = 16,
          planes = 4, tables = 8)
        survived.synchronized {
          survived ++= surv.select("vec_id").as[Long](
            org.apache.spark.sql.Encoders.scalaLong).collect().sorted }
        index = index.unionByName(Similarity.embedNearDupIndex(
          surv.select("vec_id", "embedding"), "embedding",
          dim = 16, planes = 4, tables = 8)).localCheckpoint(true)
        ()
      }.start()
    try {
      in.addData(1L -> v)
      q.processAllAvailable()
      // batch 2: a perturbation of batch-1's vector drops against the
      // grown index; a fresh vector survives and is indexed
      in.addData(2L -> near(v), 3L -> u)
      q.processAllAvailable()
      // batch 3: near-dup of batch-2's survivor also drops
      in.addData(4L -> near(u))
      q.processAllAvailable()
      assert(survived.synchronized(survived.toSeq) === Seq(1L, 3L))
    } finally q.stop()
  }
}
