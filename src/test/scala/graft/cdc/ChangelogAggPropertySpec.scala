package graft.cdc

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Model-based check of the batch changelog materialization: random
  * +I/-U/+U/-D streams vs a naive signed-multiset model. */
class ChangelogAggPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val opGen = Gen.zip(
    Gen.oneOf("a", "b"),
    Gen.choose(1, 6).map(_.toDouble),
    Gen.oneOf("+I", "+U", "-U", "-D"))
  private val opsGen = Gen.choose(0, 20).flatMap(n => Gen.listOfN(n, opGen))

  private def model(ops: Seq[(String, Double, String)])
      : Map[String, (Long, Double, Double, Double)] =
    ops.groupBy(_._1).flatMap { case (k, rows) =>
      def w(kind: String) = if (kind == "+I" || kind == "+U") 1L else -1L
      val cnt = rows.map(r => w(r._3)).sum
      if (cnt <= 0) None
      else {
        val sum = rows.map(r => w(r._3) * r._2).sum
        val survivors = rows.groupBy(_._2)
          .map { case (v, vs) => v -> vs.map(r => w(r._3)).sum }
          .collect { case (v, net) if net > 0 => v }
        Some(k -> (cnt, sum, survivors.min, survivors.max))
      }
    }

  test("updateStream chained into materialize nets to the direct running state") {
    import org.apache.spark.sql.functions.col
    // only live-state-preserving streams (net count per key stays >= 0
    // at every prefix — guaranteed by generating +I-heavy mixes)
    val posOpGen = Gen.zip(Gen.oneOf("a", "b"),
      Gen.choose(1, 6).map(_.toDouble),
      Gen.frequency(3 -> Gen.const("+I"), 1 -> Gen.const("-D")))
    val posOpsGen = Gen.choose(1, 16).flatMap(n => Gen.listOfN(n, posOpGen))
    check(Prop.forAll(posOpsGen) { ops0 =>
      // drop deletes that would drive a key's running count negative
      val seen = scala.collection.mutable.Map.empty[String, Long]
      val ops = ops0.filter { case (k, _, kind) =>
        val w = if (kind == "-D") -1L else 1L
        val n = seen.getOrElse(k, 0L) + w
        if (n < 0) false else { seen(k) = n; true }
      }
      if (ops.isEmpty) true
      else {
        val df = ops.zipWithIndex
          .map { case ((k, v, kind), i) => (k, v, kind, i) }
          .toDF("k", "v", ChangelogFormats.RowKindCol, "seq")
        val upd = ChangelogAgg.updateStream(df, Seq("k"), "v",
          Seq(col("seq")))
        // stage 2 keyed by the stage-1 key itself: netting the -U/+U
        // pairs must leave exactly the FINAL (cnt, sum) per key
        val got = ChangelogAgg.materialize(
            upd.select(col("k"), col("sum_val").as("s"),
              col(ChangelogFormats.RowKindCol)),
            Seq("k"), "s").collect()
          .map(r => r.getString(0) -> r.getDouble(2)).toMap
        // model: final running sum per key (only keys with live count)
        def w(kind: String) = if (kind == "-D") -1L else 1L
        val want = ops.groupBy(_._1).flatMap { case (k, rows) =>
          val cnt = rows.map(r => w(r._3)).sum
          if (cnt <= 0) None
          else Some(k -> rows.map(r => w(r._3) * r._2).sum)
        }
        if (got != want) println(s"MISMATCH ops=$ops got=$got want=$want")
        got == want
      }
    }, n = 12)
  }

  test("inference-executed upsert compaction equals the net state") {
    import org.apache.spark.sql.functions.col
    // random live-state-preserving changelogs: the DropUpdateBefore
    // path (no -U ever emitted) + keyed-sink last-writer-wins
    // compaction must land on exactly the same per-key (cnt, sum) as
    // the direct net materialization — the semantic claim behind the
    // inference's "a PK sink doesn't need UPDATE_BEFORE" decision
    val posOpGen = Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.choose(1, 6).map(_.toDouble),
      Gen.frequency(3 -> Gen.const("+I"), 1 -> Gen.const("-D")))
    val posOpsGen = Gen.choose(1, 16).flatMap(n => Gen.listOfN(n, posOpGen))
    check(Prop.forAll(posOpsGen) { ops0 =>
      val seen = scala.collection.mutable.Map.empty[String, Long]
      val ops = ops0.filter { case (k, _, kind) =>
        val w = if (kind == "-D") -1L else 1L
        val n = seen.getOrElse(k, 0L) + w
        if (n < 0) false else { seen(k) = n; true }
      }
      if (ops.isEmpty) true
      else {
        val df = ops.zipWithIndex
          .map { case ((k, v, kind), i) => (k, v, kind, i.toLong) }
          .toDF("k", "v", ChangelogFormats.RowKindCol, "seq")
        val plan = ChangelogInference.Sink(
          ChangelogInference.GroupAgg(
            ChangelogInference.Source(df, seqCols = Seq("seq")),
            Seq("k"), "v"),
          primaryKey = Some(Seq("k")))
        val got = ChangelogInference.execute(plan).collect()
          .map(r => r.getString(0) ->
            (r.getLong(r.fieldIndex("cnt")),
              r.getDouble(r.fieldIndex("sum_val")))).toMap
        def w(kind: String) = if (kind == "-D") -1L else 1L
        val want = ops.groupBy(_._1).flatMap { case (k, rows) =>
          val cnt = rows.map(r => w(r._3)).sum
          if (cnt <= 0) None
          else Some(k -> ((cnt, rows.map(r => w(r._3) * r._2).sum)))
        }
        if (got != want) println(s"MISMATCH ops=$ops got=$got want=$want")
        got == want
      }
    }, n = 12)
  }

  test("statement-set branches equal their single-sink runs") {
    import org.apache.spark.sql.functions.col
    // the shared-aggregate rewiring (forced retract + branch-side
    // DropUpdateBefore) must be INVISIBLE per branch: each sink's
    // result equals running that sink alone
    val posOpGen = Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.choose(1, 6).map(_.toDouble),
      Gen.frequency(3 -> Gen.const("+I"), 1 -> Gen.const("-D")))
    val posOpsGen = Gen.choose(1, 14).flatMap(n => Gen.listOfN(n, posOpGen))
    check(Prop.forAll(posOpsGen) { ops0 =>
      val seen = scala.collection.mutable.Map.empty[String, Long]
      val ops = ops0.filter { case (k, _, kind) =>
        val w = if (kind == "-D") -1L else 1L
        val n = seen.getOrElse(k, 0L) + w
        if (n < 0) false else { seen(k) = n; true }
      }
      if (ops.isEmpty) true
      else {
        import ChangelogInference._
        val df = ops.zipWithIndex
          .map { case ((k, v, kind), i) => (k, v, kind, i.toLong) }
          .toDF("k", "v", ChangelogFormats.RowKindCol, "seq")
        def agg() = GroupAgg(Source(df, seqCols = Seq("seq")), Seq("k"), "v")
        val shared = agg()
        val multi = ChangelogInference.execute(Seq(
          Sink(shared, primaryKey = Some(Seq("k"))), Sink(shared)))
        def stateSet(d: org.apache.spark.sql.DataFrame) =
          d.select(col("k"), col("cnt"), col("sum_val"))
            .collect().map(r => (r.getString(0), r.getLong(1),
              r.getDouble(2))).toSet
        def streamSet(d: org.apache.spark.sql.DataFrame) =
          d.select(col("k"), col("cnt"), col("sum_val"),
              col(ChangelogFormats.RowKindCol))
            .collect().map(r => (r.getString(0), r.getLong(1),
              r.getDouble(2), r.getString(3))).toSeq
            .groupBy(identity).view.mapValues(_.size).toMap
        val soloState = ChangelogInference.execute(
          Sink(agg(), primaryKey = Some(Seq("k"))))
        val soloStream = ChangelogInference.execute(Sink(agg()))
        val ok = stateSet(multi(0)) == stateSet(soloState) &&
          streamSet(multi(1)) == streamSet(soloStream)
        if (!ok) println(s"MISMATCH ops=$ops")
        ok
      }
    }, n = 8)
  }

  test("local/global update stream nets like the per-change stream") {
    import org.apache.spark.sql.functions.col
    // the mini-batch local/global split changes emission GRANULARITY
    // (one transition per (key, bucket) instead of per change) but any
    // weight-based consumer must land on the same net: compare a
    // downstream materialize over both streams, across random bucket
    // counts (1 = one giant mini-batch, large = nearly per-change)
    val caseGen = Gen.zip(opsGen, Gen.choose(1, 9))
    check(Prop.forAll(caseGen) { case (ops, buckets) =>
      if (ops.isEmpty) true
      else {
        val df = ops.zipWithIndex
          .map { case ((k, v, kind), i) => (k, v, kind, i.toLong) }
          .toDF("k", "v", ChangelogFormats.RowKindCol, "seq")
        def net(upd: org.apache.spark.sql.DataFrame) =
          ChangelogAgg.materialize(
              upd.select(col("k"), col("sum_val").as("s"),
                col(ChangelogFormats.RowKindCol)),
              Seq("k"), "s").collect()
            .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
            .toMap
        val classic = net(ChangelogAgg.updateStream(df, Seq("k"), "v",
          Seq(col("seq"))))
        val lg = net(ChangelogAgg.updateStreamLocalGlobal(df, Seq("k"),
          "v", Seq(col("seq")), ChangelogFormats.RowKindCol,
          emitUpdateBefore = true, emitSeq = false, localBuckets = buckets))
        if (classic != lg)
          println(s"MISMATCH ops=$ops buckets=$buckets classic=$classic lg=$lg")
        classic == lg
      }
    }, n = 12)
  }

  test("local/global mid-chain inference equals the per-change chain") {
    import org.apache.spark.sql.functions.col
    import ChangelogInference._
    // GroupAgg(localBuckets) feeding a SECOND GroupAgg: the bucketed
    // emissions must telescope so the outer aggregate's compacted
    // state matches the unbucketed chain exactly
    val posOpGen = Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.choose(1, 6).map(_.toDouble),
      Gen.frequency(3 -> Gen.const("+I"), 1 -> Gen.const("-D")))
    val posOpsGen = Gen.choose(1, 16).flatMap(n => Gen.listOfN(n, posOpGen))
    val caseGen = Gen.zip(posOpsGen, Gen.choose(1, 5))
    check(Prop.forAll(caseGen) { case (ops0, buckets) =>
      val seen = scala.collection.mutable.Map.empty[String, Long]
      val ops = ops0.filter { case (k, _, kind) =>
        val w = if (kind == "-D") -1L else 1L
        val n = seen.getOrElse(k, 0L) + w
        if (n < 0) false else { seen(k) = n; true }
      }
      if (ops.isEmpty) true
      else {
        val df = ops.zipWithIndex
          .map { case ((k, v, kind), i) => (k, v, kind, i.toLong) }
          .toDF("k", "v", ChangelogFormats.RowKindCol, "seq")
        def chain(lb: Option[Int]) = ChangelogInference.execute(Sink(
          GroupAgg(
            Calc(
              GroupAgg(Source(df, seqCols = Seq("seq")), Seq("k"), "v", lb),
              d => d.withColumnRenamed("cnt", "n")
                .withColumnRenamed("sum_val", "s")),
            Seq("n"), "s"),
          primaryKey = Some(Seq("n"))))
        def stateSet(d: org.apache.spark.sql.DataFrame) =
          d.collect().map(r => (r.getLong(0),
            r.getLong(r.fieldIndex("cnt")),
            r.getDouble(r.fieldIndex("sum_val")))).toSet
        val ok = stateSet(chain(Some(buckets))) == stateSet(chain(None))
        if (!ok) println(s"MISMATCH ops=$ops buckets=$buckets")
        ok
      }
    }, n = 8)
  }

  test("materialize matches the signed-multiset model") {
    check(Prop.forAll(opsGen) { ops =>
      val df = ops.toDF("k", "v", ChangelogFormats.RowKindCol)
      val got = ChangelogAgg.materialize(df, Seq("k"), "v").collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        .toMap
      val want = model(ops)
      if (got != want) println(s"MISMATCH ops=$ops got=$got want=$want")
      got == want
    }, n = 15)
  }
}
