package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** [[ChangelogJoin.updateStreamReplay]] (per-key sequential replay of
  * the streaming join's state machine) must be BYTE-IDENTICAL to
  * [[ChangelogJoin.updateStream]] (the relational all-pairs
  * formulation) — same rows, same kinds, same (__seq, __side, __eidx)
  * total order — so the two are interchangeable wherever a changelog
  * join appears; only the scale shape differs (linear in per-key churn
  * vs O(E·S) join intermediate). */
class ChangelogJoinReplaySpec extends SparkSpec {
  import spark.implicits._

  private val K = ChangelogFormats.RowKindCol

  private def frames(events: Seq[(Int, String, Int, String, Long)])
      : (DataFrame, DataFrame) = (
    events.filter(_._1 == 0)
      .map(e => (e._2, e._3, e._4, e._5)).toDF("lk", "ltag", K, "lseq"),
    events.filter(_._1 == 1)
      .map(e => (e._2, e._3, e._4, e._5)).toDF("rk", "rtag", K, "rseq"))

  /** Total-order dump: every column, ordered by the emission's total
    * order — exact equality catches a wrong kind, payload, multiplicity
    * OR a wrong intra-event position. */
  private def dump(df: DataFrame): Seq[String] =
    df.orderBy(col("__seq_0"), col("__side"), col("__eidx"))
      .collect().map(_.toString).toSeq

  private def bothWays(events: Seq[(Int, String, Int, String, Long)],
      jt: String): (Seq[String], Seq[String]) = {
    val (l, r) = frames(events)
    (dump(ChangelogJoin.updateStream(l, r, "lk", "rk", jt,
        Seq("lseq"), Seq("rseq"))),
      dump(ChangelogJoin.updateStreamReplay(l, r, "lk", "rk", jt,
        Seq("lseq"), Seq("rseq"))))
  }

  test("hand case: outer padding + transitions identical in both forms") {
    val ev = Seq(
      (0, "a", 1, "+I", 1L), // pad (a1, null)
      (1, "a", 7, "+I", 2L), // -U pad, then +I (a1, r7)
      (0, "b", 2, "+I", 3L), // pad (b2, null)
      (1, "a", 7, "-D", 4L), // -D (a1, r7), then +U pad
      (0, "a", 1, "-D", 5L)) // death of a1 (no live right match)
    for (jt <- Seq("inner", "left", "right", "full")) {
      val (rel, rep) = bothWays(ev, jt)
      assert(rel == rep, s"jt=$jt\nrel=$rel\nrep=$rep")
    }
  }

  test("null join keys never match, never associate — pads only") {
    val l = Seq((Option.empty[String], 1, "+I", 1L),
        (Some("a"), 2, "+I", 3L))
      .toDF("lk", "ltag", K, "lseq")
    val r = Seq((Some("a"), 9, "+I", 2L), (Option.empty[String], 8, "+I", 4L))
      .toDF("rk", "rtag", K, "rseq")
    for (jt <- Seq("inner", "left", "right", "full")) {
      val rel = dump(ChangelogJoin.updateStream(l, r, "lk", "rk", jt,
        Seq("lseq"), Seq("rseq")))
      val rep = dump(ChangelogJoin.updateStreamReplay(l, r, "lk", "rk", jt,
        Seq("lseq"), Seq("rseq")))
      assert(rel == rep, s"jt=$jt\nrel=$rel\nrep=$rep")
    }
  }

  test("binary payloads: value equality in the replay multiset") {
    // Array[Byte] payloads compare by reference in Scala — the replay's
    // multiset key must wrap them, or a retraction of byte-equal
    // content would miss its state entry
    val l = Seq((("a"), Array[Byte](1, 2), "+I", 1L),
        (("a"), Array[Byte](1, 2), "-D", 3L))
      .toDF("lk", "lbin", K, "lseq")
    val r = Seq((("a"), 7, "+I", 2L)).toDF("rk", "rtag", K, "rseq")
    def show(df: DataFrame): Seq[String] =
      df.withColumn("lbin", base64(col("lbin")))
        .orderBy(col("__seq_0"), col("__side"), col("__eidx"))
        .collect().map(_.toString).toSeq
    val rel = show(ChangelogJoin.updateStream(l, r, "lk", "rk", "full",
      Seq("lseq"), Seq("rseq")))
    val rep = show(ChangelogJoin.updateStreamReplay(l, r, "lk", "rk", "full",
      Seq("lseq"), Seq("rseq")))
    assert(rel == rep, s"rel=$rel\nrep=$rep")
    // the right row's padding must RETURN after the left content dies —
    // which only happens if the -D found the byte-equal state entry
    assert(rep.last.contains("+U"), rep.toString)
  }

  test("churn-heavy key: long alternating update chain stays identical") {
    // one hot key updated many times on both sides — the shape where
    // the relational form's per-key intermediate is quadratic and the
    // replay is linear; correctness must hold regardless
    val churn = (0 until 120).flatMap { i =>
      val base = i * 4L
      Seq((0, "hot", i % 3, if (i % 2 == 0) "+I" else "-D", base + 1),
        (1, "hot", 10 + i % 2, if (i % 2 == 0) "+I" else "-D", base + 2))
    }
    // keep the stream consistent: alternating +I/-D of the same content
    // is live-safe only per content; rebuild with per-content liveness
    val liveCount = scala.collection.mutable.Map.empty[(Int, Int), Int]
    val ev = churn.flatMap { case (side, k, tag, kind, seq) =>
      val w = if (kind == "-D") -1 else 1
      val n = liveCount.getOrElse((side, tag), 0) + w
      if (n < 0) None
      else { liveCount((side, tag)) = n; Some((side, k, tag, kind, seq)) }
    }
    for (jt <- Seq("inner", "full")) {
      val (rel, rep) = bothWays(ev, jt)
      assert(rel == rep, s"jt=$jt sizes rel=${rel.size} rep=${rep.size}")
      assert(rel.nonEmpty)
    }
  }

  private def check(p: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("property: replay ≡ relational, exactly, all join types") {
    val evGen = for {
      n <- Gen.choose(1, 14)
      evs <- Gen.listOfN(n, Gen.zip(
        Gen.oneOf(0, 1), Gen.oneOf("a", "b"), Gen.choose(1, 3),
        Gen.frequency(3 -> Gen.const("+I"), 1 -> Gen.const("-D"),
          1 -> Gen.const("-U"), 1 -> Gen.const("+U"))))
      jt <- Gen.oneOf("inner", "left", "right", "full")
    } yield (evs, jt)
    check(Prop.forAll(evGen) { case (evs0, jt) =>
      val liveCount = scala.collection.mutable.Map.empty[(Int, String, Int), Int]
      val evs = evs0.zipWithIndex.flatMap { case ((side, k, tag, kind), i) =>
        val id = (side, k, tag)
        val w = if (kind == "-D" || kind == "-U") -1 else 1
        val n = liveCount.getOrElse(id, 0) + w
        if (n < 0) None
        else { liveCount(id) = n; Some((side, k, tag, kind, (i + 1).toLong)) }
      }
      evs.isEmpty || {
        val (rel, rep) = bothWays(evs, jt)
        if (rel != rep) println(s"MISMATCH jt=$jt evs=$evs\nrel=$rel\nrep=$rep")
        rel == rep
      }
    }, n = 12)
  }
}
