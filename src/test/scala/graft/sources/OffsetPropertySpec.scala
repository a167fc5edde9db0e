package graft.sources

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip properties for the hand-rolled offset JSON codecs — a
  * checkpoint written by one run must deserialize bit-identically in
  * the next (restart correctness lives or dies on this). Generators
  * stay inside the character sets the sources enforce at admission
  * time (file names: digits-prefix, no quote/comma/brace; split
  * names: [A-Za-z0-9_-]). */
class OffsetPropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val fileName: Gen[String] = for {
    ts <- Gen.choose(0L, 4102444800000L)
    suffix <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(12).mkString)
  } yield s"$ts-$suffix.csv"

  private val hwGen: Gen[Long] =
    Gen.oneOf(Gen.const(Long.MinValue), Gen.choose(0L, 4102444800000L))

  private val splitName: Gen[String] = for {
    head <- Gen.alphaNumChar
    tail <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('_', '-')))
  } yield (head :: tail.take(10)).mkString

  test("AlignedOffset json round-trips (hw + files)") {
    check(Prop.forAll(hwGen, Gen.listOf(fileName)) {
      (hw: Long, files: List[String]) =>
        val o = AlignedOffset(hw, files.distinct.sorted)
        AlignedOffset.fromJson(o.json()) == o
    })
  }

  test("AlignedOffset still reads legacy plain-array checkpoints") {
    check(Prop.forAll(Gen.listOf(fileName)) { files: List[String] =>
      val legacy = files.distinct.sorted
        .map(f => "\"" + f + "\"").mkString("[", ",", "]")
      AlignedOffset.fromJson(legacy) ==
        AlignedOffset(Long.MinValue, files.distinct.sorted)
    })
  }

  test("a split literally named \"hw\" round-trips (parser must scope the field key)") {
    // regression: the field search used to scan the whole entry, so a
    // split NAME of "hw" hijacked the "hw": key lookup
    val o = SplitOffset(Map(
      "hw" -> (0L, Seq.empty),
      "files" -> (Long.MinValue, Seq("123-a.csv")),
      "normal" -> (42L, Seq("456-b.csv", "789-c.csv"))))
    assert(SplitOffset.fromJson(o.json()) == o)
  }

  test("SplitOffset json round-trips (per-split hw + files)") {
    val splitEntry = for {
      name <- splitName
      hw <- hwGen
      files <- Gen.listOf(fileName)
    } yield name -> (hw, files.distinct.sorted)
    check(Prop.forAll(Gen.listOf(splitEntry)) {
      entries: List[(String, (Long, Seq[String]))] =>
        val o = SplitOffset(entries.toMap)
        SplitOffset.fromJson(o.json()) == o
    })
  }
}
