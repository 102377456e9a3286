package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGries

/** The Misra-Gries guarantee, checked adversarially and WITHOUT Spark:
  * fold random streams through random merge trees and assert every item
  * with true frequency > n/(k+1) survives — the exact property the
  * registered `word_heavy_hitters` contract leans on. */
class MisraGriesSuite extends AnyFunSuite {

  private val mg = new MisraGries(9) // k=9 → guarantee at freq > n/10

  private def summarize(items: Seq[String], splits: Seq[Int]): Map[String, Long] = {
    // partition the stream at the given cut points, reduce each slice,
    // then merge left-to-right — a random merge tree shape
    val cuts = (0 +: splits.sorted :+ items.length).distinct.sorted
    cuts.zip(cuts.tail)
      .map { case (a, b) => items.slice(a, b).foldLeft(mg.zero)(mg.reduce) }
      .reduceLeft(mg.merge)
      .effective
  }

  test("every item above n/(k+1) survives any partitioning (ScalaCheck)") {
    val itemGen = Gen.frequency(
      (50, Gen.const("hot")), (20, Gen.const("warm")),
      (30, Gen.oneOf((1 to 40).map("cold" + _))))
    val streamGen = for {
      n <- Gen.choose(50, 400)
      items <- Gen.listOfN(n, itemGen)
      nCuts <- Gen.choose(0, 8)
      cuts <- Gen.listOfN(nCuts, Gen.choose(0, n))
    } yield (items, cuts)
    val prop = Prop.forAll(streamGen) { case (items, cuts) =>
      val n = items.length
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
      val found = summarize(items, cuts).keySet
      truth.filter { case (_, c) => c * 10 > n }.keys.forall(found.contains)
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(300).withInitialSeed(Seed(42L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("undercount is bounded by n/(k+1) on the worst-case all-distinct tail") {
    // 20 "hot" then 81 distinct singletons: n=101, bound = 10 (k=9) —
    // hot's counter must retain at least 20 - 10 = 10
    val items = Seq.fill(20)("hot") ++ (1 to 81).map("d" + _)
    val s = summarize(items, Seq(37, 71))
    assert(s.contains("hot"), s"hot evicted: $s")
    assert(s("hot") >= 20L - (items.length / 10 + 1), s"undercount too large: $s")
  }
}
