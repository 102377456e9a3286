package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CountMinSketch

/** The Count-Min guarantees the registered `events_cms` contract leans on,
  * checked adversarially: (1) NO estimate ever undercounts, under random
  * streams and random merge trees; (2) the counters are bit-identical
  * across merge orders (elementwise-sum merge — stronger than MG's
  * merge-tolerance); (3) the Catalyst probe expression computes the same
  * hash as the Scala update path. */
class CountMinSketchSuite extends AnyFunSuite {

  private val cms = new CountMinSketch

  private def sketch(items: Seq[Long], splits: Seq[Int]): Array[Long] = {
    val cuts = (0 +: splits.sorted :+ items.length).distinct.sorted
    cuts.zip(cuts.tail)
      .map { case (a, b) => items.slice(a, b).foldLeft(cms.zero)(cms.reduce) }
      .reduceLeft(cms.merge)
  }

  private def estimate(sk: Array[Long], x: Long): Long =
    (0 until CountMinSketch.Depth)
      .map(i => sk(i * CountMinSketch.Width + CountMinSketch.bucket(i, x))).min

  test("no undercount under any partitioning; counters merge-order-exact (ScalaCheck)") {
    val streamGen = for {
      n <- Gen.choose(50, 500)
      // negative and huge keys included: the pmod path must hold for them
      items <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(-5L, 40L), Gen.choose(Long.MinValue, Long.MaxValue)))
      nCuts <- Gen.choose(0, 8)
      cuts <- Gen.listOfN(nCuts, Gen.choose(0, n))
      cuts2 <- Gen.listOfN(nCuts, Gen.choose(0, n))
    } yield (items, cuts, cuts2)
    val prop = Prop.forAll(streamGen) { case (items, cuts, cuts2) =>
      val sk = sketch(items, cuts)
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
      val noUnder = truth.forall { case (x, c) => estimate(sk, x) >= c }
      val orderExact = java.util.Arrays.equals(sk, sketch(items, cuts2))
      noUnder && orderExact
    }
    assert(prop(org.scalacheck.Gen.Parameters.default).success)
  }

  test("Catalyst probe computes the identical hash/estimate as the Scala path") {
    val spark = SparkSpec.session
    import spark.implicits._
    val keys = Seq(0L, 1L, -1L, 7L, 123456789L, Long.MaxValue, Long.MinValue,
      CountMinSketch.P, CountMinSketch.P - 1, -CountMinSketch.P)
    val items = keys.flatMap(k => Seq.fill(3)(k))
    val sk = items.foldLeft(cms.zero)(cms.reduce)
    val got = keys.toDF("k")
      .crossJoin(broadcast(Seq(sk.toSeq).toDF("sk")))
      .select(col("k"), CountMinSketch.probe(col("sk"), col("k")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    keys.foreach { k => assert(got(k) == estimate(sk, k), s"key $k") }
  }
}
