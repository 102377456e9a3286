package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** The native `sorted_intersect` expression vs the built-in
  * `array_intersect` on its contract domain (sorted, duplicate-free bigint
  * arrays) — same result set, via Spark, under random inputs. */
class SortedIntersectSuite extends AnyFunSuite {

  test("sorted_intersect ≡ array_intersect on sorted distinct arrays (ScalaCheck)") {
    val spark = SparkSpec.session
    import spark.implicits._
    val arrGen = Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted)
    val caseGen = Gen.listOfN(60, Gen.zip(arrGen, arrGen))
    val prop = Prop.forAll(caseGen) { cases =>
      val df = cases.toDF("a", "b")
        .select(
          expr("sorted_intersect(a, b)").as("fast"),
          array_intersect(col("a"), col("b")).as("ref"))
        .collect()
      df.forall(r => r.getSeq[Long](0).sorted == r.getSeq[Long](1).sorted)
    }
    assert(prop(org.scalacheck.Gen.Parameters.default).success)
  }

  test("empty and null inputs") {
    val spark = SparkSpec.session
    import spark.implicits._
    val out = Seq((Seq(1L, 2L), Seq.empty[Long]))
      .toDF("a", "b")
      .select(
        expr("sorted_intersect(a, b)").as("e1"),
        expr("sorted_intersect(a, CAST(NULL AS ARRAY<BIGINT>))").as("e2"))
      .collect().head
    assert(out.getSeq[Long](0).isEmpty)
    assert(out.isNullAt(1))
  }
}
