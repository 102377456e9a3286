package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions
import graft.similarity.SimilarityQueries

/** Re-validation of the similarity operators' banding/probe claims at
  * sf0.1 (2,000 vectors — 4× the sf0.01 fixture the driver's oracle
  * checks), so constants tuned at one scale can't silently rot as fixtures
  * grow. Ground truth is exact brute force — cheap at this size, which is
  * the point of running it HERE and not at deployment scale.
  *
  * What is (and isn't) asserted: the sf0.1 embeddings are near-random —
  * measured, every threshold pair lies at cosine 0.30–0.70 (θ ≈ 65–72°),
  * and the exact top-10 neighbors of the query vectors sit at 0.30–0.42.
  * At those angles a random hyperplane agrees with probability only
  * ~0.6, so ANY sublinear hyperplane-LSH probe scheme is near-blind — the
  * curse of dimensionality, not a tuning defect, and IVF with 10 semantic
  * cells fares only moderately better. The approximate operators'
  * CONTRACTS are therefore algorithm-mirrored (the driver's oracles
  * reproduce their deterministic candidate predicates), and this suite
  * asserts those contracts exactly at the larger scale, plus absolute
  * recall floors that would catch a real banding regression (a broken
  * signature or probe expansion sends overlap to ~zero, far below the
  * floors). Measured recalls are surfaced with info() so the numbers stay
  * visible in every CI run. */
class SimilarityScaleSuite extends SparkSpec {

  private val Sf01 = "/root/testdata/sf0.1"
  private def available: Boolean = java.nio.file.Files.exists(java.nio.file.Paths.get(Sf01))

  private def pairSet(df: org.apache.spark.sql.DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(col(a), col(b)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("sf0.1: LSH top-k overlaps brute force (regression floor; measured recall surfaced)") {
    assume(available, s"$Sf01 not present")
    val bf = pairSet(SimilarityQueries.topkBruteForce(spark, Sf01), "q_id", "vec_id")
    val lsh = pairSet(SimilarityQueries.topkLsh(spark, Sf01), "q_id", "vec_id")
    Caches.drain()
    val recall = (bf & lsh).size.toDouble / bf.size
    info(f"LSH recall@10 at sf0.1 (near-random fixture, θ≈70°): $recall%.3f")
    assert(recall >= 0.05, f"LSH bucket/probe pipeline broken: recall $recall%.3f")
  }

  test("sf0.1: IVF top-k beats its probed-fraction baseline (nprobe/ncells)") {
    assume(available, s"$Sf01 not present")
    val bf = pairSet(SimilarityQueries.topkBruteForce(spark, Sf01), "q_id", "vec_id")
    val ivf = pairSet(SimilarityQueries.topkIvf(spark, Sf01), "q_id", "vec_id")
    Caches.drain()
    val recall = (bf & ivf).size.toDouble / bf.size
    info(f"IVF recall@10 at sf0.1: $recall%.3f")
    // nprobe=3 of 10 cells scans ~30% of the corpus; on structureless data
    // recall ≈ that fraction. Beating it by margin proves the quantizer
    // captures real cluster structure; falling to it (or below) means cell
    // assignment or probe selection regressed.
    assert(recall >= 0.4, f"IVF recall $recall%.3f no better than random cell scan")
  }

  test("sf0.1: embed_near_pairs matches its banded-candidate contract exactly") {
    assume(available, s"$Sf01 not present")
    val base = Tables.embeddings(spark, Sf01)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    // the documented contract: (a,b) is output iff cosine >= 0.3 AND some
    // 16-bit band of the 64-plane signatures differs in <= 1 bit — rebuild
    // that predicate independently over all 2M ordered pairs
    val sig = base.select(col("vec_id"),
      expr(s"rh_sig(e, ${VectorExpressions.WidePlanes})").as("sig"), col("e"))
    val bandsClose = (0 until 4).map { b =>
      val mask = (1L << 16) - 1
      expr(s"bit_count(((a.sig >> ${b * 16}) & $mask) ^ ((b.sig >> ${b * 16}) & $mask)) <= 1")
    }.reduce(_ || _)
    val contract = sig.as("a").crossJoin(sig.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .filter(bandsClose)
      .filter(expr("cosine_sim(a.e, b.e)") >= 0.3)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
    val want = pairSet(contract, "va", "vb")
    val got = pairSet(SimilarityQueries.nearPairs(spark, Sf01), "vec_a", "vec_b")
    Caches.drain()
    info(s"near-pairs at sf0.1: contract=${want.size} got=${got.size}")
    assert(got == want,
      s"contract divergence: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }
}
