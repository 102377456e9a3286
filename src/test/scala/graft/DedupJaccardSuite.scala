package graft

import org.apache.spark.sql.functions._

import graft.dedup.DedupQueries

/** The prefix-filter similarity join ([[DedupQueries.dedupJaccard]]) claims
  * EXACT recall by construction; MinHash-LSH ([[DedupQueries.dedupNear]])
  * claims it probabilistically (band-miss ≈ 6e-15). Both therefore must
  * produce the identical verified pair set — checking them against each
  * other is an engine-internal oracle parity test, independent of (and
  * cheaper than) the driver's DuckDB brute-force compare. */
class DedupJaccardSuite extends SparkSpec {

  test("dedup_jaccard: pair set identical to dedup_near on the same corpus") {
    val jac = DedupQueries.dedupJaccard(spark, Sf0001)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 9).as("j"))
    val lsh = DedupQueries.dedupNear(spark, Sf0001)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 9).as("j"))
    val onlyJac = jac.exceptAll(lsh).count()
    val onlyLsh = lsh.exceptAll(jac).count()
    Caches.drain()
    assert(onlyJac == 0 && onlyLsh == 0,
      s"pair sets diverge: $onlyJac only in prefix-filter, $onlyLsh only in LSH")
  }

  test("dedup_jaccard ≡ dedup_near at sf0.1: MinHash banding re-validated at 10× corpus") {
    // The strongest scale re-validation available: the prefix-filter join's
    // recall is exact BY CONSTRUCTION, so any pair it finds that LSH lost
    // is a real band-miss — the (1-0.8²)³² ≈ 6e-15 claim checked against
    // 5,000 documents instead of the 500 the driver's oracle covers.
    val sf01 = "/root/testdata/sf0.1"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sf01)), s"$sf01 not present")
    val jac = DedupQueries.dedupJaccard(spark, sf01).select(col("doc_a"), col("doc_b"))
    val lsh = DedupQueries.dedupNear(spark, sf01).select(col("doc_a"), col("doc_b"))
    val missedByLsh = jac.exceptAll(lsh).count()
    val phantomInLsh = lsh.exceptAll(jac).count()
    Caches.drain()
    assert(missedByLsh == 0, s"MinHash bands missed $missedByLsh true pairs at sf0.1")
    assert(phantomInLsh == 0, s"$phantomInLsh LSH pairs escaped exact verification")
  }

  test("dedup_jaccard: nonempty, ordered pairs, threshold respected") {
    val rows = DedupQueries.dedupJaccard(spark, Sf0001)
      .select(col("doc_a"), col("doc_b"), col("jaccard")).collect()
    Caches.drain()
    assert(rows.nonEmpty, "fixture corpus contains near-duplicates; none found")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), s"unordered pair $r")
      assert(r.getDouble(2) >= 0.8, s"below-threshold pair survived verification: $r")
    }
  }
  test("dedup_threshold_curve: monotone in threshold; 0.8 point matches dedup_near") {
    val curve = DedupQueries.dedupThresholdCurve(spark, Sf0001)
      .orderBy(col("threshold")).collect()
    val nearPairs = DedupQueries.dedupNear(spark, Sf0001).count()
    Caches.drain()
    assert(curve.length == 5, s"expected 5 curve points, got ${curve.length}")
    val pairs = curve.map(_.getAs[Long]("n_pairs"))
    val docs = curve.map(_.getAs[Long]("n_dup_docs"))
    assert(pairs.zip(pairs.tail).forall { case (lo, hi) => lo >= hi },
      s"pair count must be non-increasing in threshold: ${pairs.mkString(",")}")
    assert(docs.zip(docs.tail).forall { case (lo, hi) => lo >= hi },
      s"dup-doc count must be non-increasing in threshold: ${docs.mkString(",")}")
    // cross-path consistency: the curve's t=0.8 point re-derives the LSH
    // operator's verified pair count through a DIFFERENT candidate pipeline
    val at08 = curve.find(r => r.getAs[Double]("threshold") == 0.8).get
    assert(at08.getAs[Long]("n_pairs") == nearPairs,
      s"curve@0.8 = ${at08.getAs[Long]("n_pairs")} but dedup_near found $nearPairs")
    // every pair touches >= 2 docs, and a doc can pair with many: bounds
    curve.filter(_.getAs[Long]("n_pairs") > 0).foreach { r =>
      val (p, d) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_dup_docs"))
      assert(d >= 2 && d <= 2 * p, s"doc count $d impossible for $p pairs")
    }
  }
  test("generalized PPJoin: engine pairs == brute force at 5 thresholds over a seeded corpus") {
    import spark.implicits._
    // seeded synthetic corpus engineered for MID-similarity pairs: mutate
    // random positions of base docs so exact Jaccards spread across (0, 1)
    val rnd = new scala.util.Random(42)
    val vocab = Vector.tabulate(30)(i => ("word" + ('a' + i % 26).toChar) * (1 + i / 26))
    def doc(): Array[String] = Array.fill(15 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
    val bases = Vector.fill(12)(doc())
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    var id = 0L
    bases.foreach { b =>
      docs += ((id, b.mkString(" "))); id += 1
      (1 to 2).foreach { _ =>
        val v = b.clone()
        val muts = 1 + rnd.nextInt(v.length / 2)
        (1 to muts).foreach(_ => v(rnd.nextInt(v.length)) = vocab(rnd.nextInt(vocab.size)))
        docs += ((id, v.mkString(" "))); id += 1
      }
    }
    def shingles(text: String): Set[String] = {
      val t = text.split("[^\\p{L}]+").filter(_.nonEmpty)
      if (t.length < 3) Set.empty
      else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
    }
    val sets = docs.map { case (i, t) => i -> shingles(t) }.filter(_._2.nonEmpty).toMap
    val df = docs.toSeq.toDF("doc_id", "text")
    for ((num, den) <- Seq((1, 2), (3, 5), (7, 10), (4, 5), (9, 10))) {
      val expect = (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = (sets(a) & sets(b)).size; uni = (sets(a) | sets(b)).size
        if inter.toLong * den >= uni.toLong * num
      } yield (a, b)).toSet
      val got = DedupQueries.jaccardPairsAtLeastOn(df, num, den)
        .select(col("doc_a"), col("doc_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      Caches.drain()
      assert(got == expect,
        s"t=$num/$den: engine ${got.size} pairs vs brute ${expect.size}; " +
          s"missing=${(expect -- got).take(3)} phantom=${(got -- expect).take(3)}")
    }
  }
}
