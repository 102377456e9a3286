package graft

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.core.Tokenizer
import graft.dedup.DedupQueries

/** Exact-substring dedup ([[DedupQueries.dedupSubstring]]): the fingerprint
  * path must equal a plain in-JVM brute-force over gram STRINGS — an
  * engine-internal oracle independent of the driver's DuckDB compare — and
  * the crafted-corpus tests pin the contract's edges (within-document
  * repetition excluded, sub-k documents excluded, coverage interval math). */
class DedupSubstringSuite extends SparkSpec {

  private val K = 50

  /** Letters-only token (the tokenizer splits on digits): `w(pfx, 27)` →
    * `"pfxab"` — distinct per index, safe for crafted corpora. */
  private def w(prefix: String, i: Int): String =
    s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}"

  /** Brute force over gram strings: (doc_id, dup_positions, dup_grams,
    * dup_tokens) for every doc with a k-gram repeated in another doc. */
  private def bruteForce(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, text) =>
      val toks = Tokenizer.letterTokens(text)
      (0 to toks.length - k).map(p => (id, p, toks.slice(p, p + k).mkString(" ")))
    }
    val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size > 1).keySet
    grams.filter(g => dup(g._3)).groupBy(_._1).map { case (id, hits) =>
      val poss = hits.map(_._2).sorted
      val covered = poss.zip(-1L +: poss.map(_.toLong).dropRight(1)).map {
        case (p, prev) => if (prev < 0 || p - prev >= k) k.toLong else p - prev
      }.sum
      id -> (hits.size.toLong, hits.map(_._3).distinct.size.toLong, covered)
    }
  }

  test("dedup_substring equals the in-JVM brute force on the real corpus (sf0.001)") {
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = bruteForce(docs, K)
    val got = DedupQueries.dedupSubstring(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    Caches.drain()
    assert(got == expected, s"mismatch:\n got=$got\n exp=$expected")
    assert(expected.nonEmpty, "fixture corpus contains duplicated 50-token spans; none found")
  }

  test("within-document repetition alone is NOT cross-document duplication") {
    import spark.implicits._
    val span = (1 to K).map(w("tok", _)).mkString(" ")
    // doc 1 repeats the span twice internally; doc 2 is unrelated
    val docs = Seq(
      (1L, s"$span filler $span"),
      (2L, (1 to 120).map(w("other", _)).mkString(" "))).toDF("doc_id", "text")
    assert(DedupQueries.dedupSubstringOn(docs).count() == 0)
    Caches.drain()
  }

  test("documents shorter than the span length never appear") {
    import spark.implicits._
    val short = (1 to K - 1).map(_ => "same").mkString(" ")
    val docs = Seq((1L, short), (2L, short)).toDF("doc_id", "text")
    assert(DedupQueries.dedupSubstringOn(docs).count() == 0)
    Caches.drain()
  }

  test("shared span is found and coverage counts the interval union, not k per window") {
    import spark.implicits._
    val shared = (1 to K + 10).map(w("common", _)).mkString(" ") // 60-token shared span
    val docs = Seq(
      (1L, s"${(1 to 20).map(w("alpha", _)).mkString(" ")} $shared"),
      (2L, s"$shared ${(1 to 20).map(w("beta", _)).mkString(" ")}")).toDF("doc_id", "text")
    val rows = DedupQueries.dedupSubstringOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    Caches.drain()
    // a 60-token shared span has 11 duplicated 50-gram starts in each doc,
    // all distinct grams, covering exactly its 60 tokens
    assert(rows == Map(1L -> ((11L, 11L, 60L)), 2L -> ((11L, 11L, 60L))), rows.toString)
  }

  test("pair view is consistent with the per-document view on the real corpus") {
    val docsInPairs = DedupQueries.dedupSubstringPairs(spark, Sf0001).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    Caches.drain()
    val docsWithDups = DedupQueries.dedupSubstring(spark, Sf0001).collect()
      .map(_.getLong(0)).toSet
    Caches.drain()
    // exactly the documents with a duplicated span appear in some pair
    assert(docsInPairs == docsWithDups,
      s"pair/per-doc views disagree: ${docsInPairs.diff(docsWithDups)} vs ${docsWithDups.diff(docsInPairs)}")
    assert(docsInPairs.nonEmpty)
  }

  test("winnow guarantee: a shared span of exactly k+w-1 tokens is always detected") {
    import spark.implicits._
    val W = graft.dedup.DedupQueries.WinnowWindow
    val shared = (1 to K + W - 1).map(w("guar", _)).mkString(" ") // exactly k+w-1
    val docs = Seq(
      (1L, s"${(1 to 30).map(w("pre", _)).mkString(" ")} $shared"),
      (2L, s"$shared ${(1 to 30).map(w("post", _)).mkString(" ")}")).toDF("doc_id", "text")
    val pairs = DedupQueries.dedupSubstringWinnowOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.drain()
    assert(pairs == Set((1L, 2L)), s"guarantee-length span missed: $pairs")
  }

  test("winnow pairs are a subset of the exact pair view; postings density near 2/(w+1)") {
    val exact = DedupQueries.dedupSubstringPairsOn(
        Tables.documents(spark, Sf0001).select(col("doc_id"), col("text"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.drain()
    val winnowed = DedupQueries.dedupSubstringWinnowOn(
        Tables.documents(spark, Sf0001).select(col("doc_id"), col("text"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.drain()
    assert(winnowed.subsetOf(exact),
      s"winnow invented pairs the exact view lacks: ${winnowed.diff(exact)}")
    // shuffle-reduction claim: selected postings ≈ 2/(w+1) of all gram postings
    val full = Tables.documents(spark, Sf0001)
      .select(explode(expr(s"gram_fps(text, $K)"))).count()
    val selected = Tables.documents(spark, Sf0001)
      .select(explode(expr(s"winnow_select(text, $K, ${graft.dedup.DedupQueries.WinnowWindow})"))).count()
    val density = selected.toDouble / full
    info(f"winnow posting density: $density%.3f (theory 2/(w+1) = ${2.0 / (graft.dedup.DedupQueries.WinnowWindow + 1)}%.3f)")
    assert(density < 0.35, f"winnowing is not thinning the postings: $density%.3f")
  }

  test("gram_fps: rolling fingerprints equal direct recomputation, any window") {
    val text = (1 to 300).map(i => w("r", i % 37) + w("s", i % 11)).mkString(" ")
    val df = spark.range(1).select(lit(text).as("text"))
    val rolled = df.select(expr("gram_fps(text, 7)")).head.getSeq[Long](0)
    val toks = Tokenizer.letterTokens(text)
    assert(rolled.length == toks.length - 7 + 1)
    // direct per-window recomputation through the same expression: a
    // k-token document's single fingerprint has no rolling step to drift
    val direct = (0 to toks.length - 7).map { p =>
      val window = toks.slice(p, p + 7).mkString(" ")
      spark.range(1).select(expr(s"gram_fps('$window', 7)")).head.getSeq[Long](0).head
    }
    assert(rolled == direct, "rolling fingerprint drifts from direct computation")
  }

  test("grams_at returns the exact token windows at the requested positions") {
    val text = "a bb ccc dddd eeeee ffffff g hh iii"
    val got = spark.range(1)
      .select(expr("grams_at('" + text + "', array(0, 3, 6), 3)")).head.getSeq[String](0)
    assert(got == Seq("a bb ccc", "dddd eeeee ffffff", "g hh iii"), got.toString)
  }
}
