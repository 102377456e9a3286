package graft

import org.apache.spark.sql.functions._

import graft.similarity.SimilarityQueries
import graft.text.CorpusStats

/** Round-10 corpus-statistics and embedding-diagnostic operators:
  * Heaps'-law vocabulary growth, per-doc n-gram novelty, the source×source
  * Jaccard matrix, Fightin'-Words log-odds, per-label embedding outliers,
  * and the IVF silhouette. Each test pins a semantic invariant (mass
  * conservation, brute-force parity on a small slice) that the DuckDB
  * hash-compare alone would not localize. */
class CorpusStatsSuite extends SparkSpec {
  import spark.implicits._

  private def tokensOf(text: String): Seq[String] =
    text.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq

  test("vocab_growth: buckets tile the corpus, totals conserve, curves are monotone") {
    val rows = CorpusStats.vocabGrowth(spark, Sf0001)
      .orderBy("bucket")
      .select("bucket", "n_tokens", "new_types", "new_gram_types", "cum_types", "cum_tokens")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    Caches.drain()
    assert(rows.map(_._1) == (0L until 10L))
    val docs = Tables.documents(spark, Sf0001).select("text").as[String].collect()
    val totalTokens = docs.map(tokensOf(_).size.toLong).sum
    val totalTypes = docs.flatMap(tokensOf).distinct.size.toLong
    assert(rows.map(_._2).sum == totalTokens)
    assert(rows.map(_._3).sum == totalTypes)
    assert(rows.last._5 == totalTypes && rows.last._6 == totalTokens)
    // cumulative columns are running sums (monotone non-decreasing)
    assert(rows.map(_._5) == rows.map(_._3).scanLeft(0L)(_ + _).tail)
    assert(rows.map(_._6) == rows.map(_._2).scanLeft(0L)(_ + _).tail)
  }

  test("doc_novelty: the earliest gram-bearing doc is fully novel; novel mass equals the gram vocabulary") {
    val nov = CorpusStats.docNovelty(spark, Sf0001)
      .select("doc_id", "n_grams", "n_novel", "novelty_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    Caches.drain()
    assert(nov.nonEmpty)
    val first = nov.minBy(_._1)
    assert(first._3 == first._2 && first._4 == 1000000L,
      "the first document's grams have nowhere earlier to appear")
    nov.foreach { case (d, g, n, ppm) =>
      assert(n <= g && ppm == n * 1000000L / g, s"doc $d inconsistent")
    }
    // every distinct gram in the corpus is novel in exactly one document
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val allGrams = docs.flatMap { case (_, t) =>
      val toks = tokensOf(t)
      if (toks.size < 5) Nil else toks.sliding(5).map(_.mkString(" ")).toSeq.distinct
    }.distinct.size.toLong
    assert(nov.map(_._3).sum == allGrams)
  }

  test("corpus_overlap: full matrix, and one pair matches a driver-side exact Jaccard") {
    val m = CorpusStats.corpusOverlap(spark, Sf0001)
      .select("source_a", "source_b", "n_inter", "n_union", "jaccard_ppm")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    Caches.drain()
    val sources = Tables.documents(spark, Sf0001)
      .select("source").distinct().as[String].collect().toSeq
    assert(m.size == sources.size * (sources.size - 1) / 2, "full unordered matrix")
    assert(m.forall { case (a, b, i, u, j) => a < b && i >= 0 && u >= i && j == i * 1000000L / u })
    // brute-force the lexicographically first pair
    val docs = Tables.documents(spark, Sf0001)
      .select("source", "text").as[(String, String)].collect()
    def gramSet(src: String): Set[String] = docs.filter(_._1 == src).flatMap { case (_, t) =>
      val toks = tokensOf(t)
      if (toks.size < 5) Nil else toks.sliding(5).map(_.mkString(" ")).toSeq
    }.toSet
    val (a, b) = (m.map(_._1).min, m.filter(_._1 == m.map(_._1).min).map(_._2).min)
    val (sa, sb) = (gramSet(a), gramSet(b))
    val row = m.find(r => r._1 == a && r._2 == b).get
    assert(row._3 == (sa & sb).size.toLong && row._4 == (sa | sb).size.toLong)
  }

  test("source_log_odds: 5 per source, and the top term's sign tracks over/under-representation") {
    val r = CorpusStats.sourceLogOdds(spark, Sf0001)
      .select("source", "term", "y", "gw", "d_micro", "rk")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    Caches.drain()
    val bySrc = r.groupBy(_._1)
    assert(bySrc.values.forall(g => g.map(_._6).sorted == (1L to 5L)))
    // totals for sign check
    val docs = Tables.documents(spark, Sf0001)
      .select("source", "text").as[(String, String)].collect()
    val nBySrc = docs.groupBy(_._1).view.mapValues(_.map(t => tokensOf(t._2).size.toLong).sum).toMap
    val gt = nBySrc.values.sum
    r.foreach { case (s, _, y, gw, d, _) =>
      val over = y.toDouble / nBySrc(s) > (gw - y).toDouble / (gt - nBySrc(s))
      // the Dirichlet prior shrinks but cannot flip a strict inequality of rates
      if (d > 50000) assert(over, s"$s claims over-representation but rates disagree")
      if (d < -50000) assert(!over, s"$s claims under-representation but rates disagree")
    }
  }

  test("embed_outliers: top-5 per label matches a driver-side exact integer recompute") {
    val got = SimilarityQueries.embedOutliers(spark, Sf0001)
      .select("label", "vec_id", "d2", "rk")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    Caches.drain()
    val vecs = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("label").cast("long"), col("embedding").cast("array<double>"))
      .as[(Long, Long, Seq[Double])].collect()
    val expected = vecs.groupBy(_._2).toSeq.flatMap { case (label, vs) =>
      val q: Seq[(Long, Seq[Long])] =
        vs.toSeq.map { case (id, _, e) => (id, e.map(v => math.floor(v * 1e7 + 0.5).toLong)) }
      val n = q.size.toLong
      val sums = q.map(_._2).transpose.map(_.sum)
      val cq = sums.map(s => math.floor((s.toDouble / (n * 1e7)) * 1e7 + 0.5).toLong)
      q.map { case (id, eq) =>
        (label, id, eq.zip(cq).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
        .map { case ((l, id, d2), i) => (l, id, d2, i + 1L) }
    }.sorted
    assert(got == expected)
  }

  test("ivf_silhouette: vectors conserve, scores in [0, 1e6], means consistent") {
    val r = SimilarityQueries.ivfSilhouette(spark, Sf0001)
      .select("cell", "n_vectors", "sum_s_ppm", "mean_s_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    Caches.drain()
    val nVecs = Tables.embeddings(spark, Sf0001).count()
    assert(r.map(_._2).sum == nVecs, "every vector lands in exactly one cell")
    r.foreach { case (c, n, s, m) =>
      assert(n > 0 && s >= 0 && s <= n * 1000000L, s"cell $c out of range")
      assert(m == s / n, s"cell $c mean inconsistent")
    }
  }

  test("events_holt: fold matches a driver-side reference; forecasts are affine in h") {
    val got = graft.events.EventQueries.holtForecast(spark, Sf0001)
      .select("event_type", "h", "yhat_micro", "level_micro", "trend_micro")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    Caches.drain()
    val byType = Tables.events(spark, Sf0001)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val d0 = byType.values.flatten.min
    val d1 = byType.values.flatten.max
    def fdiv2(x: Long): Long = (x - (((x % 2) + 2) % 2)) / 2
    val expected = byType.toSeq.flatMap { case (et, days) =>
      val cnt = days.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ys = (d0 to d1).map(d => cnt.getOrElse(d, 0L) * 1000000L)
      var l = ys(0)
      var b = ys(1) - ys(0)
      ys.drop(2).foreach { y =>
        val nl = fdiv2(l + b + y)
        b = fdiv2(nl - l + b)
        l = nl
      }
      (1L to 7L).map(h => (et, h, l + h * b, l, b))
    }.sorted
    assert(got == expected)
  }

  test("streaming new-token monitor: single-batch replay equals the batch first-occurrence; no re-emission") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingCorpus.newTokens(
      in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("newtok").outputMode("append").start()
    try {
      in.addData((0L, "alpha beta gamma"), (1L, "beta delta"), (2L, "alpha epsilon"))
      q.processAllAvailable()
      val batch1 = spark.table("newtok").as[(String, Long)].collect().toMap
      assert(batch1 == Map("alpha" -> 0L, "beta" -> 0L, "gamma" -> 0L,
        "delta" -> 1L, "epsilon" -> 2L))
      // batch 2: only genuinely new vocabulary emits
      in.addData((3L, "alpha zeta"), (4L, "beta gamma"))
      q.processAllAvailable()
      val all = spark.table("newtok").as[(String, Long)].collect().toSeq
      assert(all.size == 6 && all.toMap.get("zeta").contains(3L))
    } finally q.stop()
  }
}
