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

  test("oov_rate: matches a driver-side split recompute") {
    val got = CorpusStats.oovRate(spark, Sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    Caches.drain()
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val n = docs.length
    val oldVocab = docs.filter(_._1 * 2 / n == 0).flatMap(d => tokensOf(d._2)).toSet
    val newToks = docs.filter(_._1 * 2 / n == 1).flatMap(d => tokensOf(d._2))
    val newTypes = newToks.distinct
    val oovOcc = newToks.count(!oldVocab.contains(_)).toLong
    val oovTyp = newTypes.count(!oldVocab.contains(_)).toLong
    assert(got == ((newToks.size.toLong, oovOcc, oovOcc * 1000000L / newToks.size,
      newTypes.size.toLong, oovTyp, oovTyp * 1000000L / newTypes.size)))
  }

  test("dedup_savings: histogram is consistent with dedup_canonical's per-cluster keeps") {
    val sav = graft.dedup.DedupQueries.dedupSavings(spark, Sf0001)
      .select("cluster_size", "n_clusters", "n_docs", "bytes_total", "bytes_dropped")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    Caches.drain()
    val canon = graft.dedup.DedupQueries.dedupCanonical(spark, Sf0001)
      .select("canonical", "kept_chars", "component_size")
      .as[(Long, Long, Long)].collect().toSeq
    Caches.drain()
    val comp = graft.dedup.DedupQueries.dedupComponents(spark, Sf0001)
      .select("doc_id", "canonical").as[(Long, Long)].collect().toSeq
    Caches.drain()
    val chars = Tables.documents(spark, Sf0001)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(sav.map(_._2).sum == canon.size, "cluster counts agree across operators")
    assert(sav.map(_._3).sum == comp.size, "every clustered doc is in the histogram")
    val bytesByCluster = comp.groupBy(_._2).view.mapValues(_.map(t => chars(t._1)).sum).toMap
    val expectDropped = canon.map { case (c, kept, _) => bytesByCluster(c) - kept }.sum
    assert(sav.map(_._5).sum == expectDropped,
      "dropped bytes equal total minus dedup_canonical's keeps")
  }

  test("events_trimmed_stats: matches a driver-side sort-and-trim") {
    val got = graft.events.EventQueries.trimmedStats(spark, Sf0001)
      .select("event_type", "n", "n_kept", "mean_microcents", "trimmed_mean_microcents")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    val cents = Tables.events(spark, Sf0001)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .as[(String, Long)].collect()
    val expected = cents.groupBy(_._1).toSeq.map { case (et, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length.toLong
      val lo = n * 5 / 100
      val kept = sorted.slice(lo.toInt, (n - lo).toInt)
      (et, n, n - 2 * lo,
        Math.floorDiv(sorted.sum * 1000000L, n),
        Math.floorDiv(kept.sum * 1000000L, kept.length.toLong))
    }.sorted
    assert(got == expected)
  }

  test("pack_efficiency: exact rollup of seq_pack's chunks") {
    val packs = graft.pipelines.TrainingPrep.seqPack(spark, Sf0001)
      .select("source", "chunk_tokens", "n_docs")
      .as[(String, Long, Long)].collect().toSeq
    val got = graft.pipelines.TrainingPrep.packEfficiency(spark, Sf0001)
      .select("source", "n_chunks", "n_docs", "tokens", "fill_ppm", "ideal_chunks", "overhead_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val expected = packs.groupBy(_._1).toSeq.map { case (s, cs) =>
      val nChunks = cs.size.toLong
      val tokens = cs.map(_._2).sum
      val ideal = (tokens + 511) / 512
      (s, nChunks, cs.map(_._3).sum, tokens,
        tokens * 1000000L / (nChunks * 512), ideal, (nChunks - ideal) * 1000000L / ideal)
    }.sorted
    assert(got == expected)
    // the greedy start-position packer on this corpus packs tightly: every
    // source's fill is above 50% of capacity (sanity floor, not a tuning claim)
    assert(got.forall(_._5 > 500000L))
  }

  test("source_clusters: partition of all sources; matches driver-side union-find over the thresholded overlap") {
    val got = CorpusStats.sourceClusters(spark, Sf0001)
      .select("source", "cluster", "cluster_size")
      .as[(String, String, Long)].collect().toSeq
    Caches.drain()
    val edges = CorpusStats.corpusOverlap(spark, Sf0001)
      .filter(col("jaccard_ppm") >= 25000)
      .select("source_a", "source_b").as[(String, String)].collect().toSeq
    Caches.drain()
    val sources = Tables.documents(spark, Sf0001)
      .select("source").distinct().as[String].collect().toSeq
    assert(got.map(_._1).sorted == sources.sorted, "every source exactly once")
    // driver union-find with min-label canonicalization
    val parent = scala.collection.mutable.Map(sources.map(s => s -> s): _*)
    def find(s: String): String =
      if (parent(s) == s) s else { val r = find(parent(s)); parent(s) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = if (ra < rb) ra else rb; parent(ra) = lo; parent(rb) = lo }
    }
    val expectedCluster = sources.map(s => s -> find(s)).toMap
    val bySize = expectedCluster.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (s, c, n) =>
      assert(c == expectedCluster(s), s"$s in wrong cluster")
      assert(n == bySize(expectedCluster(s)), s"$s wrong cluster size")
    }
    assert(got.exists(_._3 > 1), "the threshold yields at least one nontrivial family")
  }

  test("search_rbo: matches a driver-side RBO over the two collected rank lists") {
    val (lexDf, denseDf) = graft.pipelines.DataSelection.rrfRankings(spark, Sf0001)
    val lex = lexDf.as[(Long, Long)].collect().toMap
    val dense = denseDf.as[(Long, Long)].collect().toMap
    val got = graft.pipelines.DataSelection.searchRbo(spark, Sf0001)
      .select("depth", "n_matched", "rbo_nano")
      .as[(Long, Long, Long)].collect().head
    val depth = 50
    val ms = lex.keySet.intersect(dense.keySet).toSeq
      .map(d => math.max(lex(d), dense(d)))
    val w = (1 to depth).map(d => math.round(0.1 * math.pow(0.9, d - 1) / d * 1e9))
    val rbo = (1 to depth).map(d => ms.count(_ <= d).toLong * w(d - 1)).sum
    assert(got == ((depth.toLong, ms.size.toLong, rbo)))
    assert(got._3 > 0 && got._3 < 1000000000L)
  }

  test("events_decayed_topk: matches a driver-side decayed recount") {
    val got = graft.events.EventQueries.decayedTopk(spark, Sf0001)
      .select("event_type", "user_id", "decayed_micro", "n_events", "rk")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    val evts = Tables.events(spark, Sf0001)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .as[(String, Long, Long)].collect()
    val maxDay = evts.map(_._3).max
    val expected = evts.groupBy(e => (e._1, e._2)).toSeq
      .map { case ((et, u), es) =>
        (et, u, es.map(e => 1000000L / (1L << math.min(maxDay - e._3, 62L))).sum,
          es.size.toLong)
      }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case ((et, u, s, n), i) => (et, u, s, n, i + 1L) }
      }.sorted
    assert(got == expected)
  }

  test("events_bot_score: matches a driver-side gap recount; CV2 nonnegative") {
    val got = graft.events.EventQueries.botScore(spark, Sf0001)
      .select("user_id", "n_events", "span_s", "cv2_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val evts = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"))
      .as[(Long, Long, Long)].collect()
    val expected = evts.groupBy(_._1).toSeq
      .filter(_._2.length >= 5)
      .map { case (u, es) =>
        val ts = es.sortBy(e => (e._3, e._2)).map(_._3)
        val gaps = ts.zip(ts.tail).map { case (a, b) => (b - a) / 1000000L }
        val (m, s, q) = (gaps.length.toLong, gaps.sum, gaps.map(g => g * g).sum)
        val cv2 = if (s == 0) 0L
          else ((m * q - s * s) / (s * s)) * 1000000L + ((m * q - s * s) % (s * s)) * 1000000L / (s * s)
        (u, es.length.toLong, s, cv2)
      }.sorted
    assert(got == expected)
    assert(got.forall(_._4 >= 0))
  }

  test("embed_random_negatives: the hash draws are exact and exclude the query; 5 per query") {
    val got = SimilarityQueries.randomNegatives(spark, Sf0001)
      .select("q_id", "rank", "vec_id", "cosine")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val ids = Tables.embeddings(spark, Sf0001).select("vec_id").as[Long].collect().toSet
    val n = ids.size.toLong
    val expected = (0L until 5L).flatMap { q =>
      (1L to 8L).map(i => (i, (q * 2654435761L + i * 40503L) % n))
        .filter(_._2 != q)
        .distinctBy(_._2)
        .filter(c => ids.contains(c._2))
        .take(5).zipWithIndex
        .map { case ((_, c), r) => (q, r + 1L, c) }
    }.toSet
    assert(got.map(t => (t._1, t._2, t._3)).toSet == expected)
    assert(got.forall(t => t._4 >= -1.0001 && t._4 <= 1.0001))
    assert(got.groupBy(_._1).values.forall(_.size == 5))
  }

  test("ann_recall_curve: monotone non-decreasing in nprobe and anchored to ann_recall at nprobe=3") {
    val curve = SimilarityQueries.annRecallCurve(spark, Sf0001)
      .select("nprobe", "q_id", "n_truth", "hits", "recall_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    Caches.drain()
    val anchor = SimilarityQueries.annRecall(spark, Sf0001)
      .select("q_id", "recall_ppm").as[(Long, Long)].collect().toMap
    Caches.drain()
    assert(curve.map(_._1).distinct.sorted == Seq(1L, 2L, 3L, 5L, 8L))
    assert(curve.groupBy(_._1).values.forall(_.map(_._2).sorted == (0L until 5L)))
    // anchored: the swept nprobe=3 point IS ann_recall
    curve.filter(_._1 == 3L).foreach { case (_, q, _, _, r) => assert(r == anchor(q)) }
    // monotone per query: a superset of probe cells can only add candidates
    val byQ = curve.groupBy(_._2)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_._1).map(_._5)
      assert(sorted == sorted.sorted, s"recall not monotone in nprobe: $rows")
    }
    assert(curve.forall(r => r._4 <= r._3 && r._5 >= 0 && r._5 <= 1000000L))
  }

  test("quality_isotonic: equals textbook sequential PAV; monotone; conserves mass") {
    val got = graft.pipelines.TrainingPrep.qualityIsotonic(spark, Sf0001)
      .select("raw_score", "n", "p", "iso_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    Caches.drain()
    // driver-side reference: the classifier's scores joined to labels, then
    // the sequential stack PAV
    val scores = graft.pipelines.TrainingPrep.qualityClassifier(spark, Sf0001)
      .select("doc_id", "raw_score").as[(Long, Long)].collect().toMap
    Caches.drain()
    val labels = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), when(col("lang") === "en", 1L).otherwise(0L))
      .as[(Long, Long)].collect().toMap
    val hist = scores.toSeq.map { case (d, s) => (s, labels(d)) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s, ys) => (s, ys.map(_._2).sum, ys.size.toLong) }
    // sequential PAV over (score, p, n)
    val stack = scala.collection.mutable.Stack.empty[(Long, Long, Long)] // (span, p, n)
    hist.foreach { case (_, p, n) =>
      var blk = (1L, p, n)
      while (stack.nonEmpty && stack.top._2 * blk._3 > blk._2 * stack.top._3) {
        val t = stack.pop()
        blk = (t._1 + blk._1, t._2 + blk._2, t._3 + blk._3)
      }
      stack.push(blk)
    }
    val fits = stack.toSeq.reverse.flatMap { case (span, p, n) =>
      Seq.fill(span.toInt)(p * 1000000L / n)
    }
    val expected = hist.zip(fits).map { case ((s, p, n), f) => (s, n, p, f) }
    assert(got == expected)
    assert(got.map(_._4) == got.map(_._4).sorted, "calibrated fit is monotone in score")
    assert(got.map(_._3).sum == hist.map(_._2).sum && got.map(_._2).sum == hist.map(_._3).sum)
  }

  test("quality_conformal: threshold is the exact conformal order statistic; counts recompute") {
    val got = graft.pipelines.TrainingPrep.qualityConformal(spark, Sf0001)
      .select("n_cal", "k", "threshold", "n_test_pos", "coverage_ppm", "n_test_neg", "neg_below_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    Caches.drain()
    val scores = graft.pipelines.TrainingPrep.qualityClassifier(spark, Sf0001)
      .select("doc_id", "raw_score").as[(Long, Long)].collect().toMap
    Caches.drain()
    val en = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), (col("lang") === "en").cast("boolean"))
      .as[(Long, Boolean)].collect().toMap
    val calPos = scores.toSeq.filter { case (d, _) => d % 2 == 0 && en(d) }.map(_._2).sorted
    val k = math.max(1L, (calPos.size + 1L) / 10L)
    val t = calPos((k - 1).toInt)
    val test = scores.toSeq.filter(_._1 % 2 != 0)
    val tp = test.filter(d => en(d._1))
    val tn = test.filterNot(d => en(d._1))
    assert(got._1 == calPos.size.toLong && got._2 == k && got._3 == t)
    assert(got._4 == tp.size.toLong &&
      got._5 == tp.count(_._2 >= t).toLong * 1000000L / tp.size)
    assert(got._6 == tn.size.toLong &&
      got._7 == tn.count(_._2 < t).toLong * 1000000L / tn.size)
    // the conformal promise at alpha=0.1: coverage near or above ~900000 ppm
    assert(got._5 >= 800000L, s"coverage ${got._5} implausibly low for alpha=0.1")
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

  test("ngram_diversity_approx: HLL estimate within the rsd contract; one-exchange plan") {
    import graft.text.CorpusStats
    // accuracy contract: lgK=12 ⇒ rsd ≈ 1.6%; assert every (source, n)
    // estimate within 5% (≈3σ) of the exact distinct count — the same
    // bound; the registered row's hll_within_10pct oracle flag is 10%
    // (~6 sigma, the userHll convention) so a data regeneration cannot flip it
    val exact = CorpusStats.ngramDiversity(spark, Sf0001)
      .select(col("source"), col("n"), col("distinct_grams"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the plan-shape pin below is about the SKETCH-MERGE aggregation, not
    // the orthogonal unsplittable-input fan-out (Plans.fanOut adds a
    // deliberate doc_id exchange at test scale); disable the gate so the
    // contract "one (source,n)-keyed exchange, sketches merge map-side"
    // stays pinned independent of the fan-out decision
    spark.conf.set(graft.Plans.FanOutKey, "false")
    val est =
      try CorpusStats.ngramDiversityEstimate(spark, Sf0001)
      finally spark.conf.unset(graft.Plans.FanOutKey)
    val rows = est.collect()
    assert(rows.length == exact.size, "estimate must cover every (source, n) group")
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val e = exact(key).toDouble
      val h = r.getLong(3).toDouble
      assert(math.abs(h - e) / e < 0.05,
        s"$key: HLL estimate $h vs exact $e breaks the 5% (≈3σ of rsd=1.6%) contract")
    }
    // scale contract: the production one-pass frame shuffles ONCE, keyed
    // (source, n) — sketches merge map-side; a gram-keyed dedup exchange
    // or an Expand here would mean the approx path silently regressed to
    // exact-shuffle cost
    // AdaptiveSparkPlan's toString prints Final AND Initial sections —
    // count exchanges in the final one only
    val plan = est.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val nExchanges = "Exchange".r.findAllIn(plan).length
    assert(nExchanges == 1, s"expected exactly one exchange, got $nExchanges:\n$plan")
    assert(!plan.contains("Expand"), s"approx path must not Expand:\n$plan")
  }
}
