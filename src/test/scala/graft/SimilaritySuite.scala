package graft

import graft.similarity.SimilarityQueries

/** Structural and cross-checking tests for the similarity-search operators
  * at sf0.001 (500 vectors, dim 64). */
class SimilaritySuite extends SparkSpec {

  test("brute-force top-k: 5 queries × 10 ranked neighbors, no self-matches") {
    val rows = SimilarityQueries.topkBruteForce(spark, Sf0001).collect()
    assert(rows.length == 50)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).toSet.size == 10) // distinct neighbors
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to 10L)) // ranks 1..10
      val sorted = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b }) // descending cosine
    }
    rows.foreach(r => assert(r.getLong(0) != r.getLong(1)))
  }

  test("LSH top-k scores agree with brute force on shared (query, neighbor) pairs") {
    val bf = SimilarityQueries.topkBruteForce(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val lsh = SimilarityQueries.topkLsh(spark, Sf0001).collect()
    assert(lsh.nonEmpty)
    val shared = lsh.flatMap { r =>
      bf.get((r.getLong(0), r.getLong(1))).map(b => (r.getDouble(3), b))
    }
    assert(shared.nonEmpty)
    shared.foreach { case (l, b) => assert(l == b, "cosine must be bit-identical") }
  }

  test("IVF top-k: valid ranked output, scores agree with brute force on shared pairs") {
    val bf = SimilarityQueries.topkBruteForce(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val ivf = SimilarityQueries.topkIvf(spark, Sf0001).collect()
    assert(ivf.nonEmpty)
    val byQ = ivf.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length.toLong))
    }
    ivf.foreach { r =>
      bf.get((r.getLong(0), r.getLong(1))).foreach(b => assert(r.getDouble(3) == b))
    }
  }

  test("embedding near-pairs: 100% precision at the threshold, no duplicates") {
    val pairs = SimilarityQueries.nearPairs(spark, Sf0001).collect()
    assert(pairs.nonEmpty)
    val seen = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(seen.distinct.length == seen.length)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.3)
    }
  }

  test("IVF training: Lloyd rounds keep dimensionality, partition the corpus, move the quantizer") {
    val trained = SimilarityQueries.ivfTrain(spark, Sf0001).collect()
    val byCell = trained.groupBy(_.getLong(0))
    assert(byCell.nonEmpty)
    byCell.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (0L until 64L), "cell lost dimensions")
      assert(rs.map(_.getLong(3)).distinct.length == 1, "inconsistent cell size across dims")
      assert(rs.head.getLong(3) > 0)
    }
    // the final assignment partitions the corpus exactly
    val total = byCell.values.map(_.head.getLong(3)).sum
    assert(total == Tables.embeddings(spark, Sf0001).count(),
      s"trained cells do not partition the corpus (sum $total)")
    // training must actually move the quantizer off the label seed
    val seed = SimilarityQueries.labelCentroids(spark, Sf0001).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1)) -> r.getDouble(2)).toMap
    val moved = trained.count { r =>
      seed.get((r.getLong(0), r.getLong(1))).forall(_ != r.getDouble(2))
    }
    assert(moved > 0, "3 Lloyd rounds left every centroid component exactly at the seed")
  }

  test("dedup_semantic: covers the corpus; per-cell lowest id is canonical; max_sim_lower exact") {
    val rows = SimilarityQueries.semanticDedup(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.length == Tables.embeddings(spark, Sf0001).count(),
      "every vector gets a keep/dup verdict")
    val byCell = rows.groupBy(_._2)
    byCell.values.foreach { cell =>
      val minId = cell.map(_._1).min
      // the cell's lowest id has no lower-id mate: sentinel, never a dup
      val canon = cell.find(_._1 == minId).get
      assert(canon._3 == -2.0 && canon._4 == 0L)
      // everyone else saw at least one real cosine in [-1, 1]
      cell.filter(_._1 != minId).foreach { v =>
        assert(v._3 >= -1.0 && v._3 <= 1.0)
        assert((v._4 == 1L) == (v._3 >= 0.3)) // is_dup is exactly the threshold test
      }
    }
    // spot-exactness: recompute one non-canonical vector's max-to-lower driver-side
    val cells = byCell.values.find(_.length >= 3).get
    val embByIdx = Tables.embeddings(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val target = cells.maxBy(_._1)
    val expected = cells.filter(_._1 < target._1)
      .map(u => cos(embByIdx(u._1), embByIdx(target._1))).max
    assert(math.abs(target._3 - expected) < 1e-12)
  }

  test("label centroids: one scalar row per (label, dimension), full dimensionality") {
    val rows = SimilarityQueries.labelCentroids(spark, Sf0001).collect()
    assert(rows.length == 10 * 64) // 10 labels × 64 dims, exploded
    val byLabel = rows.groupBy(_.get(0))
    assert(byLabel.size == 10)
    byLabel.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (0L until 64L))
      assert(rs.map(_.getLong(3)).distinct.length == 1) // same n_vectors per label
      assert(rs.head.getLong(3) > 0)
    }
    // re-assembled quantizer vectors keep full dimensionality
    val vecs = SimilarityQueries.centroidVectors(spark, Sf0001).collect()
    assert(vecs.length == 10)
    vecs.foreach(r => assert(r.getSeq[Double](1).length == 64))
  }

  test("PQ codebooks: M×K×subdim scalar rows, every codeword non-empty") {
    val rows = SimilarityQueries.pqTrain(spark, Sf0001).collect()
    // 4 subspaces × 16 codes × 16 dims — some codes may empty out during
    // Lloyd (they drop, identically in both engines), so ≤ is the contract
    assert(rows.length <= 4 * 16 * 16 && rows.length >= 4 * 8 * 16,
      s"unexpected codebook size ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 4)    // s
      assert(r.getLong(1) >= 0 && r.getLong(1) < 16)   // code
      assert(r.getLong(2) >= 0 && r.getLong(2) < 16)   // pos within subspace
      assert(r.getLong(4) > 0)                          // n_vectors
    }
  }

  test("PQ ADC top-k: valid ranked output, recall@10 beats chance by 10x") {
    val pq = SimilarityQueries.topkPq(spark, Sf0001).collect()
    assert(pq.length == 50)
    val byQ = pq.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to 10L))
      val sorted = rs.sortBy(_.getLong(2)).map(_.getLong(3))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b }) // ascending distance
    }
    pq.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    // recall vs the exact scan: chance is 10/499 ≈ 0.02; the 4×16 codebook
    // on this synthetic corpus measures ~0.28 (PQ approximates L2 while the
    // brute force ranks cosine on unnormalized vectors — the loss is partly
    // metric mismatch, wholly deterministic). Floor at 0.15.
    val bf = SimilarityQueries.topkBruteForce(spark, Sf0001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = byQ.map { case (q, rs) =>
      rs.map(_.getLong(1)).count(bf(q)) / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.15, s"PQ recall@10 collapsed: $mean")
  }

  test("IVF+PQ: ranked output valid; ADC distances agree with plain PQ on shared pairs") {
    val ivfpq = SimilarityQueries.topkIvfPq(spark, Sf0001).collect()
    assert(ivfpq.length == 50)
    val byQ = ivfpq.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach(rs => assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to 10L)))
    // same codes + same query tables → a shared (q, vec) pair must carry a
    // bit-identical integer distance in both the routed and the flat scan
    val flat = SimilarityQueries.topkPq(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val shared = ivfpq.flatMap(r => flat.get((r.getLong(0), r.getLong(1))).map(d => (r.getLong(3), d)))
    assert(shared.nonEmpty)
    shared.foreach { case (a, b) => assert(a == b, "ADC distance must be identical") }
  }

  test("semantic_decontaminate: one verdict per corpus vector, argmax correct, eval broadcast") {
    val df = SimilarityQueries.semanticDecontaminate(spark, Sf0001)
    val rows = df.collect()
    val base = Tables.embeddings(spark, Sf0001).count()
    assert(rows.length == base - 50) // every non-eval vector gets a verdict
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getLong(1) < 50, "nearest eval id must be in the eval set")
      val mc = r.getDouble(2)
      assert(mc >= -1.0 && mc <= 1.0)
      assert(r.getBoolean(3) == (mc >= 0.4))
    }
    // brute recheck of one vector's max cosine against the eval set
    import org.apache.spark.sql.functions._
    val probe = rows.head
    val brute = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .filter(col("vec_id") < 50)
      .crossJoin(Tables.embeddings(spark, Sf0001)
        .filter(col("vec_id") === probe.getLong(0))
        .select(col("embedding").cast("array<double>").as("pe")))
      .select(expr("cosine_sim(e, pe)").as("c"))
      .agg(max(col("c"))).head.getDouble(0)
    assert(math.abs(brute - probe.getDouble(2)) < 1e-12)
    // the eval side must broadcast — the corpus side never shuffles
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"eval set must broadcast:\n$plan")
  }

  test("mmr_rerank: matches a driver-side greedy MMR over the same candidate set") {
    import org.apache.spark.sql.functions.col
    val vecs = Tables.embeddings(spark, Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cosMicro(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1000000)
    }
    val q = vecs(0L)
    val cand = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, cosMicro(q, v)) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(20)
    var selected = Vector(cand.minBy { case (id, _, rel) => (-rel, id) })
    var expected = Vector((1L, selected.head._1, selected.head._3, selected.head._3))
    for (r <- 2 to 5) {
      val pick = cand.filterNot(c => selected.exists(_._1 == c._1))
        .map { c =>
          val maxsim = selected.map(s => cosMicro(c._2, s._2)).max
          (c._1, c._2, c._3, c._3 - maxsim)
        }
        .minBy { case (id, _, _, score) => (-score, id) }
      selected :+= ((pick._1, pick._2, pick._3))
      expected :+= ((r.toLong, pick._1, pick._3, pick._4))
    }
    val got = SimilarityQueries.mmrRerank(spark, Sf0001)
      .select("rank", "doc_id", "rel_micro", "score_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toVector
    Caches.drain()
    assert(got == expected)
    // selected set is diverse: no two picks more similar than pick-to-query relevance bound
    assert(got.map(_._2).distinct.length == 5)
  }

  test("hard negatives: cross-label only, and exactly the best different-label scores per query") {
    val labels = Tables.embeddings(spark, Sf0001)
      .selectExpr("vec_id", "CAST(label AS BIGINT)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hn = SimilarityQueries.hardNegatives(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(hn.length == 25)
    hn.foreach { case (q, v, l, _, _) =>
      assert(labels(v) == l && l != labels(q), s"negative $v shares label with query $q")
    }
    // vs unfiltered brute force: a hard negative's cosine can never exceed
    // the same rank's unfiltered neighbor (the filter only removes rows)
    val bf = SimilarityQueries.topkBruteForce(spark, Sf0001).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    hn.filter(_._4 <= 5).foreach { case (q, _, _, rk, c) =>
      assert(c <= bf((q, rk)) + 1e-12)
    }
  }

  test("mutual NN: pairs are mutual best candidates; a vector joins at most one pair") {
    val np = SimilarityQueries.nearPairs(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mnn = SimilarityQueries.mutualNn(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    Caches.drain()
    assert(mnn.nonEmpty, "no mutual pairs at sf0.001 — witness exercises nothing")
    // top-1 is unique per vector, so mutuality allows at most one pair each
    val members = mnn.flatMap { case (a, b, _) => Seq(a, b) }
    assert(members.distinct.length == members.length)
    // replay: each side of an emitted pair is the other's best candidate
    val best = (np.map { case (a, b, c) => (a, (b, c)) } ++
        np.map { case (a, b, c) => (b, (a, c)) })
      .groupBy(_._1).map { case (v, es) =>
        v -> es.map(_._2).minBy { case (n, c) => (-c, n) }._1 }
    mnn.foreach { case (a, b, _) =>
      assert(best(a) == b && best(b) == a, s"($a, $b) not mutual best")
    }
    assert(mnn.forall(_._3 >= 0.3))
  }
  test("embed_top_direction: Rayleigh-consistent eigenpair, anisotropy bounded") {
    val rows = graft.similarity.SimilarityQueries.embedTopDirection(spark, Sf0001)
      .collect()
    Caches.drain()
    assert(rows.length == 64, s"one row per dimension, got ${rows.length}")
    val lambda1 = rows.head.getAs[Double]("lambda1")
    val aniso = rows.head.getAs[Double]("anisotropy")
    assert(rows.forall(r => r.getAs[Double]("lambda1") == lambda1
      && r.getAs[Double]("anisotropy") == aniso), "scalar columns must be constant")
    // PSD Gram: top eigenvalue positive; its share of the trace in (0, 1];
    // 1/d is the isotropic floor, so a real corpus sits strictly above it
    assert(lambda1 > 0.0, s"PSD Gram cannot have lambda1 = $lambda1 <= 0")
    assert(aniso > 1.0 / 64 && aniso <= 1.0 + 1e-6, s"anisotropy $aniso out of range")
    // the iterate is max-abs-normalized to PowerQ = 1000
    val vq = rows.sortBy(_.getAs[Long]("i")).map(_.getAs[Long]("v_q"))
    assert(vq.map(math.abs).max == 1000L, "iterate must be normalized to max-abs 1000")
    // independent check: the reported lambda1 IS the Rayleigh quotient of
    // the returned direction — recompute it driver-side from scratch
    // (tolerance covers only the /4096 per-term snap)
    val embs = Tables.embeddings(spark, Sf0001)
      .select(org.apache.spark.sql.functions.col("embedding")).collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 10000 + 0.5)).toArray)
    val d = 64
    val gram = Array.ofDim[Double](d, d)
    embs.foreach { e =>
      var i = 0
      while (i < d) { var j = 0; while (j < d) { gram(i)(j) += e(i) * e(j); j += 1 }; i += 1 }
    }
    val v = vq.map(_.toDouble)
    val gv = (0 until d).map(i => (0 until d).map(j => gram(i)(j) * v(j)).sum)
    val rayleigh = (0 until d).map(i => v(i) * gv(i)).sum /
      (0 until d).map(i => v(i) * v(i)).sum / 1e8
    assert(math.abs(rayleigh - lambda1) / lambda1 < 1e-5,
      s"reported lambda1 $lambda1 vs driver Rayleigh $rayleigh")
  }
}
