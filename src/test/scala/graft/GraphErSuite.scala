package graft

import org.apache.spark.sql.functions._

import graft.dedup.DedupQueries
import graft.graph.GraphQueries
import graft.pipelines.TrainingPrep

/** Engine-internal oracles for the round-9 additions: the degree-oriented
  * triangle count, canonical-survivor selection, multi-pass ER blocking,
  * and the Bloom-prefiltered decontamination. Each test checks the
  * scale-shaped implementation against an independent straightforward
  * formulation on the same session — the cross-engine DuckDB check is the
  * driver's job; these pin the algebraic claims the scale shapes rest on. */
class GraphErSuite extends SparkSpec {

  test("copurchase_triangles: degree-oriented enumeration ≡ naive id-ordered enumeration") {
    // The implementation orients edges by (degree, id); the claim letting
    // the DuckDB oracle use plain id-order is that ANY total order yields
    // each triangle exactly once. Check against an id-ordered three-way
    // self-join built independently here.
    val li = Tables.lineitem(spark, Sf0001).select(col("l_orderkey"), col("l_partkey"))
    val e = li.as("a").join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey")
        && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val tri = e.as("ab").join(e.as("bc"), col("ab.v") === col("bc.u"))
      .join(e.as("ac"), col("ac.u") === col("ab.u") && col("ac.v") === col("bc.v"))
      .select(col("ab.u").as("a"), col("ab.v").as("b"), col("bc.v").as("c"))
    val naive = tri.select(explode(array(col("a"), col("b"), col("c"))).as("part_id"))
      .groupBy(col("part_id")).agg(count(lit(1)).as("triangles"))
    val fast = GraphQueries.copurchaseTriangles(spark, Sf0001)
    val diff = fast.exceptAll(naive).count() + naive.exceptAll(fast).count()
    Caches.drain()
    assert(diff == 0, s"degree-oriented and naive triangle counts diverge on $diff rows")
  }

  test("copurchase_clustering: coefficient bounded in [0, 1e6], consistent with triangles and wedges") {
    import spark.implicits._
    val cc = GraphQueries.clusteringCoefficient(spark, Sf0001)
      .select("part_id", "degree", "triangles", "cc_ppm")
      .as[(Long, Long, Long, Long)].collect()
    val tri = GraphQueries.copurchaseTriangles(spark, Sf0001)
      .as[(Long, Long)].collect().toMap
    Caches.drain()
    assert(cc.nonEmpty)
    cc.foreach { case (id, d, t, ppm) =>
      assert(d >= 2)
      assert(t == tri.getOrElse(id, 0L), s"part $id triangle mismatch")
      assert(t * 2 <= d * (d - 1), s"part $id has more triangles than wedges")
      assert(ppm >= 0 && ppm <= 1000000, s"part $id cc $ppm out of range")
      assert(ppm == 2 * t * 1000000L / (d * (d - 1)))
    }
    // every degree>=2 part appears exactly once, even triangle-free ones
    assert(cc.map(_._1).distinct.length == cc.length)
  }

  test("dedup_canonical: one survivor per component, survivor is in its own component") {
    val canon = Caches.persisted(DedupQueries.dedupCanonical(spark, Sf0001))
    val comp = DedupQueries.dedupComponents(spark, Sf0001)
    // exactly one row per canonical label, and sizes agree with components
    assert(canon.groupBy(col("canonical")).count().filter(col("count") > 1).count() == 0)
    val mismatched = canon.join(comp,
        canon("kept_doc") === comp("doc_id") && canon("canonical") === comp("canonical"),
        "left_anti").count()
    val sizeWrong = canon.join(
        comp.groupBy(col("canonical")).agg(count(lit(1)).as("sz")), "canonical")
      .filter(col("component_size") =!= col("sz")).count()
    // the survivor really is the longest member (ties: smallest id)
    val chars = Tables.documents(spark, Sf0001).select(col("doc_id"), col("n_chars"))
    val beats = comp.join(chars, "doc_id")
      .join(canon.select(col("canonical"), col("kept_doc"), col("kept_chars")), "canonical")
      .filter(col("n_chars") > col("kept_chars")
        || (col("n_chars") === col("kept_chars") && col("doc_id") < col("kept_doc")))
      .count()
    Caches.drain()
    assert(mismatched == 0, s"$mismatched survivors not members of their component")
    assert(sizeWrong == 0, s"$sizeWrong component sizes disagree")
    assert(beats == 0, s"$beats component members beat their chosen survivor")
  }

  test("er_candidates: bucket-expansion passes ≡ direct blocked self-join") {
    val toks = split(col("p_name"), " ")
    val p = Tables.part(spark, Sf0001)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        element_at(toks, 1).as("head"), element_at(toks, -1).as("tail"))
    val direct = p.as("a").join(p.as("b"),
        col("a.p_partkey") < col("b.p_partkey")
          && col("a.p_brand") === col("b.p_brand") && col("a.p_type") === col("b.p_type")
          && (col("a.head") === col("b.head") || col("a.tail") === col("b.tail")))
      .select(col("a.p_partkey").as("part_a"), col("b.p_partkey").as("part_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("dist"))
      .filter(col("dist") <= 3)
    val fast = DedupQueries.erCandidates(spark, Sf0001)
    val diff = fast.exceptAll(direct).count() + direct.exceptAll(fast).count()
    Caches.drain()
    assert(diff == 0, s"multi-pass blocking and direct self-join diverge on $diff rows")
  }

  test("er_golden_records: clusters partition the matched parts; survivorship fields dominate members") {
    import spark.implicits._
    val pairs = graft.dedup.DedupQueries.erCandidates(spark, Sf0001)
      .select("part_a", "part_b").as[(Long, Long)].collect()
    val out = graft.dedup.DedupQueries.erGoldenRecords(spark, Sf0001)
      .select("cluster_id", "n_members", "canonical_part", "max_size", "max_price_cents")
      .as[(Long, Long, Long, Long, Long)].collect()
    Caches.drain()
    assert(out.nonEmpty)
    // driver-side replication of the same 4 synchronous min-label rounds
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      val snap = lbl
      lbl = adj.map { case (v, ns) => v -> (ns.map(snap) :+ snap(v)).min }
    }
    val clusters = lbl.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    assert(out.map(_._1).toSet == clusters.keySet)
    val parts = Tables.part(spark, Sf0001)
      .select(col("p_partkey"), col("p_size").cast("long"),
        round(col("p_retailprice") * 100).cast("bigint"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    out.foreach { case (cid, n, canon, maxSize, maxPrice) =>
      val members = clusters(cid)
      assert(n == members.size && n >= 2)
      assert(canon == members.min)
      assert(maxSize == members.map(parts(_)._1).max)
      assert(maxPrice == members.map(parts(_)._2).max)
    }
  }

  test("bloom_decontaminate ≡ decontaminate (Bloom stage is a pure prefilter)") {
    val plain = TrainingPrep.decontaminate(spark, Sf0001)
    val bloom = TrainingPrep.bloomDecontaminate(spark, Sf0001)
    val diff = plain.exceptAll(bloom).count() + bloom.exceptAll(plain).count()
    Caches.drain()
    assert(diff == 0, s"Bloom-prefiltered result diverges on $diff rows")
  }

  test("bloom_might_contain has no false negatives and rejects most non-members") {
    import spark.implicits._
    val members = (1L to 2000L).toDF("x")
    val bloom = members.agg(expr("bloom_agg(xxhash64(x), 10000L, 131072L)").as("bf")).scalar()
    val probe = (1L to 20000L).toDF("x")
      .withColumn("hit", call_function("bloom_might_contain", bloom, xxhash64(col("x"))))
    val missed = probe.filter(col("x") <= 2000 && !col("hit")).count()
    val falsePos = probe.filter(col("x") > 2000 && col("hit")).count()
    assert(missed == 0, s"$missed false negatives — Bloom contract broken")
    // 2k items in 128k bits ⇒ fpp well under 1%; 18k non-members probe it
    assert(falsePos < 180, s"$falsePos false positives out of 18000 — filter mis-sized")
  }

  test("graph_sssp: reaches exactly the BFS frontier, seed at 0, dist bounded by 1e6·hops") {
    // Same seed rule, same round budget, weights in (0, 1e6] ⇒ the SSSP
    // reachable set equals BFS's, the hub's distance is 0, and every
    // distance is positive and at most hops·10⁶ (each edge costs ≤ 10⁶).
    import spark.implicits._
    val hops = GraphQueries.bfsHops(spark, Sf0001)
      .as[(Long, Long)].collect().toMap
    Caches.drain()
    val dist = GraphQueries.ssspWeighted(spark, Sf0001)
      .as[(Long, Long)].collect().toMap
    Caches.drain()
    assert(dist.keySet == hops.keySet, "weighted relaxation changed the reachable set")
    val seed = hops.collectFirst { case (v, 0L) => v }.get
    assert(dist(seed) == 0L)
    dist.foreach { case (v, d) =>
      assert(d <= hops(v) * 1000000L, s"part $v: dist $d exceeds ${hops(v)} hops × 1e6")
      if (v != seed) assert(d > 0L, s"part $v: non-seed at distance 0")
    }
  }

  test("copurchase_hits: top-k authorities are ppm-normalized, led by the max, drawn from the part set") {
    import spark.implicits._
    val top = GraphQueries.copurchaseHits(spark, Sf0001)
      .as[(Long, Long)].collect()
    Caches.drain()
    assert(top.length == 20)
    // max-normalization contract: the leader scores exactly 10⁶, everyone
    // is in (0, 10⁶], and the list is sorted (score desc, id asc)
    assert(top.head._2 == 1000000L)
    assert(top.forall { case (_, a) => a > 0L && a <= 1000000L })
    assert(top.sameElements(top.sortBy { case (p, a) => (-a, p) }))
    val parts = Tables.lineitem(spark, Sf0001)
      .select(col("l_partkey")).distinct().as[Long].collect().toSet
    assert(top.forall { case (p, _) => parts.contains(p) })
  }

  test("graph_kcore: distributed peel ≡ driver-side reference peel (same rounds)") {
    import spark.implicits._
    val got = GraphQueries.kcore(spark, Sf0001)
      .as[(Long, Long)].collect().toMap
    Caches.drain()
    // independent straightforward peel: adjacency sets in driver memory
    val li = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_partkey")).as[(Long, Long)].collect()
    val pairs = li.distinct.groupBy(_._1).valuesIterator.flatMap { ls =>
      val ps = ls.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    var adj: Map[Long, Set[Long]] =
      (pairs.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) })
        .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
    for (_ <- 1 to 4) {
      val keep = adj.collect { case (v, ns) if ns.size >= 3 => v }.toSet
      adj = adj.collect { case (v, ns) if keep(v) =>
        v -> ns.filter(keep) }.filter(_._2.nonEmpty)
    }
    val expected = adj.map { case (v, ns) => v -> ns.size.toLong }
    assert(got == expected)
    assert(got.nonEmpty, "3-core empty at sf0.001 — witness exercises nothing")
    assert(got.valuesIterator.forall(_ >= 3),
      "a surviving vertex has degree < k after the final peel")
  }

  test("item_cf_recs: distributed CF ≡ driver-side brute-force buyer-set cosine") {
    import spark.implicits._
    val got = GraphQueries.itemCfRecs(spark, Sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    Caches.drain()
    val ordCust = Tables.orders(spark, Sf0001)
      .select(col("o_orderkey"), col("o_custkey")).as[(Long, Long)].collect().toMap
    val li = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_partkey")).as[(Long, Long)].collect()
    val cp = li.flatMap { case (ok, pk) => ordCust.get(ok).map(c => (c, pk)) }.distinct
    val buyers: Map[Long, Set[Long]] =
      cp.groupBy(_._2).map { case (p, cs) => p -> cs.map(_._1).toSet }
    val co = scala.collection.mutable.Map.empty[(Long, Long), Long]
    cp.groupBy(_._1).valuesIterator.foreach { ps =>
      val s = ps.map(_._2).distinct.sorted
      for (i <- s.indices; j <- i + 1 until s.length)
        co((s(i), s(j))) = co.getOrElse((s(i), s(j)), 0L) + 1L
    }
    val expected = co.toSeq.filter(_._2 >= 2)
      .flatMap { case ((u, v), c) => Seq((u, v, c), (v, u, c)) }
      .map { case (item, other, c) =>
        (item, other, c, c * c * 1000000L / (buyers(item).size * buyers(other).size)) }
      .groupBy(_._1).valuesIterator.flatMap { rows =>
        rows.sortBy { case (_, other, _, s) => (-s, other) }.take(5)
      }.toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("textrank_keywords: top-20 sorted, positive fixed-point ranks, words from the corpus vocabulary") {
    import spark.implicits._
    val kw = graft.text.TextQueries.textrankKeywords(spark, Sf0001)
      .as[(String, Long)].collect()
    Caches.drain()
    assert(kw.length == 20)
    assert(kw.forall(_._2 > 0L))
    assert(kw.sameElements(kw.sortBy { case (w, r) => (-r, w) }))
    val vocab = Tables.documents(spark, Sf0001)
      .select(explode(graft.text.TextQueries.tokens(col("text"))).as("w"))
      .distinct().as[String].collect().toSet
    assert(kw.forall { case (w, _) => vocab.contains(w) })
    // a keyword must keep high-ranked company: the graph is vocabulary-wide,
    // so a uniform rank (no propagation happened) would leave every score at
    // init 10¹²/n — require genuine spread between the top and the median
    assert(kw.head._2 > kw.last._2, "no rank spread — propagation did not run")
  }
}
