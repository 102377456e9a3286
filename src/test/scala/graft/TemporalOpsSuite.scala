package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.events.EventQueries
import graft.pipelines.TrainingPrep
import graft.text.TextQueries

/** Round-9 temporal / retrieval / privacy operators: CDC MERGE with
  * deletes, the SCD2 point-in-time join, exact lag-1 autocorrelation,
  * positional-index phrase search, and k-anonymity generalization. Each
  * test pins a semantic invariant the DuckDB hash-compare alone would not
  * localize. */
class TemporalOpsSuite extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  test("merge_upsert: insert, update, delete, and re-activation branches on a pinned fixture") {
    // cut is 2024-01-20; users exercise every MERGE branch:
    //  1 base-only signup (no delta: carried through)
    //  2 signup then delta error (delta delete wins)
    //  3 base error then delta signup (delta re-activation wins)
    //  4 activity but never a status event (never inserted)
    //  5 delta-only signup (pure insert: no base row)
    //  6 base signup then later base error (base-side latest wins, deleted)
    val rows = Seq(
      (1L, "2024-01-02T00:00:00Z", 1L, "signup", 1.0, "{}"),
      (2L, "2024-01-03T00:00:00Z", 1L, "click", 1.0, "{}"),
      (3L, "2024-01-04T00:00:00Z", 2L, "signup", 1.0, "{}"),
      (4L, "2024-01-22T00:00:00Z", 2L, "error", 1.0, "{}"),
      (5L, "2024-01-05T00:00:00Z", 3L, "error", 1.0, "{}"),
      (6L, "2024-01-23T00:00:00Z", 3L, "signup", 1.0, "{}"),
      (7L, "2024-01-06T00:00:00Z", 4L, "view", 1.0, "{}"),
      (8L, "2024-01-24T00:00:00Z", 5L, "signup", 1.0, "{}"),
      (9L, "2024-01-07T00:00:00Z", 6L, "signup", 1.0, "{}"),
      (10L, "2024-01-08T00:00:00Z", 6L, "error", 1.0, "{}"))
      .map { case (id, t, u, ty, v, p) => (id, ts(t), u, ty, v, p) }
    val dir = Files.createTempDirectory("graft-merge").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = EventQueries.mergeUpsert(spark, dir)
      .orderBy("user_id")
      .select("user_id", "status", "n_events", "last_us")
      .as[(Long, String, Long, Long)].collect().toSeq
    def us(s: String) = Instant.parse(s).toEpochMilli * 1000L
    assert(got == Seq(
      (1L, "signup", 2L, us("2024-01-03T00:00:00Z")),
      (3L, "signup", 2L, us("2024-01-23T00:00:00Z")),
      (5L, "signup", 1L, us("2024-01-24T00:00:00Z"))))
  }

  test("merge_upsert: split-and-merge equals recompute from the unsplit stream") {
    // The MERGE algebra (add counts / max activity / coalesce status /
    // delete on error) must be indistinguishable from folding the whole
    // stream at once — same invariant shape as pricing_incremental, at
    // key level with deletes.
    val whole = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("n_events"),
        max(col("us")).as("last_us"),
        max(when(col("event_type").isin("signup", "error"),
          struct(col("us"), col("event_id"), col("event_type")))).as("st"))
      .select(col("user_id"), col("st.event_type").as("status"),
        col("n_events"), col("last_us"))
      .filter(col("status") === "signup")
    val merged = EventQueries.mergeUpsert(spark, Sf0001)
    assert(merged.count() > 0)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("scd2_revenue: versions tile time — every purchase matches exactly one version or tier -1") {
    val purchases = Tables.events(spark, Sf0001)
      .filter(col("event_type") === "purchase").count()
    val out = EventQueries.scd2Revenue(spark, Sf0001)
    val total = out.agg(sum("n_purchases")).collect()(0).getLong(0)
    // disjoint validity intervals ⇒ the left join neither drops nor
    // duplicates facts
    assert(total == purchases)
  }

  test("scd2_revenue: interval-join formulation agrees with the window as-of formulation") {
    // Two plans, one semantics: the SCD2 equi-join + validity residual
    // must give the same per-tier rollup as carrying the last signup
    // forward over the per-user event order.
    val e = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = e
      .withColumn("cur_tier",
        last(when(col("event_type") === "signup", col("event_id") % 3),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("cur_tier"), lit(-1L)).as("tier"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(round(col("value") * 100).cast("bigint")).as("cents"))
    val viaJoin = EventQueries.scd2Revenue(spark, Sf0001)
    assert(viaJoin.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaJoin).isEmpty)
  }

  test("autocorr: |r1| bounded by 1, exact integer parts consistent, full day span") {
    val rows = EventQueries.autocorrDaily(spark, Sf0001)
      .select("event_type", "n_days", "acov_num", "var_num", "r1")
      .as[(String, Long, Long, Long, Double)].collect()
    val nTypes = Tables.events(spark, Sf0001).select("event_type").distinct().count()
    assert(rows.length == nTypes)
    rows.foreach { case (_, nDays, num, den, r1) =>
      assert(nDays >= 1 && den > 0)
      // Cauchy-Schwarz over the lag pairs, denominator over all n days
      assert(math.abs(num) <= den)
      assert(r1 == num.toDouble / den)
    }
  }

  test("phrase_search: matches a driver-side brute-force scan of the corpus") {
    val phrase = TextQueries.Phrase
    val expected = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val toks = text.split("[^\\p{L}]+").filter(_.nonEmpty)
        id -> toks.indices.dropRight(phrase.size - 1)
          .count(i => phrase.indices.forall(j => toks(i + j) == phrase(j)))
      }
      .filter(_._2 > 0).toMap
    val got = TextQueries.phraseSearch(spark, Sf0001)
      .as[(Long, Long)].collect().map { case (id, n) => id -> n.toInt }.toMap
    assert(got == expected)
  }

  test("twap: per-user span is last-minus-first, value bounded by observed extremes, single-event users excluded") {
    val truth = Tables.events(spark, Sf0001)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), (max(col("us")) - min(col("us"))).as("span"),
        min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (u, n, span, lo, hi) => u -> (n, span, lo, hi) }.toMap
    val out = EventQueries.twapPerUser(spark, Sf0001)
      .select("user_id", "span_us", "twap")
      .as[(Long, Long, Double)].collect()
    // exactly the multi-event users appear, with the full interval span
    assert(out.map(_._1).toSet == truth.collect {
      case (u, (n, span, _, _)) if n > 1 && span > 0 => u
    }.toSet)
    out.foreach { case (u, span, twap) =>
      val (_, trueSpan, lo, hi) = truth(u)
      assert(span == trueSpan, s"user $u span $span != $trueSpan")
      // a weighted average of held values cannot leave the excluded-last
      // observations' hull only by the last value, which carries no weight
      assert(twap >= lo - 1e-9 && twap <= hi + 1e-9, s"user $u twap $twap outside [$lo, $hi]")
    }
  }

  test("doc_sample_weighted: exactly k, deterministic, and biased toward heavy documents") {
    val a = TrainingPrep.docSampleWeighted(spark, Sf0001)
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    val b = TrainingPrep.docSampleWeighted(spark, Sf0001)
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    assert(a.length == 100 && a.toSeq == b.toSeq)
    val corpusMean = Tables.documents(spark, Sf0001)
      .agg(avg("n_chars")).collect()(0).getDouble(0)
    val sampleMean = a.map(_._2).sum.toDouble / a.length
    // weight = n_chars ⇒ the sample must oversample long documents; the
    // draw is hash-deterministic, so this margin cannot flake
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("ab_test: variants partition the users, counts are sufficient for the z-statistic") {
    val rows = EventQueries.abTest(spark, Sf0001)
      .select("variant", "n_users", "n_converted")
      .as[(String, Long, Long)].collect()
      .map { case (v, n, c) => v -> ((n, c)) }.toMap
    assert(rows.keySet == Set("A", "B"))
    val totalUsers = Tables.events(spark, Sf0001).select("user_id").distinct().count()
    assert(rows.values.map(_._1).sum == totalUsers)
    rows.values.foreach { case (n, c) => assert(c <= n) }
    // the exact counts reconstruct the two-proportion z-stat: just prove
    // the arithmetic is well-defined on this data (pooled p strictly
    // inside (0,1) so the denominator is nonzero)
    val (na, ca) = rows("A"); val (nb, cb) = rows("B")
    val p = (ca + cb).toDouble / (na + nb)
    assert(p > 0 && p < 1)
    val z = (ca.toDouble / na - cb.toDouble / nb) /
      math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    assert(!z.isNaN && math.abs(z) < 10)
  }

  test("doc_sample_per_lang: exactly k per stratum, WindowGroupLimit bounds the shuffle") {
    val out = TrainingPrep.docSamplePerLang(spark, Sf0001, 20)
    val perLang = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val truth = Tables.documents(spark, Sf0001).groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(perLang.keySet == truth.keySet)
    perLang.foreach { case (lang, n) =>
      assert(n == math.min(20L, truth(lang)), s"$lang drew $n of ${truth(lang)}")
    }
    // the k-bounded rank filter must push a WindowGroupLimit below the
    // exchange — per-partition top-k BEFORE the shuffle, O(k·|langs|) moved
    val plan = TrainingPrep.docSamplePerLang(spark, Sf0001, 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"rank pushdown lost:\n$plan")
  }

  test("copurchase_communities: matches a driver-side reference of 3 synchronous LPA rounds") {
    val edges = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_partkey")).as[(Long, Long)].collect()
      .groupBy(_._1).values
      .flatMap { basket =>
        val ps = basket.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
      }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2) }
    var labels: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      val snapshot = labels
      labels = adj.map { case (v, ns) =>
        val counts = ns.groupBy(snapshot).view.mapValues(_.size)
        v -> counts.toSeq.minBy { case (label, cnt) => (-cnt, label) }._1
      }
    }
    val got = graft.graph.GraphQueries.copurchaseCommunities(spark, Sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got == labels)
  }

  test("attribution: every purchase credited exactly once, to its session's true entry event") {
    val out = EventQueries.sessionAttribution(spark, Sf0001)
      .select("entry_type", "n_purchases", "cents")
      .as[(String, Long, Long)].collect()
    val purchases = Tables.events(spark, Sf0001)
      .filter(col("event_type") === "purchase")
    assert(out.map(_._2).sum == purchases.count())
    assert(out.map(_._3).sum == purchases
      .agg(sum(round(col("value") * 100).cast("bigint"))).collect()(0).getLong(0))
    // driver-side reference sessionizer: same 30-min gap, same total order
    // sort on full event-time precision (the query orders by ts, event_id);
    // the session gap itself is whole-second, as in the operator
    val evts = Tables.events(spark, Sf0001)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        unix_timestamp(col("ts")).as("sec"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, Long, String)].collect()
    val expected = evts.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._4))
      var entry = s.head._5
      var lastSec = s.head._3
      s.map { e =>
        if (e._3 - lastSec > 1800) entry = e._5
        lastSec = e._3
        (e._5, entry)
      }
    }.collect { case ("purchase", entry) => entry }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.map(t => t._1 -> t._2).toMap == expected)
  }

  test("rolling_wau: contribution formulation equals a brute-force per-day distinct recount") {
    val ud = Tables.events(spark, Sf0001)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct().as[(Long, Long)].collect()
    val maxD = ud.map(_._2).max
    val expected = (ud.map(_._2).min to maxD + 6).filter(_ <= maxD).map { day =>
      day -> ud.collect { case (u, d) if d >= day - 6 && d <= day => u }.distinct.length.toLong
    }.filter(_._2 > 0).toMap
    val got = EventQueries.rollingActiveUsers(spark, Sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    // ramp-up: day 1 of the span cannot exceed day 7's window
    assert(got(got.keys.min) <= got.values.max)
  }

  test("embed_gram: exact fixed-point Gram cells match a driver-side fold") {
    val sv = Tables.embeddings(spark, Sf0001).select("embedding")
      .as[Seq[Float]].collect()
      .map(_.map(x => math.floor(x.toDouble * 10000 + 0.5).toLong).toArray)
    val d = sv.head.length
    val got = graft.similarity.SimilarityQueries.gramMatrix(spark, Sf0001)
      .select("i", "j", "g_scaled").as[(Long, Long, Long)].collect()
      .map { case (i, j, g) => (i, j) -> g }.toMap
    assert(got.size == d * (d + 1) / 2)
    // full row 0 exactly, and PSD diagonal
    (0 until d).foreach { j =>
      assert(got((0L, j.toLong)) == sv.map(v => v(0) * v(j)).sum, s"cell (0,$j)")
    }
    (0 until d).foreach(i => assert(got((i.toLong, i.toLong)) >= 0))
  }

  test("round-9 operators are invariant under the shuffle partition count") {
    // the determinism claims above are all per-run; this pins the stronger
    // property — the same rows under different physical parallelism
    val names = Seq("events_merge_upsert", "events_scd2_revenue", "events_autocorr",
      "events_twap", "events_ab_test", "phrase_search", "docs_k_anonymous",
      "doc_sample_weighted", "doc_sample_per_lang", "copurchase_communities",
      "events_ewma", "graph_bfs_hops", "hybrid_search_rrf", "mmr_rerank",
      "events_attribution_linear", "token_apportionment", "doc_shard_rendezvous",
      "corpus_drift_psi", "events_rolling_median", "score_quantile_normalize",
      "events_unconverted_views", "nation_top2_lateral", "events_markov_stationary",
      "events_conversion_lag", "orders_entropy", "orders_mutual_info",
      "orders_reconcile_lines", "er_golden_records", "copurchase_clustering",
      "prf_search", "nation_revenue_share", "part_abc_class", "region_supplier_hhi",
      "nation_revenue_gini", "copurchase_assortativity",
      "customer_rfm", "orders_benford", "events_seasonality",
      "copurchase_ra_links", "dedup_eval", "quality_calibration", "ann_recall",
      "events_pattern_match", "events_anomaly_mad",
      "frequent_triples", "fk_orphan_audit", "word_zipf", "pq_distortion",
      "events_erasure_audit", "events_trend_robust", "events_cohort_ltv",
      "token_fertility", "lineitem_skew_report", "events_churn_hazard",
      "events_cusum", "graph_sssp", "copurchase_hits",
      "item_cf_recs", "graph_kcore", "textrank_keywords",
      "quality_auc", "trigram_search", "coverage_select",
      "events_hll_rollup", "events_audience_overlap", "embed_mutual_nn",
      "embed_hard_negatives", "knn_label_eval", "events_burst",
      "vocab_growth", "doc_novelty", "corpus_overlap", "source_log_odds",
      "embed_outliers", "ivf_silhouette", "events_holt",
      "oov_rate", "dedup_savings", "events_trimmed_stats", "pack_efficiency",
      "source_clusters", "search_rbo", "events_decayed_topk",
      "events_bot_score", "embed_random_negatives", "ann_recall_curve",
      "quality_isotonic", "quality_conformal")
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    def digest(): Map[String, Seq[String]] = names.map { n =>
      val df = SparkEntry.queries(n)(spark, Sf0001)
      val cols = df.columns.sorted
      val rows = df.select(cols.head, cols.tail: _*)
        .collect().map(_.toString).sorted.toSeq
      Caches.drain()
      n -> rows
    }.toMap
    try {
      spark.conf.set(key, "3")
      val a = digest()
      spark.conf.set(key, "17")
      val b = digest()
      names.foreach(n => assert(a(n) == b(n), s"$n diverges across partition counts"))
      assert(a.values.forall(_.nonEmpty))
    } finally spark.conf.set(key, before)
  }

  test("k_anonymous: every published cell has >= k members (or is the terminal remainder) and mass is conserved") {
    val k = 10
    val out = TrainingPrep.kAnonymous(spark, Sf0001, k)
      .select("lang", "source", "n_docs").as[(String, String, Long)].collect()
    val total = Tables.documents(spark, Sf0001).count()
    assert(out.map(_._3).sum == total)
    out.foreach { case (lang, source, n) =>
      assert(n >= k || (lang == "*" && source == "*"),
        s"cell ($lang, $source) published with $n < $k members")
    }
    // generalized rows only where the original cell was below k
    assert(out.count { case (l, s, _) => l == "*" && s != "*" } == 0)
  }

  test("linear attribution: money conserves to the cent across buckets; remainder goes to the earliest touch") {
    val out = EventQueries.linearAttribution(spark, Sf0001)
      .select("touch_type", "n_credits", "cents")
      .as[(String, Long, Long)].collect()
    val totalCents = Tables.events(spark, Sf0001)
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("bigint"))).collect()(0).getLong(0)
    assert(out.map(_._3).sum == totalCents,
      "linear split must conserve purchase cents exactly")
    // pinned fixture: one session, 3 touches then a 10-cent purchase —
    // shares 3/3/3 with the remainder cent on the EARLIEST touch (click)
    val rows = Seq(
      (1L, "2024-01-01T00:00:00Z", 1L, "click", 0.0, "{}"),
      (2L, "2024-01-01T00:05:00Z", 1L, "view", 0.0, "{}"),
      (3L, "2024-01-01T00:10:00Z", 1L, "error", 0.0, "{}"),
      (4L, "2024-01-01T00:15:00Z", 1L, "purchase", 0.10, "{}"))
      .map { case (id, t, u, ty, v, p) => (id, ts(t), u, ty, v, p) }
    val dir = Files.createTempDirectory("graft-linattr").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val fx = EventQueries.linearAttribution(spark, dir)
      .select("touch_type", "n_credits", "cents")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fx == Map("click" -> ((1L, 4L)), "view" -> ((1L, 3L)), "error" -> ((1L, 3L))))
  }

  test("graph_bfs_hops: matches a driver-side BFS from the same hub") {
    val edges = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_partkey")).as[(Long, Long)].collect()
      .groupBy(_._1).values
      .flatMap { basket =>
        val ps = basket.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
      }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2) }
    val hub = adj.toSeq.map { case (v, ns) => (v, ns.size) }
      .minBy { case (v, d) => (-d, v) }._1
    var dist = Map(hub -> 0L)
    for (_ <- 1 to 3) {
      val relaxed = dist.toSeq.flatMap { case (v, h) =>
        adj(v).map(n => n -> (h + 1))
      } ++ dist.toSeq
      dist = relaxed.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    }
    val got = graft.graph.GraphQueries.bfsHops(spark, Sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got == dist)
    assert(got(hub) == 0L && got.values.max <= 3L)
  }

  test("events_ewma: exact alpha=1/2 geometric fold matches a driver-side reference") {
    val evts = Tables.events(spark, Sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .as[(Long, Long, Long, Long)].collect()
    val expected = evts.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3))
      s.indices.map { i =>
        val window = s.slice(math.max(0, i - 15), i + 1).map(_._4)
        // newest-highest powers of two: fold the reversed window as a·2 + x
        val num = window.reverse.foldLeft(0L)((a, x) => a * 2 + x)
        val den = (1L << window.length) - 1
        s(i)._3 -> (window.length.toLong, num / den)
      }
    }.toMap
    val got = EventQueries.ewmaPerUser(spark, Sf0001)
      .select("event_id", "n_window", "ewma_cents")
      .as[(Long, Long, Long)].collect()
      .map { case (e, n, c) => e -> (n, c) }.toMap
    assert(got == expected)
  }

  test("events_burst: pinned fixture finds exactly the elevated episode; flat series stays base") {
    // "click": 5/day for 10 days except days 4-6 at 15/day — one sustained
    // 3-day episode the DP must fuse into a single interval. "view": flat
    // 5/day — must emit NO burst rows (any interval here means the γ
    // entry cost is being ignored).
    val rows = (0 until 10).flatMap { d =>
      val nClick = if (d >= 4 && d <= 6) 15 else 5
      val day = s"2024-01-${"%02d".format(d + 1)}T12:00:00Z"
      (0 until nClick).map(i => (d * 100L + i, ts(day), i.toLong, "click", 1.0, "{}")) ++
        (0 until 5).map(i => (d * 100L + 50 + i, ts(day), i.toLong, "view", 1.0, "{}"))
    }
    val dir = Files.createTempDirectory("graft-burst").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.burstKleinberg(spark, dir)
      .select("event_type", "start_day", "end_day", "n_days", "n_events")
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    val day0 = Instant.parse("2024-01-01T12:00:00Z").toEpochMilli * 1000L / 86400000000L
    assert(got == Seq(("click", day0 + 4, day0 + 6, 3L, 45L)))
  }

  test("events_burst: Viterbi trajectory matches a driver-side integer DP on real data") {
    // same micro-nat int64 arithmetic re-implemented independently: per-day
    // counts → forward costs with strict-< switch rules → backtrack →
    // islands. Any divergence in the engine's aggregate()-fold encoding of
    // the DP (choice-bit packing, tie policy, init state) surfaces here.
    val byType = Tables.events(spark, Sf0001)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val d0 = byType.values.flatten.min
    val d1 = byType.values.flatten.max
    val g = 500000L
    val expected = byType.toSeq.flatMap { case (et, days) =>
      val cnt = days.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val dc = (d0 to d1).map(d => d -> cnt.getOrElse(d, 0L))
      val n = dc.size
      val total = dc.map(_._2).sum
      val lam0 = total.toDouble / n
      val a0 = math.round(lam0 * 1e6); val a1 = math.round(1.2 * total / n * 1e6)
      val l0 = math.round(math.log(lam0) * 1e6); val l1 = math.round(math.log(1.2 * total / n) * 1e6)
      var (c0, c1) = (0L, g)
      val ch = dc.map { case (_, c) =>
        val bit = (if (c1 < c0) 1 else 0) + (if (c0 + g < c1) 0 else 2)
        val (n0, n1) = (math.min(c0, c1) + (a0 - c * l0), math.min(c0 + g, c1) + (a1 - c * l1))
        c0 = n0; c1 = n1; bit
      }
      val states = new Array[Int](n)
      states(n - 1) = if (c1 < c0) 1 else 0
      for (i <- n - 1 to 1 by -1)
        states(i - 1) = if (states(i) == 0) ch(i) % 2 else ch(i) / 2
      // islands of consecutive burst days
      val bursts = dc.zip(states).foldLeft(List.empty[(Long, Long, Long, Long)]) {
        case (acc, ((day, c), 1)) => acc match {
          case (s, e, nd, ne) :: t if e == day - 1 => (s, day, nd + 1, ne + c) :: t
          case _ => (day, day, 1L, c) :: acc
        }
        case (acc, _) => acc
      }
      bursts.map { case (s, e, nd, ne) => (et, s, e, nd, ne) }
    }.sorted
    val got = EventQueries.burstKleinberg(spark, Sf0001)
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got == expected)
  }

  test("unconverted views: binned anti join equals a brute-force per-view scan") {
    val evts = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts) div 1000").as("ms"))
      .as[(Long, Long, String, Long)].collect()
    val purchasesByUser = evts.filter(_._3 == "purchase").groupBy(_._1)
      .view.mapValues(_.map(_._4)).toMap
    val expected = evts.filter(_._3 == "view").groupBy(_._1).map { case (u, vs) =>
      val ps = purchasesByUser.getOrElse(u, Array.empty[Long])
      val unconv = vs.count(v => !ps.exists(p => p >= v._4 && p < v._4 + 3600000L))
      u -> ((vs.length.toLong, unconv.toLong))
    }
    val got = EventQueries.unconvertedViews(spark, Sf0001)
      .as[(Long, Long, Long)].collect()
      .map { case (u, n, un) => u -> ((n, un)) }.toMap
    assert(got == expected)
    assert(got.values.exists(v => v._2 < v._1), "some views convert at this sf")
  }

  test("markov stationary: mass conserves within floor loss and matches a driver-side power iteration") {
    val out = EventQueries.markovStationary(spark, Sf0001)
      .select("event_type", "pi_ppt").as[(String, Long)].collect().toMap
    Caches.drain()
    assert(out.values.forall(_ >= 0))
    // each of 3 rounds loses < |cells| ppt to per-cell floor division
    assert(out.values.sum <= 1000000000000L)
    assert(out.values.sum >= 1000000000000L - 3 * 25 - 5)
    // driver-side reference with the identical per-cell floor arithmetic
    val trans = EventQueries.transitions(spark, Sf0001)
      .as[(String, String, Long)].collect()
    Caches.drain()
    val cFrom = trans.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val types = cFrom.keys.toSeq
    var pi = types.map(_ -> 1000000000000L / types.size).toMap
    for (_ <- 1 to 3) {
      pi = trans.groupBy(_._2).map { case (to, cells) =>
        to -> cells.map { case (from, _, c) => pi(from) * c / cFrom(from) }.sum
      }
    }
    assert(out == pi)
  }

  test("conversion lag: quantiles non-decreasing, inside the window, achievable by some converted view") {
    val out = EventQueries.conversionLag(spark, Sf0001)
      .select("q", "n_conversions", "lag_ms")
      .as[(Double, Long, Long)].collect().sortBy(_._1)
    Caches.drain()
    assert(out.map(_._1).toSeq == Seq(0.5, 0.9, 0.99))
    assert(out.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "lag quantiles must be non-decreasing in q")
    out.foreach { case (_, n, lag) =>
      assert(n > 0 && lag >= 0 && lag < 3600000L)
    }
  }

  test("events_rolling_median: lower median of the materialized window matches a driver-side sort") {
    val evts = Tables.events(spark, Sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .as[(Long, Long, Long, Long)].collect()
    val expected = evts.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._2, e._3))
      s.indices.map { i =>
        val window = s.slice(math.max(0, i - 14), i + 1).map(_._4).sorted
        s(i)._3 -> (window.length.toLong, window((window.length + 1) / 2 - 1))
      }
    }.toMap
    val got = EventQueries.rollingMedian(spark, Sf0001)
      .select("event_id", "n_window", "med_cents")
      .as[(Long, Long, Long)].collect()
      .map { case (e, n, c) => e -> ((n, c)) }.toMap
    assert(got == expected)
  }

  test("hybrid_search_rrf: fused score is exactly the integer RRF of the two rank lists") {
    val out = graft.pipelines.DataSelection.hybridSearchRrf(spark, Sf0001)
      .select("doc_id", "lex_rank", "dense_rank", "rrf_nano")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 20)
    out.foreach { case (id, lex, dense, rrf) =>
      assert(lex > 0 || dense > 0, s"doc $id in neither list")
      assert(lex <= 50 && dense <= 50)
      val expect = (if (lex > 0) 1000000000L / (60 + lex) else 0L) +
        (if (dense > 0) 1000000000L / (60 + dense) else 0L)
      assert(rrf == expect, s"doc $id rrf $rrf != $expect")
    }
    // the fused list must actually mix modalities: some docs from each side
    assert(out.exists(r => r._2 > 0 && r._3 == 0) || out.exists(_._2 > 0))
    assert(out.exists(_._3 > 0))
  }
  test("user_journey_topk: linear query-centric shape, jaccard consistent with a recount") {
    val df = EventQueries.userJourneyTopk(spark, Sf0001)
    val rows = df.collect()
    Caches.drain()
    assert(rows.nonEmpty && rows.length <= 20)
    // ranked best-first, ties by user_id; jaccard == n_common / n_union exactly
    val js = rows.map(_.getAs[Double]("jaccard"))
    assert(js.sameElements(js.sorted(Ordering[Double].reverse)), "must come back ranked")
    rows.foreach { r =>
      val (c, u, j) = (r.getAs[Long]("n_common"), r.getAs[Long]("n_union"), r.getAs[Double]("jaccard"))
      assert(c <= u && u > 0 && j == c.toDouble / u, s"inconsistent row $r")
    }
    // recount the best match driver-side from raw events
    val ev = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    def shingles(uid: Long): Set[String] = {
      val seq = ev.filter(_._1 == uid).sortBy(e => (e._2.getTime, e._3)).map(_._4)
      if (seq.length < 3) Set.empty
      else seq.sliding(3).map(_.mkString(" ")).toSet
    }
    val counts = ev.groupBy(_._1).map { case (u, es) => u -> es.length }
    val refUser = counts.toSeq.sortBy { case (u, n) => (-n, u) }.head._1
    val rs = shingles(refUser)
    val top = rows.head
    val ts = shingles(top.getAs[Long]("user_id"))
    assert(top.getAs[Long]("n_common") == (ts & rs).size, "n_common mismatch vs driver recount")
    assert(top.getAs[Long]("n_union") == (ts | rs).size, "n_union mismatch vs driver recount")
    // the plan must stay query-centric: broadcast reference, top-k not a global sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must be TakeOrdered:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the 1-row reference must broadcast:\n$plan")
  }
  test("user_journey_nll: matches a driver-side model-and-score recount") {
    val rows = EventQueries.userJourneyNll(spark, Sf0001).collect()
    Caches.drain()
    val ev = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (e._2, e._3)).map(_._4).toSeq
    }
    val pairs = byUser.toSeq.flatMap { case (u, seq) =>
      seq.zip(seq.tail).map { case (a, b) => (u, a, b) }
    }
    assert(rows.map(_.getAs[Long]("user_id")).toSet ==
      byUser.filter(_._2.length >= 2).keySet, "every multi-event user scored")
    val c = pairs.groupBy(p => (p._2, p._3)).map { case (k, v) => k -> v.size.toLong }
    val cFrom = pairs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val v = ev.map(_._4).distinct.length.toLong
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val expect = pairs.filter(_._1 == u).map { case (_, a, b) =>
        math.round(math.log((cFrom(a) + v).toDouble / (c((a, b)) + 1)) * 1000000)
      }.sum
      assert(r.getAs[Long]("nll") == expect, s"user $u nll ${r.getAs[Long]("nll")} != $expect")
      assert(r.getAs[Double]("avg_nll") >= 0.0 && r.getAs[Double]("avg_nll") < 10.0)
    }
  }
}
