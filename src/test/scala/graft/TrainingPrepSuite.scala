package graft

import org.apache.spark.sql.functions._

import graft.pipelines.TrainingPrep

/** Engine-internal invariants for the training-prep operators — conservation
  * laws and plan shapes that hold independently of the driver's DuckDB
  * compare (which pins exact values at sf0.01). */
class TrainingPrepSuite extends SparkSpec {

  test("decontaminate: only non-benchmark docs, each sharing >= 1 gram; benchmark side broadcasts") {
    val df = TrainingPrep.decontaminate(spark, Sf0001)
    val benchIds = Tables.documents(spark, Sf0001)
      .filter(col("source") === "src0").select("doc_id")
    assert(df.join(benchIds, "doc_id").count() == 0,
      "a benchmark doc flagged itself as contaminated")
    assert(df.filter(col("n_shared") < 1).count() == 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark gram set must broadcast, got:\n$plan")
  }

  test("seq_pack: token mass is conserved per source and chunk ids are dense from 0") {
    val packed = TrainingPrep.seqPack(spark, Sf0001)
    val bySource = packed.groupBy("source")
      .agg(sum("chunk_tokens").as("packed_tokens"),
        min("chunk_id").as("min_chunk"), max("chunk_id").as("max_chunk"),
        countDistinct("chunk_id").as("n_chunks"))
    val direct = Tables.documents(spark, Sf0001)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("bigint")).as("direct_tokens"))
    val joined = bySource.join(direct, "source").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("packed_tokens") == r.getAs[Long]("direct_tokens"),
        s"token mass not conserved for ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("min_chunk") == 0L)
      // A doc's chunk is the one holding its FIRST token, so a document
      // longer than ChunkTokens legitimately skips ids — assert only the
      // direction that must hold for any corpus: the max chunk id cannot
      // exceed the total token count's chunk, and ids are no denser than
      // one per doc.
      assert(r.getAs[Long]("max_chunk") <= r.getAs[Long]("direct_tokens") / 512,
        s"chunk id beyond token mass for ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("n_chunks") <= r.getAs[Long]("max_chunk") + 1,
        s"more distinct chunk ids than the id range allows for ${r.getAs[String]("source")}")
    }
    // The prefix sum must stay per-shard: no global single-partition window.
    val plan = packed.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"seq_pack window must partition by source, not collapse to one partition:\n$plan")
  }

  test("doc_repetition: per-doc counters are mutually consistent") {
    val bad = TrainingPrep.docRepetition(spark, Sf0001)
      .filter(col("n_distinct") > col("n_tokens") ||
        col("top_cnt") > col("n_tokens") ||
        col("top_cnt") * col("n_distinct") < col("n_tokens"))
    assert(bad.count() == 0, "pigeonhole violated: top_cnt * n_distinct >= n_tokens must hold")
  }

  test("quality_classifier: every doc scored, token mass conserved, exact driver-side score") {
    val scored = TrainingPrep.qualityClassifier(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scored.keySet == docs.keySet, "one verdict per document")
    assert(scored.values.exists(_._3 == 0L) && scored.values.exists(_._3 == 1L),
      "keep gate is non-degenerate on the synthetic corpus")
    // recompute one document's score with an independent driver-side model
    def weight(b: Long): Long = ((b * 1103515245L + 12345L) >> 16) % 256L - 128L
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) & 4095L
    }
    val (id, text) = docs.maxBy(_._1)
    val toks = text.split(" ").filter(_.nonEmpty)
    val expected = toks.map(t => weight(bucket(t))).sum
    val (nTok, raw, keep) = scored(id)
    assert(nTok == toks.length.toLong)
    assert(raw == expected, s"doc $id: engine $raw vs driver $expected")
    assert(keep == (if (raw >= 0) 1L else 0L))
  }

  test("train_split: partition of the corpus, deterministic, ~80/10/10") {
    val docs = Tables.documents(spark, Sf0001)
    val total = docs.count()
    val split = TrainingPrep.trainSplit(spark, Sf0001)
    assert(split.agg(sum("n_docs")).head.getLong(0) == total,
      "splits must partition the corpus exactly")
    val byName = split.groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val train = byName.getOrElse("train", 0L).toDouble / total
    assert(train > 0.6 && train < 0.95, s"train share $train out of tolerance for 0.8")
    // Re-running yields byte-identical assignment (pure arithmetic, no RNG).
    val again = TrainingPrep.trainSplit(spark, Sf0001)
    assert(split.exceptAll(again).count() == 0 && again.exceptAll(split).count() == 0)
  }

  test("results invariant under shuffle partition count (driver hash-compare depends on it)") {
    // The DuckDB oracle hash-compares values, so any partition-count
    // sensitivity (order-dependent double folds, first() without ordering)
    // is a latent correctness flake. Run each new query under two partition
    // counts and require identical sorted output.
    val queries = Seq("decontaminate", "seq_pack", "doc_repetition", "train_split",
      "bigram_topk", "events_quantile_sketch", "training_pipeline", "stratified_sample",
      "doc_chunks", "word_heavy_hitters")
    val original = spark.conf.get("spark.sql.shuffle.partitions")
    def run(name: String, parts: String): Seq[String] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try SparkEntry.queries(name)(spark, Sf0001)
        .collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", original)
    }
    queries.foreach { q =>
      assert(run(q, "3") == run(q, "17"), s"$q output depends on shuffle partition count")
    }
  }

  test("bigram_topk: 50 rows, counts non-increasing, selection via TakeOrdered (no global sort)") {
    val top = TrainingPrep.bigramTopk(spark, Sf0001)
    val rows = top.collect()
    assert(rows.length == 50)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "counts must be non-increasing")
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must use TakeOrderedAndProject, not a global Sort:\n$plan")
  }

  test("curriculum_phases: three ordered phases, conserved totals, near-tercile sizes") {
    val rows = graft.pipelines.TrainingPrep.curriculumPhases(spark, Sf0001)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val scored = graft.pipelines.TrainingPrep.qualityClassifier(spark, Sf0001)
    val nDocs = scored.count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "every doc lands in exactly one phase")
    // score ranges must be disjoint and increasing phase over phase
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getLong(4) < hi.getLong(3),
        s"phase ${lo.getLong(0)} max must sit below phase ${hi.getLong(0)} min")
    }
    // exact-tercile property: phase 1 is the smallest prefix of the score
    // order reaching >= ceil(n/3) docs — ties kept together
    val n1 = rows(0).getLong(1)
    assert(n1 * 3 >= nDocs, "phase 1 must reach the first tercile")
    val c1 = rows(0).getLong(4) // max_score of phase 1
    val below = scored.filter(org.apache.spark.sql.functions.col("raw_score") < c1).count()
    assert(below * 3 < nDocs, "removing the cut score must drop below the tercile")
  }

  test("quality_auc: exact Mann-Whitney ≡ driver-side all-pairs count; bounded; classes total the corpus") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val Seq((nPos, nNeg, aucPpm)) =
      TrainingPrep.qualityAuc(spark, Sf0001).as[(Long, Long, Long)].collect().toSeq
    val nDocs = Tables.documents(spark, Sf0001).count()
    assert(nPos > 0 && nNeg > 0 && nPos + nNeg == nDocs)
    assert(aucPpm >= 0L && aucPpm <= 1000000L)
    // brute-force pair count at test scale: concordant + half of ties
    val rows = TrainingPrep.qualityClassifier(spark, Sf0001)
      .join(Tables.documents(spark, Sf0001).select(col("doc_id"), col("lang")), "doc_id")
      .select(col("raw_score"), (col("lang") === "en").as("pos"))
      .as[(Long, Boolean)].collect()
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(aucPpm == u2 * 1000000L / (2L * pos.length * neg.length))
  }

  test("shard_rendezvous: minimal disruption — removing a shard moves only that shard's docs") {
    import spark.implicits._
    val assign = TrainingPrep.shardRendezvous(spark, Sf0001)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(assign.values.toSet.subsetOf((0L until 16L).toSet))
    // every shard carries load at this corpus size (uniform hash sanity)
    assert(assign.values.toSet.size == 16)
    // driver-side rendezvous with shard `victim` removed: only the
    // victim's documents may be reassigned — the property that makes HRW
    // the right placement scheme for elastic worker pools
    val victim = assign.values.groupBy(identity).maxBy(_._2.size)._1
    def hrw(docId: Long, shards: Seq[Long]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      shards.maxBy { s =>
        val h = md.digest(s"$docId:$s".getBytes("UTF-8"))
          .take(8).map(b => f"$b%02x").mkString.take(15)
        (java.lang.Long.parseLong(h, 16), -s)
      }
    }
    val without = (0L until 16L).filterNot(_ == victim)
    assign.foreach { case (doc, shard) =>
      val re = hrw(doc, without)
      if (shard != victim) assert(re == shard, s"doc $doc moved $shard -> $re")
      else assert(re != victim)
    }
  }

  test("filter_funnel telescopes: each stage's input is the previous stage's output; kills sum exactly") {
    val rows = graft.pipelines.TrainingPrep.filterFunnel(spark, Sf0001)
      .orderBy("stage")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    Caches.drain()
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    rows.foreach { case (_, _, nIn, nOut, nKilled) =>
      assert(nKilled == nIn - nOut && nOut <= nIn && nOut >= 0)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._4, s"stage ${b._1} input ${b._3} != stage ${a._1} output ${a._4}")
    }
    // attribution is exhaustive: kills telescope to n0 - kept
    assert(rows.map(_._5).sum == rows.head._3 - rows.last._4)
  }

  test("quality_pr_curve: recall non-decreasing and precision->base-rate as the threshold lowers") {
    val rows = graft.pipelines.TrainingPrep.qualityPrCurve(spark, Sf0001)
      .orderBy(col("threshold").desc)
      .select("n_pred_pos", "tp", "precision_ppm", "recall_ppm", "f1_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    Caches.drain()
    assert(rows.nonEmpty)
    // walking the threshold DOWN: predicted-positives and TP only grow
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(lo._1 > hi._1 && lo._2 >= hi._2 && lo._4 >= hi._4,
        s"curve not monotone: $hi -> $lo")
    }
    // the lowest threshold predicts everything: recall 1, precision = base rate
    val last = rows.last
    assert(last._4 == 1000000L, s"full-corpus recall != 1: $last")
    assert(last._3 == last._2 * 1000000L / last._1)
    rows.foreach { case (pp, tp, prec, rec, f1) =>
      assert(tp <= pp && prec <= 1000000L && rec <= 1000000L && f1 <= 1000000L)
    }
  }

  test("train_split_grouped: near-dup components never straddle splits; plain per-doc split does") {
    val rows = graft.pipelines.TrainingPrep.trainSplitGrouped(spark, Sf0001)
      .select("doc_id", "rep_id", "split")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    Caches.drain()
    // every document assigned exactly once, all three splits populated
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.map(_._3).distinct.sorted.toSeq == Seq("test", "train", "validation"))
    // the leakage invariant: same representative => same split, on every
    // component (vacuous only if there were no multi-doc components)
    val byRep = rows.groupBy(_._2).filter(_._2.length > 1)
    assert(byRep.nonEmpty, "fixture has no multi-doc near-dup components — invariant untested")
    byRep.foreach { case (rep, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"component $rep straddles splits: ${members.toSeq}")
    }
    // contrast: the per-doc hash split (train_split's assignment) DOES
    // break at least one component — the bug this operator exists to fix
    def docSplit(id: Long): String = {
      val b = ((id * 1000003L) % 999999937L) % 100L
      if (b < 80) "train" else if (b < 90) "validation" else "test"
    }
    assert(byRep.exists { case (_, members) =>
      members.map(m => docSplit(m._1)).distinct.length > 1
    }, "per-doc split never straddles a component here — contrast lost, pick a bigger fixture")
  }
}
