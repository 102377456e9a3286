package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.DedupQueries
import graft.pipelines.TrainingPrep

/** Streaming face of the corpus-prep operators: documents arrive as a
  * stream (crawl ingest) and join reference data that is static for the
  * run. Complements [[StreamingEvents]] (watermarked windows, stateful
  * sessions) with the remaining Structured Streaming join shape: the
  * **stream-static join**, which Spark executes statelessly — the static
  * side is planned once per micro-batch and, broadcast, never shuffles the
  * stream side.
  */
object StreamingCorpus {

  /** Streaming benchmark decontamination — the stream-static twin of
    * [[TrainingPrep.decontaminate]]: each arriving document explodes to its
    * distinct word 5-grams (narrow), inner-joins the broadcast benchmark
    * gram set (stateless), and aggregates shared-gram counts per document.
    *
    * The count aggregation keys on the ingest-time window, so its state is
    * bounded by the watermark: a document's counts finalize once the
    * watermark passes its window — O(docs per window) state, never
    * O(stream history). Emit with `outputMode("update")` (partials as they
    * refine) or `"append"` (finalized rows only).
    *
    * @param docs streaming DataFrame with `doc_id`, `text`, and an
    *             event-time `ingest_ts` column
    * @param benchGrams static benchmark gram set (one `gram` column), e.g.
    *                   [[TrainingPrep.benchmarkGrams]]
    * @param watermark late-data tolerance; finalization lag in append mode
    * @param aggWindow event-time window the per-doc counts key on — the
    *                  state-lifetime knob, tuned TOGETHER with `watermark`
    *                  (state ≈ docs per `aggWindow` + `watermark`; a short
    *                  watermark with the old hard-coded 1 h window would
    *                  have kept state far longer than the caller asked)
    */
  def decontaminate(docs: DataFrame, benchGrams: DataFrame,
      watermark: String = "1 hour", aggWindow: String = "1 hour"): DataFrame =
    docs.withWatermark("ingest_ts", watermark)
      .select(col("doc_id"), col("ingest_ts"),
        explode(TrainingPrep.ngrams(col("text"), TrainingPrep.NGram)).as("gram"))
      // static side is batch-computable at query definition, so the same
      // size gate as the batch twin applies: broadcast when it fits, else
      // each micro-batch stream-static joins shuffled on `gram`. The gate
      // count runs ONCE here (stream definition), never per micro-batch,
      // so the eager-count cost the batch twins memoize away is already
      // amortized by the streaming lifecycle.
      .join(graft.Plans.broadcastIfSmall(benchGrams, benchGrams.count()), "gram")
      .groupBy(window(col("ingest_ts"), aggWindow), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("doc_id"), col("n_shared"))

  /** One LSH band-bucket posting of one streaming document. */
  case class BandDoc(band: Int, bh: Long, doc_id: Long, ingest_ts: Timestamp, sig: Seq[Long])

  /** A streamed near-dup candidate: the pair and its MinHash-estimated
    * Jaccard ((matching signature positions)/64, the unbiased estimator).
    * Exact verification stays a batch concern ([[DedupQueries.dedupNear]]'s
    * `shingle_set` pass) — the stream carries signatures, never text. */
  case class NearDupCandidate(doc_a: Long, doc_b: Long, est_jaccard: Double)

  // Public for the same reason as KvUpsert's BucketedOp: Janino-generated
  // encoder code cannot call accessors on a private class.
  case class BucketEntry(docId: Long, sig: Seq[Long], tsMs: Long)

  /** Streaming near-duplicate detection — the crawl-ingest question "is
    * this new document a near-dup of anything recently seen?" answered
    * online with the SAME banding scheme as the batch path
    * ([[DedupQueries.dedupNear]]: 64-hash `minhash_sig`, 32 bands × 2
    * rows): each arriving doc posts one row per band; per (band, hash)
    * bucket, `flatMapGroupsWithState` pairs it against the bucket's live
    * members and emits candidates with the signature-estimated Jaccard.
    *
    * State shape at scale: one entry per posting within the dedup horizon —
    * exactly the batch index, sliced to the horizon and spread across
    * (band, hash) buckets that SCALING.md rule 10 keeps sparse. Entries
    * evict by event time (`horizonMs`), so state is O(docs in horizon × 32),
    * never O(stream history). A pair sharing k bands is emitted k times
    * (at-least-once per band, as in any per-band LSH index); downstream
    * dedups with `dropDuplicatesWithinWatermark` or batch `distinct`.
    *
    * @param docs streaming `doc_id`/`text`/`ingest_ts` frame
    * @param horizonMs dedup horizon: how far back a new doc is compared
    */
  def nearDupCandidates(docs: DataFrame, watermark: String = "1 hour",
      horizonMs: Long = 3600L * 1000): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    // Respect an upstream watermark (e.g. a dropDuplicatesWithinWatermark
    // redelivery guard chained in front): Spark forbids redefining it, and
    // the upstream bound is the caller's stated lateness tolerance.
    val hasWatermark = docs.queryExecution.logical.collectFirst {
      case _: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => ()
    }.isDefined
    val bounded = if (hasWatermark) docs else docs.withWatermark("ingest_ts", watermark)
    DedupQueries.withBandBuckets(
      bounded
        .select(col("doc_id"), col("ingest_ts"), expr("minhash_sig(text)").as("sig"))
        .filter(size(col("sig")) > 0))
      .select(col("band"), col("bh"), col("doc_id"), col("ingest_ts"), col("sig"))
      .as[BandDoc]
      .groupByKey(d => (d.band, d.bh))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        updateBucket(horizonMs))
  }

  /** Bucket-state update: pair each arriving doc against live members (and
    * earlier arrivals in the same batch), append it, evict by horizon. */
  private def updateBucket(horizonMs: Long)(
      key: (Int, Long),
      rows: Iterator[BandDoc],
      state: GroupState[List[BucketEntry]]): Iterator[NearDupCandidate] = {
    val wm = state.getCurrentWatermarkMs()
    // State eviction is watermark-relative (an entry is dead once no
    // future arrival could pair with it), but the PAIRING cut is relative
    // to the arriving doc's own event time — with late data the watermark
    // lags arrivals, and the state filter alone would emit pairs farther
    // apart than the horizon contract promises.
    var live = state.getOption.getOrElse(Nil).filter(_.tsMs >= wm - horizonMs)
    val out = List.newBuilder[NearDupCandidate]
    rows.toSeq.sortBy(d => (d.ingest_ts.getTime, d.doc_id)).foreach { d =>
      live.foreach { e =>
        if (e.docId != d.doc_id && math.abs(d.ingest_ts.getTime - e.tsMs) <= horizonMs) {
          val matches = e.sig.iterator.zip(d.sig.iterator).count { case (a, b) => a == b }
          out += NearDupCandidate(
            math.min(e.docId, d.doc_id), math.max(e.docId, d.doc_id),
            matches.toDouble / e.sig.length)
        }
      }
      live ::= BucketEntry(d.doc_id, d.sig, d.ingest_ts.getTime)
    }
    if (live.isEmpty) state.remove()
    else {
      state.update(live)
      // wake up once the horizon has certainly passed the newest entry;
      // must stay ahead of the watermark or Spark rejects the timestamp
      state.setTimeoutTimestamp(math.max(live.map(_.tsMs).max + horizonMs, wm + 1))
    }
    out.result().iterator
  }

  /** Streaming Misra-Gries heavy hitters — the streaming twin of the batch
    * `word_heavy_hitters` sketch, completing the sketch family's streaming
    * parity (HLL, GK quantiles, and Count-Min already have twins in
    * [[StreamingEvents]]).
    *
    * One ≤ k-counter [[graft.functions.MgBuffer]] lives in the streaming
    * aggregation state; each micro-batch folds its tokens in through the
    * aggregator's `reduce` and partial buffers combine with the mergeable-
    * summaries COMBINE (Agarwal et al. 2013) — the SAME algebra the batch
    * plan applies across partitions. Consequence: the membership guarantee
    * (every item with true frequency > n/(k+1) is present) holds under ANY
    * micro-batch split of the stream, while the counter values themselves
    * remain split-dependent — so, exactly as in batch, only membership
    * leaves the operator. State is O(k) forever: this is the sketch whose
    * point is that unbounded streams need no watermark to stay bounded.
    *
    * @param docs streaming DataFrame with a `text` column
    * @param k    counter budget; guarantees membership above n/(k+1) */
  def heavyHitters(docs: DataFrame, k: Int = 49): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(graft.text.TextQueries.tokens(col("text"))).as("word"))
      .as[String]
      .groupByKey(_ => 0)
      .agg(new graft.functions.MisraGries(k).toColumn.name("summary"))
      .toDF("g", "summary")
      .select(col("summary"))
  }

  /** The 1-row PSI reference statistics for [[driftPsi]], derived from a
    * static corpus dir's in-domain slice (`source = src1`, the same slice
    * [[graft.pipelines.DataSelection.corpusDriftPsi]] anchors on): the 9
    * decile-value edges at integer ranks, the reference's own 10 bin
    * counts, and its size. Computed once batch-side, broadcast to every
    * micro-batch. */
  def psiReference(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ref = graft.Tables.documents(spark, dir)
      .filter(col("source") === "src1")
      .select(col("doc_id"), col("n_chars"))
    val ranked = ref.select(col("n_chars"),
      row_number().over(Window.orderBy(col("n_chars"), col("doc_id"))).as("rn"))
    val nRef = ref.agg(count(lit(1)).as("n_ref"))
    val edgeRanks = nRef
      .select(explode(sequence(lit(1), lit(9))).as("i"), col("n_ref"))
      .select(expr("(i * n_ref + 9) div 10").as("rn"))
    val edges = ranked.join(broadcast(edgeRanks), "rn")
      .agg(sort_array(collect_list(col("n_chars"))).as("edges"))
    val refCounts = ref.crossJoin(broadcast(edges))
      .select(expr("cast(size(filter(edges, e -> n_chars >= e)) as bigint)").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))
      .agg(collect_list(struct(col("bin"), col("c"))).as("pairs"))
      .select(expr(
        """transform(sequence(0, 9), i ->
          |  aggregate(filter(pairs, p -> p.bin = i), CAST(0 AS BIGINT), (a, x) -> a + x.c))"""
          .stripMargin).as("ref_counts"))
    edges.crossJoin(refCounts).crossJoin(nRef)
  }

  /** Streaming distribution-drift monitor — the stream-static twin of
    * [[graft.pipelines.DataSelection.corpusDriftPsi]]: arriving documents
    * bin against the broadcast reference edges (stateless, in-projection),
    * ONE watermark-bounded aggregation per ingest window collects the 10
    * bin counts as an array, and the PSI (same +1/+10 Laplace smoothing,
    * same micro-nat snapping) computes inline from the broadcast reference
    * statistics — one exact integer per closed window, the "has the crawl
    * shifted since the reference was drawn?" alarm.
    *
    * State is O(open windows × 10 bins); multi-agg restrictions never
    * bite because the window total and the 10 bin counts come out of the
    * SAME aggregation. */
  def driftPsi(docs: DataFrame, reference: DataFrame,
      watermark: String = "1 hour", aggWindow: String = "1 hour"): DataFrame =
    docs.withWatermark("ingest_ts", watermark)
      .crossJoin(broadcast(reference.select(col("edges"))))
      .select(col("ingest_ts"),
        expr("cast(size(filter(edges, e -> n_chars >= e)) as bigint)").as("bin"))
      .groupBy(window(col("ingest_ts"), aggWindow))
      .agg(count(lit(1)).as("n_cur"),
        // 10 conditional sums in the SAME aggregation as the total — fixed
        // 11-long state per open window, never a per-doc list
        array((0 until 10).map(i =>
          sum(when(col("bin") === i, lit(1L)).otherwise(lit(0L)))): _*).as("cur_counts"))
      .crossJoin(broadcast(reference.select(col("ref_counts"), col("n_ref"))))
      .select(col("window.start").as("window_start"), col("n_cur"),
        expr(
          """aggregate(sequence(0, 9), CAST(0 AS BIGINT), (acc, i) ->
            |  acc + ((element_at(ref_counts, i + 1) + 1) * (n_cur + 10)
            |         - (element_at(cur_counts, i + 1) + 1) * (n_ref + 10))
            |    * cast(round(ln(((element_at(ref_counts, i + 1) + 1) * (n_cur + 10))
            |        / ((element_at(cur_counts, i + 1) + 1) * (n_ref + 10))) * 1000000) as bigint)
            |    div ((n_ref + 10) * (n_cur + 10)))""".stripMargin).as("psi_micro"))

  /** Streaming first-occurrence vocabulary monitor — the online face of
    * [[graft.text.CorpusStats.vocabGrowth]]'s `min(doc_id)` core: every
    * word type emits exactly ONE row, the first time any document carries
    * it, tagged with the smallest doc_id of that first micro-batch. Wire it
    * to a counting sink and you have the live Heaps' curve ("is today's
    * crawl still adding vocabulary?") without re-scanning history.
    *
    * Semantics: "first" is first ARRIVAL — the streaming notion; within
    * the first batch the smallest doc_id wins, so a single-batch replay of
    * a static corpus equals the batch `min(doc_id)` exactly
    * (parity-tested). State is one boolean per word TYPE — bounded by the
    * vocabulary, not the stream (the Heaps' curve itself says this grows
    * sublinearly), which is why this operator needs no watermark; the
    * n-gram variant of the same monitor should instead key on
    * [[graft.dedup.DedupQueries]]-style 64-bit fingerprints and shard the
    * state store, noted for scale. */
  def newTokens(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), explode(graft.text.TextQueries.tokens(col("text"))).as("term"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        updateFirstSeen)
      .toDF("term", "first_doc")
  }

  /** Emit-once state update: a term's state flips to `true` on its first
    * batch and the term never emits again. */
  private def updateFirstSeen(
      term: String,
      rows: Iterator[(Long, String)],
      state: GroupState[Boolean]): Iterator[(String, Long)] =
    if (state.exists) Iterator.empty
    else {
      state.update(true)
      Iterator.single((term, rows.map(_._1).min))
    }

  /** Online duplicate-chunk detector — the streaming twin of
    * [[TrainingPrep.chunkDupRate]]: each arriving document is cut into the
    * same [[TrainingPrep.RagWindow]]/[[TrainingPrep.RagStride]] retrieval
    * windows keyed by the portable md5-prefix hash, and a
    * `(chunk_hash, doc_id)` row is emitted the moment a chunk hash arrives
    * from a document OTHER than the hash's first-seen one — the live
    * boilerplate flag an ingest pipeline raises while the batch job only
    * reports it after the fact.
    *
    * State per chunk hash: the ascending list of distinct docs seen — the
    * hash-index entry the batch operator builds offline. A production
    * deployment bounds it with a TTL/timeout (boilerplate recurs
    * continuously, so eviction only re-emits one first-seen row after a
    * quiet period); the parity suite pins exact agreement with the batch
    * twin's duplicated-hash set.
    *
    * Determinism: within a micro-batch the group's rows are unordered, so
    * "first seen" is the batch MINIMUM doc_id — a total rule the batch
    * expectation reproduces when batches arrive in doc order. */
  def dupChunks(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = TrainingPrep.RagWindow
    val s = TrainingPrep.RagStride
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("bigint"))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0L, (n - 1) div $s),
           |  i -> cast(conv(substring(md5(array_join(
           |         slice(toks, cast(i * $s as int) + 1, $w), ' ')), 1, 15), 16, 10) as bigint))"""
          .stripMargin)).as("chunk_hash"))
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        updateDupChunks)
      .toDF("chunk_hash", "doc_id")
  }

  /** Per-hash update: emit every NEW distinct document except the very
    * first one ever seen for this hash (batch-min as the in-batch rule). */
  private def updateDupChunks(
      hash: Long,
      rows: Iterator[(Long, Long)],
      state: GroupState[Seq[Long]]): Iterator[(Long, Long)] = {
    val seen = state.getOption.getOrElse(Seq.empty)
    val newDocs = rows.map(_._1).toSeq.distinct.sorted.filterNot(seen.contains)
    if (newDocs.isEmpty) Iterator.empty
    else {
      val emit = if (seen.isEmpty) newDocs.tail else newDocs
      state.update(seen ++ newDocs)
      emit.iterator.map(d => (hash, d))
    }
  }

  // ── Stateless scrub twins ─────────────────────────────────────────────
  // The pre-tokenization passes (PII redaction, mojibake scoring, HTML
  // extraction, code detection) are per-row narrow projections of
  // codegen'd built-ins, so their streaming face is a STATELESS map: no
  // watermark, no state store, any output mode, identical cost model to
  // the batch scan. Each twin reuses the batch family's public Column
  // builders verbatim, so batch/stream parity is by construction —
  // StreamingSuite pins it against the registered batch queries. Input:
  // any streaming (or static) DataFrame with `doc_id` and `text`.

  /** Streaming twin of [[graft.text.PiiQueries.piiRedact]]: masked text +
    * total span count (counted pre-redaction, as in batch). */
  def piiRedact(docs: DataFrame): DataFrame = {
    val classes = graft.text.PiiQueries.Classes
    val total = classes.map(c => col(s"n_${c._1}")).reduce(_ + _)
    docs
      .select(col("doc_id") +: col("text").as("orig") +:
        graft.text.PiiQueries.scanColumns(col("text")): _*)
      .select(col("doc_id"),
        graft.text.PiiQueries.redactColumn(col("orig")).as("redacted"),
        total.as("n_spans"))
  }

  /** Streaming twin of [[graft.text.EncodingRepair.mojibakeScore]]. */
  def mojibakeScore(docs: DataFrame): DataFrame =
    docs.select(col("doc_id") +: graft.text.EncodingRepair.scoreColumns("text"): _*)
      .withColumn("is_mojibake", col("n_sig") + col("n_repl") > 0)

  /** Streaming twin of [[graft.text.HtmlQueries.htmlExtract]]. */
  def htmlExtract(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.text.HtmlQueries.extractColumn(col("text")).as("extracted"),
      length(col("text")).cast("bigint").as("n_chars_html"))
      .withColumn("n_chars_text", length(col("extracted")).cast("bigint"))

  /** Streaming twin of [[graft.text.CodeDetect.codeDetect]]. */
  def codeDetect(docs: DataFrame): DataFrame =
    docs.select(col("doc_id") +: length(col("text")).cast("bigint").as("n_chars") +:
      graft.text.CodeDetect.signalColumns(col("text")): _*)
      .withColumn("score_ppm", graft.text.CodeDetect.scoreColumn)
      .withColumn("is_code", col("score_ppm") >= graft.text.CodeDetect.ThresholdPpm)

  /** Streaming twin of [[graft.text.UrlQueries.urlCanonical]] — input
    * carries a `url` column (crawl frontier stream). */
  def urlCanonical(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("url"),
      graft.text.UrlQueries.canonicalColumn("url").as("canonical_url"))

  /** Streaming twin of [[graft.text.HtmlQueries.htmlLinks]]: `text` is
    * the raw markup; explode is stateless under Structured Streaming, so
    * this stays a per-row map (one input row → N link rows in the same
    * micro-batch). */
  def htmlLinks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(filter(
        regexp_extract_all(col("text"), lit(graft.text.HtmlQueries.AnchorPat), lit(1)),
        x => x.rlike("^https?://"))).as("link"))
      .withColumn("canonical_link", graft.text.UrlQueries.canonicalColumn("link"))
}
