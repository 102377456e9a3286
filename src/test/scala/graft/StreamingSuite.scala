package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingEvents
import graft.streaming.StreamingEvents.{Event, SessionSummary}

/** Structured Streaming operators driven through MemoryStream, checked
  * against their batch twins on the same data (streaming/batch parity). */
class StreamingSuite extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  /** Providers the stateful family is parametrized over: the on-heap
    * HDFS-backed default (all state resident — the streaming scale
    * ceiling) and RocksDB (state spilled off-heap — the 100× backend).
    * Operators must be provider-agnostic: same emissions, same
    * watermark/timeout behavior. */
  private val StateProviders = Seq("hdfs", "rocksdb")
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private def withStateProvider[T](provider: String)(body: => T): T = {
    val saved = spark.conf.getOption(ProviderKey)
    if (provider == "rocksdb")
      spark.conf.set(ProviderKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    else spark.conf.unset(ProviderKey)
    try body
    finally saved match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private val sample = Seq(
    Event(1, ts(0), 1, "click", 1.0),
    Event(2, ts(10), 1, "click", 2.0),
    Event(3, ts(70), 1, "view", 3.0),
    Event(4, ts(5), 2, "click", 4.0),
    Event(5, ts(130), 2, "view", 5.0),
    Event(6, ts(200), 1, "click", 6.0))

  test("readStream over the driver's events parquet equals the batch result") {
    // the real file-source path (not MemoryStream): learn the physical ts
    // encoding from a batch read and apply the same adaptive normalization
    // as Tables.events (nanos-as-long historically, timestamp[us] today)
    import spark.implicits._
    // nanosAsLong is already session-wide via GraftSession.builder
    val physical = spark.read.parquet(s"$Sf0001/events.parquet").schema
    // the file source monitors a DIRECTORY; stage the (read-only) table file
    val srcDir = java.nio.file.Files.createTempDirectory("graft-stream-src")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$Sf0001/events.parquet"),
      srcDir.resolve("events.parquet"))
    val stream = Tables.normalizeEventsTs(
      spark.readStream.schema(physical).parquet(srcDir.toString))
    val q = StreamingEvents.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly_file_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_file_stream").collect().map(_.toSeq).toSet
      val batch = StreamingEvents.hourlyCounts(Tables.events(spark, Sf0001))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("hourly counts: streaming result equals the batch result") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val input = MemoryStream[Event]
    val q = StreamingEvents.hourlyCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      val streamed = spark.table("hourly_stream")
        .select($"hour_start", $"event_type", $"n_events", $"total_value")
        .collect().map(_.toSeq).toSet
      val batch = StreamingEvents.hourlyCounts(sample.toDF())
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("sessionization: 30-min gap splits sessions, per-user summaries emitted") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val input = MemoryStream[Event]
    val q = StreamingEvents.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      // advance the watermark far enough to close and emit all sessions
      input.addData(Event(99, ts(10000), 9, "click", 0.0))
      q.processAllAvailable()
      input.addData(Event(100, ts(20000), 9, "click", 0.0))
      q.processAllAvailable()

      val out = spark.table("sessions_stream").as[SessionSummary].collect()
      val u1 = out.filter(_.user_id == 1).sortBy(_.start_sec)
      // user 1: events at minutes 0,10 | 70 | 200 → 3 sessions
      assert(u1.map(_.n_events).toSeq == Seq(2L, 1L, 1L))
      val u2 = out.filter(_.user_id == 2).sortBy(_.start_sec)
      // user 2: minutes 5 | 130 → 2 sessions
      assert(u2.map(_.n_events).toSeq == Seq(1L, 1L))
    } finally q.stop()
  }

  test("streaming exactly-once dedup: duplicate event_ids across batches emitted once") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val input = MemoryStream[Event]
    val q = input.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      input.addData(sample.take(3): _*) // replay: at-least-once delivery
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select($"event_id").as[Long].collect()
      assert(ids.sorted.toSeq == sample.map(_.event_id).sorted)
    } finally q.stop()
  }

  test("watermark-bounded dedup: dropDuplicatesWithinWatermark suppresses replays with O(window) state") {
    // dropDuplicates(event_id) keeps every key ever seen (the watermark only
    // evicts state when the event-time column is part of the key set);
    // dropDuplicatesWithinWatermark is the 100 TB form — same suppression
    // inside the delivery-replay horizon, state bounded by the watermark.
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val input = MemoryStream[Event]
    val q = input.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_wm_stream")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      // watermark is now max(ts)=200min − 1h = 140min: replay the one event
      // INSIDE that horizon (ts 200) — late-data filtering can't be what
      // suppresses it, only the dedup state can — plus a new event delivered
      // twice in the same batch
      val fresh = Event(7, ts(210), 2, "view", 7.0)
      input.addData(sample.last, fresh, fresh)
      q.processAllAvailable()
      val ids = spark.table("dedup_wm_stream").select($"event_id").as[Long].collect()
      assert(ids.sorted.toSeq == (sample.map(_.event_id) :+ 7L).sorted)
    } finally q.stop()
  }

  test("stream-static enrichment join: streaming events pick up static dimension columns") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val userDim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[Event]
    val q = input.toDF()
      .join(userDim, Seq("user_id"), "left")
      .writeStream.format("memory").queryName("enriched_stream")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      val out = spark.table("enriched_stream")
        .select($"event_id", $"tier").as[(Long, Option[String])].collect().toMap
      assert(out.size == sample.size)
      assert(out(1L).contains("gold") && out(4L).contains("silver"))
    } finally q.stop()
  }

  test("stream-stream join: clicks joined to purchases within a bounded event-time range") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    // the interval condition bounds the join state: purchases within 30min
    // after a click (operator defaults)
    val joined = StreamingEvents.intervalJoin(clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory").queryName("attrib_stream")
      .outputMode("append").start()
    try {
      clicks.addData(Event(1, ts(0), 1, "click", 0), Event(2, ts(100), 1, "click", 0))
      purchases.addData(Event(10, ts(20), 1, "purchase", 9.99), Event(11, ts(300), 1, "purchase", 5.0))
      q.processAllAvailable()
      val rows = spark.table("attrib_stream")
        .select($"click_id", $"purchase_id").as[(Long, Long)].collect().toSet
      // purchase@20min attributes to click@0min (within 30m); purchase@300min to neither
      assert(rows == Set((1L, 10L)))
    } finally q.stop()
  }

  test("stream-stream interval join: streaming attribution equals the batch twin on driver data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val clicks = evts.filter(_.event_type == "click")
    val purchases = evts.filter(_.event_type == "purchase")

    val cIn = MemoryStream[Event]
    val pIn = MemoryStream[Event]
    val q = StreamingEvents.intervalJoin(cIn.toDF(), pIn.toDF(), "6 hours", "12 hours")
      .writeStream.format("memory").queryName("attribution_stream")
      .outputMode("append").start()
    try {
      // split BOTH streams at one time boundary: batch-2 events are all
      // newer than batch-1's watermark (no late-input drops), and any click
      // old enough to have been evicted has a match window that ends before
      // the boundary (no lost cross-batch matches) — the exact discipline a
      // replayable ingest (kafka by time, files by mtime) gives for free
      val boundary = evts.map(_.ts.getTime).sorted.apply(evts.length / 2)
      cIn.addData(clicks.filter(_.ts.getTime < boundary): _*)
      pIn.addData(purchases.filter(_.ts.getTime < boundary): _*)
      q.processAllAvailable()
      cIn.addData(clicks.filter(_.ts.getTime >= boundary): _*)
      pIn.addData(purchases.filter(_.ts.getTime >= boundary): _*)
      q.processAllAvailable()
      val streamed = spark.table("attribution_stream")
        .select($"click_id", $"purchase_id", $"purchase_value")
        .as[(Long, Long, Double)].collect().toSet

      // batch twin: the SAME operator over batch frames (withWatermark is a
      // planning no-op there) — one code path, two execution modes
      val batch = StreamingEvents.intervalJoin(
          clicks.toSeq.toDS().toDF(), purchases.toSeq.toDS().toDF(), "6 hours", "12 hours")
        .select($"click_id", $"purchase_id", $"purchase_value")
        .as[(Long, Long, Double)].collect().toSet

      assert(streamed == batch,
        s"only streamed: ${streamed -- batch}; only batch: ${batch -- streamed}")
      assert(streamed.nonEmpty, "fixture events produce interval-join matches; none found")
    } finally q.stop()
  }

  test("outer interval join: unconverted clicks emit null rows only after the watermark closes their window") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamingEvents.intervalJoinOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attrib_outer_stream")
      .outputMode("append").start()
    def rows() = spark.table("attrib_outer_stream")
      .select($"click_id", $"purchase_id").as[(Long, Option[Long])].collect().toSet
    try {
      // c1 converts; c2 does not (no purchase within 30 min)
      clicks.addData(Event(1, ts(0), 1, "click", 0), Event(2, ts(100), 1, "click", 0))
      purchases.addData(Event(10, ts(20), 1, "purchase", 9.99))
      q.processAllAvailable()
      val early = rows()
      assert(early.contains((1L, Some(10L))), s"match not emitted eagerly: $early")
      assert(!early.exists(r => r._1 == 2L),
        s"unconverted click emitted BEFORE the watermark closed its window: $early")
      // advance event time on BOTH streams: the join's watermark is the MIN
      // across inputs, so a stale purchase stream alone pins it. 1 h lag
      // must pass c2's match window end (t=130 min); eviction emits the
      // null row on the following batch
      clicks.addData(Event(3, ts(400), 9, "click", 0))
      purchases.addData(Event(11, ts(400), 9, "purchase", 1.0))
      q.processAllAvailable()
      clicks.addData(Event(4, ts(500), 9, "click", 0))
      purchases.addData(Event(12, ts(500), 9, "purchase", 1.0))
      q.processAllAvailable()
      val late = rows()
      assert(late.contains((2L, None)),
        s"unconverted click never emitted after watermark passed: $late")

      // batch twin: same operator on batch frames — every streamed row must
      // appear there (the batch result additionally closes the tail clicks
      // a stream keeps open forever)
      val batch = StreamingEvents.intervalJoinOuter(
          Seq(Event(1, ts(0), 1, "click", 0), Event(2, ts(100), 1, "click", 0),
            Event(3, ts(400), 9, "click", 0), Event(4, ts(500), 9, "click", 0)).toDS().toDF(),
          Seq(Event(10, ts(20), 1, "purchase", 9.99),
            Event(11, ts(400), 9, "purchase", 1.0),
            Event(12, ts(500), 9, "purchase", 1.0)).toDS().toDF())
        .select($"click_id", $"purchase_id").as[(Long, Option[Long])].collect().toSet
      assert(late.subsetOf(batch), s"streamed rows not in batch twin: ${late -- batch}")
    } finally q.stop()
  }

  test("stream-static decontamination equals the batch result (broadcast join, bounded state)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    // Stream the non-benchmark documents in two micro-batches against the
    // static benchmark gram set; final (doc_id, n_shared) must equal the
    // batch operator's output on the same corpus.
    val corpus = Tables.documents(spark, Sf0001)
      .filter($"source" =!= "src0")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) => StreamingSuite.Doc(id, text, ts(id % 30)) }
    val bench = graft.pipelines.TrainingPrep.benchmarkGrams(spark, Sf0001)

    val input = MemoryStream[StreamingSuite.Doc]
    val q = graft.streaming.StreamingCorpus.decontaminate(input.toDF(), bench)
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode("update").start()
    try {
      val (first, second) = corpus.splitAt(corpus.length / 2)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(second: _*)
      q.processAllAvailable()
      // update mode re-emits refined rows; the latest row per doc is final
      // (each doc arrives in exactly one batch, so rows never refine here)
      val streamed = spark.table("decon_stream")
        .groupBy($"doc_id").agg(org.apache.spark.sql.functions.max($"n_shared").as("n_shared"))
        .as[(Long, Long)].collect().toSet
      val batch = graft.pipelines.TrainingPrep.decontaminate(spark, Sf0001)
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch, s"stream/batch divergence: $streamed vs $batch")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming PSI drift monitor: per-window integers match a driver-side recount") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val docs = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"source", $"n_chars").as[(Long, String, Long)].collect()
    // two ingest windows: even doc_ids land in hour 0, odd in hour 1
    val rows = docs.map { case (id, _, n) =>
      StreamingSuite.DocLen(id, n, ts((id % 2) * 60 + (id % 30)))
    }
    val reference = graft.streaming.StreamingCorpus.psiReference(spark, Sf0001)
    val input = MemoryStream[StreamingSuite.DocLen]
    val q = graft.streaming.StreamingCorpus.driftPsi(input.toDF(), reference)
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode("update").start()
    try {
      // deliver each window's docs in its own batch: one final row per window
      rows.groupBy(_.ingest_ts.getTime / 3600000L).toSeq.sortBy(_._1)
        .foreach { case (_, batch) =>
          input.addData(batch.toSeq: _*)
          q.processAllAvailable()
        }
      val streamed = spark.table("drift_stream")
        .select($"window_start", $"n_cur", $"psi_micro")
        .as[(java.sql.Timestamp, Long, Long)].collect()
        .map { case (w, n, p) => w.getTime -> ((n, p)) }.toMap
      // driver-side recount with the same decile edges and smoothing
      val ref = docs.filter(_._2 == "src1").map(r => (r._3, r._1)).sorted.map(_._1)
      val edges = (1 to 9).map(i => ref((i * ref.length + 9) / 10 - 1))
      def bins(xs: Seq[Long]): Seq[Long] =
        (0 until 10).map(b => xs.count(x => edges.count(_ <= x) == b).toLong)
      val refBins = bins(docs.filter(_._2 == "src1").map(_._3).toSeq)
      val expected = rows.groupBy(_.ingest_ts.getTime / 3600000L).map { case (hr, batch) =>
        val cur = bins(batch.map(_.n_chars).toSeq)
        val nCur = batch.length.toLong
        val nRef = ref.length.toLong
        val psi = (0 until 10).map { i =>
          val a = (refBins(i) + 1) * (nCur + 10)
          val b = (cur(i) + 1) * (nRef + 10)
          (a - b) * math.round(math.log(a.toDouble / b) * 1e6) / ((nRef + 10) * (nCur + 10))
        }.sum
        hr * 3600000L -> ((nCur, psi))
      }
      assert(streamed == expected, s"$streamed vs $expected")
      assert(streamed.size == 2)
    } finally q.stop()
  }

  test("streaming near-dup candidates equal the batch band self-join across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val corpus = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) => StreamingSuite.Doc(id, text, ts(id % 10)) }

    val input = MemoryStream[StreamingSuite.Doc]
    val q = graft.streaming.StreamingCorpus.nearDupCandidates(input.toDF())
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      val (first, second) = corpus.splitAt(corpus.length / 2)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(second: _*)
      q.processAllAvailable()
      val streamed = spark.table("neardup_stream")
        .select($"doc_a", $"doc_b", round($"est_jaccard", 9).as("e"))
        .distinct().as[(Long, Long, Double)].collect().toSet

      // batch twin through the SAME banding code path the batch operator
      // uses (DedupQueries.withBandBuckets) — candidate = any shared
      // (band, hash) bucket, estimate = matching signature positions / 64
      val nb = graft.dedup.DedupQueries.NumBands
      val bands = graft.dedup.DedupQueries.withBandBuckets(
        Tables.documents(spark, Sf0001)
          .select($"doc_id", expr("minhash_sig(text)").as("sig"))
          .filter(size($"sig") > 0))
        .select($"doc_id", $"sig", $"band", $"bh")
      val expected = bands.as("x").join(bands.as("y"), Seq("band", "bh"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          round(
            aggregate(zip_with(col("x.sig"), col("y.sig"),
                (a, b) => when(a === b, 1).otherwise(0)),
              lit(0), (acc, m) => acc + m).cast("double") / lit(nb * 2), 9).as("e"))
        .distinct().as[(Long, Long, Double)].collect().toSet

      assert(streamed == expected,
        s"only streamed: ${streamed -- expected}; only batch: ${expected -- streamed}")
      assert(streamed.nonEmpty)
      // self-consistency: the estimator is a fraction of 64
      streamed.foreach { case (_, _, e) => assert(e >= 0.0 && e <= 1.0) }
    } finally q.stop()
  }

  test("near-dup under redelivery: upstream watermark dedup prevents phantom pairs (multi-stateful chain)") {
    // Crawl ingest is at-least-once: the same document can be delivered
    // twice. Chaining dropDuplicatesWithinWatermark(doc_id) in FRONT of the
    // stateful near-dup (two stateful operators in one query — Spark 4
    // supports the chain in append mode) suppresses the replay before it
    // can post duplicate signatures into bucket state.
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val corpus = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) => StreamingSuite.Doc(id, text, ts(id % 10)) }
    val input = MemoryStream[StreamingSuite.Doc]
    val deduped = input.toDF()
      .withWatermark("ingest_ts", "2 hours")
      .dropDuplicatesWithinWatermark("doc_id")
    val q = graft.streaming.StreamingCorpus.nearDupCandidates(deduped)
      .writeStream.format("memory").queryName("neardup_replay_stream")
      .outputMode("append").start()
    try {
      input.addData(corpus: _*)
      q.processAllAvailable()
      input.addData(corpus.take(corpus.length / 2): _*) // redelivery
      q.processAllAvailable()
      val rows = spark.table("neardup_replay_stream")
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
      // no self-pairs, and no pair inflated beyond its 32-band multiplicity
      assert(rows.forall { case (a, b) => a != b })
      val expected = spark.table("neardup_replay_stream")
        .select($"doc_a", $"doc_b").distinct().as[(Long, Long)].collect().toSet
      val maxMult = rows.groupBy(identity).values.map(_.size).maxOption.getOrElse(0)
      assert(maxMult <= graft.dedup.DedupQueries.NumBands,
        s"pair emitted $maxMult times — redelivery leaked past the dedup into bucket state")
      assert(expected.nonEmpty)
    } finally q.stop()
  }

  test("streaming near-dup parity re-validated at sf0.1 (10x corpus, multi-batch)") {
    // Same parity claim as the sf0.001 test, at 5,000 documents across
    // three micro-batches — the bucket-state path exercised at a scale
    // where multi-doc buckets actually occur (mirrors DedupJaccardSuite's
    // 10x banding re-validation).
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val sf01 = "/root/testdata/sf0.1"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sf01)), s"$sf01 not present")

    val corpus = Tables.documents(spark, sf01)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, text) => StreamingSuite.Doc(id, text, ts(id % 10)) }
    val input = MemoryStream[StreamingSuite.Doc]
    val q = graft.streaming.StreamingCorpus.nearDupCandidates(input.toDF())
      .writeStream.format("memory").queryName("neardup_sf01_stream")
      .outputMode("append").start()
    try {
      corpus.grouped((corpus.length + 2) / 3).foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("neardup_sf01_stream")
        .select($"doc_a", $"doc_b").distinct().as[(Long, Long)].collect().toSet

      val bands = graft.dedup.DedupQueries.withBandBuckets(
        Tables.documents(spark, sf01)
          .select($"doc_id", expr("minhash_sig(text)").as("sig"))
          .filter(size($"sig") > 0))
        .select($"doc_id", $"band", $"bh")
      val expected = bands.as("x").join(bands.as("y"), Seq("band", "bh"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct().as[(Long, Long)].collect().toSet
      Caches.drain()
      assert(streamed == expected,
        s"${(streamed -- expected).size} only streamed, ${(expected -- streamed).size} only batch")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming misra-gries: membership contract holds under two different micro-batch splits") {
    import spark.implicits._
    val texts = Tables.documents(spark, Sf0001).select("text").as[String].collect()
    // exact truth, driver-side: every word with cnt*(k+1) > n MUST appear
    val toks = texts.flatMap(_.split("[^\\p{L}]+")).filter(_.nonEmpty)
    val n = toks.length.toLong
    val exact = toks.groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val mustHave = exact.collect { case (w, c) if c * 50 > n => w }.toSet
    assert(mustHave.nonEmpty)

    for ((parts, name) <- Seq((3, "mg_stream_a"), (7, "mg_stream_b"))) {
      implicit val sc = spark.sqlContext
      val input = MemoryStream[String]
      val q = graft.streaming.StreamingCorpus.heavyHitters(input.toDF().toDF("text"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        texts.grouped((texts.length + parts - 1) / parts).foreach { batch =>
          input.addData(batch: _*)
          q.processAllAvailable()
        }
        val summary = spark.table(name).as[Seq[String]].collect().head.toSet
        assert(summary.size <= 49)
        assert(mustHave.subsetOf(summary),
          s"$name missing guaranteed heavy hitters: ${mustHave -- summary}")
      } finally q.stop()
    }
  }

  test("streaming binned range join: views in the preceding hour per purchase, zero-view purchases restored") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val views = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamingEvents.rangeJoinViews(views.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("range_join_stream")
      .outputMode("append").start()
    try {
      // user 1: views at minutes 0, 30, 59 — purchase at minute 60 sees all
      // three ([0,60) window); purchase at minute 95 sees only 35 and 59...
      // wait: minute 95 window is [35, 95) → views at 59 only (0 and 30 are
      // out). user 2: purchase with NO views at all → must emit 0.
      views.addData(
        Event(1, ts(0), 1, "view", 0), Event(2, ts(30), 1, "view", 0),
        Event(3, ts(59), 1, "view", 0))
      purchases.addData(
        Event(10, ts(60), 1, "purchase", 1.0), Event(11, ts(95), 1, "purchase", 2.0),
        Event(12, ts(90), 2, "purchase", 3.0))
      q.processAllAvailable()
      // advance watermark on BOTH streams past every window so the outer
      // join evicts and the windowed agg finalizes (sentinels filtered out)
      views.addData(Event(98, ts(5000), 9, "view", 0))
      purchases.addData(Event(99, ts(5000), 9, "purchase", 0))
      q.processAllAvailable()
      views.addData(Event(96, ts(9000), 9, "view", 0))
      purchases.addData(Event(97, ts(9000), 9, "purchase", 0))
      q.processAllAvailable()
      val out = spark.table("range_join_stream")
        .filter($"user_id" =!= 9)
        .select($"event_id", $"views_1h").as[(Long, Long)].collect().toMap
      assert(out == Map(10L -> 3L, 11L -> 1L, 12L -> 0L), s"got $out")
    } finally q.stop()
  }

  test("streaming binned range join equals the batch operator on driver data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val views = evts.filter(_.event_type == "view")
    val purchases = evts.filter(_.event_type == "purchase")

    val vIn = MemoryStream[Event]
    val pIn = MemoryStream[Event]
    val q = StreamingEvents.rangeJoinViews(vIn.toDF(), pIn.toDF())
      .writeStream.format("memory").queryName("range_join_parity_stream")
      .outputMode("append").start()
    try {
      // same single-boundary split discipline as the interval-join parity
      // test: batch 2 is entirely newer than batch 1's watermark
      val boundary = evts.map(_.ts.getTime).sorted.apply(evts.length / 2)
      vIn.addData(views.filter(_.ts.getTime < boundary): _*)
      pIn.addData(purchases.filter(_.ts.getTime < boundary): _*)
      q.processAllAvailable()
      vIn.addData(views.filter(_.ts.getTime >= boundary): _*)
      pIn.addData(purchases.filter(_.ts.getTime >= boundary): _*)
      q.processAllAvailable()
      // flush: two rounds of far-future sentinels finalize eviction + agg
      val far = evts.map(_.ts.getTime).max
      Seq(far + 86400000L, far + 2 * 86400000L).zipWithIndex.foreach { case (t, i) =>
        vIn.addData(Event(900 + i, new Timestamp(t), 999999, "view", 0))
        pIn.addData(Event(910 + i, new Timestamp(t), 999999, "purchase", 0))
        q.processAllAvailable()
      }
      val streamed = spark.table("range_join_parity_stream")
        .filter($"user_id" =!= 999999)
        .select($"user_id", $"event_id", $"views_1h")
        .as[(Long, Long, Long)].collect().toSet

      // batch twin #1: the SAME operator on batch frames
      val batchSame = StreamingEvents.rangeJoinViews(
          views.toSeq.toDS().toDF(), purchases.toSeq.toDS().toDF())
        .select($"user_id", $"event_id", $"views_1h")
        .as[(Long, Long, Long)].collect().toSet
      // batch twin #2: the independently-implemented batch binned range join
      val batchIndep = graft.events.EventQueries.rangeJoinViews(spark, Sf0001)
        .as[(Long, Long, Long)].collect().toSet

      assert(streamed == batchSame,
        s"only streamed: ${streamed -- batchSame}; only batch: ${batchSame -- streamed}")
      assert(streamed == batchIndep,
        s"only streamed: ${streamed -- batchIndep}; only batch: ${batchIndep -- streamed}")
      assert(streamed.exists(_._3 > 0), "no purchase saw any preceding-hour view")
      assert(streamed.exists(_._3 == 0), "no zero-view purchase emitted")
    } finally q.stop()
  }

  test("streaming trending top-k: per-hour ranked types equal the batch window rank") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val input = MemoryStream[Event]
    val q = StreamingEvents.trendingTopK(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("trending_stream")
      .outputMode("append").start()
    try {
      val boundary = evts.map(_.ts.getTime).sorted.apply(evts.length / 2)
      input.addData(evts.filter(_.ts.getTime < boundary): _*)
      q.processAllAvailable()
      input.addData(evts.filter(_.ts.getTime >= boundary): _*)
      q.processAllAvailable()
      val far = evts.map(_.ts.getTime).max
      Seq(10, 20).foreach { days =>
        input.addData(Event(9100 + days, new Timestamp(far + days * 86400000L), 999999, "error", 0))
        q.processAllAvailable()
      }
      val sentinelHours = Seq(10, 20)
        .map(d => Math.floorDiv(far + d * 86400000L, 3600000L) * 3600L).toSet
      val got = spark.table("trending_stream")
        .as[StreamingEvents.TrendRow].collect()
        .filterNot(r => sentinelHours.contains(r.hour_start_sec))
        .map(r => (r.hour_start_sec, r.rank, r.event_type, r.n)).toSet

      val expected = evts.groupBy(e => Math.floorDiv(e.ts.getTime, 3600000L))
        .flatMap { case (h, es) =>
          es.groupBy(_.event_type).view.mapValues(_.length.toLong).toSeq
            .sortBy { case (t, n) => (-n, t) }.take(3).zipWithIndex
            .map { case ((t, n), i) => (h * 3600L, i + 1L, t, n) }
        }.toSet
      assert(got == expected)
      assert(got.nonEmpty && got.exists(_._2 == 3L))
    } finally q.stop()
  }

  test("trending top-k parity holds under the RocksDB state store (the 100x spillable backend)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // the heaviest custom-state twin re-run under RocksDB: the on-heap
    // HDFS-backed default is the streaming scale ceiling (all state
    // resident), so the operators must be provider-agnostic — same
    // emissions, same watermark/timeout behavior, state spilled off-heap
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val input = MemoryStream[Event]
    val q = StreamingEvents.trendingTopK(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("trending_rocksdb")
      .outputMode("append").start()
    try {
      val boundary = evts.map(_.ts.getTime).sorted.apply(evts.length / 2)
      input.addData(evts.filter(_.ts.getTime < boundary): _*)
      q.processAllAvailable()
      input.addData(evts.filter(_.ts.getTime >= boundary): _*)
      q.processAllAvailable()
      val far = evts.map(_.ts.getTime).max
      input.addData(Event(9990, new Timestamp(far + 10 * 86400000L), 999999, "error", 0))
      q.processAllAvailable()
      // witness the backend actually engaged: RocksDB providers export
      // rocksdb* custom metrics in the progress; the HDFS store does not
      val metrics = Option(q.lastProgress).toSeq.flatMap(
        _.stateOperators.toSeq.flatMap(_.customMetrics.keySet().toArray.map(_.toString)))
      assert(metrics.exists(_.startsWith("rocksdb")),
        s"no rocksdb state-store metrics in progress — provider did not engage: $metrics")
      val sentinelHour = Math.floorDiv(far + 10 * 86400000L, 3600000L) * 3600L
      val got = spark.table("trending_rocksdb")
        .as[StreamingEvents.TrendRow].collect()
        .filterNot(_.hour_start_sec == sentinelHour)
        .map(r => (r.hour_start_sec, r.rank, r.event_type, r.n)).toSet
      val expected = evts.groupBy(e => Math.floorDiv(e.ts.getTime, 3600000L))
        .flatMap { case (h, es) =>
          es.groupBy(_.event_type).view.mapValues(_.length.toLong).toSeq
            .sortBy { case (t, n) => (-n, t) }.take(3).zipWithIndex
            .map { case ((t, n), i) => (h * 3600L, i + 1L, t, n) }
        }.toSet
      assert(got == expected,
        "RocksDB-backed trending top-k diverges from the batch expectation")
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("streaming funnel stages equal the batch funnel counters on driver data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val input = MemoryStream[Event]
    // close horizon > the full data span: strict batch parity requires that
    // no user's funnel closes between deliveries (the default 24 h horizon
    // would close-and-reopen users with mid-stream gaps — a second row)
    val horizon = 40L * 86400000L
    val q = StreamingEvents.funnelStages(input.toDS(), horizon)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      // two batches split at one time boundary (the ingest discipline the
      // operator documents), then far-future sentinels to time every user out
      val boundary = evts.map(_.ts.getTime).sorted.apply(evts.length / 2)
      input.addData(evts.filter(_.ts.getTime < boundary): _*)
      q.processAllAvailable()
      input.addData(evts.filter(_.ts.getTime >= boundary): _*)
      q.processAllAvailable()
      val far = evts.map(_.ts.getTime).max
      Seq(45, 90).foreach { days =>
        input.addData(Event(9000 + days, new Timestamp(far + days * 86400000L), 999999, "error", 0))
        q.processAllAvailable()
      }
      val rows = spark.table("funnel_stream")
        .filter($"user_id" =!= 999999)
        .as[StreamingEvents.FunnelRow].collect()
      assert(rows.map(_.user_id).distinct.length == rows.length, "a user emitted twice")
      val streamed = (
        rows.count(_.viewed).toLong,
        rows.count(_.clicked_after_view).toLong,
        rows.count(_.purchased_after_click).toLong)

      val b = graft.events.EventQueries.funnel(spark, Sf0001).collect()(0)
      val batch = (b.getLong(0), b.getLong(1), b.getLong(2))
      assert(streamed == batch, s"streamed $streamed != batch $batch")
      assert(streamed._1 > 0 && streamed._2 > 0)
    } finally q.stop()
  }

  for (provider <- StateProviders)
  test(s"stateful agg survives stop/restart from checkpoint: every window emitted exactly once [$provider]") {
    // The property that makes a streaming pipeline operable at scale: kill
    // the query mid-stream, restart it from its checkpoint, and the file
    // sink still holds each finalized window EXACTLY once — no re-emission
    // of pre-restart windows, no loss of in-flight state. Parametrized
    // over the state backend: a RocksDB restart additionally exercises
    // the provider's own checkpoint upload/download cycle.
    withStateProvider(provider) {
    import spark.implicits._

    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().sortBy(_.ts.getTime)
    val boundary = evts(evts.length / 2).ts.getTime
    val (half1, half2) = evts.partition(_.ts.getTime < boundary)
    val far1 = evts.last.ts.getTime + 86400000L
    val far2 = far1 + 86400000L

    val srcDir = java.nio.file.Files.createTempDirectory("graft-restart-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-restart-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart-ckpt").toString
    def addBatch(rows: Seq[Event]): Unit =
      rows.toDS().toDF().coalesce(1).write.mode("append").parquet(srcDir)
    val schema = half1.toSeq.toDS().toDF().schema
    def startQuery() = StreamingEvents
      .hourlyCounts(spark.readStream.schema(schema).parquet(srcDir))
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt).option("path", outDir)
      .outputMode("append").start()

    // phase 1: first half ONLY, then STOP. No sentinel here: advancing the
    // watermark past the second half would make the restarted query drop it
    // all as late. half1 spans two weeks, so its own 2 h watermark already
    // finalizes plenty of windows pre-restart.
    addBatch(half1.toSeq)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val afterPhase1 = spark.read.parquet(outDir).count()
    assert(afterPhase1 > 0, "phase 1 finalized no windows — restart proves nothing")

    // phase 2: RESTART from the same checkpoint, feed the second half, then
    // a far-future sentinel to flush every real window
    addBatch(half2.toSeq)
    addBatch(Seq(Event(9002, new Timestamp(far2), 999999, "view", 0)))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(outDir)
      .filter($"hour_start" < new Timestamp(far1))
      .select($"hour_start", $"event_type", $"n_events", $"total_value").collect()
    // exactly-once: no (window, type) key appears twice across the restart
    val keys = out.map(r => (r.get(0), r.get(1)))
    assert(keys.length == keys.distinct.length,
      s"windows re-emitted after restart: ${keys.diff(keys.distinct).toSeq}")
    // completeness: equals the batch twin over the full (real) event set
    val batch = StreamingEvents.hourlyCounts(evts.toSeq.toDS().toDF())
      .select($"hour_start", $"event_type", $"n_events", $"total_value")
      .collect().map(_.toSeq).toSet
    assert(out.map(_.toSeq).toSet == batch,
      s"restarted stream diverged from batch: only streamed ${out.map(_.toSeq).toSet -- batch}, only batch ${batch -- out.map(_.toSeq).toSet}")
    }
  }

  test("online ANN index: streamed cell assignments equal the batch quantizer assignment") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    // the TRAINED quantizer is the static side (broadcast, tiny by contract)
    val cents = graft.similarity.SimilarityQueries
      .trainedCentroidVectors(spark, Sf0001)
      .select(col("cell"), col("centroid"))
      .localCheckpoint()

    val vecs = Tables.embeddings(spark, Sf0001)
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .as[StreamingSuite.Vec].collect()

    val input = MemoryStream[StreamingSuite.Vec]
    val q = graft.streaming.StreamingIndex.assignCells(input.toDF(), cents)
      .writeStream.format("memory").queryName("ann_index_stream")
      .outputMode("append").start()
    try {
      // three micro-batches — ingest is stateless, so any batching works
      vecs.grouped((vecs.length + 2) / 3).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("ann_index_stream")
        .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap

      // batch twin: the topkIvf assignment discipline (max cosine, ties to
      // the lower cell) over the same corpus and quantizer
      val batch = Tables.embeddings(spark, Sf0001)
        .select($"vec_id", $"embedding".cast("array<double>").as("e"))
        .crossJoin(broadcast(cents))
        .withColumn("csim", expr("cosine_sim(e, centroid)"))
        .groupBy($"vec_id")
        .agg(max(struct($"csim", (-$"cell").as("negcell"))).as("m"))
        .select($"vec_id", (-$"m.negcell").as("cell"))
        .as[(Long, Long)].collect().toMap

      assert(streamed == batch,
        s"${streamed.count { case (k, v) => batch.get(k) != Some(v) }} of ${streamed.size} assignments diverge")
      assert(streamed.size == vecs.length)
      // occupancy monitor covers every cell the corpus occupies
      val occ = graft.streaming.StreamingIndex.cellOccupancy(
        spark.table("ann_index_stream")).collect()
      assert(occ.map(_.getLong(1)).sum == vecs.length)
    } finally q.stop()
  }

  test("streaming as-of clicks equal the batch as-of on driver data (unbounded lookback)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val input = MemoryStream[Event]
    val q = StreamingEvents.asofClicks(input.toDS(), 40L * 86400000L)
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      val boundary = evts.map(_.ts.getTime).sorted.apply(evts.length / 2)
      input.addData(evts.filter(_.ts.getTime < boundary): _*)
      q.processAllAvailable()
      input.addData(evts.filter(_.ts.getTime >= boundary): _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))
      val streamed = spark.table("asof_stream")
        .select($"user_id", $"event_id", $"prev_purchase_id", $"ms_since_purchase")
        .collect().map(key).toSet
      val batch = graft.events.EventQueries.asofPurchase(spark, Sf0001)
        .collect().map(key).toSet
      assert(streamed == batch)
      assert(streamed.exists(_._3 >= 0))
    } finally q.stop()
  }

  test("streaming TWAP converges to the batch step-function integral on driver data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val input = MemoryStream[Event]
    val q = StreamingEvents.twapPerUser(input.toDS(), 40L * 86400000L)
      .writeStream.format("memory").queryName("twap_stream")
      .outputMode("update").start()
    try {
      // three event-time-ordered deliveries; within each, arrival order
      // is scrambled (the update fn re-sorts per batch)
      val ordered = evts.sortBy(e => (e.ts.getTime, e.event_id))
      ordered.grouped((ordered.length + 2) / 3).foreach { batch =>
        input.addData(scala.util.Random.shuffle(batch.toSeq): _*)
        q.processAllAvailable()
      }
      // last emitted row per user = the converged integral
      val streamed = spark.table("twap_stream")
        .groupBy($"user_id")
        .agg(last($"span_ms").as("span_ms"), last($"twap_num").as("num"))
        .as[(Long, Long, Long)].collect()
        .map { case (u, d, n) => u -> ((d, n)) }.toMap
      // batch reference at ms grain, driver-side
      val expected = evts.groupBy(_.user_id).collect {
        case (u, es) if es.length > 1 =>
          val s = es.sortBy(e => (e.ts.getTime, e.event_id))
          val (num, den) = s.zip(s.tail).foldLeft((0L, 0L)) {
            case ((n, d), (a, b)) =>
              val dur = b.ts.getTime - a.ts.getTime
              (n + math.round(a.value * 100) * dur, d + dur)
          }
          u -> ((den, num))
      }.filter(_._2._1 > 0)
      assert(streamed == expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming EWMA equals the batch rows-window fold on driver data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val input = MemoryStream[Event]
    val q = StreamingEvents.ewmaPerUser(input.toDS(), 40L * 86400000L)
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append").start()
    try {
      // three event-time-ordered deliveries; within each, arrival order is
      // scrambled (the update fn re-sorts per batch)
      val ordered = evts.sortBy(e => (e.ts.getTime, e.event_id))
      ordered.grouped((ordered.length + 2) / 3).foreach { batch =>
        input.addData(scala.util.Random.shuffle(batch.toSeq): _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("ewma_stream")
        .select($"event_id", $"n_window", $"ewma_cents")
        .as[(Long, Long, Long)].collect()
        .map { case (e, n, c) => e -> ((n, c)) }.toMap
      val batchRows = graft.events.EventQueries.ewmaPerUser(spark, Sf0001)
        .select($"event_id", $"n_window", $"ewma_cents")
        .as[(Long, Long, Long)].collect()
        .map { case (e, n, c) => e -> ((n, c)) }.toMap
      assert(streamed == batchRows)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming Holt monitor equals a driver replay of the batch fold on driver data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val input = MemoryStream[Event]
    val q = StreamingEvents.holtMonitor(input.toDS(), 40L * 86400000L)
      .writeStream.format("memory").queryName("holt_stream")
      .outputMode("append").start()
    try {
      val ordered = evts.sortBy(e => (e.ts.getTime, e.event_id))
      ordered.grouped((ordered.length + 2) / 3).foreach { batch =>
        input.addData(scala.util.Random.shuffle(batch.toSeq): _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("holt_stream")
        .select($"event_type", $"day", $"count", $"level_micro", $"trend_micro", $"yhat1_micro")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      // driver replay: per type, closed days are [first, last) densified;
      // the same seed-then-fold recurrence in floorDiv arithmetic
      val expected = evts.groupBy(_.event_type).toSeq.flatMap { case (et, es) =>
        val days = es.map(e => Math.floorDiv(e.ts.getTime, 86400000L))
        val cnt = days.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val closed = (days.min until days.max).map(d => d -> cnt.getOrElse(d, 0L))
        var (nClosed, y1, l, b) = (0L, 0L, 0L, 0L)
        closed.map { case (d, c) =>
          val y = c * 1000000L
          if (nClosed == 0L) { y1 = y; l = y; b = 0L }
          else if (nClosed == 1L) { l = y1; b = y - y1 }
          else {
            val nl = Math.floorDiv(l + b + y, 2L)
            b = Math.floorDiv(nl - l + b, 2L); l = nl
          }
          nClosed += 1
          (et, d, c, l, b, l + b)
        }
      }.toSet
      assert(streamed == expected)
      assert(streamed.nonEmpty)
      // and the closed-day (level, trend) trajectory ends one step behind
      // the batch forecaster, which also folds the final day
    } finally q.stop()
  }

  test("streaming CUSUM monitor equals the batch densified cumulative deviation on driver data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    // reference rate per type: mean daily volume over the corpus in ppm,
    // computed batch-side (the driftPsi batch-reference shape)
    val refPpm = Tables.events(spark, Sf0001)
      .select($"event_type", expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy($"event_type")
      .agg(expr("count(*) * 1000000L div (max(day) - min(day) + 1)").as("ref"))
      .as[(String, Long)].collect().toMap
    val input = MemoryStream[Event]
    val q = StreamingEvents.cusumMonitor(input.toDS(), refPpm, 40L * 86400000L)
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    try {
      val ordered = evts.sortBy(e => (e.ts.getTime, e.event_id))
      ordered.grouped((ordered.length + 2) / 3).foreach { batch =>
        input.addData(scala.util.Random.shuffle(batch.toSeq): _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("cusum_stream")
        .select($"event_type", $"day", $"n_events", $"cusum_ppm")
        .as[(String, Long, Long, Long)].collect().toSet
      // independent batch path: per type densify [first, last] days with a
      // window cumsum of (c·10⁶ − ref), then drop each type's LAST day —
      // the streaming monitor's open day, complete only once a later
      // event closes it
      val wT = org.apache.spark.sql.expressions.Window.partitionBy($"event_type")
      val wCum = wT.orderBy($"day").rowsBetween(Long.MinValue, 0)
      val refDf = refPpm.toSeq.toDF("event_type", "ref")
      val expected = Tables.events(spark, Sf0001)
        .select($"event_type", expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy($"event_type").agg(min($"day").as("d0"), max($"day").as("d1"))
        .select($"event_type", explode(sequence($"d0", $"d1")).as("day"))
        .join(
          Tables.events(spark, Sf0001)
            .select($"event_type", expr("unix_micros(ts) div 86400000000").as("day"))
            .groupBy($"event_type", $"day").agg(count(lit(1)).as("c")),
          Seq("event_type", "day"), "left")
        .select($"event_type", $"day", coalesce($"c", lit(0L)).as("c"))
        .join(broadcast(refDf), "event_type")
        .withColumn("cusum_ppm", sum($"c" * 1000000L - $"ref").over(wCum))
        .withColumn("last_day", max($"day").over(wT))
        .filter($"day" < $"last_day")
        .select($"event_type", $"day", $"c".as("n_events"), $"cusum_ppm")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(streamed == expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming rolling median equals the batch rows-window order statistic on driver data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val input = MemoryStream[Event]
    val q = StreamingEvents.rollingMedianPerUser(input.toDS(), 40L * 86400000L)
      .writeStream.format("memory").queryName("rollmed_stream")
      .outputMode("append").start()
    try {
      val ordered = evts.sortBy(e => (e.ts.getTime, e.event_id))
      ordered.grouped((ordered.length + 2) / 3).foreach { batch =>
        input.addData(scala.util.Random.shuffle(batch.toSeq): _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("rollmed_stream")
        .select($"event_id", $"n_window", $"med_cents")
        .as[(Long, Long, Long)].collect()
        .map { case (e, n, c) => e -> ((n, c)) }.toMap
      val batchRows = graft.events.EventQueries.rollingMedian(spark, Sf0001)
        .select($"event_id", $"n_window", $"med_cents")
        .as[(Long, Long, Long)].collect()
        .map { case (e, n, c) => e -> ((n, c)) }.toMap
      assert(streamed == batchRows)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  for (provider <- StateProviders)
  test(s"streaming CEP pattern counts equal the batch regex counts on driver data [$provider]") {
    withStateProvider(provider) {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val input = MemoryStream[Event]
    // horizon wider than the data span: no user's automaton may be
    // evicted mid-stream (same discipline as the transition parity test)
    val q = StreamingEvents.patternMatchPerUser(input.toDS(), 40L * 86400000L)
      .writeStream.format("memory").queryName(s"pattern_stream_$provider")
      .outputMode("update").start()
    try {
      // three event-time-ordered micro-batches: automaton state must carry
      // across batch boundaries (a v...p span that straddles a boundary)
      val sortedTs = evts.map(_.ts.getTime).sorted
      val (b1, b2) = (sortedTs(evts.length / 3), sortedTs(2 * evts.length / 3))
      input.addData(evts.filter(_.ts.getTime < b1): _*)
      q.processAllAvailable()
      input.addData(evts.filter(e => e.ts.getTime >= b1 && e.ts.getTime < b2): _*)
      q.processAllAvailable()
      input.addData(evts.filter(_.ts.getTime >= b2): _*)
      q.processAllAvailable()
      // Update mode: the LAST row per user is the final running count
      val streamed = spark.table(s"pattern_stream_$provider")
        .groupBy($"user_id")
        .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.struct($"n_events", $"n_conversion_paths", $"n_view_errors")).as("m"))
        .select($"user_id", $"m.n_events", $"m.n_conversion_paths", $"m.n_view_errors")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val batch = graft.events.EventQueries.patternMatch(spark, Sf0001)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(streamed == batch)
      assert(batch.values.map(_._2).sum > 0, "conversion paths exist in the fixture")
      assert(batch.values.map(_._3).sum > 0, "view-error pairs exist in the fixture")
    } finally q.stop()
    }
  }

  test("streaming transition pairs equal the batch Markov transition counts on driver data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val evts = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect()
    val input = MemoryStream[Event]
    // horizon wider than the data span: no user's chain may break between
    // deliveries (same discipline as the funnel parity test)
    val q = StreamingEvents.transitionPairs(input.toDS(), 40L * 86400000L)
      .writeStream.format("memory").queryName("transitions_stream")
      .outputMode("append").start()
    try {
      val boundary = evts.map(_.ts.getTime).sorted.apply(evts.length / 2)
      input.addData(evts.filter(_.ts.getTime < boundary): _*)
      q.processAllAvailable()
      input.addData(evts.filter(_.ts.getTime >= boundary): _*)
      q.processAllAvailable()
      val streamed = spark.table("transitions_stream")
        .groupBy($"from_type", $"to_type").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = graft.events.EventQueries.transitions(spark, Sf0001)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming daily OHLC bars equal the batch twin on driver data") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val events = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().toSeq
    val (firstHalf, secondHalf) = events.sortBy(_.event_id).splitAt(events.size / 2)

    val input = MemoryStream[Event]
    val q = StreamingEvents.dailyOhlc(input.toDF())
      .writeStream.format("memory").queryName("ohlc_stream")
      .outputMode("complete").start()
    try {
      // two micro-batches: open/close must not depend on arrival split
      input.addData(firstHalf: _*)
      q.processAllAvailable()
      input.addData(secondHalf: _*)
      q.processAllAvailable()
      val streamed = spark.table("ohlc_stream").collect().map(_.toSeq).toSet
      val batch = StreamingEvents.dailyOhlc(events.toDF())
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming daily CMS sketch is bit-identical to batch under a micro-batch split") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val events = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().toSeq
    val (a, b) = events.sortBy(_.event_id).splitAt(events.size / 3)

    val input = MemoryStream[Event]
    val q = StreamingEvents.dailyUserSketch(input.toDF())
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      input.addData(a: _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      def canon(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getTimestamp(0), r.getSeq[Long](1), r.getLong(2))).toSet
      val streamed = canon(spark.table("cms_stream").collect())
      val batch = canon(StreamingEvents.dailyUserSketch(events.toDF()).collect())
      assert(streamed == batch) // counters, not just estimates, are exact
      assert(streamed.nonEmpty)

      // probe through the same Catalyst expression the batch query uses:
      // no (day, user) estimate may undercount its true per-day count
      val truth = events.groupBy(e => (e.ts.getTime / 86400000L * 86400000L, e.user_id))
        .view.mapValues(_.size.toLong).toMap
      val users = events.map(_.user_id).distinct.toDF("user_id")
      val probed = spark.table("cms_stream").crossJoin(users)
        .select($"day_start", $"user_id",
          graft.functions.CountMinSketch.probe($"sk", $"user_id").as("est"))
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1)) -> r.getLong(2)).toMap
      truth.foreach { case (k, c) =>
        assert(probed.getOrElse(k, 0L) >= c, s"undercount at $k")
      }
    } finally q.stop()
  }

  for (provider <- StateProviders)
  test(s"streaming daily quantile sketch meets the GK rank bound under a micro-batch split [$provider]") {
    withStateProvider(provider) {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val events = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().toSeq
    val (a, b) = events.sortBy(_.event_id).splitAt(events.size / 3)

    val input = MemoryStream[Event]
    val q = StreamingEvents.dailyQuantiles(input.toDF())
      .writeStream.format("memory").queryName(s"quantile_stream_$provider")
      .outputMode("complete").start()
    try {
      input.addData(a: _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      val streamed = spark.table(s"quantile_stream_$provider").collect()
      assert(streamed.nonEmpty)
      // exact per-(day, type) values from the same driver data
      val byCell = events.groupBy(e =>
        (e.ts.getTime / 86400000L * 86400000L, e.event_type))
        .view.mapValues(_.map(_.value).sorted).toMap
      // ε = 0.01 audit against the sketch's guaranteed 0.001 (accuracy=1000):
      // SOME rank of the returned element must lie within ε of the target,
      // tie-aware on both sides — the same contract the batch operator pins.
      val eps = 0.01
      def rankOk(sortedVals: Seq[Double], got: Double, tgt: Double): Boolean = {
        val n = sortedVals.size.toDouble
        val lt = sortedVals.count(_ < got)
        val le = sortedVals.count(_ <= got)
        lt <= (tgt + eps) * n && le >= (tgt - eps) * n
      }
      streamed.foreach { r =>
        val key = (r.getTimestamp(0).getTime, r.getString(1))
        val vals = byCell(key)
        assert(r.getAs[Long]("n_events") == vals.size.toLong,
          s"count mismatch at $key")
        assert(rankOk(vals, r.getAs[Double]("a50"), 0.5), s"p50 rank bound at $key")
        assert(rankOk(vals, r.getAs[Double]("a90"), 0.9), s"p90 rank bound at $key")
      }
      // every (day, type) cell of the input must have emitted
      assert(streamed.length == byCell.size)
    } finally q.stop()
    }
  }

  for (provider <- StateProviders)
  test(s"streaming daily HLL distinct-users is bit-identical to batch and within rsd of exact [$provider]") {
    withStateProvider(provider) {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val events = Tables.events(spark, Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Event].collect().toSeq
    val (a, b) = events.sortBy(_.event_id).splitAt(2 * events.size / 5)

    val input = MemoryStream[Event]
    val q = StreamingEvents.dailyDistinctUsers(input.toDF())
      .writeStream.format("memory").queryName(s"hll_stream_$provider")
      .outputMode("complete").start()
    try {
      input.addData(a: _*)
      q.processAllAvailable()
      input.addData(b: _*)
      q.processAllAvailable()
      def canon(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
      val streamed = canon(spark.table(s"hll_stream_$provider").collect())
      // max-merge registers: the split must not change a single bit
      val batch = canon(StreamingEvents.dailyDistinctUsers(events.toDF()).collect())
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // estimates within a generous multiple of the 2% rsd of the exact counts
      val exact = events.groupBy(_.ts.getTime / 86400000L * 86400000L)
        .view.mapValues(_.map(_.user_id).distinct.size).toMap
      streamed.foreach { case (day, est, _) =>
        val truth = exact(day.getTime)
        assert(math.abs(est - truth) <= math.max(3, 0.1 * truth),
          s"day $day: est $est vs exact $truth")
      }
    } finally q.stop()
    }
  }

  test("streaming duplicate-chunk detector equals the batch duplicated-hash set") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val docs = Tables.documents(spark, Sf0001)
      .select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingCorpus.dupChunks(
      input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dup_chunks_stream")
      .outputMode("append").start()
    try {
      // three doc-ordered micro-batches: first-seen(hash) = global min doc,
      // so the batch expectation below reproduces the stream's emissions
      val thirds = docs.grouped((docs.length + 2) / 3).toSeq
      thirds.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val streamed = spark.table("dup_chunks_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch expectation: every (hash, doc) pair except each hash's min
      // doc, over hashes spanning >= 2 distinct docs — the same duplicated
      // set chunkDupRate aggregates into its per-source rate
      val w = graft.pipelines.TrainingPrep.RagWindow
      val s = graft.pipelines.TrainingPrep.RagStride
      val pairs = Tables.documents(spark, Sf0001)
        .select($"doc_id", split($"text", " ").as("toks"))
        .withColumn("n", size($"toks").cast("bigint"))
        .select($"doc_id", explode(expr(
          s"""transform(sequence(0L, (n - 1) div $s),
             |  i -> cast(conv(substring(md5(array_join(
             |         slice(toks, cast(i * $s as int) + 1, $w), ' ')), 1, 15), 16, 10) as bigint))"""
            .stripMargin)).as("chunk_hash"))
        .select($"chunk_hash", $"doc_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val expected = pairs.groupBy(_._1).filter(_._2.length >= 2).toSeq
        .flatMap { case (h, ps) =>
          val ds = ps.map(_._2).sorted
          ds.tail.map(d => (h, d))
        }.toSet
      assert(expected.nonEmpty, "fixture has no cross-doc duplicate chunks — parity proves nothing")
      assert(streamed == expected,
        s"only streamed ${streamed -- expected}, only batch ${expected -- streamed}")
    } finally q.stop()
  }

  test("stateless scrub twins: streaming output equals the batch queries row-for-row") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ts = new java.sql.Timestamp(0L)
    // each twin is fed the SAME fixture text its batch query scans, split
    // across two micro-batches; being stateless maps, the union of batch
    // outputs must equal the batch query exactly (no watermark, no state)
    val cases: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = Seq(
      ("pii", graft.streaming.StreamingCorpus.piiRedact _,
        graft.text.PiiQueries.withPiiFixture(Tables.documents(spark, Sf0001)),
        graft.text.PiiQueries.piiRedact(spark, Sf0001)),
      ("mojibake", graft.streaming.StreamingCorpus.mojibakeScore _,
        graft.text.EncodingRepair.withMojibake(Tables.documents(spark, Sf0001)),
        graft.text.EncodingRepair.mojibakeScore(spark, Sf0001)),
      ("html", graft.streaming.StreamingCorpus.htmlExtract _,
        graft.text.HtmlQueries.withHtmlFixture(Tables.documents(spark, Sf0001))
          .select($"doc_id", $"html".as("text")),
        graft.text.HtmlQueries.htmlExtract(spark, Sf0001)),
      ("code", graft.streaming.StreamingCorpus.codeDetect _,
        graft.text.CodeDetect.withCodeFixture(Tables.documents(spark, Sf0001)),
        graft.text.CodeDetect.codeDetect(spark, Sf0001)),
      ("url", in => graft.streaming.StreamingCorpus.urlCanonical(
        in.withColumnRenamed("text", "url")),
        graft.text.UrlQueries.withUrlNoiseFixture(Tables.documents(spark, Sf0001))
          .select($"doc_id", $"url".as("text")),
        graft.text.UrlQueries.urlCanonical(spark, Sf0001)),
      ("links", graft.streaming.StreamingCorpus.htmlLinks _,
        graft.text.HtmlQueries.withLinkFixture(Tables.documents(spark, Sf0001))
          .select($"doc_id", $"html".as("text")),
        graft.text.HtmlQueries.htmlLinks(spark, Sf0001)))
    cases.foreach { case (name, twin, fixtureDf, batchDf) =>
      val rows = fixtureDf.select($"doc_id", $"text").as[(Long, String)].collect()
        .map { case (id, text) => StreamingSuite.Doc(id, text, ts) }
      val input = MemoryStream[StreamingSuite.Doc]
      val q = twin(input.toDF().drop("ingest_ts"))
        .writeStream.format("memory").queryName(s"scrub_$name")
        .outputMode("append").start()
      try {
        val (a, b) = rows.splitAt(rows.length / 2)
        input.addData(a: _*)
        q.processAllAvailable()
        input.addData(b: _*)
        q.processAllAvailable()
        val streamed = spark.table(s"scrub_$name").collect()
          .map(_.toSeq).toSet
        val batch = batchDf.collect().map(_.toSeq).toSet
        assert(streamed == batch, s"$name stream/batch divergence " +
          s"(${streamed.size} vs ${batch.size} distinct rows)")
        assert(streamed.nonEmpty)
      } finally q.stop()
    }
  }

  test("batch sessionize agrees with EventQueries.sessions on driver data shape") {
    import spark.implicits._
    // same gap logic, computed by the batch window-function path
    val batch = graft.events.EventQueries.sessions(spark, Sf0001)
      .orderBy($"user_id").collect()
    assert(batch.nonEmpty)
    batch.foreach { r =>
      assert(r.getLong(1) >= 1L) // n_sessions
      assert(r.getLong(2) >= 1L) // max_session_events
    }
  }
}

object StreamingSuite {
  /** Top-level so spark.implicits can derive its encoder. */
  case class Doc(doc_id: Long, text: String, ingest_ts: java.sql.Timestamp)
  case class DocLen(doc_id: Long, n_chars: Long, ingest_ts: java.sql.Timestamp)
  case class Vec(vec_id: Long, e: Seq[Double])
}
