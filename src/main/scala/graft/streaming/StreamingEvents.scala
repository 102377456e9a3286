package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events shape — the streaming
  * twins of [[graft.events.EventQueries]]. Each takes a DataFrame that may
  * be a `readStream` source (tests drive them with MemoryStream) or a batch
  * frame (same semantics, no state).
  *
  * Watermarks bound state: hourly aggregation keeps at most
  * (watermark / window) open windows per event type, and sessionization
  * drops per-user state once the gap timeout fires — both O(active keys),
  * never O(history), which is what lets them run indefinitely at scale.
  */
object StreamingEvents {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  case class SessionSummary(user_id: Long, n_events: Long, start_sec: Long, end_sec: Long)

  /** Tumbling 1-hour counts per event type with a late-data watermark. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("bigint")) / 100.0).as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n_events"), col("total_value"))

  /** Stream-stream interval join — the streaming twin of the batch as-of
    * family ([[graft.events.EventQueries.asofPurchase]]): every click paired
    * with the purchases the same user makes within `horizon` AFTER it
    * (classic attribution). Both inputs are event-time streams; both carry
    * a watermark and the join condition bounds purchase_ts to a finite
    * interval around click_ts, which is exactly what lets Spark evict from
    * BOTH state stores — a click older than watermark + horizon can never
    * match a future purchase and is dropped; an unmatched purchase is
    * dropped once the watermark passes it. State is O(events inside the
    * watermark horizon) per side, never O(history). Also runs unchanged on
    * batch frames (withWatermark is a planning no-op there), which is what
    * the parity test exploits. */
  def intervalJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      horizon: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    c.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** LEFT OUTER variant of [[intervalJoin]]: clicks that attract no
    * purchase inside the horizon still emit, with null purchase columns —
    * the attribution report's "unconverted clicks" rows. In streaming
    * mode the null-padded row for a click can only be emitted once the
    * WATERMARK has passed its whole match window (before that a matching
    * purchase could still arrive), so unconverted clicks surface with
    * watermark latency — the canonical outer-join-needs-watermark
    * behavior, asserted in the suite. Batch mode emits them immediately
    * (no watermark concept), same final result. */
  def intervalJoinOuter(
      clicks: DataFrame,
      purchases: DataFrame,
      horizon: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    c.join(p,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** Streaming twin of the batch binned range join
    * ([[graft.events.EventQueries.rangeJoinViews]]): per purchase, count the
    * same user's views in the preceding hour `[p_ts - W, p_ts)`.
    *
    * Same 2-bin probe as batch: views carry `bin = ms div W`; each purchase
    * explodes into the two bins its window can overlap (window length ==
    * bin width), so the stream-stream equi-key is (user_id, bin) and a
    * power user's state hashes across bins instead of pooling under one
    * key. The exact half-open predicate runs on the candidate sliver only.
    * Watermarks + the time-interval condition bound BOTH state stores to
    * O(events in the horizon), and the left-outer side restores zero-view
    * purchases once the watermark closes their window (each purchase has 2
    * probe rows; unmatched probes contribute null → count 0). The
    * downstream per-purchase count groups by the purchase's 1-hour window
    * so append mode can finalize it — the Spark-4 multiple-stateful-
    * operator chain (join → windowed agg) the batch twin needs no help
    * with. Runs unchanged on batch frames (parity-tested). */
  def rangeJoinViews(
      views: DataFrame,
      purchases: DataFrame,
      watermark: String = "2 hours"): DataFrame = {
    val W = 3600000L // 1 h in ms == bin width == the range-join window
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        expr(s"(unix_micros(ts) div 1000) div ${W}L").as("v_bin"))
      .withWatermark("v_ts", watermark)
    val p = purchases
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"),
        explode(array(expr(s"(unix_micros(ts) div 1000) div ${W}L"),
          expr(s"(unix_micros(ts) div 1000) div ${W}L - 1L"))).as("bin"))
      .withWatermark("p_ts", watermark)
    p.join(v,
        col("user_id") === col("v_user") && col("bin") === col("v_bin") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") < col("p_ts"),
        "left_outer")
      .groupBy(window(col("p_ts"), "1 hour"), col("user_id"), col("purchase_id"))
      .agg(count(col("v_ts")).as("views_1h"))
      .select(col("user_id"), col("purchase_id").as("event_id"), col("views_1h"))
  }

  /** Daily OHLC bars per event type — the streaming twin of
    * [[graft.events.EventQueries.ohlcBars]]. `min_by`/`max_by` with a
    * (ts, event_id) struct key are declarative aggregates whose partial
    * state is ONE (key, value) pair, so the streaming store holds five
    * scalars per open (day, type) cell and the watermark bounds the open
    * cells to (watermark / 1 day) per type — O(active windows), never
    * O(events). Runs unchanged on batch frames (parity-tested); the
    * tiebreak makes open/close deterministic under any micro-batch split,
    * since min_by over a total order is arrival-order-free. */
  def dailyOhlc(events: DataFrame, watermark: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("day_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n_events"))

  /** Per-day approximate value quantiles per event type — the streaming
    * twin of [[graft.events.EventQueries.quantileSketch]], completing the
    * batch↔streaming parity of the sketch family (HLL has the batch side,
    * CMS has [[dailyUserSketch]], rank quantiles get this). The
    * Greenwald-Khanna-family `percentile_approx` buffer is a MERGEABLE
    * fixed-size aggregate, so the state store holds one O(accuracy·log n)
    * sketch per open (day, type) cell and the deterministic rank-error
    * guarantee (≤ 1/accuracy) survives any micro-batch arrival split. The
    * parity test audits the emitted quantiles against exact batch RANKS —
    * the guarantee — rather than a batch run's bit pattern, since the
    * sketch's internal layout is merge-order-sensitive while its contract
    * is not. */
  def dailyQuantiles(events: DataFrame, watermark: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        percentile_approx(col("value"), array(lit(0.5), lit(0.9)), lit(1000)).as("ap"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("day_start"), col("event_type"),
        col("ap")(0).as("a50"), col("ap")(1).as("a90"), col("n_events"))

  /** Per-day distinct active users via HLL++ — the streaming twin of
    * [[graft.events.EventQueries.userHll]]'s cardinality sketch, closing
    * streaming parity for the third sketch family (CMS point counts:
    * [[dailyUserSketch]]; GK rank quantiles: [[dailyQuantiles]]; HLL
    * cardinality: this). `approx_count_distinct`'s HLL++ registers are a
    * fixed-size max-merge — commutative and idempotent — so the estimate is
    * BIT-IDENTICAL to a batch run under any micro-batch arrival split (the
    * strongest parity the family admits, and what the test asserts), and
    * state per open day is one register array regardless of user count. */
  def dailyDistinctUsers(events: DataFrame, watermark: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("day_start"), col("approx_users"), col("n_events"))

  /** Per-day Count-Min sketch of user activity — the streaming twin of
    * [[graft.events.EventQueries.cmsUserCounts]]'s sketch side. The
    * [[graft.functions.CountMinSketch]] aggregator's merge is elementwise
    * sum, so the per-window counters are BIT-IDENTICAL to a batch run under
    * any micro-batch arrival split (the property the parity test asserts,
    * probing estimates through the same Catalyst expression). State per
    * open window is one fixed 160 KiB array — the streaming answer to
    * "how often did key X occur today" that never materializes a per-key
    * count table. */
  def dailyUserSketch(events: DataFrame, watermark: String = "2 days"): DataFrame = {
    val cmsUdaf = udaf(new graft.functions.CountMinSketch(),
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(cmsUdaf(col("user_id")).as("sk"), count(lit(1)).as("n_events"))
      .select(col("w.start").as("day_start"), col("sk"), col("n_events"))
  }

  case class FunnelRow(
      user_id: Long, viewed: Boolean, clicked_after_view: Boolean,
      purchased_after_click: Boolean)

  /** Streaming twin of the batch funnel
    * ([[graft.events.EventQueries.funnel]]): per user, did a view happen,
    * then a click strictly after the FIRST view, then a purchase strictly
    * after that first qualifying click. State is three epoch-micro slots
    * per user — O(1), set-once-then-keep: under the replayable-ingest
    * discipline the parity tests document (each delivered batch entirely
    * newer than the previous watermark), the first view is final once seen,
    * so later events can only FILL later stages, never revise earlier ones
    * — which is what lets the state stay three longs instead of the user's
    * event history. A user's row emits at event-time timeout: the funnel
    * CLOSES after `closeHorizonMs` of inactivity (a user who returns later
    * starts a fresh row — deliberate streaming semantics; for strict batch
    * parity choose a horizon longer than any intra-user gap, as the parity
    * test does), append-mode. */
  def funnelStages(
      events: Dataset[Event],
      closeHorizonMs: Long = 86400000L): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        StreamingEvents.updateFunnel(closeHorizonMs))
  }

  /** State: (first view us, first click > view us, first purchase > click
    * us), -1 = unset. */
  private def updateFunnel(closeHorizonMs: Long)(
      userId: Long,
      evts: Iterator[Event],
      state: GroupState[(Long, Long, Long)]): Iterator[FunnelRow] = {
    if (state.hasTimedOut) {
      val (v, c, p) = state.get
      state.remove()
      return Iterator.single(FunnelRow(userId, v >= 0, c >= 0, p >= 0))
    }
    var (v, c, p) = state.getOption.getOrElse((-1L, -1L, -1L))
    // event-time order within the batch; cross-batch order is the ingest
    // discipline's job (see scaladoc)
    val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    sorted.foreach { e =>
      val us = e.ts.getTime * 1000L
      e.event_type match {
        case "view" if v < 0                         => v = us
        case "click" if v >= 0 && c < 0 && us > v    => c = us
        case "purchase" if c >= 0 && p < 0 && us > c => p = us
        case _                                       => ()
      }
    }
    state.update((v, c, p))
    // funnel closes after closeHorizonMs of inactivity (watermark-relative
    // floor keeps the timeout legal when the watermark has already advanced)
    val lastMs = sorted.last.ts.getTime
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1, lastMs + closeHorizonMs))
    Iterator.empty
  }

  case class AsofRow(
      user_id: Long, event_id: Long, prev_purchase_id: java.lang.Long,
      ms_since_purchase: java.lang.Long)

  /** Streaming as-of: each click is paired with the user's latest
    * strictly-earlier purchase — the third member of the as-of family
    * (window composition [[graft.events.EventQueries.asofPurchase]],
    * native physical operator [[graft.plans.AsofJoinExec]], and this).
    * Unlike [[intervalJoin]]'s bounded attribution window, the lookback
    * here is UNBOUNDED — exactly what stream-stream join watermarks
    * cannot express (an unbounded join would pin both state stores
    * forever). The state that CAN be bounded is one (ms, id) pair per
    * user: the latest purchase seen. Both event kinds arrive as one
    * keyed stream; per batch, events replay in (ms, id) order against
    * that single slot. Same replayable-ingest discipline as
    * [[funnelStages]]; idle users evict after `idleHorizonMs`. */
  def asofClicks(
      events: Dataset[Event],
      idleHorizonMs: Long = 86400000L): Dataset[AsofRow] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        StreamingEvents.updateAsof(idleHorizonMs))
  }

  /** State: the user's latest purchase (epoch ms, event_id). */
  private def updateAsof(idleHorizonMs: Long)(
      userId: Long,
      evts: Iterator[Event],
      state: GroupState[(Long, Long)]): Iterator[AsofRow] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var last = state.getOption
    val out = Seq.newBuilder[AsofRow]
    sorted.foreach { e =>
      val ms = e.ts.getTime
      e.event_type match {
        case "click" =>
          out += (last match {
            case Some((pms, pid)) => AsofRow(userId, e.event_id, pid, ms - pms)
            case None => AsofRow(userId, e.event_id, null, null)
          })
        case "purchase" => last = Some((ms, e.event_id))
        case _ => ()
      }
    }
    last.foreach(state.update)
    if (state.exists)
      state.setTimeoutTimestamp(
        math.max(state.getCurrentWatermarkMs() + 1, sorted.last.ts.getTime + idleHorizonMs))
    out.result().iterator
  }

  case class TransitionRow(user_id: Long, from_type: String, to_type: String)

  /** Streaming twin of [[graft.events.EventQueries.transitions]]: per-user
    * consecutive-event transition pairs, emitted as they close. State is
    * ONE (ts, event_id, type) triple per user — the lookahead the batch
    * `lead` window keeps implicitly — so memory is O(active users), never
    * O(history). A user idle past `idleHorizonMs` is evicted (a later
    * return starts a fresh chain — deliberate streaming semantics, same
    * replayable-ingest discipline as [[funnelStages]]; the parity test
    * picks a horizon wider than any intra-user gap). The downstream
    * (from, to) rollup is the consumer's windowed aggregation — this
    * operator emits the pair stream. */
  def transitionPairs(
      events: Dataset[Event],
      idleHorizonMs: Long = 86400000L): Dataset[TransitionRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        StreamingEvents.updateTransitions(idleHorizonMs))
  }

  /** State: the user's latest (epoch ms, event_id, event_type). */
  private def updateTransitions(idleHorizonMs: Long)(
      userId: Long,
      evts: Iterator[Event],
      state: GroupState[(Long, Long, String)]): Iterator[TransitionRow] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var prev = state.getOption
    val out = Seq.newBuilder[TransitionRow]
    sorted.foreach { e =>
      prev.foreach { case (_, _, t) => out += TransitionRow(userId, t, e.event_type) }
      prev = Some((e.ts.getTime, e.event_id, e.event_type))
    }
    state.update(prev.get)
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1, sorted.last.ts.getTime + idleHorizonMs))
    out.result().iterator
  }

  case class PatternRow(
      user_id: Long, n_events: Long, n_conversion_paths: Long, n_view_errors: Long)

  /** CEP state per user: in-flight automaton flags for each pattern plus
    * the running counts. `sawV1` = inside a live `vc*p` attempt (a later
    * `v` restarts the attempt, matching leftmost regex semantics);
    * `sawV2` = the last event was `v` for the 2-char `ve` pattern. */
  case class PatternState(
      sawV1: Boolean, sawV2: Boolean,
      nEvents: Long, nConv: Long, nViewErr: Long, lastMs: Long)

  /** Streaming twin of [[graft.events.EventQueries.patternMatch]]: the
    * per-user CEP automaton maintained as `flatMapGroupsWithState` state —
    * two booleans and three counters per user, O(1) regardless of history
    * length, where the batch operator folds the whole journey string. The
    * automata exactly implement the leftmost non-overlapping regex
    * semantics of `vc*p` and `ve` (a non-[cp] event kills a live attempt,
    * a fresh `v` restarts it — the same prefix reasoning the batch
    * Scaladoc gives), so after any event-time-ordered micro-batch split
    * the running counts equal the batch regex counts. Users idle past the
    * horizon are evicted — the replayable-ingest discipline shared with
    * [[transitionPairs]]. */
  def patternMatchPerUser(
      events: Dataset[Event],
      idleHorizonMs: Long = 86400000L): Dataset[PatternRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(
        StreamingEvents.updatePattern(idleHorizonMs))
  }

  private def updatePattern(idleHorizonMs: Long)(
      userId: Long,
      evts: Iterator[Event],
      state: GroupState[PatternState]): Iterator[PatternRow] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var s = state.getOption.getOrElse(PatternState(
      sawV1 = false, sawV2 = false, nEvents = 0L, nConv = 0L, nViewErr = 0L, lastMs = 0L))
    sorted.foreach { e =>
      val i = e.event_type.charAt(0)
      // vc*p automaton: v (re)starts an attempt, c keeps it alive,
      // p completes it, anything else kills it
      val (v1, conv) = i match {
        case 'v' => (true, 0L)
        case 'c' => (s.sawV1, 0L)
        case 'p' => (false, if (s.sawV1) 1L else 0L)
        case _ => (false, 0L)
      }
      // ve automaton: strictly adjacent, so only the previous event matters
      val ve = if (s.sawV2 && i == 'e') 1L else 0L
      s = PatternState(v1, i == 'v', s.nEvents + 1, s.nConv + conv,
        s.nViewErr + ve, e.ts.getTime)
    }
    state.update(s)
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1, s.lastMs + idleHorizonMs))
    Iterator.single(PatternRow(userId, s.nEvents, s.nConv, s.nViewErr))
  }

  case class TwapRow(user_id: Long, span_ms: Long, twap_num: Long, twap: Double)

  /** Streaming twin of the batch TWAP ([[graft.events.EventQueries]]
    * `events_twap`): the per-user step-function time integral maintained
    * incrementally. State is four scalars per user — last (ms, event_id,
    * cents) plus the accumulated Σ cents·Δms / Σ Δms — so an unbounded
    * stream needs O(1) per live user, evicted by the idle-horizon timeout.
    * Each micro-batch folds its (batch-sorted) events into the integral
    * exactly as the batch window's `lead` would; emit is the running
    * per-user TWAP after each batch (Update mode), whose final value
    * matches the batch operator on the same data under any micro-batch
    * split — the integral is associative in event-time order. */
  def twapPerUser(
      events: Dataset[Event],
      idleHorizonMs: Long = 86400000L): Dataset[TwapRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(
        StreamingEvents.updateTwap(idleHorizonMs))
  }

  case class EwmaRow(user_id: Long, event_id: Long, n_window: Long, ewma_cents: Long)

  /** Streaming twin of the batch EWMA ([[graft.events.EventQueries]]
    * `events_ewma`): the per-user α=½ exponentially-weighted purchase
    * average maintained incrementally. State is the last ≤16 purchase
    * cents per user (the batch operator's exact truncation depth), so an
    * unbounded stream needs O(16) per live user, evicted by the
    * idle-horizon timeout. Each purchase appends to the ring and emits
    * the same `num div den` powers-of-two fold the batch rows-window
    * computes — one Append-mode row per purchase, equal to the batch
    * output under any event-time-ordered micro-batch split (the ring
    * after k events is a function of the last 16 events only). */
  def ewmaPerUser(
      events: Dataset[Event],
      idleHorizonMs: Long = 86400000L): Dataset[EwmaRow] = {
    import events.sparkSession.implicits._
    events
      .filter(_.event_type == "purchase")
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        StreamingEvents.updateEwma(idleHorizonMs))
  }

  /** State: the last ≤16 cents values, oldest→newest. */
  private def updateEwma(idleHorizonMs: Long)(
      userId: Long,
      evts: Iterator[Event],
      state: GroupState[Seq[Long]]): Iterator[EwmaRow] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var ring = state.getOption.getOrElse(Seq.empty[Long])
    val out = sorted.map { e =>
      ring = (ring :+ math.round(e.value * 100)).takeRight(16)
      // newest-highest powers of two — identical to the batch fold
      val num = ring.reverse.foldLeft(0L)((a, x) => a * 2 + x)
      val den = (1L << ring.length) - 1
      EwmaRow(userId, e.event_id, ring.length.toLong, num / den)
    }
    state.update(ring)
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1,
        sorted.last.ts.getTime + idleHorizonMs))
    out.iterator
  }

  case class CusumRow(event_type: String, day: Long, n_events: Long, cusum_ppm: Long)

  /** State for [[cusumMonitor]]: the one OPEN day per type plus the
    * running cusum over all closed days. */
  case class CusumState(day: Long, count: Long, cusum: Long)

  /** Streaming CUSUM rate monitor — the online twin of the batch
    * changepoint scan ([[graft.events.EventQueries]] `events_cusum`,
    * which finds WHERE the rate shifted post-hoc; this raises the alarm
    * WHILE it shifts): per event type, the running cumulative deviation
    * of closed-day volumes from a reference daily rate (classic Page
    * CUSUM against a fixed reference — the reference comes from a batch
    * aggregate over the historical corpus, the [[StreamingCorpus
    * .driftPsi]] stream-vs-batch-reference shape).
    *
    * `refPpm(type)` is the reference rate in events·10⁻⁶/day; a closed
    * day with c events moves the cusum by `c·10⁶ − ref`. A day closes
    * when a later event arrives for that type; intervening EMPTY days
    * emit too, each shifting the cusum by −ref (a type that stops
    * emitting drifts negative — exactly the signal a changepoint monitor
    * must not lose). One row per closed day in event-time order.
    *
    * State is O(1) per type — (open day, its count, running cusum) —
    * evicted by the idle-horizon timeout; the final open day dies
    * unemitted with it (a day is only known complete when a later one
    * starts). Late events for already-closed days are dropped, the
    * watermark contract every Append-mode aggregation here shares. */
  def cusumMonitor(
      events: Dataset[Event],
      refPpm: Map[String, Long],
      idleHorizonMs: Long = 7L * 86400000L): Dataset[CusumRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        StreamingEvents.updateCusum(refPpm, idleHorizonMs))
  }

  private def updateCusum(refPpm: Map[String, Long], idleHorizonMs: Long)(
      eventType: String,
      evts: Iterator[Event],
      state: GroupState[CusumState]): Iterator[CusumRow] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    val ref = refPpm.getOrElse(eventType, 0L)
    val out = scala.collection.mutable.ArrayBuffer.empty[CusumRow]
    var st = state.getOption.orNull
    sorted.foreach { e =>
      val d = Math.floorDiv(e.ts.getTime, 86400000L)
      if (st == null) st = CusumState(d, 1L, 0L)
      else if (d == st.day) st = st.copy(count = st.count + 1)
      else if (d > st.day) {
        var cus = st.cusum + (st.count * 1000000L - ref)
        out += CusumRow(eventType, st.day, st.count, cus)
        var g = st.day + 1
        while (g < d) { cus -= ref; out += CusumRow(eventType, g, 0L, cus); g += 1 }
        st = CusumState(d, 1L, cus)
      } // d < st.day: late beyond the open day — dropped (watermark contract)
    }
    state.update(st)
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1,
        sorted.last.ts.getTime + idleHorizonMs))
    out.iterator
  }

  /** State for [[holtMonitor]]: the one OPEN day per type plus the Holt
    * (level, trend) over all closed days; `nClosed` sequences the seeding
    * (1st closed day → y₁; 2nd → l = y₁, b = y₂ − y₁; then the fold). */
  case class HoltState(day: Long, count: Long, nClosed: Long, y1: Long, l: Long, b: Long)
  case class HoltRow(event_type: String, day: Long, count: Long,
      level_micro: Long, trend_micro: Long, yhat1_micro: Long)

  /** Streaming Holt level+trend monitor — the online twin of the batch
    * 7-day forecaster ([[graft.events.EventQueries.holtForecast]], same
    * α = β = ½ recurrence, same micro-unit int64 state, halvings via
    * `Math.floorDiv` ≡ the batch side's even-numerator floor division):
    * per event type, each CLOSED day folds into (level, trend) and emits
    * the one-day-ahead forecast `l + b` — the live capacity dashboard,
    * updating as days complete instead of re-scanning history.
    *
    * Day-close and calendar semantics mirror [[cusumMonitor]]: a day
    * closes when a later event arrives for the type; intervening EMPTY
    * days fold as y = 0 and emit too (the batch twin densifies its
    * calendar the same way, so the trajectories agree); the final open
    * day dies unemitted with the idle timeout. Before two days have
    * closed the emitted (level, trend) is the partial seed (y₁, 0). State
    * is O(1) per type. */
  def holtMonitor(
      events: Dataset[Event],
      idleHorizonMs: Long = 7L * 86400000L): Dataset[HoltRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        StreamingEvents.updateHolt(idleHorizonMs))
  }

  private def updateHolt(idleHorizonMs: Long)(
      eventType: String,
      evts: Iterator[Event],
      state: GroupState[HoltState]): Iterator[HoltRow] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[HoltRow]
    var st = state.getOption.orNull
    // fold one CLOSED day (count c on day d) into the state and emit
    def close(s: HoltState, d: Long, c: Long): HoltState = {
      val y = c * 1000000L
      val next =
        if (s.nClosed == 0L) s.copy(nClosed = 1L, y1 = y, l = y, b = 0L)
        else if (s.nClosed == 1L) s.copy(nClosed = 2L, l = s.y1, b = y - s.y1)
        else {
          val nl = Math.floorDiv(s.l + s.b + y, 2L)
          s.copy(nClosed = s.nClosed + 1L, l = nl, b = Math.floorDiv(nl - s.l + s.b, 2L))
        }
      out += HoltRow(eventType, d, c, next.l, next.b, next.l + next.b)
      next
    }
    sorted.foreach { e =>
      val d = Math.floorDiv(e.ts.getTime, 86400000L)
      if (st == null) st = HoltState(d, 1L, 0L, 0L, 0L, 0L)
      else if (d == st.day) st = st.copy(count = st.count + 1)
      else if (d > st.day) {
        var s = close(st, st.day, st.count)
        var g = st.day + 1
        while (g < d) { s = close(s, g, 0L); g += 1 }
        st = s.copy(day = d, count = 1L)
      } // d < st.day: late beyond the open day — dropped (watermark contract)
    }
    state.update(st)
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1,
        sorted.last.ts.getTime + idleHorizonMs))
    out.iterator
  }

  case class RollMedRow(user_id: Long, event_id: Long, n_window: Long, med_cents: Long)

  /** Streaming twin of the batch rolling median
    * ([[graft.events.EventQueries]] `events_rolling_median`): the same
    * ≤15-cents ring as [[ewmaPerUser]]'s, emitting the lower median of the
    * sorted ring per purchase — the holistic window statistic maintained
    * with O(15) state per live user. Append rows equal the batch output
    * under any event-time-ordered micro-batch split. */
  def rollingMedianPerUser(
      events: Dataset[Event],
      idleHorizonMs: Long = 86400000L): Dataset[RollMedRow] = {
    import events.sparkSession.implicits._
    events
      .filter(_.event_type == "purchase")
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        StreamingEvents.updateRollMed(idleHorizonMs))
  }

  private def updateRollMed(idleHorizonMs: Long)(
      userId: Long,
      evts: Iterator[Event],
      state: GroupState[Seq[Long]]): Iterator[RollMedRow] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var ring = state.getOption.getOrElse(Seq.empty[Long])
    val out = sorted.map { e =>
      ring = (ring :+ math.round(e.value * 100)).takeRight(15)
      val w = ring.sorted
      RollMedRow(userId, e.event_id, w.length.toLong, w((w.length + 1) / 2 - 1))
    }
    state.update(ring)
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1,
        sorted.last.ts.getTime + idleHorizonMs))
    out.iterator
  }

  /** State: (last ms, last event_id, last cents, Σ cents·Δms, Σ Δms). */
  private def updateTwap(idleHorizonMs: Long)(
      userId: Long,
      evts: Iterator[Event],
      state: GroupState[(Long, Long, Long, Long, Long)]): Iterator[TwapRow] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var (lastMs, lastId, lastCents, num, den) =
      state.getOption.getOrElse((0L, 0L, 0L, 0L, 0L))
    var seen = state.getOption.isDefined
    sorted.foreach { e =>
      val cents = math.round(e.value * 100)
      if (seen) {
        val dur = e.ts.getTime - lastMs
        num += lastCents * dur
        den += dur
      }
      lastMs = e.ts.getTime; lastId = e.event_id; lastCents = cents; seen = true
    }
    state.update((lastMs, lastId, lastCents, num, den))
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1, lastMs + idleHorizonMs))
    if (den > 0) Iterator.single(TwapRow(userId, den, num, num.toDouble / den))
    else Iterator.empty
  }

  val SessionGapSec = 1800L

  /** Event-time sessionization via `flatMapGroupsWithState`: per-user state
    * is (session start, last seen, count); a gap beyond the timeout emits
    * the closed session and re-arms. The streaming analog of
    * EventQueries.sessions. */
  def sessionize(events: Dataset[Event]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        StreamingEvents.updateSession)
  }

  /** State-update function (top-level so the closure serializes cleanly):
    * state is (session start sec, last seen sec, event count). */
  private def updateSession(
      userId: Long,
      evts: Iterator[Event],
      state: GroupState[(Long, Long, Long)]): Iterator[SessionSummary] = {
    val sorted = evts.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var out = List.empty[SessionSummary]
    var cur = state.getOption
    if (state.hasTimedOut) {
      cur.foreach { case (start, end, n) => out ::= SessionSummary(userId, n, start, end) }
      cur = None
    }
    sorted.foreach { e =>
      val sec = e.ts.getTime / 1000
      cur = cur match {
        // out-of-order events (cross-batch) may land before the session's
        // current bounds: widen with min/max, never regress them
        case Some((start, end, n)) if sec - end <= SessionGapSec =>
          Some((math.min(start, sec), math.max(end, sec), n + 1))
        case Some((start, end, n)) =>
          out ::= SessionSummary(userId, n, start, end)
          Some((sec, sec, 1L))
        case None => Some((sec, sec, 1L))
      }
    }
    cur match {
      case Some(s) =>
        state.update(s)
        // timeout must stay ahead of the current watermark or Spark rejects it
        state.setTimeoutTimestamp(
          math.max(s._2 * 1000 + SessionGapSec * 1000, state.getCurrentWatermarkMs() + 1))
      case None => state.remove()
    }
    out.reverseIterator
  }

  case class TrendRow(hour_start_sec: Long, rank: Long, event_type: String, n: Long)

  /** Streaming per-window trending top-k — each hour window emits its k
    * most frequent event types, ranked, when the watermark closes the
    * window: the "trending now" feed. Spark's streaming aggregation can
    * window-count but cannot RANK within a closing window (rank is not an
    * incremental aggregate), so this is custom event-time state: key =
    * hour index, state = the window's per-type count map, emit-on-timeout.
    *
    * State bound: |types| counters per live window — exact because the
    * type domain here is small and closed. For an unbounded key domain
    * (URLs, search terms) swap the exact map for the Misra-Gries buffer
    * ([[graft.streaming.StreamingCorpus.heavyHitters]] holds the
    * streaming-MG machinery) — same emit-on-timeout shape, fixed-size
    * state, membership-contract top-k. Emission order inside a window is
    * deterministic (count desc, type asc), so the parity test can compare
    * sets against the batch window rank. */
  def trendingTopK(
      events: Dataset[Event],
      k: Int = 3,
      closeSlackMs: Long = 3600000L): Dataset[TrendRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(e => Math.floorDiv(e.ts.getTime, 3600000L))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        StreamingEvents.updateTrending(k, closeSlackMs))
  }

  private def updateTrending(k: Int, closeSlackMs: Long)(
      hourIdx: Long,
      evts: Iterator[Event],
      state: GroupState[Map[String, Long]]): Iterator[TrendRow] = {
    if (state.hasTimedOut) {
      val counts = state.get
      state.remove()
      return counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
        .zipWithIndex.iterator
        .map { case ((t, n), i) => TrendRow(hourIdx * 3600L, i + 1L, t, n) }
    }
    val counts = evts.foldLeft(state.getOption.getOrElse(Map.empty[String, Long])) {
      (m, e) => m.updated(e.event_type, m.getOrElse(e.event_type, 0L) + 1L)
    }
    state.update(counts)
    // the window closes once the watermark passes its end plus the slack
    // (watermark-relative floor keeps the timeout legal mid-replay)
    state.setTimeoutTimestamp(
      math.max(state.getCurrentWatermarkMs() + 1, (hourIdx + 1) * 3600000L + closeSlackMs))
    Iterator.empty
  }
}
