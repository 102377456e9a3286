package graft.events

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Event-time analytics over the `events` table (the batch twins of the
  * Structured Streaming operators in [[graft.streaming]]).
  *
  * Timestamps are reduced to whole epoch seconds (`unix_timestamp`) before
  * arithmetic: the source column is nanosecond-precision parquet, and whole
  * seconds are the precision every engine agrees on. Money sums follow the
  * integer-cents policy (see RelationalQueries).
  */
object EventQueries {

  /** [[Tables.events]] hash-partitioned on `user_id` at DATA-proportional
    * width ([[graft.Plans.sizeWidth]] over the memoized row count): the
    * loader for the ~dozen per-user window/sessionization operators. The
    * explicit keyed repartition replaces — not adds to — the user-keyed
    * exchange every such window forces anyway (HashPartitioning(user_id)
    * satisfies the window's and the per-user aggregates' clustering), so
    * the per-round stages run |events|-proportional tasks instead of
    * cores-many. A deployment-sized events table gets its width from the
    * same formula; nothing here is local-mode-specific. */
  private def eventsByUser(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val n = graft.Memo.countOf(spark, s"n-events/$dir", ev)
    ev.repartition(graft.Plans.sizeWidth(spark, n), col("user_id"))
  }

  /** Tumbling 1-hour window per event type — Spark's `window()` operator;
    * the bucket is emitted as epoch seconds so it is engine-portable. */
  def hourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        (sum(round(col("value") * 100).cast("bigint")) / 100.0).as("total_value"))
      .select(
        unix_timestamp(col("w.start")).as("hour_start"),
        col("event_type"), col("n_events"), col("n_users"), col("total_value"))

  def hourlySql: String =
    """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_start,
      |  event_type,
      |  count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Per-user activity profile, top 50 most active. */
  def userStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        min(unix_timestamp(col("ts"))).as("first_seen"),
        max(unix_timestamp(col("ts"))).as("last_seen"),
        (sum(round(col("value") * 100).cast("bigint")) / 100.0).as("total_value"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(50)

  def userStatsSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  count(DISTINCT event_type) AS n_types,
      |  CAST(min(floor(epoch(ts))) AS BIGINT) AS first_seen,
      |  CAST(max(floor(epoch(ts))) AS BIGINT) AS last_seen,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
      |FROM events
      |GROUP BY user_id
      |ORDER BY n_events DESC, user_id
      |LIMIT 50""".stripMargin

  private val SessionGapSec = 1800L

  /** Sessionization (30-minute inactivity gap) — the batch analog of a
    * streaming session window. A session starts where the gap from the
    * previous event of the same user exceeds the threshold; the running sum
    * of session-start markers numbers the sessions. One shuffle (by user),
    * then everything is computed within the per-user sort order. */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val evts = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
      .withColumn("new_session",
        when(col("sec") - lag(col("sec"), 1).over(byUser) > SessionGapSec, 1)
          .when(lag(col("sec"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    evts.groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n"), (max(col("sec")) - min(col("sec"))).as("dur"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("n")).as("max_session_events"),
        max(col("dur")).as("max_session_secs"))
  }

  def sessionsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec, ts
       |  FROM events),
       |marked AS (
       |  SELECT user_id, sec, ts, event_id,
       |    CASE WHEN lag(sec) OVER w IS NULL THEN 1
       |         WHEN sec - lag(sec) OVER w > $SessionGapSec THEN 1
       |         ELSE 0 END AS new_session
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |numbered AS (
       |  SELECT user_id, sec,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                           ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM marked),
       |per_session AS (
       |  SELECT user_id, session_idx, count(*) AS n, max(sec) - min(sec) AS dur
       |  FROM numbered GROUP BY user_id, session_idx)
       |SELECT user_id, count(*) AS n_sessions,
       |  max(n) AS max_session_events, max(dur) AS max_session_secs
       |FROM per_session GROUP BY user_id""".stripMargin

  /** Top-3 events per type by value — ranking window over a keyed partition. */
  def top3PerType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id"))))
      .filter(col("rn") <= 3)
      .select(col("event_type"), col("rn").cast("bigint").as("rn"), col("event_id"), col("value"))

  def top3PerTypeSql: String =
    """SELECT event_type, rn, event_id, value FROM (
      |  SELECT event_type, event_id, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
      |  FROM events) t
      |WHERE rn <= 3""".stripMargin

  /** Per-user running totals — a window FRAME (rows unbounded preceding),
    * distinct from the ranking windows above. Cumulative sums are over exact
    * integer cents, so every prefix is engine-exact. Limited to the first
    * 200 events by id to keep the verify dump small; the frame itself is
    * unbounded. */
  def runningTotals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("event_id") < 200)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("bigint").as("cents"), col("ts"))
      .withColumn("running_value", sum(col("cents")).over(w) / 100.0)
      .withColumn("running_n", count(lit(1)).over(w))
      .select(col("user_id"), col("event_id"), col("running_value"), col("running_n"))
  }

  def runningTotalsSql: String =
    """SELECT user_id, event_id,
      |  sum(CAST(round(value*100) AS BIGINT))
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) / 100.0
      |    AS running_value,
      |  count(*)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
      |    AS running_n
      |FROM events
      |WHERE event_id < 200""".stripMargin

  /** The distribution window functions in one pass — ntile, percent_rank,
    * cume_dist, lead — over each event type's per-user value totals. All
    * four share ONE window (one sort inside each partition); the ORDER BY
    * is a total order (exact cents desc, then user), which is what makes
    * ntile's bucket boundaries and lead's neighbor deterministic enough for
    * a cross-engine hash compare. percent_rank/cume_dist are small-integer
    * ratios — engine-identical doubles. */
  def userQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("v").desc, col("user_id"))
    Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(round(col("value") * 100).cast("bigint")).as("v"))
      .select(col("event_type"), col("user_id"), (col("v") / 100.0).as("total_value"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        lead(col("user_id"), 1).over(w).as("next_user"))
  }

  def userQuartilesSql: String =
    """SELECT event_type, user_id, v / 100.0 AS total_value,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  lead(user_id) OVER w AS next_user
      |FROM (SELECT event_type, user_id,
      |        CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v
      |      FROM events GROUP BY 1, 2) t
      |WINDOW w AS (PARTITION BY event_type ORDER BY v DESC, user_id)""".stripMargin

  /** Pivot: one row per user, one count column per event type (the wide
    * feature-table shape). Spark's `pivot` with explicit values keeps the
    * plan a single groupBy; the oracle spells the same conditional sums. */
  def userTypePivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .filter(col("user_id") < 50)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
  }

  def userTypePivotSql: String =
    """SELECT user_id,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'error') AS error,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'view') AS view
      |FROM events
      |WHERE user_id < 50
      |GROUP BY user_id""".stripMargin

  /** Sliding 1-hour windows advancing every 30 minutes — each event lands in
    * two overlapping windows. Emitted as epoch-second window starts. */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("event_type"), col("n_events"))

  def slidingSql: String =
    """SELECT CAST(floor((epoch(ts) - off) / 3600) * 3600 + off AS BIGINT) AS win_start,
      |  event_type, count(*) AS n_events
      |FROM events, (VALUES (0), (1800)) o(off)
      |GROUP BY 1, 2""".stripMargin

  /** Calendar rollup: events per day and ISO weekday — the date-function
    * surface (`date_format`, `weekday`). */
  def daily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        weekday(col("ts")).cast("bigint").as("dow"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("bigint")) / 100.0).as("total_value"))

  def dailySql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
      |  isodow(ts) - 1 AS dow,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Session windows via Spark's built-in `session_window` operator (the
    * declarative twin of [[sessions]]'s manual lag/cumsum formulation and of
    * the streaming flatMapGroupsWithState path). Boundaries follow Spark's
    * half-open semantics: a gap ≥ 30 min starts a new session, compared at
    * microsecond precision. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"))

  def sessionWindowsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |m AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN lag(us) OVER w IS NULL
      |           OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_session
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |n AS (
      |  SELECT user_id, us,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM m)
      |SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
      |  count(*) AS n_events
      |FROM n GROUP BY user_id, session_idx""".stripMargin

  /** JSON scalar extraction from the `props` JSON-in-string column
    * (`get_json_object`, codegen'd), bucketed distribution per event type. */
  def propsStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        // floor division; the oracle mirrors it with floor(k / 10.0) — DuckDB's
        // integer `//` truncates toward zero for negatives, so it would diverge
        floor(get_json_object(col("props"), "$.k").cast("bigint") / lit(10)).as("k_bucket"))
      .groupBy(col("event_type"), col("k_bucket"))
      .agg(count(lit(1)).as("n"))

  def propsStatsSql: String =
    """SELECT event_type,
      |  CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10.0) AS BIGINT) AS k_bucket,
      |  count(*) AS n
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Typed JSON extraction via `from_json` with an explicit schema — the
    * single-pass, codegen'd path for a 100 TB props column (vs per-field
    * `get_json_object` re-parses in [[propsStats]]); malformed documents
    * parse to null and are visible as `n_rows - n_parsed`, never fatal. */
  def propsTyped(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), "k BIGINT",
          java.util.Collections.emptyMap[String, String]()).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("k")).as("n_parsed"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        sum(col("k")).as("k_sum"))

  def propsTypedSql: String =
    """SELECT event_type, count(*) AS n_rows, count(k) AS n_parsed,
      |  min(k) AS k_min, max(k) AS k_max, CAST(sum(k) AS BIGINT) AS k_sum
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events) t
      |GROUP BY 1""".stripMargin

  /** AS-OF join: each click matched to the same user's most recent earlier
    * purchase. Formulated the scalable way — one shuffle by user, then
    * `last(..., ignoreNulls)` over purchases within the per-user
    * (ms, event_id) sort order — not a per-row lookup join, and no packed
    * key that could overflow at scale. */
  def asofPurchase(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isPurchase = col("event_type") === "purchase"
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts) div 1000").as("ms"))
      .withColumn("prev_purchase_id",
        last(when(isPurchase, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("prev_purchase_ms",
        last(when(isPurchase, col("ms")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(
        col("user_id"), col("event_id"),
        col("prev_purchase_id"),
        (col("ms") - col("prev_purchase_ms")).as("ms_since_purchase"))
  }

  def asofPurchaseSql: String =
    """SELECT user_id, event_id, prev_purchase_id,
      |  ms - prev_purchase_ms AS ms_since_purchase
      |FROM (
      |  SELECT user_id, event_id, event_type, ms,
      |    last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ms, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase_id,
      |    last_value(CASE WHEN event_type = 'purchase' THEN ms END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ms, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase_ms
      |  FROM (SELECT user_id, event_id, event_type, epoch_us(ts) // 1000 AS ms
      |        FROM events) p) w
      |WHERE event_type = 'click'""".stripMargin

  /** The same top-3-per-type result computed through the typed
    * [[graft.functions.TopKAggregator]] — a bounded heap with partial
    * aggregation (ObjectHashAggregate partial → Exchange → final in the
    * plan). Spark's own WindowGroupLimit also k-bounds the window
    * formulation above pre-shuffle; the aggregator additionally avoids the
    * per-partition sort and demonstrates the typed Aggregator surface.
    * Shares the window version's oracle: two physical strategies, one
    * answer. */
  def top3PerTypeAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val topk = new graft.functions.TopKAggregator(3)
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk.toColumn)
      .flatMap { case (t, top) =>
        top.zipWithIndex.map { case ((id, v), i) => (t, (i + 1).toLong, id, v) }
      }
      .toDF("event_type", "rn", "event_id", "value")
  }

  /** Share of traffic per event type; the share is one int/int division so
    * it is engine-exact. The corpus-wide total joins in as a broadcast
    * scalar rather than an unpartitioned window: `sum(...) over ()` would
    * exchange the aggregated rows to a single partition (and WARNs about
    * it), while the cross join keeps the plan exchange-free — the per-type
    * counts are already bounded by the event_type cardinality. */
  def typeShare(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val total = counts.agg(sum(col("n_events")).as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("n_events") / col("total"))
      .drop("total")
  }

  def typeShareSql: String =
    """SELECT event_type, n_events,
      |  n_events / sum(n_events) OVER () AS share
      |FROM (SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type) t""".stripMargin

  /** Approximate distinct users per event type — HLL++ as a first-class
    * operator with a VERIFIABLE contract: the comparable output carries the
    * exact count plus a boolean asserting the sketch landed within 10% of
    * it. The raw sketch estimate itself is engine-specific (DuckDB cannot
    * reproduce Spark's HLL++), but the accuracy flag is decidable by both:
    * the oracle emits TRUE alongside ITS exact count, so a drifting or
    * broken sketch flips the flag and fails the hash-compare.
    *
    * Why 10% against an rsd=0.02 sketch: rsd is ONE standard deviation of
    * the (near-Gaussian) HLL++ relative error, so a 5% bound is only ~2.5σ —
    * per-group exceedance ~1.2%, a coin-flip-per-fixture time bomb for a
    * hash-compared oracle. 10% is 5σ (exceedance ~6e-7 per group): a FALSE
    * here means the sketch is broken or drifted, not unlucky. At 100 TB the
    * sketch is the point: countDistinct shuffles every distinct key,
    * approx_count_distinct ships one fixed-size sketch per partition. */
  def userHll(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("n_hll"))
      .select(
        col("event_type"), col("n_exact_users"),
        (abs(col("n_hll") - col("n_exact_users")).cast("double")
          / col("n_exact_users").cast("double") < 0.10).as("hll_within_10pct"))

  def userHllSql: String =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS n_exact_users,
      |  TRUE AS hll_within_10pct
      |FROM events GROUP BY event_type""".stripMargin

  /** Approximate quantiles as a first-class sketch operator — the rank
    * sibling of [[userHll]]'s cardinality sketch, with a STRONGER contract:
    * `percentile_approx` (Greenwald-Khanna family) guarantees rank error
    * ≤ 1/accuracy DETERMINISTICALLY, so unlike HLL's ~2.5σ probabilistic
    * bound the verified booleans can never flip on a lucky dataset. The
    * check is tie-aware — `count(< a) ≤ (q+ε)n AND count(≤ a) ≥ (q-ε)n`
    * asserts SOME rank of the returned element lies within ε of the target,
    * which duplicates of the quantile value cannot break. ε here is 0.01
    * against the sketch's guaranteed 0.001 (accuracy=1000) — margin, not
    * slack in the claim.
    *
    * Scale shape: one partial-aggregable pass builds the fixed-size sketch
    * per type; the 5-row sketch output broadcasts back onto the events scan
    * for the rank audit (second pass, also partial-aggregable). The sketch
    * itself is O(accuracy · log n) memory regardless of n — the point of
    * using it at 100 TB instead of the exact two-phase selection
    * (`median_price`), which needs a histogram shuffle. */
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
    val approx = ev.groupBy(col("event_type"))
      .agg(
        percentile_approx(col("value"), array(lit(0.5), lit(0.9)), lit(1000)).as("ap"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_events"),
        col("ap")(0).as("a50"), col("ap")(1).as("a90"))
    val eps = 0.01
    def rankOk(a: org.apache.spark.sql.Column, q: Double): org.apache.spark.sql.Column = {
      val lt = sum(when(col("value") < a, 1L).otherwise(0L))
      val le = sum(when(col("value") <= a, 1L).otherwise(0L))
      lt <= first(col("n_events")) * lit(q + eps) && le >= first(col("n_events")) * lit(q - eps)
    }
    ev.join(broadcast(approx), "event_type")
      .groupBy(col("event_type"))
      .agg(
        first(col("n_events")).as("n_events"),
        rankOk(col("a50"), 0.5).as("p50_rank_ok"),
        rankOk(col("a90"), 0.9).as("p90_rank_ok"))
  }

  def quantileSketchSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  TRUE AS p50_rank_ok, TRUE AS p90_rank_ok
      |FROM events GROUP BY event_type""".stripMargin

  /** Ordered-funnel analysis: view → first click AFTER that view → first
    * purchase AFTER that click, per user — the product-analytics staple.
    * Each stage is one filtered aggregate joined to the previous stage's
    * anchor timestamp (exact integer microseconds), so the ordering
    * constraint is real sequence order, not mere event presence; user
    * counts survive to one summary row. Every stage is a keyed
    * partial-aggregable shuffle; nothing is per-event stateful. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
    val viewed = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val clicked = e.filter(col("event_type") === "click")
      .join(viewed, "user_id")
      .filter(col("us") > col("v_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val purchased = e.filter(col("event_type") === "purchase")
      .join(clicked, "user_id")
      .filter(col("us") > col("c_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    viewed
      .join(clicked.select(col("user_id"), col("c_us")), Seq("user_id"), "left")
      .join(purchased.select(col("user_id"), col("p_us")), Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_viewed"),
        count(col("c_us")).as("n_clicked_after_view"),
        count(col("p_us")).as("n_purchased_after_click"))
  }

  def funnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |viewed AS (
      |  SELECT user_id, min(us) AS v_us FROM e WHERE event_type = 'view' GROUP BY user_id),
      |clicked AS (
      |  SELECT e.user_id, min(us) AS c_us FROM e JOIN viewed USING (user_id)
      |  WHERE event_type = 'click' AND us > v_us GROUP BY e.user_id),
      |purchased AS (
      |  SELECT e.user_id, min(us) AS p_us FROM e JOIN clicked USING (user_id)
      |  WHERE event_type = 'purchase' AND us > c_us GROUP BY e.user_id)
      |SELECT count(*) AS n_viewed,
      |  count(c_us) AS n_clicked_after_view,
      |  count(p_us) AS n_purchased_after_click
      |FROM viewed
      |LEFT JOIN clicked USING (user_id)
      |LEFT JOIN purchased USING (user_id)""".stripMargin

  /** Binned range join: each purchase counts the same user's views in the
    * preceding hour, `[p_ms - W, p_ms)`.
    *
    * The naive plan joins views⋈purchases on user_id alone and filters the
    * time predicate after the match — per-user all-pairs, quadratic for a
    * power user with millions of events. Binning restores a bound: views
    * carry `bin = ms div W`; each purchase probes exactly the two bins its
    * window can overlap (window length == bin width), so the equi-join key
    * is (user_id, bin) and candidates per probe are one bin's events, not
    * one user's history. The exact half-open predicate then runs on the
    * candidate sliver only. This is the technique that survives when the
    * two sides are separate 100 TB tables (impressions vs conversions) and
    * no per-user window formulation applies; the 2× probe explosion sits on
    * the smaller side. Zero-view purchases are restored by a final left
    * join keyed on event_id — linear, no extra scan of views. */
  def rangeJoinViews(spark: SparkSession, dir: String): DataFrame = {
    val W = 3600000L // 1 h in ms == bin width, so a window spans ≤2 bins
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts) div 1000").as("ms"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), expr(s"ms div ${W}L").as("bin"), col("ms").as("v_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ms"))
    val probes = purchases.select(col("user_id"), col("event_id"), col("ms"),
      explode(array(expr(s"ms div ${W}L"), expr(s"ms div ${W}L - 1L"))).as("bin"))
    val matched = probes.join(views, Seq("user_id", "bin"))
      .filter(col("v_ms") >= col("ms") - W && col("v_ms") < col("ms"))
      .groupBy(col("event_id")).agg(count(lit(1)).as("views_1h"))
    // shuffle-hash: matched is aggregate-derived (no stats → Catalyst would
    // sort-merge); it is purchase-bounded but not promised broadcast-small
    purchases.join(matched.hint("shuffle_hash"), Seq("event_id"), "left")
      .select(col("user_id"), col("event_id"),
        coalesce(col("views_1h"), lit(0L)).as("views_1h"))
  }

  /** Temporal ANTI range join — views with NO purchase by the same user in
    * the following hour, per user: the negative of [[rangeJoinViews]] and
    * the time-bounded NOT EXISTS every conversion-analysis stack needs
    * ("which impressions never converted?"). A naive per-view NOT EXISTS
    * subquery re-scans purchases per row; this plans the same 2-bin
    * pigeonhole as the positive join (window == bin width ⇒ a purchase at
    * bin b can only convert views in bins {b, b−1}), takes DISTINCT
    * converted view ids, and anti-joins them back — per-user history never
    * goes all-pairs, and the anti join carries 8-byte ids only.
    *
    * Output is the per-user (n_views, n_unconverted) rollup. */
  def unconvertedViews(spark: SparkSession, dir: String): DataFrame = {
    val W = 3600000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts) div 1000").as("ms"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ms").as("v_ms"), expr(s"ms div ${W}L").as("bin"))
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms").as("p_ms"),
        explode(array(expr(s"ms div ${W}L"), expr(s"ms div ${W}L - 1L"))).as("bin"))
    val converted = probes.join(views, Seq("user_id", "bin"))
      .filter(col("p_ms") >= col("v_ms") && col("p_ms") < col("v_ms") + W)
      .select(col("view_id")).distinct()
    val perUser = views.groupBy(col("user_id")).agg(count(lit(1)).as("n_views"))
    val unconv = views
      .join(converted.hint("shuffle_hash"), Seq("view_id"), "left_anti")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_unconverted"))
    perUser.join(unconv.hint("shuffle_hash"), Seq("user_id"), "left")
      .select(col("user_id"), col("n_views"),
        coalesce(col("n_unconverted"), lit(0L)).as("n_unconverted"))
  }

  def unconvertedViewsSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) // 1000 AS ms FROM events)
      |SELECT v.user_id, CAST(count(*) AS BIGINT) AS n_views,
      |  CAST(sum(CASE WHEN NOT EXISTS (
      |    SELECT 1 FROM ev p
      |    WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
      |      AND p.ms >= v.ms AND p.ms < v.ms + 3600000)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_unconverted
      |FROM ev v WHERE v.event_type = 'view'
      |GROUP BY v.user_id""".stripMargin

  /** Exact conversion-lag quantiles — p50/p90/p99 of the view→purchase
    * delay for views that convert within the hour: the funnel-latency
    * readout ("how long until the purchase?") on the DERIVED metric the
    * binned range join produces. Lags come from the same 2-bin pigeonhole
    * as [[rangeJoinViews]] (min purchase ms per view); the quantiles are
    * the [[graft.relational.RelationalQueries.priceQuantiles]] two-phase
    * selection — a minute-bucket histogram (≤60 rows) locates each rank's
    * bucket, and only that bucket's rows pay a rank window — never a
    * global sort of the lag set. Integer ms end to end; ties broken by
    * view id, so the picked value is a total-order statistic in both
    * engines. */
  def conversionLag(spark: SparkSession, dir: String): DataFrame = {
    val W = 3600000L
    val qs = Seq(0.5, 0.9, 0.99)
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts) div 1000").as("ms"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ms").as("v_ms"), expr(s"ms div ${W}L").as("bin"))
    val probes = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms").as("p_ms"),
        explode(array(expr(s"ms div ${W}L"), expr(s"ms div ${W}L - 1L"))).as("bin"))
    val lags = graft.Caches.persisted(
      probes.join(views, Seq("user_id", "bin"))
        .filter(col("p_ms") >= col("v_ms") && col("p_ms") < col("v_ms") + W)
        .groupBy(col("view_id"), col("v_ms"))
        .agg((min(col("p_ms")) - col("v_ms")).as("lag_ms"))
        .withColumn("bkt", expr("lag_ms div 60000")))
    val hist = lags.groupBy(col("bkt")).agg(count(lit(1)).as("bc"))
    val wb = Window.orderBy(col("bkt"))
    val cum = hist
      .withColumn("cum_before",
        coalesce(sum(col("bc")).over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("bc")).over(
        Window.partitionBy(lit(1))))
    val cand = cum
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .withColumn("r", greatest(lit(1L), ceil(col("q") * col("n")).cast("bigint")))
      .filter(col("cum_before") < col("r") && col("cum_before") + col("bc") >= col("r"))
      .select(col("q"), col("bkt"), col("cum_before"), col("r"), col("n"))
    val wr = Window.partitionBy(col("q")).orderBy(col("lag_ms"), col("view_id"))
    lags.join(broadcast(cand), Seq("bkt"))
      .withColumn("rn", row_number().over(wr) + col("cum_before"))
      .filter(col("rn") === col("r"))
      .select(col("q"), col("n").as("n_conversions"), col("lag_ms"))
  }

  def conversionLagSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) // 1000 AS ms FROM events),
      |lag AS (
      |  SELECT v.event_id AS view_id,
      |    min(p.ms) - v.ms AS lag_ms
      |  FROM ev v JOIN ev p
      |    ON p.user_id = v.user_id AND p.event_type = 'purchase'
      |    AND p.ms >= v.ms AND p.ms < v.ms + 3600000
      |  WHERE v.event_type = 'view'
      |  GROUP BY v.event_id, v.ms),
      |r AS (
      |  SELECT lag_ms, view_id,
      |    row_number() OVER (ORDER BY lag_ms, view_id) AS rn,
      |    count(*) OVER () AS n
      |  FROM lag)
      |SELECT q, CAST(n AS BIGINT) AS n_conversions, lag_ms
      |FROM r JOIN (SELECT unnest([0.5, 0.9, 0.99]::DOUBLE[]) AS q) qs
      |  ON rn = greatest(1, CAST(ceil(q * n) AS BIGINT))""".stripMargin

  /** Cohort retention: users cohorted by their first active week; each
    * (cohort, week-offset) cell counts how many of that cohort's users were
    * active that many weeks later — the classic retention triangle every
    * event-analytics stack ships.
    *
    * Weeks are pure integer arithmetic on epoch seconds
    * (`epoch div 86400 div 7`), NOT `date_trunc('week', …)`: ISO-week
    * boundary semantics differ subtly across engines and time zones, while
    * integer floor-division is bit-identical everywhere (the same
    * engine-portability policy as [[hourly]]'s epoch buckets).
    *
    * Scale shape: one distinct on (user, week) — map-side combine, then one
    * shuffle whose width is ACTIVE user-weeks, far below raw events; the
    * cohort table is a partial agg of that; the user-keyed join is
    * shuffle-hash (cohort is aggregate-derived, no stats — Catalyst would
    * sort-merge) and the final cell agg is cohort-count-sized. Nothing
    * touches raw event volume twice. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    // persisted: both the join's left side and the cohort derivation read
    // the distinct — without the persist the plan re-expands it (two raw
    // event scans + a duplicated distinct shuffle, seen in ExplainAll)
    val weeks = graft.Caches.persisted(
      Tables.events(spark, dir)
        .select(col("user_id"),
          expr("unix_micros(ts) div 1000000 div 86400 div 7").as("week"))
        .distinct())
    val cohort = weeks.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    weeks.join(cohort.hint("shuffle_hash"), Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  def retentionSql: String =
    """WITH w AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 1000000 // 86400 // 7 AS week
      |  FROM events),
      |c AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1)
      |SELECT cohort_week, week - cohort_week AS week_offset, count(*) AS n_users
      |FROM w JOIN c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  def rangeJoinViewsSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) // 1000 AS ms FROM events)
      |SELECT p.user_id, p.event_id,
      |  (SELECT count(*) FROM ev v
      |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
      |     AND v.ms >= p.ms - 3600000 AND v.ms < p.ms) AS views_1h
      |FROM ev p WHERE p.event_type = 'purchase'""".stripMargin

  /** 2σ-outlier days per event type — anomaly detection over the daily
    * volume series, done in EXACT integer arithmetic so the flag is
    * bit-identical across engines. With n days, daily counts c_i, S = Σc,
    * SS = Σc², the population z-score condition |z| > 2 rewrites to
    *   (n·c − S)² > 4·(n·SS − S²)
    * (2σ, not 3σ: the generated volume series is near-Poisson-flat, and 3σ
    * days don't exist below sf0.1 — a zero-row witness verifies nothing)
    * — no division, no floating point, so a borderline day can never flip
    * between Spark and the oracle on rounding. The comparison runs in
    * decimal(38,0): with per-day counts in the billions (100 TB territory),
    * (n·c − S)² exceeds int64 while decimal128 has 2× the headroom; the
    * day/count outputs stay int64.
    *
    * Scale shape: the daily rollup is one partial-aggregable shuffle whose
    * width is (types × days), the per-type moment table is a second partial
    * agg over THAT (tiny), broadcast back onto the daily rollup. Raw events
    * are scanned once, two narrow columns. */
  def anomalyDays(spark: SparkSession, dir: String): DataFrame = {
    // persisted: the (types × days)-sized rollup feeds both the moment
    // table and the flag join — without it the plan re-expands into two
    // full scans of the raw events (seen in ExplainAll)
    val daily = graft.Caches.persisted(Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_events")))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("n_events")).as("s"),
        sum(col("n_events") * col("n_events")).as("ss"))
    val dec = "decimal(38,0)"
    val dev = (col("n_days") * col("n_events") - col("s")).cast(dec)
    val spread = (col("n_days") * col("ss") - col("s") * col("s")).cast(dec)
    daily.join(broadcast(stats), "event_type")
      .filter(dev * dev > lit(4).cast(dec) * spread)
      .select(col("event_type"), col("day"), col("n_events"))
  }

  def anomalyDaysSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, count(*) AS n_days, sum(n_events) AS s,
      |    sum(n_events * n_events) AS ss
      |  FROM daily GROUP BY 1)
      |SELECT event_type, day, n_events
      |FROM daily JOIN stats USING (event_type)
      |WHERE CAST(n_days * n_events - s AS HUGEINT) * CAST(n_days * n_events - s AS HUGEINT)
      |    > 4 * CAST(n_days * ss - s * s AS HUGEINT)""".stripMargin

  /** Hour-of-day seasonal index per event type — the seasonality readout
    * behind load forecasting and anomaly baselining: how far each hour's
    * volume sits from a flat profile, as the EXACT ppm index
    * `n_hour · 24 · 10⁶ div n_type` (10⁶ = flat). The hour-of-day is pure
    * integer arithmetic on the epoch (`unix_micros div 3600·10⁶ mod 24`) —
    * no calendar/timezone function whose semantics could differ between
    * engines.
    *
    * Scale shape: one narrow scan → a (types × 24)-row partial agg; the
    * per-type totals derive from that tiny rollup (never a second scan)
    * and attach by broadcast. */
  def seasonality(spark: SparkSession, dir: String): DataFrame = {
    val hourly = graft.Caches.persisted(Tables.events(spark, dir)
      .groupBy(col("event_type"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hour_of_day"))
      .agg(count(lit(1)).as("n_events")))
    val totals = hourly.groupBy(col("event_type")).agg(sum(col("n_events")).as("n_type"))
    hourly
      .join(broadcast(totals), "event_type")
      .select(col("event_type"), col("hour_of_day"), col("n_events"),
        expr("n_events * 24 * 1000000L div n_type").as("seasonal_index_ppm"))
  }

  def seasonalitySql: String =
    """WITH hourly AS (
      |  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(sum(n_events) AS BIGINT) AS n_type
      |      FROM hourly GROUP BY 1)
      |SELECT event_type, hour_of_day, n_events,
      |  n_events * 24 * 1000000 // n_type AS seasonal_index_ppm
      |FROM hourly JOIN t USING (event_type)""".stripMargin

  /** Theil–Sen robust trend per event type — the median of all pairwise
    * slopes of the daily-volume series: the robust-regression twin of
    * `events_trend`'s OLS line (one wild outlier day moves OLS, it cannot
    * move the pairwise median). Every pairwise slope is floored to an
    * integer micro-slope FIRST — with the negative-numerator floor
    * spelled out so Spark's truncating `div` and DuckDB's flooring `//`
    * agree — and the median is the lower median (rank ⌈n/2⌉), the
    * engine-portable selection used everywhere here.
    *
    * Scale shape: the corpus collapses to the (types × days) rollup in
    * one partial-agg shuffle; the pair expansion and the rank window run
    * on that TIME-DIMENSION table — C(days, 2) rows per type, bounded by
    * the calendar, not the data (a year is ~66 k pairs; the fact table
    * never feeds the window). */
  def trendRobust(spark: SparkSession, dir: String): DataFrame = {
    val daily = graft.Caches.persisted(Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("c")))
    val slopes = daily.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        expr("""CASE WHEN (b.c - a.c) >= 0
               |  THEN ((b.c - a.c) * 1000000L) div (b.day - a.day)
               |  ELSE -((-(b.c - a.c) * 1000000L + (b.day - a.day) - 1) div (b.day - a.day))
               |END""".stripMargin).as("slope_micro"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("slope_micro"))
    slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(expr("rn = (n + 1) div 2"))
      .select(col("event_type"), col("n").as("n_pairs"),
        col("slope_micro").as("theilsen_slope_micro"))
      .withColumn("slope_per_day", round(col("theilsen_slope_micro") / 1000000.0, 6))
  }

  def trendRobustSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT a.event_type,
      |    CASE WHEN (b.c - a.c) >= 0
      |      THEN ((b.c - a.c) * 1000000) // (b.day - a.day)
      |      ELSE -((-(b.c - a.c) * 1000000 + (b.day - a.day) - 1) // (b.day - a.day))
      |    END AS slope_micro
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.day < b.day)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(quantile_disc(slope_micro, 0.5) AS BIGINT) AS theilsen_slope_micro,
      |  round(CAST(quantile_disc(slope_micro, 0.5) AS BIGINT) / 1000000.0e0, 6) AS slope_per_day
      |FROM s GROUP BY event_type""".stripMargin

  /** Churn hazard table — the survival-analysis (Kaplan–Meier) INPUT over
    * user lifetimes: per day-of-age t, how many users were still at risk,
    * how many churned exactly then, how many are censored (still active at
    * the observation end — treating them as churned is the classic
    * retention-inflation bug). All counts and the discrete hazard
    * (`churned · 10⁶ div at_risk`) are exact integers; the survival curve
    * itself is Π(1 − hazard) — a float product the consumer folds over
    * this table in age order, deliberately NOT emitted so the registered
    * output stays engine-exact.
    *
    * Age end = last-activity day − signup day; churned iff the last
    * activity predates the corpus's final observed day. (Day, not week:
    * the driver corpus spans ~30 days, and the unit must be finer than
    * the horizon or every lifetime ends censored and the hazard column
    * is identically zero — a witness that exercises nothing.)
    *
    * Scale shape: one user-keyed partial agg builds (age_end, churned)
    * per signup user; the per-age rollup is calendar-bounded, and
    * n_at_risk is a reverse cumulative sum over THAT — the fact table
    * never feeds a window. The observation-end day is a broadcast 1-row
    * crossJoin. */
  def churnHazard(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Caches.persisted(Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day")))
    val obsEnd = ev.agg(max(col("day")).as("d_end"))
    val perUser = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("day"))).as("signup_day"),
        max(col("day")).as("last_day"))
      .filter(col("signup_day").isNotNull)
      .crossJoin(broadcast(obsEnd))
      .select((col("last_day") - col("signup_day")).as("age_end"),
        when(col("last_day") < col("d_end"), 1L).otherwise(0L).as("churned"))
    val perAge = perUser.groupBy(col("age_end"))
      .agg(count(lit(1)).as("n_ending"), sum(col("churned")).as("n_churned"))
    val wRisk = Window.orderBy(col("age_end").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perAge
      .withColumn("n_at_risk", sum(col("n_ending")).over(wRisk))
      .select(col("age_end").as("age_days"), col("n_at_risk"), col("n_churned"),
        (col("n_ending") - col("n_churned")).as("n_censored"),
        expr("n_churned * 1000000L div n_at_risk").as("hazard_ppm"))
  }

  def churnHazardSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS day FROM events),
      |oe AS (SELECT max(day) AS d_end FROM ev),
      |pu AS (
      |  SELECT last_day - signup_day AS age_end,
      |    CASE WHEN last_day < d_end THEN 1 ELSE 0 END AS churned
      |  FROM (SELECT user_id,
      |          min(CASE WHEN event_type = 'signup' THEN day END) AS signup_day,
      |          max(day) AS last_day
      |        FROM ev GROUP BY 1) u, oe
      |  WHERE signup_day IS NOT NULL),
      |pa AS (
      |  SELECT age_end, CAST(count(*) AS BIGINT) AS n_ending,
      |    CAST(sum(churned) AS BIGINT) AS n_churned
      |  FROM pu GROUP BY 1)
      |SELECT age_end AS age_days,
      |  CAST(sum(n_ending) OVER (ORDER BY age_end DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk,
      |  n_churned,
      |  CAST(n_ending - n_churned AS BIGINT) AS n_censored,
      |  CAST(n_churned * 1000000 // sum(n_ending) OVER (ORDER BY age_end DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hazard_ppm
      |FROM pa""".stripMargin

  /** CUSUM changepoint detection — per event type, the day where the
    * cumulative sum of deviations from the type's mean daily volume peaks
    * in magnitude (Page 1954): the standard "did the rate shift, and
    * when?" scan over a metric series, complementing `events_anomaly_mad`
    * (point outliers) and `events_trend` (monotone drift).
    *
    * Exactness: the mean is never divided out. With n calendar days and
    * grand total T, the deviation of day d is `n·c_d − T` (pure int64),
    * whose prefix sum is n·CUSUM_d — same argmax, zero rounding. Gap days
    * count as zero volume (a type that stops emitting IS a changepoint),
    * so the per-type series is densified over the global calendar first.
    * Ties on |cusum| break to the earliest day.
    *
    * Scale shape: the facts collapse to a (type × day) grid in one
    * partial-aggregated pass — ~types·days rows regardless of corpus
    * size — and every window below runs on that grid, never the facts.
    * The calendar bounds are a broadcast 1-row aggregate. */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Caches.persisted(Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day")))
    val cal = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val counts = ev.groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val grid = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(cal))
      .join(counts, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), coalesce(col("c"), lit(0L)).as("c"))
    val wT = Window.partitionBy(col("event_type"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("n_days", count(lit(1)).over(wT))
      .withColumn("total", sum(col("c")).over(wT))
      .withColumn("cusum", sum(col("c") * col("n_days") - col("total")).over(wCum))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(abs(col("cusum")).desc, col("day").asc)))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        abs(col("cusum")).as("cusum_abs"), col("n_days"),
        col("total").as("n_events"))
  }

  def cusumChangepointSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events),
      |cal AS (SELECT unnest(range(min(day), max(day) + 1)) AS day FROM ev),
      |cnt AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1, 2),
      |grid AS (
      |  SELECT g.event_type, g.day, coalesce(c.c, 0) AS c
      |  FROM (SELECT t.event_type, ca.day
      |        FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN cal ca) g
      |  LEFT JOIN cnt c ON c.event_type = g.event_type AND c.day = g.day),
      |s AS (
      |  SELECT event_type, day, c,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
      |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS total
      |  FROM grid),
      |cu AS (
      |  SELECT event_type, day, n_days, total,
      |    sum(c * n_days - total) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS cusum
      |  FROM s)
      |SELECT event_type, day AS cp_day, CAST(abs(cusum) AS BIGINT) AS cusum_abs,
      |  n_days, total AS n_events
      |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
      |        ORDER BY abs(cusum) DESC, day ASC) AS rk FROM cu)
      |WHERE rk = 1""".stripMargin

  private val BurstGamma = 500000L // γ: 0.5 nats (micro-nat fixed point) to enter the burst state
  private val BurstRatio = "1.2"   // s: burst rate = s·base rate (Kleinberg's state ratio)

  /** Burst detection (Kleinberg 2002, "Bursty and Hierarchical Structure
    * in Streams", 2-state batch variant): per event type, the optimal
    * Viterbi segmentation of the daily-count sequence into base-rate vs
    * burst-rate days — burst rate s·λ₀ ([[BurstRatio]]), entering the
    * burst state costs [[BurstGamma]], leaving is free — emitted as burst
    * INTERVALS. Unlike [[anomalyDays]]'s per-day 2σ rule or
    * [[cusumChangepoint]]'s single changepoint, the DP trades elevation
    * against γ globally, so it finds sustained episodes a per-day
    * threshold fragments and multiple episodes a single changepoint
    * cannot represent.
    *
    * Exactness: per-day Poisson emission costs in micro-nat int64 —
    * `e_s(d) = A_s − c_d·L_s` with `A_s = round(λ_s·10⁶)`,
    * `L_s = round(ln λ_s·10⁶)` (the `ln c_d!` term is state-independent
    * and cancels); the two `ln`/`round` calls are the file's pinned
    * one-float-snap policy (tfidf precedent), identical formulas both
    * engines. The whole DP — forward costs, choice bits, backtrack — then
    * runs in pure int64 inside ONE codegen'd `aggregate()` fold over the
    * per-type day array, with strict-`<` switch rules and prefer-base
    * final ties so the trajectory is engine-exact; the oracle replays it
    * with the same fold (`list_reduce`, init via a prepended seed element,
    * state packed into one VARCHAR — see the in-SQL comment on duckdb's
    * struct-accumulator hazard). Cost magnitudes: |e| ≤ A₁ + c_max·L₁ ≈ 10⁶·λ(1.2 + ln λ)
    * per day — int64-safe past 10⁹ events/day over a century of days.
    *
    * Scale shape: the corpus collapses to the densified (type × day)
    * grid ([[cusumChangepoint]]'s shape — one narrow scan + partial agg);
    * the DP folds over per-type day ARRAYS (calendar-bounded, ~30 here,
    * 36500 for a century — trivially in-projection); islands come from
    * the day − row_number trick on the burst days only. Nothing after
    * the grid is corpus-sized. */
  def burstKleinberg(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Caches.persisted(Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day")))
    val cal = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val counts = ev.groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val grid = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(cal))
      .join(counts, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), coalesce(col("c"), lit(0L)).as("c"))
    val g = BurstGamma
    val s = BurstRatio
    val perType = grid.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("day"), col("c")))).as("dc"),
        count(lit(1)).as("n_days"), sum(col("c")).as("total"))
      .withColumn("a0", expr("cast(round(cast(total as double) / n_days * 1000000.0) as bigint)"))
      .withColumn("a1", expr(s"cast(round($s * total / n_days * 1000000.0) as bigint)"))
      .withColumn("l0", expr("cast(round(ln(cast(total as double) / n_days) * 1000000.0) as bigint)"))
      .withColumn("l1", expr(s"cast(round(ln($s * total / n_days) * 1000000.0) as bigint)"))
      // forward pass: per-day (cost-to-be-base, cost-to-be-burst) plus the
      // packed predecessor bits (bit0: state0's pred was 1; bit1: state1
      // stayed 1). Strict < on every switch; init = start in base (burst
      // reachable only by paying γ).
      .withColumn("fwd", expr(
        s"""aggregate(
           |  transform(dc, x -> named_struct('e0', a0 - x.c * l0, 'e1', a1 - x.c * l1)),
           |  named_struct('c0', 0L, 'c1', ${g}L, 'ch', cast(array() as array<bigint>)),
           |  (acc, x) -> named_struct(
           |    'c0', least(acc.c0, acc.c1) + x.e0,
           |    'c1', least(acc.c0 + ${g}L, acc.c1) + x.e1,
           |    'ch', concat(acc.ch, array(
           |        (case when acc.c1 < acc.c0 then 1L else 0L end)
           |      + (case when acc.c0 + ${g}L < acc.c1 then 0L else 2L end)))))""".stripMargin))
      // backtrack: walk the choice bits newest-to-oldest from the cheaper
      // final state (ties prefer base); ch[day 0] refers to the init
      // pseudo-state and is dropped
      .withColumn("sl", expr("case when fwd.c1 < fwd.c0 then 1L else 0L end"))
      .withColumn("states", expr(
        """reverse(aggregate(
          |  slice(reverse(fwd.ch), 1, size(fwd.ch) - 1),
          |  named_struct('cur', sl, 'st', array(sl)),
          |  (a, x) -> named_struct(
          |    'cur', case when a.cur = 0L then x % 2L else x div 2L end,
          |    'st', concat(a.st, array(
          |      case when a.cur = 0L then x % 2L else x div 2L end)))).st)""".stripMargin))
      .select(col("event_type"),
        explode(expr("zip_with(dc, states, (x, st) -> named_struct('day', x.day, 'c', x.c, 's', st))")).as("r"))
      .select(col("event_type"), col("r.day").as("day"), col("r.c").as("c"), col("r.s").as("s"))
    perType.filter(col("s") === 1L)
      .withColumn("grp", col("day") - row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("day"))))
      .groupBy(col("event_type"), col("grp"))
      .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
        count(lit(1)).as("n_days"), sum(col("c")).as("n_events"))
      .select(col("event_type"), col("start_day"), col("end_day"),
        col("n_days"), col("n_events"))
  }

  def burstKleinbergSql: String = {
    val g = BurstGamma
    val s = BurstRatio
    s"""WITH ev AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events),
       |cal AS (SELECT unnest(range(min(day), max(day) + 1)) AS day FROM ev),
       |cnt AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1, 2),
       |grid AS (
       |  SELECT g.event_type, g.day, coalesce(c.c, 0) AS c
       |  FROM (SELECT t.event_type, ca.day
       |        FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN cal ca) g
       |  LEFT JOIN cnt c ON c.event_type = g.event_type AND c.day = g.day),
       |pt AS (
       |  SELECT event_type,
       |    list({'day': day, 'c': c} ORDER BY day) AS dc,
       |    count(*) AS n_days, sum(c) AS total
       |  FROM grid GROUP BY event_type),
       |sc AS (
       |  SELECT event_type, dc,
       |    CAST(round(CAST(total AS DOUBLE) / n_days * 1000000.0) AS BIGINT) AS a0,
       |    CAST(round($s * total / n_days * 1000000.0) AS BIGINT) AS a1,
       |    CAST(round(ln(CAST(total AS DOUBLE) / n_days) * 1000000.0) AS BIGINT) AS l0,
       |    CAST(round(ln($s * total / n_days) * 1000000.0) AS BIGINT) AS l1
       |  FROM pt),
       |-- duckdb 1.0's list_reduce is UNSAFE with multi-field struct
       |-- accumulators: fields are updated destructively in declaration
       |-- order, so a 'c1' expression reading acc.c0 sees the step's NEW
       |-- c0 (reproduced on a 2-element fold; it silently corrupted the
       |-- whole DP). The accumulator is therefore ONE VARCHAR packing
       |-- 'c0,c1,ch' — a single value can't be partially updated — and
       |-- each step re-parses it with split_part.
       |fw AS (
       |  SELECT event_type, dc,
       |    list_reduce(
       |      list_prepend('0,$g,',
       |        list_transform(dc, x ->
       |          CAST(a0 - x.c * l0 AS VARCHAR) || ',' || CAST(a1 - x.c * l1 AS VARCHAR))),
       |      (acc, x) ->
       |        CAST(least(split_part(acc, ',', 1)::BIGINT, split_part(acc, ',', 2)::BIGINT)
       |             + split_part(x, ',', 1)::BIGINT AS VARCHAR)
       |        || ',' ||
       |        CAST(least(split_part(acc, ',', 1)::BIGINT + $g, split_part(acc, ',', 2)::BIGINT)
       |             + split_part(x, ',', 2)::BIGINT AS VARCHAR)
       |        || ',' ||
       |        split_part(acc, ',', 3) || CAST(
       |            (CASE WHEN split_part(acc, ',', 2)::BIGINT < split_part(acc, ',', 1)::BIGINT
       |                  THEN 1 ELSE 0 END)
       |          + (CASE WHEN split_part(acc, ',', 1)::BIGINT + $g < split_part(acc, ',', 2)::BIGINT
       |                  THEN 0 ELSE 2 END) AS VARCHAR)) AS fwd
       |  FROM sc),
       |fwp AS (
       |  SELECT event_type, dc,
       |    split_part(fwd, ',', 3) AS ch,
       |    CASE WHEN split_part(fwd, ',', 2)::BIGINT < split_part(fwd, ',', 1)::BIGINT
       |         THEN 1 ELSE 0 END AS sl
       |  FROM fw),
       |-- backtrack: the 'cur' state is always the last appended char, so
       |-- the whole accumulator is just the states-so-far VARCHAR
       |bt AS (
       |  SELECT event_type, dc,
       |    reverse(
       |      list_reduce(
       |        list_prepend(CAST(sl AS VARCHAR),
       |          list_filter(string_split(substr(reverse(ch), 1, len(ch) - 1), ''),
       |                      x -> x <> '')),
       |        (acc, x) -> acc || CAST(
       |          CASE WHEN right(acc, 1) = '0' THEN x::BIGINT % 2
       |               ELSE x::BIGINT // 2 END AS VARCHAR))) AS states
       |  FROM fwp),
       |days AS (
       |  SELECT event_type, dc[i].day AS day, dc[i].c AS c,
       |    CAST(substr(states, i, 1) AS BIGINT) AS s
       |  FROM bt, UNNEST(range(1, len(dc) + 1)) AS u(i)),
       |burst AS (
       |  SELECT event_type, day, c,
       |    day - row_number() OVER (PARTITION BY event_type ORDER BY day) AS grp
       |  FROM days WHERE s = 1)
       |SELECT event_type, min(day) AS start_day, max(day) AS end_day,
       |  CAST(count(*) AS BIGINT) AS n_days, CAST(sum(c) AS BIGINT) AS n_events
       |FROM burst GROUP BY event_type, grp""".stripMargin
  }

  /** Holt's linear-trend double-exponential smoothing (α = β = ½) over the
    * per-type daily-count series, with a 7-day-ahead forecast — the
    * capacity-planning twin of [[ewmaPerUser]] (that one smooths LEVEL only;
    * Holt carries an explicit trend term, so a steadily growing event type
    * forecasts growth instead of lagging it). Per type the state seeds as
    * l = y₁, b = y₂ − y₁ (y₂ is consumed by the trend seed), then folds
    * lₜ = ½(yₜ + lₜ₋₁ + bₜ₋₁), bₜ = ½(lₜ − lₜ₋₁ + bₜ₋₁) over t = 3..T;
    * forecast ŷ(h) = l_T + h·b_T for h = 1..7.
    *
    * Exactness: counts scale to micro-units once (·10⁶, no float ever) and
    * every halving is an explicit FLOOR division spelled as
    * `(x − ((x%2)+2)%2) div 2` — the parenthesized term is the nonnegative
    * mod-2 in BOTH engines, making the numerator even, so Spark's
    * truncating `div` and DuckDB's flooring `//` agree even when the trend
    * goes negative (a bare `x div 2` would diverge at the first negative
    * odd value). The whole recurrence folds in one codegen'd `aggregate()`;
    * the oracle replays it with `list_reduce` over a VARCHAR-packed (l, b)
    * state ([[burstKleinberg]]'s duckdb struct-accumulator workaround).
    *
    * Scale shape: same as [[burstKleinberg]] — the corpus collapses to the
    * densified (type × day) grid in one narrow scan + partial agg; the fold
    * runs over per-type day arrays (calendar-bounded); output is
    * |types|·7 rows. */
  def holtForecast(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Caches.persisted(Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day")))
    val cal = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val counts = ev.groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val grid = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(cal))
      .join(counts, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        (coalesce(col("c"), lit(0L)) * 1000000L).as("y"))
    grid.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("day"), col("y")))).as("dy"),
        count(lit(1)).as("n_days"))
      .filter(col("n_days") >= 2)
      .withColumn("lb", expr(
        """aggregate(
          |  slice(dy, 3, size(dy) - 2),
          |  named_struct('l', dy[0].y, 'b', dy[1].y - dy[0].y),
          |  (acc, d) -> named_struct(
          |    'l', (acc.l + acc.b + d.y
          |          - (((acc.l + acc.b + d.y) % 2) + 2) % 2) div 2,
          |    'b', ((acc.l + acc.b + d.y
          |           - (((acc.l + acc.b + d.y) % 2) + 2) % 2) div 2 - acc.l + acc.b
          |          - ((((acc.l + acc.b + d.y
          |                - (((acc.l + acc.b + d.y) % 2) + 2) % 2) div 2 - acc.l + acc.b) % 2) + 2) % 2) div 2))""".stripMargin))
      .select(col("event_type"),
        explode(expr("transform(sequence(1, 7), h -> named_struct(" +
          "'h', CAST(h AS BIGINT), 'yhat_micro', lb.l + h * lb.b))")).as("f"),
        col("lb.l").as("level_micro"), col("lb.b").as("trend_micro"))
      .select(col("event_type"), col("f.h").as("h"),
        col("f.yhat_micro").as("yhat_micro"),
        col("level_micro"), col("trend_micro"))
  }

  def holtForecastSql: String = {
    // floor-div-by-2 with a provably even numerator (see scaladoc); `e`
    // must be a parenthesized BIGINT expression
    def fdiv2(e: String): String = s"(($e) - ((($e) % 2) + 2) % 2) // 2"
    val l = "split_part(acc, ',', 1)::BIGINT"
    val b = "split_part(acc, ',', 2)::BIGINT"
    val nl = fdiv2(s"$l + $b + x::BIGINT")
    val nb = fdiv2(s"$nl - $l + $b")
    s"""WITH ev AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events),
       |cal AS (SELECT unnest(range(min(day), max(day) + 1)) AS day FROM ev),
       |cnt AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY 1, 2),
       |grid AS (
       |  SELECT g.event_type, g.day, coalesce(c.c, 0) * 1000000 AS y
       |  FROM (SELECT t.event_type, ca.day
       |        FROM (SELECT DISTINCT event_type FROM ev) t CROSS JOIN cal ca) g
       |  LEFT JOIN cnt c ON c.event_type = g.event_type AND c.day = g.day),
       |pt AS (
       |  SELECT event_type, list(CAST(y AS VARCHAR) ORDER BY day) AS ys
       |  FROM grid GROUP BY event_type HAVING count(*) >= 2),
       |-- VARCHAR-packed 'l,b' accumulator (duckdb list_reduce struct hazard)
       |lb AS (
       |  SELECT event_type,
       |    list_reduce(
       |      list_prepend(
       |        CAST(ys[1]::BIGINT AS VARCHAR) || ',' || CAST(ys[2]::BIGINT - ys[1]::BIGINT AS VARCHAR),
       |        ys[3:]),
       |      (acc, x) -> CAST($nl AS VARCHAR) || ',' || CAST($nb AS VARCHAR)) AS s
       |  FROM pt),
       |st AS (
       |  SELECT event_type,
       |    split_part(s, ',', 1)::BIGINT AS l, split_part(s, ',', 2)::BIGINT AS b
       |  FROM lb)
       |SELECT event_type, CAST(h AS BIGINT) AS h, l + h * b AS yhat_micro,
       |  l AS level_micro, b AS trend_micro
       |FROM st, UNNEST(range(1, 8)) AS u(h)""".stripMargin
  }

  /** Exact 5%-trimmed mean of the event value per type — the robust
    * central-tendency summary that survives the fat tails [[anomalyDays]]
    * flags (a handful of 490-cent outliers move a plain mean; they cannot
    * move a trimmed one). Keeps exactly the ranks (⌊n/20⌋, n−⌊n/20⌋] of
    * the per-type value order and averages them, reported next to the
    * untrimmed mean so the gap itself is the tail-mass signal.
    *
    * Exactness AND the 100 TB shape come from the same device: the corpus
    * collapses to the per-(type, cents) HISTOGRAM (distinct-value-sized,
    * like [[graft.relational.RelationalQueries]]' two-phase median), the
    * cumulative window runs over distinct values only, and each value
    * contributes `min(cum, hi) − max(cum−c, lo)` copies — the exact
    * partial-count trim at the boundary values, no per-row rank ever
    * materialized. Means are floor divisions spelled sign-safe
    * (`(a − ((a%b)+b)%b) div b`) so a negative-valued deployment cannot
    * split Spark's truncating `div` from DuckDB's flooring `//`. */
  def trimmedStats(spark: SparkSession, dir: String): DataFrame = {
    val h = Tables.events(spark, dir)
      .select(col("event_type"), round(col("value") * 100).cast("bigint").as("cents"))
      .groupBy(col("event_type"), col("cents")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wT = Window.partitionBy(col("event_type"))
    def fdiv(a: String, b: String) = s"(($a) - ((($a) % ($b)) + ($b)) % ($b)) div ($b)"
    h.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wT))
      .withColumn("lo", expr("n * 5 div 100"))
      .withColumn("hi", expr("n - n * 5 div 100"))
      .withColumn("kept", expr("greatest(0L, least(cum, hi) - greatest(cum - c, lo))"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), sum(col("kept")).as("n_kept"),
        sum(expr("kept * cents")).as("sum_kept_cents"),
        sum(expr("c * cents")).as("sum_cents"))
      .select(col("event_type"), col("n"), col("n_kept"),
        expr(fdiv("sum_cents * 1000000", "n")).as("mean_microcents"),
        expr(fdiv("sum_kept_cents * 1000000", "n_kept")).as("trimmed_mean_microcents"))
  }

  def trimmedStatsSql: String = {
    def fdiv(a: String, b: String) = s"(($a) - ((($a) % ($b)) + ($b)) % ($b)) // ($b)"
    s"""WITH h AS (
       |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |w AS (
       |  SELECT event_type, cents, c,
       |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY cents
       |                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
       |  FROM h),
       |k AS (
       |  SELECT event_type, cents, c, cum, n,
       |    n * 5 // 100 AS lo, n - n * 5 // 100 AS hi
       |  FROM w)
       |SELECT event_type, max(n) AS n,
       |  CAST(sum(greatest(0, least(cum, hi) - greatest(cum - c, lo))) AS BIGINT) AS n_kept,
       |  ${fdiv("CAST(sum(c * cents) AS BIGINT) * 1000000", "max(n)")} AS mean_microcents,
       |  ${fdiv(
            "CAST(sum(greatest(0, least(cum, hi) - greatest(cum - c, lo)) * cents) AS BIGINT) * 1000000",
            "CAST(sum(greatest(0, least(cum, hi) - greatest(cum - c, lo))) AS BIGINT)")}
       |    AS trimmed_mean_microcents
       |FROM k GROUP BY event_type""".stripMargin
  }

  /** Time-decayed leaderboard — the top-3 users per event type by
    * exponentially decayed activity, half-life = 1 day: an event aged `a`
    * days (vs the corpus max day) contributes `10⁶ div 2^a`. The "trending
    * now" ranking every feed needs — a user with 50 events last week loses
    * to a user with 3 events today — as exact integers: the decay weight is
    * one shift (`shiftleft(1, a)` ≡ duckdb `1 << a`) and one floor
    * division, so the scores sum associatively under any partitioning.
    * Ages ≥ 20 floor to weight 0 — the window the leaderboard "sees" is
    * self-limiting, which is the point of the decay.
    *
    * Scale shape: one narrow pass against the broadcast 1-row max-day, a
    * (type, user)-keyed partial-agg sum, and a WindowGroupLimit top-3 per
    * type — per-user history compresses map-side. */
  def decayedTopk(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    val maxDay = ev.agg(max(col("day")).as("max_day"))
    ev.crossJoin(broadcast(maxDay))
      .select(col("event_type"), col("user_id"),
        expr("1000000L div shiftleft(1L, cast(least(max_day - day, 62L) as int))").as("w"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("w")).as("decayed_micro"), count(lit(1)).as("n_events"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("decayed_micro").desc, col("user_id").asc)))
      .filter(col("rk") <= 3)
      .select(col("event_type"), col("user_id"), col("decayed_micro"),
        col("n_events"), col("rk").cast("bigint").as("rk"))
  }

  def decayedTopkSql: String =
    """WITH ev AS (
      |  SELECT event_type, user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      |m AS (SELECT max(day) AS max_day FROM ev),
      |s AS (
      |  SELECT event_type, user_id,
      |    CAST(sum(1000000 // (CAST(1 AS BIGINT) << least(max_day - day, 62))) AS BIGINT)
      |      AS decayed_micro,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM ev, m GROUP BY 1, 2)
      |SELECT event_type, user_id, decayed_micro, n_events, rk FROM (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |                               ORDER BY decayed_micro DESC, user_id) AS rk
      |  FROM s) r
      |WHERE rk <= 3""".stripMargin

  /** Bot-likeness score — per user (≥ 5 events), the squared coefficient
    * of variation of the inter-event gaps: humans are bursty (CV² ≈ 1 for
    * Poisson, ≫ 1 for sessions), schedulers are metronomes (CV² → 0), so
    * the LOW tail of this score is the scripted-traffic cleaning list
    * every behavioral dataset needs before it trains anything.
    *
    * Exactness: with m gaps (each truncated to whole seconds), S = Σg
    * (≈ the span, up to the per-gap truncation) and Q = Σg² from one lag
    * window; CV² = (m·Q − S²)/S² exactly in ppm. The ppm scaling splits
    * into quotient·10⁶ + (remainder·10⁶ div S²) — algebraically identical
    * to ⌊(m·Q−S²)·10⁶/S²⌋ but never forms the 10²¹-sized product that a
    * single multiply would (a CV² of 30 on a month-long span overflows
    * int64 the naive way — found by ANSI mode, kept as a two-step
    * division). All terms are non-negative (Cauchy–Schwarz gives
    * m·Q ≥ S²), so `div` ≡ `//`.
    * Second-scale gaps keep m·Q ≤ ~10¹⁶ — int64-safe for year-long spans;
    * microsecond gaps would overflow at Q, which is why the truncation to
    * seconds is part of the contract (regularity at the sub-second level
    * is invisible here and irrelevant to the signal). Zero-span users
    * (all events in one second — a different bot signature) emit CV² = 0
    * and are flagged by `span_s = 0` instead.
    *
    * Scale shape: one user-keyed window pass for the gaps (per-user
    * history bounded), one partial-agg rollup per user; output is
    * users-sized. */
  def botScore(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"))
      .withColumn("g", expr("(us - lag(us) over (partition by user_id order by us, event_id)) div 1000000"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("g")).as("span_s"),
        count(col("g")).as("m"),
        sum(col("g") * col("g")).as("q"))
      .filter(col("n_events") >= 5)
      .select(col("user_id"), col("n_events"), col("span_s"),
        expr("""CASE WHEN span_s = 0 THEN 0L
               |     ELSE ((m * q - span_s * span_s) div (span_s * span_s)) * 1000000
               |        + ((m * q - span_s * span_s) % (span_s * span_s)) * 1000000
               |          div (span_s * span_s) END"""
          .stripMargin).as("cv2_ppm"))

  def botScoreSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |g AS (
      |  SELECT user_id,
      |    (us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)) // 1000000 AS g
      |  FROM e),
      |a AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(sum(g) AS BIGINT) AS span_s,
      |    CAST(count(g) AS BIGINT) AS m,
      |    CAST(sum(g * g) AS BIGINT) AS q
      |  FROM g GROUP BY user_id HAVING count(*) >= 5)
      |SELECT user_id, n_events, span_s,
      |  CASE WHEN span_s = 0 THEN 0
      |       ELSE ((m * q - span_s * span_s) // (span_s * span_s)) * 1000000
      |          + ((m * q - span_s * span_s) % (span_s * span_s)) * 1000000
      |            // (span_s * span_s) END AS cv2_ppm
      |FROM a""".stripMargin

  /** Cohort LTV curve — revenue by (signup-week cohort × weeks-since-
    * signup): the money twin of `events_retention` (that one counts
    * returning users; this routes the purchase cents), the curve every
    * growth team plots. Exact cents; the per-cohort cumulative LTV is a
    * running sum over the AGE axis (calendar-bounded, ≤ weeks² cells).
    * Users without a signup event are out of scope (no cohort).
    *
    * Scale shape: one pass for per-user signup weeks (user-keyed partial
    * agg), one pass for per-(user, week) purchase cents, one user-keyed
    * join, a (cohort × age) partial agg, and the cumulative window over
    * that calendar-bounded rollup. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val cohorts = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(expr("unix_micros(ts) div 604800000000")).as("cohort_week"))
    val rev = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), expr("unix_micros(ts) div 604800000000").as("week"))
      .agg(sum(round(col("value") * 100).cast("bigint")).as("cents"))
    val cells = rev.join(cohorts, "user_id")
      .filter(col("week") >= col("cohort_week"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("age_weeks"))
      .agg(countDistinct(col("user_id")).as("n_buyers"), sum(col("cents")).as("revenue_cents"))
    cells
      .withColumn("cum_revenue_cents", sum(col("revenue_cents")).over(
        Window.partitionBy(col("cohort_week")).orderBy(col("age_weeks"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def cohortLtvSql: String =
    """WITH c AS (
      |  SELECT user_id, min(epoch_us(ts) // 604800000000) AS cohort_week
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |r AS (
      |  SELECT user_id, epoch_us(ts) // 604800000000 AS week,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |cells AS (
      |  SELECT cohort_week, week - cohort_week AS age_weeks,
      |    CAST(count(DISTINCT r.user_id) AS BIGINT) AS n_buyers,
      |    CAST(sum(cents) AS BIGINT) AS revenue_cents
      |  FROM r JOIN c USING (user_id)
      |  WHERE week >= cohort_week
      |  GROUP BY 1, 2)
      |SELECT cohort_week, age_weeks, n_buyers, revenue_cents,
      |  CAST(sum(revenue_cents) OVER (PARTITION BY cohort_week ORDER BY age_weeks
      |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents
      |FROM cells""".stripMargin

  /** Right-to-be-forgotten erasure audit — the GDPR/CCPA compliance sweep
    * over an event store: given a deletion manifest (here derived
    * deterministically — every user who ever hit an `error` event,
    * standing in for the request table), report per event type how many
    * rows the erasure removes, how many survive, and how many distinct
    * users are affected. Kept + erased = total by construction, so the
    * audit doubles as the conservation proof a compliance reviewer asks
    * for.
    *
    * Scale shape: the manifest is a users-with-errors distinct (partial
    * agg, |affected users| rows, broadcast here; past broadcast scale the
    * same plan shuffle-hashes on user_id — the key is already the
    * manifest's key); ONE flag join + one |types|-row rollup. The actual
    * delete is this plan's `erase IS NULL` filter feeding a rewrite —
    * the audit and the delete share the scan. */
  def erasureAudit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("event_type"))
    // |affected users|-sized, so the scaladoc's shuffle-hash fallback is
    // executable: the manifest persists (it is consumed by the count and
    // the join), and past the row gate the flag join shuffles on user_id
    val manifest = graft.Caches.persisted(
      ev.filter(col("event_type") === "error")
        .select(col("user_id")).distinct().withColumn("erase", lit(1L)))
    ev.join(graft.Plans.broadcastIfSmall(manifest,
        graft.Memo.countOf(spark, s"erasure-manifest/$dir", manifest)), Seq("user_id"), "left")
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("erase").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("erase") === 1L, 1L).otherwise(0L)).as("n_erased"),
        countDistinct(when(col("erase") === 1L, col("user_id"))).as("n_users_erased"))
  }

  def erasureAuditSql: String =
    """WITH m AS (
      |  SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
      |f AS (
      |  SELECT e.event_type, e.user_id,
      |    CASE WHEN m.user_id IS NULL THEN 0 ELSE 1 END AS erase
      |  FROM events e LEFT JOIN m ON e.user_id = m.user_id)
      |SELECT event_type,
      |  CAST(sum(CASE WHEN erase = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(erase) AS BIGINT) AS n_erased,
      |  CAST(count(DISTINCT CASE WHEN erase = 1 THEN user_id END) AS BIGINT) AS n_users_erased
      |FROM f GROUP BY event_type""".stripMargin

  /** Robust outlier counts per event type via Median Absolute Deviation —
    * the heavy-tail-safe twin of [[anomalyDays]]' z-score flag: median and
    * MAD don't move when the outliers themselves do, so a burst of bad
    * values can't hide itself by inflating σ. Flags values with
    * |v − median| > 5·MAD, everything in exact value-micros. "Median" is
    * the LOWER median (rank ⌈n/2⌉ ascending) — DuckDB's
    * `quantile_disc(0.5)` convention, verified — so both engines select
    * the identical element with no even-count averaging.
    *
    * Scale shape: each median is the [[graft.relational.RelationalQueries.medianPrice]]
    * two-phase distributed selection, run twice (values, then absolute
    * deviations): a unit-bucket histogram (partial-agg; rows =
    * types × value-range-units, tiny), a cumulative window over that
    * histogram to locate the ONE bucket holding the target rank, and a
    * rank window over only that bucket's sliver — the fact table is never
    * globally sorted, and per-type parallelism never collapses to
    * |types|. */
  def anomalyMad(spark: SparkSession, dir: String): DataFrame = {
    // one selection: the per-type value at ascending rank (n+1) div 2
    def lowerMedian(in: DataFrame, v: String, out: String): DataFrame = {
      val b = in.withColumn("bkt", expr(s"$v div 1000000"))
      val hist = b.groupBy(col("event_type"), col("bkt")).agg(count(lit(1)).as("bc"))
      val wb = Window.partitionBy(col("event_type")).orderBy(col("bkt"))
      val cand = hist
        .withColumn("cum_before",
          coalesce(sum(col("bc")).over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum(col("bc")).over(Window.partitionBy(col("event_type"))))
        .filter(expr("cum_before < (n + 1) div 2 AND cum_before + bc >= (n + 1) div 2"))
        .select(col("event_type"), col("bkt"), col("cum_before"), col("n"))
      val wr = Window.partitionBy(col("event_type")).orderBy(col(v))
      b.join(broadcast(cand), Seq("event_type", "bkt"))
        .withColumn("rn", row_number().over(wr) + col("cum_before"))
        .filter(expr("rn = (n + 1) div 2"))
        .select(col("event_type"), col(v).as(out))
    }
    val v = graft.Caches.persisted(Tables.events(spark, dir)
      .select(col("event_type"), round(col("value") * 1000000).cast("bigint").as("vmic")))
    val med = lowerMedian(v, "vmic", "median_micro")
    val dev = graft.Caches.persisted(v.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("vmic") - col("median_micro"))))
    val mad = lowerMedian(dev.select(col("event_type"), col("dev")), "dev", "mad_micro")
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max(col("median_micro")).as("median_micro"),
        max(col("mad_micro")).as("mad_micro"),
        sum(when(col("dev") > col("mad_micro") * 5, 1L).otherwise(0L)).as("n_anomalies"))
  }

  def anomalyMadSql: String =
    """WITH v AS (
      |  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS vmic FROM events),
      |m AS (SELECT event_type, quantile_disc(vmic, 0.5) AS med FROM v GROUP BY 1),
      |d AS (SELECT v.event_type, vmic, med, abs(vmic - med) AS dev
      |      FROM v JOIN m USING (event_type)),
      |md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad FROM d GROUP BY 1)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(max(med) AS BIGINT) AS median_micro,
      |  CAST(max(mad) AS BIGINT) AS mad_micro,
      |  CAST(sum(CASE WHEN dev > mad * 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
      |FROM d JOIN md USING (event_type)
      |GROUP BY event_type""".stripMargin

  /** Sequence-pattern matching over per-user event journeys — the CEP /
    * MATCH_RECOGNIZE shape ("how many times did this user view, click any
    * number of times, then purchase — with nothing else in between?") via
    * regular expressions over the journey string. Each user's history is
    * folded to a string of event-type initials (c/e/p/s/v — all distinct
    * here) in (ts, event_id) order, and two patterns are counted:
    * `vc*p` (view → clicks → purchase, the clean conversion path) and
    * `ve` (view immediately followed by an error, the rage-quit signal).
    * Both patterns are unambiguous (no alternation, the starred class
    * can't overlap the terminator), so leftmost non-overlapping match
    * counts agree between regex engines (Java here, RE2 in the oracle).
    *
    * Scale shape: ONE user_id-keyed shuffle; each user's journey is one
    * task-local sorted fold (per-user history bounded — the same contract
    * as sessionization), and the regex runs once per user inside the
    * projection. No joins, no re-scans. */
  def patternMatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("i")).as("e"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("user_id"),
        size(col("es")).cast("bigint").as("n_events"),
        expr("array_join(transform(es, x -> x.i), '')").as("journey"))
      .select(col("user_id"), col("n_events"),
        expr("regexp_count(journey, 'vc*p')").cast("bigint").as("n_conversion_paths"),
        expr("regexp_count(journey, 've')").cast("bigint").as("n_view_errors"))

  def patternMatchSql: String =
    """WITH j AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS journey
      |  FROM events GROUP BY user_id)
      |SELECT user_id, n_events,
      |  CAST(len(regexp_extract_all(journey, 'vc*p')) AS BIGINT) AS n_conversion_paths,
      |  CAST(len(regexp_extract_all(journey, 've')) AS BIGINT) AS n_view_errors
      |FROM j""".stripMargin

  /** First-order Markov transition counts between consecutive events of the
    * same user — the sequence-mining staple behind next-action prediction
    * and session-flow dashboards. Order within a user is (ts, event_id):
    * event_id breaks microsecond ties deterministically, so the transition
    * table is engine-portable.
    *
    * Scale shape: one shuffle keyed on user_id feeds the per-user sort
    * window (`lead`), and per-user state is a single lookahead row — Spark
    * streams each user partition, nothing holistic. The final (from, to)
    * rollup is |types|²-sized with map-side combine. At 100 TB a power user
    * is one task's sorted run, not a cross join. */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  private val MarkovScale = 1000000000000L // parts-per-trillion
  private val MarkovRounds = 3

  /** Stationary distribution of the event-type Markov chain — power
    * iteration on the [[transitions]] matrix: where does a user's activity
    * settle? (The linear-algebra fixed point on RELATIONAL data — the
    * matrix is the (from, to, count) table, never a dense structure.)
    *
    * Exact fixed-point arithmetic (the [[graft.dedup.DedupQueries]]
    * doc_pagerank policy): π in integer parts-per-trillion; each round's
    * term `π_i·c(i,j) div c(i)` floor-divides per (i, j) CELL — a
    * deterministic function of the pair, so the per-j sum is associative
    * and partition-order-free where float matrix-vector products are not.
    * [[MarkovRounds]] fixed rounds from the uniform start, unrolled in the
    * oracle. (π·c fits int64 while counts < ~9·10⁶ per cell at the 10¹²
    * scale; past that the same expressions lower to DECIMAL(38,0).)
    *
    * Scale shape: the corpus contributes ONE per-user lead window + the
    * (from, to) partial agg — [[transitions]]'s own shape; every round is
    * |types|²-row arithmetic on broadcast-sized frames. */
  def markovStationary(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.Caches.persisted(transitions(spark, dir))
    val totals = t.groupBy(col("from_type")).agg(sum(col("n_transitions")).as("c_from"))
    val p = graft.Caches.persisted(
      t.join(broadcast(totals), "from_type")
        .select(col("from_type"), col("to_type"), col("n_transitions"), col("c_from")))
    // the uniform start's 1/n is a broadcast one-row aggregate IN the plan
    // (a driver .head here would both serialize an extra job and trip the
    // static no-driver-path gate)
    val n = totals.agg(count(lit(1)).as("n_types"))
    var pi = totals.crossJoin(broadcast(n))
      .select(col("from_type").as("event_type"),
        expr(s"${MarkovScale}L div n_types").as("pi_ppt"))
    for (_ <- 1 to MarkovRounds) {
      pi = p.join(pi.withColumnRenamed("event_type", "from_type"), "from_type")
        .select(col("to_type").as("event_type"),
          expr("pi_ppt * n_transitions div c_from").as("term"))
        .groupBy(col("event_type")).agg(sum(col("term")).as("pi_ppt"))
    }
    pi.select(col("event_type"), col("pi_ppt"),
      round(col("pi_ppt") / 1.0e12, 6).as("pi"))
  }

  /** Oracle: the same [[MarkovRounds]] rounds unrolled; nTypes is a
    * computed scalar so the uniform start matches exactly. */
  def markovStationarySql: String = {
    def round(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT to_type AS event_type,
         |    CAST(sum(pi_ppt * n_transitions // c_from) AS BIGINT) AS pi_ppt
         |  FROM p JOIN $prev ON p.from_type = $prev.event_type
         |  GROUP BY to_type)"""
    s"""WITH t AS (
       |  SELECT event_type AS from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
       |  FROM (
       |    SELECT user_id, event_type,
       |      lead(event_type) OVER (
       |        PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS to_type
       |    FROM events) x
       |  WHERE to_type IS NOT NULL
       |  GROUP BY 1, 2),
       |tot AS (SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS c_from FROM t GROUP BY 1),
       |p AS (SELECT t.from_type, t.to_type, t.n_transitions, tot.c_from
       |      FROM t JOIN tot USING (from_type)),
       |pi0 AS (SELECT from_type AS event_type,
       |          CAST($MarkovScale // (SELECT count(*) FROM tot) AS BIGINT) AS pi_ppt
       |        FROM tot),
       |${round("pi0", "pi1")},
       |${round("pi1", "pi2")},
       |${round("pi2", "pi3")}
       |SELECT event_type, pi_ppt, round(pi_ppt / 1.0e12, 6) AS pi FROM pi3""".stripMargin
  }

  /** Per-user journey negative log-likelihood under the corpus's own
    * first-order transition model — the model-based anomaly score that the
    * heuristic [[botScore]] approximates: a user whose consecutive-event
    * transitions are improbable under the corpus chain reads as scripted /
    * out-of-distribution behavior (and a LOW score as highly stereotyped
    * flow). The behavioral twin of
    * [[graft.pipelines.DataSelection.ngramPerplexity]], sharing its
    * arithmetic policy end to end: add-one smoothing
    * `P(to|from) = (c(from,to)+1)/(c_from+V)` keeps every `ln` input an
    * integer ratio, each per-transition cost snaps to micro-nats per ROW,
    * and the per-user sum is associative int64.
    *
    * Scale shape: ONE user-keyed window pass produces the (user, from, to)
    * pair stream (persisted; the |types|²-row model and its row totals
    * derive from it with map-side combine and broadcast back), then one
    * per-user partial agg. Nothing holistic, nothing corpus² — the model
    * attach is a ≤|types|²-row broadcast join. */
  def userJourneyNll(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val pairs = graft.Caches.persisted(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("event_type").as("from_type"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("to_type", lead(col("from_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .select(col("user_id"), col("from_type"), col("to_type")))
    val t = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).cast("bigint").as("c"))
    val tot = t.groupBy(col("from_type")).agg(sum(col("c")).as("c_from"))
    val v = Tables.events(spark, dir)
      .agg(countDistinct(col("event_type")).cast("bigint").as("v"))
    pairs
      .join(broadcast(t), Seq("from_type", "to_type"))
      .join(broadcast(tot), "from_type")
      .crossJoin(broadcast(v))
      .withColumn("nll_micro",
        expr("cast(round(ln((c_from + v) / (c + 1)) * 1000000) as bigint)"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("bigint").as("n_transitions"),
        sum(col("nll_micro")).as("nll"))
      .withColumn("avg_nll", round(col("nll") / (col("n_transitions") * 1000000.0), 6))
  }

  def userJourneyNllSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |pr AS (
      |  SELECT user_id, event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type
      |  FROM e),
      |pp AS (SELECT user_id, from_type, to_type FROM pr WHERE to_type IS NOT NULL),
      |t AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS c FROM pp GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(sum(c) AS BIGINT) AS c_from FROM t GROUP BY 1),
      |v AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS v FROM e),
      |sc AS (
      |  SELECT user_id,
      |    CAST(round(ln((c_from + v) / (c + 1)) * 1000000) AS BIGINT) AS nll_micro
      |  FROM pp JOIN t USING (from_type, to_type) JOIN tot USING (from_type), v)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_transitions,
      |  CAST(sum(nll_micro) AS BIGINT) AS nll,
      |  round(sum(nll_micro) / (count(*) * 1000000.0e0), 6) AS avg_nll
      |FROM sc GROUP BY user_id""".stripMargin

  def transitionsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |t AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type
      |  FROM e)
      |SELECT from_type, to_type, count(*) AS n_transitions
      |FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2""".stripMargin

  /** Daily OHLC bars per event type over `value` — the time-series rollup
    * (open = value at the first event of the day, close = at the last,
    * high/low = extremes). open/close use `min_by`/`max_by` with a
    * (ts, event_id) struct key so microsecond ties resolve identically in
    * both engines; DuckDB's ordered-aggregate `first(… ORDER BY …)` is the
    * oracle twin. All four outputs are SELECTED doubles, never arithmetic
    * results, so the hash-compare sees bit-identical parquet values.
    *
    * Scale shape: a single partial-aggregable shuffle of width
    * (types × days); min_by/max_by partials are one (key, value) pair each,
    * so map-side combine reduces every partition to its bar fragments. */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"),
        col("value"), expr("unix_micros(ts)").as("us"), col("event_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(
        min_by(col("value"), struct(col("us"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("us"), col("event_id"))).as("close"),
        count(lit(1)).as("n_events"))

  def ohlcBarsSql: String =
    """SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |  first(value ORDER BY epoch_us(ts), event_id) AS open,
      |  max(value) AS high,
      |  min(value) AS low,
      |  last(value ORDER BY epoch_us(ts), event_id) AS close,
      |  count(*) AS n_events
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Count-Min point-frequency audit: the 20 busiest users (exact count,
    * deterministic tiebreak) each checked against the
    * [[graft.functions.CountMinSketch]] estimate. Both contract flags are
    * decidable by the oracle because the sketch's counters are
    * bit-identical under every merge order (elementwise-sum merge):
    *   - `cms_no_undercount`: CMS estimates NEVER undercount — a hard
    *     guarantee, TRUE under any data;
    *   - `cms_within_1pct`: overcount ≤ max(1, N/100) — the expected
    *     colliding mass is N/4096 per row and the estimate takes the MIN
    *     over 5 independently-hashed rows, so 1% of N is ~40× margin, not
    *     slack in the claim.
    *
    * Scale shape: the exact side is one partial-agg shuffle + global
    * top-20 (TakeOrderedAndProject); the sketch side ships ONE 160 KiB
    * array per partition regardless of user cardinality; sketch and total
    * broadcast back as single rows. This is the shape that answers
    * "how often does key X occur in 100 TB" without materializing the
    * full per-key count table. */
  def cmsUserCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.events(spark, dir).select(col("user_id"))
    val top = ids.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("user_id").asc).limit(20)
    val sketch = ids.as[Long]
      .select(new graft.functions.CountMinSketch().toColumn.name("sk"))
    val est = graft.functions.CountMinSketch.probe(col("sk"), col("user_id"))
    // N comes from the sketch itself: every update increments exactly one
    // counter per row, so row 0 sums to the stream length — no third scan
    // of the raw events (ExplainAll showed one before this derivation)
    val total = expr(
      s"aggregate(slice(sk, 1, ${graft.functions.CountMinSketch.Width}), 0L, (a, x) -> a + x)")
    top.crossJoin(broadcast(sketch))
      .select(col("user_id"), col("n_events"),
        (est >= col("n_events")).as("cms_no_undercount"),
        (est <= col("n_events") + greatest(lit(1L), (total / lit(100)).cast("long")))
          .as("cms_within_1pct"))
  }

  def cmsUserCountsSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  TRUE AS cms_no_undercount, TRUE AS cms_within_1pct
      |FROM events GROUP BY user_id
      |ORDER BY n_events DESC, user_id LIMIT 20""".stripMargin

  /** Gap-filled hourly series — the resample operator: every (type, hour)
    * cell in the observed global hour range exists in the output, zeros
    * included (real zeros at the verify SF: each type misses ~5% of the
    * 720-hour span at sf0.01). Time-series consumers (anomaly detection,
    * forecasting) need the dense grid; a groupBy alone silently drops
    * empty cells and the downstream model never knows.
    *
    * Scale shape: the spine is |types| × |hours| rows built from a
    * broadcast min/max scalar and a `sequence` explode — never a scan of
    * raw events; the observed counts attach by a left join that Catalyst
    * plans against the (types × hours)-sized aggregate, not the fact
    * table. */
  def hourlyFilled(spark: SparkSession, dir: String): DataFrame = {
    // persisted: bounds, the type list and the left join all read this
    // (types × hours)-sized rollup — unpersisted, each consumer re-scans
    // the raw events (three full passes, seen in ExplainAll)
    val hourly = graft.Caches.persisted(Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hour"))
      .agg(count(lit(1)).as("n")))
    val bounds = hourly.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val types = hourly.select(col("event_type")).distinct()
    types
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("hour"))
      .join(hourly, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"), coalesce(col("n"), lit(0L)).as("n_events"))
  }

  def hourlyFilledSql: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM hourly),
      |spine AS (
      |  SELECT t.event_type, u.hour
      |  FROM (SELECT DISTINCT event_type FROM hourly) t,
      |       bounds, unnest(range(h0, h1 + 1)) AS u(hour))
      |SELECT spine.event_type, spine.hour, coalesce(n, 0) AS n_events
      |FROM spine LEFT JOIN hourly
      |  ON hourly.event_type = spine.event_type AND hourly.hour = spine.hour""".stripMargin

  /** The same as-of result as [[asofPurchase]], computed through the
    * NATIVE [[graft.plans.AsofJoinExec]] physical operator instead of the
    * union-window composition: clicks merge-joined to the latest strictly
    * earlier purchase per user in one O(|L|+|R|) sorted pass. Shares
    * [[asofPurchaseSql]]'s oracle — two physical strategies, one
    * hash-verified answer (the same pattern as `events_top3_agg`). */
  def asofPurchaseNative(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts) div 1000").as("ms"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ms"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("prev_purchase_id"),
        col("ms").as("p_ms"))
    graft.plans.AsofJoinOps
      .asof(spark, clicks, "user_id", "ms", "event_id",
        purchases, "p_user", "p_ms", "prev_purchase_id")
      .select(col("user_id"), col("event_id"), col("prev_purchase_id"),
        (col("ms") - col("p_ms")).as("ms_since_purchase"))
  }

  /** CDC-style compaction: each user's LATEST event (by event time,
    * event_id tiebreak) — the "current state" materialization every
    * change-stream consumer runs. One `max_by` with a total-order key:
    * a single partial-aggregable shuffle whose state per key is one
    * struct, vs the row_number-over-window formulation that sorts every
    * user's full history. */
  def latestPerUser(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(
        max_by(struct(col("event_id"), col("event_type"), col("us")),
          struct(col("us"), col("event_id"))).as("last"))
      .select(col("user_id"), col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_type"), col("last.us").as("last_us"))

  def latestPerUserSql: String =
    """SELECT user_id,
      |  last(event_id ORDER BY epoch_us(ts), event_id) AS last_event_id,
      |  last(event_type ORDER BY epoch_us(ts), event_id) AS last_type,
      |  last(epoch_us(ts) ORDER BY epoch_us(ts), event_id) AS last_us
      |FROM events GROUP BY user_id""".stripMargin

  /** Peak session concurrency — the sweep-line / gaps-and-islands member
    * of the event family: how many 30-minute-gap sessions were open at
    * once, at their global maximum, and when that peak was first reached.
    *
    * Sessions come from the same marker-cumsum machinery as [[sessions]];
    * each closed session emits (+1 at start, −1 at end+1) boundary rows
    * and a running sum over the global (time, delta) order is the live
    * count — `delta` ascending within a tie-second processes the −1
    * first, so back-to-back sessions never double-count. The final row is
    * the max count with the earliest second achieving it (total order ⇒
    * engine-identical).
    *
    * Scale shape: boundaries are 2×|sessions| rows — orders of magnitude
    * below raw events — so the one global sort is tiny; past that, the
    * standard two-level prefix sum (per-bucket cumsum + carry-in of
    * per-bucket totals) computes the same running count with no global
    * sort, bucketed by day. */
  def sessionConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val sess = eventsByUser(spark, dir)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
      .withColumn("new_session",
        when(col("sec") - lag(col("sec"), 1).over(byUser) > SessionGapSec, 1)
          .when(lag(col("sec"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("sec")).as("s0"), max(col("sec")).as("s1"))
    // persisted at both reuse points: unpersisted, the boundary union and
    // the max/filter pair re-expand into four full scans of raw events
    // (seen in ExplainAll); sessions and boundaries are both tiny
    val sessP = graft.Caches.persisted(sess)
    val bounds = sessP
      .select(col("s0").as("t"), lit(1L).as("delta"))
      .union(sessP.select((col("s1") + 1).as("t"), lit(-1L).as("delta")))
    val swept = graft.Caches.persisted(bounds
      .withColumn("live", sum(col("delta")).over(
        Window.orderBy(col("t"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    swept.agg(max(col("live")).as("max_concurrent"))
      .crossJoin(swept)
      .filter(col("live") === col("max_concurrent"))
      .groupBy(col("max_concurrent"))
      .agg(min(col("t")).as("first_peak_sec"))
  }

  def sessionConcurrencySql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
       |marked AS (
       |  SELECT user_id, sec, event_id,
       |    CASE WHEN lag(sec) OVER w IS NULL THEN 1
       |         WHEN sec - lag(sec) OVER w > $SessionGapSec THEN 1
       |         ELSE 0 END AS new_session
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
       |numbered AS (
       |  SELECT user_id, sec,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
       |                           ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM marked),
       |sess AS (
       |  SELECT user_id, session_idx, min(sec) AS s0, max(sec) AS s1
       |  FROM numbered GROUP BY 1, 2),
       |bounds AS (
       |  SELECT s0 AS t, CAST(1 AS BIGINT) AS delta FROM sess
       |  UNION ALL SELECT s1 + 1, -1 FROM sess),
       |swept AS (
       |  SELECT t, CAST(sum(delta) OVER (ORDER BY t, delta ROWS UNBOUNDED PRECEDING)
       |            AS BIGINT) AS live
       |  FROM bounds)
       |SELECT max_concurrent, min(t) AS first_peak_sec
       |FROM swept, (SELECT max(live) AS max_concurrent FROM swept)
       |WHERE live = max_concurrent
       |GROUP BY 1""".stripMargin

  /** Per-type linear trend over daily volumes — exact integer OLS (the
    * REGR_SLOPE/REGR_INTERCEPT family, plus a one-step forecast), the
    * time-series sibling of [[anomalyDays]]' variance gate. Day indices are
    * re-centered against the broadcast global minimum so every power sum
    * stays far inside int64, and slope/intercept/forecast are emitted in
    * exact parts-per-million via integer floor division — the same value in
    * any engine, where the textbook float quotients would hash-mismatch.
    *
    * Scale shape: one narrow rollup pass (the (types × days) daily table),
    * a 1-row broadcast for the origin day, then a types-sized aggregation —
    * raw events are scanned once. */
  def trend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("y"))
    val origin = daily.agg(min(col("day")).as("d0"))
    val sums = daily.crossJoin(broadcast(origin))
      .withColumn("x", col("day") - col("d0"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        max(col("x")).as("xmax"))
    sums
      .filter(col("n_days") >= 2)
      .withColumn("slope_ppm",
        expr("(n_days * sxy - sx * sy) * 1000000 div (n_days * sxx - sx * sx)"))
      .withColumn("intercept_ppm",
        expr("(sy * 1000000 - slope_ppm * sx) div n_days"))
      .withColumn("forecast_next_ppm",
        expr("intercept_ppm + slope_ppm * (xmax + 1)"))
      .select(col("event_type"), col("n_days"),
        col("slope_ppm"), col("intercept_ppm"), col("forecast_next_ppm"))
  }

  def trendSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |origin AS (SELECT min(day) AS d0 FROM daily),
      |sums AS (
      |  SELECT event_type, count(*) AS n_days,
      |    sum(day - d0) AS sx, sum((day - d0) * (day - d0)) AS sxx,
      |    sum(y) AS sy, sum((day - d0) * y) AS sxy,
      |    max(day - d0) AS xmax
      |  FROM daily CROSS JOIN origin GROUP BY 1)
      |SELECT event_type, n_days::BIGINT AS n_days,
      |  ((n_days * sxy - sx * sy) * 1000000 // (n_days * sxx - sx * sx))::BIGINT AS slope_ppm,
      |  ((sy * 1000000 - ((n_days * sxy - sx * sy) * 1000000 // (n_days * sxx - sx * sx)) * sx)
      |     // n_days)::BIGINT AS intercept_ppm,
      |  (((sy * 1000000 - ((n_days * sxy - sx * sy) * 1000000 // (n_days * sxx - sx * sx)) * sx)
      |     // n_days)
      |   + ((n_days * sxy - sx * sy) * 1000000 // (n_days * sxx - sx * sx)) * (xmax + 1))::BIGINT
      |    AS forecast_next_ppm
      |FROM sums WHERE n_days >= 2""".stripMargin

  /** Top user journeys: each user's first three events (ordered by
    * (ts, event_id) — the engine-portable total order every sequence
    * operator here uses) joined into a path string, counted across users,
    * top-10 by frequency. The product-analytics "common paths" query.
    *
    * Scale shape: one per-user shuffle builds the (≤3)-step path — the
    * sort is per-user inside an `array_sort`, never a window over the
    * stream — then a path-sized partial agg and a TakeOrderedAndProject
    * top-k. */
  def topPaths(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), col("event_type")).as("e"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .select(concat_ws(">",
        expr("transform(slice(es, 1, 3), x -> x.event_type)")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), asc("path"))
      .limit(10)

  def topPathsSql: String =
    """WITH ranked AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |paths AS (
      |  SELECT string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM ranked WHERE rn <= 3 GROUP BY user_id)
      |SELECT path, count(*)::BIGINT AS n_users
      |FROM paths GROUP BY path
      |ORDER BY n_users DESC, path LIMIT 10""".stripMargin

  /** The events span Jan 2024; MERGE splits the stream at this cut into a
    * base snapshot and a CDC delta. */
  private[graft] val MergeCutUs: Long =
    java.time.Instant.parse("2024-01-20T00:00:00Z").toEpochMilli * 1000L

  /** Per-user profile state for [[mergeUpsert]]: event count, last-activity
    * micros, and account status = the event_type of the latest
    * signup-or-error event ((us, event_id) total order; `max` of a struct
    * ignores the nulls the `when` leaves on non-status rows). One partial-agg
    * shuffle on user_id. */
  private[graft] def profileState(e: DataFrame): DataFrame =
    e.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_events"),
      max(col("us")).as("last_us"),
      max(when(col("event_type").isin("signup", "error"),
        struct(col("us"), col("event_id"), col("event_type")))).as("st"))
      .select(col("user_id"), col("n_events"), col("last_us"),
        col("st.event_type").as("status"))

  /** Batch CDC MERGE (the `MERGE INTO` of lakehouse engines): fold a change
    * delta into a keyed base snapshot with insert, update, AND delete
    * semantics — the piece [[latestPerUser]] (pure latest-per-key) does not
    * exercise.
    *
    * Model: events before [[MergeCutUs]] build the base profile table;
    * events after are the delta. The merge is one full-outer join on the
    * key: counts add, last-activity takes the max, and status takes the
    * delta's latest status event when it has one (every delta event
    * postdates every base event, so `coalesce(delta, base)` IS
    * latest-by-time). Users whose final status is 'error' (account closed)
    * are deleted from the output; users with no signup ever never appear —
    * the MERGE's delete branch.
    *
    * The oracle recomputes the final state from the unsplit stream, so the
    * hash-compare proves the merge algebra (add / max / coalesce / delete)
    * equals recompute-from-scratch — the same mergeability proof shape as
    * `pricing_incremental`, extended to key-level upserts and deletes.
    *
    * Scale: each side is one partial-agg shuffle on user_id; the merge is a
    * same-key full-outer join, so AQE plans a co-partitioned sort-merge with
    * no extra exchange. At 100 TB the base snapshot would be stored bucketed
    * by user_id, making the merge a zero-shuffle co-located join against
    * yesterday's buckets ([[graft.sources.BucketedTables]] is that layout). */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val base = profileState(e.filter(col("us") < MergeCutUs))
      .select(col("user_id"), col("n_events").as("b_n"),
        col("last_us").as("b_last"), col("status").as("b_status"))
    val delta = profileState(e.filter(col("us") >= MergeCutUs))
      .select(col("user_id"), col("n_events").as("d_n"),
        col("last_us").as("d_last"), col("status").as("d_status"))
    base.join(delta, Seq("user_id"), "full_outer")
      .select(
        col("user_id"),
        coalesce(col("d_status"), col("b_status")).as("status"),
        (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_events"),
        greatest(col("b_last"), col("d_last")).as("last_us"))
      .filter(col("status") === "signup")
  }

  def mergeUpsertSql: String =
    """WITH counts AS (
      |  SELECT user_id, count(*)::BIGINT AS n_events,
      |    max(epoch_us(ts)) AS last_us
      |  FROM events GROUP BY 1),
      |st AS (
      |  SELECT user_id, event_type AS status FROM (
      |    SELECT user_id, event_type, row_number() OVER (
      |      PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC
      |    ) AS rn
      |    FROM events WHERE event_type IN ('signup', 'error'))
      |  WHERE rn = 1)
      |SELECT c.user_id, st.status, c.n_events, c.last_us
      |FROM counts c JOIN st USING (user_id)
      |WHERE st.status = 'signup'""".stripMargin

  /** SCD2 point-in-time dimension join: each 'signup' event opens a new
    * slowly-changing dimension version for its user (valid_from = the
    * signup instant, valid_to = the next signup's instant via `lead`, open
    * tail NULL), carrying a plan tier attribute (event_id mod 3). Each
    * 'purchase' fact joins to the version valid at its own event time and
    * revenue (integer cents) rolls up per tier; purchases before any signup
    * land in tier -1.
    *
    * This is the canonical warehouse temporal join — distinct in plan shape
    * from the window as-of ([[asofPurchase]]): the dimension is built once
    * (small — one row per signup) and the fact side joins EQUI on user_id
    * with the validity range as a join residual. Versions tile time
    * disjointly, so each fact matches at most one version: no row
    * explosion, and the per-user match work is |signups_u| × |purchases_u|
    * worst case — bounded by per-user activity, never corpus-quadratic.
    *
    * Scale: dimension ≪ facts, so Spark broadcasts it (dims that outgrow
    * the broadcast threshold fall back to a user_id-co-partitioned
    * sort-merge with the same residual); the fact table is read in one
    * narrow pass; the final rollup is a 4-row aggregate. */
  def scd2Revenue(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"), col("value"))
    val dim = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("d_user"), col("event_id").as("d_id"),
        (col("event_id") % 3).as("tier"), col("us").as("valid_from"))
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(col("d_user"))
            .orderBy(col("valid_from"), col("d_id"))))
      .drop("d_id")
    val facts = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"),
        round(col("value") * 100).cast("bigint").as("cents"))
    facts.join(dim,
        facts("user_id") === dim("d_user") &&
          facts("us") >= dim("valid_from") &&
          (dim("valid_to").isNull || facts("us") < dim("valid_to")),
        "left")
      .groupBy(coalesce(col("tier"), lit(-1L)).as("tier"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents"))
  }

  def scd2RevenueSql: String =
    """WITH dim AS (
      |  SELECT user_id AS d_user, event_id % 3 AS tier,
      |    epoch_us(ts) AS valid_from,
      |    lead(epoch_us(ts)) OVER (
      |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |    ) AS valid_to
      |  FROM events WHERE event_type = 'signup'),
      |f AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase')
      |SELECT coalesce(d.tier, -1) AS tier,
      |  count(*)::BIGINT AS n_purchases, sum(f.cents)::BIGINT AS cents
      |FROM f LEFT JOIN dim d
      |  ON f.user_id = d.d_user AND f.us >= d.valid_from
      |  AND (d.valid_to IS NULL OR f.us < d.valid_to)
      |GROUP BY 1""".stripMargin

  /** Lag-1 autocorrelation of each type's daily event volume, in exact
    * integer arithmetic: with n days (zero-filled over the type's observed
    * [min, max] day span — the gap-fill spine is the [[hourlyFilled]]
    * machinery at day grain) and S = Σ c_d, report the n²-scaled
    * autocovariance Σ (n·c_d − S)(n·c_{d+1} − S) and variance
    * Σ (n·c_d − S)² as int64s plus their IEEE quotient r1 — the
    * signal behind "is traffic mean-reverting day over day" and the exact
    * sibling of [[trendDaily]]'s OLS slope.
    *
    * Determinism: both sums are integer totals of integer products, so the
    * result is partitioning-independent; only the final one-div ratio is
    * floating point, identical in any engine. Int64 headroom: |n·c − S| <
    * n·max(c); products stay under 2⁶³ while n·max(c) < 3×10⁹ — days ×
    * daily-peak bounds far beyond these tables; past that the same plan
    * runs in DECIMAL(38,0).
    *
    * Scale: one (type, day) partial agg over the stream, then everything
    * downstream — spine, per-type scalars (5 rows, broadcast back), lead
    * window, final agg — runs on the days×types table, thousands of rows at
    * any corpus size. */
  def autocorrDaily(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("d"))
    // persisted: daily feeds the spine bounds, the gap-fill join, and (via
    // filled) the per-type scalars — unpersisted, each consumer re-expands
    // into its own full scan of raw events (4 scans in the static plan)
    // for a days×types-sized table
    val daily = graft.Caches.persisted(
      e.groupBy(col("event_type"), col("d")).agg(count(lit(1)).as("c")))
    val spine = daily.groupBy(col("event_type"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val filled = spine.join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"), col("d"), coalesce(col("c"), lit(0L)).as("c"))
    val stats = filled.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("d"))
    filled.join(broadcast(stats), Seq("event_type"))
      .withColumn("cn", lead(col("c"), 1).over(byType))
      .withColumn("dev", col("n") * col("c") - col("s"))
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n_days"),
        sum(when(col("cn").isNotNull,
          col("dev") * (col("n") * col("cn") - col("s")))).as("acov_num"),
        sum(col("dev") * col("dev")).as("var_num"))
      .withColumn("r1", col("acov_num").cast("double") / col("var_num"))
  }

  def autocorrDailySql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
      |    count(*)::BIGINT AS c
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT event_type, unnest(range(d0, d1 + 1)) AS d
      |  FROM (SELECT event_type, min(d) AS d0, max(d) AS d1
      |        FROM daily GROUP BY 1)),
      |filled AS (
      |  SELECT s.event_type, s.d, coalesce(daily.c, 0)::BIGINT AS c
      |  FROM spine s LEFT JOIN daily USING (event_type, d)),
      |st AS (
      |  SELECT event_type, count(*)::BIGINT AS n, sum(c)::BIGINT AS s
      |  FROM filled GROUP BY 1),
      |l AS (
      |  SELECT f.event_type, f.c, st.n, st.s,
      |    lead(f.c) OVER (PARTITION BY f.event_type ORDER BY f.d) AS cn
      |  FROM filled f JOIN st USING (event_type))
      |SELECT event_type, max(n) AS n_days,
      |  sum(CASE WHEN cn IS NOT NULL
      |      THEN (n*c - s) * (n*cn - s) END)::BIGINT AS acov_num,
      |  sum((n*c - s) * (n*c - s))::BIGINT AS var_num,
      |  CAST(sum(CASE WHEN cn IS NOT NULL
      |      THEN (n*c - s) * (n*cn - s) END) AS DOUBLE)
      |    / sum((n*c - s) * (n*c - s)) AS r1
      |FROM l GROUP BY 1""".stripMargin

  /** Session-entry revenue attribution — the marketing-analytics operator
    * on top of [[sessions]]' machinery: every purchase's revenue (integer
    * cents) is credited to the event type that OPENED its session (the
    * "how did the converting visit start" readout; funnel counts
    * conversions, this routes the money). Same 30-minute-gap marker
    * cumsum as [[sessions]], then `first` over the per-session order
    * labels every event with its session's entry type, purchases filter
    * out, and a 5-row rollup sums exact cents per entry type.
    *
    * Scale: the one corpus shuffle is the per-user window (both windows —
    * session numbering and entry labeling — share the user_id exchange,
    * the second just re-sorts within it); the rollup is |event types|
    * rows. */
  def sessionAttribution(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val evts = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .withColumn("new_session",
        when(col("sec") - lag(col("sec"), 1).over(byUser) > SessionGapSec, 1)
          .when(lag(col("sec"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bySession = Window.partitionBy(col("user_id"), col("session_idx"))
      .orderBy(col("ts"), col("event_id"))
    evts
      .withColumn("entry_type", first(col("event_type")).over(bySession))
      .filter(col("event_type") === "purchase")
      .groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents"))
  }

  def sessionAttributionSql: String =
    s"""WITH e AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |marked AS (
       |  SELECT *,
       |    CASE WHEN lag(sec) OVER w IS NULL THEN 1
       |         WHEN sec - lag(sec) OVER w > $SessionGapSec THEN 1
       |         ELSE 0 END AS new_session
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |numbered AS (
       |  SELECT *,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                           ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM marked),
       |labeled AS (
       |  SELECT *,
       |    first_value(event_type) OVER (
       |      PARTITION BY user_id, session_idx ORDER BY ts, event_id
       |    ) AS entry_type
       |  FROM numbered)
       |SELECT entry_type, count(*)::BIGINT AS n_purchases,
       |  sum(cents)::BIGINT AS cents
       |FROM labeled WHERE event_type = 'purchase'
       |GROUP BY entry_type""".stripMargin

  /** Exact rolling 7-day active users per day (the WAU curve) — the
    * sliding-window DISTINCT count, which no window frame computes
    * directly (count-distinct over a moving frame isn't an associative
    * aggregate). The scalable formulation: collapse the stream to
    * distinct (user, day) presence pairs — the only corpus-sized shuffle —
    * then each pair CONTRIBUTES presence to the 7 window-days it can
    * serve, and a distinct on (window_day, user) + a per-day count gives
    * the exact rolling distinct. Total shuffled volume is 7×|user-days|,
    * linear in activity; the naive per-day re-scan reads each event 7
    * times AND re-deduplicates per window. Windows clip to the observed
    * [min, max] day span so every reported day aggregates a fully-defined
    * (possibly ramp-up) window. */
  def rollingActiveUsers(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct()
    val bounds = ud.agg(max(col("d")).as("d1"))
    ud.select(col("user_id"), explode(sequence(col("d"), col("d") + 6)).as("day"))
      .distinct()
      .crossJoin(broadcast(bounds))
      .filter(col("day") <= col("d1"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("wau"))
  }

  def rollingActiveUsersSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
      |  FROM events),
      |b AS (SELECT max(d) AS d1 FROM ud),
      |w AS (
      |  SELECT DISTINCT user_id, d + g AS day
      |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS g) s)
      |SELECT day, count(*)::BIGINT AS wau
      |FROM w, b WHERE day <= d1
      |GROUP BY day""".stripMargin

  /** Conversion bar for [[abTest]] — the synthetic per-user purchase-count
    * median, so both variants hold informative proportions. */
  private val AbConvertBar = 14L

  /** A/B experiment readout — the experimentation-analytics operator: users
    * split into two deterministic variants (id-hash parity, the engine's
    * no-RNG assignment discipline shared with `train_split`), and the
    * conversion contrast (converted = at least [[AbConvertBar]] purchases —
    * every synthetic user buys at least once, so the bar sits at the
    * median to make the proportion informative) is reported in exact
    * integers: exposed users, converted users, conversion in ppm (integer
    * division) — the sufficient statistics for any significance test,
    * kept partition- and engine-exact so the readout cannot drift between
    * engines; the suite reconstructs the two-proportion z-statistic from
    * these counts.
    *
    * Scale: one (user → variant, converted) partial agg over the stream —
    * the per-user distinct is the only corpus-sized shuffle — then a 2-row
    * rollup. */
  def abTest(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        >= AbConvertBar, 1L).otherwise(0L).as("converted"))
      .withColumn("variant",
        when(pmod(conv(substring(md5(col("user_id").cast("string")), 1, 13), 16, 10)
          .cast("bigint"), lit(2)) === 0, "A").otherwise("B"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_converted"))
      .withColumn("conversion_ppm",
        expr("n_converted * 1000000 div n_users"))

  def abTestSql: String =
    s"""SELECT variant, count(*)::BIGINT AS n_users,
       |  sum(converted)::BIGINT AS n_converted,
       |  ((sum(converted)::BIGINT * 1000000) // count(*))::BIGINT AS conversion_ppm
       |FROM (
       |  SELECT user_id,
       |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT % 2 = 0
       |         THEN 'A' ELSE 'B' END AS variant,
       |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |              >= $AbConvertBar THEN 1 ELSE 0 END AS converted
       |  FROM events GROUP BY user_id) u
       |GROUP BY variant""".stripMargin

  /** Per-user time-weighted average value (TWAP) — the step-function time
    * integral: each event's value holds until the user's next event, so
    * the average weights every observation by how long it was current,
    * not by how often the user emitted events. The temporal-analytics
    * staple that plain `avg(value)` silently gets wrong on irregular
    * streams (a burst of cheap events would swamp one long-held state).
    *
    * Exact arithmetic: value in integer cents, durations in integer
    * micros; the numerator Σ cents·Δus and denominator Σ Δus are int64
    * sums of int64 products (headroom: cents·span < 2⁶³ until per-user
    * spans × values reach ~10¹⁸ µs-cents — decades); `twap` is their one
    * IEEE division. The last event has no successor and zero width —
    * single-event users carry no interval mass and are excluded, matching
    * the integral's domain.
    *
    * Scale: one per-user window (lead) on the (us, event_id) total order
    * — a single keyed shuffle — then a per-user partial agg on the same
    * key; Spark plans the window's sort and the agg in one exchange. */
  def twapPerUser(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .withColumn("dur", lead(col("us"), 1).over(byUser) - col("us"))
      .filter(col("dur").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(col("dur")).as("span_us"),
        sum(col("cents") * col("dur")).as("twap_num"))
      .filter(col("span_us") > 0)
      .withColumn("twap", col("twap_num").cast("double") / col("span_us"))
  }

  def twapPerUserSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    lead(epoch_us(ts)) OVER (
      |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |    ) - epoch_us(ts) AS dur
      |  FROM events)
      |SELECT user_id, sum(dur)::BIGINT AS span_us,
      |  sum(cents * dur)::BIGINT AS twap_num,
      |  CAST(sum(cents * dur) AS DOUBLE) / sum(dur) AS twap
      |FROM e WHERE dur IS NOT NULL
      |GROUP BY user_id HAVING sum(dur) > 0""".stripMargin

  /** Multi-touch LINEAR attribution — the allocation-fair sibling of
    * [[sessionAttribution]] (which routes all credit to the session
    * entry): each purchase's cents split EQUALLY across every preceding
    * event in its 30-min-gap session, the division remainder credited to
    * the earliest touch so money conserves to the cent (the property
    * float shares can't give: Σ credited ≡ Σ purchase cents, exactly).
    * Touchless purchases land in the 'direct' bucket.
    *
    * Scale shape: sessionization is the shared per-user window; the
    * touch⋈purchase join keys on (user, session) so pair expansion is
    * bounded by single-session sizes (never a user's full history); the
    * remainder rank window shares the same keys. Output is
    * |event types|+1 rows. */
  def linearAttribution(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // persisted: the sessionized frame feeds purchases AND touches in both
    // the credited and the 'direct' branch — four consumers; unpersisted,
    // each re-runs the sessionization window from the raw scan
    val evts = graft.Caches.persisted(eventsByUser(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"),
        expr("unix_micros(ts)").as("us"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .withColumn("new_session",
        when(col("sec") - lag(col("sec"), 1).over(byUser) > SessionGapSec, 1)
          .when(lag(col("sec"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    val purchases = evts.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("session_idx"), col("event_id").as("p_id"),
        col("us").as("p_us"), col("cents"))
    val touches = evts.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("session_idx"), col("event_id").as("t_id"),
        col("us").as("t_us"), col("event_type").as("touch_type"))
    val pairs = purchases.join(touches, Seq("user_id", "session_idx"))
      .filter(col("t_us") < col("p_us") ||
        (col("t_us") === col("p_us") && col("t_id") < col("p_id")))
    val perPurchase = Window.partitionBy(col("user_id"), col("p_id"))
    val credited = pairs
      .withColumn("k", count(lit(1)).over(perPurchase))
      .withColumn("rn", row_number().over(perPurchase.orderBy(col("t_us"), col("t_id"))))
      .withColumn("credit",
        expr("cents div k") +
          when(col("rn") === 1, col("cents") % col("k")).otherwise(lit(0L)))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_credits"), sum(col("credit")).as("cents"))
    val direct = purchases
      .join(pairs.select(col("user_id"), col("p_id")).distinct(),
        Seq("user_id", "p_id"), "left_anti")
      .agg(count(lit(1)).as("n_credits"), sum(col("cents")).as("cents"))
      .select(lit("direct").as("touch_type"), col("n_credits"),
        coalesce(col("cents"), lit(0L)).as("cents"))
      .filter(col("n_credits") > 0)
    credited.unionByName(direct)
  }

  def linearAttributionSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
       |    CAST(round(value * 100) AS BIGINT) AS cents,
       |    CASE WHEN epoch(ts)::BIGINT - lag(epoch(ts)::BIGINT) OVER w > $SessionGapSec THEN 1
       |         WHEN lag(epoch(ts)::BIGINT) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT *, sum(new_session) OVER (
       |    PARTITION BY user_id ORDER BY us, event_id
       |    ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM e),
       |p AS (SELECT user_id, session_idx, event_id AS p_id, us AS p_us, cents
       |      FROM s WHERE event_type = 'purchase'),
       |t AS (SELECT user_id, session_idx, event_id AS t_id, us AS t_us,
       |        event_type AS touch_type
       |      FROM s WHERE event_type <> 'purchase'),
       |pairs AS (
       |  SELECT p.user_id, p.p_id, p.cents, t.t_id, t.t_us, t.touch_type
       |  FROM p JOIN t ON p.user_id = t.user_id AND p.session_idx = t.session_idx
       |  WHERE t.t_us < p.p_us OR (t.t_us = p.p_us AND t.t_id < p.p_id)),
       |credited AS (
       |  SELECT touch_type,
       |    cents // count(*) OVER pp
       |      + CASE WHEN row_number() OVER (
       |          PARTITION BY user_id, p_id ORDER BY t_us, t_id) = 1
       |        THEN cents % count(*) OVER pp ELSE 0 END AS credit
       |  FROM pairs
       |  WINDOW pp AS (PARTITION BY user_id, p_id))
       |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_credits,
       |  CAST(sum(credit) AS BIGINT) AS cents
       |FROM credited GROUP BY touch_type
       |UNION ALL
       |SELECT 'direct' AS touch_type, CAST(count(*) AS BIGINT) AS n_credits,
       |  CAST(coalesce(sum(cents), 0) AS BIGINT) AS cents
       |FROM p WHERE NOT EXISTS (
       |  SELECT 1 FROM pairs pr WHERE pr.user_id = p.user_id AND pr.p_id = p.p_id)
       |HAVING count(*) > 0""".stripMargin

  private val RollMedDepth = 15

  /** Exact rolling median of the last [[RollMedDepth]] purchase values per
    * user — the robust-baseline sibling of [[ewmaPerUser]] (median ignores
    * the one-off spike EWMA chases). Rolling median is HOLISTIC: no
    * incremental state summarizes it, so the honest formulation is an
    * order-statistic over the materialized window — here the rows-window
    * list sorted in-projection, `element_at((n+1) div 2)` (lower median:
    * exact cents, no averaging) — constant 15-element work per row.
    *
    * Scale: ONE per-user keyed window (sort shared with the partitioning
    * exchange), no joins; the oracle re-derives it as a rank-distance
    * self-join + `median`-free quantile pick so both engines produce the
    * identical integer. */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(-(RollMedDepth - 1), 0)
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .withColumn("ws", collect_list(col("cents")).over(w))
      .select(col("user_id"), col("event_id"),
        size(col("ws")).cast("bigint").as("n_window"),
        expr("element_at(array_sort(ws), cast((size(ws) + 1) div 2 as int))").as("med_cents"))
      .withColumn("med", col("med_cents") / 100.0)
  }

  def rollingMedianSql: String =
    s"""WITH p AS (
       |  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents,
       |    row_number() OVER (
       |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
       |  FROM events WHERE event_type = 'purchase'),
       |w AS (
       |  SELECT a.user_id, a.event_id,
       |    CAST(count(*) AS BIGINT) AS n_window,
       |    list_sort(list(b.cents)) AS ws
       |  FROM p a JOIN p b
       |    ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - ${RollMedDepth - 1} AND a.rn
       |  GROUP BY a.user_id, a.event_id)
       |SELECT user_id, event_id, n_window,
       |  CAST(ws[((n_window + 1) // 2)::INT] AS BIGINT) AS med_cents,
       |  CAST(ws[((n_window + 1) // 2)::INT] AS BIGINT) / 100.0e0 AS med
       |FROM w""".stripMargin

  private val EwmaDepth = 16

  /** Per-user EWMA (α = ½) of purchase values — the smoothed-spend signal
    * behind trend/anomaly baselines, truncated at [[EwmaDepth]] terms so
    * the geometric weights are exact powers of two.
    *
    * Exact arithmetic: with the last [[EwmaDepth]] cents values collected
    * oldest→newest in a rows-window, the left fold `a·2 + x` over the
    * REVERSED list yields num = Σ cents_j·2^j (newest highest), and
    * den = 2^L − 1; `ewma_cents = num div den`. The oracle computes the
    * same rational with every weight scaled by 2^(16−L) (a rank-distance
    * self-join — no list lambdas needed in SQL): floor division is
    * invariant under common positive scaling, so both engines emit the
    * identical integer. All inputs are non-negative, so Spark's
    * truncating `div` and DuckDB's flooring `//` agree.
    *
    * Scale shape: ONE per-user keyed window (sort amortized with the
    * partitioning exchange), constant 16-element state per row, no joins
    * — the corpus-sized output is a narrow per-event enrichment exactly
    * like `events_running_totals`. The oracle's O(16·n) self-join
    * formulation is for the referee only. */
  def ewmaPerUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(-(EwmaDepth - 1), 0)
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"),
        round(col("value") * 100).cast("bigint").as("cents"))
      .withColumn("ws", collect_list(col("cents")).over(w))
      .select(col("user_id"), col("event_id"),
        size(col("ws")).cast("bigint").as("n_window"),
        expr("""aggregate(reverse(ws), CAST(0 AS BIGINT), (a, x) -> a * 2 + x)
               |  div (shiftleft(CAST(1 AS BIGINT), size(ws)) - 1)""".stripMargin)
          .as("ewma_cents"))
      .withColumn("ewma", col("ewma_cents") / 100.0)
  }

  def ewmaPerUserSql: String =
    s"""WITH p AS (
       |  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents,
       |    row_number() OVER (
       |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
       |  FROM events WHERE event_type = 'purchase')
       |SELECT a.user_id, a.event_id,
       |  CAST(count(*) AS BIGINT) AS n_window,
       |  CAST(sum(b.cents * (1::BIGINT << (${EwmaDepth - 1} - (a.rn - b.rn)))) //
       |       sum(1::BIGINT << (${EwmaDepth - 1} - (a.rn - b.rn))) AS BIGINT) AS ewma_cents,
       |  CAST(sum(b.cents * (1::BIGINT << (${EwmaDepth - 1} - (a.rn - b.rn)))) //
       |       sum(1::BIGINT << (${EwmaDepth - 1} - (a.rn - b.rn))) AS BIGINT) / 100.0e0 AS ewma
       |FROM p a JOIN p b
       |  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - ${EwmaDepth - 1} AND a.rn
       |GROUP BY a.user_id, a.event_id""".stripMargin

  /** HLL sketch RE-AGGREGATION — the property that makes sketches a data
    * type, not just an aggregate: per-(type, day) Datasketches-HLL user
    * sketches (`hll_sketch_agg`) are stored once, and the per-type total
    * is answered by `hll_union_agg` over the 30-odd daily sketches — the
    * pre-aggregated-cube pattern every metrics warehouse runs on, where
    * re-scanning raw events per question is exactly what doesn't scale.
    * ([[userHll]] covers the one-shot estimate contract; this operator
    * covers the MERGE contract that one-shot use never exercises.)
    *
    * Contract flags (the comparable output — raw estimates are
    * engine-specific, the [[userHll]] policy):
    *   - `union_associative`: unioning the daily sketches directly equals
    *     unioning them via a monthly intermediate rollup — the register
    *     merge is a per-slot MAX (coupon-set union in sparse mode), so
    *     re-aggregation at ANY granularity must give the identical
    *     sketch. This is the property that makes stored sketch cubes
    *     re-rollable; note it is deliberately NOT "union ≡ direct
    *     sketch": Datasketches promotes a union to dense HLL mode while
    *     a small direct sketch stays in exact coupon mode, so those two
    *     estimates legitimately differ (observed at sf0.1, 1500 users).
    *   - `hll_within_10pct`: the merged estimate lands within 10% of the
    *     exact distinct count (5σ at lgK=12's ~1.6% rsd — a FALSE means
    *     broken, not unlucky).
    *
    * Scale shape: daily sketches are one partial-agg shuffle of fixed-size
    * register blocks (vs the per-distinct-key rows countDistinct ships);
    * both union passes run on |types|×|days| sketch rows only. The exact
    * count is audit-only — a deployment stores just the sketches. */
  def hllRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val daily = graft.Caches.persisted(ev
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk")))
    val flat = daily.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("flat_est"))
    val monthly = daily
      .groupBy(col("event_type"), substring(col("day"), 1, 7).as("month"))
      .agg(hll_union_agg(col("sk"), lit(false)).as("msk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("msk"), lit(false))).as("rollup_est"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact_users"))
    flat.join(monthly, "event_type").join(exact, "event_type")
      .select(
        col("event_type"), col("n_exact_users"),
        (col("flat_est") === col("rollup_est")).as("union_associative"),
        (abs(col("flat_est") - col("n_exact_users")).cast("double")
          / col("n_exact_users").cast("double") < 0.10).as("hll_within_10pct"))
  }

  def hllRollupSql: String =
    """SELECT event_type,
      |  count(DISTINCT user_id) AS n_exact_users,
      |  TRUE AS union_associative,
      |  TRUE AS hll_within_10pct
      |FROM events GROUP BY event_type""".stripMargin

  /** Pairwise audience overlap between event types — for every unordered
    * type pair, how many users did BOTH (plus the exact Jaccard in ppm):
    * the segment-overlap matrix behind "do purchasers also view?"
    * audience analytics and behavioral-cohort design.
    *
    * Scale shape: the naive form is a self-join of the (user, type)
    * incidence on user — at 10⁹ users that shuffles the incidence twice
    * and explodes skewed users. Instead: ONE user-keyed collect_set pass
    * (types per user is ≤ |types|, here ≤ 8, so the per-user array is
    * tiny and skew-proof), the C(k,2) pair expansion inside a codegen'd
    * projection (the [[graft.graph.GraphQueries]] item_cf_recs shape),
    * and a |types|²-bounded partial agg. Per-type audience sizes attach
    * by a broadcast join of the |types|-row aggregate. */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(array_sort(collect_set(col("event_type"))).as("ts"))
    val sizes = ut.select(explode(col("ts")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    ut.select(explode(expr(
        """flatten(transform(ts, (a, i) ->
          |  transform(slice(ts, i + 2, size(ts)), b -> struct(a AS a, b AS b))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.a").as("type_a"), col("p.b").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(sizes.select(col("t").as("type_a"), col("n").as("n_a"))), "type_a")
      .join(broadcast(sizes.select(col("t").as("type_b"), col("n").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_both"),
        expr("n_both * 1000000L div (n_a + n_b - n_both)").as("jaccard_ppm"))
  }

  def audienceOverlapSql: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
      |co AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
      |         CAST(count(*) AS BIGINT) AS n_both
      |       FROM ut x JOIN ut y
      |         ON x.user_id = y.user_id AND x.event_type < y.event_type
      |       GROUP BY 1, 2)
      |SELECT type_a, type_b, n_both,
      |  CAST(n_both * 1000000 // (a.n + b.n - n_both) AS BIGINT) AS jaccard_ppm
      |FROM co JOIN sz a ON a.event_type = co.type_a
      |        JOIN sz b ON b.event_type = co.type_b""".stripMargin
  private val JourneyTopK = 20

  /** Behavioral similarity search: the [[JourneyTopK]] users whose event-type
    * journeys are most similar to the REFERENCE user's (highest event count,
    * ties to the smallest user_id), by exact trigram Jaccard over the
    * ordered event-type sequence — the query-centric trajectory-similarity
    * shape (find users who behave like this one), the behavioral twin of
    * `embed_topk`. Journey strings are deterministic: events sort by
    * (ts, event_id) inside a per-user array, never a window over raw rows
    * with ambiguous ties.
    *
    * Why top-k against a reference and not all-pairs: a |types|-letter
    * behavioral alphabet saturates its trigram space (|types|³ shingles),
    * so prefix/banding candidate generation degrades toward all-pairs —
    * the honest scale shape for dense-vocabulary similarity is the
    * query-centric search, which stays LINEAR: one per-user shingle pass
    * against a broadcast 1-row reference set, ending in
    * TakeOrderedAndProject. Jaccard is the int/int quotient (engine-exact);
    * ranking ties break on user_id.
    *
    * Scale shape: one (user)-keyed shuffle builds the journey arrays (the
    * events_sessions exchange); the shingle set computes narrowly per
    * user; the reference row broadcasts; top-k never sorts globally. */
  def userJourneyTopk(spark: SparkSession, dir: String): DataFrame = {
    val journeys = Tables.events(spark, dir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), col("event_type")).as("e"))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .select(col("user_id"),
        size(col("es")).cast("bigint").as("n_events"),
        expr("shingle_set(array_join(transform(es, x -> x.event_type), ' '))").as("s"))
      .filter(size(col("s")) > 0)
      .transform(graft.Caches.persisted) // consumed by the ref pick and the scan
    val ref = journeys
      .orderBy(col("n_events").desc, col("user_id").asc).limit(1)
      .select(col("user_id").as("ref_user"), col("s").as("rs"))
    journeys
      .crossJoin(broadcast(ref))
      .filter(col("user_id") =!= col("ref_user"))
      .select(col("user_id"),
        size(array_intersect(col("s"), col("rs"))).cast("bigint").as("n_common"),
        size(array_union(col("s"), col("rs"))).cast("bigint").as("n_union"))
      .withColumn("jaccard", col("n_common") / col("n_union"))
      .orderBy(col("jaccard").desc, col("user_id").asc)
      .limit(JourneyTopK)
  }

  def userJourneyTopkSql: String =
    s"""WITH j AS (
       |  SELECT user_id, string_agg(event_type, ' ' ORDER BY ts, event_id) AS t,
       |    CAST(count(*) AS BIGINT) AS n_events
       |  FROM events GROUP BY 1),
       |sh AS (
       |  SELECT user_id, n_events,
       |    list_distinct(list_transform(range(1, len(tk) - 1),
       |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
       |  FROM (SELECT user_id, n_events,
       |          list_filter(regexp_split_to_array(t, '[^\\p{L}]+'), x -> x <> '') AS tk
       |        FROM j) q
       |  WHERE len(tk) >= 3),
       |ref AS (SELECT user_id AS ref_user, s AS rs FROM sh
       |        ORDER BY n_events DESC, user_id ASC LIMIT 1)
       |SELECT user_id, n_common, n_union, n_common / n_union AS jaccard
       |FROM (
       |  SELECT sh.user_id,
       |    CAST(len(list_intersect(s, rs)) AS BIGINT) AS n_common,
       |    CAST(len(list_distinct(s || rs)) AS BIGINT) AS n_union
       |  FROM sh, ref WHERE sh.user_id <> ref_user) x
       |ORDER BY jaccard DESC, user_id ASC LIMIT $JourneyTopK""".stripMargin
}
