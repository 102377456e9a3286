package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.events.EventQueries
import graft.plans.{AsofJoinExec, AsofJoinOps}

/** The native as-of join physical operator: plan shape, equivalence to the
  * independent window formulation, and partitioning invariance. */
class AsofJoinSuite extends SparkSpec {

  private def result(dir: String) =
    EventQueries.asofPurchaseNative(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

  test("native as-of equals the union-window composition on driver data") {
    val native = result(Sf0001)
    val window = EventQueries.asofPurchase(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(native == window)
    assert(native.nonEmpty)
    assert(native.exists(_._3 >= 0)) // some clicks do have a prior purchase
    assert(native.exists(_._3 == -1L)) // and some don't — null path exercised
  }

  test("plan uses AsofJoinExec with both sides clustered and sorted") {
    val df = EventQueries.asofPurchaseNative(spark, Sf0001)
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE wraps materialized stages in leaf QueryStageExec nodes; descend
    def deep(p: org.apache.spark.sql.execution.SparkPlan): Seq[AsofJoinExec] =
      p.collect { case e: AsofJoinExec => Seq(e) }.flatten ++
        p.collect {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => deep(q.plan)
        }.flatten
    val asof = deep(plan)
    assert(asof.size == 1, s"expected one AsofJoinExec in:\n$plan")
    // EnsureRequirements must have satisfied the operator's contract:
    // children arrive key-clustered and (key, time, seq)-sorted
    asof.head.children.zip(asof.head.requiredChildOrdering).foreach {
      case (child, expected) =>
        assert(child.outputOrdering.map(_.child.toString.takeWhile(_ != '#')) ==
          expected.map(_.child.toString.takeWhile(_ != '#')))
    }
  }

  test("result is invariant under the shuffle partition count") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val p1 = result(Sf0001)
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val p7 = result(Sf0001)
      assert(p1 == p7)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("as-of picks the latest strictly-earlier right row, ties broken by seq") {
    import spark.implicits._
    val clicks = Seq((1L, 100L, 10L), (1L, 100L, 11L), (2L, 50L, 20L))
      .toDF("user_id", "ms", "event_id")
    val purchases = Seq((1L, 100L, 9L), (1L, 90L, 5L), (1L, 100L, 12L), (3L, 10L, 1L))
      .toDF("p_user", "p_ms", "prev_purchase_id")
    val out = AsofJoinOps.asof(spark, clicks, "user_id", "ms", "event_id",
        purchases, "p_user", "p_ms", "prev_purchase_id")
      .select($"event_id", $"prev_purchase_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // click (100, 10): purchase (100, 9) is before it (same ms, lower seq);
    // (100, 12) is not. click (100, 11) also matches (100, 9) — not 12.
    assert(out == Map(10L -> 9L, 11L -> 9L, 20L -> -1L))
  }
}
