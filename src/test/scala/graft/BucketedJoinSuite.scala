package graft

import org.apache.spark.sql.functions._

import graft.sources.BucketedTables

/** Plan-gates the bucketed storage layout: a join of two tables bucketed on
  * the join key must consume both scans in place — zero Exchange in the
  * join subtree — and still produce exactly the unbucketed join's rows. */
class BucketedJoinSuite extends SparkSpec {

  test("bucketed lineitem⋈orders joins with zero exchange (co-located scans)") {
    val joined = BucketedTables.colocatedJoinFrame(spark, Sf0001)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"expected a co-located shuffle-family join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join still exchanges — co-location lost:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"scan does not report bucketed reading:\n$plan")
  }

  test("bucketed scan selects only the probed bucket for a point lookup") {
    // bucket pruning: an equality predicate on the bucket column must scan
    // 1 of NumBuckets buckets, not the whole table. autoBucketedScan turns
    // the bucketed layout OFF for filter-only queries (no join/agg needs
    // the distribution), which also forfeits pruning — disable it here the
    // way a point-lookup-serving session would.
    val (lt, _) = BucketedTables.ensure(spark, Sf0001)
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val probe = spark.table(lt).filter(col("l_orderkey") === 32L)
      val scan = probe.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(scan)
      assert(m.nonEmpty, s"no bucket-pruning report in scan:\n$scan")
      assert(m.get.group(1).toInt == 1 && m.get.group(2).toInt == BucketedTables.NumBuckets,
        s"expected 1 of ${BucketedTables.NumBuckets} buckets, got ${m.get.group(0)}")
    } finally spark.conf.set(key, old)
  }

  test("co-located join result equals the unbucketed join exactly") {
    val bucketed = BucketedTables.colocatedJoinFrame(spark, Sf0001)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"))
      .collect().map(_.toSeq).toSet
    val plain = Tables.lineitem(spark, Sf0001)
      .join(Tables.orders(spark, Sf0001), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"))
      .collect().map(_.toSeq).toSet
    assert(bucketed == plain)
    assert(bucketed.nonEmpty)
  }

  test("registered query: only the final tiny agg exchanges, never the join") {
    val q = BucketedTables.orderPriorityRevenue(spark, Sf0001)
    // simple tree mode: each Exchange node prints exactly once
    val tree = q.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(tree).size
    assert(exchanges == 1, s"expected exactly 1 exchange (the agg), got $exchanges:\n$tree")
    assert(tree.indexOf("Exchange") < tree.indexOf("Join"),
      s"the one exchange must sit above the join, not below it:\n$tree")
  }
}
