package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Round-15 optimization contracts: the unsplittable-input fan-out
  * ([[Plans.fanOut]]) and the small-graph single-partition iteration gates
  * must change PLANS only, never rows.
  *
  *  - fan-out fires exactly when the source yields fewer splits than
  *    cores, repartitions by the given key, and is disabled by
  *    `spark.graft.fanout.enabled=false` — with BOTH settings returning the
  *    identical result multiset for a representative heavy query;
  *  - a frame that already has ≥ cores partitions passes through untouched
  *    (the deployment-scale no-op the design note promises);
  *  - er_golden_records / doc_pagerank return identical rows with the
  *    collapse gate forced OFF (broadcastRowLimit = 0 ⇒ full-width rounds),
  *    pinning that the 1-partition iterate is a pure plan choice. */
class FanOutSuite extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  test("fanOut spreads a 1-split scan to defaultParallelism, keyed, and honors the kill switch") {
    val docs = Tables.documents(spark, Sf0001).select(col("doc_id"), col("text"))
    assert(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism,
      "fixture assumption: the test scan must be unsplittable (single row group)")
    val spread = Plans.fanOut(docs, col("doc_id"))
    assert(spread.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // FormattedMode prints the node header ("Exchange (2)") and its
    // arguments ("Arguments: hashpartitioning(doc_id…, REPARTITION_BY_NUM…)")
    // on separate lines — assert the pieces, not a simple-mode substring.
    val p = spread.queryExecution.explainString(FormattedMode)
    assert(p.contains("hashpartitioning(doc_id") && p.contains("REPARTITION_BY_NUM"),
      s"fan-out must hash-partition on the caller's key (deterministic under retry):\n$p")
    spark.conf.set(Plans.FanOutKey, "false")
    try assert(Plans.fanOut(docs, col("doc_id")).rdd.getNumPartitions ==
      docs.rdd.getNumPartitions, "kill switch must return the input unchanged")
    finally spark.conf.unset(Plans.FanOutKey)
  }

  test("fanOut is a no-op on a frame that already has >= cores partitions") {
    val wide = Tables.documents(spark, Sf0001).select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    val out = Plans.fanOut(wide, col("doc_id"))
    assert(out.queryExecution.logical eq wide.queryExecution.logical,
      "an already-parallel frame must pass through without a new Repartition node")
  }

  test("fan-out changes plans only: identical rows with the fan-out disabled") {
    // dedup_near exercises the deepest fanned pipeline (signatures, banding,
    // candidate expansion, exact verification)
    val on = rows(graft.dedup.DedupQueries.dedupNear(spark, Sf0001))
    Caches.drain()
    spark.conf.set(Plans.FanOutKey, "false")
    try {
      val off = rows(graft.dedup.DedupQueries.dedupNear(spark, Sf0001))
      assert(on == off, "fan-out must not change dedup_near's verified pairs")
    } finally { spark.conf.unset(Plans.FanOutKey); Caches.drain() }
  }

  test("small-graph collapse gates change plans only: identical rows at full width") {
    val er = rows(graft.dedup.DedupQueries.erGoldenRecords(spark, Sf0001))
    val pr = rows(graft.dedup.DedupQueries.docPagerank(spark, Sf0001))
    Caches.drain()
    spark.conf.set(Plans.BroadcastRowLimitKey, "0") // forces collapse = false
    try {
      assert(rows(graft.dedup.DedupQueries.erGoldenRecords(spark, Sf0001)) == er,
        "er_golden_records: full-width label rounds diverge from the collapsed iterate")
      assert(rows(graft.dedup.DedupQueries.docPagerank(spark, Sf0001)) == pr,
        "doc_pagerank: full-width rounds diverge from the collapsed iterate")
    } finally { spark.conf.unset(Plans.BroadcastRowLimitKey); Caches.drain() }
  }
}
