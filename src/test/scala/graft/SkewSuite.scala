package graft

import org.apache.spark.sql.functions._

/** The skew escape hatches SCALING.md names, each proven executable:
  * two-phase AGGREGATION salting on the Zipfian word count
  * (GoldenParitySuite / wc_salted); AQE's runtime skew-JOIN splitting,
  * engaged here on a pathologically skewed join with thresholds scaled
  * down to test size the way a 100 TB deployment scales them up; and
  * explicit JOIN salting (lineitem_salted_join — the cure
  * lineitem_skew_report's diagnosis calls for), whose balanced-reducer
  * property is measured below against its unsalted twin. */
class SkewSuite extends SparkSpec {

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffled join
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows, 99% on one key: the classic hot-key fact side
      val fact = spark.range(200000)
        .select(when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val dim = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("attr"))
      val joined = fact.join(dim, "k")
      // materialize THIS DataFrame's own query execution — collect() drives
      // the AdaptiveSparkPlanExec attached to joined.queryExecution to its
      // final plan (count()/foreach() would plan separate executions)
      val n = joined.collect().length
      assert(n == 200000 * 99 / 100 + fact.filter(col("k") =!= 7 && col("k") < 1000).count())
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salted join balances the hot key's reducers (lineitem_salted_join's base frame)") {
    import graft.relational.RelationalQueries
    // test data is tiny, so AQE would coalesce every post-shuffle partition
    // into one and blind the measurement; at production scale partitions
    // are advisory-sized and the per-reducer shares below are the real ones
    // 32 reducers (not the suite session's 4): salting targets the
    // many-reducer regime — with reducers ≤ a handful, ANY partitioning
    // is "balanced" and the property is unmeasurable
    val confs = Seq(
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "32")
    val savedConfs = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
    // per-reducer row counts right after the join: spark_partition_id()
    // captured BEFORE any further exchange reflects the join's own
    // partitioning — (k, salt) for the salted plan, k for the plain one
    def shares(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(spark_partition_id().as("pid"))
        .groupBy(col("pid")).count()
        .collect().map(_.getLong(1)).toSeq
    val salted = shares(RelationalQueries.saltedJoinBase(spark, "/root/testdata/sf0.01"))
    val total = salted.sum
    val saltedMaxShare = salted.max.toDouble / total
    // the unsalted twin: same skewed key, same shuffle_hash dim join,
    // no salt — the hot key (≈50% of rows) lands on ONE reducer
    val fact = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(when(col("l_partkey") % 10 < 5, 0L).otherwise(col("l_partkey")).as("k"))
    val dim = Tables.part(spark, "/root/testdata/sf0.01")
      .select(when(col("p_partkey") % 10 < 5, 0L).otherwise(col("p_partkey")).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_parts"))
    val plain = shares(fact.join(dim.hint("shuffle_hash"), Seq("k")))
    val plainMaxShare = plain.max.toDouble / plain.sum
    assert(plain.sum == total, "salting changed the join cardinality")
    assert(plainMaxShare > 0.4,
      f"unsalted hot partition only carries $plainMaxShare%.2f of rows — skew fixture lost its point")
    // the hot key spreads across SaltBuckets=64 salt combos hashed into 32
    // reducers: worst reducer carries a few combos (~0.8% each) plus the
    // uniform remainder; 0.10 leaves headroom for balls-into-bins variance
    assert(saltedMaxShare < 0.10,
      f"salted max partition share $saltedMaxShare%.3f — salting failed to balance " +
        f"(unsalted: $plainMaxShare%.3f)")
    } finally savedConfs.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("spark.graft.maxBasketSize bounds the per-customer pair expansion (DIMSUM-style cap)") {
    import graft.graph.GraphQueries
    // sf0.001 orders/lineitem plus ONE synthetic power-law customer whose
    // basket holds 500 distinct parts: uncapped that single customer
    // expands to C(500,2) = 124,750 pairs inside one task — the exact
    // single-task blow-up the cap exists to bound.
    val out = java.nio.file.Files.createTempDirectory("graft-basketcap").toString
    val bigCust = 999999L
    val bigOrder = 900000000L
    val orderRow = Tables.orders(spark, Sf0001).limit(1)
      .withColumn("o_orderkey", lit(bigOrder))
      .withColumn("o_custkey", lit(bigCust))
    Tables.orders(spark, Sf0001).unionByName(orderRow)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    val lineRows = Tables.lineitem(spark, Sf0001).limit(1)
      .crossJoin(spark.range(1, 501).select(col("id").as("pk")))
      .withColumn("l_orderkey", lit(bigOrder))
      .withColumn("l_partkey", col("pk")).drop("pk")
    Tables.lineitem(spark, Sf0001).unionByName(lineRows)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    def maxBasket(): Int = GraphQueries.cappedCustBaskets(spark, out)
      .agg(max(size(col("ps")))).head().getInt(0)
    try {
      // default path: conf unset ⇒ the capped accessor IS the raw basket
      // table (no slice in the plan), and the power-law basket is intact
      assert(maxBasket() == 500, "uncapped basket should hold all 500 parts")
      // cap above the max basket size: a no-op — identical baskets
      spark.conf.set("spark.graft.maxBasketSize", "10000")
      assert(maxBasket() == 500, "cap above max basket must be a no-op")
      // binding cap: every basket (hence every pair-expansion task) is
      // bounded at C(40,2) = 780 pairs instead of 124,750
      spark.conf.set("spark.graft.maxBasketSize", "40")
      assert(maxBasket() == 40, "cap must truncate the power-law basket")
      // the capped query still runs end-to-end and only loses pairs that
      // involve the truncated tail: recs among low part ids survive
      val recs = GraphQueries.itemCfRecs(spark, out)
      assert(recs.count() > 0)
      // determinism: truncation is by sorted part id, so two runs agree
      val again = GraphQueries.itemCfRecs(spark, out)
      assert(recs.exceptAll(again).isEmpty && again.exceptAll(recs).isEmpty,
        "capped results must be deterministic")
    } finally spark.conf.unset("spark.graft.maxBasketSize")
  }
}
