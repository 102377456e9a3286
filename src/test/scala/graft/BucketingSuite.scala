package graft

import org.apache.spark.sql.functions._

/** Bucketed tables — the co-located-join layout for repeated fact⋈fact
  * joins at scale: writing both sides bucketed (and sorted) by the join key
  * lets the join read bucket i against bucket i with NO Exchange on either
  * side. This is the storage-level answer to "is there a shuffle here that
  * becomes the bottleneck at 100 TB" for recurring join keys.
  */
class BucketingSuite extends SparkSpec {

  test("bucketed-by-key tables join with no shuffle on either side") {
    import spark.implicits._
    val warehouse = java.nio.file.Files.createTempDirectory("graft-buckets")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      Tables.lineitem(spark, Sf0001)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite")
        .option("path", s"$warehouse/li_b")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_b")
      Tables.orders(spark, Sf0001)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite")
        .option("path", s"$warehouse/ord_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_b")

      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a keyed join over co-located buckets:\n$plan")

      // same result as the plain (shuffling) join
      val expected = Tables.lineitem(spark, Sf0001)
        .join(Tables.orders(spark, Sf0001), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("groupBy on the bucket key aggregates without an Exchange") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft-buckets2")
    try {
      Tables.orders(spark, Sf0001)
        .select(col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite")
        .option("path", s"$warehouse/ord_c")
        .bucketBy(8, "o_custkey")
        .saveAsTable("ord_c")
      val agg = spark.table("ord_c").groupBy(col("o_custkey")).count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation must be shuffle-free:\n$plan")
      assert(agg.count() ==
        Tables.orders(spark, Sf0001).select(col("o_custkey")).distinct().count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS ord_c")
    }
  }
}
