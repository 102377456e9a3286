package graft

import org.apache.spark.sql.functions._

/** The skew escape hatches SCALING.md names: two-phase salting is proven on
  * the Zipfian word count (GoldenParitySuite / wc_salted); this suite proves
  * the OTHER hatch — AQE's runtime skew-join splitting — actually engages on
  * a pathologically skewed join, with thresholds scaled down to test size
  * the way a 100 TB deployment scales them up. */
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
}
