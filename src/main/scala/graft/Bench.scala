package graft

import graft.plans.GraftSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  * Failed queries report -1 (and are excluded from the total) so an error
  * is never mistaken for a fast run. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed region, like any JVM benchmark.
    // Guarded: a broken sf dir must still produce the JSON result line.
    try SparkEntry.queries.get("q1_pricing").foreach(f => f(spark, sfDir).count())
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val nFailed = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
