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
    // JVM/codegen warmup outside the timed region, like any JVM benchmark:
    // run every query once at sf0.001 so janino compilation and JIT of each
    // plan shape happen before timing starts — otherwise whichever query
    // runs first alphabetically absorbs the session's whole cold-start cost
    // (r3: corpus_pipeline at position 2 measured 28 s of which ~20 s was
    // first-touch codegen for the dedup machinery). The measured numbers
    // then reflect data-proportional work, which is what a 100 TB projection
    // scales from. Guarded: a broken warmup dir must still produce the JSON
    // result line.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, warmDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] warmup $name failed: ${e.getMessage}") }
      finally Caches.drain()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
        finally Caches.drain()
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
