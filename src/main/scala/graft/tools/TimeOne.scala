package graft.tools

import graft.SparkEntry
import graft.plans.GraftSession

/** Dev profiling harness: time one registered query N times against a
  * given sf dir. `runMain graft.tools.TimeOne <query> [sfDir] [reps]`.
  * Not part of the driver contract — a local feedback loop for chasing
  * wall-time anomalies without paying a full Bench run. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: TimeOne <query> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup on a cheap query so JVM/codegen startup isn't in rep 1
    SparkEntry.queries.get("q1_pricing").foreach(f => f(spark, sfDir).count())
    graft.Caches.drain()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      graft.Caches.drain()
      println(f"[timeone] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
