package graft.tools

import graft.SparkEntry
import graft.plans.GraftSession

/** Dev profiling harness: time a comma-separated LIST of registered
  * queries, N reps each (interleaved round-robin like Bench), in one JVM —
  * amortizes the sbt/JVM/codegen startup that makes per-query TimeOne runs
  * expensive when iterating on many queries at once.
  * `runMain graft.tools.TimeMany <q1,q2,...> [sfDir] [reps]`.
  * Not part of the driver contract. */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .getOrElse(sys.error("usage: TimeMany <q1,q2,...> [sfDir] [reps]"))
      .split(',').toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val fns = names.map(n =>
      n -> SparkEntry.queries.getOrElse(n, sys.error(s"unknown query: $n")))
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev A/B knob: SPARK_GRAFT_CONF="k=v;k=v" applied to the session
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    // warmup: one run of each so janino/JIT and session memos are out of rep 1
    fns.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case e: Throwable => System.err.println(e.getMessage) }
      finally graft.Caches.drain()
    }
    val walls = collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    for (r <- 1 to reps; (name, fn) <- fns) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      graft.Caches.drain()
      val w = (System.nanoTime() - t0) / 1e9
      walls(name) = walls(name) :+ w
      System.err.println(f"[timemany] rep$r $name: $w%.2f s ($n rows)")
    }
    names.foreach { n =>
      val ws = walls(n)
      println(f"[timemany] $n min=${ws.min}%.3f med=${ws.sorted.apply(ws.size / 2)}%.3f reps=${ws.map(w => f"$w%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
