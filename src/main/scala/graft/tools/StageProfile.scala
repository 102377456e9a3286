package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.SparkEntry
import graft.plans.GraftSession

/** Dev profiling harness for wall-time drift adjudication: run one
  * registered query N reps and print, per rep, the task-metric aggregates
  * that separate "the plan got slower" from "the box got busy":
  *
  *   - `run`  — Σ executorRunTime (ms): work the tasks actually did.
  *     Flat across reps while wall swings ⇒ the plan is identical and the
  *     delta is outside the tasks (scheduling / CPU contention).
  *   - `cpu`  — Σ executorCpuTime (s): on-CPU time. run ≫ cpu ⇒ tasks
  *     were runnable-but-descheduled (external contention) or blocked.
  *   - `gc`   — Σ jvmGCTime (ms) + the driver JVM's collector-bean delta
  *     (local mode: same JVM, so this is the whole GC story).
  *   - `fetch` — Σ shuffleRead.fetchWaitTime (ms): shuffle file/disk
  *     contention shows up here, nowhere else.
  *   - `sched` — wall·cores − run (core-ms the query did NOT use):
  *     scheduler delay + under-parallelism + external theft.
  *
  * `runMain graft.tools.StageProfile <query> [sfDir] [reps]`. Not part of
  * the driver contract. */
object StageProfile {

  private class Acc {
    val run = new LongAdder; val cpu = new LongAdder; val gc = new LongAdder
    val fetch = new LongAdder; val tasks = new LongAdder
  }

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: StageProfile <query> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var acc = new Acc
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          acc.run.add(m.executorRunTime)
          acc.cpu.add(m.executorCpuTime)
          acc.gc.add(m.jvmGCTime)
          acc.fetch.add(m.shuffleReadMetrics.fetchWaitTime)
          acc.tasks.add(1)
        }
      }
    })
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs(): Long = { var s = 0L; gcBeans.forEach(b => s += b.getCollectionTime); s }
    // warmup so rep 1 doesn't carry codegen/JIT
    fn(spark, sfDir).count(); graft.Caches.drain()
    println(f"[stageprofile] $name x$reps on $sfDir (local[$cpus])")
    println("[stageprofile] rep  wall_s  tasks     run_ms    cpu_s   gc_ms  drvgc_ms fetch_ms sched_core_ms")
    (1 to reps).foreach { i =>
      acc = new Acc
      val g0 = gcMs()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.Caches.drain()
      Thread.sleep(500) // let the listener bus drain this rep's task-end events
      val sched = (wall * 1000 * cpus.toInt - acc.run.sum).toLong
      println(f"[stageprofile] $i%3d  ${wall}%6.2f ${acc.tasks.sum}%6d ${acc.run.sum}%10d ${acc.cpu.sum / 1e9}%8.2f ${acc.gc.sum}%7d ${gcMs() - g0}%9d ${acc.fetch.sum}%8d ${sched}%13d")
    }
    spark.stop()
  }
}
