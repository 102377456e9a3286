package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.SparkEntry
import graft.plans.GraftSession

/** Dev probe: run one registered query once (after warmup) and print every
  * completed stage: task count, Σrun, Σcpu, bytes. Not driver contract. */
object StageDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: StageDump <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    fn(spark, sfDir).count(); graft.Caches.drain() // warmup
    @volatile var rows = Vector.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        rows = rows :+ f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%4d run=${m.executorRunTime}%6dms cpu=${m.executorCpuTime / 1000000}%6dms in=${m.inputMetrics.bytesRead}%9d sr=${m.shuffleReadMetrics.totalBytesRead}%9d sw=${m.shuffleWriteMetrics.bytesWritten}%9d ${i.name.takeWhile(_ != '(').trim}%s"
      }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val w = (System.nanoTime() - t0) / 1e9
    graft.Caches.drain()
    Thread.sleep(500)
    rows.foreach(println)
    println(f"[stagedump] $name wall=$w%.2f s stages=${rows.size} tasks=${rows.map(_.split("tasks=")(1).trim.split("\\s")(0).toInt).sum}")
    spark.stop()
  }
}
