package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.apps.ReferenceApps
import graft.core.MapReduceJob

/** SURVEY.md §5.2.1 — differential testing against the sequential oracle,
  * the reference's own methodology (`/root/reference/src/main/test-mr.sh`):
  * the distributed engine's merged sorted output must equal a
  * single-threaded reimplementation of mrsequential semantics over the same
  * bytes, and the facade and DataFrame formulations must agree with each
  * other. Runs on the reference's own 8-file Project Gutenberg corpus. */
class GoldenParitySuite extends SparkSpec {

  private lazy val pgFiles: Seq[Path] =
    Files.list(Paths.get("/root/reference/src/main")).iterator().asScala
      .filter(_.getFileName.toString.matches("pg-.*\\.txt")).toSeq.sortBy(_.toString)

  private lazy val corpus: Seq[(String, String)] =
    pgFiles.map(p => p.getFileName.toString -> new String(Files.readAllBytes(p), StandardCharsets.UTF_8))

  /** mrsequential semantics in plain Scala (the oracle). */
  private def sequentialRun(
      mapf: (String, String) => IterableOnce[(String, String)],
      reducef: (String, Seq[String]) => String): Seq[String] =
    corpus.flatMap { case (f, c) => mapf(f, c) }
      .groupBy(_._1).toSeq
      .map { case (k, kvs) => s"$k ${reducef(k, kvs.map(_._2))}" }
      .sorted

  test("corpus is the reference's: 8 files, 3,301,104 bytes") {
    assert(pgFiles.size == 8)
    assert(corpus.map(_._2.getBytes(StandardCharsets.UTF_8).length).sum == 3301104)
  }

  test("wc: facade output equals the sequential oracle (golden parity)") {
    val got = MapReduceJob.mergedLines(ReferenceApps.wcJob.run(spark, PgGlob))
    val want = sequentialRun(
      (_, c) => ReferenceApps.tokenize(c).map(w => (w, "1")),
      (_, vs) => vs.length.toString)
    assert(got.size == want.size)
    assert(got == want)
    // the measured corpus stats from SURVEY.md §5.2.1
    assert(got.size == 22107)
    assert(got.map(_.split(" ")(1).toLong).sum == 623948L)
  }

  test("wc: DataFrame-native formulation is line-identical to the facade") {
    import spark.implicits._
    val df = ReferenceApps.wcDataFrame(spark, PgGlob)
      .select($"word", $"value").as[(String, String)]
    assert(MapReduceJob.mergedLines(df) == MapReduceJob.mergedLines(ReferenceApps.wcJob.run(spark, PgGlob)))
  }

  test("wc: commutative lowering (runAggregated) matches the holistic facade") {
    import org.apache.spark.sql.functions.{count, lit}
    import spark.implicits._
    val lowered = MapReduceJob.runAggregated(
        spark, PgGlob, (_, c) => ReferenceApps.tokenize(c).map(w => (w, "1")), count(lit(1)))
      .as[(String, String)]
    assert(MapReduceJob.mergedLines(lowered) ==
      MapReduceJob.mergedLines(ReferenceApps.wcJob.run(spark, PgGlob)))
  }

  test("indexer: facade output equals the sequential oracle") {
    val got = MapReduceJob.mergedLines(ReferenceApps.indexerJob.run(spark, PgGlob))
    val want = sequentialRun(
      (f, c) => ReferenceApps.tokenize(c).distinct.map(w => (w, f)),
      (_, docs) => s"${docs.length} ${docs.sorted.mkString(",")}")
    assert(got == want)
  }

  test("indexer: DataFrame-native formulation is line-identical to the facade") {
    import spark.implicits._
    val df = ReferenceApps.indexerDataFrame(spark, PgGlob)
      .select($"word", $"value").as[(String, String)]
    assert(MapReduceJob.mergedLines(df) == MapReduceJob.mergedLines(ReferenceApps.indexerJob.run(spark, PgGlob)))
  }

  test("file_stats (A3/A4 shape): facade equals the sequential oracle") {
    val got = MapReduceJob.mergedLines(ReferenceApps.fileStatsJob.run(spark, PgGlob))
    val want = sequentialRun(
      (f, c) => Seq(("a", f), ("b", f.length.toString), ("c", c.length.toString), ("d", "xyzzy")),
      (_, vs) => vs.sorted.mkString(" "))
    assert(got == want)
  }

  test("per-file count (A8 shape): one '<file> 1' line per input file") {
    val got = MapReduceJob.mergedLines(ReferenceApps.perFileCountJob.run(spark, PgGlob))
    assert(got == pgFiles.map(p => s"${p.getFileName} 1").sorted)
  }

  test("text sink writes the reference's 'key value' line format (F8)") {
    val out = Files.createTempDirectory("graft-sink").toString
    ReferenceApps.perFileCountJob.runToText(spark, PgGlob, out)
    val lines = spark.read.text(out).collect().map(_.getString(0)).sorted.toSeq
    assert(lines == pgFiles.map(p => s"${p.getFileName} 1").sorted)
  }
}
