package graft
import java.nio.file.{Files, Paths}

import graft.plans.GraftSession

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_MANAGED=1: run the WHOLE registry in managed-catalog CBO
    // mode (ANALYZEd tables + cost-based optimizer + join-reorder, the
    // gates standing down via Plans.statsTrusted) — the correctness half
    // of the CBO posture: the dump this produces must oracle-match
    // registry-wide, not just on CboBench's multi-join probe subset.
    if (sys.env.get("SPARK_GRAFT_MANAGED").contains("1")) {
      Tables.materializeCatalog(spark, sfDir, "graft_verify")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      System.err.println("[verify] managed-catalog CBO mode ON (graft_verify)")
    }
    new java.io.File(outDir).mkdirs()
    // Capture every failure as data, not just a log line: a query that
    // throws at analysis time produces no parquet dir, and a dump-dir-driven
    // compare would silently OMIT it (round 8's 18-query outage looked like
    // a clean 92-green artifact). errors.json keeps the invariant
    // |dumped| + |errors| == |SparkEntry.queries| auditable.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.toString).linesIterator.next()
        errors(name) = msg
        System.err.println(s"[verify] $name failed: $msg")
      }
      finally Caches.drain()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    System.err.println(
      s"[verify-summary] ${SparkEntry.queries.size - errors.size}/${SparkEntry.queries.size} dumped, ${errors.size} failed")
    if (sys.env.get("SPARK_GRAFT_MANAGED").contains("1"))
      spark.sql("DROP DATABASE IF EXISTS graft_verify CASCADE")
    spark.stop()
  }
}
