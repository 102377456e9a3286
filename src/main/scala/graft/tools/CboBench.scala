package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Caches, SparkEntry, Tables}
import graft.plans.GraftSession

/** Bench variant that runs the REGISTERED multi-join queries in
  * managed-catalog CBO mode and diffs plans + results against the
  * raw-parquet mode the driver benches.
  *
  * Raw mode plans stats-blind over parquet paths: join sizing comes from
  * file footers and the library's explicit size gates, and join ORDER is
  * syntactic (every hint excludes its join from `CostBasedJoinReorder`).
  * Managed mode ([[Tables.materializeCatalog]]) gives Catalyst ANALYZE
  * row counts + column stats, the gates stand down
  * ([[graft.Plans.statsTrusted]]), and the CBO both sizes joins from
  * evidence and is free to reorder the q5/q9-class dimension chains —
  * the posture a 100 TB warehouse deployment would run. This tool proves
  * the mode on the real registry: per query it prints both walls, both
  * join-leaf orders, whether the order changed, and a fingerprint
  * equality check (the reorder must be invisible in the bytes) — and
  * writes the whole record as one JSON artifact (BENCH_CBO.json by
  * default) so the benched posture is a committed number, not a log line.
  *
  * `runMain graft.tools.CboBench [sfDir] [queries] [artifactPath]`
  */
object CboBench {

  /** Probe selection is evidence-based, not a hand list: the candidate
    * pool is the relational + events registry families (the catalog-table
    * consumers — the memoizing dedup/graph/similarity families build
    * session artifacts whose walls don't re-plan per mode), and a
    * candidate graduates to probe when its RAW optimized plan carries
    * ≥ 2 Join operators (≥ 3 join participants) — the shapes
    * `CostBasedJoinReorder` can legitimately re-sequence. Counting JOIN
    * nodes, not scan leaves: a 3-way UNION also has 3 leaves but nothing
    * to reorder, and admitting it would pad the artifact's totals with
    * structurally non-reorderable rows. New registry queries that follow
    * the family naming are picked up automatically. */
  private val CandidatePool = java.util.regex.Pattern.compile(
    "^(q\\d+_.*|orders_.*|lineitem_.*|customer.*|nation_.*|region_.*|part_.*|" +
      "brand_.*|supplier_.*|top_customers|union_order_status|distinct_segments|" +
      "median_price|price_.*|shipping_lag|pricing_incremental|table_digest|" +
      "fk_orphan_audit|events_.*|user_journey_.*)$")

  private val TableNames = Seq("lineitem", "orders", "customer", "supplier",
    "part", "nation", "region", "events", "documents", "embeddings")

  // identify a leaf relation by its column-name prefix — works identically
  // for path relations (whose toString omits the file path) and catalog
  // tables, since both expose the same schema
  private val PrefixTable = Seq(
    "l_" -> "lineitem", "o_" -> "orders", "c_" -> "customer",
    "s_" -> "supplier", "p_" -> "part", "n_" -> "nation", "r_" -> "region",
    "doc_" -> "documents", "vec_" -> "embeddings", "event_" -> "events")

  private def leafOrder(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.output.headOption.map(_.name).getOrElse(""))
      .map(c => PrefixTable.collectFirst {
        case (p, t) if c.startsWith(p) => t
      }.getOrElse("?"))

  private def joinCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.size

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val artifact = args.lift(2).getOrElse("BENCH_CBO.json")
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probes = args.lift(1)
      .map(_.split(',').toSeq.map(_.trim).filter(SparkEntry.queries.contains))
      .filter(_.nonEmpty)
      .getOrElse {
        SparkEntry.queries.keys.toSeq.sorted
          .filter(n => CandidatePool.matcher(n).matches())
          .filter { n =>
            try joinCount(SparkEntry.queries(n)(spark, sfDir)) >= 2
            catch { case e: Throwable =>
              System.err.println(s"[cbobench] skip $n (plan failed: ${e.getMessage})"); false
            }
          }
      }
    System.err.println(s"[cbobench] ${probes.size} multi-join probes: ${probes.mkString(", ")}")
    // raw-mode pass first (the confs route loaders per-dir, so order matters)
    val raw = probes.map { name =>
      val fn = SparkEntry.queries(name)
      val order = leafOrder(fn(spark, sfDir))
      val t0 = System.nanoTime()
      val fp = RowFingerprint(fn(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      Caches.drain()
      (name, order, fp, sec)
    }
    Tables.materializeCatalog(spark, sfDir, "graft_bench")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    var mismatches = 0
    var reordered = 0
    val records = raw.map { case (name, rawOrder, rawFp, rawSec) =>
      val fn = SparkEntry.queries(name)
      val cboOrder = leafOrder(fn(spark, sfDir))
      val t0 = System.nanoTime()
      val cboFp = RowFingerprint(fn(spark, sfDir))
      val cboSec = (System.nanoTime() - t0) / 1e9
      Caches.drain()
      val ok = cboFp == rawFp
      if (!ok) mismatches += 1
      val moved = cboOrder != rawOrder
      if (moved) reordered += 1
      println(f"[cbobench] $name%-22s raw=${rawSec}%5.2f s cbo=${cboSec}%5.2f s " +
        f"${if (moved) "REORDERED" else "same-order"} ${if (ok) "MATCH" else "MISMATCH"}")
      if (moved)
        println(s"[cbobench]   raw: ${rawOrder.mkString(" > ")}\n[cbobench]   cbo: ${cboOrder.mkString(" > ")}")
      (name, rawSec, cboSec, moved, ok)
    }
    println(s"[cbobench] done: ${raw.size} queries, $reordered reordered, $mismatches mismatches")
    def f2(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val json = records.map { case (n, r, c, m, ok) =>
      s""""$n":{"raw_sec":${f2(r)},"cbo_sec":${f2(c)},"reordered":$m,"match":$ok}"""
    }.mkString(
      s"""{"metric":"cbo_bench","sf":"$sfDir","n_probes":${records.size},""" +
        s""""reordered":$reordered,"mismatches":$mismatches,""" +
        s""""raw_total_sec":${f2(records.map(_._2).sum)},""" +
        s""""cbo_total_sec":${f2(records.map(_._3).sum)},"queries":{""",
      ",", "}}\n")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(artifact), json)
    catch { case e: Throwable => System.err.println(s"[cbobench] artifact write failed: ${e.getMessage}") }
    spark.sql("DROP DATABASE IF EXISTS graft_bench CASCADE")
    spark.stop()
    if (mismatches > 0) sys.exit(1)
  }
}
