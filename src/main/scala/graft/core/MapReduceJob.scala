package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's programming model (`/root/reference/src/mr/worker.go:39`):
  * a job is a user map function `(filename, contents) → [(key, value)]` and a
  * user reduce function `(key, [values]) → value`, over whole text files,
  * producing sorted `"key value"` text lines.
  *
  * This facade reproduces that contract on Spark primitives, one stage per
  * reference operator (SURVEY.md §2.1):
  *  - F1 whole-file scan → `wholetext` text source + `input_file_name()`
  *  - F2 generic map     → `flatMap(mapf)`
  *  - F4/F5 shuffle      → the Exchange under `groupByKey` (hash partitioning)
  *  - F6/F7 group+reduce → `groupByKey.mapGroups(reducef)` — values for one
  *    key are materialized per group exactly like the reference's `[]string`
  *  - F8 text sink       → `"key value"` lines via [[writeText]]
  *
  * The reference's F9–F16 (scheduling, liveness, retry, barrier, RPC) are
  * Spark's scheduler; nothing to reimplement. Unlike the reference, reduces
  * that are commutative monoids should prefer [[runAggregated]], which
  * lowers to a partial-aggregable Spark aggregate — at 100 TB the holistic
  * `mapGroups` path ships every value through the shuffle, the aggregated
  * path ships one partial per map partition.
  */
final class MapReduceJob(
    val mapf: (String, String) => IterableOnce[(String, String)],
    val reducef: (String, Seq[String]) => String,
    val nReduce: Int = 10) extends Serializable {

  /** Same job with a different reduce-partition count. */
  def withNReduce(n: Int): MapReduceJob = new MapReduceJob(mapf, reducef, n)

  /** Run map → shuffle → reduce; returns (key, value) rows in exactly
    * `nReduce` partitions.
    *
    * This one facade deliberately drops to the RDD layer: the reference
    * contract is row-at-a-time opaque functions with an EXACT reduce-task
    * count (`nReduce`), which `groupByKey(numPartitions)` expresses
    * directly — a Dataset `groupByKey` would re-shuffle on
    * spark.sql.shuffle.partitions and ignore nReduce. Declarative queries
    * belong in the DataFrame modules, not here. */
  def run(spark: SparkSession, inputGlob: String): Dataset[(String, String)] = {
    import spark.implicits._
    val files = MapReduceJob.wholeFiles(spark, inputGlob)
    val reduced = files.rdd
      .flatMap { case (name, contents) => mapf(name, contents) }
      .groupByKey(numPartitions = nReduce)
      .map { case (k, vs) => (k, reducef(k, vs.toSeq)) }
    spark.createDataset(reduced)
  }

  /** Run and write the reference's text-sink format (`"%v %v\n"` per
    * `/root/reference/src/mr/worker.go:189`), one file per reduce partition,
    * through Spark's committer (atomic, unlike the reference's bare
    * `os.Create`). */
  def runToText(spark: SparkSession, inputGlob: String, outDir: String): Unit =
    MapReduceJob.writeText(run(spark, inputGlob), outDir)
}

object MapReduceJob {

  /** F1: each input file as one `(basename, contents)` row. The basename is
    * URI-decoded (`input_file_name()` yields percent-encoded URIs, so
    * "my doc.txt" would otherwise surface as "my%20doc.txt"). Keying by
    * basename matches the parity harness's view of the corpus; same-named
    * files in different directories would collapse — pass distinct names.
    * (`wholetext` is correct for the parity corpus; 100 TB inputs use the
    * columnar sources instead — SURVEY.md §7.4.4.) */
  def wholeFiles(spark: SparkSession, inputGlob: String): Dataset[(String, String)] = {
    import spark.implicits._
    // input_file_name() percent-encodes, but leaves '+' literal; url_decode
    // alone would also turn that literal '+' into a space (form-encoding
    // semantics), so protect it as %2B first — "a+b.txt" round-trips.
    spark.read.option("wholetext", value = true).text(inputGlob)
      .select(
        url_decode(regexp_replace(regexp_extract(input_file_name(), "([^/]+)$", 1),
          "\\+", "%2B")).as("file"),
        col("value"))
      .as[(String, String)]
  }

  /** F8: `"key value"` text lines through the output committer. */
  def writeText(rows: Dataset[(String, String)], outDir: String): Unit =
    rows.select(concat_ws(" ", col("_1"), col("_2")).as("value"))
      .write.mode("overwrite").text(outDir)

  /** The merged, sorted view the reference harness checks
    * (`sort mr-out* | grep .` — `/root/reference/src/main/test-mr.sh:103`). */
  def mergedLines(rows: Dataset[(String, String)]): Seq[String] = {
    import rows.sparkSession.implicits._
    rows.map { case (k, v) => s"$k $v" }.collect().sorted.toIndexedSeq
  }

  /** The commutative-reduce lowering: when the user reduce is a fold over a
    * monoid (count, sum, …), express it as a Spark aggregate column so the
    * engine combines partially on the map side (reduce parallelism follows
    * spark.sql.shuffle.partitions/AQE here — the point of this path is to
    * let the engine plan). Same output contract. */
  def runAggregated(
      spark: SparkSession,
      inputGlob: String,
      mapf: (String, String) => IterableOnce[(String, String)],
      agg: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    wholeFiles(spark, inputGlob)
      .flatMap { case (name, contents) => mapf(name, contents) }
      .toDF("key", "value")
      .groupBy(col("key"))
      .agg(agg.cast("string").as("value"))
  }
}
