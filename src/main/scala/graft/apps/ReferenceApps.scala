package graft.apps

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.MapReduceJob

/** The reference's shipped applications (`/root/reference/src/mrapps/`),
  * expressed twice each: through the [[MapReduceJob]] facade with map/reduce
  * functions structurally identical to the Go plugins, and (where a test or
  * query needs it) DataFrame-native so Catalyst gets a declarative plan.
  * Golden-parity tests assert the two agree line-for-line.
  */
object ReferenceApps {

  /** The reference tokenizer: maximal runs of Unicode letters, case kept
    * (`/root/reference/src/mrapps/wc.go:21-24`). */
  def tokenize(text: String): Seq[String] = graft.core.Tokenizer.letterTokens(text)

  /** A1 wc (`wc.go:19-40`): emit (word, "1"); reduce = count. */
  val wcMap: (String, String) => IterableOnce[(String, String)] =
    (_, contents) => tokenize(contents).map(w => (w, "1"))
  val wcReduce: (String, Seq[String]) => String = (_, values) => values.length.toString
  val wcJob = new MapReduceJob(wcMap, wcReduce)

  /** A2 indexer (`indexer.go:20-39`): per-doc distinct words → (word, doc);
    * reduce = "N doc1,doc2,…" with the posting list sorted. */
  val indexerJob = new MapReduceJob(
    mapf = (file, contents) => tokenize(contents).distinct.map(w => (w, file)),
    reducef = (_, docs) => s"${docs.length} ${docs.sorted.mkString(",")}")

  /** A3/A4 crash/nocrash query shape (`nocrash.go:26-47`) minus the fault
    * injection (Spark's retries are exercised separately in tests): four
    * fixed keys, values sorted and space-joined. */
  val fileStatsJob = new MapReduceJob(
    mapf = (file, contents) => Seq(
      ("a", file),
      ("b", file.length.toString),
      ("c", contents.length.toString),
      ("d", "xyzzy")),
    reducef = (_, values) => values.sorted.mkString(" "))

  /** A8 early_exit shape (`early_exit.go:19-23`): one count per input file. */
  val perFileCountJob = new MapReduceJob(
    mapf = (file, _) => Seq((file, "1")),
    reducef = (_, values) => values.length.toString)

  /** DataFrame-native wc over whole files — the declarative twin of
    * [[wcJob]], eligible for partial aggregation and codegen. */
  def wcDataFrame(spark: SparkSession, inputGlob: String): DataFrame =
    MapReduceJob.wholeFiles(spark, inputGlob).toDF("file", "contents")
      .select(explode(graft.text.TextQueries.tokens(col("contents"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).cast("string").as("value"))

  /** DataFrame-native indexer over whole files. */
  def indexerDataFrame(spark: SparkSession, inputGlob: String): DataFrame =
    MapReduceJob.wholeFiles(spark, inputGlob).toDF("file", "contents")
      .select(col("file").as("doc"),
        explode(array_distinct(graft.text.TextQueries.tokens(col("contents")))).as("word"))
      .groupBy(col("word"))
      .agg(concat_ws(" ",
        count(lit(1)).cast("string"),
        concat_ws(",", sort_array(collect_set(col("doc"))))).as("value"))
}

/** [[graft.core.MrPlugin]] face of the wc job — loadable by name at runtime
  * (`MrRun plugin:graft.apps.WcPlugin`), the shipped example of the
  * reference's `mrworker wc.so` flow. */
object WcPlugin extends graft.core.MrPlugin {
  def job: MapReduceJob = ReferenceApps.wcJob
}
