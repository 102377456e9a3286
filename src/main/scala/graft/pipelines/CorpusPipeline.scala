package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Caches, Tables}
import graft.dedup.DedupQueries
import graft.text.TextQueries

/** The flagship composition: a complete training-data corpus-prep pipeline
  * as ONE declarative query — the job a user of this engine actually runs
  * over 100 TB, assembled from the already-verified operators:
  *
  *   1. exact dedup — keep the min-doc_id of every md5-fingerprint group
  *      ([[DedupQueries.dedupExact]]);
  *   2. near-dup removal — among the kept docs, drop the larger side of
  *      every 3-gram-Jaccard ≥ 0.8 pair (MinHash-LSH candidates + exact
  *      verification, [[DedupQueries.dedupNear]]);
  *   3. quality + language gate — [[TextQueries.textQuality]]'s
  *      token/stopword/length heuristics, English only;
  *   4. per-source accounting of the surviving corpus (docs, tokens,
  *      letters) — the numbers a dataset card reports.
  *
  * Everything stays one lazy plan (the small keeper-id set is persisted so
  * the fingerprint window runs once, not per consumer); every stage is the
  * bucketed/partial-agg formulation its operator already proved, and the
  * DuckDB oracle recomposes the same stages from the same per-operator SQL. */
object CorpusPipeline {

  def corpusSummary(spark: SparkSession, dir: String): DataFrame = {
    // persisted (ids only, never text): the keeper set feeds the pair
    // filter and the final anti-join — without the persist, the
    // md5-fingerprint window would re-execute per consumer (ReuseExchange
    // shares the shuffle, not the window compute above it). Released by
    // the harness via Caches.drain() after the action.
    val keepers = Caches.persisted(
      DedupQueries.dedupExact(spark, dir)
        .filter(!col("is_dup")).select(col("doc_id")))
    // near-dup pairs over the FULL corpus, then both ends filtered to
    // exact-dedup survivors — provably the same kept set as pairing the
    // survivors only (a pair with a dropped exact-dup end can never affect
    // it), and exactly the oracle's formulation below. Running dedupNear on
    // the raw scan instead of a (documents ⋈ keepers) frame means the
    // expensive shingle/signature pass reads straight from parquet splits —
    // nothing upstream of it recomputes, and no raw text is ever cached or
    // shuffled (at 100 TB, caching a survivors⋈text frame is O(corpus)).
    val dropB = DedupQueries.nearPairsMemo(spark, dir)
      .join(keepers.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
      .join(keepers.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
      .select(col("doc_b").as("doc_id")).distinct()
    val kept = keepers.join(dropB, Seq("doc_id"), "left_anti")
    val quality = TextQueries.textQuality(spark, dir)
      .filter(col("is_quality") && col("lang") === "en")
      .select(col("doc_id"), col("n_tokens"), col("n_letters"))
    kept
      .join(quality, "doc_id")
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_letters")).as("total_letters"))
  }

  /** The oracle recomposes the pipeline from the same per-operator SQL the
    * individual oracles use (nested WITH blocks are the operator oracles
    * verbatim). */
  def corpusSummarySql: String =
    s"""WITH ex AS (${DedupQueries.dedupExactSql}),
       |keepers AS (SELECT doc_id FROM ex WHERE NOT is_dup),
       |pairs AS (${DedupQueries.dedupNearSql}),
       |drop_b AS (
       |  SELECT DISTINCT doc_b AS doc_id FROM pairs
       |  WHERE doc_a IN (SELECT doc_id FROM keepers)
       |    AND doc_b IN (SELECT doc_id FROM keepers)),
       |kept AS (
       |  SELECT doc_id FROM keepers
       |  WHERE doc_id NOT IN (SELECT doc_id FROM drop_b)),
       |q AS (${TextQueries.textQualitySql})
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(sum(q.n_letters) AS BIGINT) AS total_letters
       |FROM kept
       |JOIN q USING (doc_id)
       |JOIN documents d USING (doc_id)
       |WHERE q.is_quality AND q.lang = 'en'
       |GROUP BY d.source""".stripMargin
}
