package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipelines.TrainingPrep

/** Streaming face of the corpus-prep operators: documents arrive as a
  * stream (crawl ingest) and join reference data that is static for the
  * run. Complements [[StreamingEvents]] (watermarked windows, stateful
  * sessions) with the remaining Structured Streaming join shape: the
  * **stream-static join**, which Spark executes statelessly — the static
  * side is planned once per micro-batch and, broadcast, never shuffles the
  * stream side.
  */
object StreamingCorpus {

  /** Streaming benchmark decontamination — the stream-static twin of
    * [[TrainingPrep.decontaminate]]: each arriving document explodes to its
    * distinct word 5-grams (narrow), inner-joins the broadcast benchmark
    * gram set (stateless), and aggregates shared-gram counts per document.
    *
    * The count aggregation keys on the ingest-time window, so its state is
    * bounded by the watermark: a document's counts finalize once the
    * watermark passes its window — O(docs per window) state, never
    * O(stream history). Emit with `outputMode("update")` (partials as they
    * refine) or `"append"` (finalized rows only).
    *
    * @param docs streaming DataFrame with `doc_id`, `text`, and an
    *             event-time `ingest_ts` column
    * @param benchGrams static benchmark gram set (one `gram` column), e.g.
    *                   [[TrainingPrep.benchmarkGrams]]
    */
  def decontaminate(docs: DataFrame, benchGrams: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    docs.withWatermark("ingest_ts", watermark)
      .select(col("doc_id"), col("ingest_ts"),
        explode(TrainingPrep.ngrams(col("text"), TrainingPrep.NGram)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(window(col("ingest_ts"), "1 hour"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("doc_id"), col("n_shared"))
}
