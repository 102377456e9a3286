package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Online ANN index maintenance — the streaming half of the similarity
  * surface: new embeddings arrive as a stream, each is assigned to its
  * nearest cell of the TRAINED IVF quantizer, and the (vec_id, cell,
  * csim) assignment rows flow to the index sink. Pair this with the batch
  * probe side ([[graft.similarity.SimilarityQueries.topkIvf]]'s cell-join
  * shape, or `dedup_incremental`'s stored-index discipline) and the index
  * is built online and probed offline — ingest never re-touches the
  * existing corpus.
  *
  * Scale shape: the assignment is STATELESS — one narrow pass per
  * micro-batch against a broadcast ≤|cells|-row centroid table (the argmax
  * is per-row over a constant-size array, computed executor-side with no
  * groupBy, no groupState, no shuffle at all). That is what makes ingest
  * sustain arbitrary throughput: per-vector cost is O(|cells|·dim),
  * per-batch state is zero. Cell-occupancy monitoring (the signal that
  * says "retrain the quantizer, cells are skewing") is the one stateful
  * consumer, a complete-mode count keyed by the ≤|cells| cell ids. */
object StreamingIndex {

  /** Per-row nearest-centroid assignment against a broadcast centroid
    * table: `cents` must be (cell BIGINT, centroid ARRAY<DOUBLE>), e.g.
    * [[graft.similarity.SimilarityQueries]]' trained centroid vectors. The
    * argmax runs inside one `aggregate()` fold over the collected centroid
    * array — ties to the LOWER cell id, the exact discipline of the batch
    * assignment — so the whole operator is a stateless projection. */
  def assignCells(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    // |cells| rows: collect into ONE literal row via a broadcast cross
    // join, keeping the stream side stateless (a stream-static join with a
    // per-row array fold; the static side is tiny by contract)
    val centArr = cents
      .agg(array_sort(collect_list(struct(col("cell"), col("centroid")))).as("cents"))
    vecs
      .crossJoin(broadcast(centArr))
      .withColumn("best", expr(
        """aggregate(cents,
          |  struct(CAST(-1 AS BIGINT) AS cell, CAST(-2.0 AS DOUBLE) AS csim),
          |  (acc, c) -> CASE WHEN cosine_sim(e, c.centroid) > acc.csim
          |                   THEN struct(c.cell AS cell, cosine_sim(e, c.centroid) AS csim)
          |                   ELSE acc END)""".stripMargin))
      .select(col("vec_id"), col("best.cell").as("cell"), col("best.csim").as("csim"))
  }

  /** Cell-occupancy monitor: running vector count per cell (complete-mode
    * agg over ≤|cells| keys — the retrain-trigger signal). */
  def cellOccupancy(assignments: DataFrame): DataFrame =
    assignments.groupBy(col("cell")).agg(count(lit(1)).as("n_vectors"))
}
