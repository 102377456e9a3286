package graft

import org.apache.spark.sql.functions._

import graft.dedup.DedupQueries
import graft.pipelines.CorpusPipeline
import graft.text.TextQueries

/** The flagship composed pipeline: its per-source totals must equal a
  * driver-side recomposition of the verified stage outputs. */
class CorpusPipelineSuite extends SparkSpec {

  test("corpus pipeline equals stagewise recomposition at sf0.001") {
    val keepers = DedupQueries.dedupExact(spark, Sf0001)
      .filter(!col("is_dup")).select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = DedupQueries.dedupNear(spark, Sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dropped = pairs.collect {
      case (a, b) if keepers(a) && keepers(b) => b
    }.toSet
    val kept = keepers -- dropped
    val quality = TextQueries.textQuality(spark, Sf0001)
      .filter(col("is_quality") && col("lang") === "en")
      .select("doc_id", "n_tokens", "n_letters").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sources = Tables.documents(spark, Sf0001)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val expected = kept.toSeq.flatMap(id => quality.get(id).map(q => (sources(id), q)))
      .groupBy(_._1).view.mapValues { g =>
        (g.size.toLong, g.map(_._2._1).sum, g.map(_._2._2).sum)
      }.toMap

    val got = CorpusPipeline.corpusSummary(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    assert(got.nonEmpty && got.values.map(_._1).sum > 0)
    // every gate is actually exercised by the fixture
    assert(dropped.nonEmpty)                            // near-dup stage removed docs
    assert(kept.size == keepers.size - dropped.size)
    assert(got.values.map(_._1).sum < kept.size)        // quality/lang gate filters
  }
}
