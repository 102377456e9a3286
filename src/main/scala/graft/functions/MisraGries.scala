package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed [[Aggregator]] — the
  * heavy-hitters member of the sketch family ([[graft.events.EventQueries]]
  * has the HLL cardinality and Greenwald-Khanna quantile members), with the
  * family's defining property: a DETERMINISTIC error bound.
  *
  * With `k` counters over `n` items, every counter undercounts its item's
  * true frequency by at most `n/(k+1)`; the bound survives arbitrary
  * partial-aggregation merge trees (Agarwal et al., "Mergeable Summaries",
  * ACM TODS 2013 — the merge here is their COMBINE: sum counts, then
  * subtract the (k+1)-th largest and drop non-positives). Consequence:
  * any item with true frequency > n/(k+1) is GUARANTEED present in the
  * summary, under every partitioning and merge order — which is exactly
  * the membership contract the registered query emits. The summary's
  * counts themselves are merge-order-dependent (as in any MG
  * implementation), so only membership, never the counts, leaves the
  * operator.
  *
  * Spark runs this with partial aggregation: each map partition ships one
  * ≤ k-entry map into the shuffle — fixed-size state per partition at any
  * corpus scale, against the O(distinct items) of the exact count it
  * audits.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], item: String): Map[String, Long] =
    m.get(item) match {
      case Some(c) => m.updated(item, c + 1)
      case None if m.size < k => m.updated(item, 1L)
      // full and item absent: decrement every counter (the classic MG
      // step), dropping the ones that reach zero
      case None => m.flatMap { case (w, c) => if (c > 1) Some(w -> (c - 1)) else None }
    }

  override def merge(m1: Map[String, Long], m2: Map[String, Long]): Map[String, Long] = {
    val combined = m2.foldLeft(m1) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest count from everything; survivors are
      // the entries strictly above it — at most k remain
      val cut = combined.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (w, c) => if (c > cut) Some(w -> (c - cut)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
