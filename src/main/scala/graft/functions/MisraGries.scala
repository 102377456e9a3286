package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries buffer with the shared-offset decrement trick: counters are
  * stored RAW and the classic "decrement every counter" step is a single
  * offset bump — the effective count of an entry is `stored - offset`.
  * Public top-level case class so Spark's encoder codegen (Janino) can
  * reach the constructor.
  *
  * Invariants maintained by [[MisraGries.reduce]]:
  *   - every entry in `counts` is alive (`stored > offset`) — dead entries
  *     are removed at the exact bump that kills them, so `counts.size` IS
  *     the live-counter count;
  *   - `minStored` is a lower bound on every stored value (it may run
  *     stale-LOW when the minimum entry is later incremented, which only
  *     costs an occasional no-op compaction, never correctness).
  */
case class MgBuffer(counts: Map[String, Long], offset: Long, minStored: Long) {
  /** Counters as true MG effective counts (used at merge/inspection time). */
  def effective: Map[String, Long] = counts.map { case (w, c) => w -> (c - offset) }
}

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
  * audits. The per-element decrement path (the hot path on cold-heavy
  * token streams) is O(1) — a shared-offset bump in [[MgBuffer]] — with
  * the O(k) compaction amortized to the bumps where a counter actually
  * reaches zero, instead of the classic O(k) map rebuild per cold item.
  */
class MisraGries(k: Int) extends Aggregator[String, MgBuffer, Seq[String]] {

  override def zero: MgBuffer = MgBuffer(Map.empty, 0L, Long.MaxValue)

  override def reduce(b: MgBuffer, item: String): MgBuffer = {
    val stored = b.counts.getOrElse(item, b.offset)
    if (stored > b.offset) b.copy(counts = b.counts.updated(item, stored + 1))
    else if (b.counts.size < k)
      MgBuffer(b.counts.updated(item, b.offset + 1), b.offset,
        math.min(b.minStored, b.offset + 1))
    else {
      // full and item absent: the classic decrement-every-counter step as
      // one offset bump; while no counter can reach zero (off < minStored)
      // this is O(1), and the O(k) filter runs only at a killing bump
      val off = b.offset + 1
      if (off < b.minStored) MgBuffer(b.counts, off, b.minStored)
      else {
        val survivors = b.counts.filter { case (_, c) => c > off }
        val newMin =
          if (survivors.isEmpty) Long.MaxValue else survivors.valuesIterator.min
        MgBuffer(survivors, off, newMin)
      }
    }
  }

  override def merge(b1: MgBuffer, b2: MgBuffer): MgBuffer = {
    val combined = b2.effective.foldLeft(b1.effective) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    val kept =
      if (combined.size <= k) combined
      else {
        // subtract the (k+1)-th largest count from everything; survivors are
        // the entries strictly above it — at most k remain
        val cut = combined.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
        combined.flatMap { case (w, c) => if (c > cut) Some(w -> (c - cut)) else None }
      }
    MgBuffer(kept, 0L,
      if (kept.isEmpty) Long.MaxValue else kept.valuesIterator.min)
  }

  override def finish(b: MgBuffer): Seq[String] = b.counts.keys.toSeq.sorted

  override def bufferEncoder: Encoder[MgBuffer] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MgBuffer]()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
