package graft

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for shared derived ARTIFACTS — trained models,
  * verified pair lists, benchmark gram sets — keyed by (session, string
  * key, typically `kind/dataDir`).
  *
  * Why this exists: several registered queries derive from the same
  * expensive intermediate (the bigram LM, the BPE symbol table, the
  * benchmark n-gram set). Re-deriving per invocation re-pays the build —
  * and worse, a size gate that needs the artifact's exact row count
  * (`Plans.broadcastIfSmall`) turns into an EAGER materialization job on
  * every call (the round-10 `ngram_perplexity` 8× regression). The memo
  * makes both the artifact and its count once-per-session — the
  * single-session analog of the persisted model/feature table a production
  * pipeline maintains next to the corpus.
  *
  * Contract (the same one [[graft.dedup.DedupQueries]]' artifact memo
  * documents, centralized):
  *   - `build` runs inside `computeIfAbsent`, so it MUST NOT call back
  *     into this object (ConcurrentHashMap forbids recursive update —
  *     same-bin collisions throw, other-bin inserts can be lost). Resolve
  *     nested artifacts BEFORE the enclosing memo call and close over
  *     them.
  *   - values must be SELF-CONTAINED: persisted or checkpoint-truncated
  *     frames with no live dependence on caches a harness drain releases.
  *   - determinism of every build makes a memoized result bit-identical
  *     to a rebuild, so memoization is invisible to correctness.
  *
  * Lifetime: entries of stopped sessions are swept on access; a long-lived
  * session probing many data dirs (ScaleProbe) calls [[evictSession]]
  * between dirs, which also runs the eviction hooks the per-module memos
  * (graph edges/baskets, trained quantizers, dedup pair/label tables)
  * register — one release path for every session cache in the library. */
object Memo {

  private val memo = new ConcurrentHashMap[(SparkSession, String), AnyRef]

  /** Module-registered eviction callbacks (see [[onEvict]]). */
  private val evictHooks = new ConcurrentLinkedQueue[SparkSession => Unit]

  /** Generic artifact memo. `build` must not call back into [[Memo]]. */
  def artifact[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T = {
    sweepStopped()
    memo.computeIfAbsent((spark, key), _ => build).asInstanceOf[T]
  }

  /** A persisted frame together with its EXACT row count, built once —
    * the count both materializes the persist and feeds
    * [[Plans.broadcastIfSmall]] gates for free on every later call. */
  def countedArtifact(spark: SparkSession, key: String)(build: => DataFrame): (DataFrame, Long) =
    artifact(spark, key) {
      val df = build.persist()
      (df, df.count())
    }

  /** Memoized exact count of a (session, key)-stable deterministic frame —
    * for gates over frames that are already materialized (checkpointed
    * model tables) or lazily re-derived per invocation, where the
    * repeated eager count job is the waste. The frame is a STRICT
    * parameter on purpose: its construction (which may resolve other
    * memo artifacts) happens before the computeIfAbsent, so only the
    * count action — which cannot re-enter this map — runs inside it. */
  def countOf(spark: SparkSession, key: String, df: DataFrame): Long =
    artifact(spark, s"$key/#count")(java.lang.Long.valueOf(df.count())).longValue()

  /** Register a per-module eviction callback, run by [[evictSession]].
    * Modules with private memo maps call this once at object init; an
    * uninitialized module object has no entries to evict, so lazy
    * registration is sound. */
  def onEvict(hook: SparkSession => Unit): Unit = evictHooks.add(hook)

  /** Release every memoized artifact of `spark` — this map's entries
    * (unpersisting any frames found in the values) plus every registered
    * per-module memo. Safe while the session is live; the next access
    * simply rebuilds. */
  def evictSession(spark: SparkSession): Unit = {
    removeAndUnpersist(k => k._1 eq spark)
    evictHooks.forEach(h => h(spark))
  }

  private def sweepStopped(): Unit =
    removeAndUnpersist(k => k._1.sparkContext.isStopped)

  private def removeAndUnpersist(p: ((SparkSession, String)) => Boolean): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (p(e.getKey)) {
        unpersistValue(e.getValue)
        it.remove()
      }
    }
  }

  /** Best-effort release of frames inside a memo value; unpersist of a
    * never-persisted (checkpointed) frame is a harmless no-op. */
  private def unpersistValue(v: AnyRef): Unit = v match {
    case ds: org.apache.spark.sql.Dataset[_] => unpersistQuiet(ds)
    case p: Product => p.productIterator.foreach {
      case ds: org.apache.spark.sql.Dataset[_] => unpersistQuiet(ds)
      case _ => ()
    }
    case _ => ()
  }

  // a stopped context rejects unpersist — the blocks are gone anyway
  private def unpersistQuiet(ds: org.apache.spark.sql.Dataset[_]): Unit =
    try ds.unpersist(blocking = false)
    catch { case _: IllegalStateException => () }
}
