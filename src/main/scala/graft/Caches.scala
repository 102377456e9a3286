package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Registry for query-internal persists, so cache lifetime is structural
  * instead of caller-managed-with-no-caller.
  *
  * Registered queries that persist an intermediate (LSH candidate sets,
  * keeper ids) consume it several times WITHIN the plan they return — the
  * persist must outlive the caller's action, so the query function cannot
  * unpersist it itself. Instead it registers the handle here, and the
  * harness (Verify/Bench/TimeOne, or any long-lived service) calls
  * [[drain]] once the action completes. Non-blocking unpersist: the data is
  * dead, reclamation need not stall the next query. */
object Caches {
  private val registered = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for release at the next [[drain]]. */
  def persisted(df: DataFrame): DataFrame = register(df.persist())

  /** Register an already-persisted handle for release at the next [[drain]]. */
  def register(df: DataFrame): DataFrame = {
    registered.add(df)
    df
  }

  /** Unpersist every cache registered since the last drain. */
  def drain(): Unit = {
    var df = registered.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = registered.poll()
    }
  }
}
