package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's latent KV surface (`/root/reference/src/kvraft/common.go:12-33`
  * defines Get/Put/Append over `string → string`; `/root/reference/src/models/kv.go:40-54`
  * gives the linearizable model where Append concatenates to the prior
  * value — the handlers themselves are unimplemented course skeleton).
  * SURVEY.md §7.6 maps that intent onto Spark as an upsert sink: a stream of
  * operations folded into a keyed state table.
  *
  * Design:
  *  - [[mergeBatch]] is the distributed merge: typed `cogroup` of the prior
  *    state with the batch's ops, per-key fold in (seq, then op order) —
  *    state shuffles once by key, ops shuffle once by key, nothing is
  *    collected to the driver.
  *  - [[upsertSink]] runs it incrementally with `foreachBatch`: each
  *    micro-batch folds into a parquet state directory via
  *    write-new-then-swap (micro-batches are serial, so the swap is safe;
  *    a production deployment would target a transactional table format,
  *    which replaces the swap — the merge logic is identical).
  *
  * State size is O(live keys); per-batch work is O(batch + touched keys).
  */
object KvUpsert {

  /** One operation. `op` ∈ put | append | del; `seq` orders ops on a key. */
  case class KvOp(seq: Long, op: String, key: String, value: String)

  case class KvEntry(key: String, value: String)

  /** Fold a batch of ops on top of the prior entry — the reference model's
    * semantics: put replaces, append concatenates (kv.go:40-54), del drops. */
  def applyOps(prior: Option[String], ops: Seq[KvOp]): Option[String] =
    ops.sortBy(_.seq).foldLeft(prior) { (acc, o) =>
      o.op match {
        case "put"    => Some(o.value)
        case "append" => Some(acc.getOrElse("") + o.value)
        case "del"    => None
        case other    => throw new IllegalArgumentException(s"unknown op: $other")
      }
    }

  /** Distributed merge of one batch into the state: `cogroup` keeps both
    * sides keyed (one shuffle each), emits the post-fold entry per key. */
  def mergeBatch(state: Dataset[KvEntry], batch: Dataset[KvOp]): Dataset[KvEntry] = {
    val spark = state.sparkSession
    import spark.implicits._
    state.groupByKey(_.key).cogroup(batch.groupByKey(_.key)) { (k, prior, ops) =>
      applyOps(prior.toSeq.headOption.map(_.value), ops.toSeq)
        .map(v => KvEntry(k, v)).iterator
    }
  }

  private def readState(spark: SparkSession, dir: String): Dataset[KvEntry] = {
    import spark.implicits._
    if (Files.exists(Paths.get(dir))) spark.read.parquet(dir).as[KvEntry]
    else spark.emptyDataset[KvEntry]
  }

  private val BatchMarker = "_applied_batch"

  private def lastAppliedBatch(stateDir: String): Long = {
    val marker = Paths.get(stateDir, BatchMarker)
    if (Files.exists(marker)) new String(Files.readAllBytes(marker)).trim.toLong else -1L
  }

  /** Incremental upsert sink: each micro-batch merges into the parquet
    * state at `stateDir` (write-new-then-swap).
    *
    * foreachBatch is at-least-once: a crash between the swap and the
    * checkpoint commit replays the batch, and `append` is not idempotent —
    * so the applied batch id travels inside the state directory (written to
    * the staging copy BEFORE the swap) and replayed batches are skipped. */
  def upsertSink(ops: Dataset[KvOp], stateDir: String, checkpointDir: String): StreamingQuery =
    ops.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: Dataset[KvOp], batchId: Long) =>
        applyBatchOnce(batch, stateDir, batchId)
      }
      .start()

  /** The foreachBatch body, replay-safe: applies `batch` only if `batchId`
    * is newer than the id recorded inside the state directory. Exactly one
    * id may be replayed (the batch in flight when a crash hit); a batch id
    * BEHIND that is a checkpoint/state mismatch (fresh checkpoint pointed
    * at an old state dir) and silently dropping those batches would be
    * invisible data loss — fail loudly instead. */
  private[graft] def applyBatchOnce(batch: Dataset[KvOp], stateDir: String, batchId: Long): Unit = {
    recover(stateDir)
    val last = lastAppliedBatch(stateDir)
    if (batchId < last)
      throw new IllegalStateException(
        s"batch $batchId behind state's applied batch $last at $stateDir — " +
          "checkpoint and state directory are out of sync")
    if (batchId > last) {
      val merged = mergeBatch(readState(batch.sparkSession, stateDir), batch)
      val tmp = s"$stateDir-staging-$batchId"
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      Files.write(Paths.get(tmp, BatchMarker), batchId.toString.getBytes)
      swap(Paths.get(tmp), Paths.get(stateDir))
    } // batchId == last: foreachBatch replay of the already-applied batch — skip
  }

  /** Heal the one crash window [[swap]] leaves: died after the old state
    * was moved aside but before the fresh copy moved in → restore the old
    * copy; died after the fresh copy moved in → drop the stale `-old`. */
  private def recover(stateDir: String): Unit = {
    val target = Paths.get(stateDir)
    val old = target.resolveSibling(target.getFileName.toString + "-old")
    if (Files.exists(old)) {
      if (!Files.exists(target)) Files.move(old, target)
      else deleteRec(old)
    }
  }

  /** Replace `target` with `fresh`: the old state is moved aside (not
    * deleted) first, so every crash point leaves a complete copy on disk —
    * at `target`, or at `-old` for [[recover]] to restore on the next
    * batch. Micro-batches are serial, so there are no concurrent swaps
    * within the stream. */
  private def swap(fresh: Path, target: Path): Unit = {
    val old = target.resolveSibling(target.getFileName.toString + "-old")
    deleteRec(old)
    val hadTarget = Files.exists(target)
    if (hadTarget) Files.move(target, old)
    Files.move(fresh, target)
    if (hadTarget) deleteRec(old)
  }

  private def deleteRec(p: Path): Unit = if (Files.exists(p)) {
    Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => Files.delete(f))
  }
}
