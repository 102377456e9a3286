package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

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
  *  - [[upsertSink]] runs it incrementally with `foreachBatch` against a
  *    HASH-BUCKETED state table: entries live in `delta-<batch>/bucket=<b>`
  *    parquet dirs, and a single manifest file maps each bucket to its
  *    current data dir. A batch reads and rewrites ONLY the buckets its
  *    keys hash into — per-batch I/O is O(batch + touched buckets), not
  *    O(|state|) — and commits by atomically moving a fresh manifest into
  *    place, Delta-log style (a production deployment swaps this
  *    hand-rolled log for a transactional table format; the merge and
  *    bucketing logic are identical). Untouched buckets' files are never
  *    opened, written, or moved.
  *
  * State size is O(live keys); per-batch work is O(batch + touched buckets).
  */
object KvUpsert {

  /** One operation. `op` ∈ put | append | del; `seq` orders ops on a key. */
  case class KvOp(seq: Long, op: String, key: String, value: String)

  case class KvEntry(key: String, value: String)

  // Public (not `private`) on purpose: Janino-generated encoder projections
  // live outside this object and cannot call accessors on a private class —
  // `private` here silently drops every per-batch projection out of codegen
  // ("Expr codegen error and falling back to interpreter mode").
  case class BucketedOp(bucket: Int, seq: Long, op: String, key: String, value: String)
  case class BucketedEntry(bucket: Int, key: String, value: String)

  /** Buckets per state table. Fixed for the life of a state dir (recorded in
    * the manifest and validated): pruning routes each key by
    * `hash(key) mod NumBuckets`, so changing the count would misroute reads.
    * 16 keeps per-batch task counts small locally; a large deployment picks
    * O(|state| / healthy-file-size) once at table creation. */
  val NumBuckets = 16

  /** Deterministic key → bucket route (Java String.hashCode is spec-fixed,
    * so the same key always lands in the same bucket on any JVM). */
  def bucketOf(key: String, numBuckets: Int = NumBuckets): Int =
    math.floorMod(key.hashCode, numBuckets)

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

  // ---------------------------------------------------------------- manifest

  /** The state table's commit log: one file, atomically replaced per batch.
    * Line 1: `<appliedBatchId> <numBuckets>`; then `bucket<TAB>relativeDir`
    * for every non-empty bucket. */
  private val ManifestFile = "MANIFEST"

  private case class Manifest(batchId: Long, numBuckets: Int, buckets: Map[Int, String])

  private def readManifest(stateDir: String): Option[Manifest] = {
    val p = Paths.get(stateDir, ManifestFile)
    if (!Files.exists(p)) None
    else {
      val lines = Files.readAllLines(p).asScala.toList
      val head = lines.head.split(' ')
      val refs = lines.tail.map { l =>
        val Array(b, dir) = l.split('\t'); b.toInt -> dir
      }.toMap
      Some(Manifest(head(0).toLong, head(1).toInt, refs))
    }
  }

  private def writeManifest(stateDir: String, m: Manifest): Unit = {
    val body = (s"${m.batchId} ${m.numBuckets}" +:
      m.buckets.toSeq.sortBy(_._1).map { case (b, dir) => s"$b\t$dir" })
      .mkString("\n")
    val tmp = Paths.get(stateDir, ManifestFile + ".tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, body.getBytes)
    Files.move(tmp, Paths.get(stateDir, ManifestFile),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The state as a Dataset — what [[mergeBatch]] consumes and any reader
    * (tests, downstream jobs) should use. Reads only the manifest's current
    * data dirs; superseded and in-flight files are invisible. */
  def readState(spark: SparkSession, stateDir: String): Dataset[KvEntry] = {
    import spark.implicits._
    readStateSlice(spark, stateDir, readManifest(stateDir), _ => true)
  }

  /** The manifest-current entries of the buckets selected by `want` only —
    * the pruned read that keeps per-batch I/O O(touched buckets). */
  private def readStateSlice(
      spark: SparkSession, stateDir: String, manifest: Option[Manifest],
      want: Int => Boolean): Dataset[KvEntry] = {
    import spark.implicits._
    val paths = manifest.toSeq.flatMap(_.buckets.toSeq)
      .collect { case (b, dir) if want(b) => s"$stateDir/$dir" }
    if (paths.isEmpty) spark.emptyDataset[KvEntry]
    else spark.read.schema("key STRING, value STRING").parquet(paths: _*).as[KvEntry]
  }

  private def lastAppliedBatch(stateDir: String): Long =
    readManifest(stateDir).map(_.batchId).getOrElse(-1L)

  // ---------------------------------------------------------------- the sink

  /** Incremental upsert sink: each micro-batch merges into the bucketed
    * parquet state at `stateDir` and commits via atomic manifest replace.
    *
    * foreachBatch is at-least-once: a crash between the commit and the
    * checkpoint advance replays the batch, and `append` is not idempotent —
    * so the applied batch id travels in the manifest and replayed batches
    * are skipped. */
  def upsertSink(ops: Dataset[KvOp], stateDir: String, checkpointDir: String): StreamingQuery =
    ops.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: Dataset[KvOp], batchId: Long) =>
        applyBatchOnce(batch, stateDir, batchId)
      }
      .start()

  /** The foreachBatch body, replay-safe: applies `batch` only if `batchId`
    * is newer than the id recorded in the manifest. Exactly one id may be
    * replayed (the batch in flight when a crash hit); a batch id BEHIND
    * that is a checkpoint/state mismatch (fresh checkpoint pointed at an
    * old state dir) and silently dropping those batches would be invisible
    * data loss — fail loudly instead.
    *
    * Steps (crash-safe at every point — the manifest move is the only
    * commit, so a crash anywhere before it leaves the prior state intact
    * and the replay simply overwrites the orphan staging dirs):
    *  1. stage the batch's ops partitioned by key bucket — the staging
    *     dir's `bucket=` children ARE the touched-bucket set (filesystem
    *     metadata; no data returns to the driver);
    *  2. read the manifest-current files of touched buckets only, cogroup
    *     with the ops, write merged entries to `delta-<batchId>/bucket=`;
    *  3. atomically move in a manifest mapping untouched buckets to their
    *     existing dirs and touched buckets to the new delta (dropping
    *     buckets the merge emptied);
    *  4. GC: delete the ops staging and any data dir the manifest no
    *     longer references (superseded buckets, crashed batches' orphans). */
  private[graft] def applyBatchOnce(batch: Dataset[KvOp], stateDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val manifest = readManifest(stateDir)
    val last = manifest.map(_.batchId).getOrElse(-1L)
    val numBuckets = manifest.map(_.numBuckets).getOrElse(NumBuckets)
    if (batchId < last)
      throw new IllegalStateException(
        s"batch $batchId behind state's applied batch $last at $stateDir — " +
          "checkpoint and state directory are out of sync")
    if (batchId > last) {
      // 1. stage ops by bucket; list the children for the touched set
      val opsDir = s"$stateDir/ops-$batchId"
      batch.map(o => BucketedOp(bucketOf(o.key, numBuckets), o.seq, o.op, o.key, o.value))
        .toDF().write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(opsDir)
      val touched = bucketChildren(Paths.get(opsDir))
      if (touched.isEmpty) {
        // no ops in the batch: advance the applied id, nothing else moves
        writeManifest(stateDir, Manifest(batchId, numBuckets,
          manifest.map(_.buckets).getOrElse(Map.empty)))
      } else {
        // 2. merge touched buckets' current entries with the staged ops
        val prior = readStateSlice(spark, stateDir, manifest, touched.contains)
        val ops = spark.read.schema("seq LONG, op STRING, key STRING, value STRING")
          .parquet(touched.map(b => s"$opsDir/bucket=$b"): _*).as[KvOp]
        val deltaDir = s"delta-$batchId"
        mergeBatch(prior, ops)
          .map(e => BucketedEntry(bucketOf(e.key, numBuckets), e.key, e.value))
          .toDF().write.mode(SaveMode.Overwrite).partitionBy("bucket")
          .parquet(s"$stateDir/$deltaDir")
        // 3. commit: untouched refs carry over; touched point into the delta
        // (a bucket whose keys were all deleted writes no dir and drops out)
        val written = bucketChildren(Paths.get(stateDir, deltaDir))
        val kept = manifest.map(_.buckets).getOrElse(Map.empty) -- touched
        val fresh = written.map(b => b -> s"$deltaDir/bucket=$b").toMap
        writeManifest(stateDir, Manifest(batchId, numBuckets, kept ++ fresh))
      }
      gc(stateDir)
    } // batchId == last: foreachBatch replay of the already-applied batch — skip
  }

  /** `bucket=<b>` children of a staged/delta dir — the filesystem is the
    * channel for the touched-bucket metadata (bounded by NumBuckets). */
  private def bucketChildren(dir: Path): Seq[Int] =
    if (!Files.exists(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("bucket=") => s.stripPrefix("bucket=").toInt }
      .toSeq.sorted

  /** Delete everything the manifest doesn't reference: superseded bucket
    * dirs, ops staging, and orphan deltas from crashed batches. Runs after
    * every commit; also safe to call at any idle point. */
  private def gc(stateDir: String): Unit = {
    val root = Paths.get(stateDir)
    if (!Files.exists(root)) return
    val live: Set[String] = readManifest(stateDir)
      .map(_.buckets.values.toSet).getOrElse(Set.empty)
    val liveDeltas = live.map(_.split('/').head)
    Files.list(root).iterator().asScala.toList.foreach { child =>
      val name = child.getFileName.toString
      if (name.startsWith("ops-")) deleteRec(child)
      else if (name.startsWith("delta-")) {
        if (!liveDeltas.contains(name)) deleteRec(child)
        else // delta partially superseded: drop its unreferenced buckets
          Files.list(child).iterator().asScala.toList
            .filter(_.getFileName.toString.startsWith("bucket="))
            .filterNot(b => live.contains(s"$name/${b.getFileName}"))
            .foreach(deleteRec)
      }
    }
  }

  private def deleteRec(p: Path): Unit = if (Files.exists(p)) {
    Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => Files.delete(f))
  }
}
