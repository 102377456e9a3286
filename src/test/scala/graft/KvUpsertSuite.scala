package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.KvUpsert
import graft.streaming.KvUpsert.{KvEntry, KvOp}

/** The KV upsert surface (SURVEY §1.3/§7.6: the reference's latent
  * Get/Put/Append model) — distributed batch merge + incremental
  * foreachBatch sink over the bucketed, manifest-committed state table,
  * checked against a sequential fold of the same ops. */
class KvUpsertSuite extends SparkSpec {

  private def sequential(ops: Seq[KvOp]): Map[String, String] =
    ops.sortBy(_.seq).groupBy(_.key).flatMap { case (k, os) =>
      KvUpsert.applyOps(None, os).map(k -> _)
    }

  private def stateMap(stateDir: String): Map[String, String] =
    KvUpsert.readState(spark, stateDir).collect().map(e => e.key -> e.value).toMap

  test("mergeBatch folds put/append/del with the reference model's semantics") {
    import spark.implicits._
    val prior = Seq(KvEntry("a", "x"), KvEntry("b", "y"), KvEntry("gone", "z")).toDS()
    val ops = Seq(
      KvOp(1, "append", "a", "1"),   // x -> x1
      KvOp(2, "append", "a", "2"),   // x1 -> x12 (order by seq)
      KvOp(3, "put", "b", "fresh"),  // replaces
      KvOp(4, "del", "gone", ""),    // dropped
      KvOp(5, "append", "new", "n")  // created from ""
    ).toDS()
    val out = KvUpsert.mergeBatch(prior, ops).collect().map(e => e.key -> e.value).toMap
    assert(out == Map("a" -> "x12", "b" -> "fresh", "new" -> "n"))
  }

  test("streaming upsert sink converges to the sequential fold across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stateDir = Files.createTempDirectory("graft-kv").resolve("state").toString
    val ckpt = Files.createTempDirectory("graft-kv-ckpt").toString

    val input = MemoryStream[KvOp]
    val q = KvUpsert.upsertSink(input.toDS(), stateDir, ckpt)
    val b1 = Seq(KvOp(1, "put", "k1", "a"), KvOp(2, "append", "k1", "b"),
      KvOp(3, "put", "k2", "v2"), KvOp(4, "put", "k3", "tmp"))
    val b2 = Seq(KvOp(5, "append", "k1", "c"), KvOp(6, "del", "k3", ""),
      KvOp(7, "append", "k4", "fresh"))
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val state = stateMap(stateDir)
    assert(state == sequential(b1 ++ b2))
    assert(state == Map("k1" -> "abc", "k2" -> "v2", "k4" -> "fresh"))
  }

  test("replayed batch ids are skipped: append stays idempotent under at-least-once delivery") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-kv-replay").resolve("state").toString
    val b = Seq(KvOp(1, "put", "k", "x"), KvOp(2, "append", "k", "y")).toDS()
    KvUpsert.applyBatchOnce(b, stateDir, batchId = 0L)
    KvUpsert.applyBatchOnce(b, stateDir, batchId = 0L) // crash-replay of the same batch
    assert(stateMap(stateDir) == Map("k" -> "xy")) // not "xyy"
    KvUpsert.applyBatchOnce(Seq(KvOp(3, "append", "k", "z")).toDS(), stateDir, batchId = 1L)
    assert(stateMap(stateDir) == Map("k" -> "xyz"))
  }

  test("a batch rewrites only the buckets its keys hash into") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-kv-buckets").resolve("state").toString
    // seed enough keys that several buckets are populated
    val seed = (0 until 64).map(i => KvOp(i, "put", s"key-$i", s"v$i"))
    KvUpsert.applyBatchOnce(seed.toDS(), stateDir, batchId = 0L)

    def dataFiles(): Map[Path, (Long, Long)] = {
      val root = Paths.get(stateDir)
      Files.walk(root).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(p => p -> (Files.getLastModifiedTime(p).toMillis, Files.size(p)))
        .toMap
    }

    val before = dataFiles()
    val touchedBucket = KvUpsert.bucketOf("key-7")
    KvUpsert.applyBatchOnce(Seq(KvOp(100, "append", "key-7", "!")).toDS(), stateDir, 1L)
    val after = dataFiles()

    // every surviving pre-batch file is byte-identical (same mtime + size) …
    val survivors = before.keySet.intersect(after.keySet)
    assert(survivors.nonEmpty, "no state files survived the single-key batch")
    survivors.foreach(p => assert(before(p) == after(p), s"untouched file rewritten: $p"))
    // … only the touched bucket's file was replaced …
    val replaced = before.keySet.diff(after.keySet)
    val added = after.keySet.diff(before.keySet)
    (replaced ++ added).foreach { p =>
      assert(p.toString.contains(s"bucket=$touchedBucket"),
        s"file outside touched bucket $touchedBucket changed: $p")
    }
    // … and the merge itself is correct
    assert(stateMap(stateDir)("key-7") == "v7!")
    assert(stateMap(stateDir).size == 64)
  }

  test("ScalaCheck: mergeBatch across random micro-batch boundaries equals the sequential fold") {
    // The history-based semantics check the reference ships porcupine for
    // (/root/reference/src/models/kv.go:40-54): for ANY op history and ANY
    // way of slicing it into micro-batches, folding the slices through the
    // distributed mergeBatch must equal the one-shot sequential fold —
    // i.e. batching is an implementation detail invisible in the state.
    // Put/append/del with colliding keys; append is the order-sensitive op
    // that makes this non-trivial.
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val opGen: Gen[(String, String, String)] = for {
      op <- Gen.frequency(4 -> Gen.const("put"), 4 -> Gen.const("append"), 2 -> Gen.const("del"))
      k <- Gen.oneOf("a", "b", "c", "d", "e")
      v <- Gen.oneOf("x", "y", "zz", "")
    } yield (op, k, v)
    val caseGen = for {
      n <- Gen.chooseNum(1, 24)
      raw <- Gen.listOfN(n, opGen)
      nCuts <- Gen.chooseNum(0, math.min(4, n - 1))
      cuts <- Gen.pick(nCuts, 1 until n)
    } yield (raw, cuts.toList)
    val prop = Prop.forAll(caseGen) { case (raw, cuts) =>
      val ops = raw.zipWithIndex.map { case ((op, k, v), i) => KvOp(i.toLong, op, k, v) }
      val bounds = (0 +: cuts.sorted) :+ ops.length
      val batches = bounds.sliding(2).collect {
        case Seq(a, b) if a < b => ops.slice(a, b)
      }.toList
      var state = spark.emptyDataset[KvEntry]
      batches.foreach(b => state = KvUpsert.mergeBatch(state, b.toDS()))
      val got = state.collect().map(e => e.key -> e.value).toMap
      got == sequential(ops)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("crash before commit is invisible; orphans are GC'd; a mismatched checkpoint fails loudly") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-kv-crash").resolve("state").toString
    KvUpsert.applyBatchOnce(Seq(KvOp(1, "put", "k", "x")).toDS(), stateDir, batchId = 0L)
    // simulate a crash mid-batch-1: staged ops and a delta exist, but the
    // manifest (the only commit point) was never replaced
    val orphanOps = Paths.get(stateDir, "ops-1", "bucket=0")
    val orphanDelta = Paths.get(stateDir, "delta-1", "bucket=0")
    Files.createDirectories(orphanOps); Files.createDirectories(orphanDelta)
    Files.write(orphanDelta.resolve("part-orphan.parquet"), Array[Byte](1, 2, 3))
    assert(stateMap(stateDir) == Map("k" -> "x")) // orphans invisible to readers
    // the replay of batch 1 applies cleanly over the prior state …
    KvUpsert.applyBatchOnce(Seq(KvOp(2, "append", "k", "y")).toDS(), stateDir, batchId = 1L)
    assert(stateMap(stateDir) == Map("k" -> "xy"))
    // … and GC removed the crash leftovers (no ops staging, no orphan files)
    assert(!Files.exists(Paths.get(stateDir, "ops-1")))
    assert(!Files.exists(orphanDelta.resolve("part-orphan.parquet")))
    // a batch id BEHIND the state (fresh checkpoint against old state dir) must throw
    intercept[IllegalStateException] {
      KvUpsert.applyBatchOnce(Seq(KvOp(9, "put", "k", "boom")).toDS(), stateDir, batchId = 0L)
    }
  }
}
