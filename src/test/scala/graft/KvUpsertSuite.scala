package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.KvUpsert
import graft.streaming.KvUpsert.{KvEntry, KvOp}

/** The KV upsert surface (SURVEY §1.3/§7.6: the reference's latent
  * Get/Put/Append model) — distributed batch merge + incremental
  * foreachBatch sink, checked against a sequential fold of the same ops. */
class KvUpsertSuite extends SparkSpec {

  private def sequential(ops: Seq[KvOp]): Map[String, String] =
    ops.sortBy(_.seq).groupBy(_.key).flatMap { case (k, os) =>
      KvUpsert.applyOps(None, os).map(k -> _)
    }

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

    val state = spark.read.parquet(stateDir).as[KvEntry]
      .collect().map(e => e.key -> e.value).toMap
    assert(state == sequential(b1 ++ b2))
    assert(state == Map("k1" -> "abc", "k2" -> "v2", "k4" -> "fresh"))
  }

  test("replayed batch ids are skipped: append stays idempotent under at-least-once delivery") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-kv-replay").resolve("state").toString
    val b = Seq(KvOp(1, "put", "k", "x"), KvOp(2, "append", "k", "y")).toDS()
    KvUpsert.applyBatchOnce(b, stateDir, batchId = 0L)
    KvUpsert.applyBatchOnce(b, stateDir, batchId = 0L) // crash-replay of the same batch
    val state = spark.read.parquet(stateDir).as[KvEntry]
      .collect().map(e => e.key -> e.value).toMap
    assert(state == Map("k" -> "xy")) // not "xyy"
    KvUpsert.applyBatchOnce(Seq(KvOp(3, "append", "k", "z")).toDS(), stateDir, batchId = 1L)
    val after = spark.read.parquet(stateDir).as[KvEntry]
      .collect().map(e => e.key -> e.value).toMap
    assert(after == Map("k" -> "xyz"))
  }

  test("crash window is healed and a mismatched checkpoint fails loudly") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-kv-crash").resolve("state").toString
    KvUpsert.applyBatchOnce(Seq(KvOp(1, "put", "k", "x")).toDS(), stateDir, batchId = 0L)
    // simulate a crash between swap()'s two moves: state moved aside, fresh never landed
    Files.move(java.nio.file.Paths.get(stateDir),
      java.nio.file.Paths.get(stateDir + "-old"))
    KvUpsert.applyBatchOnce(Seq(KvOp(2, "append", "k", "y")).toDS(), stateDir, batchId = 1L)
    val state = spark.read.parquet(stateDir).as[KvEntry]
      .collect().map(e => e.key -> e.value).toMap
    assert(state == Map("k" -> "xy")) // old state recovered, then batch applied
    // a batch id BEHIND the state (fresh checkpoint against old state dir) must throw
    intercept[IllegalStateException] {
      KvUpsert.applyBatchOnce(Seq(KvOp(9, "put", "k", "boom")).toDS(), stateDir, batchId = 0L)
    }
  }
}
