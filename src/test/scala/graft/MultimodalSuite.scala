package graft

import graft.multimodal.MultimodalPipeline

/** The multimodal plumbing: binary columns in, per-batch feature extraction
  * executor-side, features out. */
class MultimodalSuite extends SparkSpec {

  test("binary media rows flow through partition-batched extraction") {
    val media = MultimodalPipeline.mediaFromDocuments(spark, Sf0001)
    val feats = MultimodalPipeline.extractFeatures(media, batchSize = 7).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.format.nonEmpty)
    }
  }

  test("stub decoder is deterministic (checksum stable across runs)") {
    val a = MultimodalPipeline.extractFeatures(
      MultimodalPipeline.mediaFromDocuments(spark, Sf0001)).collect().sortBy(_.id)
    val b = MultimodalPipeline.extractFeatures(
      MultimodalPipeline.mediaFromDocuments(spark, Sf0001), batchSize = 3).collect().sortBy(_.id)
    assert(a.map(_.checksum).toSeq == b.map(_.checksum).toSeq)
  }

  test("resize is a narrow binary->binary transform with the contracted size") {
    val media = MultimodalPipeline.mediaFromDocuments(spark, Sf0001)
    val resized = MultimodalPipeline.resize(media, 8, 4)
    // narrow: no Exchange in the plan
    assert(!resized.queryExecution.executedPlan.toString.contains("Exchange"))
    resized.collect().foreach(r => assert(r.media.length <= 32))
  }

  test("frame sampling expands 1->n deterministically and reassembles to the payload") {
    val media = MultimodalPipeline.mediaFromDocuments(spark, Sf0001)
    val frames = MultimodalPipeline.sampleFrames(media, 4).collect()
    val byId = frames.groupBy(_.id)
    val originals = media.collect().map(r => r.id -> r.media).toMap
    assert(byId.size == originals.count(_._2.nonEmpty))
    byId.foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length))
      val reassembled = fs.sortBy(_.frame_idx).flatMap(_.frame)
      assert(java.util.Arrays.equals(reassembled, originals(id))) // lossless slicing
    }
  }

  test("frame sampling tiles payloads shorter than n (no dropped bytes, no empty frames)") {
    import spark.implicits._
    val media = Seq(
      MultimodalPipeline.MediaRow(1L, Array[Byte](9, 8), "x"),       // len < n
      MultimodalPipeline.MediaRow(2L, Array[Byte](1, 2, 3), "x"),    // len < n
      MultimodalPipeline.MediaRow(3L, Array.emptyByteArray, "x")).toDS()
    val frames = MultimodalPipeline.sampleFrames(media, 4).collect()
    assert(!frames.exists(_.id == 3L)) // empty payload → no frames
    val byId = frames.groupBy(_.id)
    assert(byId(1L).length == 2 && byId(2L).length == 3) // min(n, len) frames
    byId.foreach { case (id, fs) =>
      assert(fs.forall(_.frame.nonEmpty))
      val whole = fs.sortBy(_.frame_idx).flatMap(_.frame)
      val want = if (id == 1L) Array[Byte](9, 8) else Array[Byte](1, 2, 3)
      assert(java.util.Arrays.equals(whole, want))
    }
  }

  test("expression path agrees with mapPartitions path on byte length") {
    import spark.implicits._
    val viaExpr = MultimodalPipeline.mediaFeatures(spark, Sf0001)
      .select($"doc_id", $"n_bytes").as[(Long, Long)].collect().toMap
    val viaMap = MultimodalPipeline.extractFeatures(
      MultimodalPipeline.mediaFromDocuments(spark, Sf0001)).collect()
    viaMap.foreach(f => assert(viaExpr(f.id) == f.n_bytes))
  }
}
