package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}

import graft.sources.TarShards

/** WebDataset-style tar-shard ingestion: fixture shards written through
  * commons-compress, read back as members and as adjacency-assembled
  * samples; the zero-shuffle contract is pinned on the physical plan. */
class TarShardsSuite extends SparkSpec {

  private def writeShard(dir: String, name: String,
      entries: Seq[(String, Array[Byte])]): Unit = {
    val fos = new FileOutputStream(s"$dir/$name")
    val tar = new TarArchiveOutputStream(fos)
    entries.foreach { case (n, bytes) =>
      val e = new TarArchiveEntry(n)
      e.setSize(bytes.length.toLong)
      tar.putArchiveEntry(e)
      tar.write(bytes)
      tar.closeArchiveEntry()
    }
    tar.close()
  }

  private def fixtureDir(): String = {
    val dir = Files.createTempDirectory("graft-tar").toString
    // shard A: two samples, text+bin members adjacent (the WebDataset
    // contract), plus an extension-less member that must drop
    writeShard(dir, "shard-a.tar", Seq(
      "000001.txt" -> "hello world".getBytes("UTF-8"),
      "000001.cls" -> "7".getBytes("UTF-8"),
      "000002.txt" -> "second sample".getBytes("UTF-8"),
      "000002.bin" -> Array[Byte](1, 2, 3, 4),
      "NOEXT" -> Array[Byte](9)))
    // shard B: one sample with a dotted double extension (json.gz shape
    // keeps everything after the FIRST dot, per WebDataset)
    writeShard(dir, "shard-b.tar", Seq(
      "x17.meta.json" -> """{"k":1}""".getBytes("UTF-8"),
      "x17.txt" -> "third".getBytes("UTF-8")))
    dir
  }

  test("members: every well-formed member surfaces with exact payload bytes") {
    val dir = fixtureDir()
    val ms = TarShards.readMembers(spark, s"$dir/*.tar").collect()
    assert(ms.length == 6) // NOEXT dropped
    val byKey = ms.map(m => (m.key, m.ext) -> m.payload).toMap
    assert(new String(byKey((("000001", "txt"))), "UTF-8") == "hello world")
    assert(byKey((("000002", "bin"))).toSeq == Seq[Byte](1, 2, 3, 4))
    assert(byKey((("x17", "meta.json"))).nonEmpty)
  }

  test("samples: adjacency assembly yields one row per basename with its member map") {
    val dir = fixtureDir()
    val ss = TarShards.readSamples(spark, s"$dir/*.tar").collect()
    assert(ss.length == 3)
    val byKey = ss.map(s => s.key -> s).toMap
    assert(byKey("000001").members.keySet == Set("txt", "cls"))
    assert(byKey("000002").members.keySet == Set("txt", "bin"))
    assert(byKey("x17").members.keySet == Set("txt", "meta.json"))
    assert(new String(byKey("x17").members("txt"), "UTF-8") == "third")
    // shards attribute their own samples
    assert(byKey("000001").shard.contains("shard-a.tar"))
    assert(byKey("x17").shard.contains("shard-b.tar"))
  }

  test("zero shuffle: the sample plan contains no Exchange — payloads never leave their task") {
    val dir = fixtureDir()
    val plan = TarShards.readSamples(spark, s"$dir/*.tar")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("a truncated shard yields its readable prefix, no exception") {
    val dir = fixtureDir()
    val full = {
      val bos = new ByteArrayOutputStream()
      val tar = new TarArchiveOutputStream(bos)
      Seq("a.txt" -> "aaaa".getBytes("UTF-8"), "b.txt" -> "bbbb".getBytes("UTF-8"))
        .foreach { case (n, bytes) =>
          val e = new TarArchiveEntry(n); e.setSize(bytes.length.toLong)
          tar.putArchiveEntry(e); tar.write(bytes); tar.closeArchiveEntry()
        }
      tar.close(); bos.toByteArray
    }
    // cut inside the second member's header/body
    Files.write(java.nio.file.Paths.get(s"$dir/trunc.tar"),
      java.util.Arrays.copyOfRange(full, 0, 1024 + 100))
    val ms = TarShards.readMembers(spark, s"$dir/trunc.tar").collect()
    assert(ms.map(_.key).toSeq == Seq("a"))
  }

  test("export roundtrip: documents pack into shards, read back bit-identical, manifest balances") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
      .select("doc_id", "text").as[(Long, String)]
    val outDir = Files.createTempDirectory("graft-tar-export").toString
    val manifest = TarShards.writeShards(docs, outDir, nShards = 4).collect()
    assert(manifest.length == 4)
    assert(manifest.map(_.n_members).sum == docs.count())
    // roundtrip: every document comes back byte-identical under its key
    val back = TarShards.readSamples(spark, s"$outDir/*.tar").collect()
      .map(s => s.key.toLong -> new String(s.members("txt"), "UTF-8")).toMap
    val truth = docs.collect().toMap
    assert(back == truth)
    // bit-stability: a second export yields byte-identical shard files
    val outDir2 = Files.createTempDirectory("graft-tar-export2").toString
    TarShards.writeShards(docs, outDir2, nShards = 4).collect()
    manifest.foreach { m =>
      val a = Files.readAllBytes(java.nio.file.Paths.get(s"$outDir/${m.shard}"))
      val b = Files.readAllBytes(java.nio.file.Paths.get(s"$outDir2/${m.shard}"))
      assert(java.util.Arrays.equals(a, b), s"${m.shard} not bit-stable")
    }
  }

  test("streaming ingestion: arriving shards surface as samples exactly once per shard") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tar-stream").toString
    writeShard(dir, "d1.tar", Seq(
      "a.txt" -> "one".getBytes("UTF-8"), "b.txt" -> "two".getBytes("UTF-8")))
    val q = graft.sources.TarShards.streamSamples(spark, s"$dir/*.tar")
      .map(s => (s.key, new String(s.members("txt"), "UTF-8")))
      .writeStream.format("memory").queryName("tar_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val first = spark.table("tar_stream").as[(String, String)].collect().toSet
      assert(first == Set(("a", "one"), ("b", "two")))
      // a second delivery: only the NEW shard's samples append
      writeShard(dir, "d2.tar", Seq("c.txt" -> "three".getBytes("UTF-8")))
      q.processAllAvailable()
      val all = spark.table("tar_stream").as[(String, String)].collect()
      assert(all.length == 3, all.mkString(","))
      assert(all.toSet == Set(("a", "one"), ("b", "two"), ("c", "three")))
    } finally q.stop()
  }

  test("curated export: quality-gated dedup survivors pack into shards end-to-end") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the full corpus-prep story composed from verified operators: exact-
    // dedup keepers ∩ the heuristic quality gate → bit-stable tar shards.
    // The driver corpus at this SF has no exact dups and no junk, so spike
    // one of each to make both gates demonstrably bite.
    val dir = Files.createTempDirectory("graft-curated-src").toString
    val spiked = Tables.documents(spark, Sf0001).unionByName(
      Tables.documents(spark, Sf0001).filter(col("doc_id") === 0)
        .withColumn("doc_id", lit(100000L)) // exact dup of doc 0
    ).unionByName(
      Seq((100001L, "x y", "en", "spiked", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")) // junk: fails the gate
    spiked.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val total = spiked.count()
    val keepers = graft.dedup.DedupQueries.dedupExact(spark, dir)
      .filter(!col("is_dup")).select("doc_id")
    val quality = graft.text.TextQueries.textQuality(spark, dir)
      .filter(col("is_quality")).select("doc_id")
    val curated = Tables.documents(spark, dir)
      .join(keepers, "doc_id").join(quality, "doc_id")
      .select("doc_id", "text").as[(Long, String)]
    val nCurated = curated.count()
    assert(nCurated > 0)
    assert(nCurated == total - 2, s"$nCurated / $total") // both gates bit
    assert(!curated.collect().map(_._1).contains(100000L) ||
      !curated.collect().map(_._1).contains(0L)) // one of the dup pair survives
    val outDir = Files.createTempDirectory("graft-curated").toString
    val manifest = TarShards.writeShards(curated, outDir, nShards = 3).collect()
    assert(manifest.map(_.n_members).sum == nCurated)
    // every exported member is a curated doc, byte-identical
    val back = TarShards.readSamples(spark, s"$outDir/*.tar").collect()
      .map(s => s.key.toLong -> new String(s.members("txt"), "UTF-8")).toMap
    assert(back == curated.collect().toMap)
    Caches.drain()
  }

  test("integration: a GIF inside a tar shard decodes through the multimodal pipeline") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tar-gif").toString
    val img = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    writeShard(dir, "media.tar", Seq(
      "m1.png" -> bos.toByteArray,
      "m1.txt" -> "caption".getBytes("UTF-8")))
    val media = TarShards.readSamples(spark, s"$dir/*.tar")
      .filter(_.members.contains("png"))
      .map(s => graft.multimodal.MultimodalPipeline.MediaRow(1L, s.members("png"), "png"))
    val metas = graft.multimodal.MultimodalPipeline.decodeImages(media).collect()
    assert(metas.map(m => (m.width, m.height)).toSeq == Seq((5, 4)))
  }
}
