package graft.sources

import java.io.ByteArrayInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar-shard ingestion — the storage layout large
  * multimodal training corpora actually ship in (WebDataset / tarfile
  * sharding: a corpus is N `.tar` shards; a SAMPLE is the run of adjacent
  * members sharing a basename, e.g. `000017.jpg` + `000017.txt` +
  * `000017.json`). This reader turns a glob of shards into sample rows
  * without ever shuffling a payload:
  *
  *  - each shard is one `binaryFile` row → one task decodes it with
  *    commons-compress's tar reader (stream over the in-memory bytes —
  *    shards are sized for this, hundreds of MB, by the format's own
  *    convention);
  *  - members are grouped into samples BY ADJACENCY inside the task
  *    (the WebDataset contract: a sample's members are contiguous), so
  *    assembly needs NO shuffle, no sort, no join — the keyed-groupBy
  *    formulation would shuffle every payload byte to reunite members
  *    that were already next to each other;
  *  - downstream, samples are ordinary rows with a `Map[ext → bytes]`
  *    payload column — [[graft.multimodal.MultimodalPipeline]]'s decoders
  *    consume them per-partition unchanged.
  *
  * Scale shape: parallelism = shards (the format's unit of parallelism by
  * design); payloads stay inside their reading task until the consumer
  * aggregates features. Junk members (no basename, unreadable) drop like
  * every decoder here; a truncated shard yields its readable prefix.
  */
object TarShards {

  /** One raw tar member. */
  case class TarMember(shard: String, key: String, ext: String, payload: Array[Byte])

  /** One assembled sample: the adjacent members sharing a basename. */
  case class TarSample(shard: String, key: String, members: Map[String, Array[Byte]])

  private def splitName(name: String): Option[(String, String)] = {
    val base = name.substring(name.lastIndexOf('/') + 1)
    val dot = base.indexOf('.')
    if (dot <= 0) None // hidden/extension-less members are not sample parts
    else Some((base.substring(0, dot), base.substring(dot + 1)))
  }

  private def members(shard: String, bytes: Array[Byte]): Iterator[TarMember] = {
    val tar = new TarArchiveInputStream(new ByteArrayInputStream(bytes))
    Iterator
      .continually(try tar.getNextEntry catch { case _: java.io.IOException => null })
      .takeWhile(_ != null)
      .flatMap { e =>
        if (!e.isFile) Iterator.empty
        else splitName(e.getName) match {
          case Some((key, ext)) =>
            val buf = new Array[Byte](e.getSize.toInt)
            var off = 0
            var n = 0
            while (off < buf.length && n >= 0) {
              n = tar.read(buf, off, buf.length - off)
              if (n > 0) off += n
            }
            if (off == buf.length) Iterator.single(TarMember(shard, key, ext, buf))
            else Iterator.empty // truncated member: drop, keep the prefix read
          case None => Iterator.empty
        }
      }
  }

  /** Raw member stream: one row per tar member across all shards. */
  def readMembers(spark: SparkSession, glob: String): Dataset[TarMember] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) => members(path, bytes) })
  }

  /** CONTINUOUS ingestion: the same adjacency-assembled samples over a
    * stream of ARRIVING shards (Structured Streaming's file source watches
    * the glob; each discovered shard is decoded exactly once by one task —
    * the delivery-by-delivery shape of a corpus that lands as uploads).
    * Zero shuffle for the same reason as the batch path; exactly-once
    * per shard comes from the file source's checkpointed file log. */
  def streamSamples(spark: SparkSession, glob: String): Dataset[TarSample] = {
    import spark.implicits._
    // the binaryFile format's fixed schema — streaming file sources
    // require it stated (no inference pass over a possibly-empty glob)
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile").schema(binarySchema).load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        val out = ArrayBuffer.empty[TarSample]
        var curKey: String = null
        var cur = Map.empty[String, Array[Byte]]
        members(path, bytes).foreach { m =>
          if (m.key != curKey) {
            if (curKey != null) out += TarSample(path, curKey, cur)
            curKey = m.key
            cur = Map.empty
          }
          cur += (m.ext -> m.payload)
        }
        if (curKey != null) out += TarSample(path, curKey, cur)
        out.iterator
      })
  }

  /** One written shard's manifest row. */
  case class ShardManifest(shard: String, n_members: Long, bytes: Long)

  /** The EXPORT half: pack a (doc_id, text) corpus into `nShards` tar
    * shards — the packaging step that turns a curated corpus into the
    * WebDataset layout trainers stream. Placement is `doc_id mod nShards`
    * (deterministic, rebalance-free); ONE shuffle routes each document to
    * its shard's task, members are written in doc_id order, so every
    * shard's BYTES are a pure function of the corpus — re-exports are
    * bit-stable, which is what makes shard-level caching and resumable
    * uploads safe. Returns the manifest (one row per shard) the next
    * pipeline stage checks against.
    *
    * Scale shape: the only data movement is the routing shuffle the
    * format requires; each task streams its members through one tar
    * encoder — no shard is ever held in memory whole. */
  def writeShards(
      docs: Dataset[(Long, String)], outDir: String, nShards: Int): Dataset[ShardManifest] = {
    val spark = docs.sparkSession
    import spark.implicits._
    new java.io.File(outDir).mkdirs()
    docs
      .map { case (id, text) => (id % nShards, id, text) }
      .repartition(nShards, col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"))
      .mapPartitions { rows =>
        // a hash partition can carry several shard ids; one encoder each,
        // opened on first member, closed when its run ends (ids are sorted)
        val out = ArrayBuffer.empty[ShardManifest]
        var cur = -1L
        var tar: org.apache.commons.compress.archivers.tar.TarArchiveOutputStream = null
        var file: java.io.File = null
        var n = 0L
        def close(): Unit = if (tar != null) {
          tar.close()
          out += ShardManifest(file.getName, n, file.length())
          tar = null
        }
        rows.foreach { case (shard, id, text) =>
          if (shard != cur) {
            close()
            cur = shard
            n = 0L
            file = new java.io.File(outDir, f"shard-$shard%05d.tar")
            tar = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
              new java.io.BufferedOutputStream(new java.io.FileOutputStream(file)))
          }
          val bytes = text.getBytes("UTF-8")
          val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry(f"$id%012d.txt")
          e.setSize(bytes.length.toLong)
          e.setModTime(0L) // pinned mtime: shard bytes are corpus-determined
          tar.putArchiveEntry(e)
          tar.write(bytes)
          tar.closeArchiveEntry()
          n += 1
        }
        close()
        out.iterator
      }
  }

  /** Assembled samples: adjacent same-key members folded task-locally —
    * zero shuffle (suite-pinned: the physical plan has no Exchange). */
  def readSamples(spark: SparkSession, glob: String): Dataset[TarSample] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        val out = ArrayBuffer.empty[TarSample]
        var curKey: String = null
        var cur = Map.empty[String, Array[Byte]]
        members(path, bytes).foreach { m =>
          if (m.key != curKey) {
            if (curKey != null) out += TarSample(path, curKey, cur)
            curKey = m.key
            cur = Map.empty
          }
          cur += (m.ext -> m.payload)
        }
        if (curKey != null) out += TarSample(path, curKey, cur)
        out.iterator
      })
  }
}
