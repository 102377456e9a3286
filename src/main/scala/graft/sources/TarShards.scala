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
