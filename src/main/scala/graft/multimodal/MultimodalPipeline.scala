package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted executor-side in partition batches.
  *
  * The decode itself (image/audio codecs) is STUBBED — the codec libraries
  * are deliberately not a dependency of this engine — but the Spark-side
  * plumbing is real and tested: schema (`id, media binary, meta struct`),
  * partition-batched iteration (the shape a vectorized decoder needs),
  * executor-side execution with no driver collect, and deterministic
  * fallback features so the pipeline is testable end-to-end.
  *
  * At 100 TB: media rows are large, so the operators here never shuffle the
  * binary payload — features are extracted narrow (mapPartitions) and only
  * the small feature columns continue into joins/aggregates.
  */
object MultimodalPipeline {

  /** A media row: payload + the metadata a real pipeline carries alongside. */
  case class MediaRow(id: Long, media: Array[Byte], format: String)

  /** Features extracted per media item. */
  case class MediaFeatures(id: Long, n_bytes: Long, checksum: Long, format: String)

  /** The real decoder hook. Intentionally unimplemented: wire an actual
    * codec (JPEG/PNG/audio frames) here when the runtime ships one. */
  def realDecode: Array[Byte] => MediaFeatures = ???

  /** Deterministic stand-in decoder: FNV-1a checksum + length. Used by tests
    * and by [[extractFeatures]]'s default so the pipeline runs end-to-end. */
  def stubDecode(id: Long, format: String)(bytes: Array[Byte]): MediaFeatures = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    MediaFeatures(id, bytes.length.toLong, h, format)
  }

  /** Partition-batched feature extraction: iterates each partition in fixed
    * size batches (the shape a vectorized/GPU decoder wants), never
    * materializing a partition in memory, never touching the driver. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real decoder would decode `batch` as one vectorized call
        batch.iterator.map(r => stubDecode(r.id, r.format)(r.media))
      }
    }
  }

  /** One sampled frame of a media item. */
  case class FrameRow(id: Long, frame_idx: Int, frame: Array[Byte])

  /** Resize, as a binary→binary narrow transform with updated metadata —
    * the payload never shuffles; a real implementation swaps the stub body
    * for a codec call. The stub deterministically truncates the payload to
    * `w·h` bytes so tests can assert the batching/schema contract. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map(r => r.copy(media = r.media.take(w * h)))
    }
  }

  /** Frame sampling: the 1→N expansion shape (one video row → `n` frame
    * rows), executed as a partition-local flatMap so the only data growth is
    * the sampled frames themselves. The stub slices the payload into `n`
    * contiguous chunks ("frames") deterministically; a real decoder would
    * seek keyframes. Downstream, frames are normal binary rows — feature
    * extraction, dedup, or embedding models consume them per-partition. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val len = r.media.length
      // m (not n) as the divisor so the m emitted frames tile the payload
      // exactly even when the payload is shorter than n bytes
      val m = math.min(n, len)
      (0 until m).iterator.map { i =>
        val from = i.toLong * len / m
        val until = (i + 1).toLong * len / m
        FrameRow(r.id, i, java.util.Arrays.copyOfRange(r.media, from.toInt, until.toInt))
      }
    }
  }

  /** Documents reinterpreted as a media table (text payload as bytes) — the
    * binary-column plumbing demo over driver testdata. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("media"),
        col("lang").as("format"))
      .as[MediaRow]
  }

  /** Oracle-checkable slice of the pipeline: binary length + content digest
    * per media item, computed on the binary column with built-in
    * expressions (codegen; the mapPartitions path is exercised in tests). */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("media"), col("lang"))
      .select(
        col("doc_id"),
        length(col("media")).cast("bigint").as("n_bytes"),
        md5(col("media")).as("digest"),
        col("lang").as("format"))

  def mediaFeaturesSql: String =
    """SELECT doc_id,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  md5(text) AS digest,
      |  lang AS format
      |FROM documents""".stripMargin
}
