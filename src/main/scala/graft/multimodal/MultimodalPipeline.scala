package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted executor-side in partition batches.
  *
  * Image decode is REAL — [[realDecode]] reads PNG/JPEG/GIF/BMP headers via
  * `javax.imageio` (pure JVM, already on every classpath), width/height/
  * format without touching pixel data. Audio decode is REAL for the JDK's
  * container formats — [[realAudioDecode]] reads WAV/AIFF/AU headers via
  * `javax.sound.sampled` (sample rate, channels, frame count, encoding)
  * without decoding samples. Video codecs stay out of the dependency set,
  * so the deterministic [[stubDecode]] remains that path's stand-in (and
  * the DuckDB-oracle path: header decode has no SQL twin). The Spark-side
  * plumbing is identical either way: schema
  * (`id, media binary, meta struct`), partition-batched iteration (the
  * shape a vectorized decoder needs), executor-side execution with no
  * driver collect.
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

  /** Image header metadata from a real decode. */
  case class ImageMeta(id: Long, width: Int, height: Int, format: String)

  /** Real image decode via `javax.imageio`: width/height/format read from
    * the PNG/JPEG/GIF/BMP header WITHOUT decoding pixel data (`getWidth(0)`
    * on the reader, not `ImageIO.read` — a 100 MB image costs a header
    * read, not a BufferedImage allocation). Returns None for payloads no
    * installed reader recognizes; the caller chooses between dropping,
    * stub features, or failing. */
  def realDecode(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getWidth(0), r.getHeight(0),
            r.getFormatName.toLowerCase(java.util.Locale.ROOT)))
        } finally r.dispose()
      }
    } finally if (iis != null) iis.close()
  }

  /** Partition-batched REAL image decode: [[realDecode]] in the same
    * batched mapPartitions shape as [[extractFeatures]]; unrecognized
    * payloads are dropped (flatMap), recognized ones emit header metadata
    * only — the binary payload never leaves the partition. */
  def decodeImages(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          realDecode(r.media).map { case (w, h, fmt) => ImageMeta(r.id, w, h, fmt) }
        }
      }
    }
  }

  /** Audio header metadata from a real decode. */
  case class AudioMeta(
      id: Long, sample_rate: Double, channels: Int, frames: Long, encoding: String)

  /** Real audio decode via `javax.sound.sampled`: sample rate, channel
    * count, frame length and encoding read from the WAV/AIFF/AU header
    * WITHOUT decoding sample data (`getAudioFileFormat`, not
    * `getAudioInputStream` + read). Returns None for payloads no installed
    * provider recognizes. */
  def realAudioDecode(bytes: Array[Byte]): Option[(Double, Int, Long, String)] =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = aff.getFormat
      Some((fmt.getSampleRate.toDouble, fmt.getChannels,
        aff.getFrameLength.toLong, fmt.getEncoding.toString))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Partition-batched REAL audio decode — same batched mapPartitions shape
    * as [[decodeImages]]; unrecognized payloads drop, the binary payload
    * never leaves the partition. */
  def decodeAudio(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          realAudioDecode(r.media).map { case (sr, ch, fr, enc) =>
            AudioMeta(r.id, sr, ch, fr, enc)
          }
        }
      }
    }
  }

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
