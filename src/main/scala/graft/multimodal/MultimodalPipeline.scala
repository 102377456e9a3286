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

  /** Pixel-level image statistics: width/height, exact integer luma mass,
    * and an 8-bin luma histogram. */
  case class ImageStats(
      id: Long, width: Int, height: Int, n_pixels: Long,
      luma_sum_milli: Long, mean_luma: Double, luma_hist: Seq[Long])

  /** REAL pixel-level feature extraction — the step past header metadata
    * ([[decodeImages]]): `ImageIO.read` decodes the full bitmap and the
    * features come from the pixels themselves. Luma is the integer
    * BT.601 weighting 299·R + 587·G + 114·B (0..254 745 per pixel,
    * "milli-luma"), summed exactly in int64; the histogram buckets
    * milli-luma into 8 equal bins of the 0..255 000 range. All-integer
    * accumulation ⇒ the stats are decode-deterministic and
    * partition-order-independent; the one division (mean) happens last.
    *
    * Scale shape: identical to every other decode here — batched
    * `mapPartitions`, pixels allocated per image and released, the payload
    * never shuffles; only (id, stats) rows leave the partition. A 100 TB
    * image corpus runs this as the map side of whatever aggregation
    * follows; undecodable payloads drop (flatMap), matching
    * [[decodeImages]]'s junk policy. */
  def imagePixelStats(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media)))
            .map { img =>
              val (w, h) = (img.getWidth, img.getHeight)
              val hist = new Array[Long](8)
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val luma = 299 * ((rgb >> 16) & 0xff) +
                    587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
                  sum += luma
                  hist((luma * 8) / 255001) += 1 // 255001: bin 7 closes at 255000
                  x += 1
                }
                y += 1
              }
              val n = w.toLong * h
              ImageStats(r.id, w, h, n, sum, sum / (1000.0 * n), hist.toSeq)
            }
        }
      }
    }
  }

  case class ImageHash(id: Long, ahash: Long, width: Int, height: Int)

  /** Perceptual average-hash (aHash) per image — the image twin of the
    * text corpus's SimHash: an 8×8 grid over the decoded bitmap, one bit
    * per cell, set when the cell's BT.601 integer luma mean exceeds the
    * image mean. The comparison cross-multiplies
    * (`cellSum·totalPix > totalSum·cellPix`) so the bit is an exact
    * rational decision — no float means, decode-deterministic. Pixels map
    * to cells by integer `(8x/w, 8y/h)`, so the hash is resolution-robust
    * the way aHash is meant to be (the same picture at 64×64 and 512×512
    * lands on the same bits wherever the downsampled grid agrees).
    *
    * Scale: same batched mapPartitions contract as every decode here —
    * payload never shuffles, only (id, 8-byte hash) rows leave. */
  def imageAHash(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media)))
            .map { img =>
              val (w, h) = (img.getWidth, img.getHeight)
              val cellSum = new Array[Long](64)
              val cellPix = new Array[Long](64)
              var total = 0L
              var y = 0
              while (y < h) {
                val cy = (8 * y) / h
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val luma = 299 * ((rgb >> 16) & 0xff) +
                    587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
                  val c = cy * 8 + (8 * x) / w
                  cellSum(c) += luma
                  cellPix(c) += 1
                  total += luma
                  x += 1
                }
                y += 1
              }
              val nPix = w.toLong * h
              var hash = 0L
              var c = 0
              while (c < 64) {
                if (cellPix(c) > 0 && cellSum(c) * nPix > total * cellPix(c))
                  hash |= (1L << c)
                c += 1
              }
              ImageHash(r.id, hash, w, h)
            }
        }
      }
    }
  }

  /** Near-duplicate image pairs from [[imageAHash]] signatures — the
    * SimHash pigeonhole applied to the perceptual hash: 4 bands of 16
    * bits; two hashes within Hamming distance ≤ 3 MUST agree on at least
    * one whole band (4 bands, 3 flipped bits), so banded equi-joins find
    * every such pair exactly, never comparing all pairs. The verify step
    * is one `bit_count(xor)` per candidate. */
  def nearDupImages(hashes: Dataset[ImageHash], maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(hashes.toDF().select(col("id"), col("ahash").as("h")), maxHamming)

  /** The banded Hamming join shared by [[nearDupImages]] and
    * [[nearDupAudio]]: 4 bands of 16 bits over any (id, h: long) frame;
    * pigeonhole guarantees completeness for `maxHamming ≤ 3`. */
  private def bandedHammingPairs(hashed: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, s"4x16 banding is complete only to Hamming 3, got $maxHamming")
    val banded = hashed
      .select(col("id"), col("h"), explode(expr(
        """transform(sequence(0, 3), b ->
          |  struct(b AS band, shiftright(h, b * 16) & 65535 AS key))""".stripMargin)).as("bk"))
      .select(col("id"), col("h"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.h").as("ha"), col("b.h").as("hb"))
      .distinct()
      .filter(expr(s"bit_count(ha ^ hb) <= $maxHamming"))
      .select(col("id_a"), col("id_b"),
        expr("cast(bit_count(ha ^ hb) as bigint)").as("hamming"))
  }

  /** 64-bit audio fingerprint + sample count. */
  case class AudioHash(id: Long, afp: Long, n_samples: Long)

  /** Perceptual audio fingerprint — the [[imageAHash]] analog for sound:
    * the decoded 16-bit PCM stream is split into 65 equal frames, each
    * frame's EXACT integer energy `Σ s²` accumulated in int64, and bit b
    * of the fingerprint is `energy(b+1) > energy(b)` — the energy-envelope
    * delta-sign sketch (the simplest member of the Haitsma–Kalker /
    * Shazam family, restricted to the time axis since no FFT ships in
    * this sandbox). Uniform gain multiplies every energy by g² > 0 and
    * preserves every comparison, so ABSENT CLIPPING the fingerprint is
    * amplitude-scale invariant — re-encoded/volume-normalized copies
    * collide, which is the near-dup property the fingerprint exists for.
    * Gain that saturates the 16-bit range clips samples, which scales
    * frames unevenly and can flip comparisons: clipped-hot copies are
    * NEAR duplicates (few flipped bits, inside the banded join's Hamming
    * radius for mild clipping), not guaranteed exact collisions.
    * Multi-channel 16-bit LE streams pass the format gate deliberately
    * and are fingerprinted over the INTERLEAVED stream: per-frame energy
    * sums all channels (a frame boundary cuts mid-sample-frame at worst
    * once per frame — error of order 1/f), so a stereo file and its
    * re-gained stereo copy collide, while a mono DOWNMIX is a different
    * signal and is not expected to. Streams shorter
    * than 65 samples (no full frame grid) drop, like undecodable payloads.
    *
    * Int64 bound: a frame of f samples sums to ≤ f·2¹⁵·2¹⁵ — safe to
    * 2²⁸ samples per frame (≈ 5 hours of 48 kHz audio per FRAME; a real
    * corpus chunks far earlier). Same batched-mapPartitions shape as
    * [[audioPcmStats]]; payloads never shuffle. */
  def audioFingerprint(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[AudioHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    val frames = 65
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.media))
            try {
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
              else {
                val bytes = ais.readAllBytes()
                val n = bytes.length / 2
                if (n < frames) None
                else {
                  val energy = new Array[Long](frames)
                  var i = 0
                  while (i < n) {
                    val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toLong
                    // frame index by exact integer proration — the same
                    // grid for any n, so equal-length copies align
                    energy(((i.toLong * frames) / n).toInt) += s * s
                    i += 1
                  }
                  var (afp, b) = (0L, 0)
                  while (b < frames - 1) {
                    if (energy(b + 1) > energy(b)) afp |= (1L << b)
                    b += 1
                  }
                  Some(AudioHash(r.id, afp, n.toLong))
                }
              }
            } finally ais.close()
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
            case _: java.io.IOException => None
          }
        }
      }
    }
  }

  /** Near-duplicate audio pairs from [[audioFingerprint]] signatures — the
    * identical banded pigeonhole join as [[nearDupImages]], shared code. */
  def nearDupAudio(hashes: Dataset[AudioHash], maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(hashes.toDF().select(col("id"), col("afp").as("h")), maxHamming)

  /** Sample-level audio statistics: exact integer absolute mass and peak
    * over the decoded 16-bit PCM stream. */
  case class AudioStats(
      id: Long, n_samples: Long, abs_sum: Long, peak: Int, mean_abs: Double)

  /** REAL sample-level audio feature extraction — the step past header
    * metadata ([[decodeAudio]]): `AudioSystem.getAudioInputStream` decodes
    * the PCM payload and the features come from the samples themselves
    * (per-corpus loudness/clipping screens). Little-endian signed 16-bit
    * samples accumulate |s| exactly in int64 with the running peak; the
    * mean is the one final division. Undecodable or non-16-bit payloads
    * drop. Same batched-mapPartitions shape; the payload never shuffles. */
  def audioPcmStats(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.media))
            try {
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
              else {
                val bytes = ais.readAllBytes()
                var (i, sum, peak, n) = (0, 0L, 0, 0L)
                while (i + 1 < bytes.length) {
                  val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort.toInt
                  val a = math.abs(s)
                  sum += a
                  if (a > peak) peak = a
                  n += 1
                  i += 2
                }
                if (n == 0) None
                else Some(AudioStats(r.id, n, sum, peak, sum.toDouble / n))
              }
            } finally ais.close()
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
            case _: java.io.IOException => None
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

  /** One REAL decoded frame sampled from an animated image. */
  case class GifFrame(
      id: Long, frame_idx: Int, n_frames: Int,
      width: Int, height: Int, luma_mass: Long)

  /** REAL frame sampling over animated GIFs — the video-pipeline shape
    * (seek → decode every k-th frame → per-frame features) run through an
    * actual multi-frame codec, `javax.imageio`'s GIF reader (the only
    * multi-frame format the JDK decodes; a production video pipeline swaps
    * the reader for an ffmpeg/JNI call and NOTHING else changes — same
    * batched mapPartitions, same 1→N row expansion, same payload-never-
    * shuffles contract as [[sampleFrames]]' byte-slicing stub, which stays
    * as the codec-free fallback). Each sampled frame yields its REAL
    * decoded dimensions and the exact int64 BT.601 luma mass
    * ([[imagePixelStats]]' policy). Non-GIF or undecodable payloads drop
    * (flatMap), matching every decoder's junk policy here.
    *
    * Frames are read with `getNumImages(allowSearch = true)` — one pass
    * over the payload to index frames, then only every k-th frame pays
    * decode. GIF frames can be partial rasters (frame disposal); the
    * stats describe the frame's own raster, the honest per-frame value. */
  def sampleGifFrames(
      media: Dataset[MediaRow], everyK: Int = 2, batchSize: Int = 64): Dataset[GifFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.media))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          val out =
            if (!readers.hasNext) Vector.empty[GifFrame]
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                if (!reader.getFormatName.equalsIgnoreCase("gif")) Vector.empty[GifFrame]
                else {
                  val n = reader.getNumImages(true)
                  (0 until n by math.max(1, everyK)).iterator.map { i =>
                    val img = reader.read(i)
                    val (w, h) = (img.getWidth, img.getHeight)
                    var sum = 0L
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) {
                        val rgb = img.getRGB(x, y)
                        sum += 299 * ((rgb >> 16) & 0xff) +
                          587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
                        x += 1
                      }
                      y += 1
                    }
                    GifFrame(r.id, i, n, w, h, sum)
                  }.toVector
                }
              } catch {
                case _: java.io.IOException => Vector.empty[GifFrame]
              } finally reader.dispose()
            }
          iis.close()
          out.iterator
        }
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
