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

  test("real GIF frame sampling: every k-th decoded frame with exact luma, non-GIF dropped") {
    import spark.implicits._
    // a real 5-frame animated GIF through the JDK's own sequence writer:
    // grayscale solid frames (GIF palettizes, grays survive exactly)
    val grays = Seq(0, 64, 128, 192, 255)
    def gifBytes(w: Int, h: Int): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      grays.foreach { g =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        (0 until w).foreach(x => (0 until h).foreach(y =>
          img.setRGB(x, y, (g << 16) | (g << 8) | g)))
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
      }
      writer.endWriteSequence(); writer.dispose(); ios.close()
      baos.toByteArray
    }
    val png = {
      val img = new java.awt.image.BufferedImage(3, 3,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos)); bos.toByteArray
    }
    val media = Seq(
      MultimodalPipeline.MediaRow(1L, gifBytes(6, 4), "gif"),
      MultimodalPipeline.MediaRow(2L, png, "png"), // single-frame non-GIF: dropped
      MultimodalPipeline.MediaRow(3L, Array[Byte](1, 2), "junk")).toDS()
    val out = MultimodalPipeline.sampleGifFrames(media, everyK = 2, batchSize = 2)
      .collect().sortBy(_.frame_idx)
    // frames 0, 2, 4 of 5; real decoded dims; gray g has luma 1000·g exactly
    assert(out.map(f => (f.id, f.frame_idx, f.n_frames, f.width, f.height)).toSeq ==
      Seq((1L, 0, 5, 6, 4), (1L, 2, 5, 6, 4), (1L, 4, 5, 6, 4)))
    assert(out.map(_.luma_mass).toSeq ==
      Seq(0, 2, 4).map(i => 6L * 4L * 1000L * grays(i)))
  }

  test("real image decode: PNG and JPEG fixtures yield width/height/format, junk is dropped") {
    import spark.implicits._
    // real fixture images, generated deterministically in-test: a 13x7 PNG
    // and a 5x9 JPEG through the JDK's own encoders
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, (x * 31 + y) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK cannot encode $fmt")
      bos.toByteArray
    }
    val media = Seq(
      MultimodalPipeline.MediaRow(1L, imageBytes(13, 7, "png"), "png"),
      MultimodalPipeline.MediaRow(2L, imageBytes(5, 9, "jpg"), "jpg"),
      MultimodalPipeline.MediaRow(3L, Array[Byte](1, 2, 3, 4), "junk")).toDS()
    val metas = MultimodalPipeline.decodeImages(media, batchSize = 2).collect()
      .map(m => m.id -> ((m.width, m.height, m.format))).toMap
    assert(metas == Map(
      1L -> ((13, 7, "png")),
      2L -> ((5, 9, "jpeg"))), metas.toString) // junk row dropped, no exception
  }

  test("pixel stats: exact BT.601 luma mass and histogram on a known 2x2 PNG") {
    import spark.implicits._
    // black, white, pure red, pure green — milli-luma 0 / 255000 / 76245 /
    // 149685, bins 0 / 7 / 2 / 4 (PNG is lossless, so pixels round-trip)
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0xff0000); img.setRGB(1, 1, 0x00ff00)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val media = Seq(
      MultimodalPipeline.MediaRow(1L, bos.toByteArray, "png"),
      MultimodalPipeline.MediaRow(2L, Array[Byte](9, 9), "junk")).toDS()
    val out = MultimodalPipeline.imagePixelStats(media).collect()
    assert(out.length == 1) // junk dropped
    val s = out.head
    assert((s.width, s.height, s.n_pixels) == ((2, 2, 4L)))
    assert(s.luma_sum_milli == 0L + 255000L + 76245L + 149685L)
    assert(s.mean_luma == s.luma_sum_milli / 4000.0)
    assert(s.luma_hist == Seq(1L, 0L, 1L, 0L, 1L, 0L, 0L, 1L))
  }

  test("pcm stats: exact abs mass and peak on a known 16-bit WAV") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val frames = 120
    val pcm = Array.tabulate[Byte](frames * 2)(i => (i * 7 % 251).toByte)
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    // driver-side expectation from the same little-endian samples
    val samples = (0 until frames).map(i =>
      (((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort.toInt))
    val media = Seq(
      MultimodalPipeline.MediaRow(1L, bos.toByteArray, "wav"),
      MultimodalPipeline.MediaRow(2L, Array[Byte](1, 2, 3), "junk")).toDS()
    val out = MultimodalPipeline.audioPcmStats(media).collect()
    assert(out.length == 1)
    val s = out.head
    assert(s.n_samples == frames.toLong)
    assert(s.abs_sum == samples.map(v => math.abs(v).toLong).sum)
    assert(s.peak == samples.map(math.abs).max)
    assert(s.mean_abs == s.abs_sum.toDouble / frames)
  }

  test("real audio decode: WAV fixtures yield rate/channels/frames, junk is dropped") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // real fixture audio, generated deterministically in-test through the
    // JDK's own WAV writer: 16-bit PCM, a sawtooth payload
    def wavBytes(rate: Float, channels: Int, frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val pcm = Array.tabulate[Byte](frames * channels * 2)(i => (i * 7 % 251).toByte)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      MultimodalPipeline.MediaRow(1L, wavBytes(8000f, 1, 120), "wav"),
      MultimodalPipeline.MediaRow(2L, wavBytes(44100f, 2, 37), "wav"),
      MultimodalPipeline.MediaRow(3L, Array[Byte](1, 2, 3, 4), "junk")).toDS()
    val metas = MultimodalPipeline.decodeAudio(media, batchSize = 2).collect()
      .map(m => m.id -> ((m.sample_rate, m.channels, m.frames, m.encoding))).toMap
    assert(metas == Map(
      1L -> ((8000.0, 1, 120L, "PCM_SIGNED")),
      2L -> ((44100.0, 2, 37L, "PCM_SIGNED"))), metas.toString) // junk dropped
  }

  test("expression path agrees with mapPartitions path on byte length") {
    import spark.implicits._
    val viaExpr = MultimodalPipeline.mediaFeatures(spark, Sf0001)
      .select($"doc_id", $"n_bytes").as[(Long, Long)].collect().toMap
    val viaMap = MultimodalPipeline.extractFeatures(
      MultimodalPipeline.mediaFromDocuments(spark, Sf0001)).collect()
    viaMap.foreach(f => assert(viaExpr(f.id) == f.n_bytes))
  }

  test("aHash near-dup: same picture at two resolutions pairs, the inverse does not") {
    import spark.implicits._
    // a smooth horizontal gradient rendered at 64x64 and 256x256: the 8x8
    // cell means agree, so the aHashes coincide; the inverted gradient
    // flips every bit and must stay unpaired under hamming <= 3
    def gradient(size: Int, invert: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(size, size,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until size).foreach { x =>
        val v0 = (255 * x) / (size - 1)
        val v = if (invert) 255 - v0 else v0
        val rgb = (v << 16) | (v << 8) | v
        (0 until size).foreach(y => img.setRGB(x, y, rgb))
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val media = Seq(
      MultimodalPipeline.MediaRow(1L, gradient(64, invert = false), "png"),
      MultimodalPipeline.MediaRow(2L, gradient(256, invert = false), "png"),
      MultimodalPipeline.MediaRow(3L, gradient(64, invert = true), "png"),
      MultimodalPipeline.MediaRow(4L, Array[Byte](0, 1, 2), "junk")).toDS()
    val hashes = MultimodalPipeline.imageAHash(media, batchSize = 2)
    val hs = hashes.collect().map(h => h.id -> h.ahash).toMap
    assert(hs.keySet == Set(1L, 2L, 3L)) // junk dropped
    assert(hs(1L) == hs(2L), "resolution change must not move the aHash on a smooth gradient")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) > 3, "the inverse is far")
    val pairs = MultimodalPipeline.nearDupImages(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)))
  }
  test("audio fingerprint: gain-invariant, near-dup banded join finds the altered copy") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = 650 // 10 samples per fingerprint frame
    def wav(samples: Array[Short]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (v, i) =>
        pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // deterministic pseudo-audio with a varied energy envelope
    val base = Array.tabulate[Short](n) { i =>
      val env = 1 + (i / 10) % 7
      ((math.sin(i * 0.7) * 800 * env).toInt.toShort)
    }
    val gained = base.map(v => (v * 2).toShort)      // uniform 2x gain
    val oneFrameOff = base.clone()                   // strongly perturb ONE frame
    (100 until 110).foreach(i => oneFrameOff(i) = 30000)
    val distinct = Array.tabulate[Short](n) { i =>   // unrelated envelope
      val env = 7 - (i / 10) % 7
      ((math.cos(i * 1.3) * 900 * env).toInt.toShort)
    }
    val media = Seq(
      MultimodalPipeline.MediaRow(1L, wav(base), "wav"),
      MultimodalPipeline.MediaRow(2L, wav(gained), "wav"),
      MultimodalPipeline.MediaRow(3L, wav(oneFrameOff), "wav"),
      MultimodalPipeline.MediaRow(4L, wav(distinct), "wav"),
      MultimodalPipeline.MediaRow(5L, Array[Byte](1, 2, 3), "junk")).toDS()
    val fps = MultimodalPipeline.audioFingerprint(media, batchSize = 2).collect()
      .map(h => h.id -> h).toMap
    assert(fps.keySet == Set(1L, 2L, 3L, 4L), "junk dropped, all WAVs fingerprinted")
    assert(fps(1L).afp == fps(2L).afp, "uniform gain must not change the fingerprint")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // one perturbed frame flips at most its two adjacent energy deltas
    assert(ham(fps(1L).afp, fps(3L).afp) > 0 && ham(fps(1L).afp, fps(3L).afp) <= 2,
      s"single-frame perturbation should cost 1-2 bits, got ${ham(fps(1L).afp, fps(3L).afp)}")
    assert(ham(fps(1L).afp, fps(4L).afp) > 3, "unrelated audio must not be a near-dup")
    val pairs = MultimodalPipeline.nearDupAudio(
      MultimodalPipeline.audioFingerprint(media, batchSize = 2), maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"expected the base/gained/perturbed triangle, got $pairs")
  }
}
