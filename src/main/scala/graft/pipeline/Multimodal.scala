package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/**
 * Multimodal column plumbing: image/audio/video as opaque binary columns plus
 * typed metadata, processed with partition-batched decode → feature extract.
 *
 * Image and audio decode are REAL: `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF)
 * and `javax.sound.sampled.AudioSystem` (WAV/PCM, AIFF, AU) ship with the
 * JDK, so image rows decode to pixels and featurize as a 16-bin luminance
 * histogram, and audio rows decode to PCM samples and featurize as a 16-bin
 * amplitude histogram. Video CONTAINER parsing is real too ([[Mp4]],
 * ISO-BMFF): [[extractVideoMeta]] reads duration/dimensions/codec fourccs
 * and [[sampleKeyframes]] extracts the actual sync-sample payloads at their
 * sample-table byte offsets. Only PIXEL decode of those frames is absent
 * (no H.264 codec in the JDK), so video feature rows keep
 * `decodedOk = false` — the flag means "pixels decoded", and it stays
 * honest. The mapPartitions batch shape (one decoder init per partition,
 * streamed rows), schema, frame sampler and resize are the production
 * plumbing a codec stack would drop into.
 */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, format: String, durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String, data: Array[Byte], meta: MediaMeta)
  final case class FeatureRow(media_id: Long, kind: String, decodedOk: Boolean, feature: Array[Float])
  final case class FrameRow(media_id: Long, frameIdx: Int, frame: Array[Byte])

  /** Fabricate a deterministic media table from any string column — test
   * stand-in for `spark.read.format("binaryFile")`. Image-kind rows carry a
   * REAL 8x8 PNG, audio-kind rows a REAL 16-bit PCM WAV, and video-kind
   * rows a REAL minimal ISO-BMFF MP4 (all seeded from the text hash) so the
   * ImageIO / AudioSystem / [[Mp4]] parse paths are exercised end-to-end. */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("t"))
      .map { r =>
        val kind = Seq("image", "audio", "video")((r.getLong(0) % 3).toInt)
        val text = r.getString(1)
        kind match {
          case "image" =>
            val bytes = syntheticPng(text.hashCode.toLong)
            MediaRow(r.getLong(0), kind, bytes, MediaMeta(8, 8, "image/png", 0L))
          case "audio" =>
            val bytes = syntheticWav(text.hashCode.toLong)
            // 256 samples at 8 kHz = 32 ms
            MediaRow(r.getLong(0), kind, bytes, MediaMeta(0, 0, "audio/wav", 32L))
          case _ =>
            val bytes = syntheticMp4(text.hashCode.toLong)
            MediaRow(r.getLong(0), kind, bytes, MediaMeta(64, 48, "video/mp4", 2000L))
        }
      }
  }

  /** Deterministic minimal MP4: four 16-byte LCG samples (sync samples 1
   * and 3), one avc1 video track, 64×48, 2 s at timescale 1000. */
  private[pipeline] def syntheticMp4(seed: Long): Array[Byte] = {
    var p = seed
    val samples = Seq.fill(4) {
      val b = new Array[Byte](16)
      var i = 0
      while (i < 16) {
        p = p * 6364136223846793005L + 1442695040888963407L
        b(i) = (p >>> 56).toByte
        i += 1
      }
      b
    }
    Mp4.build(samples, syncSamples = Seq(1, 3),
      width = 64, height = 48, timescale = 1000L, duration = 2000L)
  }

  /** Deterministic 8x8 PNG: LCG-colored pixels from a seed. ImageIO's PNG
   * writer embeds no timestamps, so bytes are stable for a given seed. */
  private[pipeline] def syntheticPng(seed: Long): Array[Byte] = {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    var p = seed
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        p = p * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((p >>> 40) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic LOW-FREQUENCY image: two seeded cosine waves over a
   * gradient — smooth content whose 8×8 DCT block survives resizing and
   * JPEG recompression, unlike LCG noise (which is all high frequency), so
   * perceptual-hash tests exercise what real photographs do. */
  private[pipeline] def syntheticSmoothPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    // splitmix64 over the seed → wave frequencies (1..3 periods) and phases
    var z = seed + 0x9e3779b97f4a7c15L
    def next(): Long = {
      z += 0x9e3779b97f4a7c15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    // six non-separable waves with 1/k amplitude decay: a spread of DCT
    // coefficient magnitudes like a natural image, so the median threshold
    // is meaningful (a 1-2 wave image leaves 60 coefficients at ~0 and
    // their sign bits are pure noise under resampling)
    val waves = Array.tabulate(6) { k =>
      val fx = (next() & 0x7fffffff) % 5
      val fy = if (fx == 0) 1 + (next() & 0x7fffffff) % 4 else (next() & 0x7fffffff) % 5
      val ph = (next() & 0xffff) / 65536.0 * 2 * math.Pi
      (fx, fy, ph, 0.45 / (k + 1))
    }
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v = 0.5
        waves.foreach { case (fx, fy, ph, a) =>
          v += a * math.cos(2 * math.Pi * (fx.toDouble * x / w + fy.toDouble * y / h) + ph)
        }
        val lum = math.max(0, math.min(255, (v * 255).toInt))
        img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Re-encode an image as JPEG at the given quality — the lossy round-trip
   * a crawled duplicate typically went through. */
  private[pipeline] def recompressJpeg(data: Array[Byte], quality: Float): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(data))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  /** Nearest-neighbour resize of one image binary, re-encoded as PNG. */
  private[pipeline] def resizeOne(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(data))
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out.setRGB(x, y, img.getRGB(x * img.getWidth / w, y * img.getHeight / h))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 16-bit mono PCM WAV: 256 samples of LCG noise at 8 kHz.
   * The WAVE container writer is pure header + payload — no timestamps — so
   * bytes are stable for a given seed. */
  private[pipeline] def syntheticWav(seed: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val pcm = new Array[Byte](256 * 2)
    var p = seed
    var i = 0
    while (i < 256) {
      p = p * 6364136223846793005L + 1442695040888963407L
      val s = (p >>> 32).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false) // 16-bit signed mono LE
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, 256L)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /**
   * Decode + feature-extract, batched per partition. Images decode through
   * ImageIO → 16-bin luminance histogram (unit L1); audio decodes through
   * AudioSystem → PCM → 16-bin amplitude histogram; undecodable or video
   * bytes fall back to a byte histogram with decodedOk = false.
   */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[FeatureRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      // one decoder/session init per partition goes here (ImageIO is static);
      // rows stream through without materializing the partition
      rows.map { m =>
        val (ok, feat) = decode(m.data, m.kind)
        FeatureRow(m.media_id, m.kind, ok, feat)
      }
    }
  }

  /** (decodedOk, feature). Image kinds attempt a real ImageIO decode, audio
   * kinds a real AudioSystem (WAV/AIFF/AU) decode. */
  private[pipeline] def decode(data: Array[Byte], kind: String): (Boolean, Array[Float]) =
    if (data == null || data.isEmpty) (false, byteHistogram(data))
    else if (kind == "image") {
      try {
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(data))
        if (img == null) (false, byteHistogram(data))
        else (true, luminanceHistogram(img))
      } catch { case _: Exception => (false, byteHistogram(data)) }
    } else if (kind == "audio") {
      try (true, amplitudeHistogram(data))
      catch { case _: Exception => (false, byteHistogram(data)) }
    } else (false, byteHistogram(data))

  /** Real audio decode: container → 16-bit signed little-endian PCM via
   * AudioSystem (format conversion included, so 8-bit/big-endian/stereo
   * sources normalize), then a 16-bin amplitude histogram, unit L1. Throws on
   * undecodable bytes — callers fall back. */
  private def amplitudeHistogram(data: Array[Byte]): Array[Float] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val base = AudioSystem.getAudioInputStream(new ByteArrayInputStream(data))
    var pcm: javax.sound.sampled.AudioInputStream = null
    try {
      val bf = base.getFormat
      val target = new AudioFormat(bf.getSampleRate, 16, bf.getChannels, true, false)
      pcm = AudioSystem.getAudioInputStream(target, base)
      val hist = new Array[Float](16)
      var n = 0L
      val buf = new Array[Byte](4096)
      var read = pcm.read(buf)
      var carry = -1 // low byte of a sample split across read() boundaries
      while (read > 0) {
        var i = 0
        if (carry >= 0 && read > 0) {
          val s = (carry | (buf(0) << 8)).toShort
          hist((s + 32768) >> 12) += 1.0f; n += 1
          carry = -1; i = 1
        }
        while (i + 1 < read) {
          val s = ((buf(i) & 0xff) | (buf(i + 1) << 8)).toShort
          hist((s + 32768) >> 12) += 1.0f
          n += 1
          i += 2
        }
        if (i < read) carry = buf(i) & 0xff
        read = pcm.read(buf)
      }
      require(n > 0, "no PCM samples decoded")
      var j = 0
      while (j < 16) { hist(j) /= n.toFloat; j += 1 }
      hist
      // close the conversion stream too — it can hold codec buffers; closing
      // pcm closes the wrapped base, so base.close() is only the fallback for
      // a failure before the conversion stream exists
    } finally { if (pcm != null) pcm.close() else base.close() }
  }

  /** 16-bin luminance histogram, unit L1 — deterministic across JVMs
   * (integer Rec.601 weights, no float rounding in the binning). */
  private def luminanceHistogram(img: BufferedImage): Array[Float] = {
    val hist = new Array[Float](16)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        hist(lum >> 4) += 1.0f
        x += 1
      }
      y += 1
    }
    val n = (w * h).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    hist
  }

  /** Fallback feature: deterministic 16-bin normalized byte histogram. */
  private def byteHistogram(data: Array[Byte]): Array[Float] = {
    if (data == null || data.isEmpty) return Array.fill(16)(0.0f)
    val hist = new Array[Float](16)
    var i = 0
    while (i < data.length) { hist((data(i) & 0xff) >> 4) += 1.0f; i += 1 }
    var j = 0
    while (j < 16) { hist(j) /= data.length.toFloat; j += 1 }
    hist
  }

  /** Nearest-neighbour resize of image rows to (w, h), re-encoded as PNG;
   * non-image / undecodable rows pass through unchanged. Deterministic (no
   * interpolation, no rendering-hint variance). */
  def resizeImages(ds: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { m =>
        if (m.kind != "image") m
        else
          try {
            val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(m.data))
            if (img == null) m
            else {
              val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  out.setRGB(x, y, img.getRGB(x * img.getWidth / w, y * img.getHeight / h))
                  x += 1
                }
                y += 1
              }
              val bos = new ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              MediaRow(m.media_id, m.kind, bos.toByteArray,
                m.meta.copy(width = w, height = h, format = "image/png"))
            }
          } catch { case _: Exception => m }
      }
    }
  }

  /** Planted image-dedup table from an id column — a smooth synthetic
   * original per id, a 48×48 resized copy for ids ≡ 0 (mod 5) at id+1e6, a
   * JPEG-recompressed copy for ids ≡ 0 (mod 7) at id+2e6. The distributed
   * stand-in for a crawled image corpus with re-hosted duplicates. */
  def imageDupTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].flatMap { id =>
      val orig = syntheticSmoothPng(id, 64, 64)
      val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]((id, orig))
      if (id % 5 == 0) rows += ((id + 1000000L, resizeOne(orig, 48, 48)))
      if (id % 7 == 0) rows += ((id + 2000000L, recompressJpeg(orig, 0.8f)))
      rows
    }.toDF("id", "data")
  }

  /** Deterministic TONAL clip for perceptual-fingerprint fixtures: ~1 s of
   * 16-bit mono PCM at `rate`, a sum of the five [[AudioPhashAlgos
   * .BandCenters]] tones whose per-slice amplitudes step on the seeded
   * splitmix sequence — rich time×frequency energy ridges at exactly the
   * probe frequencies, so the HK sign grid is decisively non-tied and
   * survives resampling/re-encoding the way real music/speech does
   * (the LCG noise of [[syntheticWav]] has a flat spectrum and no
   * perceptual identity to preserve). */
  private[pipeline] def syntheticToneWav(seed: Long, nSamples: Int = 8192,
      rate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val pcm = toneCipPcm(seed, nSamples, rate)
    val bytes = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = math.max(-32768, math.min(32767, math.round(pcm(i) * 30000.0))).toShort
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The clip's [-1,1] samples: 17 amplitude slices (matching the
   * fingerprint's slicing) × 5 band-center tones. */
  private def toneCipPcm(seed: Long, nSamples: Int, rate: Float): Array[Double] = {
    def mix(z0: Long): Double = { // splitmix64 -> [0,1)
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) >>> 11).toDouble / (1L << 53).toDouble
    }
    val centers = AudioPhashAlgos.BandCenters
    val amps = Array.tabulate(17, centers.length)((t, b) =>
      0.05 + 0.95 * mix(seed * 1000003L + t * 37L + b))
    Array.tabulate(nSamples) { i =>
      val t = (i.toLong * 17 / nSamples).toInt
      var acc = 0.0
      var b = 0
      while (b < centers.length) {
        acc += amps(t)(b) * math.sin(2.0 * math.Pi * centers(b) * i / rate)
        b += 1
      }
      acc / centers.length
    }
  }

  /** Linear-interpolation resample of a decoded clip, re-encoded as a
   * 16-bit WAV at `newRate` — the JDK ships no rate-conversion provider,
   * and a fixture's resampler only needs to be deterministic. */
  private[pipeline] def resampleWav(data: Array[Byte], newRate: Float): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val (src, srcRate) = AudioPhashAlgos.decodeMonoPcm(data)
    val outN = math.max(1, math.round(src.length.toLong * newRate / srcRate).toInt)
    val bytes = new Array[Byte](outN * 2)
    var i = 0
    while (i < outN) {
      val pos = i.toDouble * srcRate / newRate
      val i0 = math.min(src.length - 1, pos.toInt)
      val i1 = math.min(src.length - 1, i0 + 1)
      val frac = pos - i0
      val v = src(i0) * (1 - frac) + src(i1) * frac
      val s = math.max(-32768, math.min(32767, math.round(v * 32767.0))).toShort
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(newRate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt, outN.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Lossy re-encode: squash to 8-bit signed PCM and swap containers to
   * AIFF (big-endian family) — a real codec round-trip losing 8 bits of
   * depth, the audio analogue of [[recompressJpeg]]. */
  private[pipeline] def reencodeAiff8(data: Array[Byte]): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val (src, srcRate) = AudioPhashAlgos.decodeMonoPcm(data)
    val bytes = new Array[Byte](src.length)
    var i = 0
    while (i < src.length) {
      bytes(i) = math.max(-128, math.min(127, math.round(src(i) * 127.0))).toByte
      i += 1
    }
    val fmt = new AudioFormat(srcRate, 8, 1, true, true)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt, src.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.AIFF, bos)
    bos.toByteArray
  }

  /** Planted audio-dedup table from an id column — a tonal original per
   * id, a linear-resampled 12 kHz copy for ids ≡ 0 (mod 5) at id+1e6, an
   * 8-bit AIFF re-encode for ids ≡ 0 (mod 7) at id+2e6. The distributed
   * stand-in for a crawled audio corpus with re-hosted duplicates —
   * mirrors [[imageDupTable]]. */
  def audioDupTable(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].flatMap { id =>
      val orig = syntheticToneWav(id)
      val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]((id, orig))
      if (id % 5 == 0) rows += ((id + 1000000L, resampleWav(orig, 12000f)))
      if (id % 7 == 0) rows += ((id + 2000000L, reencodeAiff8(orig)))
      rows
    }.toDF("id", "data")
  }

  /** Frame sampling for "video" rows: every `stride` bytes window as a fake
   * frame — [[sampleKeyframes]] is the container-aware version; this stays
   * as the format-agnostic fallback with the same partition shape. */
  def sampleFrames(ds: Dataset[MediaRow], stride: Int, frameSize: Int): Dataset[FrameRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.kind == "video").flatMap { m =>
      m.data.grouped(stride).take(8).zipWithIndex.map { case (chunk, i) =>
        FrameRow(m.media_id, i, chunk.take(frameSize))
      }
    }
  }

  /** Container-level video metadata per row — a narrow per-partition
   * projection (the [[Mp4]] box walk is one linear scan of the byte array,
   * no codec): (media_id, parsed_ok, brand, duration_ms, width, height,
   * video_codec, audio_codec, n_samples, n_sync_samples). Non-video rows
   * are excluded; unparseable containers report parsed_ok = false with
   * zeroed fields — same never-silently-drop contract as the WARC door. */
  def extractVideoMeta(ds: Dataset[MediaRow]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.kind == "video").map { m =>
      Mp4.parse(m.data) match {
        case Some(meta) =>
          (m.media_id, true, meta.brand, meta.durationMs, meta.width, meta.height,
            meta.videoCodec, meta.audioCodec, meta.nSamples, meta.nSyncSamples)
        case None =>
          (m.media_id, false, "", 0L, 0, 0, "", "", 0L, 0L)
      }
    }.toDF("media_id", "parsed_ok", "brand", "duration_ms", "width", "height",
      "video_codec", "audio_codec", "n_samples", "n_sync_samples")
  }

  /** Deterministic MJPEG-in-MP4: `nFrames` solid-color JPEG frames (color
   * seeded per frame), every frame a sync sample, stsd fourcc `jpeg` —
   * the codec-free container class whose pixel decode is pure JVM
   * (ADR-0002). ImageIO's JPEG writer embeds no timestamps, so bytes
   * are stable for a given seed. Visible to the driver contract
   * (q_video_frames synthesizes its corpus from doc ids). */
  private[graft] def syntheticMjpegMp4(seed: Long, nFrames: Int = 4): Array[Byte] = {
    val frames = (0 until nFrames).map { i =>
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      val rgb = plantedFrameColor(seed, i)
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      // quality 1.0: the luminance quant table is all-ones, so the
      // uniform gray block's DC survives exactly (see plantedFrameColor)
      val bos = new ByteArrayOutputStream()
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        w.setOutput(ios)
        w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { ios.close(); w.dispose() }
      bos.toByteArray
    }
    Mp4.build(frames, syncSamples = (1 to nFrames),
      width = 16, height = 16, timescale = 1000L, duration = nFrames * 40L,
      codec = "jpeg")
  }

  /** The planted color of [[syntheticMjpegMp4]] frame `i` — md5-derived
   * so the q_video_frames DuckDB oracle recomputes the SAME expectation
   * from hex chars (the q_video_meta closed-form posture). The color is
   * a GRAY in 96..156: gray maps to YCbCr (g, 128, 128) exactly (the
   * RGB→YCbCr coefficients sum to 1), the uniform block is pure DC, and
   * at quality 1.0 the luminance quant step is 1 — so the decode
   * reconstructs the planted value EXACTLY (a chromatic color would
   * pick up ±1 from the color-space rounding; pinned by Mp4Spec).
   * gray = 96 + lowNibble(md5 byte 0) × 4 — i.e. hex char 2 of
   * md5("<seed>#f<i>"). */
  private[graft] def plantedFrameColor(seed: Long, i: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed#f$i".getBytes("UTF-8"))
    val g = 96 + ((md(0) & 0xf) * 4)
    (g << 16) | (g << 8) | g
  }

  /** PIXEL decode for the JPEG-family video codecs (ADR-0002, option a):
   * an MJPEG sample IS a complete JPEG image, so the container's sample
   * tables (the [[sampleKeyframes]] machinery) plus ImageIO decode real
   * pixels with zero native code — honest pixels for the one container
   * class the pure JDK can decode. Output per decoded frame:
   * (media_id, frame_idx, decoded_ok, width, height, mean_r/g/b).
   * Non-JPEG-family video rows (avc1/hev1/…) emit ONE row with
   * decoded_ok = false and frame_idx −1 — the H.264+ decode boundary
   * stays recorded per row, never silently dropped (the ADR's revisit
   * trigger, not a missing feature). Scale: per-row imperative decode of
   * ≤ maxFrames bounded-size samples — O(frames) memory, no shuffle. */
  def decodeFrames(ds: Dataset[MediaRow], maxFrames: Int = 8): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val jpegFamily = Set("jpeg", "mjpa", "mjpb", "mjpg", "MJPG")
    ds.filter(_.kind == "video").flatMap { m =>
      val codec = Mp4.parse(m.data).map(_.videoCodec).getOrElse("")
      if (!jpegFamily(codec))
        Seq((m.media_id, -1, false, 0, 0, 0.0, 0.0, 0.0))
      else {
        val ranges = Mp4.sampleRanges(m.data).filter(_.sync).take(maxFrames)
        ranges.map { r =>
          try {
            if (r.offset < 0 || r.size <= 0 || r.offset + r.size > m.data.length)
              throw new java.io.IOException("sample range out of bounds")
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
              java.util.Arrays.copyOfRange(
                m.data, r.offset.toInt, (r.offset + r.size).toInt)))
            if (img == null) (m.media_id, r.sample, false, 0, 0, 0.0, 0.0, 0.0)
            else {
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              val n = (img.getWidth.toLong * img.getHeight).toDouble
              (m.media_id, r.sample, true, img.getWidth, img.getHeight,
                sr / n, sg / n, sb / n)
            }
          } catch {
            case _: Exception => (m.media_id, r.sample, false, 0, 0, 0.0, 0.0, 0.0)
          }
        }
      }
    }.toDF("media_id", "frame_idx", "decoded_ok", "width", "height",
      "mean_r", "mean_g", "mean_b")
  }

  /** REAL keyframe extraction for video rows: sync samples located through
   * the container's sample tables (stss × stsc × stsz × stco) and their
   * compressed payloads sliced at the exact byte offsets — up to
   * `maxFrames` per row, `frameIdx` = the container's 1-based sample
   * number. Rows whose container doesn't parse fall back to the
   * byte-window sampler so no video row silently vanishes. Pixel decode of
   * the extracted access units still needs a codec — these are the
   * compressed frames a downstream decoder (or a frame-level hash) would
   * consume. */
  def sampleKeyframes(ds: Dataset[MediaRow], maxFrames: Int = 8): Dataset[FrameRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.kind == "video").flatMap { m =>
      val ranges = Mp4.sampleRanges(m.data).filter(_.sync).take(maxFrames)
      if (ranges.nonEmpty)
        ranges.flatMap { r =>
          if (r.offset >= 0 && r.offset + r.size <= m.data.length && r.size > 0)
            Some(FrameRow(m.media_id, r.sample,
              java.util.Arrays.copyOfRange(m.data, r.offset.toInt, (r.offset + r.size).toInt)))
          else None
        }
      else // unparseable container: format-agnostic byte-window fallback
        m.data.grouped(4096).take(maxFrames).zipWithIndex.map { case (chunk, i) =>
          FrameRow(m.media_id, i, chunk)
        }.toSeq
    }
  }
}
