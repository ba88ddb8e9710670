package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/**
 * Multimodal column plumbing: image/audio/video as opaque binary columns plus
 * typed metadata, processed with partition-batched decode → feature extract.
 *
 * Image decode is REAL: `javax.imageio.ImageIO` ships with the JDK
 * (PNG/JPEG/BMP/GIF), so image rows decode to pixels and featurize as a
 * 16-bin luminance histogram. Audio/video codecs are not in this container —
 * those kinds fall back to a deterministic byte histogram, clearly flagged by
 * `decodedOk = false`. Everything around the codec — the schema, the typed
 * Dataset pipeline, the mapPartitions batch shape (one decoder init per
 * partition, streamed rows), the frame sampler, resize — is the production
 * plumbing a full codec stack would drop into.
 */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, format: String, durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String, data: Array[Byte], meta: MediaMeta)
  final case class FeatureRow(media_id: Long, kind: String, decodedOk: Boolean, feature: Array[Float])
  final case class FrameRow(media_id: Long, frameIdx: Int, frame: Array[Byte])

  /** Fabricate a deterministic media table from any string column — test
   * stand-in for `spark.read.format("binaryFile")`. Image-kind rows carry a
   * REAL 8x8 PNG (pixels seeded from the text hash) so the ImageIO decode
   * path is exercised end-to-end; audio/video rows carry raw text bytes. */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("t"))
      .map { r =>
        val kind = Seq("image", "audio", "video")((r.getLong(0) % 3).toInt)
        val text = r.getString(1)
        if (kind == "image") {
          val bytes = syntheticPng(text.hashCode.toLong)
          MediaRow(r.getLong(0), kind, bytes, MediaMeta(8, 8, "image/png", 0L))
        } else {
          val bytes = text.getBytes("UTF-8")
          MediaRow(r.getLong(0), kind, bytes, MediaMeta(0, 0, "fake/" + kind, bytes.length.toLong))
        }
      }
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

  /**
   * Decode + feature-extract, batched per partition. Images decode through
   * ImageIO → 16-bin luminance histogram (unit L1); undecodable or non-image
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

  /** (decodedOk, feature). Image kinds attempt a real ImageIO decode. */
  private[pipeline] def decode(data: Array[Byte], kind: String): (Boolean, Array[Float]) =
    if (kind == "image" && data != null && data.nonEmpty) {
      try {
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(data))
        if (img == null) (false, byteHistogram(data))
        else (true, luminanceHistogram(img))
      } catch { case _: Exception => (false, byteHistogram(data)) }
    } else (false, byteHistogram(data))

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

  /** Frame sampling for "video" rows: every `stride` bytes window as a fake
   * frame — the real version would seek keyframes; partition shape identical. */
  def sampleFrames(ds: Dataset[MediaRow], stride: Int, frameSize: Int): Dataset[FrameRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.kind == "video").flatMap { m =>
      m.data.grouped(stride).take(8).zipWithIndex.map { case (chunk, i) =>
        FrameRow(m.media_id, i, chunk.take(frameSize))
      }
    }
  }
}
