package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/**
 * Multimodal column plumbing: image/audio/video as opaque binary columns plus
 * typed metadata, processed with partition-batched decode → feature extract.
 *
 * The DECODE STEP IS STUBBED (no image/audio codecs in this container): a
 * deterministic byte-histogram stands in for real pixel/sample decoding.
 * Everything around it — the schema, the Dataset[T] typed pipeline, the
 * mapPartitions batch shape (one decoder init per partition, streamed rows),
 * the frame sampler — is the real production plumbing a codec would drop
 * into.
 */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, format: String, durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String, data: Array[Byte], meta: MediaMeta)
  final case class FeatureRow(media_id: Long, kind: String, decodedOk: Boolean, feature: Array[Float])
  final case class FrameRow(media_id: Long, frameIdx: Int, frame: Array[Byte])

  /** Fabricate a deterministic media table from any string column — test
   * stand-in for `spark.read.format("binaryFile")`. */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("t"))
      .map { r =>
        val bytes = r.getString(1).getBytes("UTF-8")
        val kind = Seq("image", "audio", "video")((r.getLong(0) % 3).toInt)
        MediaRow(r.getLong(0), kind, bytes, MediaMeta(64, 64, "fake/" + kind, bytes.length.toLong))
      }
  }

  /**
   * Decode + feature-extract, batched per partition. STUB: the "decode" is a
   * 16-bin byte histogram normalized to unit L1 — swap `decodeStub` for a
   * real codec (e.g. TwelveMonkeys/JavaCV) keeping the same partition shape.
   */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[FeatureRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      // one decoder/session init per partition goes here
      rows.map { m =>
        val feat = decodeStub(m.data)
        FeatureRow(m.media_id, m.kind, feat != null, feat)
      }
    }
  }

  /** STUB decode: deterministic 16-bin normalized byte histogram. */
  private def decodeStub(data: Array[Byte]): Array[Float] = {
    if (data == null || data.isEmpty) return Array.fill(16)(0.0f)
    val hist = new Array[Float](16)
    var i = 0
    while (i < data.length) { hist((data(i) & 0xff) >> 4) += 1.0f; i += 1 }
    var j = 0
    while (j < 16) { hist(j) /= data.length.toFloat; j += 1 }
    hist
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
