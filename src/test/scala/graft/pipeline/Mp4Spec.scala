package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ISO-BMFF container parsing: metadata from the box walk, keyframe byte
 * ranges from the sample tables, and defensive behavior on garbage. */
class Mp4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(): (Array[Byte], Seq[Array[Byte]]) = {
    val samples = Seq(
      Array.tabulate[Byte](10)(i => (i + 1).toByte),
      Array.tabulate[Byte](7)(i => (0x20 + i).toByte),
      Array.tabulate[Byte](12)(i => (0x40 + i).toByte),
      Array.tabulate[Byte](5)(i => (0x60 + i).toByte))
    (Mp4.build(samples, syncSamples = Seq(1, 3), width = 320, height = 240,
      timescale = 600L, duration = 1200L), samples)
  }

  test("parse reads brand, duration, dimensions and codec from the box walk") {
    val (bytes, _) = fixture()
    val meta = Mp4.parse(bytes).get
    assert(meta.brand == "isom")
    assert(meta.durationMs == 2000L) // 1200 / 600 ts = 2 s
    assert(meta.width == 320 && meta.height == 240)
    assert(meta.videoCodec == "avc1")
    assert(meta.nSamples == 4 && meta.nSyncSamples == 2)
  }

  test("sampleRanges locates every sample; sync payloads slice back exactly") {
    val (bytes, samples) = fixture()
    val ranges = Mp4.sampleRanges(bytes)
    assert(ranges.map(_.sample) == Seq(1, 2, 3, 4))
    assert(ranges.map(_.size) == samples.map(_.length.toLong))
    assert(ranges.filter(_.sync).map(_.sample) == Seq(1, 3))
    // contiguity: each sample's range starts where the previous ended
    ranges.sliding(2).foreach { case Seq(a, b) =>
      assert(b.offset == a.offset + a.size)
    }
    ranges.foreach { r =>
      val got = bytes.slice(r.offset.toInt, (r.offset + r.size).toInt)
      assert(got.toSeq == samples(r.sample - 1).toSeq,
        s"sample ${r.sample} bytes must round-trip through the table math")
    }
  }

  test("garbage, truncated and non-BMFF bytes parse to None / empty, never throw") {
    assert(Mp4.parse(null).isEmpty)
    assert(Mp4.parse(Array[Byte]()).isEmpty)
    assert(Mp4.parse("not a container at all".getBytes("UTF-8")).isEmpty)
    val (bytes, _) = fixture()
    assert(Mp4.parse(bytes.take(20)).isEmpty) // truncated mid-box
    assert(Mp4.sampleRanges(bytes.take(40)).isEmpty)
  }

  test("extractVideoMeta + sampleKeyframes run distributed over the media table") {
    val docs = (0L until 30L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    val media = Multimodal.mediaFromText(docs, "doc_id", "text")
    val meta = Multimodal.extractVideoMeta(media).collect()
    assert(meta.length == 10) // ids ≡ 2 (mod 3)
    assert(meta.forall(_.getBoolean(1)), "every synthetic container must parse")
    assert(meta.forall(r => r.getLong(3) == 2000L && r.getInt(4) == 64 && r.getInt(5) == 48))
    val frames = Multimodal.sampleKeyframes(media).collect()
    // 2 sync samples per synthetic container, 16 bytes each
    assert(frames.length == 20)
    assert(frames.forall(_.frame.length == 16))
    assert(frames.groupBy(_.media_id).forall(_._2.map(_.frameIdx).sorted.sameElements(Seq(1, 3))))
  }

  test("MJPEG pixel decode: planted solid-color frames round-trip EXACTLY; avc1 stays an honest false") {
    // ADR-0002 option (a): a solid-color frame is pure DC, so quantized
    // JPEG reconstructs the planted channel values exactly — the decode
    // expectation is closed-form, not decode-vs-decode
    val rows = (0 until 6).map { i =>
      Multimodal.MediaRow(i.toLong, "video",
        Multimodal.syntheticMjpegMp4(seed = 1000L + i, nFrames = 3),
        Multimodal.MediaMeta(16, 16, "video/mp4", 120L))
    }.toDS()
    val meta = Multimodal.extractVideoMeta(rows).collect()
    assert(meta.forall(r => r.getBoolean(1) && r.getString(6) == "jpeg"),
      meta.mkString("; "))
    val got = Multimodal.decodeFrames(rows).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getBoolean(2), r.getInt(3), r.getInt(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(got.size == 18, s"6 videos x 3 frames: ${got.size}")
    got.foreach { case ((id, frame), (ok, w, h, mr, mg, mb)) =>
      assert(ok && w == 16 && h == 16, s"($id,$frame) -> ($ok,$w,$h)")
      val rgb = Multimodal.plantedFrameColor(1000L + id, frame - 1)
      assert(mr == ((rgb >> 16) & 0xff).toDouble &&
        mg == ((rgb >> 8) & 0xff).toDouble && mb == (rgb & 0xff).toDouble,
        f"($id,$frame): got ($mr%.2f,$mg%.2f,$mb%.2f) want planted $rgb%06x")
    }
    // avc1 (no JVM codec) emits one honest decoded_ok = false row per
    // video — the boundary is a COLUMN, never a silent drop
    val h264 = Seq(Multimodal.MediaRow(99L, "video",
      Multimodal.syntheticMp4(7L), Multimodal.MediaMeta(64, 48, "video/mp4", 2000L))).toDS()
    val hGot = Multimodal.decodeFrames(h264).collect()
    assert(hGot.length == 1 && !hGot(0).getBoolean(2) && hGot(0).getInt(1) == -1)
  }

  test("unparseable video rows fall back to byte-window frames, none dropped") {
    val raw = Seq(Multimodal.MediaRow(5L, "video",
      "just plain text, no container".getBytes("UTF-8"),
      Multimodal.MediaMeta(0, 0, "fake/video", 0L))).toDS()
    val frames = Multimodal.sampleKeyframes(raw).collect()
    assert(frames.nonEmpty && frames.forall(_.media_id == 5L))
  }
}
