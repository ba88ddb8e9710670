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

  test("unparseable video rows fall back to byte-window frames, none dropped") {
    val raw = Seq(Multimodal.MediaRow(5L, "video",
      "just plain text, no container".getBytes("UTF-8"),
      Multimodal.MediaMeta(0, 0, "fake/video", 0L))).toDS()
    val frames = Multimodal.sampleKeyframes(raw).collect()
    assert(frames.nonEmpty && frames.forall(_.media_id == 5L))
  }
}
