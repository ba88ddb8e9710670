package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Pure-JVM ISO-BMFF (MP4/MOV, ISO/IEC 14496-12 — public spec) container
 * parsing: the box walk plus the sample-table math. No codec is involved —
 * this reads the CONTAINER: duration, track dimensions, codec fourccs, and
 * the sample tables (stts/stss/stsz/stsc/stco) that locate every sample's
 * byte range in the file. That turns the video tier's former byte-histogram
 * fallback into real metadata extraction and real KEYFRAME extraction (the
 * compressed sync-sample payloads at their exact offsets) — everything a
 * 100 TB curation pass needs from video short of pixel decode, which still
 * requires a codec the JDK doesn't ship (and stays honestly flagged off).
 *
 * Parsing is defensive: any malformed structure (truncated box, size
 * overflow, table mismatch) yields None / empty rather than throwing, the
 * same never-silently-drop posture as the WARC front door.
 */
object Mp4 {

  /** Container-level metadata. `durationMs` from mvhd (movie timescale);
   * `width`/`height` from the first video track's tkhd (16.16 fixed point,
   * rounded); codec fourccs from each track's stsd entry. Sample counts
   * come from the video track's stts/stss. */
  final case class Mp4Meta(
      brand: String, durationMs: Long, width: Int, height: Int,
      videoCodec: String, audioCodec: String,
      nSamples: Long, nSyncSamples: Long)

  /** One located sample: 1-based sample number, whether it's a sync sample
   * (keyframe), and its absolute byte range in the file. */
  final case class SampleRange(sample: Int, sync: Boolean, offset: Long, size: Long)

  private final case class Box(boxType: String, start: Int, payloadStart: Int, end: Int)

  /** Child boxes of [from, to) — each a (type, payload) slice; stops cleanly
   * at the first malformed header. */
  private def boxes(data: Array[Byte], from: Int, to: Int): Seq[Box] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Box]
    var pos = from
    while (pos + 8 <= to) {
      val size32 = ((data(pos) & 0xffL) << 24) | ((data(pos + 1) & 0xffL) << 16) |
        ((data(pos + 2) & 0xffL) << 8) | (data(pos + 3) & 0xffL)
      val tpe = new String(data, pos + 4, 4, "ISO-8859-1")
      var payloadStart = pos + 8
      val size: Long =
        if (size32 == 1L) { // 64-bit largesize follows the type
          if (pos + 16 > to) return out.toSeq
          var v = 0L
          var i = 0
          while (i < 8) { v = (v << 8) | (data(pos + 8 + i) & 0xffL); i += 1 }
          payloadStart = pos + 16
          v
        } else if (size32 == 0L) (to - pos).toLong // box extends to end
        else size32
      if (size < (payloadStart - pos) || pos + size > to) return out.toSeq
      out += Box(tpe, pos, payloadStart, (pos + size).toInt)
      pos += size.toInt
    }
    out.toSeq
  }

  private def child(data: Array[Byte], b: Box, tpe: String): Option[Box] =
    boxes(data, b.payloadStart, b.end).find(_.boxType == tpe)

  private def u32(data: Array[Byte], pos: Int): Long =
    ((data(pos) & 0xffL) << 24) | ((data(pos + 1) & 0xffL) << 16) |
      ((data(pos + 2) & 0xffL) << 8) | (data(pos + 3) & 0xffL)

  private def u64(data: Array[Byte], pos: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (data(pos + i) & 0xffL); i += 1 }
    v
  }

  /** (timescale, duration) from an mvhd/mdhd payload (version-dependent
   * layout). */
  private def timescaleDuration(data: Array[Byte], b: Box): (Long, Long) = {
    val v = data(b.payloadStart) & 0xff
    if (v == 1) (u32(data, b.payloadStart + 20), u64(data, b.payloadStart + 24))
    else (u32(data, b.payloadStart + 12), u32(data, b.payloadStart + 16))
  }

  /** Parse container metadata. None when the bytes aren't ISO-BMFF (no
   * ftyp/moov at the top level). */
  def parse(data: Array[Byte]): Option[Mp4Meta] = {
    if (data == null || data.length < 16) return None
    try {
      val top = boxes(data, 0, data.length)
      val ftyp = top.find(_.boxType == "ftyp")
      val moov = top.find(_.boxType == "moov")
      if (moov.isEmpty || (ftyp.isEmpty && top.forall(_.boxType != "mdat"))) return None
      val brand = ftyp.map(b => new String(data, b.payloadStart, 4, "ISO-8859-1")).getOrElse("")
      val durationMs = child(data, moov.get, "mvhd").map { mvhd =>
        val (ts, dur) = timescaleDuration(data, mvhd)
        if (ts == 0) 0L else dur * 1000L / ts
      }.getOrElse(0L)
      var width = 0; var height = 0
      var videoCodec = ""; var audioCodec = ""
      var nSamples = 0L; var nSync = 0L
      boxes(data, moov.get.payloadStart, moov.get.end).filter(_.boxType == "trak").foreach { trak =>
        val mdia = child(data, trak, "mdia")
        val handler = mdia.flatMap(child(data, _, "hdlr"))
          .map(h => new String(data, h.payloadStart + 8, 4, "ISO-8859-1")).getOrElse("")
        val stbl = mdia.flatMap(child(data, _, "minf")).flatMap(child(data, _, "stbl"))
        val codec = stbl.flatMap(child(data, _, "stsd")).flatMap { stsd =>
          if (u32(data, stsd.payloadStart + 4) < 1) None
          else Some(new String(data, stsd.payloadStart + 12, 4, "ISO-8859-1"))
        }.getOrElse("")
        if (handler == "vide") {
          if (videoCodec.isEmpty) videoCodec = codec
          child(data, trak, "tkhd").foreach { tkhd =>
            val v = data(tkhd.payloadStart) & 0xff
            // verflags+times+id+reserved+duration (36 v1 / 24 v0) +
            // reserved8 + layer/group/volume/reserved8 + matrix36
            val base = tkhd.payloadStart + (if (v == 1) 88 else 76)
            if (base + 8 <= tkhd.end) {
              width = (u32(data, base) >> 16).toInt       // 16.16 fixed
              height = (u32(data, base + 4) >> 16).toInt
            }
          }
          stbl.flatMap(child(data, _, "stts")).foreach { stts =>
            val n = u32(data, stts.payloadStart + 4).toInt
            var i = 0
            while (i < n && stts.payloadStart + 8 + 8 * i + 4 <= stts.end) {
              nSamples += u32(data, stts.payloadStart + 8 + 8 * i); i += 1
            }
          }
          nSync = stbl.flatMap(child(data, _, "stss"))
            .map(stss => u32(data, stss.payloadStart + 4)).getOrElse(nSamples)
        } else if (handler == "soun" && audioCodec.isEmpty) audioCodec = codec
      }
      Some(Mp4Meta(brand, durationMs, width, height, videoCodec, audioCodec, nSamples, nSync))
    } catch { case _: Exception => None }
  }

  /** Locate every sample of the FIRST video track: walk stsc's run-length
   * chunk mapping against stco/co64 chunk offsets and stsz sizes; sync
   * flags from stss (absent stss = every sample is sync, per spec). Empty
   * when the container doesn't parse or the tables disagree. */
  def sampleRanges(data: Array[Byte]): Seq[SampleRange] = {
    if (data == null || data.length < 16) return Nil
    try {
      val top = boxes(data, 0, data.length)
      val moov = top.find(_.boxType == "moov").getOrElse(return Nil)
      val stblOpt = boxes(data, moov.payloadStart, moov.end).filter(_.boxType == "trak")
        .flatMap { trak =>
          val mdia = child(data, trak, "mdia")
          val handler = mdia.flatMap(child(data, _, "hdlr"))
            .map(h => new String(data, h.payloadStart + 8, 4, "ISO-8859-1")).getOrElse("")
          if (handler == "vide")
            mdia.flatMap(child(data, _, "minf")).flatMap(child(data, _, "stbl"))
          else None
        }.headOption
      val stbl = stblOpt.getOrElse(return Nil)

      val stsz = child(data, stbl, "stsz").getOrElse(return Nil)
      val fixedSize = u32(data, stsz.payloadStart + 4)
      val sampleCount = u32(data, stsz.payloadStart + 8).toInt
      def sizeOf(sample1: Int): Long = // 1-based
        if (fixedSize != 0) fixedSize
        else u32(data, stsz.payloadStart + 12 + 4 * (sample1 - 1))

      val chunkOffsets = child(data, stbl, "stco") match {
        case Some(stco) =>
          val n = u32(data, stco.payloadStart + 4).toInt
          Array.tabulate(n)(i => u32(data, stco.payloadStart + 8 + 4 * i))
        case None =>
          val c = child(data, stbl, "co64").getOrElse(return Nil)
          val n = u32(data, c.payloadStart + 4).toInt
          Array.tabulate(n)(i => u64(data, c.payloadStart + 8 + 8 * i))
      }

      val stsc = child(data, stbl, "stsc").getOrElse(return Nil)
      val nRuns = u32(data, stsc.payloadStart + 4).toInt
      val runs = Array.tabulate(nRuns) { i =>
        val base = stsc.payloadStart + 8 + 12 * i
        (u32(data, base).toInt, u32(data, base + 4).toInt) // (first_chunk 1-based, samples/chunk)
      }

      val syncSet: Set[Int] = child(data, stbl, "stss") match {
        case Some(stss) =>
          val n = u32(data, stss.payloadStart + 4).toInt
          (0 until n).map(i => u32(data, stss.payloadStart + 8 + 4 * i).toInt).toSet
        case None => (1 to sampleCount).toSet // no stss ⇒ all sync (spec)
      }

      val out = scala.collection.mutable.ArrayBuffer.empty[SampleRange]
      var sample = 1
      var chunk = 1
      var run = 0
      while (sample <= sampleCount && chunk <= chunkOffsets.length) {
        while (run + 1 < nRuns && runs(run + 1)._1 <= chunk) run += 1
        val perChunk = runs(run)._2
        var within = 0
        var offset = chunkOffsets(chunk - 1)
        while (within < perChunk && sample <= sampleCount) {
          val sz = sizeOf(sample)
          out += SampleRange(sample, syncSet.contains(sample), offset, sz)
          offset += sz
          sample += 1
          within += 1
        }
        chunk += 1
      }
      out.toSeq
    } catch { case _: Exception => Nil }
  }

  // ------------------------------------------------------- fixture builder

  /** Build a minimal valid MP4 (ftyp + mdat + moov with one avc1 video
   * track and full sample tables) around the given sample payloads —
   * deterministic bytes, used by the synthetic media table and the specs.
   * Public-spec layout only; no codec data beyond the fourcc is claimed. */
  private[pipeline] def build(
      samples: Seq[Array[Byte]], syncSamples: Seq[Int],
      width: Int, height: Int, timescale: Long, duration: Long,
      codec: String = "avc1"): Array[Byte] = {
    require(codec.length == 4, s"codec fourcc must be 4 chars: '$codec'")
    def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val total = 8 + payload.map(_.length).sum
      val bb = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
      bb.putInt(total).put(tpe.getBytes("ISO-8859-1"))
      payload.foreach(bb.put)
      bb.array()
    }
    def u32a(vs: Long*): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.BIG_ENDIAN)
      vs.foreach(v => bb.putInt(v.toInt))
      bb.array()
    }
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"), u32a(0), "isom".getBytes("ISO-8859-1"))
    val mdatPayload = samples.flatten.toArray
    val mdat = box("mdat", mdatPayload)
    val mdatDataStart = ftyp.length + 8L // samples start right after mdat header

    val mvhd = box("mvhd", u32a(0, 0, 0, timescale, duration),
      u32a(0x00010000L, 0x0100, 0), // rate, volume+reserved, reserved
      u32a(0, 0), // reserved
      u32a(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L), // matrix
      u32a(0, 0, 0, 0, 0, 0), // predefined
      u32a(2)) // next track id
    val tkhd = box("tkhd", u32a(0x00000007L, 0, 0, 1, 0, duration),
      u32a(0, 0, 0, 0), // reserved, layer/group, volume/reserved... (packed)
      u32a(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L),
      u32a(width.toLong << 16, height.toLong << 16))
    val mdhd = box("mdhd", u32a(0, 0, 0, timescale, duration), u32a(0x55c40000L))
    val hdlr = box("hdlr", u32a(0, 0), "vide".getBytes("ISO-8859-1"),
      u32a(0, 0, 0), Array[Byte](0))
    val stsdEntry = box(codec, new Array[Byte](78)) // fourcc + reserved body
    val stsd = box("stsd", u32a(0, 1), stsdEntry)
    val stts = box("stts", u32a(0, 1, samples.length.toLong, 1))
    val stss = box("stss", u32a(0, syncSamples.length.toLong),
      u32a(syncSamples.map(_.toLong): _*))
    val stsc = box("stsc", u32a(0, 1, 1, samples.length.toLong, 1))
    val stsz = box("stsz", u32a(0, 0, samples.length.toLong),
      u32a(samples.map(_.length.toLong): _*))
    val stco = box("stco", u32a(0, 1, mdatDataStart))
    val stbl = box("stbl", stsd, stts, stss, stsc, stsz, stco)
    val vmhd = box("vmhd", u32a(1, 0))
    val minf = box("minf", vmhd, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }
}
