package graft.pipeline

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Perceptual audio fingerprinting (Haitsma–Kalker 2002 energy-band sign
 * construction, public knowledge — "A Highly Robust Audio Fingerprint
 * System", miniaturized to one 64-bit signature per clip): decode →
 * mono PCM → 17 equal time slices × 5 log-spaced frequency bands
 * (300–2000 Hz, Goertzel probes at absolute frequencies so a resampled
 * copy probes the SAME spectral content) → per-slice band-energy
 * normalization (gain invariance) → the HK double-difference sign bit
 * per (slice, band) transition: bit(t,b) = [(E(t,b)−E(t,b+1)) −
 * (E(t−1,b)−E(t−1,b+1))] > 0 over t=1..16, b=0..3 → 64 bits.
 *
 * Re-encoded (bit-depth squashed, container-swapped) and resampled
 * copies of a clip keep their coarse time×frequency energy ridges, so
 * they land within a small Hamming distance while unrelated clips sit
 * near 32 — which plugs audio dedup straight into the SAME 8-band
 * Hamming join the image pHash tier uses ([[Dedup.hammingBandPairs]]):
 * candidates from 8-bit band collisions, never all-pairs. This completes
 * the media-dedup matrix: text simhash / image pHash / audio fingerprint
 * all share one banded join and one persisted-index lifecycle.
 *
 * Scale: the hash is a codegen'd static call per row (decode included —
 * one in-memory AudioSystem decode, no shared state), a narrow
 * projection over the binary column; fingerprinting reads at most the
 * first [[AudioPhashAlgos.MaxSamples]] mono samples (~2 min at 8 kHz),
 * the HK paper's point being that a few seconds of audio identifies the
 * clip. Undecodable or too-short/silent bytes hash to NULL and drop out
 * of every join.
 */
object AudioPhash {

  /** 64-bit perceptual fingerprint of an audio binary column (NULL when
   * the bytes don't decode, are shorter than ~1/8 s, or are silent). */
  def audioPhash(data: Column): Column =
    Bridge.column(AudioPhashExpression(Bridge.expression(data)))

  /** Near-duplicate audio pairs (id_a, id_b, hamming ≤ maxHamming) via
   * the shared 8×8-bit Hamming band join — Hamming ≤ 7 caught exactly by
   * pigeonhole, which covers bit-depth re-encodes and clean resamples;
   * harsher transforms still collide on a surviving band. */
  def nearDups(df: DataFrame, idCol: Column, dataCol: Column,
      maxHamming: Int = 12): DataFrame = {
    // no isNotNull pre-filter: a pushed-down filter would re-evaluate the
    // decode per row (Filter(isnotnull(hash)) below Project(hash) — two
    // evals in one stage); null sigs are harmless downstream because a
    // null band bucket never equi-joins, so undecodable rows yield no pairs
    val base = df.select(idCol.as("id"), audioPhash(dataCol).as("sig"))
    Dedup.hammingBandPairs(base, maxHamming, nBands = 8)
  }

  /** Decoded-feature cache, same lifecycle as [[Phash.buildIndex]]: decode
   * each clip ONCE into a persisted (id, sig) parquet table so every
   * dedup/search after the first runs over 8-byte signatures, not bytes. */
  def buildIndex(df: DataFrame, idCol: Column, dataCol: Column, path: String): Unit =
    df.select(idCol.cast("long").as("id"), audioPhash(dataCol).as("sig"))
      // the repartition materializes sig before the null cut, so the filter
      // tests the shuffled 8-byte value instead of re-running the decode
      // (and evens out the index's file sizes as a side effect)
      .repartition(col("id"))
      .where(col("sig").isNotNull)
      .write.mode("overwrite").parquet(path)

  /** O(batch) append with the standard idempotence contract: already-
   * indexed ids anti-join away BEFORE the decode projection, so a retried
   * batch costs an id scan, not a re-decode. */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: Column, dataCol: Column): Unit = {
    val indexed = spark.read.parquet(path).select(col("id"))
    batch.select(idCol.cast("long").as("id"), dataCol.as("graft_data"))
      .join(indexed, Seq("id"), "left_anti")
      .select(col("id"), audioPhash(col("graft_data")).as("sig"))
      .repartition(col("id")) // single decode: filter above the exchange
      .where(col("sig").isNotNull)
      .write.mode("append").parquet(path)
  }

  /** [[nearDups]] over the persisted signatures — no decode at all. */
  def nearDupsFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      maxHamming: Int = 12): DataFrame =
    Dedup.hammingBandPairs(spark.read.parquet(path), maxHamming, nBands = 8)

  /** Batch search: decode the query clips (only), band-join their
   * signatures against the index — (id_q, id_c, hamming). */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, idCol: Column, dataCol: Column,
      maxHamming: Int = 12): DataFrame = {
    // undecodable queries carry a null sig and match nothing — no
    // pre-filter, for the same single-eval reason as [[nearDups]]
    val q = queries.select(idCol.cast("long").as("id"), audioPhash(dataCol).as("sig"))
    Dedup.hammingBandJoin(q, spark.read.parquet(path), maxHamming, nBands = 8)
  }
}

object AudioPhashAlgos {

  /** Band-center probe frequencies, log-spaced over the HK 300–2000 Hz
   * range (speech/music energy lives here and every consumer codec
   * preserves it). Absolute Hz — resampling does not move them. */
  val BandCenters: Array[Double] =
    Array.tabulate(5)(b => 300.0 * math.pow(2000.0 / 300.0, b / 4.0))

  private val Slices = 17 // 16 slice transitions x 4 band transitions = 64 bits
  private val MinSamples = 1024
  val MaxSamples: Int = 1 << 20

  /** One-slot per-thread memo: Catalyst re-evaluates the hash within a
   * stage (a join's inferred isnotnull constraint pushes below the Project
   * as Filter(isnotnull(hash)) — two decodes per row in one codegen
   * stage); the repeat eval sees identical bytes back-to-back on the same
   * thread, so a content-keyed single entry turns it into a memcmp. The
   * stored key is a private clone — a caller-reused buffer can't alias it. */
  private val memo = new ThreadLocal[(Array[Byte], java.lang.Long)]

  /** 64-bit HK fingerprint, boxed so NULL can signal no perceptual
   * identity (undecodable / too short / silent / rate below Nyquist of
   * the top probe). */
  def aphash64(data: Array[Byte]): java.lang.Long = {
    if (data == null || data.length == 0) return null
    val m = memo.get()
    if (m != null && java.util.Arrays.equals(m._1, data)) return m._2
    val r = aphash64Compute(data)
    memo.set((data.clone(), r))
    r
  }

  private def aphash64Compute(data: Array[Byte]): java.lang.Long = {
    val decoded = try decodeMonoPcm(data) catch { case _: Exception => null }
    if (decoded == null) return null
    val (samples, rate) = decoded
    val n = samples.length
    if (n < MinSamples || rate < 2.2 * BandCenters.last) return null
    // per-slice band energies: 3 Goertzel probes around each center
    // (±6% smooths spectral leakage across slice lengths), normalized
    // within the slice for gain invariance
    val e = Array.ofDim[Double](Slices, BandCenters.length)
    var silent = true
    var t = 0
    while (t < Slices) {
      val from = (t.toLong * n / Slices).toInt
      val until = ((t + 1).toLong * n / Slices).toInt
      var b = 0
      var tot = 0.0
      while (b < BandCenters.length) {
        val c = BandCenters(b)
        val p = goertzelPower(samples, from, until, c * 0.94 / rate) +
          goertzelPower(samples, from, until, c / rate) +
          goertzelPower(samples, from, until, c * 1.06 / rate)
        e(t)(b) = p
        tot += p
        b += 1
      }
      if (tot > 1e-12) {
        silent = false
        b = 0
        while (b < BandCenters.length) { e(t)(b) /= tot; b += 1 }
      }
      t += 1
    }
    if (silent) return null
    // HK double-difference signs: robust to global gain (normalized), to
    // per-slice gain drift (difference across bands) and to spectral tilt
    // (difference across time)
    var hash = 0L
    t = 1
    while (t < Slices) {
      var b = 0
      while (b < BandCenters.length - 1) {
        val d = (e(t)(b) - e(t)(b + 1)) - (e(t - 1)(b) - e(t - 1)(b + 1))
        if (d > 0) hash |= 1L << ((t - 1) * (BandCenters.length - 1) + b)
        b += 1
      }
      t += 1
    }
    hash
  }

  /** Goertzel power of samples[from,until) at normalized frequency
   * `freq` (cycles per sample), scaled by 1/len so slice length cancels. */
  private def goertzelPower(s: Array[Double], from: Int, until: Int,
      freq: Double): Double = {
    val w = 2.0 * math.Pi * freq
    val coeff = 2.0 * math.cos(w)
    var s0 = 0.0
    var s1 = 0.0
    var s2 = 0.0
    var i = from
    while (i < until) {
      s0 = s(i) + coeff * s1 - s2
      s2 = s1
      s1 = s0
      i += 1
    }
    val len = until - from
    if (len <= 0) 0.0
    else (s1 * s1 + s2 * s2 - coeff * s1 * s2) / (len.toDouble * len.toDouble)
  }

  /** Real decode: any AudioSystem-readable container/encoding → 16-bit
   * signed LE PCM at the source rate → channel-averaged mono doubles in
   * [-1, 1], capped at [[MaxSamples]]. Throws on undecodable bytes. */
  private[pipeline] def decodeMonoPcm(data: Array[Byte]): (Array[Double], Float) = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val base = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(data))
    var pcm: javax.sound.sampled.AudioInputStream = null
    try {
      val bf = base.getFormat
      val ch = math.max(bf.getChannels, 1)
      val target = new AudioFormat(bf.getSampleRate, 16, ch, true, false)
      pcm = AudioSystem.getAudioInputStream(target, base)
      val out = new scala.collection.mutable.ArrayBuffer[Double](8192)
      val frameBytes = 2 * ch
      val buf = new Array[Byte](4096 - 4096 % frameBytes)
      val pending = new Array[Byte](frameBytes)
      var pendingLen = 0
      var read = pcm.read(buf)
      while (read > 0 && out.length < MaxSamples) {
        var i = 0
        // stitch a frame split across read() boundaries
        if (pendingLen > 0) {
          val need = frameBytes - pendingLen
          if (read >= need) {
            System.arraycopy(buf, 0, pending, pendingLen, need)
            var acc = 0.0
            var c = 0
            while (c < ch) {
              acc += ((pending(2 * c) & 0xff) | (pending(2 * c + 1) << 8)).toShort
              c += 1
            }
            out += acc / (ch * 32768.0)
            pendingLen = 0
            i = need
          } else {
            System.arraycopy(buf, 0, pending, pendingLen, read)
            pendingLen += read
            i = read
          }
        }
        while (i + frameBytes <= read && out.length < MaxSamples) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            acc += ((buf(i + 2 * c) & 0xff) | (buf(i + 2 * c + 1) << 8)).toShort
            c += 1
          }
          out += acc / (ch * 32768.0)
          i += frameBytes
        }
        if (i < read) {
          System.arraycopy(buf, i, pending, 0, read - i)
          pendingLen = read - i
        }
        read = pcm.read(buf)
      }
      (out.toArray, bf.getSampleRate)
    } finally { if (pcm != null) pcm.close() else base.close() }
  }
}

/** HK audio fingerprint as one codegen'd static call per row; NULL on
 * bytes with no perceptual identity. */
case class AudioPhashExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else AudioPhashAlgos.aphash64(v.asInstanceOf[Array[Byte]])
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("graftAphash")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        java.lang.Long $boxed = graft.pipeline.AudioPhashAlgos.aphash64(${c.value});
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
      }""")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
