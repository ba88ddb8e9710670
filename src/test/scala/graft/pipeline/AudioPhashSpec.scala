package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Haitsma–Kalker audio fingerprint: invariance under re-encode/resample,
 * separation of unrelated clips, NULL degenerates, the shared Hamming
 * band join, and the persisted-index lifecycle — the audio column of the
 * media-dedup matrix (text simhash / image pHash / audio HK). */
class AudioPhashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def media(lo: Int, hi: Int) =
    Multimodal.audioDupTable(spark.range(lo, hi).toDF("doc_id"), "doc_id")

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("identical bytes hash identically; resample and 8-bit AIFF re-encode stay near") {
    (1L to 12L).foreach { seed =>
      val orig = Multimodal.syntheticToneWav(seed)
      val h0 = AudioPhashAlgos.aphash64(orig)
      assert(h0 != null)
      assert(AudioPhashAlgos.aphash64(orig.clone()) == h0)
      // 8000 -> 12000 Hz linear resample: absolute-frequency probes keep
      // the band energies, measured hamming <= 3 across seeds
      val rs = AudioPhashAlgos.aphash64(Multimodal.resampleWav(orig, 12000f))
      // 16-bit WAV -> 8-bit AIFF: depth squash + container/endianness swap
      val re = AudioPhashAlgos.aphash64(Multimodal.reencodeAiff8(orig))
      assert(hamming(h0, rs) <= 6, s"seed $seed resample hamming ${hamming(h0, rs)}")
      assert(hamming(h0, re) <= 6, s"seed $seed re-encode hamming ${hamming(h0, re)}")
    }
  }

  test("unrelated clips separate: hamming near the random-bit expectation") {
    val hashes = (1L to 24L).map(s =>
      AudioPhashAlgos.aphash64(Multimodal.syntheticToneWav(s)).longValue)
    val dists = for (i <- hashes.indices; j <- hashes.indices if i < j)
      yield hamming(hashes(i), hashes(j))
    assert(dists.min > 12, s"closest unrelated pair at ${dists.min}")
    assert(dists.sorted.apply(dists.size / 2) >= 24)
  }

  test("garbage, empty, too-short and silent bytes hash to NULL") {
    assert(AudioPhashAlgos.aphash64(null) == null)
    assert(AudioPhashAlgos.aphash64(Array.emptyByteArray) == null)
    assert(AudioPhashAlgos.aphash64("not audio at all".getBytes("UTF-8")) == null)
    // a 256-sample clip (the telemetry fixture) has no perceptual identity
    assert(AudioPhashAlgos.aphash64(Multimodal.syntheticWav(7L)) == null)
    // digital silence decodes fine but carries no band energy
    val silent = {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](8192 * 2)), fmt, 8192L)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    assert(AudioPhashAlgos.aphash64(silent) == null)
    val df = Seq(
      (1L, Multimodal.syntheticToneWav(3L)),
      (2L, "garbage".getBytes("UTF-8"))).toDF("id", "data")
    assert(df.select(AudioPhash.audioPhash(col("data")).as("h"))
      .where(col("h").isNull).count() == 1)
  }

  test("nearDups finds planted resample/re-encode copies through the band join — no cartesian") {
    val pairs = AudioPhash.nearDups(media(0, 40), col("id"), col("data"))
    assert(!pairs.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    val got = pairSet(pairs)
    // both variant families sit at hamming <= 6: inside the 8-band
    // exact-recall zone, every planted copy MUST be found
    (0 until 40).foreach { id =>
      if (id % 5 == 0) assert(got.contains(id.toLong -> (id + 1000000L)),
        s"resampled copy of $id not found")
      if (id % 7 == 0) assert(got.contains(id.toLong -> (id + 2000000L)),
        s"re-encoded copy of $id not found")
    }
    // precision: no unrelated original pairs collide
    assert(!got.exists { case (a, b) => a < 1000000L && b < 1000000L })
  }

  test("index dedup equals the direct decode path; append == rebuild; retry no-op") {
    val m = media(0, 30)
    val idx = java.nio.file.Files.createTempDirectory("graft_aphidx").toString
    AudioPhash.buildIndex(m, col("id"), col("data"), idx)
    assert(pairSet(AudioPhash.nearDupsFromIndex(spark, idx)) ==
      pairSet(AudioPhash.nearDups(m, col("id"), col("data"))))

    val idx2 = java.nio.file.Files.createTempDirectory("graft_aphidx2").toString
    AudioPhash.buildIndex(media(0, 15), col("id"), col("data"), idx2)
    AudioPhash.appendToIndex(spark, idx2, media(15, 30), col("id"), col("data"))
    val appended = spark.read.parquet(idx2).as[(Long, Long)].collect().toSet
    assert(appended == spark.read.parquet(idx).as[(Long, Long)].collect().toSet)
    AudioPhash.appendToIndex(spark, idx2, media(15, 30), col("id"), col("data"))
    val retried = spark.read.parquet(idx2).as[(Long, Long)].collect()
    assert(retried.length == retried.toSet.size && retried.toSet == appended)
    // append decodes ABOVE the anti-join (no re-fingerprint of old ids)
    val indexed = spark.read.parquet(idx2).select(col("id"))
    val appendPlan = media(0, 5).select(col("id"), col("data").as("graft_data"))
      .join(indexed, Seq("id"), "left_anti")
      .select(col("id"), AudioPhash.audioPhash(col("graft_data")).as("sig"))
      .queryExecution.optimizedPlan
    val joinNode = appendPlan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joinNode.isDefined)
    assert(!joinNode.get.toString.toLowerCase.contains("audiophash"),
      "decode was pushed below the anti-join")
  }

  test("searchIndex finds originals for re-encoded queries; codegen fallback disabled") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val idx = java.nio.file.Files.createTempDirectory("graft_aphidx3").toString
      AudioPhash.buildIndex(media(0, 30).where(col("id") < 1000000L),
        col("id"), col("data"), idx)
      val queries = media(0, 30).where(col("id") >= 2000000L)
      val hits = AudioPhash.searchIndex(spark, idx, queries, col("id"), col("data"))
        .where(col("id_q") === col("id_c") + 2000000L)
        .select("id_q").as[Long].collect().toSet
      val expected = (0 until 30).filter(_ % 7 == 0).map(_ + 2000000L).toSet
      assert(hits == expected, s"missing ${expected -- hits}")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("SQL faces: audio_phash / image_phash / cdc_chunks callable from spark.sql") {
    graft.functions.Registry.registerAll(spark)
    Seq((1L, Multimodal.syntheticToneWav(3L), Multimodal.syntheticPng(3L)))
      .toDF("id", "wav", "png").createOrReplaceTempView("graft_sql_media")
    val row = spark.sql(
      """SELECT audio_phash(wav) AS ah, image_phash(png) AS ih,
        |       audio_phash(png) AS ah_bad, image_phash(wav) AS ih_bad,
        |       cdc_chunks(wav) AS ch, cdc_chunks(wav, 64, 6, 512) AS ch_small
        |FROM graft_sql_media""".stripMargin).collect()(0)
    assert(row.getLong(0) == AudioPhashAlgos.aphash64(Multimodal.syntheticToneWav(3L)).longValue)
    assert(row.getLong(1) == PhashAlgos.phash64(Multimodal.syntheticPng(3L)).longValue)
    assert(row.isNullAt(2) && row.isNullAt(3)) // wrong container → NULL, not garbage
    val wavLen = Multimodal.syntheticToneWav(3L).length.toLong
    def totalLen(i: Int) = row.getSeq[org.apache.spark.sql.Row](i).map(_.getAs[Long]("len")).sum
    assert(totalLen(4) == wavLen && totalLen(5) == wavLen) // chunks tile the payload
    assert(row.getSeq[org.apache.spark.sql.Row](5).size >= row.getSeq[org.apache.spark.sql.Row](4).size)
  }
}
