package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WebDataset tar-shard export/ingest: byte-deterministic writes, exact
 * round-trip, adjacency of sample parts, strict-parse quarantine. */
class WdsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def fixture = Seq(
    (1L, "alpha beta gamma"),
    (2L, "düsseldorf café — unicode round trip"),
    (3L, ""),                       // empty doc survives as an empty .txt
    (4L, "four tokens in here"),
    (42L, "the answer and some more words"))
    .toDF("id", "text")

  test("round-trip: every (key, text, meta) comes back exactly, manifest consistent") {
    val dir = tmp("graft_wds_rt")
    val manifest = Wds.write(fixture, col("id"), col("text"),
      size(split(trim(col("text")), "\\s+")), dir, 2)
    val (rows, bad) = Wds.read(spark, dir)
    assert(bad.count() == 0)
    val got = rows.select(col("key"), col("text"), col("meta"))
      .as[(String, String, String)].collect().sortBy(_._1)
    assert(got.length == 5)
    val expected = fixture.as[(Long, String)].collect().sortBy(r => Wds.key(r._1))
    got.zip(expected).foreach { case ((k, t, m), (id, text)) =>
      assert(k == Wds.key(id))
      assert(t == text, s"text diverged for id $id")
      assert(m.contains(s""""id":$id"""), m)
    }
    // manifest (re-read from the tars) accounts every doc once
    assert(manifest.agg(sum(col("docs"))).head().getLong(0) == 5L)
    // shard assignment is the writeShards md5 recipe
    val shards = rows.select(col("key"), col("shard")).as[(String, Int)]
      .collect().toMap
    expected.foreach { case (id, _) =>
      val e = graft.pipeline.Curation.hashBucketN(lit(id), 2)
      val want = fixture.sparkSession.range(1).select(e).head().getLong(0).toInt
      assert(shards(Wds.key(id)) == want, s"shard recipe diverged for $id")
    }
  }

  test("byte-deterministic: two writes of the same frame are identical files") {
    val (d1, d2) = (tmp("graft_wds_d1"), tmp("graft_wds_d2"))
    Wds.write(fixture, col("id"), col("text"), lit(1L), d1, 2)
    Wds.write(fixture, col("id"), col("text"), lit(1L), d2, 2)
    val f1 = new java.io.File(d1).listFiles().filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName)
    val f2 = new java.io.File(d2).listFiles().filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName)
    assert(f1.map(_.getName).toSeq == f2.map(_.getName).toSeq && f1.nonEmpty)
    f1.zip(f2).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(a.toPath),
        java.nio.file.Files.readAllBytes(b.toPath)),
        s"${a.getName} bytes diverged between runs")
    }
  }

  test("webdataset sample contract: .txt and .json adjacent per key, keys ordered by content hash") {
    val dir = tmp("graft_wds_adj")
    Wds.write(fixture, col("id"), col("text"), lit(1L), dir, 1)
    val in = new java.io.FileInputStream(s"$dir/shard-000000.tar")
    val names = try TarAlgos.entries(in).map(_._1).toVector finally in.close()
    assert(names.length == 10)
    names.grouped(2).foreach { case Vector(a, b) =>
      assert(a.endsWith(".txt") && b.endsWith(".json"))
      assert(a.dropRight(4) == b.dropRight(5), s"parts not adjacent: $a / $b")
    }
    // within-shard order is the content-hash pseudo-shuffle, not id order
    val keys = names.map(_.split('.').head).distinct
    val byOrd = fixture.select(col("id"))
      .withColumn("o", graft.pipeline.Curation.hashFraction(
        concat(col("id").cast("string"), lit("#ord"))))
      .orderBy(col("o"), col("id")).as[(Long, Double)].collect()
      .map(r => Wds.key(r._1))
    assert(keys.toSeq == byOrd.toSeq, "within-shard order diverged from recipe")
  }

  test("strict parse: corrupt tar quarantines whole-file, good shards still read") {
    val dir = tmp("graft_wds_bad")
    Wds.write(fixture, col("id"), col("text"), lit(1L), dir, 2)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-000099.tar"),
      "this is not a tar archive at all, not even close padding padding".getBytes)
    val (rows, bad) = Wds.read(spark, dir)
    assert(bad.count() == 1)
    assert(bad.head().getString(0).contains("shard-000099"))
    assert(rows.count() == 5, "good shards must still read")
    // truncated real tar (cut mid-content) also quarantines
    val good = new java.io.File(dir).listFiles()
      .filter(_.getName == "shard-000000.tar").head
    val bytes = java.nio.file.Files.readAllBytes(good.toPath)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-000098.tar"),
      java.util.Arrays.copyOf(bytes, (bytes.length / 2).max(600)))
    val (_, bad2) = Wds.read(spark, dir)
    assert(bad2.count() == 2)
  }

  test("sidecar meta passthrough: provenance rides the json with exact escaping") {
    val dir = tmp("graft_wds_meta")
    val df = Seq(
      (1L, "alpha", "https://a.example.com/q?x=\"1\"&y=\\z", "crawl"),
      (2L, "beta words", null: String, "upload"))
      .toDF("id", "text", "url", "source")
    Wds.write(df, col("id"), col("text"),
      size(split(trim(col("text")), "\\s+")), dir, 1,
      metaCols = Seq("url" -> col("url"), "source" -> col("source")))
    val (rows, bad) = Wds.read(spark, dir)
    assert(bad.count() == 0)
    val back = rows.select(col("key"),
        get_json_object(col("meta"), "$.url").as("u"),
        get_json_object(col("meta"), "$.source").as("s"),
        get_json_object(col("meta"), "$.tok").as("t"))
      .as[(String, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // quotes and backslashes in the url survive the json round trip
    assert(back(Wds.key(1L)) ==
      (("https://a.example.com/q?x=\"1\"&y=\\z", "crawl", "1")))
    // NULL meta values are omitted (read back as json-null), fixed fields stay
    assert(back(Wds.key(2L)) == ((null, "upload", "2")))
    // metaCols must not shadow the fixed sidecar fields
    intercept[IllegalArgumentException] {
      Wds.write(df, col("id"), col("text"), lit(1L),
        tmp("graft_wds_shadow"), 1, metaCols = Seq("tok" -> col("url")))
    }
  }

  test("re-export truncates stale shards; duplicate ids fail loudly; empty export is empty") {
    val dir = tmp("graft_wds_guard")
    // 4-shard export leaves 4 tars; re-export into the SAME dir with 1
    // shard must not leak the old tars into the re-read manifest
    Wds.write(fixture, col("id"), col("text"), lit(1L), dir, 4)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".tar")) >= 2)
    val manifest = Wds.write(fixture, col("id"), col("text"), lit(1L), dir, 1)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".tar")) == 1)
    assert(manifest.agg(sum(col("docs"))).head().getLong(0) == 5L,
      "stale shards leaked into the manifest")
    // no in-progress temp files survive a successful commit
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_tmp")))
    // duplicate ids would silently merge into ONE WebDataset sample —
    // the export must refuse instead
    val dup = fixture.unionAll(Seq((42L, "a second row with the answer id"))
      .toDF("id", "text"))
    val e = intercept[org.apache.spark.SparkException] {
      Wds.write(dup, col("id"), col("text"), lit(1L), tmp("graft_wds_dup"), 1)
    }
    assert(e.getMessage.contains("duplicate id") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate id")), e.getMessage)
    // an empty frame exports to an empty-but-valid artifact (no crash)
    val emptyM = Wds.write(fixture.where(lit(false)), col("id"), col("text"),
      lit(1L), tmp("graft_wds_empty"), 2)
    assert(emptyM.count() == 0)
    // ...and reading a dir with no shards is an empty corpus, not an error
    val (r0, b0) = Wds.read(spark, tmp("graft_wds_none"))
    assert(r0.count() == 0 && b0.count() == 0)
  }

  test("tar codec property: random payloads round-trip; any truncation throws") {
    val rng = new scala.util.Random(20260816L)
    (1 to 12).foreach { round =>
      val entries = (0 until rng.nextInt(12) + 1).map { i =>
        val data = new Array[Byte](rng.nextInt(2000))
        rng.nextBytes(data)
        (f"sample$i%03d.ext${rng.nextInt(3)}", data)
      }
      val bos = new java.io.ByteArrayOutputStream()
      entries.foreach { case (n, d) => TarAlgos.addEntry(bos, n, d) }
      TarAlgos.finish(bos)
      val bytes = bos.toByteArray
      val back = TarAlgos.entries(
        new java.io.ByteArrayInputStream(bytes)).toVector
      assert(back.map(_._1) == entries.map(_._1), s"round $round names")
      back.zip(entries).foreach { case ((_, g), (_, w)) =>
        assert(java.util.Arrays.equals(g, w), s"round $round bytes")
      }
      // truncating ANYWHERE inside the archive (before the terminator)
      // throws — never a silent partial parse the quarantine would miss
      val cut = rng.nextInt(bytes.length - 1024) + 1
      intercept[java.io.IOException] {
        TarAlgos.entries(new java.io.ByteArrayInputStream(
          java.util.Arrays.copyOf(bytes, cut))).toVector
      }
    }
  }

  test("tar codec: gnu tar compatible enough for a plain java untar of our own output") {
    // self-consistency of the codec on adversarial names/sizes
    val bos = new java.io.ByteArrayOutputStream()
    val payloads = Seq(
      "a.txt" -> Array.fill[Byte](511)(7),     // size % 512 = 511 → 1 pad
      "b.txt" -> Array.fill[Byte](512)(8),     // exact block
      "c.txt" -> Array.emptyByteArray)         // empty
    payloads.foreach { case (n, d) => TarAlgos.addEntry(bos, n, d) }
    TarAlgos.finish(bos)
    val back = TarAlgos.entries(
      new java.io.ByteArrayInputStream(bos.toByteArray)).toVector
    assert(back.map(_._1) == payloads.map(_._1))
    back.zip(payloads).foreach { case ((_, got), (_, want)) =>
      assert(java.util.Arrays.equals(got, want))
    }
  }
}
