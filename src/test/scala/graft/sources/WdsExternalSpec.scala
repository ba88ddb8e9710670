package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Third-party WebDataset ingest (VERDICT r17 #1/#2/#3/#4/#7): the tar
 * fixtures under src/test/resources/wds/ were written by python's
 * `tarfile` — the library the actual webdataset writer uses — in PAX,
 * GNU and USTAR-prefix conventions, so these specs pin compat against
 * real third-party bytes, not our own writer's dialect. Plus: header
 * checksum strictness, the shard-set manifest, epoch reshuffle and
 * gzip shards. */
class WdsExternalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val longKey = "sample-" + "x" * 120

  private def fixtureBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/wds/$name")
    require(in != null, s"missing test resource /wds/$name")
    try in.readAllBytes() finally in.close()
  }

  private def entriesOf(name: String): Vector[(String, Array[Byte])] = {
    val in = new java.io.ByteArrayInputStream(fixtureBytes(name))
    TarAlgos.entries(in).toVector
  }

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("PAX fixture: 'x' headers fold into long names, directories skipped, no PaxHeaders samples") {
    val names = entriesOf("pax_shard.tar").map(_._1)
    // exactly the 6 real file entries — no data/ directory row, no
    // ././@PaxHeader rows, and the >100-char key comes back whole
    assert(names == Vector(
      "data/00001.txt", "data/00001.json",
      s"$longKey.txt", s"$longKey.json",
      "data/00003.txt", "data/00003.json"), names)
    val byName = entriesOf("pax_shard.tar").toMap
    assert(new String(byName(s"$longKey.txt"), "UTF-8") == "long key sample")
    assert(new String(byName("data/00003.txt"), "UTF-8") == "unicode café content")
    // the sample grouping sees 3 samples with txt+json pairs
    val samples = TarAlgos.samples(entriesOf("pax_shard.tar").iterator).toVector
    assert(samples.map(_._1) == Vector("data/00001", longKey, "data/00003"))
    assert(samples.forall(s => s._2.keySet == Set("txt", "json")))
  }

  test("GNU fixture: 'L' longname entries resolve, old-gnu magic accepted") {
    val names = entriesOf("gnu_shard.tar").map(_._1)
    assert(names == Vector(
      "00001.txt", "00001.json", s"$longKey.txt", s"$longKey.json"), names)
    val byName = entriesOf("gnu_shard.tar").toMap
    assert(new String(byName(s"$longKey.txt"), "UTF-8") == "gnu long sample")
  }

  test("USTAR fixture: prefix field splices back into the full path") {
    val deep = (0 until 18).map(i => f"dir$i%03d").mkString("/")
    val names = entriesOf("ustar_prefix_shard.tar").map(_._1)
    assert(names == Vector(s"$deep/k1.txt", s"$deep/k1.json"), names)
  }

  test("exotic fixture: global 'g' header and symlink are consumed, never samples") {
    val names = entriesOf("exotic_shard.tar").map(_._1)
    assert(names == Vector("00001.txt", "00001.json"), names)
  }

  test("third-party shards ingest through Wds.read as real samples") {
    val dir = tmp("graft_wds_ext")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-000000.tar"),
      fixtureBytes("pax_shard.tar"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "train-part-7.tar"), // non-graft name
      fixtureBytes("gnu_shard.tar"))
    val (rows, bad) = Wds.read(spark, dir)
    assert(bad.count() == 0)
    val got = rows.select(col("shard"), col("key"), col("text"))
      .as[(Int, String, String)].collect().toSet
    assert(got == Set(
      (0, "data/00001", "alpha beta"),
      (0, longKey, "long key sample"),
      (0, "data/00003", "unicode café content"),
      (-1, "00001", "gnu alpha"),          // no shard-N name → shard -1
      (-1, longKey, "gnu long sample")), got)
  }

  test("gzipped third-party shard: sniffed from the magic, not the name") {
    val dir = tmp("graft_wds_extgz")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-000003.tar.gz"),
      fixtureBytes("gz_shard.tar.gz"))
    val (rows, bad) = Wds.read(spark, dir)
    assert(bad.count() == 0)
    val got = rows.select(col("shard"), col("key"), col("text"), col("pos"))
      .as[(Int, String, String, Int)].collect().sortBy(_._4)
    assert(got.toSeq == Seq(
      (3, "00001", "gz alpha beta", 0), (3, "00002", "gz gamma", 1)))
  }

  test("header checksum is verified: a flipped name byte quarantines the file") {
    val bos = new java.io.ByteArrayOutputStream()
    TarAlgos.addEntry(bos, "victim.txt", "payload".getBytes("UTF-8"))
    TarAlgos.finish(bos)
    val bytes = bos.toByteArray
    bytes(0) = 'X' // name byte flipped, checksum now stale
    val e = intercept[java.io.IOException] {
      TarAlgos.entries(new java.io.ByteArrayInputStream(bytes)).toVector
    }
    assert(e.getMessage.contains("checksum"), e.getMessage)
    // and our own untouched output still passes the verifier
    val ok = TarAlgos.entries(new java.io.ByteArrayInputStream(
      bos.toByteArray)).toVector
    assert(ok.map(_._1) == Vector("victim.txt"))
  }

  private def fixture = Seq(
    (1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "zeta"),
    (4L, "four tokens in here"), (42L, "the answer and some more words"))
    .toDF("id", "text")

  test("manifest guards the shard set: a deleted shard fails the read loudly") {
    val dir = tmp("graft_wds_manifest")
    Wds.write(fixture, col("id"), col("text"), lit(1L), dir, 4)
    val mf = java.nio.file.Paths.get(dir, Wds.ManifestName)
    assert(java.nio.file.Files.exists(mf), "manifest sidecar missing")
    val tars = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    assert(tars.length >= 2)
    // simulate a crashed export: one committed shard vanished
    assert(tars.head.delete())
    val e = intercept[java.io.IOException] { Wds.read(spark, dir) }
    assert(e.getMessage.contains("INCOMPLETE") &&
      e.getMessage.contains(tars.head.getName), e.getMessage)
    // a foreign tar in the dir quarantines per-file instead of throwing
    val dir2 = tmp("graft_wds_manifest2")
    Wds.write(fixture, col("id"), col("text"), lit(1L), dir2, 2)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir2, "shard-000099.tar"),
      fixtureBytes("gnu_shard.tar"))
    val (rows, bad) = Wds.read(spark, dir2)
    assert(rows.count() == 5, "vouched shards must still read")
    assert(bad.count() == 1 && bad.head().getString(1).contains("manifest"))
  }

  test("epoch reshuffle: same membership per shard, different within-shard order; epoch 0 unchanged") {
    val (d0, d1, d2) = (tmp("graft_wds_e0"), tmp("graft_wds_e1"), tmp("graft_wds_e2"))
    Wds.write(fixture, col("id"), col("text"), lit(1L), d0, 1)
    Wds.write(fixture, col("id"), col("text"), lit(1L), d1, 1, epoch = 1)
    Wds.write(fixture, col("id"), col("text"), lit(1L), d2, 1, epoch = 2)
    def order(dir: String): Seq[String] = {
      val (rows, _) = Wds.read(spark, dir)
      rows.orderBy(col("pos")).select(col("key")).as[String].collect().toSeq
    }
    val (o0, o1, o2) = (order(d0), order(d1), order(d2))
    assert(o0.toSet == o1.toSet && o1.toSet == o2.toSet,
      "epoch must never change membership")
    assert(o1 != o2 && o0 != o1, "epochs must reshuffle the within-shard order")
    // epoch 1 replays the documented recipe: md5(id + '#ord#e1') ascending
    val want = fixture.select(col("id"))
      .withColumn("o", graft.pipeline.Curation.hashFraction(
        concat(col("id").cast("string"), lit("#ord#e1"))))
      .orderBy(col("o"), col("id")).as[(Long, Double)].collect()
      .map(r => Wds.key(r._1)).toSeq
    assert(o1 == want, "epoch order recipe diverged")
  }

  test("gzip shards: round-trip, byte-deterministic, manifest-vouched") {
    val dir = tmp("graft_wds_gz")
    val manifest = Wds.write(fixture, col("id"), col("text"),
      size(split(trim(col("text")), "\\s+")), dir, 2, compress = true)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith(".")).sorted
    assert(files.nonEmpty && files.forall(_.endsWith(".tar.gz")), files.toSeq)
    assert(manifest.agg(sum(col("docs"))).head().getLong(0) == 5L)
    val (rows, bad) = Wds.read(spark, dir)
    assert(bad.count() == 0)
    assert(rows.select(col("text")).as[String].collect().toSet ==
      fixture.select(col("text")).as[String].collect().toSet)
    // determinism: a second export produces identical .tar.gz bytes
    val dir2 = tmp("graft_wds_gz2")
    Wds.write(fixture, col("id"), col("text"),
      size(split(trim(col("text")), "\\s+")), dir2, 2, compress = true)
    files.foreach { f =>
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, f)),
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir2, f))),
        s"$f bytes diverged between runs")
    }
  }

  test("pos column: within-shard parse position matches the pseudo-shuffle recipe") {
    val dir = tmp("graft_wds_pos")
    Wds.write(fixture, col("id"), col("text"), lit(1L), dir, 1)
    val (rows, _) = Wds.read(spark, dir)
    val got = rows.orderBy(col("pos")).select(col("key")).as[String].collect()
    val want = fixture.select(col("id"))
      .withColumn("o", graft.pipeline.Curation.hashFraction(
        concat(col("id").cast("string"), lit("#ord"))))
      .orderBy(col("o"), col("id")).as[(Long, Double)].collect()
      .map(r => Wds.key(r._1))
    assert(got.toSeq == want.toSeq)
  }

  test("writeByTokens sizes the tar count from the token budget") {
    val toks = size(split(trim(col("text")), "\\s+"))
    // fixture token mass = 3+2+1+4+6 = 16 → budget 6 → ceil(16/6) = 3
    val d1 = tmp("graft_wds_bt1")
    Wds.writeByTokens(fixture, col("id"), col("text"), toks, d1, 6L)
    def tars(d: String) = new java.io.File(d).listFiles()
      .count(_.getName.endsWith(".tar"))
    // ≤ 3 assigned buckets can land fewer non-empty tars, never more
    assert(tars(d1) <= 3 && tars(d1) >= 1, tars(d1))
    val (rows, bad) = Wds.read(spark, d1)
    assert(bad.count() == 0 && rows.count() == 5)
    // a huge budget collapses to one tar carrying everything
    val d2 = tmp("graft_wds_bt2")
    val m2 = Wds.writeByTokens(fixture, col("id"), col("text"), toks, d2, 5000L)
    assert(tars(d2) == 1)
    assert(m2.agg(sum(col("docs"))).head().getLong(0) == 5L)
  }

  test("spool cleanup: no graft-wds-spool temp files survive a read") {
    val dir = tmp("graft_wds_clean")
    Wds.write(fixture, col("id"), col("text"), lit(1L), dir, 2)
    def spools() = Option(new java.io.File(
      System.getProperty("java.io.tmpdir")).listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("graft-wds-spool-"))
    val (rows, bad) = Wds.read(spark, dir)
    // exhaustive consumption AND an abandoned limit() both clean up
    rows.limit(1).collect()
    rows.collect()
    bad.collect()
    assert(spools().isEmpty, spools().map(_.getName).toSeq)
  }
}
