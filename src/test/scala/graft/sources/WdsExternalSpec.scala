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

  test("multi-extension samples group at the FIRST dot of the basename (webdataset spec)") {
    val samples = TarAlgos.samples(entriesOf("multiext_shard.tar").iterator).toVector
    assert(samples.map(_._1) == Vector("train/img00001", "train/img00002"),
      samples.map(_._1))
    assert(samples(0)._2.keySet == Set("input.txt", "output.json", "json"))
    assert(samples(1)._2.keySet == Set("input.txt", "output.json"))
    assert(new String(samples(0)._2("input.txt"), "UTF-8") == "first sample text")
    // directories in the path never truncate the key
    assert(TarAlgos.samples(Iterator(
      ("a.b/c" -> Array.emptyByteArray))).next()._1 == "a.b/c")
  }

  test("pax size override applies only to the file entry, never to a following metadata block") {
    // craft: x-header carrying size=7 for the next entry, then ANOTHER
    // x-header (its own content must read with its HEADER size, not 7),
    // then the file whose header says 0 but pax says 7
    def paxEntry(records: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      TarAlgos.addEntry(bos, "PaxHeaders.0/x", records.getBytes("UTF-8"))
      val b = bos.toByteArray
      b(156) = 'x' // flip typeflag, fix checksum
      java.util.Arrays.fill(b, 148, 156, ' '.toByte)
      var sum = 0
      (0 until 512).foreach(i => sum += b(i) & 0xff)
      val cs = f"$sum%06o\u0000 ".getBytes("UTF-8")
      System.arraycopy(cs, 0, b, 148, 8)
      b
    }
    def rec(k: String, v: String): String = {
      // len covers "<len> k=v\n" INCLUDING its own digits — fixpoint
      val base = k.length + v.length + 3 // ' ' + '=' + '\n'
      var total = base + 1
      while (base + total.toString.length != total)
        total = base + total.toString.length
      s"$total $k=$v\n"
    }
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(paxEntry(rec("size", "7")))
    bos.write(paxEntry(rec("path", "renamed.txt")))
    // file entry: header size 0, real content 7 bytes (pax size wins)
    val fileHdr = new java.io.ByteArrayOutputStream()
    TarAlgos.addEntry(fileHdr, "ignored.txt", Array.emptyByteArray)
    bos.write(fileHdr.toByteArray, 0, 512)  // header only (size=0)
    bos.write("payload".getBytes("UTF-8"))
    bos.write(new Array[Byte](512 - 7))     // pad content to a block
    TarAlgos.finish(bos)
    val got = TarAlgos.entries(
      new java.io.ByteArrayInputStream(bos.toByteArray)).toVector
    assert(got.map(_._1) == Vector("renamed.txt"), got.map(_._1))
    assert(new String(got.head._2, "UTF-8") == "payload")
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
    // a crashed export (begin marker never cleared) refuses the read
    // even though no end-of-export manifest exists to compare against
    val dirC = tmp("graft_wds_crashed")
    Wds.write(fixture, col("id"), col("text"), lit(1L), dirC, 2)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dirC, Wds.ManifestName))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(dirC, Wds.InProgressName))
    val ec = intercept[java.io.IOException] { Wds.read(spark, dirC) }
    assert(ec.getMessage.contains("never finished"), ec.getMessage)
    // ...and a successful export leaves no marker behind
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, Wds.InProgressName)))
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
    // the manifest records the export knobs a consumer reasons from
    val mi = Wds.manifestInfo(spark, d1).get
    assert(mi == Wds.WdsManifest(1, 1, compress = false,
      Seq("shard-000000.tar")), mi)
    assert(Wds.manifestInfo(spark, tmp("graft_wds_nomf")).isEmpty)
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

  test("epoch-order sidecar replays the full re-export order at zero tar bytes rewritten") {
    val dir = tmp("graft_wds_eside")
    Wds.write(fixture, col("id"), col("text"), lit(1L), dir, 2) // epoch 0
    def tarDigest(): Map[String, Long] = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar"))
      .map(f => f.getName -> java.util.Arrays.hashCode(
        java.nio.file.Files.readAllBytes(f.toPath)).toLong).toMap
    val before = tarDigest()
    Wds.writeEpochOrder(spark, dir, 3)
    assert(tarDigest() == before, "sidecar write must not touch any tar byte")
    def ord(rows: org.apache.spark.sql.DataFrame): Seq[(Int, Int, String)] =
      rows.select(col("shard"), col("pos"), col("key"))
        .as[(Int, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // sidecar-applied order == a FULL epoch-3 re-export's baked order
    val viaSidecar = ord(Wds.read(spark, dir, 3)._1)
    val dir3 = tmp("graft_wds_efull")
    Wds.write(fixture, col("id"), col("text"), lit(1L), dir3, 2, epoch = 3)
    assert(viaSidecar == ord(Wds.read(spark, dir3)._1))
    // the binary face applies the same sidecar
    assert(Wds.readBinary(spark, dir, 3)._1.select(col("shard"), col("pos"),
      col("key")).as[(Int, Int, String)].collect()
      .sortBy(r => (r._1, r._2)).toSeq == viaSidecar)
    // asking for the export's own epoch needs no sidecar
    assert(ord(Wds.read(spark, dir, 0)._1) == ord(Wds.read(spark, dir)._1))
    // a missing sidecar refuses loudly instead of guessing an order
    val eMiss = intercept[java.io.IOException](Wds.read(spark, dir, 7))
    assert(eMiss.getMessage.contains("writeEpochOrder"), eMiss.getMessage)
    // a re-export sweeps derived sidecars: the old epoch-3 order must not
    // survive to mis-order the NEW artifact
    Wds.write(fixture, col("id"), col("text"), lit(1L), dir, 1)
    intercept[java.io.IOException](Wds.read(spark, dir, 3))
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

  test("multimodal export: binary parts round-trip byte-exact through readBinary") {
    val dir = tmp("graft_wds_mm")
    val df = Seq(
      (1L, "alpha", Array[Byte](1, 2, 3, -1), "aud1".getBytes("UTF-8")),
      (2L, "beta", Array[Byte](9), null: Array[Byte]),
      (3L, "gamma", null: Array[Byte], "aud3".getBytes("UTF-8")))
      .toDF("id", "text", "img", "aud")
    Wds.write(df, col("id"), col("text"), lit(1L), dir, 1,
      binaryParts = Seq("img.png" -> col("img"), "flac" -> col("aud")))
    val (rows, bad) = Wds.readBinary(spark, dir)
    assert(bad.count() == 0)
    val got = rows.select(col("key"), col("parts"))
      .as[(String, Map[String, Array[Byte]])].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got.size == 3)
    // every part comes back byte-exact; null bytes omit the part
    assert(java.util.Arrays.equals(got(Wds.key(1L))("img.png"), Array[Byte](1, 2, 3, -1)))
    assert(new String(got(Wds.key(1L))("flac"), "UTF-8") == "aud1")
    assert(new String(got(Wds.key(1L))("txt"), "UTF-8") == "alpha")
    assert(got(Wds.key(1L))("json") != null)
    assert(got(Wds.key(2L)).keySet == Set("txt", "img.png", "json"))
    assert(got(Wds.key(3L)).keySet == Set("txt", "flac", "json"))
    // the TEXT face still reads the same artifact (parts beyond txt/json
    // simply don't surface there)
    val (trows, tbad) = Wds.read(spark, dir)
    assert(tbad.count() == 0 && trows.count() == 3)
    assert(trows.where(col("text") === "beta").count() == 1)
    // guards: reserved/degenerate extensions refuse the export
    intercept[IllegalArgumentException] {
      Wds.write(df, col("id"), col("text"), lit(1L), tmp("graft_wds_mmx"), 1,
        binaryParts = Seq("txt" -> col("img")))
    }
    intercept[IllegalArgumentException] {
      Wds.write(df, col("id"), col("text"), lit(1L), tmp("graft_wds_mmy"), 1,
        binaryParts = Seq("a" -> col("img"), "a" -> col("aud")))
    }
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

  test("write(verify=manifest) returns the same manifest as full; the full audit still catches planted corruption") {
    val toks = col("id") * lit(10L)
    val dirF = tmp("graft_wds_vfull")
    val dirM = tmp("graft_wds_vman")
    def rows(m: org.apache.spark.sql.DataFrame) =
      m.collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val full = Wds.write(fixture, col("id"), col("text"), toks, dirF, 3)
    val man = Wds.write(fixture, col("id"), col("text"), toks, dirM, 3,
      verify = "manifest")
    // commit-site accounting == read-back accounting, byte for byte
    assert(rows(man) == rows(full), s"${rows(man)} != ${rows(full)}")
    // the manifest-mode artifact is itself fully re-ingestable
    assert(rows(Wds.reingestManifest(spark, dirM)) == rows(full))
    // the deferred full audit (what verify=full runs inline) catches a
    // corrupt shard a manifest-mode caller could otherwise miss
    val shard = new java.io.File(dirM).listFiles()
      .filter(_.getName.endsWith(".tar")).minBy(_.getName)
    val bytes = java.nio.file.Files.readAllBytes(shard.toPath)
    bytes(3) = (bytes(3) ^ 0x55).toByte // flip a header name byte: checksum breaks
    java.nio.file.Files.write(shard.toPath, bytes)
    val e = intercept[IllegalArgumentException](
      Wds.reingestManifest(spark, dirM))
    assert(e.getMessage.contains("quarantined"), e.getMessage)
    intercept[Exception](Wds.write(fixture, col("id"), col("text"), toks,
      tmp("graft_wds_vbad"), 0)) // sanity: bad args still refuse
  }

  test("a NONEXISTENT shard path throws — never a silent empty corpus") {
    val missing = tmp("graft_wds_gone") + "/no_such_subdir"
    val e = intercept[java.io.FileNotFoundException](Wds.read(spark, missing))
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    intercept[java.io.FileNotFoundException](Wds.readBinary(spark, missing))
    // ...while an EXISTING empty directory is still an empty corpus
    val (r, b) = Wds.read(spark, tmp("graft_wds_empty_dir"))
    assert(r.count() == 0 && b.count() == 0)
  }

  test("duplicate extension within one sample quarantines the whole file") {
    // the write side fails loudly on duplicate ids; the ingest side must
    // not silently drop the earlier payload when a third-party shard
    // carries two entries with the same <key>.<ext>
    val dir = tmp("graft_wds_dupext")
    val bos = new java.io.ByteArrayOutputStream()
    TarAlgos.addEntry(bos, "00001.txt", "first payload".getBytes("UTF-8"))
    TarAlgos.addEntry(bos, "00001.txt", "second payload".getBytes("UTF-8"))
    TarAlgos.addEntry(bos, "00001.json", "{}".getBytes("UTF-8"))
    TarAlgos.finish(bos)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "dup.tar"), bos.toByteArray)
    val (rows, bad) = Wds.read(spark, dir)
    assert(rows.count() == 0, "no sample may survive a corrupt-sample file")
    val badRows = bad.collect()
    assert(badRows.length == 1 &&
      badRows(0).getString(1).contains("duplicate extension"),
      badRows.mkString("; "))
  }

  test("a comma in a third-party tar name does not mis-split the read") {
    val dir = tmp("graft_wds_comma")
    val bos = new java.io.ByteArrayOutputStream()
    TarAlgos.addEntry(bos, "k1.txt", "comma path sample".getBytes("UTF-8"))
    TarAlgos.addEntry(bos, "k1.json", "{}".getBytes("UTF-8"))
    TarAlgos.finish(bos)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0,of-2.tar"), bos.toByteArray)
    val (rows, bad) = Wds.read(spark, dir)
    assert(bad.count() == 0, bad.collect().mkString("; "))
    val got = rows.select(col("key"), col("text")).collect()
    assert(got.length == 1 && got(0).getString(0) == "k1" &&
      got(0).getString(1) == "comma path sample")
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
