package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * WebDataset-style tar-shard export and ingest — the handoff format GPU
 * data loaders stream (one POSIX tar per shard; each sample is a run of
 * adjacent entries sharing a key prefix: `<key>.txt` + `<key>.json`).
 * The training side of [[graft.pipeline.Curation.writeShards]]: same
 * content-addressed shard assignment (md5 bucket — stable across runs,
 * engines and corpus growth) and the same within-shard content-hash
 * pseudo-shuffle, so a trainer gets reproducible global-shuffle order
 * without a global sort, in the format its loader already consumes.
 *
 * Layout contract (deterministic to the BYTE, so shard files can be
 * content-addressed and diffed across runs): ustar headers with zeroed
 * mtime/uid/gid and mode 0644; sample key = the row id as a zero-padded
 * 20-digit unsigned decimal; per sample `<key>.txt` (UTF-8 text) then
 * `<key>.json` ({"id":…,"tok":…} plus any `metaCols`; NULL meta
 * values are omitted per to_json). A `_graft_wds_manifest.yaml` sidecar
 * (underscore-prefixed — input formats skip it) records the committed
 * shard set, so a partially-exported directory can never read back as
 * silently complete.
 *
 * Epochs: `epoch` re-seeds the within-shard pseudo-shuffle (the order
 * hash gets an `#e<epoch>` salt) WITHOUT moving any row between shards —
 * each training epoch streams the same membership in a fresh
 * reproducible order. Epoch 0 is the historical unsalted recipe.
 *
 * Scale: the export is ONE shuffle keyed on the shard (exactly
 * [[graft.pipeline.Curation.writeShards]]'s cost shape) with each task
 * streaming its tar(s) through the Hadoop FileSystem API — works on
 * HDFS/S3, never buffers a shard in memory. Ingest spools each shard to
 * executor-local disk in a single remote read, strict-validates the
 * whole archive (corrupt tars quarantine WHOLE-FILE, loudly), then
 * streams samples off the local spool — memory stays O(one sample),
 * never O(shard). The ingest side also reads THIRD-PARTY WebDataset
 * shards: PAX ('x'/'g') and GNU longname ('L') metadata entries are
 * honored (long sample keys come back intact), directory/link entries
 * are skipped, header checksums are verified, and `.tar.gz` shards are
 * sniffed from the gzip magic (the [[Warc]] posture).
 */
object Wds {

  /** The shard-set sidecar written after the last commit; read() verifies
   * the directory against it so a crashed export reads back LOUDLY
   * incomplete instead of silently smaller. */
  val ManifestName = "_graft_wds_manifest.yaml"

  /** Begin marker written BEFORE the first tar and deleted only after
   * the final manifest lands — a driver crash mid-export leaves it
   * behind, so read() can refuse the partial directory even though the
   * (end-of-export) manifest never got written. */
  val InProgressName = "_graft_wds_in_progress"

  /** Sample key: zero-padded 20-digit unsigned decimal of the id —
   * lexicographic order == unsigned numeric order, and replicable in SQL
   * as printf('%020d', id) for non-negative ids. */
  def key(id: Long): String = {
    val s = java.lang.Long.toUnsignedString(id)
    "0" * (20 - s.length) + s
  }

  /** The within-shard order salt: epoch 0 keeps the historical `#ord`
   * key (byte-identical exports); epoch e>0 appends `#e<e>` — same
   * membership, fresh reproducible order per training epoch. */
  def ordSalt(epoch: Int): String =
    if (epoch == 0) "#ord" else s"#ord#e$epoch"

  /**
   * Export `df` as WebDataset tar shards under `path`
   * (`shard-%06d.tar`, or `.tar.gz` when `compress`). Returns the
   * manifest (shard, docs, tokens) READ BACK from the written tars, so
   * it can never drift from the artifact. `tokensCol` must be evaluable
   * over `df`'s columns. `metaCols` (name → expr) ride each sample's
   * `.json` sidecar next to the fixed `id`/`tok` fields — the url/domain/
   * source provenance a data loader filters on; serialized with
   * `to_json`, so escaping is exact and the bytes stay deterministic.
   */
  def write(df: DataFrame, idCol: Column, textCol: Column,
      tokensCol: Column, path: String, nShards: Int,
      metaCols: Seq[(String, Column)] = Nil,
      epoch: Int = 0, compress: Boolean = false,
      binaryParts: Seq[(String, Column)] = Nil): DataFrame = {
    require(!metaCols.exists(m => m._1 == "id" || m._1 == "tok"),
      "metaCols must not shadow the fixed id/tok sidecar fields")
    require(nShards > 0, "nShards must be positive")
    require(epoch >= 0, "epoch must be non-negative")
    // binaryParts: extra `<key>.<ext>` entries per sample — the
    // image/audio payloads a multimodal WebDataset carries next to the
    // text and sidecar; NULL bytes omit the part for that sample
    require(binaryParts.map(_._1).distinct.size == binaryParts.size,
      "binaryParts extensions must be unique")
    binaryParts.foreach { case (ext, _) =>
      require(ext.nonEmpty && ext != "txt" && ext != "json" &&
        !ext.startsWith(".") && !ext.contains("/"),
        s"binaryParts extension '$ext' must be a plain ext other than txt/json")
    }
    import graft.pipeline.Curation.{hashBucketN, hashFraction}
    val spark = df.sparkSession
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // truncate stale artifacts first (a shrunk corpus or smaller nShards
    // must not leak a previous run's tars into the re-read manifest — the
    // parquet writeShards gets this from mode("overwrite")); the sweep
    // also collects orphaned _tmp files from crashed attempts and the
    // previous manifest (a write that dies below must not leave the OLD
    // manifest vouching for the NEW tars)
    val root = new org.apache.hadoop.fs.Path(path)
    val rootFs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (rootFs.exists(root)) {
      Seq("shard-*.tar", "shard-*.tar.gz", "_tmp-*.tar", "_tmp-*.tar.gz")
        .flatMap(g => rootFs.globStatus(new org.apache.hadoop.fs.Path(root, g)))
        .foreach(st => rootFs.delete(st.getPath, false))
      val mp = new org.apache.hadoop.fs.Path(root, ManifestName)
      if (rootFs.exists(mp)) rootFs.delete(mp, false)
    }
    // begin marker: present from before the first tar until after the
    // final manifest — a crash anywhere in between leaves it, and read()
    // refuses the directory loudly (without this, a mid-export crash
    // leaves NO manifest and the partial tar set would read as complete)
    val marker = new org.apache.hadoop.fs.Path(root, InProgressName)
    rootFs.create(marker, true).close()
    val ext = if (compress) ".tar.gz" else ".tar"
    // the task closure must not capture Columns (not serializable) —
    // only the part extension names ride to the executors
    val partExts: Seq[String] = binaryParts.map(_._1)
    // ground truth of committed shards, straight from the commit sites
    // (action-side accumulator: retried tasks don't double-apply, and the
    // set is idempotent anyway) — NOT a post-hoc glob, which would bake a
    // lost shard into the manifest instead of catching it
    val committedAcc = spark.sparkContext.collectionAccumulator[Int]("graft_wds_committed")
    // the sidecar json is built over df's ORIGINAL columns (metaCols may
    // reference any of them), before the narrowing select
    val metaJson = to_json(struct(
      (idCol.cast("long").as("id") +: tokensCol.cast("long").as("tok") +:
        metaCols.map { case (n, c) => c.as(n) }): _*))
    df.select((Seq(idCol.cast("long").as("graft_id"),
        textCol.cast("string").as("graft_text"),
        tokensCol.cast("long").as("graft_tok"),
        metaJson.as("graft_meta")) ++
      binaryParts.zipWithIndex.map { case ((_, c), i) =>
        c.cast("binary").as(s"graft_part_$i") }): _*)
      .withColumn("graft_shard", hashBucketN(col("graft_id"), nShards).cast("int"))
      .withColumn("graft_ord",
        hashFraction(concat(col("graft_id").cast("string"), lit(ordSalt(epoch)))))
      .repartition(col("graft_shard"))
      .sortWithinPartitions(col("graft_shard"), col("graft_ord"), col("graft_id"))
      .select((Seq(col("graft_shard"), col("graft_id"), col("graft_text"),
        col("graft_meta")) ++
        binaryParts.indices.map(i => col(s"graft_part_$i"))): _*)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        // a partition holds zero or more WHOLE shards (the repartition
        // routes every row of a shard here); leading sort groups them.
        // Poor-man's commit protocol: write to an attempt-suffixed temp
        // name the manifest glob can never match, fsync-close, then
        // rename-with-overwrite into place — a speculative or zombie
        // attempt can't interleave bytes into the final tar, and
        // identical deterministic content makes last-wins safe.
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        var cur = -1
        var out: java.io.OutputStream = null
        var tmp: org.apache.hadoop.fs.Path = null
        var fs: org.apache.hadoop.fs.FileSystem = null
        val seen = new java.util.HashSet[java.lang.Long]()
        def commit(): Unit = if (out != null) {
          TarAlgos.finish(out); out.close(); out = null
          val dst = new org.apache.hadoop.fs.Path(path, f"shard-$cur%06d$ext")
          try renameOverwrite(fs, hconf.value, tmp, dst)
          finally if (fs.exists(tmp)) fs.delete(tmp, false) // failed rename: no orphan
          tmp = null
          committedAcc.add(cur)
        }
        try {
          it.foreach { r =>
            val shard = r.getInt(0)
            if (shard != cur) {
              commit()
              cur = shard
              tmp = new org.apache.hadoop.fs.Path(path,
                f"_tmp-$attempt%d.shard-$cur%06d$ext")
              fs = tmp.getFileSystem(hconf.value)
              // java's GZIPOutputStream header is fixed bytes (MTIME=0,
              // OS=0) and DEFLATE is deterministic for fixed input+level,
              // so compressed shards stay byte-stable run to run
              val raw = fs.create(tmp, true)
              out = if (compress)
                new java.util.zip.GZIPOutputStream(raw, 1 << 16) else raw
              seen.clear()
            }
            val id = r.getLong(1)
            // duplicate ids would sort adjacent and silently merge into
            // ONE WebDataset sample (adjacent same-key parts) — data loss
            // the parquet path doesn't have; fail loudly instead
            if (!seen.add(id))
              throw new IllegalArgumentException(
                s"duplicate id $id in wds export: sample keys must be " +
                  "unique — dedupe upstream or use a collision-free id")
            val k = key(id)
            val text = Option(r.getString(2)).getOrElse("")
            TarAlgos.addEntry(out, s"$k.txt", text.getBytes("UTF-8"))
            partExts.zipWithIndex.foreach { case (pext, i) =>
              val bytes = r.getAs[Array[Byte]](4 + i)
              if (bytes != null) TarAlgos.addEntry(out, s"$k.$pext", bytes)
            }
            TarAlgos.addEntry(out, s"$k.json", r.getString(3).getBytes("UTF-8"))
          }
          commit()
        } finally {
          if (out != null) out.close()
          if (tmp != null && fs != null && fs.exists(tmp)) fs.delete(tmp, false)
        }
      }
    // the action is done: every shard above is committed — record the set
    import scala.jdk.CollectionConverters._
    val committed = committedAcc.value.asScala.map(_.toInt).toSet.toSeq.sorted
    writeManifest(rootFs, root, committed.map(s => f"shard-$s%06d$ext"),
      nShards, epoch, compress)
    rootFs.delete(marker, false) // the export is now provably complete
    val (rows, bad) = read(spark, path)
    // a write that cannot re-ingest cleanly is a corrupt artifact
    val badRows = bad.limit(1).collect()
    require(badRows.isEmpty,
      s"tar shard re-ingest quarantined ${badRows.head}")
    rows.groupBy(col("shard"))
      .agg(count(lit(1)).as("docs"),
        sum(get_json_object(col("meta"), "$.tok").cast("long")).as("tokens"))
  }

  /** [[write]] sized by a token budget: nShards = ceil(total /
   * tokensPerShard), so every tar lands near the token mass a data
   * loader wants per shard file — the WebDataset twin of
   * [[graft.pipeline.Curation.writeShardsByTokens]]. Same caveat: the
   * shard COUNT (and so every row's shard id) moves as the corpus
   * grows — use explicit nShards when cross-run stability of the
   * assignment matters more than shard size. */
  def writeByTokens(df: DataFrame, idCol: Column, textCol: Column,
      tokensCol: Column, path: String, tokensPerShard: Long,
      metaCols: Seq[(String, Column)] = Nil,
      epoch: Int = 0, compress: Boolean = false): DataFrame = {
    require(tokensPerShard > 0, "tokensPerShard must be positive")
    val row = df.agg(sum(tokensCol.cast("long")).as("t")).head()
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    val nShards = math.max(1L, (total + tokensPerShard - 1) / tokensPerShard).toInt
    write(df, idCol, textCol, tokensCol, path, nShards, metaCols, epoch, compress)
  }

  /** Atomic-overwrite rename: FileContext.rename(OVERWRITE) where the
   * scheme has an AbstractFileSystem (HDFS/local — one atomic op, no
   * exists→delete window a dying attempt can strand a shard in);
   * delete+rename fallback elsewhere (object stores — there rename is
   * copy+delete anyway and the manifest check catches a lost shard). */
  private def renameOverwrite(fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration,
      src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit =
    try {
      org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
        .rename(src, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(dst)) fs.delete(dst, false)
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"could not commit $src -> $dst")
    }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, shards: Seq[String],
      nShards: Int, epoch: Int, compress: Boolean): Unit = {
    val m = new java.util.LinkedHashMap[String, Any]()
    m.put("version", 1)
    m.put("format", "wds")
    m.put("nShards", nShards)
    m.put("epoch", epoch)
    m.put("compress", compress)
    val l = new java.util.ArrayList[String](); shards.foreach(l.add); m.put("shards", l)
    val yaml = new org.yaml.snakeyaml.Yaml().dump(m)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, ManifestName), true)
    try out.write(yaml.getBytes("UTF-8")) finally out.close()
  }

  /** What the shard-set sidecar records about an export — the knobs a
   * consumer needs to reason about the artifact (is this epoch 3? how
   * many shards should exist?) without re-deriving them from file names. */
  final case class WdsManifest(nShards: Int, epoch: Int, compress: Boolean,
      shards: Seq[String])

  /** The artifact's [[ManifestName]] sidecar, parsed — None for
   * directories without one (third-party shard sets, pre-manifest
   * exports). */
  def manifestInfo(spark: SparkSession, path: String): Option[WdsManifest] = {
    val root = new org.apache.hadoop.fs.Path(path)
    readManifest(root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[WdsManifest] = {
    val p = new org.apache.hadoop.fs.Path(root, ManifestName)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val bytes = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
    val m = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Any]](new String(bytes, "UTF-8"))
    import scala.jdk.CollectionConverters._
    Some(WdsManifest(
      m.get("nShards").asInstanceOf[Number].intValue,
      m.get("epoch").asInstanceOf[Number].intValue,
      m.get("compress").asInstanceOf[Boolean],
      m.get("shards").asInstanceOf[java.util.List[Any]]
        .asScala.map(_.toString).toSeq))
  }

  /** (samples, quarantined files): samples are (shard, pos, key, text,
   * meta) with `pos` the 0-based within-shard parse position (the
   * epoch-reshuffle order a loader streams), `meta` the raw json sidecar
   * (null if absent); `bad` is (file, reason) for tars that fail the
   * strict parse or sit in the directory unvouched by its manifest.
   * `path` may be a shard directory (every non-hidden `*.tar` /
   * `*.tar.gz` — third-party WebDataset names need not match
   * `shard-*`) or a single tar file. When the directory carries a
   * [[ManifestName]] sidecar, a MISSING shard throws loudly (the export
   * was partial — reading it as complete is data loss); an EXTRA tar
   * quarantines per-file. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    readImpl(spark, path, binary = false)

  /** The multimodal ingest face: like [[read]] but samples come back as
   * (shard, pos, key, parts) with `parts` the FULL ext → bytes map —
   * image/audio/arbitrary-binary parts a text-face read would drop.
   * Same listing, manifest/marker guards, spool validation and
   * quarantine semantics as [[read]]. */
  def readBinary(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    readImpl(spark, path, binary = true)

  private def readImpl(spark: SparkSession, path: String,
      binary: Boolean): (DataFrame, DataFrame) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (files, unvouched): (Seq[org.apache.hadoop.fs.Path], Seq[String]) =
      if (fs.exists(root) && fs.getFileStatus(root).isFile) (Seq(root), Nil)
      else if (!fs.exists(root)) (Nil, Nil)
      else {
        if (fs.exists(new org.apache.hadoop.fs.Path(root, InProgressName)))
          throw new java.io.IOException(
            s"wds export under $path never finished (its $InProgressName " +
              "begin marker is still present) — the tar set is partial; " +
              "re-run the export rather than training on it")
        val actual = Seq("*.tar", "*.tar.gz")
          .flatMap(g => fs.globStatus(new org.apache.hadoop.fs.Path(root, g)))
          .map(_.getPath)
          .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
        readManifest(fs, root).map(_.shards) match {
          case Some(expected) =>
            val names = actual.map(_.getName).toSet
            val missing = expected.filterNot(names)
            if (missing.nonEmpty) throw new java.io.IOException(
              s"wds shard set under $path is INCOMPLETE: manifest lists " +
                s"${expected.size} shards but ${missing.size} are missing " +
                s"(${missing.take(5).mkString(", ")}…) — the export did " +
                "not finish; re-run it rather than training on a partial corpus")
            val vouched = expected.toSet
            (actual.filter(p => vouched(p.getName)),
              actual.map(_.getName).filterNot(vouched))
          case None => (actual, Nil)
        }
      }
    // zero matching shards (an empty-but-valid export: every row gated
    // out upstream) is an empty corpus, not a job failure — binaryFiles'
    // FileInputFormat would throw on a 0-file list
    val unvouchedDf = spark.createDataFrame(
      java.util.Arrays.asList(unvouched.map(n => org.apache.spark.sql.Row(
        new org.apache.hadoop.fs.Path(root, n).toString,
        s"tar not in $ManifestName — foreign or stale file in the shard dir")): _*),
      BadSchema)
    if (files.isEmpty)
      return (if (binary) emptyBinaryFrame(spark) else emptyFrame(spark),
        unvouchedDf)
    val tagged = spark.sparkContext
      .binaryFiles(files.map(_.toString).mkString(","))
      .flatMap { case (file, pds) =>
        val shard = "shard-(\\d+)\\.tar(\\.gz)?$".r.findFirstMatchIn(file)
          .map(_.group(1).toInt).getOrElse(-1)
        // spool the shard to executor-local disk in ONE remote read,
        // strict-validate the whole archive off the spool (whole-file
        // quarantine needs the verdict before the first sample is
        // emitted), then STREAM samples from the spool — memory is
        // O(current sample), never O(shard). The spool lands on the
        // executor's configured scratch volume (spark.local.dir — the
        // disks sized for shuffle spill), not the root-volume tmpdir a
        // container usually caps. The task-completion listener
        // guarantees spool cleanup even when a downstream limit()
        // abandons the iterator mid-file.
        val spoolDirs = Option(org.apache.spark.SparkEnv.get)
          .map(_.conf.get("spark.local.dir",
            System.getProperty("java.io.tmpdir")))
          .getOrElse(System.getProperty("java.io.tmpdir"))
          .split(",").map(_.trim).filter(_.nonEmpty)
        // spread concurrent shard spools across the scratch volumes the
        // way shuffle files are spread, keyed on the file name
        val spoolDir = spoolDirs((file.hashCode & 0x7fffffff) % spoolDirs.length)
        val spool = java.io.File.createTempFile("graft-wds-spool-", ".bin",
          new java.io.File(spoolDir))
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null)
          tc.addTaskCompletionListener[Unit](_ => spool.delete())
        def open(): java.io.InputStream = {
          val b = new java.io.BufferedInputStream(
            new java.io.FileInputStream(spool), 1 << 16)
          b.mark(2)
          val (b0, b1) = (b.read(), b.read())
          b.reset()
          if (b0 == 0x1f && b1 == 0x8b) new java.io.BufferedInputStream(
            new java.util.zip.GZIPInputStream(b, 1 << 16), 1 << 16)
          else b
        }
        try {
          val in = pds.open()
          try {
            val os = new java.io.BufferedOutputStream(
              new java.io.FileOutputStream(spool), 1 << 16)
            try {
              val buf = new Array[Byte](1 << 16)
              var n = in.read(buf)
              while (n >= 0) { os.write(buf, 0, n); n = in.read(buf) }
            } finally os.close()
          } finally in.close()
          // validation pass: parse every header+content strictly, emit
          // nothing — a corrupt byte anywhere quarantines the whole file
          val v = open()
          try {
            val probe = TarAlgos.samples(TarAlgos.entries(v))
            while (probe.hasNext) probe.next()
          } finally v.close()
          // emit pass: proven-clean archive, stream off the local spool
          val in2 = open()
          val base = TarAlgos.samples(TarAlgos.entries(in2)).zipWithIndex.map {
            case ((k, parts), pos) =>
              if (binary) org.apache.spark.sql.Row(
                file, true, null, shard, pos, k, parts)
              else org.apache.spark.sql.Row(
                file, true, null, shard, pos, k,
                parts.get("txt").map(new String(_, "UTF-8")).orNull,
                parts.get("json").map(new String(_, "UTF-8")).orNull)
          }
          new Iterator[org.apache.spark.sql.Row] {
            private var closed = false
            def hasNext: Boolean = {
              val h = !closed && base.hasNext
              if (!h && !closed) { closed = true; in2.close(); spool.delete() }
              h
            }
            def next(): org.apache.spark.sql.Row = base.next()
          }
        } catch {
          case e: Exception =>
            spool.delete()
            Iterator.single(
              if (binary) org.apache.spark.sql.Row(
                file, false, e.getMessage, shard, -1, null, null)
              else org.apache.spark.sql.Row(
                file, false, e.getMessage, shard, -1, null, null, null))
        }
      }
    val taggedDf = spark.createDataFrame(tagged,
      if (binary) TaggedBinarySchema else TaggedSchema)
    (taggedDf.where(col("ok")).select(
       (Seq(col("shard"), col("pos"), col("key")) ++
         (if (binary) Seq(col("parts"))
          else Seq(col("text"), col("meta")))): _*),
     taggedDf.where(!col("ok")).select(col("file"), col("reason"))
       .unionByName(unvouchedDf))
  }

  /** Empty frame with [[read]]'s sample-side schema — lets config
   * validation (BatchConfig.validate) dry-resolve a wds source without
   * touching any path. */
  def emptyFrame(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), SampleSchema)

  /** Empty frame with [[readBinary]]'s sample-side schema. */
  def emptyBinaryFrame(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      BinarySampleSchema)

  import org.apache.spark.sql.types._
  private val TaggedSchema = StructType(Seq(
    StructField("file", StringType), StructField("ok", BooleanType, nullable = false),
    StructField("reason", StringType), StructField("shard", IntegerType, nullable = false),
    StructField("pos", IntegerType, nullable = false), StructField("key", StringType),
    StructField("text", StringType), StructField("meta", StringType)))
  private val TaggedBinarySchema = StructType(Seq(
    StructField("file", StringType), StructField("ok", BooleanType, nullable = false),
    StructField("reason", StringType), StructField("shard", IntegerType, nullable = false),
    StructField("pos", IntegerType, nullable = false), StructField("key", StringType),
    StructField("parts", MapType(StringType, BinaryType))))
  private val BinarySampleSchema = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("key", StringType),
    StructField("parts", MapType(StringType, BinaryType))))
  private val SampleSchema = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("key", StringType), StructField("text", StringType),
    StructField("meta", StringType)))
  private val BadSchema = StructType(Seq(
    StructField("file", StringType), StructField("reason", StringType)))
}

/** Minimal deterministic ustar codec — plain JVM, no Spark types, so it
 * unit-tests without a session (the [[WarcAlgos]] posture). Writer emits
 * byte-stable archives (zeroed mtime/uid/gid, plain '0' entries only);
 * reader is strict (bad magic, a failed header checksum, truncated
 * content or a malformed size field throw — whole-file quarantine
 * upstream) but speaks the conventions third-party WebDataset writers
 * actually emit (python's tarfile defaults to PAX): PAX 'x'/'g'
 * extended headers are parsed and their `path`/`size` overrides honored,
 * GNU 'L' longnames resolve, the POSIX prefix field splices, and
 * directory/link/device entries are consumed without becoming samples. */
object TarAlgos {

  private val BlockSize = 512

  /** Append one file entry (header + padded content). */
  def addEntry(out: java.io.OutputStream, name: String, data: Array[Byte]): Unit = {
    require(name.getBytes("UTF-8").length <= 100, s"tar name too long: $name")
    val h = new Array[Byte](BlockSize)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("UTF-8"); System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)
    put(100, "0000644\u0000")            // mode
    put(108, "0000000\u0000")            // uid
    put(116, "0000000\u0000")            // gid
    put(124, f"${data.length}%011o ")    // size (octal)
    put(136, "00000000000 ")             // mtime: zero for byte-stable output
    put(148, "        ")                 // chksum placeholder (8 spaces)
    h(156) = '0'                         // typeflag: regular file
    put(257, "ustar\u0000")              // magic
    put(263, "00")                       // version
    var sum = 0
    h.foreach(b => sum += b & 0xff)
    put(148, f"$sum%06o\u0000 ")
    out.write(h)
    out.write(data)
    val pad = (BlockSize - data.length % BlockSize) % BlockSize
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** Terminate the archive (two zero blocks). */
  def finish(out: java.io.OutputStream): Unit =
    out.write(new Array[Byte](2 * BlockSize))

  /** NUL-terminated string field. */
  private def strField(h: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && h(end) != 0) end += 1
    new String(h, off, end - off, "UTF-8")
  }

  /** Numeric field: octal with leading/trailing spaces or NULs (POSIX and
   * the sloppier historical writers), or GNU base-256 (high bit of the
   * first byte) for values past 8 GiB. */
  private def numField(h: Array[Byte], off: Int, len: Int, what: String): Long = {
    if ((h(off) & 0x80) != 0) {
      var v = (h(off) & 0x7f).toLong
      var i = off + 1
      while (i < off + len) { v = (v << 8) | (h(i) & 0xff); i += 1 }
      return v
    }
    val s = new String(h, off, len, "US-ASCII")
    val t = s.replace("\u0000", " ").trim
    if (t.isEmpty || !t.forall(c => c >= '0' && c <= '7'))
      throw new java.io.IOException(s"malformed tar $what field '${t}'")
    java.lang.Long.parseLong(t, 8)
  }

  /** Header checksum: byte sum with the chksum field read as spaces.
   * Verified against the stored octal — unsigned per POSIX, with the
   * signed-byte sum accepted too (ancient tars summed signed chars). */
  private def verifyChecksum(h: Array[Byte]): Unit = {
    val stored = numField(h, 148, 8, "chksum")
    var unsigned = 0L
    var signed = 0L
    var i = 0
    while (i < BlockSize) {
      val b: Int = if (i >= 148 && i < 156) ' ' else h(i)
      unsigned += b & 0xff
      signed += b
      i += 1
    }
    if (stored != unsigned && stored != signed)
      throw new java.io.IOException(
        s"tar header checksum mismatch: stored $stored, computed $unsigned")
  }

  /** PAX extended-header records: `<len> <key>=<value>\n`, len decimal
   * over the whole record. Strict — a malformed record throws. */
  private def parsePax(data: Array[Byte]): Map[String, String] = {
    var off = 0
    var m = Map.empty[String, String]
    while (off < data.length) {
      var sp = off
      while (sp < data.length && data(sp) != ' ') sp += 1
      val len =
        try new String(data, off, sp - off, "US-ASCII").toInt
        catch { case _: NumberFormatException =>
          throw new java.io.IOException("malformed pax record length") }
      if (sp >= data.length || len <= 0 || off + len > data.length ||
          data(off + len - 1) != '\n')
        throw new java.io.IOException("malformed pax record framing")
      val rec = new String(data, sp + 1, off + len - 1 - (sp + 1), "UTF-8")
      val eq = rec.indexOf('=')
      if (eq < 0) throw new java.io.IOException(s"malformed pax record '$rec'")
      m += rec.substring(0, eq) -> rec.substring(eq + 1)
      off += len
    }
    m
  }

  /** Strict streaming entry iterator: (name, content) until the zero
   * terminator; throws on malformed headers, a bad checksum or truncated
   * content. FILE entries only — PAX/GNU metadata blocks are folded into
   * the following entry's name/size, directories and links are skipped. */
  def entries(in: java.io.InputStream): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var nextEntry: (String, Array[Byte]) = null
      private var done = false
      private var paxNext: Map[String, String] = null  // 'x' → next entry
      private var paxGlobal: Map[String, String] = Map.empty // 'g' defaults
      private var gnuLongName: String = null           // 'L' → next entry
      private def readFully(n: Int): Array[Byte] = {
        val b = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = in.read(b, off, n - off)
          if (r < 0) throw new java.io.EOFException(
            s"truncated tar: wanted $n bytes, got $off")
          off += r
        }
        b
      }
      /** Entry content + its block padding; size from the header unless a
       * pending PAX `size` record overrides it (the >8 GiB convention).
       * The override applies ONLY to the actual file entry
       * (`honorOverride`) — a metadata block ('x'/'g'/'L'/'K') always
       * reads its own header size, so a crafted tar with consecutive
       * extended headers cannot smear one entry's size onto another. */
      private def content(h: Array[Byte], name: String,
          honorOverride: Boolean): Array[Byte] = {
        val hdrSize = numField(h, 124, 12, "size")
        val size = if (honorOverride)
          Option(paxNext).flatMap(_.get("size"))
            .orElse(paxGlobal.get("size")).map(_.toLong).getOrElse(hdrSize)
        else hdrSize
        if (size > Int.MaxValue)
          throw new java.io.IOException(s"oversized tar entry '$name'")
        val data = readFully(size.toInt)
        val pad = ((BlockSize - size % BlockSize) % BlockSize).toInt
        if (pad > 0) readFully(pad)
        data
      }
      private def advance(): Unit = {
        while (!done && nextEntry == null) {
          val h = readFully(BlockSize)
          if (h.forall(_ == 0)) { done = true; return }
          val magic = new String(h, 257, 5, "UTF-8")
          if (magic != "ustar")
            throw new java.io.IOException(s"bad tar magic '$magic'")
          verifyChecksum(h)
          val rawName = strField(h, 0, 100)
          val typeflag = h(156).toChar
          typeflag match {
            case 'x' => // PAX per-entry header: applies to the NEXT entry;
              // consecutive 'x' blocks merge (later records win), the
              // star/GNU behavior for the POSIX-unspecified case
              paxNext = Option(paxNext).getOrElse(Map.empty) ++
                parsePax(content(h, rawName, honorOverride = false))
            case 'g' => // PAX global header: defaults for ALL that follow
              paxGlobal = paxGlobal ++ parsePax(content(h, rawName, honorOverride = false))
            case 'L' => // GNU longname: content is the next entry's name
              val b = content(h, rawName, honorOverride = false)
              var end = 0
              while (end < b.length && b(end) != 0) end += 1
              gnuLongName = new String(b, 0, end, "UTF-8")
            case 'K' => // GNU longlink target: consumed, never a sample
              content(h, rawName, honorOverride = false)
            case '5' | '1' | '2' | '3' | '4' | '6' =>
              // directory / link / device: consume and skip — a pending
              // name override belonged to THIS entry, so it dies with it
              content(h, rawName, honorOverride = true)
              paxNext = null; gnuLongName = null
            case _ => // '0', NUL, '7' and POSIX-reserved flags: file data
              val data = content(h, rawName, honorOverride = true)
              // POSIX splits >100-char paths as prefix(155) + name; the
              // field only exists under the "ustar\0" magic — GNU reuses
              // those bytes for atime/ctime
              val prefix = if (h(262) == 0) strField(h, 345, 155) else ""
              val spliced =
                if (prefix.nonEmpty) s"$prefix/$rawName" else rawName
              val name = Option(paxNext).flatMap(_.get("path"))
                .orElse(Option(gnuLongName))
                .orElse(paxGlobal.get("path"))
                .getOrElse(spliced)
              paxNext = null; gnuLongName = null
              nextEntry = (name, data)
          }
        }
      }
      def hasNext: Boolean = { advance(); !done && nextEntry != null }
      def next(): (String, Array[Byte]) = {
        advance()
        if (nextEntry == null) throw new NoSuchElementException
        val e = nextEntry; nextEntry = null; e
      }
    }

  /** Group ADJACENT entries by key prefix (the WebDataset sample
   * contract): `<key>.<ext>` runs become (key, ext → bytes). Per the
   * webdataset spec the key ends at the FIRST period after the last
   * slash — so `img194.seg.png` and `img194.json` are ONE sample
   * (key `img194`, parts `seg.png` + `json`), the multi-extension
   * convention real published shards use. */
  def samples(es: Iterator[(String, Array[Byte])]): Iterator[(String, Map[String, Array[Byte]])] =
    new Iterator[(String, Map[String, Array[Byte]])] {
      private val buf = es.buffered
      private def split(name: String): (String, String) = {
        val slash = name.lastIndexOf('/')
        val i = name.indexOf('.', slash + 1)
        // a dotless or hidden (leading-dot) basename is all key, no ext
        if (i < 0 || i == slash + 1) (name, "")
        else (name.substring(0, i), name.substring(i + 1))
      }
      def hasNext: Boolean = buf.hasNext
      def next(): (String, Map[String, Array[Byte]]) = {
        val (name, data) = buf.next()
        val (k, ext) = split(name)
        var parts = Map(ext -> data)
        while (buf.hasNext && split(buf.head._1)._1 == k) {
          val (n2, d2) = buf.next()
          parts += (split(n2)._2 -> d2)
        }
        (k, parts)
      }
    }
}
