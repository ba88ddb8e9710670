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
   * manifest (shard, docs, tokens). `tokensCol` must be evaluable
   * over `df`'s columns. `metaCols` (name → expr) ride each sample's
   * `.json` sidecar next to the fixed `id`/`tok` fields — the url/domain/
   * source provenance a data loader filters on; serialized with
   * `to_json`, so escaping is exact and the bytes stay deterministic.
   *
   * `verify` picks the post-export verification posture:
   *  - `"full"` (default): the whole artifact is READ BACK — spool,
   *    checksum, strict parse of every shard — and the returned manifest
   *    comes from that re-ingest, so it can never drift from the bytes
   *    on disk. A write that cannot re-ingest cleanly throws.
   *  - `"manifest"`: skips the second read; the returned manifest is
   *    built from the commit-site accumulator (per-shard docs/tokens
   *    counted as the tar bytes were streamed) plus a FileSystem
   *    listing check that every committed tar is present and non-empty.
   *    At a 100 TB export the full re-ingest DOUBLES artifact I/O as a
   *    verification tax — `manifest` is the scale knob for callers that
   *    trust the commit protocol (every tar was fsync-closed and
   *    renamed into place before its shard entered the manifest).
   */
  def write(df: DataFrame, idCol: Column, textCol: Column,
      tokensCol: Column, path: String, nShards: Int,
      metaCols: Seq[(String, Column)] = Nil,
      epoch: Int = 0, compress: Boolean = false,
      binaryParts: Seq[(String, Column)] = Nil,
      verify: String = "full"): DataFrame = {
    require(verify == "full" || verify == "manifest",
      s"verify must be full|manifest, got '$verify'")
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
    // begin marker FIRST, before the stale-artifact sweep: present from
    // before any byte of the old export is touched until after the final
    // manifest — a crash anywhere in between (including mid-sweep, after
    // the old manifest is gone but before any new tar lands) leaves it,
    // and read() refuses the directory loudly (without this, a mid-export
    // crash leaves NO manifest and the partial or swept-empty tar set
    // would read back as silently complete/empty)
    val marker = new org.apache.hadoop.fs.Path(root, InProgressName)
    rootFs.create(marker, true).close()
    Seq("shard-*.tar", "shard-*.tar.gz", "_tmp-*.tar", "_tmp-*.tar.gz")
      .flatMap(g => rootFs.globStatus(new org.apache.hadoop.fs.Path(root, g)))
      .foreach(st => rootFs.delete(st.getPath, false))
    // epoch-order sidecars are DERIVED from the artifact being replaced —
    // leaving one behind would hand a loader a stale order for new tars
    rootFs.globStatus(new org.apache.hadoop.fs.Path(root, "_graft_wds_epoch*"))
      .foreach(st => rootFs.delete(st.getPath, true))
    val mp = new org.apache.hadoop.fs.Path(root, ManifestName)
    if (rootFs.exists(mp)) rootFs.delete(mp, false)
    val ext = if (compress) ".tar.gz" else ".tar"
    // the task closure must not capture Columns (not serializable) —
    // only the part extension names ride to the executors
    val partExts: Seq[String] = binaryParts.map(_._1)
    // ground truth of committed shards, straight from the commit sites
    // (action-side accumulator: retried/speculative attempts may add the
    // same shard twice, but deterministic content makes the tuples
    // identical — deduped by shard id below) — NOT a post-hoc glob,
    // which would bake a lost shard into the manifest instead of
    // catching it. Tuples are (shard, docs, tokenSum-or-null), so
    // verify="manifest" can return the manifest without re-reading tars.
    val committedAcc = spark.sparkContext
      .collectionAccumulator[(Int, Long, java.lang.Long)]("graft_wds_committed")
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
        binaryParts.indices.map(i => col(s"graft_part_$i")) :+
        col("graft_tok")): _*)
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
        // duplicate-id detection in O(1) memory: the within-partition sort
        // keys on (shard, graft_ord, graft_id), and duplicate ids share all
        // three (graft_ord is a pure hash of the id), so duplicates always
        // arrive ADJACENT — the previous row's id is the whole check, no
        // per-shard HashSet holding every id on the executor heap
        var prevId = 0L
        var havePrev = false
        // per-shard manifest counters, tallied as the bytes stream out —
        // the verify="manifest" path returns these instead of re-reading
        var shardDocs = 0L
        var shardTok = 0L
        var shardTokSeen = false
        def commit(): Unit = if (out != null) {
          TarAlgos.finish(out); out.close(); out = null
          val dst = new org.apache.hadoop.fs.Path(path, f"shard-$cur%06d$ext")
          try renameOverwrite(fs, hconf.value, tmp, dst)
          finally if (fs.exists(tmp)) fs.delete(tmp, false) // failed rename: no orphan
          tmp = null
          committedAcc.add((cur, shardDocs,
            if (shardTokSeen) java.lang.Long.valueOf(shardTok) else null))
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
              havePrev = false
              shardDocs = 0L; shardTok = 0L; shardTokSeen = false
            }
            val id = r.getLong(1)
            // duplicate ids would sort adjacent and silently merge into
            // ONE WebDataset sample (adjacent same-key parts) — data loss
            // the parquet path doesn't have; fail loudly instead
            if (havePrev && prevId == id)
              throw new IllegalArgumentException(
                s"duplicate id $id in wds export: sample keys must be " +
                  "unique — dedupe upstream or use a collision-free id")
            prevId = id
            havePrev = true
            val k = key(id)
            val text = Option(r.getString(2)).getOrElse("")
            TarAlgos.addEntry(out, s"$k.txt", text.getBytes("UTF-8"))
            partExts.zipWithIndex.foreach { case (pext, i) =>
              val bytes = r.getAs[Array[Byte]](4 + i)
              if (bytes != null) TarAlgos.addEntry(out, s"$k.$pext", bytes)
            }
            TarAlgos.addEntry(out, s"$k.json", r.getString(3).getBytes("UTF-8"))
            shardDocs += 1L
            val tokIdx = 4 + partExts.length
            if (!r.isNullAt(tokIdx)) {
              shardTok += r.getLong(tokIdx); shardTokSeen = true
            }
          }
          commit()
        } finally {
          if (out != null) out.close()
          if (tmp != null && fs != null && fs.exists(tmp)) fs.delete(tmp, false)
        }
      }
    // the action is done: every shard above is committed — record the set
    import scala.jdk.CollectionConverters._
    val committed = committedAcc.value.asScala
      .groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
    writeManifest(rootFs, root,
      committed.map(c => f"shard-${c._1}%06d$ext"), nShards, epoch, compress)
    rootFs.delete(marker, false) // the export is now provably complete
    if (verify == "full") reingestManifest(spark, path)
    else {
      // manifest mode: trust the commit sites, but still prove every
      // committed tar is PRESENT and non-empty on the target FileSystem
      // (a lost rename or truncating store must not return a manifest
      // vouching for bytes that aren't there)
      committed.foreach { case (s, _, _) =>
        val p = new org.apache.hadoop.fs.Path(root, f"shard-$s%06d$ext")
        val st = try rootFs.getFileStatus(p) catch {
          case _: java.io.FileNotFoundException =>
            throw new java.io.IOException(
              s"committed shard $p missing after export — artifact corrupt")
        }
        if (st.getLen <= 0) throw new java.io.IOException(
          s"committed shard $p is empty after export — artifact corrupt")
      }
      spark.createDataFrame(
        java.util.Arrays.asList(committed.map(c =>
          org.apache.spark.sql.Row(c._1, c._2, c._3)): _*),
        ManifestSchema)
    }
  }

  /** The `verify="full"` pass: re-ingest the whole export (spool +
   * checksum + strict parse of every shard), refuse LOUDLY if any shard
   * quarantines, and return the (shard, docs, tokens) manifest computed
   * from the read-back bytes — a write that cannot re-ingest cleanly is
   * a corrupt artifact. Public seam so a `manifest`-mode caller can run
   * the full audit later (e.g. from a separate verification job that
   * doesn't serialize the export's wall-clock). */
  def reingestManifest(spark: SparkSession, path: String): DataFrame = {
    val (rows, bad) = read(spark, path)
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
      epoch: Int = 0, compress: Boolean = false,
      verify: String = "full"): DataFrame = {
    require(tokensPerShard > 0, "tokensPerShard must be positive")
    val row = df.agg(sum(tokensCol.cast("long")).as("t")).head()
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    val nShards = math.max(1L, (total + tokensPerShard - 1) / tokensPerShard).toInt
    write(df, idCol, textCol, tokensCol, path, nShards, metaCols, epoch,
      compress, verify = verify)
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
   * quarantines per-file. A NONEXISTENT `path` throws
   * FileNotFoundException — a typo'd path must not train on zero data. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    readImpl(spark, path, binary = false)

  /** Epoch-order sidecar name: a slim parquet of (shard, key, pos) under
   * the shard directory (underscore-prefixed — tar listings skip it). */
  def epochOrderName(epoch: Int): String = s"_graft_wds_epoch$epoch.parquet"

  /** md5 hex of the manifest sidecar bytes — stamps epoch-order sidecars
   * so one derived from a REPLACED artifact refuses loudly. */
  private def manifestFingerprint(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): String = {
    val p = new org.apache.hadoop.fs.Path(root, ManifestName)
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString
  }

  /**
   * Materialize training epoch `epoch`'s within-shard order as a SIDECAR
   * instead of re-exporting every tar: a full epoch re-export moves the
   * whole corpus (100 TB of tar bytes per epoch); the order it produces
   * is a pure function of (id, epoch), so a slim
   * `_graft_wds_epoch<N>.parquet` of (shard, key, pos) carries the same
   * information at ~40 bytes/sample. [[read(spark,path,epoch)*]] applies
   * it; an external loader can equally join it against the tar stream
   * (the contract: stream samples in tar order, reorder each shard by
   * the sidecar's `pos` — shard membership never changes across epochs,
   * so the reorder is per-shard-local, never cross-shard).
   *
   * Scale: one pass over the export (the keys must come from the
   * artifact itself — the sidecar must describe the bytes on disk, not
   * a frame the caller believes matches them) plus a per-shard sort —
   * the same parallelism shape as the export, writing <0.1% of its
   * bytes. The sidecar is stamped with the manifest's md5, so a sidecar
   * orphaned by a re-export refuses instead of mis-ordering.
   */
  def writeEpochOrder(spark: SparkSession, path: String, epoch: Int): Unit = {
    require(epoch >= 0, "epoch must be non-negative")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(root, ManifestName)),
      s"no $ManifestName under $path — epoch sidecars describe OUR " +
        "exports; third-party shard sets have no baked order recipe")
    val (rows, bad) = read(spark, path)
    val badRows = bad.limit(1).collect()
    require(badRows.isEmpty,
      s"cannot derive an epoch order over a quarantined export: ${badRows.head}")
    import graft.pipeline.Curation.hashFraction
    // the sample key is the id's UNSIGNED 20-digit decimal; the order
    // recipe hashes the SIGNED decimal (write()'s graft_id cast) — conv
    // with a negative target base re-reads the unsigned value as signed
    val signedId = conv(col("key"), 10, -10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("graft_ord"), col("graft_idl"))
    rows.select(col("shard"), col("key"))
      .withColumn("graft_idl", signedId)
      .withColumn("graft_ord", hashFraction(
        concat(col("graft_idl").cast("string"), lit(ordSalt(epoch)))))
      // one window task per shard — exactly the export's own sort shape
      .withColumn("pos", (row_number().over(w) - 1).cast("int"))
      .select(col("shard"), col("key"), col("pos"),
        lit(manifestFingerprint(fs, root)).as("mfp"))
      .write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(root, epochOrderName(epoch)).toString)
  }

  /** [[read]] under training epoch `epoch`'s order: `pos` comes from the
   * epoch's [[writeEpochOrder]] sidecar (or straight from the tars when
   * `epoch` is the one the export itself was written with). Missing or
   * stale sidecars throw loudly — never a silently wrong order. */
  def read(spark: SparkSession, path: String, epoch: Int): (DataFrame, DataFrame) =
    readEpoch(spark, path, epoch, binary = false)

  /** [[readBinary]] under an epoch-sidecar order — see [[read(spark,path,epoch)*]]. */
  def readBinary(spark: SparkSession, path: String, epoch: Int): (DataFrame, DataFrame) =
    readEpoch(spark, path, epoch, binary = true)

  private def readEpoch(spark: SparkSession, path: String, epoch: Int,
      binary: Boolean): (DataFrame, DataFrame) = {
    require(epoch >= 0, "epoch must be non-negative")
    val (rows, bad) = readImpl(spark, path, binary)
    val mi = manifestInfo(spark, path).getOrElse(throw new java.io.IOException(
      s"no $ManifestName under $path — epoch orders exist only for our exports"))
    if (mi.epoch == epoch) return (rows, bad)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecar = new org.apache.hadoop.fs.Path(root, epochOrderName(epoch))
    if (!fs.exists(sidecar)) throw new java.io.IOException(
      s"no epoch-$epoch order sidecar under $path — run " +
        s"Wds.writeEpochOrder(spark, path, $epoch) once (cheap: no tar " +
        s"bytes move) or re-export with epoch = $epoch")
    val sc = spark.read.parquet(sidecar.toString)
    val head = sc.select(col("mfp")).limit(1).collect()
    require(head.isEmpty || head(0).getString(0) == manifestFingerprint(fs, root),
      s"epoch-$epoch sidecar under $path was derived from a DIFFERENT " +
        "export (manifest fingerprint mismatch) — re-run writeEpochOrder")
    // inner join on (shard, key): the fingerprint check above proves the
    // sidecar describes THIS artifact, so the key sets are identical —
    // one slim shuffle instead of 100 TB of tar bytes rewritten
    val reordered = rows.drop("pos")
      .join(sc.select(col("shard"), col("key"), col("pos")), Seq("shard", "key"))
      .select((Seq(col("shard"), col("pos"), col("key")) ++
        (if (binary) Seq(col("parts")) else Seq(col("text"), col("meta")))): _*)
    (reordered, bad)
  }

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
      else if (!fs.exists(root))
        // a typo'd shard path must not train on zero data with no error —
        // a genuinely EMPTY export still leaves a directory plus manifest,
        // which reads back as an empty (but loudly distinguishable) corpus
        throw new java.io.FileNotFoundException(
          s"wds shard path $path does not exist — not an empty export " +
            "(those leave a directory and a manifest); check the path")
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
    // binaryFiles takes ONE comma-separated string that FileInputFormat
    // splits back on commas — and its splitter does NOT honor backslash
    // escapes (nor does its per-path glob expansion treat names
    // literally), so a tar path carrying a comma or a glob metacharacter
    // (legal in POSIX/HDFS names, possible in third-party shard dirs)
    // would mis-split into bogus paths or glob-expand to the wrong
    // files. Such names are rare: route them through a parallelize +
    // FileSystem.open fallback (same spool/validate/stream body, no
    // locality hint), and keep binaryFiles — with its HDFS locality —
    // for the normal names.
    val sc = spark.sparkContext
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      sc.hadoopConfiguration)
    val (weird, plain) =
      files.partition(p => p.toString.exists("*?[]{},".contains(_)))
    val rdds = Seq(
      if (plain.isEmpty) None else Some(
        sc.binaryFiles(plain.map(_.toString).mkString(","))
          .flatMap { case (file, pds) =>
            ingestShard(file, () => pds.open(), binary) }),
      if (weird.isEmpty) None else Some(
        sc.parallelize(weird.map(_.toString), weird.size)
          .flatMap { file =>
            val p = new org.apache.hadoop.fs.Path(file)
            ingestShard(file,
              () => p.getFileSystem(hconf.value).open(p), binary) })
    ).flatten
    val tagged = rdds.reduce(_ union _)
    val taggedDf = spark.createDataFrame(tagged,
      if (binary) TaggedBinarySchema else TaggedSchema)
    (taggedDf.where(col("ok")).select(
       (Seq(col("shard"), col("pos"), col("key")) ++
         (if (binary) Seq(col("parts"))
          else Seq(col("text"), col("meta")))): _*),
     taggedDf.where(!col("ok")).select(col("file"), col("reason"))
       .unionByName(unvouchedDf))
  }

  /** Executor-side ingest of ONE shard file: spool to executor-local disk
   * in a single remote read (`openRaw`), strict-validate the whole
   * archive off the spool (whole-file quarantine needs the verdict
   * before the first sample is emitted), then STREAM samples from the
   * spool — memory is O(current sample), never O(shard). The spool lands
   * on the executor's configured scratch volume (spark.local.dir — the
   * disks sized for shuffle spill), not the root-volume tmpdir a
   * container usually caps. The task-completion listener guarantees
   * spool cleanup even when a downstream limit() abandons the iterator
   * mid-file. Shared by the binaryFiles path and the weird-name
   * parallelize fallback, so both ingest faces have identical
   * validation/quarantine semantics. */
  private def ingestShard(file: String, openRaw: () => java.io.InputStream,
      binary: Boolean): Iterator[org.apache.spark.sql.Row] = {
    val shard = "shard-(\\d+)\\.tar(\\.gz)?$".r.findFirstMatchIn(file)
      .map(_.group(1).toInt).getOrElse(-1)
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
      val in = openRaw()
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
  private val ManifestSchema = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("docs", LongType, nullable = false),
    StructField("tokens", LongType)))
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
          val e2 = split(n2)._2
          // a repeated extension within one sample would silently drop the
          // earlier payload — the write side fails loudly on duplicate ids,
          // so ingest must not lose data silently where export refuses to;
          // throwing here quarantines the whole file upstream (the
          // webdataset library's duplicate-file-in-sample error)
          if (parts.contains(e2))
            throw new java.io.IOException(
              s"duplicate extension '$e2' within webdataset sample '$k'")
          parts += (e2 -> d2)
        }
        (k, parts)
      }
    }
}
